package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design: exact dedup is a hash-groupBy (one shuffle on the digest —
  * tiny rows). Near-dup never compares all pairs: candidates are generated
  * inside buckets (content buckets here; MinHash bands in [[minHashLsh]]),
  * so the join key prunes the quadratic blowup to per-bucket blocks.
  */
object Dedup {

  /** Content digest for exact dedup. md5 for oracle parity; `sha2(_, 256)`
    * is the collision-safe choice at 100 TB (same plan shape).
    */
  def digest(text: Column): Column = md5(text)

  /** Exact-duplicate groups: digest → (count, keeper = min id).
    * `dropDuplicates` semantics = keep rows where `n == 1` plus keepers.
    */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(digest(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keeper_id"))

  /** Distinct word n-gram shingles of a text column. Texts with fewer than
    * `n` tokens yield an empty set (their Jaccard is then 0/0 → NaN → never
    * passes a threshold, matching the oracle's semantics).
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = split(trim(text), "\\s+")
    when(size(toks) >= n,
      array_distinct(
        transform(sequence(lit(0), size(toks) - n),
          i => array_join(slice(toks, i + 1, lit(n)), " "))))
      .otherwise(array().cast("array<string>"))
  }

  /** N-gram Jaccard near-dup pairs. Candidates = same (`bucketCols`) block,
    * id < id (dedup + no self-pairs); |A∪B| computed as |A|+|B|-|A∩B| so
    * only one array intersection runs per pair.
    *
    * At 100 TB the bucket columns are the scale lever: (lang, length-band)
    * keeps blocks small; for adversarial data swap in [[minHashLsh]] bands
    * as the block key.
    */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        bucketCols: Seq[String], threshold: Double,
                        n: Int = 3): DataFrame = {
    val sh = df.select(
      (col(idCol) +: bucketCols.map(col)) :+
        shingles(col(textCol), n).as("g"): _*)
    val a = sh.columns.foldLeft(sh)((d, c) => d.withColumnRenamed(c, s"a_$c"))
    val b = sh.columns.foldLeft(sh)((d, c) => d.withColumnRenamed(c, s"b_$c"))
    val joinCond = bucketCols.map(c => col(s"a_$c") === col(s"b_$c"))
      .reduce(_ && _) && (col(s"a_$idCol") < col(s"b_$idCol"))
    val inter = size(array_intersect(col("a_g"), col("b_g"))).cast("double")
    val uni = (size(col("a_g")) + size(col("b_g"))).cast("double") - inter
    a.join(b, joinCond)
      // try_divide: ANSI mode (Spark 4 default) errors on 0/0 — two empty
      // shingle sets yield NULL here and never pass the threshold
      .withColumn("jaccard", try_divide(inter, uni))
      .filter(col("jaccard") >= threshold)
      .select(col(s"a_$idCol").as("id_a"), col(s"b_$idCol").as("id_b"),
        col("jaccard"))
  }

  /** MinHash signature: for each of `numHashes` permutations, the min over
    * shingle hashes of `(a_i * h + b_i) mod p`. Seeds are fixed constants →
    * deterministic across runs and partitions. Pure expression (no UDF):
    * the per-permutation min is an `aggregate` HOF over the shingle array.
    */
  def minHashSignature(sh: Column, numHashes: Int = 16): Column = {
    val p = 2147483647L // 2^31-1, Mersenne prime
    val hashes = (0 until numHashes).map { i =>
      val a = 1664525L * (i + 1) % p
      val b = 1013904223L * (i + 1) % p
      aggregate(
        transform(sh, s => pmod(abs(hash(s)).cast("long") * a + b, lit(p))),
        lit(p), (acc, x) => least(acc, x))
    }
    array(hashes: _*)
  }

  /** MinHash+LSH near-dup candidate pairs: signature → band rows (band id +
    * banded signature slice) → shuffle on (band, slice) → pairs that share
    * any band. The classic band trick: only hash-equal bands meet, so the
    * join is equi-key and shuffle-partitioned — no cross product.
    * Returns distinct candidate pairs with their signature agreement rate.
    */
  def minHashLsh(df: DataFrame, textCol: String, idCol: String,
                 numHashes: Int = 16, bands: Int = 4): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sig = df.select(col(idCol),
      minHashSignature(shingles(col(textCol))).as("sig"))
    val banded = sig.select(col(idCol), col("sig"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("band_sig",
        slice(col("sig"), col("band") * rowsPerBand + 1, lit(rowsPerBand)))
    val a = banded.select(col(idCol).as("id_a"), col("sig").as("sig_a"),
      col("band"), col("band_sig"))
    val b = banded.select(col(idCol).as("id_b"), col("sig").as("sig_b"),
      col("band"), col("band_sig"))
    a.join(b, Seq("band", "band_sig"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sig_a"), col("sig_b"))).cast("double") /
          size(col("sig_a"))).as("sig_agreement"))
      .distinct()
  }

  /** 32-bit SimHash from token murmur3 hashes: per-bit majority vote of
    * token hash bits, as pure expressions (bit i of the simhash = 1 iff
    * more tokens have bit i set than not).
    */
  def simHash(text: Column): Column = {
    val toks = split(trim(lower(text)), "\\s+")
    val hashes = transform(toks, t => hash(t)) // murmur3 int32
    val bits = (0 until 32).map { i =>
      val votes = aggregate(hashes, lit(0),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(1) === 1, 1)
          .otherwise(-1))
      when(votes > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Hamming distance between two simhashes (popcount of xor). */
  def hammingDist(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
