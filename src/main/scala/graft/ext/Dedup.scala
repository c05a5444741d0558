package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ext.CacheScope.Cacheable

/** Deduplication operators for training-data pipelines: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design: exact dedup is a hash-groupBy (one shuffle on the digest —
  * tiny rows). Near-dup never compares all pairs: candidates are generated
  * inside buckets (content buckets here; MinHash bands in [[minHashLsh]]),
  * so the join key prunes the quadratic blowup to per-bucket blocks.
  *
  * Cache lifecycle: the near-dup functions cache their small
  * shingle/signature frames (one row per doc) because multiple plan
  * branches reference them. By default the entries stay registered for the
  * session and are evicted LRU under storage-memory pressure; long-lived
  * sessions doing many dedup passes should materialize each pass inside
  * [[CacheScope.scoped]], which releases that pass's entries on exit (all
  * internal caches here register via `scopedCache()`).
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

  /** Incremental exact dedup — one delta against historical state: docs
    * whose digest appears in `keepers` drop (duplicates of history);
    * within the remainder, min-`idCol` per digest wins (the batch keeper
    * rule). Returns the kept docs (all input columns) and THIS delta's
    * keeper frame `(content_hash, idCol)` — union its `content_hash`
    * onto the state for the next delta. The shared dedup prefix of
    * [[graft.api.Graft.corpusBuildDelta]] / `corpusShardsDelta` and the
    * streaming corpus-shard writer.
    *
    * Scale shape: the only history-sized input is the keeper-digest
    * anti equi-join; everything else is delta-sized. The input feeds
    * keeper selection AND the kept semi-join, so it is
    * [[CacheScope]]-cached here.
    */
  def keeperDelta(docs: DataFrame, textCol: String, idCol: String,
                  keepers: Option[DataFrame]): (DataFrame, DataFrame) = {
    val fresh = CacheScope.cache(keepers match {
      case Some(ks) =>
        docs.join(ks, digest(col(textCol)) === ks("content_hash"),
          "left_anti")
      case None => docs
    })
    val deltaKeepers = fresh
      .groupBy(digest(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as(idCol))
    val kept = fresh.join(deltaKeepers.select(col(idCol)), Seq(idCol),
      "left_semi")
    (kept, deltaKeepers)
  }

  /** Engine-portable 32-bit token hash: first 8 hex chars of md5, parsed as
    * an unsigned int (value in [0, 2^32)). Chosen over Spark's murmur3
    * `hash()` so DuckDB oracles can reproduce it bit-exactly:
    * Spark `conv(substring(md5(t),1,8),16,10)` ≡ DuckDB
    * `('0x' || substr(md5(t),1,8))::BIGINT`. md5 is codegen'd and the cost
    * is amortized over the explode — for a non-oracled production deploy,
    * `xxhash64` is the faster drop-in (same plan shape).
    */
  def tokenHash(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

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
                        n: Int = 3,
                        maxShingleDocFreq: Int = Int.MaxValue): DataFrame = {
    // Explode-join form, not pairwise array_intersect: shingles explode to
    // (bucket, shingle, id) rows, the self-join meets ONLY on shared
    // shingles (equi-key shuffle), and |A∩B| falls out of a count. Pairs
    // with zero overlap never materialize — at 100 TB the quadratic
    // per-bucket blowup of a pair join would dominate; this shape's cost is
    // proportional to actual shingle collisions.
    // cache: the shingle frame feeds three plan branches (sizes ×2, the
    // exploded join) — uncached, Catalyst inlines the whole regex-split/
    // transform/distinct expression into every branch and re-evaluates it
    // per downstream row
    val sh = Spread.cpu(df, idCol).select(
      (col(idCol) +: bucketCols.map(col)) :+
        shingles(col(textCol), n).as("g"): _*).scopedCache()
    val explAll = sh.select(
      (col(idCol) +: bucketCols.map(col)) :+ explode(col("g")).as("s"): _*)
    // Hot-shingle document-frequency cut: a shingle shared by D docs emits
    // ~D² join rows, so boilerplate ("all rights reserved") goes quadratic
    // at corpus scale. The rule — restrict every doc's shingle SET to
    // shingles with corpus DF ≤ maxShingleDocFreq; both |A∩B| and |A|,|B|
    // use the filtered sets — is exactly reproducible in the SQL oracle.
    // Shape: the hot list is tiny (only shingles with DF > f), so the
    // anti-join broadcasts; sizes recompute from the filtered explode.
    val (expl, sizes) =
      if (maxShingleDocFreq == Int.MaxValue) {
        (explAll, sh.select(col(idCol), size(col("g")).as("n_g")))
      } else {
        val hot = explAll.groupBy(col("s"))
          .agg(count(lit(1)).as("df"))
          .filter(col("df") > maxShingleDocFreq)
          .select("s")
        val kept = explAll.join(broadcast(hot), Seq("s"), "left_anti")
        (kept, kept.groupBy(col(idCol)).agg(count(lit(1)).as("n_g")))
      }
    val joinKeys = bucketCols :+ "s"
    val a = expl.withColumnRenamed(idCol, "id_a")
    val b = expl.withColumnRenamed(idCol, "id_b")
    val inter = a.join(b, joinKeys).filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed(idCol, "id_a")
        .withColumnRenamed("n_g", "n_a"), "id_a")
      .join(sizes.withColumnRenamed(idCol, "id_b")
        .withColumnRenamed("n_g", "n_b"), "id_b")
      // try_divide: ANSI mode (Spark 4 default) errors on 0/0 — two empty
      // shingle sets yield NULL here and never pass the threshold
      .withColumn("jaccard", try_divide(col("n_inter").cast("double"),
        (col("n_a") + col("n_b") - col("n_inter")).cast("double")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Mersenne prime 2^31-1 — modulus of the affine MinHash family. */
  val MersenneP = 2147483647L

  /** Deterministic affine-permutation parameters (a_i, b_i) for the MinHash
    * family, from fixed seeds (stable across runs/partitions/engines — the
    * SQL oracle interpolates the same constants). `a` is bounded to 2^30-1:
    * [[tokenHash]] values reach 2^32, so a larger multiplier would overflow
    * a signed long under ANSI mode (h·a + b < 2^62 + 2^31 here).
    * Independent (a_i, b_i) per permutation — NOT scalar multiples of one
    * base pair, which would make every h_i a multiple of a single inner
    * value (one zero collapses all slots and the family loses pairwise
    * independence).
    */
  def affineParams(numHashes: Int): IndexedSeq[(Long, Long)] =
    (0 until numHashes).map { i =>
      val rng = new java.util.Random(0x9E3779B97F4A7C15L ^ (i.toLong << 32))
      val a = 1L + rng.nextInt((1 << 30) - 1)
      val b = rng.nextInt(Int.MaxValue).toLong
      (a, b)
    }

  /** MinHash signatures, explode→groupBy-min shape: shingles explode to
    * rows, each row computes `numHashes` small affine-permutation hashes
    * `(a_i·tokenHash(s) + b_i) mod p` (fixed seeds → deterministic across
    * runs/partitions), and a partial-aggregating groupBy takes the per-doc
    * min of each. This keeps every expression tiny (whole-stage codegen
    * compiles in ms; a single nested-HOF signature expression measured 25×
    * slower from codegen blowup alone) and scales: map-side combine means
    * the shuffle carries one 16-long row per doc per partition.
    */
  def minHashSignatures(df: DataFrame, textCol: String, idCol: String,
                        numHashes: Int = 16): DataFrame = {
    // md5 lands in its OWN projection so it provably evaluates once per
    // row — inlining tokenHash into all 16 affine expressions would lean
    // on codegen subexpression elimination to avoid 16 digests per shingle
    val expl = Spread.cpu(df, idCol).select(col(idCol),
      explode(shingles(col(textCol))).as("s"))
      .select(col(idCol), tokenHash(col("s")).as("__h"))
    val h = col("__h")
    val hashCols = affineParams(numHashes).zipWithIndex.map {
      case ((a, b), i) => pmod(h * a + b, lit(MersenneP)).as(s"h$i")
    }
    val mins = (0 until numHashes).map(i => min(col(s"h$i")).as(s"h$i"))
    expl.select(col(idCol) +: hashCols: _*)
      .groupBy(col(idCol))
      .agg(mins.head, mins.tail: _*)
      .select(col(idCol),
        array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** MinHash+LSH near-dup candidate pairs: signature → band rows (band id +
    * banded signature slice) → shuffle on (band, slice) → pairs that share
    * any band. The classic band trick: only hash-equal bands meet, so the
    * join is equi-key and shuffle-partitioned — no cross product.
    * Returns distinct candidate pairs with their signature agreement rate.
    */
  def minHashLsh(df: DataFrame, textCol: String, idCol: String,
                 numHashes: Int = 16, bands: Int = 4,
                 maxBandBucket: Int = Int.MaxValue): DataFrame = {
    // bands > numHashes would make every slice empty (all docs share every
    // band key — a silent all-pairs cross product); a non-divisible
    // numHashes would silently drop trailing signature slots
    require(bands > 0 && bands <= numHashes && numHashes % bands == 0,
      s"bands=$bands must divide numHashes=$numHashes")
    val rowsPerBand = numHashes / bands
    // cache: the signature frame is referenced five times downstream (two
    // band branches, two attach joins, the agreement fold); materialize it
    // once instead of recomputing the shuffle per branch
    val sig = minHashSignatures(df, textCol, idCol, numHashes).scopedCache()
    // Candidate generation joins on ONE long (xxhash64 of the banded
    // signature slice), not the slice array: cheap shuffle key, and the
    // signature arrays stay out of the join. Pairs dedupe BEFORE the
    // signatures are re-attached via two joins against the small sig table
    // — at scale the candidate set is orders of magnitude smaller than the
    // banded-row join output.
    val bandedAll = sig.select(col(idCol),
        explode(sequence(lit(0), lit(bands - 1))).as("band"), col("sig"))
      .select(col(idCol), xxhash64(col("band"),
        slice(col("sig"), col("band") * rowsPerBand + 1, lit(rowsPerBand)))
        .as("band_key"))
    // Hot-bucket cap (standard LSH hardening): a band bucket holding D docs
    // emits ~D²/2 candidate rows — one boilerplate-heavy bucket can
    // dominate the whole join at corpus scale. Buckets over the cap are
    // dropped entirely (deterministic, oracle-reproducible rule); the hot
    // list is tiny, so the anti-join broadcasts.
    val banded =
      if (maxBandBucket == Int.MaxValue) bandedAll
      else {
        val hot = bandedAll.groupBy(col("band_key"))
          .agg(count(lit(1)).as("df"))
          .filter(col("df") > maxBandBucket)
          .select("band_key")
        bandedAll.join(broadcast(hot), Seq("band_key"), "left_anti")
      }
    val cands = banded.withColumnRenamed(idCol, "id_a")
      .join(banded.withColumnRenamed(idCol, "id_b"), Seq("band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    // positional agreement rate — the unbiased MinHash Jaccard estimator
    val agree = aggregate(
      zip_with(col("sig_a"), col("sig_b"),
        (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v)
    cands
      .join(sig.select(col(idCol).as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sig.select(col(idCol).as("id_b"), col("sig").as("sig_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (agree.cast("double") / size(col("sig_a"))).as("sig_agreement"))
  }

  /** Exact-Jaccard verification of candidate pairs — the second stage of
    * production LSH dedup (estimate prunes, exact verifies). The pairwise
    * set intersection runs ONLY on candidate pairs, so the quadratic cost
    * LSH pruned away never comes back; per-pair `array_intersect` is the
    * right tool here precisely because the pair set is already small.
    */
  def verifyCandidatesJaccard(cands: DataFrame, docs: DataFrame,
                              textCol: String, idCol: String,
                              threshold: Double, n: Int = 3): DataFrame = {
    // cache: the candidate frame (possibly an expensive LSH plan) feeds
    // the id extraction AND the pair joins — uncached it would execute
    // twice
    val c = cands.select(col("id_a"), col("id_b")).scopedCache()
    // shingle ONLY docs that appear in a candidate pair — at corpus scale
    // the candidate set is orders of magnitude smaller than the corpus,
    // and shingling is the dominant cost; the semi-join restricts the
    // scan before the expensive projection runs
    val candIds = c
      .select(explode(array(col("id_a"), col("id_b"))).as(idCol)).distinct()
    // cache: the shingle-set frame is probed by both pair-side joins
    val sh = docs.join(candIds, Seq(idCol), "left_semi")
      .select(col(idCol), shingles(col(textCol), n).as("g")).scopedCache()
    verifyCandidatesJaccardSets(c, sh, idCol, threshold)
  }

  /** [[verifyCandidatesJaccard]] over a PRECOMPUTED (id, shingle-set)
    * frame — for callers (the PPJoin path) whose candidate generator
    * already paid the shingling; re-deriving the sets from raw text would
    * run the regex/split projection a second time over the corpus.
    * `shingleSets` must contain every id referenced by `cands`, with the
    * set column named exactly `g` (as [[shingles]] callers produce).
    */
  def verifyCandidatesJaccardSets(cands: DataFrame, shingleSets: DataFrame,
                                  idCol: String, threshold: Double)
      : DataFrame = {
    cands
      .join(shingleSets.select(col(idCol).as("id_a"), col("g").as("g_a")),
        "id_a")
      .join(shingleSets.select(col(idCol).as("id_b"), col("g").as("g_b")),
        "id_b")
      .withColumn("n_inter",
        size(array_intersect(col("g_a"), col("g_b"))))
      .withColumn("jaccard", try_divide(col("n_inter").cast("double"),
        (size(col("g_a")) + size(col("g_b")) - col("n_inter")).cast("double")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Prefix-filtered exact-Jaccard join (the PPJoin candidate rule): order
    * every document's shingle set by GLOBAL document frequency ascending
    * (ties by shingle text), keep only the first
    * `|d| − ceil(t·|d|) + 1` shingles as the doc's PREFIX, and generate
    * candidates from prefix∩prefix collisions only. Any pair with
    * J(A,B) ≥ t must share a token inside both prefixes (pigeonhole on the
    * shared global order), so the rule has ZERO false negatives;
    * [[verifyCandidatesJaccard]] then computes exact Jaccard on the
    * survivors.
    *
    * Scale: this is the high-threshold complement of
    * [[ngramJaccardPairs]]'s all-shared-shingles join — at t = 0.8 the
    * prefix is ~20% of each set, and because the global order puts RARE
    * shingles first, the prefix join meets on low-df keys: boilerplate
    * (high-df) shingles never generate candidates at all, which is the
    * skew story the hot-shingle DF-cut approximates from the other side.
    * Shapes: one df agg + one per-doc window (single shuffle each), a
    * prefix self-join on the shingle, then the capped exact verify.
    */
  def prefixJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                         threshold: Double, n: Int = 3): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold=$threshold must be in (0, 1]")
    import org.apache.spark.sql.expressions.Window
    // cache: the shingle-SET frame feeds the exploded prefix pipeline AND
    // the final exact verification — shingling (regex split + slide +
    // distinct) is the dominant CPU and must run once, not twice
    val shSets = Spread.cpu(df, idCol)
      .select(col(idCol), shingles(col(textCol), n).as("g"))
      .scopedCache()
    val shx = shSets.select(col(idCol),
      explode(col("g")).as("s")) // distinct per doc
    // dft via a pre-AGGREGATE keyed by shingle, attached back with an
    // un-hinted equi-join (r20, VERDICT r19 item 4; guide §2.3 "aggregate
    // before you shuffle"). The r17 window form (count over
    // Window.partitionBy(s)) exchanged the FULL exploded shingle stream
    // by s and then SORTED it, only to exchange it again by doc for the
    // prefix ranking. The aggregate collapses map-side to one row per
    // distinct shingle before its exchange, and the join back is
    // AQE-decided: at sf0.1 the dft frame broadcasts, so the stream keeps
    // Spread.cpu's doc_id partitioning end-to-end — the per-doc windows
    // below then need NO exchange at all (plan: 3 stream exchanges → 1);
    // at corpus scale AQE falls back to a shuffled join on s, which costs
    // exactly the window form's exchange minus the global window sort.
    // dft values are identical (count of (doc,s) rows per s, one per doc
    // by distinctness) — oracle-hash-exact by construction.
    val dfreq = shx.groupBy(col("s")).agg(count(lit(1)).as("dft"))
    val byDoc = Window.partitionBy(col(idCol))
    val ranked = shx
      .join(dfreq, "s")
      .withColumn("pos",
        row_number().over(byDoc.orderBy(col("dft"), col("s"))))
      .withColumn("n_g", count(lit(1)).over(byDoc))
    // Prefix length n − ceil(t·n) + 1; ceil runs on a float product, and a
    // one-ulp-high product would round the prefix SHORTER than the exact
    // value — a silent false-negative hole. The −1e-9 guard only ever
    // LENGTHENS the prefix (extra candidates, which verify discards).
    // cache: both sides of the candidate self-join read this frame —
    // uncached, the explode + dfreq window + BOTH doc windows execute
    // twice (once per join side). The prefix frame is the SMALL end of
    // the funnel (≈ (1−t)·|shingles| + 1 rows per doc).
    val prefix = ranked
      .filter(col("pos") <=
        col("n_g") - ceil(lit(threshold) * col("n_g") - 1e-9) + 1)
      .select(col(idCol), col("s"), col("pos"), col("n_g"))
      .scopedCache()
    // PPJoin candidate pruning on top of the prefix collision:
    //  - LENGTH filter: J(A,B) ≤ min(|A|,|B|)/max(|A|,|B|), so a size
    //    ratio below t can never reach the threshold;
    //  - POSITIONAL filter: for the FIRST shared prefix token all common
    //    tokens sit at or after (pos_a, pos_b) in the global order, so
    //    |A∩B| ≤ 1 + min(|A|−pos_a, |B|−pos_b), which must reach the
    //    equivalent-overlap bound α = ceil(t/(1+t)·(|A|+|B|)).
    //    A qualifying pair's first-shared-token row always passes, so the
    //    per-row filter before distinct() loses nothing.
    // Both ceils carry the same −1e-9 ulp guard (only ever ADMITS more).
    val alpha = threshold / (1.0 + threshold)
    val cands = prefix.select(col(idCol).as("id_a"), col("s"),
        col("pos").as("pos_a"), col("n_g").as("na"))
      .join(prefix.select(col(idCol).as("id_b"), col("s"),
        col("pos").as("pos_b"), col("n_g").as("nb")), "s")
      .filter(col("id_a") < col("id_b"))
      .filter(least(col("na"), col("nb")) >=
        ceil(lit(threshold) * greatest(col("na"), col("nb")) - 1e-9))
      .filter(lit(1) + least(col("na") - col("pos_a"), col("nb") - col("pos_b")) >=
        ceil(lit(alpha) * (col("na") + col("nb")) - 1e-9))
      .select("id_a", "id_b").distinct()
    verifyCandidatesJaccardSets(cands, shSets, idCol, threshold)
  }

  /** 32-bit SimHashes, explode→groupBy shape (same codegen-size rationale
    * as [[minHashSignatures]]): per-bit majority vote of token
    * [[tokenHash]] bits — bit i of the simhash is 1 iff more tokens have
    * bit i set than not. Partial aggregation sums the ±1 votes map-side.
    */
  def simHashes(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val expl = Spread.cpu(df, idCol).select(col(idCol),
      explode(split(trim(lower(col(textCol))), "\\s+")).as("t"))
      .withColumn("h", tokenHash(col("t")))
    val votes = (0 until 32).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"v$i"))
    val bits = (0 until 32).map(i =>
      when(col(s"v$i") > 0, lit(1L << i)).otherwise(lit(0L)))
    expl.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
      .select(col(idCol), bits.reduce(_ + _).as("simhash"))
  }

  /** Hamming distance between two simhashes (popcount of xor). */
  def hammingDist(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs with hamming ≤ `maxHamming`, via pigeonhole
    * banding: split the 32-bit hash into `maxHamming + 1` byte bands — any
    * pair within the hamming budget MUST agree exactly on at least one band
    * (pigeonhole), so candidates come from an equi-join on (band index,
    * band bits) instead of an all-pairs cross product. Exact, not
    * approximate — the final hamming filter prunes band-collision noise.
    */
  def simHashNearDups(df: DataFrame, textCol: String, idCol: String,
                      bucketCols: Seq[String], maxHamming: Int = 3)
      : DataFrame = {
    // maxHamming >= 32 would give zero-width bands (every doc agrees on
    // every band — silent all-pairs); negative is meaningless
    require(maxHamming >= 0 && maxHamming < 32,
      s"maxHamming=$maxHamming must be in [0, 32)")
    val nBands = maxHamming + 1
    val bandBits = 32 / nBands
    // When nBands doesn't divide 32, the LAST band absorbs the remainder
    // bits — otherwise bits [nBands*bandBits, 32) would sit outside every
    // band and a pair differing only there would break the pigeonhole
    // guarantee (missed true pairs).
    val lastBits = 32 - (nBands - 1) * bandBits
    // cache: both sides of the self-join reference this one-row-per-doc
    // frame; uncached, the token explode + vote groupBy would run twice
    val sh = simHashes(df, textCol, idCol)
      .join(df.select(col(idCol) +: bucketCols.map(col): _*), idCol)
      .withColumnRenamed("simhash", "sh")
      .scopedCache()
    val banded = sh.select(
      (col(idCol) +: bucketCols.map(col)) :+ col("sh") :+
        explode(sequence(lit(0), lit(nBands - 1))).as("band"): _*)
      .withColumn("band_bits",
        expr(s"shiftright(sh, band * $bandBits)")
          .bitwiseAND(when(col("band") === nBands - 1, (1L << lastBits) - 1)
            .otherwise((1L << bandBits) - 1)))
    // The simhash is a single long, so it rides THROUGH the band join —
    // hamming is computed per collision row (cheap bit ops) and the
    // groupBy dedups pairs with map-side combine. This replaces the old
    // distinct + two signature re-attach joins: one shuffle fewer and no
    // re-attach of the sh table at all.
    val keys = bucketCols ++ Seq("band", "band_bits")
    val a = banded.select(
      (col(idCol).as("id_a") +: col("sh").as("sh_a") +: keys.map(col)): _*)
    val b = banded.select(
      (col(idCol).as("id_b") +: col("sh").as("sh_b") +: keys.map(col)): _*)
    a.join(b, keys).filter(col("id_a") < col("id_b"))
      .withColumn("hamming", hammingDist(col("sh_a"), col("sh_b")))
      .filter(col("hamming") <= maxHamming)
      // hamming is functionally dependent on the pair; min() just dedups
      // band collisions
      .groupBy(col("id_a"), col("id_b"))
      .agg(min(col("hamming")).cast("long").as("hamming"))
  }

  /** Incremental (batch-vs-corpus) exact dedup — the shape of a streaming/
    * CDC ingest pipeline: classify each NEW doc as `dup_corpus` (its digest
    * already exists in the accepted corpus), `dup_batch` (a smaller-id doc
    * in the same batch has the digest first), or `novel`. Only `novel` docs
    * get appended.
    *
    * Scale: the corpus side projects to distinct digests only (32-byte
    * rows) — at 100 TB that digest set IS the dedup index you keep
    * materialized between ingests; both the membership join and the
    * first-in-batch groupBy shuffle on the digest.
    */
  def incrementalDedupStatus(batch: DataFrame, corpus: DataFrame,
                             textCol: String, idCol: String): DataFrame = {
    // null text digests as empty content (md5(null) is null, and null join
    // keys never match — the doc would silently vanish from the output
    // instead of being classified). Null-text and empty-text docs therefore
    // dedup together, which is the intended content semantics.
    val content = coalesce(col(textCol), lit(""))
    // cache: the digest projection feeds the membership join AND the
    // first-in-batch min — one md5 pass per doc, not two
    val b = batch.select(col(idCol), digest(content).as("h")).scopedCache()
    val known = corpus.select(digest(content).as("h")).distinct()
      .withColumn("__in_corpus", lit(1L))
    val firstIn = b.groupBy(col("h")).agg(min(col(idCol)).as("__first_id"))
    b.join(known, Seq("h"), "left")
      .join(firstIn, Seq("h"))
      .select(col(idCol),
        when(col("__in_corpus") === 1L, lit("dup_corpus"))
          .when(col(idCol) =!= col("__first_id"), lit("dup_batch"))
          .otherwise(lit("novel")).as("status"))
  }

  /** Train/test contamination check (decontamination primitive): for each
    * candidate doc, how many of its distinct n-gram shingles appear anywhere
    * in the protected set (eval/test corpus). Pipelines drop or flag
    * training docs whose overlap exceeds a threshold before the corpus
    * ships.
    *
    * Shape: the protected shingle set is distinct-projected once, then the
    * candidate shingles semi-join it on the shingle string — an equi-key
    * shuffle join (AQE broadcasts it when the protected corpus is small,
    * the common case; no hint forced because eval suites at 100 TB scale
    * aren't always tiny). Per-doc shingles are already distinct
    * ([[shingles]]), so the post-join count IS the distinct-overlap count.
    * Returns (id, n_shared, n_g, contamination = n_shared / n_g) for
    * candidate docs with at least one shared shingle.
    */
  def contaminationOverlap(candidates: DataFrame, protected_ : DataFrame,
                           textCol: String, idCol: String, n: Int = 3)
      : DataFrame = {
    // cache: one row per candidate doc, referenced by two branches (the
    // exploded overlap join and the sizes attach) — uncached, the regex
    // split + shingle transform would evaluate twice per doc
    val candSh = Spread.cpu(candidates, idCol).select(col(idCol),
      shingles(col(textCol), n).as("g")).scopedCache()
    val protSet = Spread.cpu(protected_, idCol)
      .select(explode(shingles(col(textCol), n)).as("s")).distinct()
    val shared = candSh.select(col(idCol), explode(col("g")).as("s"))
      .join(protSet, Seq("s"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_shared"))
    shared.join(
      candSh.select(col(idCol), size(col("g")).cast("long").as("n_g")), idCol)
      .withColumn("contamination", try_divide(
        col("n_shared").cast("double"), col("n_g").cast("double")))
  }

  /** Resolve near-dup PAIRS into duplicate CLUSTERS: connected components
    * by iterative min-label propagation WITH pointer doubling — every
    * node's label becomes the minimum id reachable from it, so each
    * component gets one canonical keeper (its min id). The per-round step
    * is pure joins + groupBy-min (shuffles on id, map-side combine), and
    * each node also adopts label(label(id)), so rounds = O(log diameter)
    * rather than O(diameter). The driver loop performs ONE scalar
    * convergence probe per round — never a collect of data — which is the
    * legitimate shape for iterative distributed algorithms.
    *
    * Returns (id, cluster_id) for every id that appears in a pair;
    * singleton docs are absent (callers left-join and coalesce to own id).
    *
    * Small-graph fastpath: the distinct edge list is usually orders of
    * magnitude smaller than the corpus (only near-dup pairs survive the
    * candidate filters), and a multi-round distributed loop over a few
    * thousand edges pays tens of scheduling floors for no parallelism. When
    * the edge count is ≤ `localEdgeThreshold` (and ids are integral), the
    * edges — two longs a row, so 500k edges ≈ 8 MB, broadcast-sized — are
    * collected ONCE and resolved with driver union-find; the result ships
    * back as a DataFrame. This is the same bounded-scalar contract as a
    * broadcast join's build side, not an unbounded collect: above the
    * threshold the distributed loop runs unchanged.
    */
  def resolveClusters(pairs: DataFrame, idA: String = "id_a",
                      idB: String = "id_b", maxIter: Int = 20,
                      localEdgeThreshold: Long = 500000L): DataFrame = {
    // cache the INPUT before symmetrizing: both union branches reference
    // it, so an uncached (possibly expensive — LSH band join) pair source
    // would execute twice
    val p = pairs.scopedCache()
    val edges = p.select(col(idA).as("u"), col(idB).as("v"))
      .union(p.select(col(idB).as("u"), col(idA).as("v")))
      .distinct().scopedCache()
    val integralIds = edges.schema.fields.forall(f =>
      f.dataType == org.apache.spark.sql.types.LongType ||
        f.dataType == org.apache.spark.sql.types.IntegerType)
    if (integralIds && edges.count() <= localEdgeThreshold) {
      val spark = pairs.sparkSession
      import spark.implicits._
      val es = edges.select(col("u").cast("long"), col("v").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      edges.unpersist(); p.unpersist()
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      // ITERATIVE find + full path compression: recursion would overflow
      // the driver stack on a path-shaped component near the edge
      // threshold (chains are unbounded without union-by-rank)
      def find(x: Long): Long = {
        var root = x
        while (parent.getOrElseUpdate(root, root) != root) root = parent(root)
        var cur = x
        while (cur != root) { val nxt = parent(cur); parent(cur) = root; cur = nxt }
        root
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      return es.flatMap(e => Seq(e._1, e._2)).distinct
        .map(v => (v, find(v))).toSeq
        .toDF("id", "cluster_id")
    }
    try {
    // localCheckpoint, NOT cache: each round's plan references the previous
    // round's frame more than once, so with plain cache() the LOGICAL plan
    // (which cache does not truncate) doubles per iteration — measured as a
    // 2 GiB plan string and a driver OOM by ~iteration 15 on 178 edges.
    // Checkpointing rebases the frame on its materialized RDD, keeping
    // every round's plan constant-size; eager=true so each round
    // materializes exactly once.
    var labels = edges.select(col("u").as("id")).distinct()
      .withColumn("lbl", col("id")).localCheckpoint(true)
    // the eager checkpoint above materialized edges' cache, and edges is
    // the only consumer of p — release p NOW instead of pinning a
    // possibly-large pair source through every propagation round
    p.unpersist()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrMin = edges
        .join(labels.select(col("id").as("v"), col("lbl").as("nlbl")), "v")
        .groupBy(col("u").as("id")).agg(min(col("nlbl")).as("min_nbr"))
      // pointer doubling: besides the one-hop neighbor min, each node also
      // adopts its LABEL's current label (label(label(id))) — propagation
      // distance doubles per round, so rounds = O(log diameter) instead of
      // O(diameter). At dev SF each round is scheduling-floor-bound
      // (~seconds regardless of data), so halving rounds halves wall time;
      // at 100 TB it bounds the number of full-data shuffles the same way.
      val lblOfLbl = labels
        .select(col("id").as("lbl"), col("lbl").as("hop2"))
      // the changed flag rides the checkpointed frame, so the convergence
      // probe below is a scan of already-materialized rows — no extra join
      val next = labels.join(nbrMin, Seq("id"), "left")
        .join(lblOfLbl, Seq("lbl"), "left")
        .select(col("id"),
          least(col("lbl"), coalesce(col("min_nbr"), col("lbl")),
            coalesce(col("hop2"), col("lbl"))).as("new_lbl"),
          col("lbl"))
        .select(col("id"), col("new_lbl").as("lbl"),
          (col("new_lbl") < col("lbl")).as("__changed"))
        .localCheckpoint(true)
      converged = next.filter(col("__changed")).limit(1).count() == 0
      labels = next.drop("__changed") // superseded checkpoints GC-reclaim
      i += 1
    }
    // fail LOUD: returning the partially-propagated labels would silently
    // split one component into several "clusters" (multiple keepers)
    if (!converged) throw new IllegalStateException(
      s"resolveClusters did not converge in $maxIter iterations — with " +
        "pointer doubling that means component diameter exceeds " +
        s"~2^$maxIter; raise maxIter (input is likely adversarial)")
    labels.select(col("id"), col("lbl").as("cluster_id"))
    } finally { edges.unpersist(); p.unpersist() } // p: no-op if already out
  }

  /** Span-level corpus dedup (the CCNet/RefinedWeb line-dedup shape, over
    * fixed-size token spans since the corpus has no line structure): a doc
    * keeps a span only if the span's corpus DOCUMENT frequency is ≤
    * `maxDocFreq` — repeated boilerplate is removed from every copy, not
    * just non-keeper docs. Spans are consecutive non-overlapping
    * `spanTokens`-token windows (last one may be short).
    *
    * Shape: posexplode spans → per-span doc frequency from a distinct
    * (doc, span) pre-agg → the hot-span list is tiny (only spans crossing
    * the frequency cut), so membership is a broadcast join, exactly like
    * the hot-shingle cut in [[ngramJaccardPairs]] — the corpus text itself
    * is never joined pairwise. Reassembly is a per-doc sort of the kept
    * (pos, span) pairs; `collect_list(when(...))` skips dropped spans, so
    * the group never holds more than the doc's own spans.
    *
    * Returns (id, n_spans, n_dup_spans, clean_fp) where clean_fp is the
    * md5 of the space-joined surviving spans (empty string when none
    * survive — the all-boilerplate doc).
    */
  def spanDedup(df: DataFrame, textCol: String, idCol: String,
                spanTokens: Int = 10, maxDocFreq: Int = 1): DataFrame = {
    require(spanTokens > 0, s"spanTokens=$spanTokens must be positive")
    val toks = split(trim(col(textCol)), "\\s+")
    val nSpans = ceil(size(toks).cast("double") / spanTokens).cast("int")
    val spanArr = transform(sequence(lit(0), nSpans - 1),
      i => array_join(slice(toks, i * spanTokens + 1, lit(spanTokens)), " "))
    // cache: the span frame feeds the doc-frequency agg AND the reassembly
    val spans = Spread.cpu(df.filter(col(textCol).isNotNull), idCol)
      .select(col(idCol), posexplode(spanArr).as(Seq("pos", "span"))).scopedCache()
    val hot = spans.select(col(idCol), col("span")).distinct()
      .groupBy(col("span")).agg(count(lit(1)).as("span_df"))
      .filter(col("span_df") > maxDocFreq)
      .select(col("span"), lit(1).as("is_hot"))
    spans.join(broadcast(hot), Seq("span"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
        count(col("is_hot")).as("n_dup_spans"),
        md5(array_join(transform(
          sort_array(collect_list(
            when(col("is_hot").isNull, struct(col("pos"), col("span"))))),
          s => s("span")), " ")).as("clean_fp"))
  }
}
