package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted ANN index: build once from a corpus, serve queries many
  * times without re-learning anything — the deployment lifecycle the
  * live [[Similarity.ivfPqResSearch]] operator folds into one plan.
  *
  * At 100 TB the index build (one Lloyd pass for cells, m residual
  * sub-Lloyds, one codegen'd encode pass over the corpus) is a batch job
  * measured in node-hours; queries arrive continuously and must not pay
  * it. The artifacts are plain parquet — readable by any Spark session,
  * partition-prunable, and small relative to the corpus (codes are
  * 2 bytes per vector at m=4/kSub=16; unit vectors dominate and exist
  * for the exact stage-C re-rank only):
  *
  * {{{
  * dir/centroids  (bkt INT, cvec ARRAY<DOUBLE>)   |cells| rows
  * dir/codes      (bkt INT, uid, code ARRAY<INT>) one row per vector
  * dir/vectors    (uid, uvec ARRAY<DOUBLE>)       one row per vector
  * dir/books      (j INT, cj INT, center ARRAY<DOUBLE>)  m·kSub rows
  * dir/params     (dim INT, m INT, kSub INT, n_cells INT) one row
  * }}}
  *
  * [[search]] reloads the codebooks to the driver (m·kSub·dsub = k·dim
  * doubles — the codebook allowance every ANN operator shares) and runs
  * the EXACT serve plan of the live operator
  * ([[Similarity.ivfPqResServe]]), so a persisted-then-served query
  * returns the same rows the live search would — the equivalence the
  * spec asserts.
  */
object AnnIndex {

  /** Learn and persist the index. The corpus must carry a coarse cell
    * column (from [[Similarity.kmeansBuckets]] or any bucketing).
    * Fails on an empty/all-null corpus — there is no codebook to learn.
    */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
            bucketCol: String, dir: String, dim: Int,
            m: Int = 4, kSub: Int = 16, iters: Int = 1,
            trainFraction: Double = 1.0): Unit = {
    val parts = Similarity.ivfPqResIndexParts(corpus, idCol, vecCol,
      bucketCol, dim, m, kSub, iters, trainFraction)
    require(parts.nonEmpty,
      "AnnIndex.build: corpus has no non-null vectors — nothing to index")
    val (cents, coded, unit, books) = parts.get
    val spark = corpus.sparkSession
    import spark.implicits._
    cents.write.mode("overwrite").parquet(s"$dir/centroids")
    coded.write.mode("overwrite").parquet(s"$dir/codes")
    unit.write.mode("overwrite").parquet(s"$dir/vectors")
    books.zipWithIndex.flatMap { case (cs, j) =>
      cs.zipWithIndex.map { case (c, cj) => (j, cj, c.toSeq) }
    }.toSeq.toDF("j", "cj", "center")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/books")
    Seq((dim, m, kSub, books(0).length))
      .toDF("dim", "m", "kSub", "n_centers")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/params")
  }

  /** INCREMENTAL index maintenance — the faiss `add()` contract: encode
    * `newVectors` under the index's FROZEN geometry (no retraining, no
    * touch of existing rows) and append them to `codes`/`vectors`, so
    * the next [[search]] retrieves old and new rows through one probe.
    *
    * Assignment rule: each new vector goes to the nearest STORED
    * centroid — the probe geometry queries use — then its residual
    * encodes under the frozen per-subspace codebooks with the exact
    * [[Similarity.assignOn]] kernel the build used (guard-rounded
    * distances, lowest-index ties), so added codes are bit-compatible
    * with built codes. For a corpus bucketed by [[Similarity.kmeansBuckets]]
    * the build-time bucketing used the Lloyd centers instead (the index
    * does not persist those); cell means are the next Lloyd iterate, so
    * the two geometries converge with `iters` — and probe-side
    * consistency is what recall actually depends on.
    *
    * Loud guards: wrong-dimension vectors and ids already present in
    * the index both fail (a duplicate uid would fan out the exact
    * re-rank join). Batch semantics: plain append-mode parquet — rerun
    * of a failed add can duplicate rows; dedup the input by id per
    * attempt or rebuild (same contract as any parquet append).
    */
  def add(spark: SparkSession, dir: String, newVectors: DataFrame,
          idCol: String, vecCol: String): Unit = {
    val params = spark.read.parquet(s"$dir/params").head()
    val dim = params.getAs[Int]("dim")
    val m = params.getAs[Int]("m")
    val centFrame = spark.read.parquet(s"$dir/centroids")
    // centroids collected in BKT ORDER: the assignment kernel breaks
    // distance ties on array position, so a partition-order collect
    // would make tie resolution nondeterministic across runs
    val centPairs = centFrame.select(col("bkt"), col("cvec"))
      .orderBy(col("bkt")).collect()
      .map(r => r.getAs[Int]("bkt") -> r.getSeq[Double](1).toArray)
    require(centPairs.nonEmpty,
      s"AnnIndex.add: $dir has no centroids — not a built index")
    val bookRows = spark.read.parquet(s"$dir/books").collect()
    val books: Array[Array[Array[Double]]] = Array.tabulate(m) { j =>
      bookRows.filter(_.getAs[Int]("j") == j)
        .sortBy(_.getAs[Int]("cj")).map(_.getSeq[Double](2).toArray)
    }
    val vd = col(vecCol).cast("array<double>")
    val newV = newVectors.filter(vd.isNotNull)
      .select(col(idCol).as("uid"), vd.as("v"))
    require(newV.filter(size(col("v")) =!= dim).isEmpty,
      s"AnnIndex.add: input carries vectors whose dimension != $dim " +
        "(the index geometry) — they cannot be encoded")
    require(newV.join(spark.read.parquet(s"$dir/codes").select(col("uid")),
        Seq("uid"), "left_semi").isEmpty,
      "AnnIndex.add: input ids already exist in the index — a duplicate " +
        "uid would fan out the exact re-rank join; re-id or rebuild")
    encodeFrozen(newV, centPairs, centFrame, books, dim / m)
      .write.mode("append").parquet(s"$dir/codes")
    newV.select(col("uid"), Similarity.unitVec(col("v")).as("uvec"))
      .write.mode("append").parquet(s"$dir/vectors")
  }

  /** The frozen-geometry encode kernel [[add]] and the oracled
    * `q_ann_index_add` twin share: nearest stored centroid (codebook-
    * sized driver array, position ties = lowest bkt — `centPairs` must
    * be bkt-ordered), residual against that cell's mean, per-subspace
    * code via the exact build-time [[Similarity.assignOn]] kernel.
    * `newV` carries `(uid, v)`; returns `(bkt, uid, code)`.
    */
  private[graft] def encodeFrozen(newV: DataFrame,
                                  centPairs: Array[(Int, Array[Double])],
                                  centFrame: DataFrame,
                                  books: Array[Array[Array[Double]]],
                                  dsub: Int): DataFrame = {
    val bktIds = centPairs.map(_._1)
    val assigned = newV
      .withColumn("__pos",
        Similarity.assignOn(col("v"), centPairs.map(_._2)))
      .withColumn("bkt", element_at(lit(bktIds), col("__pos") + 1))
      .join(broadcast(centFrame), "bkt")
      .withColumn("rv", zip_with(col("v"), col("cvec"), (x, c) => x - c))
    val codeArr = array(books.indices.map { j =>
      Similarity.assignOn(slice(col("rv"), j * dsub + 1, dsub), books(j))
    }: _*)
    assigned.select(col("bkt"), col("uid"), codeArr.as("code"))
  }

  /** Serve queries from a persisted index — no learning, no corpus scan
    * beyond the index artifacts. Same output contract as every ANN
    * operator: `(query_id, neighbor_id, cosine, rank)`, exact cosines.
    */
  def search(spark: SparkSession, dir: String, queries: DataFrame,
             idCol: String, vecCol: String, k: Int, nProbe: Int = 2,
             overfetch: Int = 3,
             maxBucket: Int = Int.MaxValue): DataFrame = {
    val params = spark.read.parquet(s"$dir/params").head()
    val m = params.getAs[Int]("m")
    val kSub = params.getAs[Int]("kSub")
    val bookRows = spark.read.parquet(s"$dir/books")
      .orderBy(col("j"), col("cj")).collect()
    val flatBooks: Array[Array[Double]] = Array.tabulate(m) { j =>
      bookRows.filter(_.getAs[Int]("j") == j)
        .flatMap(_.getSeq[Double](2)).toArray
    }
    Similarity.ivfPqResServe(
      spark.read.parquet(s"$dir/centroids"),
      spark.read.parquet(s"$dir/codes"),
      spark.read.parquet(s"$dir/vectors"),
      queries, idCol, vecCol, flatBooks, kSub, k, nProbe, overfetch,
      maxBucket)
  }
}
