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
