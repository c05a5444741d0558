package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins and aggregations (SURVEY.md §7.4.8; AQE's
  * skew-join handles sort-merge skew adaptively, but salting is the
  * deterministic tool when one key dominates — e.g. a single household with
  * millions of readings, or a null-heavy foreign key).
  */
object Salting {

  /** Salted join: the skewed (large) side gets a random salt in [0, n);
    * the small side is exploded n× with every salt value, so the join key
    * (key, salt) spreads one hot key over n shuffle partitions. Result is
    * row-identical to the unsalted join.
    *
    * `rand(seed)` is evaluated per large-side row — deterministic under
    * retries for a fixed partitioning, and correctness never depends on
    * WHICH salt a row gets (every salt matches on the replicated side).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                 saltBuckets: Int, how: String = "inner",
                 seed: Long = 42L): DataFrame = {
    // right/full outer would emit each UNMATCHED replicated small-side row
    // once per salt — not row-identical to the unsalted join
    require(Set("inner", "left", "leftouter", "left_outer", "cross",
        "leftsemi", "left_semi").contains(how.toLowerCase),
      s"saltedJoin supports inner/left/semi joins, not '$how' " +
        "(outer-unmatched small-side rows would duplicate per salt)")
    val salted = large.withColumn("__salt",
      (rand(seed) * saltBuckets).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, keys :+ "__salt", how).drop("__salt")
  }

  /** Two-phase salted aggregation: partial agg on (key, salt) spreads a hot
    * key across partitions, final agg on key merges the partials. For
    * algebraic aggregates (sum/count/min/max) this is exact.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     saltBuckets: Int, seed: Long = 42L): DataFrame = {
    val partial = df
      .withColumn("__salt", (rand(seed) * saltBuckets).cast("int"))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("n"))
  }
}
