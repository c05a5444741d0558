package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and split assignment for
  * training-data pipelines.
  *
  * `df.sample()` draws from a partition-seeded RNG: membership changes
  * under repartitioning, retries, and engine swaps — unusable for a stable
  * train/eval split over a growing corpus. The standard fix is HASH
  * bucketing: membership is a pure function of (salt, id), so it is
  * reproducible everywhere (including the DuckDB oracle, via
  * [[Dedup.tokenHash]]'s md5 derivation), stable as the corpus grows, and
  * embarrassingly parallel (a narrow filter — no shuffle, pushes past
  * scans).
  */
object Sampling {

  /** Stable bucket in [0, buckets) from a salted id — the salt decorrelates
    * independent samples over the same ids.
    */
  def hashBucket(id: Column, salt: String, buckets: Int = 100): Column =
    pmod(Dedup.tokenHash(concat(lit(salt + ":"), id.cast("string"))),
      lit(buckets.toLong))

  /** Deterministic Bernoulli-style sample: keeps ~pct% of rows. */
  def deterministicSample(df: DataFrame, idCol: String, salt: String,
                          pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct=$pct must be in [0,100]")
    df.filter(hashBucket(col(idCol), salt) < pct)
  }

  /** Train/val/test split assignment (e.g. 80/10/10): adds a `split`
    * column. Every row lands in exactly one split and stays there forever
    * — rows added to the corpus later cannot move existing rows.
    */
  def withSplit(df: DataFrame, idCol: String, salt: String,
                trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"invalid split ($trainPct/$valPct/${100 - trainPct - valPct})")
    val b = hashBucket(col(idCol), salt)
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }
}
