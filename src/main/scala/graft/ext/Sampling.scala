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

  /** Exact stratified sample: the first `n` rows of each stratum under a
    * deterministic hash order (salted token hash, id tie-break — the hash is
    * 32-bit so collisions exist; the id breaks them stably). Adds
    * `samp_rank` ∈ [1, n].
    *
    * Scale: one shuffle on the strata; rank ≤ n prunes inside the window
    * exec. Strata are per-task — for a huge stratum count this is the right
    * shape; for few huge strata prefer [[deterministicSample]] (narrow, no
    * shuffle) with a rate instead of an exact count.
    */
  def stratifiedSample(df: DataFrame, strataCols: Seq[String], idCol: String,
                       salt: String, n: Int): DataFrame = {
    require(n > 0, s"n=$n must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCols.map(col): _*)
      .orderBy(hashKey(col(idCol), salt), col(idCol))
    df.withColumn("samp_rank", row_number().over(w).cast("long"))
      .filter(col("samp_rank") <= n)
  }

  /** Raw salted hash (full 32-bit range, not bucketed) — the stable sort
    * key behind [[stratifiedSample]].
    */
  def hashKey(id: Column, salt: String): Column =
    Dedup.tokenHash(concat(lit(salt + ":"), id.cast("string")))

  /** Mixture resampling: down-sample each source to a target percentage
    * (`weights`, falling back to `defaultPct`) so the kept corpus matches a
    * training-mixture recipe. Membership is the same pure hash function as
    * [[deterministicSample]] — reproducible, growth-stable, narrow (no
    * shuffle; the when-chain is codegen'd, no join against a weights table
    * needed while the source domain is bounded).
    */
  def mixtureSample(df: DataFrame, sourceCol: String, weights: Map[String, Int],
                    defaultPct: Int, idCol: String, salt: String): DataFrame = {
    require((weights.values ++ Seq(defaultPct)).forall(p => p >= 0 && p <= 100),
      "every mixture weight must be a percentage in [0,100]")
    val pct = weights.toSeq.sortBy(_._1).foldRight(lit(defaultPct)) {
      case ((src, p), els) => when(col(sourceCol) === src, lit(p)).otherwise(els)
    }
    df.filter(hashBucket(col(idCol), salt) < pct)
  }

  /** Mixture with UPSAMPLING: weights may exceed 100 (e.g. 250 = every doc
    * appears 2× plus a deterministic 50% gets a 3rd copy) — the "N epochs
    * of a high-value source" recipe in pretraining mixtures. Adds `epoch`
    * (0-based copy index). `floor(pct/100)` full epochs keep every row; the
    * one trailing partial epoch keeps the stable [[hashBucket]] subset, so
    * repeated runs replicate exactly the same rows.
    *
    * Scale: the explode is row-local (narrow); the blow-up factor is the
    * mixture weight itself, which is the intended output size.
    */
  def mixtureUpsample(df: DataFrame, sourceCol: String,
                      weights: Map[String, Int], defaultPct: Int,
                      idCol: String, salt: String): DataFrame = {
    require((weights.values ++ Seq(defaultPct)).forall(_ >= 0),
      "every mixture weight must be a non-negative percentage")
    val pct = weights.toSeq.sortBy(_._1).foldRight(lit(defaultPct)) {
      case ((src, p), els) => when(col(sourceCol) === src, lit(p)).otherwise(els)
    }
    // top epoch = ceil(pct/100) − 1, floored at 0 (a sequence stop below
    // the start would flip the step sign and emit a bogus epoch −1); the
    // epoch-0 row of a pct=0 source is dropped by the filter
    val topEpoch = greatest(
      ((col("__pct") + 99) / 100).cast("int") - 1, lit(0))
    df.withColumn("__pct", pct)
      .withColumn("epoch", explode(sequence(lit(0), topEpoch)))
      .filter(col("epoch") * 100 + hashBucket(col(idCol), salt) < col("__pct"))
      .drop("__pct")
      .withColumn("epoch", col("epoch").cast("long"))
  }

  /** Temperature-derived mixture targets — the multilingual-pretraining
    * recipe where per-group sampling weight is LEARNED from the corpus's
    * own group sizes instead of hand-set ([[mixtureSample]]'s contract):
    * `w_i = n_i^alpha / Σ_j n_j^alpha`, flattening the head and boosting
    * the tail as `alpha → 0` (alpha = 1/T in the usual parameterization;
    * alpha = 1 reproduces natural proportions). Returns one row per group:
    * `(group, n_docs, w_temp, n_target)` with `w_temp` guard-rounded to
    * 6dp (the house determinism contract — `n_target` derives from the
    * ROUNDED weight so an oracle replays it bit-exactly) and
    * `n_target = min(floor(w_temp · floor(share·N)), n_docs)` where N is
    * the corpus size.
    *
    * Scale: one map-side-combined count aggregate (|groups| rows — tiny),
    * then the normalizer and corpus total ride a 1-row global aggregate
    * cross-joined back under the groups frame — a scalar attach (the
    * q_bm25 corpus-stats pattern), never a single-partition window and
    * never a driver-side count: the whole computation stays in-plan.
    */
  def temperatureTargets(df: DataFrame, groupCol: String, alpha: Double,
                         share: Double): DataFrame = {
    require(alpha > 0, s"alpha=$alpha must be positive")
    require(share > 0 && share <= 1, s"share=$share must be in (0,1]")
    val counts = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("__pw", pow(col("n_docs").cast("double"), lit(alpha)))
    val norm = counts.agg(sum(col("__pw")).as("__z"),
      sum(col("n_docs")).as("__n"))
    counts.crossJoin(broadcast(norm))
      .withColumn("w_temp", round(col("__pw") / col("__z") + lit(1e-9), 6))
      .withColumn("__budget",
        floor(lit(share) * col("__n") + lit(1e-9)))
      .withColumn("n_target",
        least(floor(col("w_temp") * col("__budget") + lit(1e-9)).cast("long"),
          col("n_docs")))
      .drop("__pw", "__z", "__n", "__budget")
  }

  /** Realize [[temperatureTargets]]: keep exactly `n_target` rows per
    * group under the deterministic [[hashKey]] order (id tie-break), so
    * membership is reproducible, engine-portable, and stable under
    * repartitioning. Adds `samp_rank` ∈ [1, n_target].
    *
    * Scale: the targets frame is |groups| rows → broadcast join (null-safe
    * on the group key, so a NULL group is sampled like any other — the
    * targets frame reports it, the realization must honor it); the rank
    * window is the same one-shuffle shape as [[stratifiedSample]] (for few
    * huge strata prefer a rate-based variant — see that method's note).
    */
  def temperatureSample(df: DataFrame, groupCol: String, idCol: String,
                        salt: String, alpha: Double,
                        share: Double): DataFrame =
    temperatureSampleWith(df, temperatureTargets(df, groupCol, alpha, share),
      groupCol, idCol, salt)

  /** [[temperatureSample]] against ALREADY-COMPUTED targets (the frame
    * [[temperatureTargets]] returns) — callers that also publish the
    * targets avoid recomputing the count + normalizer subplan twice.
    */
  def temperatureSampleWith(df: DataFrame, targets: DataFrame,
                            groupCol: String, idCol: String,
                            salt: String): DataFrame = {
    val t = targets.select(col(groupCol).as("__grp"), col("n_target"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(hashKey(col(idCol), salt), col(idCol))
    df.join(broadcast(t), col(groupCol) <=> col("__grp"))
      .drop("__grp")
      .withColumn("samp_rank", row_number().over(w).cast("long"))
      .filter(col("samp_rank") <= col("n_target"))
      .drop("n_target")
  }
}
