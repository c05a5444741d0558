package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.CacheScope.Cacheable

/** Corpus-distribution diagnostics: how far each slice (source, split,
  * time-bucket) drifts from the overall token distribution — the monitoring
  * signal a training-data pipeline watches while mixing/ingesting.
  */
object Drift {

  /** Per-group Jensen-Shannon divergence (nats, ∈ [0, ln 2]) between the
    * group's token distribution P and the whole corpus's Q.
    *
    * The textbook sum runs over the full vocabulary for every group —
    * a (groups × vocab) materialization. This shape avoids it: for tokens
    * ABSENT from the group (p=0) the JSD term is ½·q·ln 2, so
    *
    *   JSD = ½ Σ_{t∈G} [p·ln(p/m) + q·ln(q/m)] + ½·ln2·(1 − Σ_{t∈G} q)
    *
    * and every sum ranges only over the group's OWN tokens. Cost: one
    * explode, two token-level groupBys (map-side combined), one join on the
    * token, one small groupBy per group — no cross join at any scale.
    */
  def tokenDistributionJsd(df: DataFrame, textCol: String,
                           groupCol: String): DataFrame = {
    val toks = df.select(col(groupCol),
      explode(TextAnalysis.tokens(lower(col(textCol)))).as("t"))
    // cache: feeds the per-group counts AND the overall counts — one
    // explode pass instead of two
    val grpTok = toks.groupBy(col(groupCol), col("t"))
      .agg(count(lit(1)).as("c_gt")).scopedCache()
    val grpTotals = grpTok.groupBy(col(groupCol))
      .agg(sum(col("c_gt")).as("n_g"))
    val overall = grpTok.groupBy(col("t")).agg(sum(col("c_gt")).as("c_t"))
    // empty/all-null corpus: the total is a null row; any placeholder works
    // because grpTok is empty too, so the output is empty either way — the
    // guard only prevents the NPE
    val totRow = overall.agg(sum(col("c_t"))).head
    val n = if (totRow.isNullAt(0) || totRow.getLong(0) == 0L) 1.0
            else totRow.getLong(0).toDouble
    val joined = grpTok.join(overall, "t").join(grpTotals, groupCol)
      .withColumn("p", col("c_gt").cast("double") / col("n_g"))
      .withColumn("q", col("c_t").cast("double") / n)
      .withColumn("m", (col("p") + col("q")) / 2)
    joined.groupBy(col(groupCol))
      .agg(
        sum(col("p") * log(col("p") / col("m"))).as("__kl_p"),
        sum(col("q") * log(col("q") / col("m"))).as("__kl_q"),
        sum(col("q")).as("__q_cov"),
        first(col("n_g")).as("n_tokens"))
      .select(col(groupCol), col("n_tokens"),
        ((col("__kl_p") + col("__kl_q")) / 2 +
          (lit(1.0) - col("__q_cov")) * math.log(2) / 2).as("jsd"))
  }
}
