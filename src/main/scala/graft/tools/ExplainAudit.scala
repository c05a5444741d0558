package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev-only: dump formatted physical plans for the named queries (or a
  * default audit set) so pushdown / pruning / broadcast / codegen can be
  * eyeballed and asserted.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_daily_agg", "q_filtered_agg", "q_dim_join",
        "q_revenue_by_nation", "q_rolling_stats", "q_ann_ivf", "q_topk_users")
    val spark = graft.SessionTuning(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // EXPLAIN_EXECUTED=1 → run the query and print the FINAL post-AQE
    // executed plan instead of the pre-execution formatted one
    val executed = sys.env.get("EXPLAIN_EXECUTED").contains("1")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val df = SparkEntry.queries(n)(spark, dir)
      if (executed) {
        df.collect()
        println(df.queryExecution.executedPlan.toString)
      } else df.explain("formatted")
    }
    spark.stop()
  }
}
