package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: print the formatted plan of a named SparkEntry query. */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_hourly_agg")
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.collect()
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
