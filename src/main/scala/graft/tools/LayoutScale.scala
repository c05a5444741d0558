package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Layout

/** Dev tool: measure what data LAYOUT buys a selective scan — the
  * evidence behind `Layout.zValue`'s 100 TB claim.
  *
  * Writes the (scaled) events table three ways at small parquet
  * row-groups (so footer-stat skipping has resolution), then times two
  * selective predicates over each layout in one warm JVM:
  *
  *  - `unsorted`   — repartition(shuffle-random): no dimension clustered
  *  - `user-sorted`— rangeSortedParquet on user_id: perfect on user,
  *                   nothing on ts
  *  - `z-order`    — sorted by the Morton interleave of (user, ts-hour)
  *                   buckets: bounded min/max for BOTH dims in every
  *                   row-group
  *
  * Parquet has no file-level stats pruning in Spark's scan planning —
  * the win is ROW-GROUP skipping inside the reader, which shows up as
  * scan wall-time (decode work), not in the numFiles metric. Reps are
  * median-of-3 warm.
  *
  * Usage: LayoutScale <eventsDir> <workDir>
  */
object LayoutScale {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val work = args.lift(1).getOrElse("/tmp/layout_scale")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // small row-groups: skipping resolution for the experiment
      // (spark.hadoop. prefix — plain keys never reach the writer conf)
      .config("spark.hadoop.parquet.block.size",
        (1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = graft.io.Tables.events(spark, src)
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
    val n = ev.count()
    val users = ev.agg(max(col("user_id"))).head().getLong(0)
    // z-key: user bucket interleaved with the event's hour-of-corpus
    val hours = ev.agg(
      ((unix_timestamp(max(col("ts"))) -
        unix_timestamp(min(col("ts")))) / 3600).cast("long")).head().getLong(0)
    val tsMin = ev.agg(unix_timestamp(min(col("ts")))).head().getLong(0)
    val zed = ev.withColumn("zk", Layout.zValue(
      col("user_id").cast("int"),
      ((unix_timestamp(col("ts")) - tsMin) / 3600).cast("int"), bits = 16))
    println(s"[layout] rows=$n users=$users hours=$hours")

    zed.repartition(32).write.mode("overwrite")
      .parquet(s"$work/unsorted")
    graft.io.Writers.rangeSortedParquet(zed, s"$work/user_sorted",
      Seq("user_id"), numFiles = 32)
    graft.io.Writers.rangeSortedParquet(zed, s"$work/z_order",
      Seq("zk"), numFiles = 32)

    val uLo = users / 2
    val uHi = users / 2 + math.max(1L, users / 100)
    val tLo = tsMin + hours * 3600 / 2
    val tHi = tLo + math.max(1L, hours / 100) * 3600
    def timeQ(df: DataFrame, name: String, filter: org.apache.spark.sql.Column)
        : Unit = {
      val times = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val rows = df.filter(filter).agg(count(lit(1)), sum(col("value")))
          .head()
        ((System.nanoTime() - t0) / 1e6, rows.getLong(0))
      }
      val med = times.map(_._1).sorted.apply(1)
      println(f"[layout] $name: ${med}%.0f ms rows=${times.head._2}")
    }
    for (layout <- Seq("unsorted", "user_sorted", "z_order")) {
      val df = spark.read.parquet(s"$work/$layout")
      timeQ(df, s"$layout/user-pred",
        col("user_id").between(uLo, uHi))
      // literal timestamps on the RAW column — a unix_timestamp() wrap
      // would defeat parquet pushdown and mask every layout difference
      timeQ(df, s"$layout/ts-pred",
        col("ts").between(timestamp_seconds(lit(tLo)), timestamp_seconds(lit(tHi))))
      timeQ(df, s"$layout/2d-pred",
        col("user_id").between(uLo, users / 2 + users / 10) &&
          col("ts").between(timestamp_seconds(lit(tLo)),
            timestamp_seconds(lit(tLo + math.max(1L, hours / 10) * 3600))))
    }
    spark.stop()
  }
}
