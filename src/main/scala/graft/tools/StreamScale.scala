package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.StreamingEnergy

/** Dev tool: replay the `events` table as a file-source stream through
  * each stateful streaming operator and measure throughput + state size —
  * the SCALING.md evidence for the streaming surface.
  *
  *   StreamScale <sfDir>
  *
  * Replay is micro-batched (`maxFilesPerTrigger`) so the run exercises
  * real incremental state maintenance, not one giant batch; the sink is
  * `noop` (zero sink cost — the operator IS the measurement). State rows
  * and bytes come from the last progress event carrying state-operator
  * metrics; rows/sec = table rows / wall to drain.
  */
object StreamScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Stage the source as 16 TIME-RANGED files (file source lists paths in
    // order, so part-00000..part-00015 replay roughly in event time — the
    // realistic arrival order watermark eviction is designed for) and
    // trigger 2 files per micro-batch → an 8-batch incremental replay
    // exercising real state maintenance, not one giant batch.
    val staged = Files.createTempDirectory("streamscale-src").toString
    spark.read.parquet(s"$dir/events.parquet")
      .repartitionByRange(16, col("ts"))
      .sortWithinPartitions(col("ts"))
      .write.mode("overwrite").parquet(staged)
    val path = staged
    val rawSchema = spark.read.parquet(path).schema
    val totalRows = spark.read.parquet(path).count()
    val ckptBase = Files.createTempDirectory("streamscale").toString
    println(s"[streamscale] $totalRows events from $path")

    // schema-adaptive ts (same dispatch as Tables.events): nanos-era files
    // read as BIGINT under the legacy conf and need the div-1000 shim;
    // current micros fixtures read natively as TIMESTAMP_NTZ
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    def stream: DataFrame = {
      val raw = spark.readStream.schema(rawSchema)
        .option("maxFilesPerTrigger", "2").parquet(path)
      rawSchema("ts").dataType match {
        case LongType => raw.withColumn("ts",
          expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
        case TimestampNTZType => raw
        case _ => raw.withColumn("ts", col("ts").cast(TimestampNTZType))
      }
    }

    def run(name: String, mode: String)(build: DataFrame => DataFrame): Unit = {
      val q = build(stream).writeStream.format("noop").outputMode(mode)
        .option("checkpointLocation", s"$ckptBase/$name").start()
      val t0 = System.nanoTime()
      q.processAllAvailable()
      val wall = (System.nanoTime() - t0) / 1e9
      val progress = q.recentProgress.toSeq
      val batches = progress.count(_.numInputRows > 0)
      val state = progress.reverse
        .find(_.stateOperators.nonEmpty).map(_.stateOperators)
      val stateRows = state.map(_.map(_.numRowsTotal).sum).getOrElse(0L)
      val stateMb =
        state.map(_.map(_.memoryUsedBytes).sum).getOrElse(0L) / 1048576.0
      q.stop()
      println(f"[streamscale] $name: wall=$wall%.2f s " +
        f"rate=${totalRows / wall / 1000}%.0f krows/s batches=$batches " +
        f"state_rows=$stateRows state_mb=$stateMb%.1f")
    }

    run("hourly_agg", "update")(df => StreamingEnergy.hourlyAgg(df))
    run("dedup_stream", "append")(df =>
      StreamingEnergy.dedupStream(df, Seq("event_id")))
    run("running_totals", "update")(df =>
      StreamingEnergy.runningTotals(spark, df).toDF())
    run("funnel_stages", "update")(df =>
      StreamingEnergy.funnelStages(spark, df).toDF())
    run("daily_features", "append")(df =>
      StreamingEnergy.streamingDailyFeatures(spark, df).toDF())
    spark.stop()
  }
}
