package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.StreamingEnergy

/** Dev tool: state-store PROVIDER comparison at production key scale —
  * the SCALING.md evidence that the streaming surface holds when per-key
  * state stops fitting in executor heap (VERDICT r7 item 5).
  *
  *   StateScale [nKeys] [eventsPerKey] [provider]   // default 1M × 4 both
  *
  * `provider` = `memory` | `rocksdb` | `both` (default): run one provider
  * in isolation — at key counts where the in-memory provider approaches
  * its heap ceiling, its failure must not take the RocksDB measurement
  * down with it.
  *
  * Synthesizes `nKeys · eventsPerKey` readings DISTRIBUTED (key space
  * 0..nKeys, event times spread so arrival order is realistic), stages
  * them as 16 time-ranged files, and drives
  * [[StreamingEnergy.runningTotals]] — per-key `mapGroupsWithState` with
  * NO eviction, so final state rows == key population, the worst-case
  * state shape — through BOTH providers:
  *
  *  - default in-memory (`HDFSBackedStateStoreProvider`): state lives on
  *    the executor heap; 1M+ keys × state bytes compete with shuffle and
  *    cache memory, and every checkpoint snapshots the full map;
  *  - `RocksDBStateStoreProvider`: state lives off-heap in RocksDB with
  *    incremental changelog checkpoints — the provider a production
  *    deployment runs once keys reach the tens of millions.
  *
  * Three numbers per provider: DRAIN (8 micro-batches over all files —
  * steady-state ingest), final state rows (must equal `nKeys` — the
  * boundedness contract), and RESTART (a fresh query on the same
  * checkpoint with 2 more staged files — the recovery path, which must
  * reload/open 1M keys of state before its first batch commits).
  *
  * The provider conf is read at QUERY start, so both runs share one
  * session; each gets its own checkpoint directory.
  */
object StateScale {

  def main(args: Array[String]): Unit = {
    val nKeys = args.headOption.map(_.toInt).getOrElse(1000000)
    val perKey = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = nKeys.toLong * perKey
    // deterministic synthetic readings: user ids cycle so every staged
    // file touches the full key range (state grows to nKeys by the first
    // batches, stressing the store early, not only at the end)
    def synth(ids: org.apache.spark.sql.Dataset[java.lang.Long]): DataFrame =
      ids.select(
        col("id").as("event_id"),
        // integer-math event time: 2024-01-01 epoch-micros + 3s per event
        timestamp_micros(lit(1704067200000000L) + col("id") * 3000000L)
          .as("ts"),
        (col("id") % nKeys).as("user_id"),
        lit("reading").as("event_type"),
        ((col("id") % 97).cast("double") / 10.0).as("value"))

    val staged = Files.createTempDirectory("statescale-src").toString
    synth(spark.range(n))
      .repartitionByRange(16, col("event_id"))
      .sortWithinPartitions(col("event_id"))
      .write.mode("overwrite").parquet(staged)
    val extra = Files.createTempDirectory("statescale-extra").toString
    synth(spark.range(n, n + n / 8)).coalesce(2)
      .write.mode("overwrite").parquet(extra)
    val schema = spark.read.parquet(staged).schema
    println(s"[statescale] $n events over $nKeys keys staged")

    val only = args.lift(2).getOrElse("both")
    val providers = Seq(
      "memory" ->
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
      "rocksdb" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .filter { case (name, _) => only == "both" || only == name }

    for ((name, cls) <- providers) {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", cls)
      val ckpt = Files.createTempDirectory(s"statescale-$name").toString
      def query(src: String) = StreamingEnergy.runningTotals(spark,
          spark.readStream.schema(schema).option("maxFilesPerTrigger", "2")
            .parquet(src))
        .toDF()
        .writeStream.format("noop").outputMode("update")
        .option("checkpointLocation", ckpt)

      // DRAIN: 8 micro-batches of steady-state ingest
      val q1 = query(staged).start()
      val t0 = System.nanoTime()
      q1.processAllAvailable()
      val drain = (System.nanoTime() - t0) / 1e9
      val state = q1.recentProgress.toSeq.reverse
        .find(_.stateOperators.nonEmpty).map(_.stateOperators)
      val stateRows = state.map(_.map(_.numRowsTotal).sum).getOrElse(0L)
      val stateMb =
        state.map(_.map(_.memoryUsedBytes).sum).getOrElse(0L) / 1048576.0
      q1.stop()
      require(stateRows == nKeys,
        s"state boundedness broken: $stateRows rows != $nKeys keys")

      // RESTART: new query, same checkpoint, 2 more files — recovery must
      // reload the full key population before the first commit. File-source
      // checkpoints pin the listing to the original path, so the extra
      // files are copied INTO the staged dir (arrival, not re-stage).
      val fs = new org.apache.hadoop.fs.Path(staged)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      new java.io.File(extra).listFiles()
        .filter(_.getName.endsWith(".parquet")).foreach { f =>
          fs.copyFromLocalFile(false, true,
            new org.apache.hadoop.fs.Path(f.getPath),
            new org.apache.hadoop.fs.Path(staged, s"extra-$name-${f.getName}"))
        }
      val q2 = query(staged).start()
      val t1 = System.nanoTime()
      q2.processAllAvailable()
      val restart = (System.nanoTime() - t1) / 1e9
      q2.stop()

      println(f"[statescale] $name: drain=$drain%.2f s " +
        f"(${n / drain / 1000}%.0f krows/s) state_rows=$stateRows " +
        f"state_mb=$stateMb%.1f restart=$restart%.2f s")
    }
    spark.stop()
  }
}
