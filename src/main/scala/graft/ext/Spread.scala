package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Partition-spreading for CPU-dense narrow stages.
  *
  * Parquet splits are sized by BYTES (`spark.sql.files.maxPartitionBytes`),
  * which is right for IO-bound scans and wrong for compute-bound ones: a
  * few MB of text scan as ONE split, so every CPU-heavy projection rooted
  * on that scan — shingling, per-token hashing, regex stats — runs as a
  * single task no matter how many cores the cluster has (measured 7× on
  * the MinHash signature stage at sf0.1 on local[32]).
  *
  * [[cpu]] hash-repartitions the frame on `key` up to the session default
  * parallelism, ONLY when the scan yields fewer partitions: at real corpus
  * scale the scan already has thousands of splits and this is a no-op.
  * When it does fire, the shuffle is usually free anyway — downstream
  * per-`key` aggregations are satisfied by the introduced hash
  * partitioning and skip their own exchange.
  *
  * Call it on scan-rooted frames only: `rdd.getNumPartitions` on a
  * post-shuffle frame would force AQE query-stage execution.
  */
object Spread {
  def cpu(df: DataFrame, key: String): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target, col(key))
    else df
  }
}
