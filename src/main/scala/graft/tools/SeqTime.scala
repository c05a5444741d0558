package graft.tools

/** Dev tool: run named queries in sequence in one warm JVM (bench-like
  * conditions — clearCache + gc between queries) and print wall times PLUS
  * executor CPU seconds (the load-invariant number the round-6+ triage
  * protocol compares — wall moved + cpu flat = host noise, cpu moved =
  * real plan change). Repeat a query name to see warm-cache behavior.
  */
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
object SeqTime {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cpuNs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          cpuNs.addAndGet(t.taskMetrics.executorCpuTime)
    })
    graft.SparkEntry.entry(spark).count()
    def load(): String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0)
      catch { case _: Exception => "?" }
    for (q <- args.drop(1)) {
      spark.catalog.clearCache(); System.gc()
      val l0 = load()
      val c0 = cpuNs.get()
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously; settle before reading cpu
      Thread.sleep(300)
      val cpu = (cpuNs.get() - c0) / 1e9
      println(f"[seq] $q: $wall%.2f s cpu=$cpu%.1f s rows=$n " +
        f"load=$l0/${load()}")
    }
    spark.stop()
  }
}
