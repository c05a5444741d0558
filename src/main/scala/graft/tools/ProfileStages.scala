package graft.tools

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only: run named queries once and print EVERY completed stage's
  * executor CPU, wall span, task count, records and shuffle bytes, with the
  * stage's name/callsite — the per-stage localization step the optimization
  * guide's empirical loop starts from (UI is disabled on this box, so this
  * replaces the Stages tab). Output is ranked by CPU so the hotspot is the
  * first line.
  */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.SessionTuning(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    final case class St(id: Int, name: String, cpuSec: Double,
        wallSec: Double, tasks: Int, recordsIn: Long, shuffleReadMb: Double,
        shuffleWriteMb: Double)
    val stages = ArrayBuffer.empty[St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val m = i.taskMetrics
        if (m != null) stages.synchronized {
          stages += St(i.stageId, i.name.takeWhile(_ != '\n').take(120),
            m.executorCpuTime / 1e9,
            (for {a <- i.completionTime; b <- i.submissionTime}
              yield (a - b) / 1e3).getOrElse(-1.0),
            i.numTasks,
            m.inputMetrics.recordsRead + m.shuffleReadMetrics.recordsRead,
            m.shuffleReadMetrics.totalBytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6)
        }
      }
    })
    graft.SparkEntry.entry(spark).count()
    // drain the listener bus before clearing, so late-arriving warm-up
    // stage-completed events are never misattributed to the first
    // profiled query (ADVICE r19)
    org.apache.spark.graft.ListenerBridge.drain(spark.sparkContext)
    for (q <- args.drop(1)) {
      spark.catalog.clearCache(); System.gc()
      org.apache.spark.graft.ListenerBridge.drain(spark.sparkContext)
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.ListenerBridge.drain(spark.sparkContext)
      val snap = stages.synchronized(stages.toVector)
      println(f"%n===== $q: wall $wall%.2f s, rows $n, " +
        f"stages ${snap.size}, cpu ${snap.map(_.cpuSec).sum}%.1f s =====")
      snap.sortBy(-_.cpuSec).take(25).foreach { s =>
        println(f"  cpu ${s.cpuSec}%7.2f  wall ${s.wallSec}%6.2f  " +
          f"tasks ${s.tasks}%3d  rec ${s.recordsIn}%10d  " +
          f"shRd ${s.shuffleReadMb}%8.1f MB shWr ${s.shuffleWriteMb}%8.1f " +
          f"MB  [${s.id}] ${s.name}")
      }
    }
    spark.stop()
  }
}
