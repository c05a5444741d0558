package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only conf A/B probe: run named SparkEntry queries under explicit
  * SQL confs and report wall, executor-CPU and TASK COUNT per query —
  * the three axes of the 32-core anti-scaling adjudication (VERDICT r19
  * item 2: suite CPU 796 cpu-s at 32 cores vs 317 at 8 for identical
  * work, zero spill, wall flat — per-task fixed cost, not compute).
  *
  * Usage: ConfProbe <cpus> <sfDir> <q1,q2,...> [k=v ...]
  * Each query runs cold then warm (JIT separated), caches cleared per run
  * like Bench.
  */
object ConfProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("32")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val qs = args.lift(2).getOrElse("q_rolling_actives").split(",").toSeq
    val confs = args.drop(3).map { kv =>
      val Array(k, v) = kv.split("=", 2); (k, v)
    }
    val b = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    confs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var cpuNs = 0L
    @volatile var tasks = 0L
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) { cpuNs += m.executorCpuTime; tasks += s.stageInfo.numTasks }
        stages.add(f"n=${s.stageInfo.numTasks}%4d cpu=${if (m == null) 0.0 else m.executorCpuTime / 1e9}%6.2f ${s.stageInfo.name.take(90)}")
      }
    })
    // warmup like Bench: compile common codegen paths + warm file metadata
    graft.SparkEntry.entry(spark).count()
    println(s"[probe] cpus=$cpus confs=${confs.mkString(",")}")
    qs.foreach { q =>
      Seq("cold", "warm").foreach { pass =>
        spark.catalog.clearCache(); System.gc()
        val (c0, k0) = (cpuNs, tasks)
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, dir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(50)
        println(f"[probe] $q $pass wall=$sec%.2f cpu=${(cpuNs - c0) / 1e9}%.2f tasks=${tasks - k0}")
        if (sys.env.get("PROBE_STAGES").contains("1") && pass == "warm") {
          stages.forEach(s => println(s"[stage] $s"))
        }
        stages.clear()
      }
    }
    spark.stop()
  }
}
