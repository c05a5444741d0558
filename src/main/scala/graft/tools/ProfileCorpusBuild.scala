package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only barrier profiler for the corpus-build family (VERDICT r16
  * item 6): how many Spark JOBS does one q_corpus_build_batched /
  * q_corpus_build_b16 run fire, how long does each take, and how much of
  * the query's wall clock is job time vs driver-side gaps between jobs?
  * The batched BPE trainer is ONE pool job per iteration by construction
  * (iterations are sequentially dependent — each batch's merges rewrite
  * the dictionary the next pool counts), so if the job census shows the
  * trainer's jobs already at the iteration count, the barriers are
  * minimal and the wall variance is job-internal, not orchestration.
  *
  * Usage: ProfileCorpusBuild [sfDir] [queryName ...]
  */
object ProfileCorpusBuild {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val queries =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q_corpus_build_batched", "q_corpus_build_b16")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    System.setProperty("graft.phases.corpus", "1")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobs = new ConcurrentLinkedQueue[(Int, Long, Long)]() // id, t0, t1
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, System.nanoTime())
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val t0 = starts.remove(j.jobId)
        if (t0 != null) jobs.add((j.jobId, t0, System.nanoTime()))
        ()
      }
    })
    graft.SparkEntry.entry(spark).count() // warm codegen paths
    for (q <- queries; pass <- Seq("cold", "warm")) {
      spark.catalog.clearCache(); System.gc()
      jobs.clear(); PhaseTimer.clear()
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      val js = jobs.asScala.toSeq.sortBy(_._2)
      val jobSec = js.map(j => (j._3 - j._2) / 1e9)
      // serialized job time: the union of job windows (overlapping
      // concurrent jobs collapse), so wall - covered = pure driver gaps
      val covered = {
        var acc = 0L; var hi = Long.MinValue
        js.foreach { case (_, s, e) =>
          if (s > hi) { acc += e - s; hi = e }
          else if (e > hi) { acc += e - hi; hi = e }
        }
        acc / 1e9
      }
      println(f"[pcb] $q $pass: wall=$wall%.2f s rows=$n " +
        f"jobs=${js.size} jobSecSum=${jobSec.sum}%.2f " +
        f"jobCovered=$covered%.2f driverGaps=${wall - covered}%.2f " +
        f"maxJob=${if (jobSec.isEmpty) 0.0 else jobSec.max}%.2f " +
        f"subSecondJobs=${jobSec.count(_ < 1.0)}")
      val ph = PhaseTimer.snapshot.toSeq.sortBy(-_._2)
      ph.foreach { case (k, v) => println(f"[pcb]   phase $k: $v%.2f s") }
    }
    spark.stop()
  }
}
