package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Similarity
import graft.io.Tables

/** Dev-only A/B for VERDICT r19 item 3: Similarity.neighborPairs
  * (q_embedding_neardup / q_semantic_dedup) as the SHIPPED bucket
  * self-join vs the grouped-array form (groupBy(bkt) → sorted member
  * array → ordered pairs via slice/transform, the r19 co-purchase
  * rewrite). Reports wall + executor-CPU + EXTERNAL cpu gating like the
  * dedup A/B that led to the r19 revert, and checks the two outputs are
  * row-identical (cosine is the same codegen'd dot over the same unit
  * vectors, so equality must be exact).
  */
object ProfileNP {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.SessionTuning(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var cpuNs = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) cpuNs += m.executorCpuTime
      }
    })
    val emb = Tables.embeddings(spark, dir)
    val threshold = 0.3

    def joinForm() = Similarity.neighborPairs(
      emb, "vec_id", "embedding", "label", threshold)

    // grouped-array candidate form: one exchange (groupBy bkt), ordered
    // pairs from the uid-sorted member array, identical cosine expression
    def arrayForm() = {
      val unit = emb.select(col("label").as("bkt"),
        col("vec_id").as("uid"),
        Similarity.unitVec(col("embedding")).as("uvec"))
      val grouped = unit.groupBy(col("bkt"))
        .agg(array_sort(collect_list(struct(col("uid"), col("uvec"))))
          .as("ms"))
        .filter(size(col("ms")) >= 2)
      val sa = col("ms")
      val pairs = flatten(transform(sa, (x, i) =>
        transform(slice(sa, i + 2, size(sa) - i - 1),
          y => struct(x.as("a"), y.as("b")))))
      grouped.select(explode(pairs).as("p"))
        .select(col("p.a.uid").as("id_a"), col("p.b.uid").as("id_b"),
          round(Similarity.dot(col("p.a.uvec"), col("p.b.uvec")) + lit(1e-9),
            6).as("cosine"))
        .filter(col("cosine") >= threshold)
    }

    // equality first (cheap at sf0.1)
    val a = joinForm(); val b = arrayForm()
    val d1 = a.exceptAll(b).count(); val d2 = b.exceptAll(a).count()
    println(s"[np] exceptAll join-vs-array: $d1 / $d2 (must be 0/0)")

    def bench(name: String)(f: () => org.apache.spark.sql.DataFrame): Unit = {
      (1 to 3).foreach { i =>
        spark.catalog.clearCache(); System.gc()
        val c0 = cpuNs
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(50)
        println(f"[np] $name run$i wall=$sec%.2f cpu=${(cpuNs - c0) / 1e9}%.2f")
      }
    }
    bench("join")(joinForm _)
    bench("array")(arrayForm _)
    bench("join")(joinForm _) // ABBA to expose JIT drift
    bench("array")(arrayForm _)
    spark.stop()
  }
}
