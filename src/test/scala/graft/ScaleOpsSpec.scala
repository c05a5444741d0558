package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Layout, Scd2, Sketches, TextAnalysis}

/** Late round-4 scale operators: Z-order interleave, SCD2 compaction,
  * count-min sketch.
  */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  // JVM reference interleave, independently written
  private def zRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (z, i) =>
      z | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zValue matches a reference Morton interleave on sample coords") {
    val coords = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 9L), (63L, 63L),
      (42L, 17L))
    val got = coords.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y"), 6).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    coords.foreach { case (x, y) =>
      assert(got((x, y)) == zRef(x, y, 6), s"($x, $y)")
    }
  }

  test("zValue SQL twin generates the same values through Spark SQL") {
    // the oracle string is plain integer arithmetic — Spark parses it too,
    // so the twin is pinned against the Column form engine-internally
    val df = Seq((5L, 9L), (63L, 0L), (12L, 34L)).toDF("x", "y")
    val both = df.select(
      Layout.zValue(col("x"), col("y"), 6).as("a"),
      expr(Layout.zValueSql("x", "y", 6)).as("b"))
    assert(both.filter(col("a") =!= col("b")).count() == 0)
  }

  test("zValue locality: adjacent cells share high bits") {
    // the defining property the layout query exploits: the 4 quadrant bits
    // of a 6-bit interleave equal the 2-bit quadrant coords interleaved
    val z = zRef(13L, 37L, 6)
    assert((z >> 8) == zRef(13L >> 4, 37L >> 4, 2))
  }

  test("Scd2.intervals compacts runs and versions changes") {
    val obs = Seq(
      (1L, 10L, "a"), (1L, 20L, "a"), (1L, 30L, "b"), (1L, 40L, "a"),
      (2L, 10L, "x"))
      .toDF("k", "t", "v")
    val r = Scd2.intervals(obs, "k", "t", "v")
      .collect().map(x => (x.getLong(0), x.getInt(1)) ->
        (x.getLong(2), Option(x.get(3)).map(_.asInstanceOf[Long]),
          x.getString(4))).toMap
    assert(r.size == 4)
    assert(r((1L, 1)) == ((10L, Some(30L), "a"))) // run 10,20 compacted
    assert(r((1L, 2)) == ((30L, Some(40L), "b")))
    assert(r((1L, 3)) == ((40L, None, "a"))) // reopened value = new version
    assert(r((2L, 1)) == ((10L, None, "x"))) // current version open-ended
  }

  test("Scd2.intervals collapses same-instant ties deterministically") {
    val obs = Seq((1L, 10L, "b"), (1L, 10L, "a"), (1L, 20L, "b"))
      .toDF("k", "t", "v")
    val r = Scd2.intervals(obs, "k", "t", "v")
      .orderBy("version").collect()
    assert(r.map(_.getString(4)).toSeq == Seq("a", "b")) // min wins the tie
  }

  test("count-min estimates never underestimate and hit exact counts " +
    "without collisions") {
    val counts = (1L to 40L).map(k => (k, k * 3)).toDF("k", "c")
    val sk = Sketches.countMinSketch(counts, "k", "c", depth = 4, width = 64)
    // grid size is bounded by construction
    assert(sk.count() <= 4L * 64)
    val est = Sketches.countMinEstimates(sk, counts, "k", depth = 4,
      width = 64)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
    assert(est.length == 40)
    est.foreach { case (k, (c, e)) =>
      assert(e >= c, s"key $k underestimated: est $e < exact $c")
    }
  }

  test("HLL rolling actives tracks the exact trailing-window distinct " +
    "count within sketch error") {
    val events = graft.io.Tables.events(spark, TestSpark.sf0001)
    val approx = graft.ext.Sketches
      .rollingActivesHll(events, "user_id", "ts", windowDays = 7)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    // exact twin: the same calendar-join on the distinct (user, day) frame
    val ud = events.select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
    val cal = ud.select(col("d").as("cal_d")).distinct()
    val exact = ud.join(cal,
        col("cal_d") >= col("d") && col("cal_d") < date_add(col("d"), 7))
      .groupBy(col("cal_d"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (d, n) =>
      val a = approx(d).toDouble
      assert(math.abs(a - n) / n <= 0.05,
        s"day $d: approx $a vs exact $n drifts > 5%")
    }
  }

  test("HLL merge of per-day sketches equals one sketch over the union") {
    // the property the trailing window RELIES on: register-wise union is
    // lossless for same-lgK sketches, so merging daily state reproduces
    // the direct sketch of the whole window
    val events = graft.io.Tables.events(spark, TestSpark.sf0001)
    val merged = graft.ext.Sketches
      .dailyIdSketches(events, "user_id", "ts")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("n"))
      .head.getLong(0)
    val direct = events
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("n"))
      .head.getLong(0)
    assert(merged == direct,
      s"merged-estimate $merged != direct-sketch estimate $direct")
  }

  test("bm25 matches the hand-computed score on a tiny corpus") {
    // corpus: d1 = "x x y", d2 = "y z", query = {x}
    // N=2, avg_len=2.5; x: df=1, idf=ln(1+(2-1+0.5)/1.5)=ln(2)
    // d1: tf=2, len=3 → tf_norm = 2*2.2 / (2 + 1.2*(0.25 + 0.75*3/2.5))
    val docs = Seq((1L, "x x y"), (2L, "y z")).toDF("doc_id", "text")
    val r = TextAnalysis.bm25(docs, "text", "doc_id", Seq("x"))
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2)))
      .toMap
    val expected =
      math.log(2.0) * (2 * 2.2 / (2 + 1.2 * (0.25 + 0.75 * 3 / 2.5)))
    assert(r.keySet == Set(1L)) // d2 matches no term → absent
    assert(r(1L)._1 == 1L && math.abs(r(1L)._2 - expected) < 1e-12)
  }

  test("bm25 gives rare terms more weight than common ones") {
    val docs = Seq((1L, "rare common"), (2L, "common"), (3L, "common"),
      (4L, "common")).toDF("doc_id", "text")
    val r = TextAnalysis.bm25(docs, "text", "doc_id", Seq("rare", "common"))
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    // doc 1 holds the rare term → strictly highest score
    assert(r(1L) > r(2L))
  }

  test("bigramNll matches the hand-computed corpus bigram LM") {
    // corpus bigrams: d1 = [a b, b a], d2 = [a b]
    // c(a b)=2, c(b a)=1; heads: c(a ·)=2, c(b ·)=1
    val docs = Seq((1L, "a b a"), (2L, "a b")).toDF("doc_id", "text")
    val r = TextAnalysis.bigramNll(docs, "text", "doc_id")
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2)))
      .toMap
    val ln = (x: Double) => math.log(x)
    val d1 = (1 * (ln(2) - ln(2)) + 1 * (ln(1) - ln(1))) / 2
    val d2 = (ln(2) - ln(2)) / 1
    assert(r(1L) == ((2L, d1)) && r(2L) == ((1L, d2)))
  }

  test("bigramNll skips docs with fewer than two tokens") {
    val docs = Seq((1L, "a b"), (2L, "solo"), (3L, "")).toDF("doc_id", "text")
    val ids = TextAnalysis.bigramNll(docs, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L))
  }

  test("prefixJaccardPairs finds exactly the brute-force pairs " +
    "(zero false negatives) on a random corpus") {
    // seeded random corpus with planted near-dups: mutate a base text by
    // swapping a few tokens so true pairs exist at varied similarities
    val rng = new scala.util.Random(7)
    val vocab = ('a' to 'p').map(_.toString)
    def text() = Seq.fill(12 + rng.nextInt(8))(
      vocab(rng.nextInt(vocab.size))).mkString(" ")
    def mutate(t: String) = {
      val ts = t.split(" ")
      ts.updated(rng.nextInt(ts.length),
        vocab(rng.nextInt(vocab.size))).mkString(" ")
    }
    val bases = Seq.fill(10)(text())
    val docs = (bases ++ bases.map(mutate) ++ Seq.fill(10)(text()))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    for (t <- Seq(0.3, 0.6, 0.9)) {
      // reference: the all-shared-shingles join (single constant bucket,
      // no DF cut) — exact by construction
      val ref = Dedup.ngramJaccardPairs(
        docs.withColumn("one", lit(1)), "text", "doc_id", Seq("one"), t)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = Dedup.prefixJaccardPairs(docs, "text", "doc_id", t)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == ref, s"threshold $t")
      assert(t > 0.5 || ref.nonEmpty, s"vacuous corpus at threshold $t")
    }
  }

  test("prefix filter keeps only the rarest ceil((1-t)n)+1 shingles as " +
    "candidate generators") {
    // one hot shingle shared by every doc must NOT produce candidates at a
    // high threshold: it sorts LAST in the global df order, outside every
    // prefix, so docs whose only overlap is boilerplate never pair
    val boiler = "all rights reserved"
    val docs = (0 until 8).map(i =>
      (i.toLong, s"u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f $boiler"))
      .toDF("doc_id", "text")
    val pairs = Dedup.prefixJaccardPairs(docs, "text", "doc_id", 0.5)
    assert(pairs.count() == 0)
  }

  test("count-min cells equal the column sums of their keys") {
    // depth=1 makes the sketch a plain hash-bucket histogram — cell values
    // must equal the sum of counts hashing into the bucket
    val counts = Seq((1L, 5L), (2L, 7L), (3L, 11L)).toDF("k", "c")
    val sk = Sketches.countMinSketch(counts, "k", "c", depth = 1, width = 4)
    assert(sk.agg(sum("cell")).head.getLong(0) == 23L)
  }
}
