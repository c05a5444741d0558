package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Similarity, TextAnalysis}
import graft.feat.Windows

/** Degenerate-input battery: nulls, zeros, empties, singletons — the
  * library must degrade to nulls/empty results, never throw (ANSI mode
  * makes this easy to get wrong: x/0 and 0/0 raise by default).
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  test("null and empty text through the text/dedup operators") {
    val docs = Seq((1L, null: String, "en"), (2L, "", "en"),
      (3L, "one two three four", "en")).toDF("doc_id", "text", "lang")
    // none of these may throw
    assert(TextAnalysis.withTokenStats(docs, "text").count() == 3)
    assert(docs.select(TextAnalysis.fingerprint(col("text"))).count() == 3)
    assert(TextAnalysis.withLanguageId(docs, "text").count() == 3)
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      Seq("lang"), threshold = 0.0)
    assert(pairs.count() == 0) // null/empty produce no shingles, no pairs
    assert(Dedup.exactGroups(docs, "text", "doc_id").count() == 3)
    assert(Dedup.minHashLsh(docs, "text", "doc_id").count() == 0)
    assert(Dedup.simHashNearDups(docs, "text", "doc_id", Seq("lang"))
      .count() >= 0)
    // multimodal path: null text must become an empty payload, not an NPE
    val decoded = graft.ext.Multimodal.decodeBatches(spark,
      graft.ext.Multimodal.asMedia(docs.withColumn("source", lit("s")),
        "doc_id", "text", "source"))
    assert(decoded.count() == 3)
    assert(decoded.filter(col("byte_len") === 0).count() == 2)
  }

  test("zero vector degrades to null cosine, never divides by zero") {
    val vecs = Seq(
      (0L, Array(0.0f, 0.0f), 0),
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f), 0)).toDF("vec_id", "embedding", "label")
    val nn = Similarity.bucketedNN(vecs, "vec_id", "embedding", "label", k = 2)
    // query rows exist; pairs involving the zero vector carry null cosine
    assert(nn.count() > 0)
    val withZero = nn.filter(col("query_id") === 0L || col("neighbor_id") === 0L)
    assert(withZero.filter(col("cosine").isNotNull).count() == 0)
  }

  test("graft_unit: all-or-nothing nulls, exact unit values") {
    val rows = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, Seq(3.0, 4.0)),
        org.apache.spark.sql.Row(2L, Seq(0.0, 0.0)),      // zero norm
        org.apache.spark.sql.Row(3L, Seq(1.0, null)),     // null element
        org.apache.spark.sql.Row(4L, null)),              // null array
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)))))
    val out = rows.select(col("id"),
        Similarity.unitVec(col("v")).as("u"))
      .orderBy(col("id")).collect()
    // normal vector: exactly x_i / sqrt(Σx²) (same fp ops as the Column
    // spelling this expression replaced — 3-4-5 triangle is exact binary)
    assert(out(0).getSeq[Double](1) == Seq(0.6, 0.8))
    // zero norm and null element: ALL elements null, length preserved
    // (try_divide-by-zero contract; a null element poisons the norm)
    assert(out(1).getSeq[java.lang.Double](1) == Seq(null, null))
    assert(out(2).getSeq[java.lang.Double](1) == Seq(null, null))
    // null array stays null (not an array of nulls)
    assert(out(3).isNullAt(1))
  }

  test("empty input through agg + windows yields empty, not error") {
    val empty = Seq.empty[(Long, java.sql.Timestamp, Double)]
      .toDF("user_id", "ts", "value")
    val t = graft.etl.Clean.withTimeFeatures(empty, "ts")
    val daily = graft.etl.Aggregate.daily(t, "user_id", "value")
    assert(daily.count() == 0)
    assert(Windows.addRolling(
      Windows.addLags(daily, "user_id", "date", "daily_value"),
      "user_id", "date", "daily_value").count() == 0)
  }

  test("single-row group: group stats give null stddev, guarded z-score") {
    val one = Seq(("u1", "2024-01-01", 5.0)).toDF("id", "date", "v")
    val g = Windows.addGroupStats(one, "id", "v")
    val r = g.head()
    assert(r.getAs[Double]("group_mean") == 5.0)
    assert(r.isNullAt(r.fieldIndex("group_std"))) // stddev_samp of 1 row
    val z = g.withColumn("z", (col("v") - col("group_mean")) /
      when(col("group_std") > 0, col("group_std")).otherwise(lit(1)))
    assert(z.head().getAs[Double]("z") == 0.0)
  }

  test("one-hot fails fast on a high-cardinality label column") {
    val wide = spark.range(5000).selectExpr("cast(id as string) AS lbl")
    intercept[IllegalArgumentException] {
      Windows.addOneHot(wide, "lbl", "oh", maxLabels = 100)
    }
    // bounded domain still works and is deterministic
    val small = Seq("b", "a", "b").toDF("lbl")
    val oh = Windows.addOneHot(small, "lbl", "oh", maxLabels = 100)
    assert(oh.columns.toSeq == Seq("lbl", "oh_a", "oh_b"))
  }

  test("session gap boundary: exactly-at-threshold stays in the session") {
    import graft.feat.Sessions
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:30:00"), 1.0), // gap == 30 min exactly → same
      (1L, ts("2024-01-01 11:00:00.000001"), 1.0) // 1µs past → new session
    ).toDF("user_id", "ts", "v")
    val sess = Sessions.assignSessions(events, "user_id", "ts", 30)
      .select("ts", "session_id").collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(sess(ts("2024-01-01 10:30:00")) == 1L)
    assert(sess(ts("2024-01-01 11:00:00.000001")) == 2L)
    // native session_window agrees: an exactly-at-gap event still MERGES
    // (two sessions here would mean the boundary contract flipped — the
    // q_session_window oracle encodes the strict-greater-than rule)
    val sw = Sessions.sessionWindows(events, "user_id", "ts", 30).collect()
    assert(sw.length == 2)
    assert(sw.map(_.getAs[Long]("n_events")).sorted.toSeq == Seq(1L, 2L))
  }

  test("deterministic sample: pct bounds, stability, and split totality") {
    import graft.ext.Sampling
    val docs = spark.range(1000).toDF("id")
    assert(Sampling.deterministicSample(docs, "id", "s", 0).count() == 0)
    assert(Sampling.deterministicSample(docs, "id", "s", 100).count() == 1000)
    val n10a = Sampling.deterministicSample(docs, "id", "s", 10).count()
    val n10b = Sampling.deterministicSample(docs.repartition(13), "id", "s", 10)
      .count()
    assert(n10a == n10b && n10a > 50 && n10a < 150) // stable, ~10%
    // different salts decorrelate
    val a = Sampling.deterministicSample(docs, "id", "saltA", 50)
    val b = Sampling.deterministicSample(docs, "id", "saltB", 50)
    val overlap = a.join(b, "id").count()
    assert(overlap > 150 && overlap < 350) // ~25% of 1000
    // split is total and exclusive
    val split = Sampling.withSplit(docs, "id", "s")
    assert(split.count() == 1000)
    assert(split.groupBy("split").count().count() == 3)
    intercept[IllegalArgumentException] {
      Sampling.withSplit(docs, "id", "s", trainPct = 90, valPct = 10)
    }
  }

  test("round-3 operators degrade on degenerate inputs, never throw") {
    val docs = Seq((1L, null: String, "s0"), (2L, "", "s0"),
      (3L, "one two three four", "s1")).toDF("doc_id", "text", "source")
    // null/empty text: chunking must not NPE; null text yields no chunks
    // (split(null) is null → explode drops the row), empty text one chunk
    val chunks = graft.ext.Packing.chunkTokens(docs, "text", "doc_id", 8, 8)
    assert(chunks.filter(col("doc_id") === 1L).count() == 0)
    assert(chunks.filter(col("doc_id") === 3L).count() == 1)
    // repetition stats over null text: row survives with null/zero stats
    val rep = TextAnalysis.repetitionStats(docs, "text", "doc_id")
    assert(rep.count() == 3)
    // contamination against an EMPTY protected set: no rows, no error
    val prot = docs.filter(lit(false))
    assert(Dedup.contaminationOverlap(docs, prot, "text", "doc_id")
      .count() == 0)
    // mixture: unknown source falls to defaultPct (100 keeps, 0 drops)
    val all = graft.ext.Sampling.mixtureSample(docs, "source",
      Map.empty, defaultPct = 100, "doc_id", "m")
    assert(all.count() == 3)
    val none = graft.ext.Sampling.mixtureSample(docs, "source",
      Map.empty, defaultPct = 0, "doc_id", "m")
    assert(none.count() == 0)
    // stratified sample larger than the stratum returns the whole stratum
    val strat = graft.ext.Sampling.stratifiedSample(docs, Seq("source"),
      "doc_id", "s", 10)
    assert(strat.count() == 3)
    // empty pair set through cluster resolution (both paths — threshold -1
    // forces the distributed loop even at 0 edges; 0 would still satisfy
    // count <= threshold and sneak back into the fastpath)
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.resolveClusters(noPairs).count() == 0)
    assert(Dedup.resolveClusters(noPairs, localEdgeThreshold = -1L)
      .count() == 0)
  }

  test("round-4 operators degrade on degenerate inputs, never throw") {
    import graft.ext.RuntimeFilter
    // bloom prune: null fact keys never match; empty dim prunes everything
    val fact = Seq(Some(1L), Some(2L), None).toDF("k")
    val dim = Seq(1L).toDF("d")
    val pruned = RuntimeFilter.bloomPrune(fact, dim, "k", "d",
      expectedItems = 1)
    assert(pruned.collect().map(_.getLong(0)).toSet == Set(1L))
    // the documented convention expectedItems = dim.count() must survive a
    // fully-filtered-out dim (count 0): short-circuit beats the size require
    val emptyDim = Seq.empty[Long].toDF("d")
    assert(RuntimeFilter.bloomPrune(fact, emptyDim, "k", "d",
      expectedItems = emptyDim.count()).count() == 0)
    // prefix-jaccard: identical docs pair up; empty corpus yields empty
    val same = Seq((1L, "a b c d e"), (2L, "a b c d e")).toDF("doc_id", "text")
    val pj = Dedup.prefixJaccardPairs(same, "text", "doc_id", 0.9)
      .collect()
    assert(pj.length == 1 && math.abs(pj.head.getDouble(2) - 1.0) < 1e-9)
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.prefixJaccardPairs(empty, "text", "doc_id", 0.5).count() == 0)
    // entity resolution with zero pairs: every id is its own entity
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.resolveClusters(noPairs).count() == 0)
  }

  test("round-5 operators degrade on degenerate inputs, never throw") {
    // HLL rolling actives: empty events → empty result, no null sketches
    val noEvents = Seq.empty[(Long, java.sql.Timestamp)].toDF("user_id", "ts")
    assert(graft.ext.Sketches.rollingActivesHll(noEvents, "user_id", "ts")
      .count() == 0)
    // one event → one day, estimate exactly 1 (HLL is exact at n=1)
    val one = Seq((7L, java.sql.Timestamp.valueOf("2024-01-05 10:00:00")))
      .toDF("user_id", "ts")
    val r = graft.ext.Sketches.rollingActivesHll(one, "user_id", "ts")
      .collect()
    assert(r.length == 1 && r.head.getLong(1) == 1L)
    // semantic-dedup composition on ALL-IDENTICAL vectors: one bucket,
    // every pair at cosine 1 → a single cluster keyed by the min id
    val same = (1L to 5L).map(i => (i, Array(1.0f, 0.0f), "b"))
      .toDF("vec_id", "embedding", "label")
    val pairs = graft.ext.Similarity.neighborPairs(
      same, "vec_id", "embedding", "label", threshold = 0.9)
    assert(pairs.count() == 10) // C(5,2)
    val clusters = graft.ext.Dedup.resolveClusters(
      pairs.select(col("id_a"), col("id_b"))).collect()
    assert(clusters.length == 5 && clusters.forall(_.getLong(1) == 1L))
    // image codec: truncated PNG magic with garbage body falls back, and
    // an empty payload is fallback, not an exception
    val junk = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10, 1, 2)
    assert(graft.ext.Multimodal.ImageIoCodec.decode(junk, "img/png") ==
      graft.ext.Multimodal.FakeCodec.decode(junk, "img/png"))
    assert(graft.ext.Multimodal.ImageIoCodec.decode(Array.empty, "img/x") ==
      graft.ext.Multimodal.FakeCodec.decode(Array.empty, "img/x"))
    // ASCII text starting with a GIF signature AND containing 0x2C (the
    // GIF image-separator byte, a comma) must be classified as text and
    // take the FakeCodec path — the JDK GIF reader would otherwise parse
    // it to garbage dimensions WITHOUT throwing, silently diverging from
    // the formula the q_multimodal_* oracles replicate
    val gifText = "GIF89a, a sentence that merely mentions the gif format"
      .getBytes("UTF-8")
    assert(graft.ext.Multimodal.ImageIoCodec.decode(gifText, "img/web") ==
      graft.ext.Multimodal.FakeCodec.decode(gifText, "img/web"))
    // same for a "BM"-prefixed sentence (BMP's ASCII magic)
    val bmText = "BMW sales figures, quarterly".getBytes("UTF-8")
    assert(graft.ext.Multimodal.ImageIoCodec.decode(bmText, "img/web") ==
      graft.ext.Multimodal.FakeCodec.decode(bmText, "img/web"))
    // NON-pure-ASCII text (multi-byte UTF-8) with the full GIF signature:
    // the printable sniff alone cannot classify it (bytes >= 0x80), and
    // GIF's 16-bit dims always pass any plausibility bound — the header
    // control-byte check (< 0x09, impossible in text) must catch it
    val gifUtf8 = "GIF89a café image description, résumé of gifs"
      .getBytes("UTF-8")
    assert(graft.ext.Multimodal.ImageIoCodec.decode(gifUtf8, "img/web") ==
      graft.ext.Multimodal.FakeCodec.decode(gifUtf8, "img/web"))
    // a REAL (tiny) GIF must still decode through ImageIO, not fall back:
    // 2x3 header-only GIF — control bytes in the packed fields keep it off
    // the text path
    val realGif = Array[Byte]('G', 'I', 'F', '8', '9', 'a',
      2, 0, 3, 0, 0x80.toByte, 0, 0, // screen 2x3, GCT flag, 2 colors
      0, 0, 0, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte, // palette
      0x2C, 0, 0, 0, 0, 2, 0, 3, 0, 0, // image descriptor 2x3
      2, 2, 0x44, 0x01, 0, 0x3B) // minimal LZW data + trailer
    assert(graft.ext.Multimodal.ImageIoCodec.decode(realGif, "img/gif")._1 == 2L)
    assert(graft.ext.Multimodal.ImageIoCodec.decode(realGif, "img/gif")._2 == 3L)
  }

  test("round-4 time-series queries handle single-observation users") {
    import org.apache.spark.sql.expressions.Window
    val one = Seq((1L, java.sql.Date.valueOf("2024-01-05"), 10.0))
      .toDF("user_id", "date", "daily_value")
    // EWMA closed form with n=1: weight (1-a)^0 = 1 → ewma = the value
    val byUser = Window.partitionBy(col("user_id"))
    val seq0 = byUser.orderBy(col("date"))
    val d = one.withColumn("rn", row_number().over(seq0))
      .withColumn("n", count(lit(1)).over(byUser))
    val w = when(col("rn") === 1, pow(lit(0.7), col("n") - 1))
      .otherwise(lit(0.3) * pow(lit(0.7), col("n") - col("rn")))
    val ewma = d.groupBy(col("user_id"))
      .agg(sum(w * col("daily_value")).as("ewma")).collect().head.getDouble(1)
    assert(math.abs(ewma - 10.0) < 1e-12)
    // rolling median with a single row is the value itself
    val w7 = seq0.rowsBetween(-6, Window.currentRow)
    val med = one
      .withColumn("a", sort_array(collect_list(col("daily_value")).over(w7)))
      .withColumn("n", size(col("a")))
      .withColumn("m", element_at(col("a"), ((col("n") + 1) / 2).cast("int")))
      .collect().head.getAs[Double]("m")
    assert(med == 10.0)
    // CUSUM of a single observation is zero (value - own mean)
    val cs = one
      .withColumn("dev", col("daily_value") - avg(col("daily_value")).over(byUser))
      .withColumn("c", sum(col("dev")).over(
        seq0.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .collect().head.getAs[Double]("c")
    assert(math.abs(cs) < 1e-12)
  }

  test("as-of with empty right side keeps all left rows, null payload") {
    val left = Seq((1L, "k", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("id", "key", "t")
    val right = Seq.empty[(String, java.sql.Timestamp, Double)]
      .toDF("key", "rt", "payload")
    val got = graft.ext.AsOfJoin.leftAsOf(left, right, Seq("key"), "t", "rt",
      Map("payload" -> "p"))
    assert(got.count() == 1 && got.head().isNullAt(3))
  }
}
