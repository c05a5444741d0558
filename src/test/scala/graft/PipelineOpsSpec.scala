package graft

import org.apache.spark.sql.functions._

import graft.etl.Salting
import graft.ext.{Dedup, Packing, Sampling, TextAnalysis}

/** Round-3 pipeline operators: sequence packing, stratified/mixture
  * sampling, repetition stats, contamination, salted agg/join.
  */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("shardTokens: concat-and-chunk with documents genuinely " +
    "splitting at hard context boundaries") {
    // stream "a": doc1 [10,11,12], doc2 [20,21,22]; ctx=4 → shard0 is
    // doc1's 3 tokens + doc2's FIRST token, shard1 is doc2's tail —
    // the split the trainer actually reads, which packByOffset (whole-
    // doc assignment) deliberately does not produce
    val enc = Seq(
      ("a", 1L, 3L, Seq(10, 11, 12)),
      ("a", 2L, 3L, Seq(20, 21, 22)),
      ("b", 9L, 2L, Seq(7, 8)))
      .toDF("stream", "id", "n_tokens", "token_ids")
    val s = Packing.shardTokens(enc, Seq("stream"), "id", ctxTokens = 4)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getSeq[Int](3).toList))).toMap
    assert(s(("a", 0L)) == ((4L, List(10, 11, 12, 20))), s"got $s")
    assert(s(("a", 1L)) == ((2L, List(21, 22))))
    assert(s(("b", 0L)) == ((2L, List(7, 8))))
    assert(s.size == 3)
    // every shard except each stream's last is exactly ctxTokens — the
    // invariant a trainer's fixed-context reader depends on
    val docs = graft.io.Tables.documents(spark, TestSpark.sf0001)
    val encReal = graft.ext.Bpe.encodeIds(docs, "text", "doc_id",
        graft.ext.Bpe.train(docs, "text", 2)._2)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
    val shards = Packing.shardTokens(encReal, Seq("lang"), "doc_id", 256)
    val lastPerStream = shards.groupBy(col("lang"))
      .agg(max(col("shard_id")).as("shard_id"))
    val short = shards.join(lastPerStream, Seq("lang", "shard_id"),
        "left_anti")
      .filter(col("n_tokens") =!= 256)
    assert(short.count() == 0,
      "a non-final shard is not exactly ctxTokens long")
    // token conservation: shard tokens == encoded tokens, exactly
    val encTotal = encReal.agg(sum(col("n_tokens"))).head().getLong(0)
    val shardTotal = shards.agg(sum(col("n_tokens"))).head().getLong(0)
    assert(encTotal == shardTotal, s"$encTotal tokens in, $shardTotal out")
  }

  test("shardTokensDelta: complete-only emission, tail carry across " +
    "deltas, flush convergence, untouched-stream passthrough") {
    def enc(rows: (String, Long, Long, Seq[Int])*) =
      rows.toDF("stream", "id", "n_tokens", "token_ids")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getSeq[Int](3).toList))).toMap
    val d1 = enc(("a", 1L, 3L, Seq(10, 11, 12)), ("a", 2L, 3L, Seq(20, 21, 22)))
    val (s1, st1) = Packing.shardTokensDelta(d1, Seq("stream"), "id", 4, None)
    // 6 tokens at ctx 4: ONE complete shard out, the 2-token tail carried
    assert(rows(s1) == Map(("a", 0L) -> ((4L, List(10, 11, 12, 20)))))
    val st1R = st1.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getSeq[Int](2).toList))).toMap
    assert(st1R == Map("a" -> ((6L, List(21, 22)))), s"state: $st1R")
    // delta 2: stream a continues mid-shard, stream b opens with a tail
    val d2 = enc(("a", 3L, 3L, Seq(30, 31, 32)), ("b", 9L, 1L, Seq(7)))
    val (s2, st2) = Packing.shardTokensDelta(d2, Seq("stream"), "id", 4,
      Some(st1))
    assert(rows(s2) == Map(("a", 1L) -> ((4L, List(21, 22, 30, 31)))),
      s"got ${rows(s2)}")
    val fl = rows(Packing.shardTokensFlush(st2, Seq("stream"), 4))
    assert(fl == Map(("a", 2L) -> ((1L, List(32))),
      ("b", 0L) -> ((1L, List(7)))), s"flush: $fl")
    // convergence: chained emissions + flush == one-shot over the union
    val oneShot = rows(Packing.shardTokens(d1.unionByName(d2),
      Seq("stream"), "id", 4))
    assert(rows(s1) ++ rows(s2) ++ fl == oneShot)
    // a delta touching neither stream leaves the state unchanged and
    // emits nothing
    val d3 = enc(("c", 1L, 2L, Seq(1, 2)))
    val (s3, st3) = Packing.shardTokensDelta(d3, Seq("stream"), "id", 4,
      Some(st2))
    assert(s3.count() == 0)
    assert(st3.filter(col("stream").isin("a", "b"))
      .exceptAll(st2).count() == 0, "untouched streams' state moved")
    // per-stream id-order enforcement: stream c's id 1 is fine above,
    // but re-delivering id 2 to stream a (max seen 3) fails loudly
    val e = intercept[IllegalArgumentException] {
      Packing.shardTokensDelta(enc(("a", 2L, 1L, Seq(99))),
        Seq("stream"), "id", 4, Some(st3))
    }
    assert(e.getMessage.contains("id-ordered"),
      s"wrong failure mode: ${e.getMessage}")
    // the opt-out accepts it (documented shard-order divergence): the
    // single token extends stream a's tail [32] and advances the total
    val (_, st4) = Packing.shardTokensDelta(enc(("a", 2L, 1L, Seq(99))),
      Seq("stream"), "id", 4, Some(st3), checkIdOrder = false)
    val a4 = st4.filter(col("stream") === "a").head()
    assert(a4.getLong(1) == 10L &&
      a4.getSeq[Int](2).toList == List(32, 99),
      s"opted-out delta state drifted: $a4")
  }

  test("packByOffset: offsets, boundary straddle, pack ids") {
    val docs = Seq(
      ("a", 1L, 100L), ("a", 2L, 100L), ("a", 3L, 100L), ("a", 4L, 50L),
      ("b", 1L, 300L))
      .toDF("stream", "id", "n_tokens")
    val p = Packing.packByOffset(docs, Seq("stream"), "id", "n_tokens", 256)
      .select("stream", "id", "tok_offset", "pack_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    // doc a3 STARTS at offset 200 (inside pack 0) even though it straddles
    // the 256 boundary — offset packing assigns by start position
    assert(p == Set(
      ("a", 1L, 0L, 0L), ("a", 2L, 100L, 0L), ("a", 3L, 200L, 0L),
      ("a", 4L, 300L, 1L), ("b", 1L, 0L, 0L)))
    intercept[IllegalArgumentException] {
      Packing.packByOffset(docs, Seq("stream"), "id", "n_tokens", 0)
    }
  }

  test("packSummary: per-pack docs and token totals") {
    val docs = Seq(("a", 1L, 200L), ("a", 2L, 200L), ("a", 3L, 10L))
      .toDF("stream", "id", "n_tokens")
    val s = Packing.packSummary(
      Packing.packByOffset(docs, Seq("stream"), "id", "n_tokens", 256),
      Seq("stream"), "id", "n_tokens")
      .orderBy("pack_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 2 starts at offset 200 < 256 → pack 0 holds docs {1,2} (400
    // tokens, straddling); doc 3 starts at 400 → pack 1
    assert(s.toSeq == Seq((0L, 2L, 400L), (1L, 1L, 10L)))
  }

  test("chunkTokens: sliding windows with overlap, short tail chunks") {
    val docs = Seq((1L, "t0 t1 t2 t3 t4 t5 t6"), (2L, "solo"))
      .toDF("doc_id", "text")
    val r = Packing.chunkTokens(docs, "text", "doc_id",
        chunkSize = 4, stride = 3)
      .orderBy("doc_id", "chunk_id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getString(4)))
    assert(r.toSeq == Seq(
      (1L, 0L, 0L, 4L, "t0 t1 t2 t3"),
      (1L, 1L, 3L, 4L, "t3 t4 t5 t6"),   // overlap of 1 token (4-3)
      (1L, 2L, 6L, 1L, "t6"),            // short tail
      (2L, 0L, 0L, 1L, "solo")))
    intercept[IllegalArgumentException] {
      Packing.chunkTokens(docs, "text", "doc_id", 4, 5) // stride > chunk
    }
  }

  test("stratifiedSample: exactly n per stratum, stable under repartition") {
    val docs = (1L to 100L).map(i => (i, if (i % 2 == 0) "x" else "y"))
      .toDF("id", "lang")
    val s = Sampling.stratifiedSample(docs, Seq("lang"), "id", "s1", 7)
    assert(s.groupBy("lang").count().collect()
      .forall(_.getLong(1) == 7L))
    val ids1 = s.select("id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.stratifiedSample(docs.repartition(13), Seq("lang"),
      "id", "s1", 7).select("id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
    // a different salt draws a different sample
    val ids3 = Sampling.stratifiedSample(docs, Seq("lang"), "id", "s2", 7)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids1 != ids3)
  }

  test("mixtureSample: per-source rates, 0 drops all, 100 keeps all") {
    val docs = (1L to 200L).map(i => (i, s"src${i % 2}")).toDF("id", "source")
    val kept = Sampling.mixtureSample(docs, "source",
      Map("src0" -> 100, "src1" -> 0), defaultPct = 0, "id", "mixt")
    val bySrc = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc == Map("src0" -> 100L))
    intercept[IllegalArgumentException] {
      Sampling.mixtureSample(docs, "source", Map("src0" -> 101), 0, "id", "m")
    }
  }

  test("temperatureTargets: alpha=1 is natural proportions, alpha<1 " +
    "flattens toward the tail, targets bounded by group size") {
    // 90/10 split: natural share of the tail is 0.1; sqrt-temperature
    // lifts it to sqrt(10)/(sqrt(90)+sqrt(10)) = 0.25
    val docs = (1L to 100L).map(i => (i, if (i <= 90) "big" else "small"))
      .toDF("id", "lang")
    val nat = Sampling.temperatureTargets(docs, "lang", alpha = 1.0,
        share = 1.0).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getLong(3))).toMap
    assert(nat("big") == ((90L, 0.9, 90L)) &&
      nat("small") == ((10L, 0.1, 10L)))
    val flat = Sampling.temperatureTargets(docs, "lang", alpha = 0.5,
        share = 0.5).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getLong(3))).toMap
    assert(flat("small")._1 == 0.25 && flat("big")._1 == 0.75)
    // budget = 50: big keeps floor(0.75*50)=37; small's boosted target
    // floor(0.25*50)=12 exceeds its 10 docs → capped at the group size
    assert(flat("big")._2 == 37L && flat("small")._2 == 10L)
    // a tail smaller than its boosted target is capped at its size
    val tiny = (1L to 82L).map(i => (i, if (i <= 80) "big" else "small"))
      .toDF("id", "lang")
    val capped = Sampling.temperatureTargets(tiny, "lang", alpha = 0.1,
        share = 1.0).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(capped("small") == ((2L, 2L)),
      "n_target must never exceed n_docs")
    intercept[IllegalArgumentException] {
      Sampling.temperatureTargets(docs, "lang", alpha = 0.0, share = 1.0)
    }
    intercept[IllegalArgumentException] {
      Sampling.temperatureTargets(docs, "lang", alpha = 1.0, share = 0.0)
    }
  }

  test("temperatureSample: realizes exactly n_target per group, stable " +
    "under repartition") {
    val docs = (1L to 100L).map(i => (i, if (i <= 90) "big" else "small"))
      .toDF("id", "lang")
    val s = Sampling.temperatureSample(docs, "lang", "id", "tmx",
      alpha = 0.5, share = 0.5)
    val counts = s.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("big" -> 37L, "small" -> 10L))
    // membership is a pure function of (salt, id): repartitioning the
    // input cannot change the kept set
    val ids1 = s.select("id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.temperatureSample(docs.repartition(13), "lang",
        "id", "tmx", alpha = 0.5, share = 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
    // a NULL group is a group: the null-safe targets join must realize
    // its n_target instead of silently dropping every null-group row
    val withNull = (1L to 40L)
      .map(i => (i, if (i <= 30) "x" else null)).toDF("id", "lang")
    val nullKept = Sampling
      .temperatureSample(withNull, "lang", "id", "tmx",
        alpha = 1.0, share = 1.0)
      .filter(col("lang").isNull).count()
    assert(nullKept == 10L, s"null group must keep its 10 rows, got " +
      s"$nullKept")
  }

  test("temperature mix query shape: NULL group survives the null-safe " +
    "join-back (the q_temperature_mix composition)") {
    // the query-level realization joins targets back to the realized
    // per-group counts; both that join and its DuckDB oracle twin are
    // null-safe (<=> / IS NOT DISTINCT FROM), so a NULL group reports a
    // realized n_kept instead of a zeroed left-join miss
    val withNull = (1L to 40L)
      .map(i => (i, if (i <= 30) "x" else null)).toDF("id", "lang")
    val targets = Sampling.temperatureTargets(withNull, "lang",
      alpha = 1.0, share = 1.0)
    val kept = Sampling
      .temperatureSampleWith(withNull, targets, "lang", "id", salt = "tmx")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"))
      .withColumnRenamed("lang", "__klang")
    val out = targets.join(kept, col("lang") <=> col("__klang"), "left")
      .select(col("lang"), col("n_target"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .collect().map(r => Option(r.getString(0)) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(Some("x")) == ((30L, 30L)))
    assert(out(None) == ((10L, 10L)),
      s"NULL group must realize through the join-back, got ${out(None)}")
  }

  test("repetitionStats: type-token ratio and top-bigram share") {
    val docs = Seq(
      (1L, "spam spam spam spam"),     // 4 tokens, 1 distinct, top bigram 3×
      (2L, "all words here differ"),   // all distinct, every bigram once
      (3L, "solo"))                    // 1 token → no bigrams
      .toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(docs, "text", "doc_id")
      .orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2),
        x.getLong(3), x.getDouble(4)))
    assert(r(0) == ((1L, 4L, 0.25, 3L, 1.0)))
    assert(r(1) == ((2L, 4L, 1.0, 1L, 1.0 / 3)))
    assert(r(2) == ((3L, 1L, 1.0, 0L, 0.0)))
  }

  test("contaminationOverlap: distinct shared shingles per candidate doc") {
    val cand = Seq(
      (1L, "one two three four five"),       // shares "one two three" etc.
      (2L, "alpha beta gamma delta"))        // disjoint from protected
      .toDF("doc_id", "text")
    val prot = Seq((10L, "zero one two three four")).toDF("doc_id", "text")
    val r = Dedup.contaminationOverlap(cand, prot, "text", "doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    // cand 1 has shingles {one two three, two three four, three four five};
    // protected has {zero one two, one two three, two three four} → 2 shared
    assert(r.toSeq == Seq((1L, 2L, 3L)))
  }

  test("binaryFile source → media bridge → batch decode") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft-bin").toString
    Files.write(Paths.get(dir, "a.bin"), Array.fill[Byte](100)(1))
    Files.write(Paths.get(dir, "b.bin"), Array.fill[Byte](250)(2))
    Files.write(Paths.get(dir, "skip.txt"), Array.fill[Byte](9)(3))
    val files = graft.io.Sources.binaryFiles(spark, dir, glob = "*.bin")
    assert(files.count() == 2) // listing-time glob pruning
    val media = graft.ext.Multimodal.asMediaFromFiles(files)
    val decoded = graft.ext.Multimodal.decodeBatches(spark, media)
      .collect().map(r => r.byte_len).sorted
    assert(decoded.toSeq == Seq(100L, 250L))
    assert(media.select("format").distinct().head.getString(0) == "img/bin")
  }

  test("real PNG/JPEG bytes decode to true pixel dimensions; non-image " +
    "payloads keep the deterministic fallback") {
    import java.nio.file.{Files, Paths}
    import java.awt.image.BufferedImage
    def imageBytes(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0xFF8040)
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt writer")
      out.toByteArray
    }
    val dir = Files.createTempDirectory("graft-img").toString
    Files.write(Paths.get(dir, "a.png"), imageBytes(17, 9, "png"))
    Files.write(Paths.get(dir, "b.jpg"), imageBytes(33, 21, "jpg"))
    Files.write(Paths.get(dir, "c.bin"), Array.fill[Byte](100)(7))
    val media = graft.ext.Multimodal.asMediaFromFiles(
      graft.io.Sources.binaryFiles(spark, dir, glob = "*"))
    val decoded = graft.ext.Multimodal.decodeBatches(spark, media)
      .collect().map(r => r.format -> ((r.width, r.height, r.n_frames))).toMap
    assert(decoded("img/png") == ((17L, 9L, 1L)))
    assert(decoded("img/jpg") == ((33L, 21L, 1L)))
    // the non-image payload must fall back to FakeCodec's length formula
    val (fw, fh, ff) = graft.ext.Multimodal.FakeCodec.decode(
      Array.fill[Byte](100)(7), "img/bin")
    assert(decoded("img/bin") == ((fw, fh, ff)))
    // end-to-end through the REAL raster resize: file bytes → letterboxed
    // resample → re-encoded PNG whose re-decoded dims match the letterbox
    // prediction; the .bin row takes the geometry fallback
    val resized = graft.ext.Multimodal.resizeMedia(spark, media, 16, 16)
      .collect().map(r => ((r.width, r.height) ->
        ((r.resized_w, r.resized_h, r.raster)))).toMap
    assert(resized((17L, 9L)) == ((16L, 8L, true)))   // 17x9 → 16x8
    assert(resized((33L, 21L)) == ((16L, 10L, true))) // 33x21 → 16x10
    assert(resized((fw, fh))._3 == false)
  }

  test("compactParquet collapses a small-files layout, preserving data " +
    "and sizing output by actual bytes") {
    import java.nio.file.Files
    val base = Files.createTempDirectory("graft-compact").toString
    val daily = graft.queries.Parity.daily(spark, TestSpark.sf0001)
    // simulate a micro-batch sink's damage: 17 tiny files
    daily.repartition(17).write.parquet(s"$base/small")
    def partFiles(d: String) = new java.io.File(d).listFiles()
      .count(f => f.getName.startsWith("part-"))
    assert(partFiles(s"$base/small") == 17)
    // generous target → everything fits in ONE file
    val n = graft.io.Writers.compactParquet(spark, s"$base/small",
      s"$base/compact", targetFileBytes = 1L << 30)
    assert(n == 1 && partFiles(s"$base/compact") == 1)
    // data round-trips exactly (same rows, nothing lost or duplicated)
    val before = daily.orderBy("user_id", "date").collect()
    val after = spark.read.parquet(s"$base/compact")
      .orderBy("user_id", "date").collect()
    assert(after.sameElements(before))
    // a small target yields multiple, byte-bounded files
    val n2 = graft.io.Writers.compactParquet(spark, s"$base/small",
      s"$base/compact4", targetFileBytes = 16L << 10)
    assert(n2 > 1 && partFiles(s"$base/compact4") == n2)
  }

  test("textLines source reads raw corpus dumps line-per-row") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft-txt").toString
    Files.write(Paths.get(dir, "dump.txt"),
      "doc one\ndoc two\ndoc three\n".getBytes("UTF-8"))
    val lines = graft.io.Sources.textLines(spark, dir)
    assert(lines.count() == 3)
    assert(lines.orderBy("value").head.getString(0) == "doc one")
  }

  test("property: packing conserves tokens and pack ids are dense") {
    // doc sizes capped at the context size: a doc LONGER than ctx swallows
    // whole packs (no doc starts inside its span), so id density is only
    // guaranteed for docs <= ctx — conservation below holds regardless
    val docs = (1L to 200L)
      .map(i => (s"s${i % 3}", i, 1L + (i * 37) % 256))
      .toDF("stream", "id", "n_tokens")
    val packed = Packing.packByOffset(docs, Seq("stream"), "id",
      "n_tokens", 256)
    // conservation: every doc lands in exactly one pack; token totals match
    assert(packed.count() == 200)
    val total = docs.agg(sum("n_tokens")).head.getLong(0)
    val packedTotal = Packing.packSummary(packed, Seq("stream"), "id",
      "n_tokens").agg(sum("pack_tokens")).head.getLong(0)
    assert(total == packedTotal)
    // density: within each stream, pack ids 0..max with no holes
    val perStream = packed.groupBy("stream")
      .agg(countDistinct("pack_id").as("n"), max("pack_id").as("mx"))
      .collect()
    assert(perStream.forall(r => r.getLong(1) == r.getLong(2) + 1))
  }

  test("property: non-overlapping chunks reconstruct the token stream") {
    val docs = Seq((1L, "a b c d e f g"), (2L, "x y z")).toDF("doc_id", "text")
    val rebuilt = Packing.chunkTokens(docs, "text", "doc_id", 3, 3)
      .orderBy("doc_id", "chunk_id")
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.map(_.getString(4)).mkString(" ") }
    assert(rebuilt == Map(1L -> "a b c d e f g", 2L -> "x y z"))
  }

  test("tokenEntropy: zero for degenerate text, ln(n) for diverse text") {
    val docs = Seq((1L, "spam spam spam spam"), (2L, "a b c d"),
      (3L, "x x y y")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenEntropy(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
    assert(math.abs(r(0)._3) < 1e-12)
    assert(math.abs(r(1)._3 - math.log(4)) < 1e-12)
    assert(math.abs(r(2)._3 - math.log(2)) < 1e-12)
  }

  test("mixtureUpsample: full epochs + stable partial epoch") {
    val docs = (1L to 100L).map(i => (i, "srcA")).toDF("id", "source")
    val up = Sampling.mixtureUpsample(docs, "source", Map("srcA" -> 250),
      defaultPct = 0, "id", "ep")
    val byEpoch = up.groupBy("epoch").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // epochs 0 and 1 keep every row; epoch 2 keeps the SAME subset a plain
    // 50% mixture keeps (stable hash membership)
    assert(byEpoch(0L) == 100L && byEpoch(1L) == 100L)
    val half = Sampling.mixtureSample(docs, "source", Map("srcA" -> 50),
      0, "id", "ep").select("id").collect().map(_.getLong(0)).toSet
    val ep2 = up.filter(col("epoch") === 2L).select("id").collect()
      .map(_.getLong(0)).toSet
    assert(ep2 == half)
    // weight 0 upsamples to nothing
    assert(Sampling.mixtureUpsample(docs, "source", Map("srcA" -> 0),
      0, "id", "ep").count() == 0)
  }

  test("tokenDistributionJsd: 0 for identical slices, bounded by ln 2") {
    // two sources with IDENTICAL token distributions → each equals the
    // corpus distribution → JSD 0
    val same = Seq(("a", "x y z"), ("b", "x y z")).toDF("source", "text")
    val r0 = graft.ext.Drift.tokenDistributionJsd(same, "text", "source")
      .collect().map(_.getDouble(2))
    assert(r0.forall(v => math.abs(v) < 1e-12))
    // disjoint vocabularies: JSD(P, corpus-mix) approaches ln 2 as the
    // slice's mass in the corpus shrinks; with a 50/50 mix it is exactly
    // the JSD of P vs (P+R)/2-ish — just assert the bound and symmetry
    val disj = Seq(("a", "x x x"), ("b", "y y y")).toDF("source", "text")
    val r1 = graft.ext.Drift.tokenDistributionJsd(disj, "text", "source")
      .collect().map(x => x.getString(0) -> x.getDouble(2)).toMap
    assert(r1.values.forall(v => v > 0 && v <= math.log(2) + 1e-12))
    assert(math.abs(r1("a") - r1("b")) < 1e-12) // symmetric slices
  }

  test("incrementalDedupStatus: corpus dup beats batch dup beats novel") {
    val corpus = Seq((1L, "known text")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "known text"),   // digest exists in corpus
      (11L, "fresh text"),   // first of its digest in batch
      (12L, "fresh text"),   // same digest, larger id
      (13L, "unique text"))
      .toDF("doc_id", "text")
    val r = graft.ext.Dedup
      .incrementalDedupStatus(batch, corpus, "text", "doc_id")
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r == Map(10L -> "dup_corpus", 11L -> "novel",
      12L -> "dup_batch", 13L -> "novel"))
  }

  test("dailyLocf: grid completion and last-observation carry-forward") {
    val obs = Seq(
      (1L, java.sql.Date.valueOf("2024-01-01"), 10.0),
      (1L, java.sql.Date.valueOf("2024-01-04"), 40.0),
      (2L, java.sql.Date.valueOf("2024-01-02"), 5.0))
      .toDF("user_id", "date", "v")
    val r = graft.feat.Resample.dailyLocf(obs, "user_id", "date", "v")
      .orderBy("user_id", "date")
      .collect().map(x => (x.getLong(0), x.getDate(1).toString,
        x.getLong(2), x.getDouble(3)))
    assert(r.toSeq == Seq(
      (1L, "2024-01-01", 0L, 10.0),
      (1L, "2024-01-02", 1L, 10.0),  // gap → carried forward
      (1L, "2024-01-03", 1L, 10.0),
      (1L, "2024-01-04", 0L, 40.0),
      (2L, "2024-01-02", 0L, 5.0))) // single-day span: no gaps
  }

  test("cluster fastpath survives a path-shaped component (deep chains)") {
    // 30k-edge path: recursive find would overflow the driver stack well
    // below the 500k-edge threshold; iterative find+compression must not
    val n = 30000
    val path = (0 until n).map(i => (i.toLong, i + 1L)).toDF("id_a", "id_b")
    val labels = graft.ext.Dedup.resolveClusters(path)
    assert(labels.count() == n + 1L)
    assert(labels.agg(max(col("cluster_id"))).head.getLong(0) == 0L)
  }

  test("saltedSumCount equals the plain aggregation") {
    val df = (1L to 500L).map(i => (s"k${i % 3}", i.toDouble))
      .toDF("k", "v").withColumn("v", col("v").cast("decimal(18,4)"))
    val salted = Salting.saltedSumCount(df, Seq("k"), "v", saltBuckets = 8)
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getDecimal(1), r.getLong(2)))
    val plain = df.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n")).orderBy("k").collect()
      .map(r => (r.getString(0), r.getDecimal(1), r.getLong(2)))
    assert(salted.map(t => (t._1, t._2.doubleValue, t._3)).toSeq ==
      plain.map(t => (t._1, t._2.doubleValue, t._3)).toSeq)
  }

  test("saltedJoin is row-identical to the plain join; rejects outer") {
    val large = (1L to 300L).map(i => (i % 5, i)).toDF("key", "val")
    val small = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("key", "name")
    val salted = Salting.saltedJoin(large, small, Seq("key"), 4)
      .orderBy("val").collect().map(_.toSeq).toSeq
    val plain = large.join(small, Seq("key"))
      .orderBy("val").collect().map(_.toSeq).toSeq
    assert(salted == plain)
    intercept[IllegalArgumentException] {
      Salting.saltedJoin(large, small, Seq("key"), 4, how = "full_outer")
    }
  }
}
