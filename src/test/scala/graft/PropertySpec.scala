package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions._

import graft.feat.Windows

/** Property tests (SURVEY.md §5.3): the reference's runtime audits as
  * properties over generated data (scalacheck generators, fixed seeds,
  * sampled directly — the scalatest bridge artifact isn't on the offline
  * classpath).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def forAll[T](g: Gen[T], n: Int = 10)(body: T => Unit): Unit =
    (1 to n).foreach { i =>
      body(g.apply(Gen.Parameters.default, Seed(42L + i))
        .getOrElse(fail("generator exhausted")))
    }

  private val seriesGen: Gen[List[Double]] =
    Gen.chooseNum(3, 40).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0.0, 1000.0).map(v =>
        math.rint(v * 100) / 100)))

  test("property: rolling avg over trailing 7 rows equals manual window") {
    forAll(seriesGen) { vs =>
      val df = vs.zipWithIndex
        .map { case (v, i) => ("u", f"2024-02-${i % 28 + 1}%02d~$i", v) }
        .toDF("id", "date", "v") // synthetic orderable key
      val got = Windows.addRolling(df, "id", "date", "v")
        .orderBy("date").select("rolling_avg_7d").collect()
        .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
      val sortedVs = vs.zipWithIndex
        .map { case (v, i) => (f"2024-02-${i % 28 + 1}%02d~$i", v) }
        .sortBy(_._1).map(_._2)
      val manual = sortedVs.indices.map { i =>
        val frame = sortedVs.slice(math.max(0, i - 7), i)
        if (frame.isEmpty) None else Some(frame.sum / frame.size)
      }
      got.zip(manual).foreach {
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-9)
        case (a, b) => assert(a == b)
      }
    }
  }

  test("property: lag_k null-prefix length == min(k, series length)") {
    forAll(Gen.zip(Gen.chooseNum(1, 15), seriesGen)) { case (k, vs) =>
      val df = vs.zipWithIndex
        .map { case (v, i) => ("u", f"k$i%04d", v) }.toDF("id", "date", "v")
      val nulls = Windows.addLags(df, "id", "date", "v", lags = Seq(k))
        .filter(col(s"lag_${k}_day").isNull).count()
      assert(nulls == math.min(k, vs.length).toLong)
    }
  }

  test("property: daily agg preserves total sum and row coverage") {
    forAll(Gen.listOfN(60, Gen.zip(Gen.chooseNum(1L, 5L),
        Gen.chooseNum(1, 28), Gen.chooseNum(0.0, 100.0)))) { rows =>
      val df = rows.map { case (u, d, v) =>
        (u, java.sql.Timestamp.valueOf(f"2024-03-$d%02d 12:00:00"), v)
      }.toDF("user_id", "ts", "value")
      val t = graft.etl.Clean.withTimeFeatures(df, "ts")
      val daily = graft.etl.Aggregate.daily(t, "user_id", "value")
      val total = daily.agg(sum("daily_value")).head.getDouble(0)
      assert(math.abs(total - rows.map(_._3).sum) < 1e-6)
      assert(daily.agg(sum("num_readings")).head.getLong(0) == rows.size)
    }
  }

  test("property: jaccard pairs are symmetric-free, bounded, thresholded") {
    val docs = Seq(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g x"),
      (3L, "a b c d e f g h"), (4L, "z y x w v u t s")
    ).toDF("doc_id", "text").withColumn("b", lit(1))
    val pairs = graft.ext.Dedup.ngramJaccardPairs(
      docs, "text", "doc_id", Seq("b"), threshold = 0.0).collect()
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1)) // no self/mirror pairs
      val j = r.getDouble(2)
      assert(j >= 0.0 && j <= 1.0)
    }
    val m = pairs.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(m((1L, 3L)) == 1.0) // identical docs
  }

  test("property: anomaly flags are a subset of rows and rate-bounded") {
    val daily = graft.queries.Parity.daily(spark, TestSpark.sf0001)
    val z = Windows.addGroupStats(daily, "user_id", "daily_value")
      .withColumn("z", (col("daily_value") - col("group_mean")) /
        when(col("group_std") > 0, col("group_std")).otherwise(lit(1)))
      .withColumn("flag", (col("z") > 2).cast("long"))
    val n = z.count()
    val flagged = z.agg(sum("flag")).head.getLong(0)
    assert(flagged >= 0 && flagged < n / 4) // z>2 must be a small minority
  }

  test("property: resolveClusters equals union-find on random graphs") {
    val graphGen: Gen[List[(Long, Long)]] = for {
      nodes <- Gen.chooseNum(2, 40)
      nEdges <- Gen.chooseNum(1, 60)
      edges <- Gen.listOfN(nEdges, Gen.zip(
        Gen.chooseNum(0L, nodes - 1L), Gen.chooseNum(0L, nodes - 1L)))
    } yield edges.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    forAll(graphGen, n = 8) { edges =>
      if (edges.nonEmpty) {
        // reference: classic driver-side union-find with path compression
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
          .map(v => v -> find(v)).toMap
        // default path = driver union-find fastpath (edge list under the
        // local threshold); threshold 0 forces the distributed
        // pointer-doubling loop — both must equal the reference
        val got = graft.ext.Dedup.resolveClusters(
            edges.toDF("id_a", "id_b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == expected)
        val gotDist = graft.ext.Dedup.resolveClusters(
            edges.toDF("id_a", "id_b"), localEdgeThreshold = 0L)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(gotDist == expected)
      }
    }
  }

  test("property: sessionize partitions each user's events exactly once") {
    val eventsGen: Gen[List[(Long, Long)]] = for {
      n <- Gen.chooseNum(1, 60)
      rows <- Gen.listOfN(n, Gen.zip(
        Gen.chooseNum(1L, 3L), Gen.chooseNum(0L, 400L)))
    } yield rows
    forAll(eventsGen, n = 8) { rows =>
      val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
      val df = rows.map { case (u, mins) =>
        (u, new java.sql.Timestamp(base + mins * 60000L), 1.0)
      }.toDF("user_id", "ts", "v")
      val gap = 30
      val sess = graft.feat.Sessions.sessionize(df, "user_id", "ts", gap)
        .collect()
      // reference: sort each user's minutes, split on gap > 30
      val ref = rows.groupBy(_._1).map { case (u, rs) =>
        val sorted = rs.map(_._2).sorted
        val nSessions = 1 + sorted.sliding(2)
          .count(w => w.size == 2 && w(1) - w(0) > gap)
        u -> (nSessions, rs.size)
      }
      val gotSessions = sess.groupBy(_.getLong(0)).map { case (u, ss) =>
        u -> (ss.length, ss.map(_.getLong(4)).sum) // n sessions, n events
      }
      assert(gotSessions.keySet == ref.keySet)
      ref.foreach { case (u, (nSess, nEv)) =>
        assert(gotSessions(u) == ((nSess, nEv.toLong)), s"user $u")
      }
    }
  }

  // small vocab + short docs → real span collisions across docs
  private val corpusGen: Gen[List[String]] = {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps")
    val doc = Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    Gen.chooseNum(2, 12).flatMap(n => Gen.listOfN(n, doc))
  }

  test("property: spanDedup equals the brute-force span-frequency rule") {
    val k = 3
    forAll(corpusGen) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = graft.ext.Dedup.spanDedup(df, "text", "doc_id", spanTokens = k)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      // reference: spans = consecutive k-token windows; DOC frequency per
      // span; drop spans with df > 1; fingerprint the space-joined rest
      def spansOf(t: String): Seq[String] =
        t.trim.split("\\s+").grouped(k).map(_.mkString(" ")).toSeq
      val docFreq = texts.zipWithIndex
        .flatMap { case (t, i) => spansOf(t).distinct.map(_ -> i) }
        .groupBy(_._1).view.mapValues(_.size).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val sp = spansOf(t)
        val kept = sp.filter(docFreq(_) <= 1)
        val fp = java.security.MessageDigest.getInstance("MD5")
          .digest(kept.mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        assert(got(i.toLong) ==
          ((sp.size.toLong, (sp.size - kept.size).toLong, fp)), s"doc $i")
      }
    }
  }

  test("property: distributedNtile equals the global ntile window, " +
    "heavy ties included") {
    import org.apache.spark.sql.expressions.Window
    // values drawn from a SMALL domain → many exact ties, including ties
    // that would straddle decile boundaries under the global order; ~10%
    // nulls exercise the asc_nulls_first path (the window form ranks
    // nulls FIRST — the bucket form must agree)
    val gen = for {
      n <- Gen.chooseNum(1, 120)
      tiles <- Gen.oneOf(1, 3, 10, 17)
      vs <- Gen.listOfN(n, Gen.frequency(
        9 -> Gen.chooseNum(0, 8).map(v => Option(v.toDouble)),
        1 -> Gen.const(Option.empty[Double])))
    } yield (tiles, vs)
    forAll(gen) { case (tiles, vs) =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
      val got = graft.ext.Ranks
        .distributedNtile(df, "v", Seq("id"), tiles, "t", buckets = 4)
        .select("id", "t").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val want = df.withColumn("t",
          ntile(tiles).over(Window.orderBy(col("v"), col("id"))))
        .select("id", "t").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == want, s"tiles=$tiles vs=$vs")
    }
  }

  test("property: trainBatched(batch=1) equals sequential BPE train") {
    // with batch=1 the pool rule degenerates to the argmax — the batched
    // trainer must be a strict generalization on ANY corpus
    forAll(corpusGen, n = 6) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val seq = graft.ext.Bpe.train(df, "text", 5)._1
      val bat = graft.ext.Bpe.trainBatched(df, "text", nIters = 5,
        batch = 1)._1
      assert(seq == bat, s"corpus=$texts")
    }
  }

  test("property: gopherRulesLocal equals gopherRules on any corpus") {
    // repeat-heavy generator so bigram runs and distinct ratios actually
    // vary; the two forms must agree row for row
    val repWord = Gen.oneOf("spam", "spam", "the", "of", "word", "x")
    val repDoc = Gen.chooseNum(1, 20).flatMap(n =>
      Gen.listOfN(n, repWord)).map(_.mkString(" "))
    val repCorpus = Gen.chooseNum(2, 10).flatMap(n =>
      Gen.listOfN(n, repDoc))
    forAll(repCorpus, n = 6) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val batch = graft.ext.TextAnalysis
        .gopherRules(df, "text", "doc_id", minTokens = 2)
      val local = graft.ext.TextAnalysis
        .gopherRulesLocal(df, "text", "doc_id", minTokens = 2)
      assert(local.exceptAll(batch).count() == 0 &&
        batch.exceptAll(local).count() == 0, s"corpus=$texts")
    }
  }

  test("property: NB scoreLocal margins equal trainScore on any corpus") {
    forAll(corpusGen, n = 6) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, t, i % 2 == 0) }.toDF("doc_id", "text", "lbl")
      val dist = graft.ext.NbClassifier
        .trainScore(df, df.select(col("doc_id"), col("text")), "text",
          "doc_id", "lbl")
        .select("doc_id", "n_tokens", "margin", "pred")
      val model = graft.ext.NbClassifier
        .train(df, "text", "doc_id", "lbl")
      val local = graft.ext.NbClassifier
        .scoreLocal(df.select(col("doc_id"), col("text")), "text", model)
        .select("doc_id", "n_tokens", "margin", "pred")
      assert(local.exceptAll(dist).count() == 0 &&
        dist.exceptAll(local).count() == 0, s"corpus=$texts")
    }
  }

  test("property: unigramNll equals the brute-force corpus LM") {
    forAll(corpusGen) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = graft.ext.TextAnalysis.unigramNll(df, "text", "doc_id")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
        .toMap
      val all = texts.flatMap(_.trim.toLowerCase.split("\\s+"))
      val ctf = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val total = all.size.toDouble
      texts.zipWithIndex.foreach { case (t, i) =>
        val toks = t.trim.toLowerCase.split("\\s+").toSeq
        val nll = toks.map(w => math.log(total) - math.log(ctf(w).toDouble))
          .sum / toks.size
        val (n, gotNll) = got(i.toLong)
        assert(n == toks.size.toLong, s"doc $i n_tokens")
        assert(math.abs(gotNll - nll) < 1e-9, s"doc $i nll")
      }
    }
  }
}
