package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Spread, TextAnalysis}

/** Round-4 curation operators: span-level corpus dedup, unigram-LM NLL
  * scoring, and the Spread partition-widening helper.
  */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  // 10-token boilerplate header shared by docs 1-3; unique tails
  private val header =
    "all rights reserved please contact the site admin for help"
  private val docs = Seq(
    (1L, s"$header alpha beta gamma"),
    (2L, s"$header delta epsilon zeta"),
    (3L, s"$header"), // all-boilerplate doc
    (4L, "unique content that appears nowhere else in this corpus at all"))
    .toDF("doc_id", "text")

  test("spanDedup removes corpus-frequent spans from every copy") {
    val r = Dedup.spanDedup(docs, "text", "doc_id", spanTokens = 10)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getString(3))).toMap
    // docs 1-3 share the 10-token header span → dropped everywhere
    assert(r(1L) == (2L, 1L, md5Hex("alpha beta gamma")))
    assert(r(2L) == (2L, 1L, md5Hex("delta epsilon zeta")))
    // the all-boilerplate doc keeps nothing: fp of the empty string
    assert(r(3L) == (1L, 1L, md5Hex("")))
    // a unique doc is untouched (11 tokens → spans of 10 + 1)
    assert(r(4L)._1 == 2L && r(4L)._2 == 0L)
  }

  test("spanDedup keeps sub-span-length distinct tails distinct") {
    // tails shorter than a span still matter: docs 1 and 2 must not
    // collapse to the same fingerprint after the shared span is dropped
    val r = Dedup.spanDedup(docs, "text", "doc_id", spanTokens = 10)
      .collect().map(x => x.getLong(0) -> x.getString(3)).toMap
    assert(r(1L) != r(2L))
  }

  test("unigramNll matches the hand-computed corpus LM") {
    val tiny = Seq((1L, "a a b"), (2L, "c")).toDF("doc_id", "text")
    val r = TextAnalysis.unigramNll(tiny, "text", "doc_id")
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2)))
      .toMap
    // corpus: total=4, ctf(a)=2, ctf(b)=1, ctf(c)=1
    val ln = (x: Double) => math.log(x)
    val d1 = (2 * (ln(4) - ln(2)) + 1 * (ln(4) - ln(1))) / 3
    assert(r(1L)._1 == 3L && math.abs(r(1L)._2 - d1) < 1e-12)
    assert(r(2L)._1 == 1L && math.abs(r(2L)._2 - ln(4)) < 1e-12)
  }

  test("unigramNll ranks rare-token docs as higher-NLL") {
    val nll = TextAnalysis.unigramNll(docs, "text", "doc_id")
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    // doc 3 is pure boilerplate (every token appears 3+ times) → lowest
    assert(nll(3L) == nll.values.min)
  }

  test("empty corpus: spanDedup and unigramNll yield empty, not errors") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.spanDedup(empty, "text", "doc_id").count() == 0)
    assert(TextAnalysis.unigramNll(empty, "text", "doc_id").count() == 0)
  }

  test("NbClassifier: learns a separable vocabulary and generalizes to " +
    "held-out docs; one-class training stays finite") {
    val train2 = Seq(
      (1L, "good clean prose text", true),
      (2L, "clean good readable text", true),
      (3L, "spam junk garbage noise", false),
      (4L, "junk spam noise clutter", false))
      .toDF("doc_id", "text", "lbl")
    // held-out docs reuse each class's vocabulary plus an unseen token
    val heldOut = Seq((10L, "good prose unseen"), (11L, "garbage spam zzz"))
      .toDF("doc_id", "text")
    val r = graft.ext.NbClassifier
      .trainScore(train2, heldOut, "text", "doc_id", "lbl")
      .collect().map(x => x.getLong(0) -> (x.getDouble(2), x.getBoolean(3)))
      .toMap
    assert(r(10L)._2 && r(10L)._1 > 0, "positive-vocab doc must score pos")
    assert(!r(11L)._2 && r(11L)._1 < 0, "negative-vocab doc must score neg")
    // one-class training: Laplace smoothing keeps every margin finite
    // (no ln(0) from the empty class), and a doc made of the observed
    // class's vocabulary still lands in that class; an all-unseen-token
    // doc may legitimately fall below the empty class (its smoothing
    // denominator is smaller) — finiteness is the contract, not the sign
    val onePos = train2.filter(col("lbl"))
    val r1 = graft.ext.NbClassifier
      .trainScore(onePos, heldOut, "text", "doc_id", "lbl")
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(r1.values.forall(m => !m.isNaN && !m.isInfinite))
    assert(r1(10L) > 0, "doc of observed-class vocabulary stays positive")
    // a 0/1 integer weak label behaves identically to a boolean one in
    // BOTH halves of training (token counts AND the prior)
    val intLbl = train2.withColumn("lbl", col("lbl").cast("int"))
    val ri = graft.ext.NbClassifier
      .trainScore(intLbl, heldOut, "text", "doc_id", "lbl")
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(ri == r.map { case (k, v) => k -> v._1 })
    // an empty training frame fails fast instead of flowing NULL class
    // totals into every margin
    val emptyTrain = Seq.empty[(Long, String, Boolean)]
      .toDF("doc_id", "text", "lbl")
    val ex = intercept[IllegalArgumentException] {
      graft.ext.NbClassifier
        .trainScore(emptyTrain, heldOut, "text", "doc_id", "lbl")
    }
    assert(ex.getMessage.contains("training frame is empty"))
    // a non-empty but TOKEN-LESS training frame (all-NULL texts — a blank
    // "" still tokenizes to one empty-string token, NULL drops the row in
    // explode) is the documented degenerate model: empty vocabulary,
    // every doc scores at the prior margin — finite, not NaN
    val blank = Seq((1L, null, true), (2L, null, false), (3L, null, false))
      .map { case (i, t, l) => (i, t: String, l) }
      .toDF("doc_id", "text", "lbl")
    val rb = graft.ext.NbClassifier
      .trainScore(blank, heldOut, "text", "doc_id", "lbl")
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    val prior = math.log((1 + 1.0) / (2 + 1.0)) // ln((n_pos+1)/(n_neg+1))
    assert(rb.values.forall(m => !m.isNaN && !m.isInfinite))
    assert(rb.values.forall(m => math.abs(m - prior) < 1e-6),
      s"token-less training must score every doc at the prior, got $rb")
  }

  test("gopherRulesLocal ≡ gopherRules: the row-local fold reproduces " +
    "the shuffle form, edge rows included") {
    import graft.ext.{TextAnalysis => TA}
    val edge = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam spam spam"),
      (2L, null: String),                       // null text → null rules
      (3L, "   "),                              // blank → 1 empty token
      (4L, "the of and to in is was a an or words differ here nicely" +
        " and the mix keeps ratios inside every single band today"),
      (5L, "x"),                                // 1 token → no bigrams
      (6L, "a b a b a b a b a b a b"))          // tied bigram runs
      .toDF("doc_id", "text")
    for (df <- Seq(edge, graft.io.Tables.documents(spark,
        TestSpark.sf0001))) {
      val batch = TA.gopherRules(df, "text", "doc_id", minTokens = 10)
      val local = TA.gopherRulesLocal(df, "text", "doc_id", minTokens = 10)
      assert(batch.columns.toSeq == local.columns.toSeq)
      assert(local.exceptAll(batch).count() == 0 &&
        batch.exceptAll(local).count() == 0,
        "row-local Gopher battery diverged from the shuffle form")
    }
    // additive form: payload columns colliding with withTokenStats'
    // names (token_chars, n_punct, …) must RIDE THROUGH untouched —
    // the streaming gate re-selects them after filtering
    val payload = Seq((1L, "the of and to in is was a an or more words",
        42L, "keepme"))
      .toDF("doc_id", "text", "token_chars", "n_punct")
    val out = TA.withGopherRulesLocal(payload, "text", minTokens = 2)
    assert(out.select("token_chars").head.getLong(0) == 42L,
      "payload token_chars was clobbered")
    assert(out.select("n_punct").head.getString(0) == "keepme",
      "payload n_punct was clobbered")
    assert(out.columns.contains("keep") && out.columns.contains("r_rep"))
  }

  test("NbClassifier.scoreLocal ≡ trainScore: the serve-time model " +
    "reproduces the distributed scorer's margins") {
    import graft.ext.{NbClassifier, TextAnalysis => TA, Sampling}
    val docs = graft.io.Tables.documents(spark, TestSpark.sf0001)
    val labeled = TA.withTokenStats(docs, "text")
      .withColumn("label_weak",
        round(TA.qualityScore(col("n_tokens"), col("token_chars"),
          col("n_punct"), col("n_stopwords")) + lit(1e-9), 4) >= 0.5)
      .select(col("doc_id"), col("text"), col("label_weak"))
    val train = labeled
      .filter(Sampling.hashBucket(col("doc_id"), "graft") < 80)
    val dist = NbClassifier
      .trainScore(train, labeled, "text", "doc_id", "label_weak")
      .select("doc_id", "n_tokens", "margin", "pred")
    val model = NbClassifier.train(train, "text", "doc_id", "label_weak")
    val local = NbClassifier
      .scoreLocal(labeled.select(col("doc_id"), col("text")), "text",
        model)
      .select("doc_id", "n_tokens", "margin", "pred")
    assert(local.exceptAll(dist).count() == 0 &&
      dist.exceptAll(local).count() == 0,
      "serve-time local scorer diverged from the distributed scorer")
    // an unseen-vocabulary doc scores through the Laplace floor weight
    val unseen = NbClassifier.scoreLocal(
      Seq((99L, "zzz qqq www")).toDF("doc_id", "text"), "text", model)
      .head().getAs[Double]("margin")
    assert(!unseen.isNaN && !unseen.isInfinite)
    // maxVocab caps the SERVED weight map deterministically: top tokens
    // by training frequency keep exact weights, the tail floors — the
    // smoothing totals stay full-vocabulary, so a big-enough cap is the
    // identical model
    val capped = NbClassifier.train(train, "text", "doc_id",
      "label_weak", maxVocab = 5)
    assert(capped.weights.size == 5)
    assert(capped.floorW == model.floorW && capped.prior == model.prior,
      "cap must not move the full-vocabulary smoothing scalars")
    assert(capped.weights.forall { case (t, wv) => model.weights(t) == wv },
      "kept tokens must keep their exact full-model weights")
  }

  test("Spread.cpu widens an under-split scan, skips shuffled/streaming") {
    val scan = spark.read
      .parquet(s"${TestSpark.sf0001}/documents.parquet")
      .filter(col("doc_id").isNotNull) // narrow chain stays scan-rooted
    val target = spark.sparkContext.defaultParallelism
    assert(scan.rdd.getNumPartitions < target) // premise: under-split
    assert(Spread.cpu(scan, "doc_id").rdd.getNumPartitions == target)
    // the RAW read too: Spark 4 keeps spark.read.parquet as a lazy
    // UnresolvedDataSource until analysis — a .logical-based chain walk
    // silently no-ops on exactly the frames every operator passes in
    // (regression: the operators lost their spreading once, caught only by
    // a plan audit because correctness never changes)
    val raw = graft.io.Tables.documents(spark, TestSpark.sf0001)
    assert(Spread.cpu(raw, "doc_id").rdd.getNumPartitions == target)
    // a post-shuffle frame is not scan-rooted: must pass through untouched
    // (probing its partition count would eagerly run the upstream stages)
    val shuffled = scan.repartition(target + 4, col("doc_id"))
    assert(Spread.cpu(shuffled, "doc_id") eq shuffled)
    // a streaming frame must pass through, not throw on the rdd probe
    val stream = spark.readStream.format("rate").load()
    assert(Spread.cpu(stream, "value").isStreaming)
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
}
