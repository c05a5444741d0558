package graft

import org.apache.spark.sql.functions._

import graft.ext.Bpe

/** Distributed BPE merge training ([[graft.ext.Bpe]]): greedy-merge
  * semantics on the two-space symbol-string representation, argmax
  * tie-breaking, early exhaustion, and encode consistency.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def dictOf(df: org.apache.spark.sql.DataFrame)
      : Map[String, (Long, String)] =
    df.collect().map(r =>
      r.getAs[String]("word") ->
        (r.getAs[Long]("freq"), r.getAs[String]("syms"))).toMap

  test("wordDict builds char-level symbol strings with exact frequencies") {
    val docs = Seq((1L, "cat cat dog"), (2L, "  cat  ")).toDF("doc_id", "text")
    val d = dictOf(Bpe.wordDict(docs, "text"))
    assert(d("cat") == (3L, " c  a  t "))
    assert(d("dog") == (1L, " d  o  g "))
    assert(d.size == 2)
  }

  test("vocabIds freq ties break in UTF-8 byte order (code-point order), " +
    "matching Spark/DuckDB collation on supplementary-plane symbols") {
    // U+FFFD (efbfbd in UTF-8) vs U+1F600 emoji (f09f9880): Java String
    // order puts the emoji's surrogate pair (D83D DE00) BELOW U+FFFD,
    // UTF-8 byte order (= both engines' sort) puts it ABOVE — the
    // ADVICE-r11 divergence. Equal-frequency single-char words surface
    // both symbols with the same sym_freq, exposing the tie-break.
    val ghost = "�"
    val emoji = new String(Character.toChars(0x1F600))
    assert(ghost.compareTo(emoji) > 0, "Java order assumption drifted")
    assert(Bpe.utf8Less(ghost, emoji), "utf8Less must order U+FFFD first")
    val docs = Seq((1L, s"$ghost $emoji")).toDF("doc_id", "text")
    val ids = Bpe.vocabIds(Bpe.wordDict(docs, "text"))
      .orderBy(col("token_id")).collect()
      .map(r => (r.getString(0), r.getInt(1)))
    assert(ids.toSeq == Seq((ghost, 0), (emoji, 1)),
      s"vocab ids not in UTF-8 order: ${ids.toSeq}")
  }

  test("wordDict skips null and whitespace-only docs") {
    val docs = Seq((1L, "ab"), (2L, null), (3L, "   ")).toDF("doc_id", "text")
    val d = dictOf(Bpe.wordDict(docs, "text"))
    assert(d == Map("ab" -> (1L, " a  b ")))
  }

  test("back-to-back pairs all merge (a b a b -> ab ab)") {
    // the trailing-sentinel re-supply property the representation exists
    // for: a consumed boundary space is restored by the 2-space separator
    val docs = Seq((1L, "abab abab")).toDF("doc_id", "text")
    val (ms, dict) = Bpe.train(docs, "text", 1)
    assert(ms.map(m => (m.rank, m.leftSym, m.rightSym, m.merged)) ==
      Seq((1, "a", "b", "ab")))
    // (a,b) count 4 beats (b,a) count 2 — and BOTH ab pairs merged
    assert(ms.head.pairCount == 4L)
    assert(dictOf(dict)("abab")._2 == " ab  ab ")
  }

  test("overlapping triples merge greedily left-to-right (a a a -> aa a)") {
    val docs = Seq((1L, "aaa aaa aaa")).toDF("doc_id", "text")
    val (ms, dict) = Bpe.train(docs, "text", 1)
    assert(ms.head.merged == "aa")
    assert(ms.head.pairCount == 6L) // 2 adjacent (a,a) pairs x freq 3
    assert(dictOf(dict)("aaa")._2 == " aa  a ")
  }

  test("merged symbols match whole symbols only, never substrings") {
    // after (a,b)->ab, word "xab" holds symbol 'b' preceded by 'a' INSIDE
    // no pair: x,a,b -> (x,a),(a,b); but "cab ab" style boundary: the
    // pattern ' ab  c ' must not fire on '...b  c...' where b is the tail
    // of a longer symbol
    val docs = Seq((1L, "ab ab ab xb")).toDF("doc_id", "text")
    val (ms, dict) = Bpe.train(docs, "text", 2)
    assert(ms.head.merged == "ab") // count 3 beats (x,b) count 1
    val d = dictOf(dict)
    assert(d("ab")._2 == " ab ")
    // second merge is (x,b): 'b' in the merged symbol 'ab' must not match
    assert(ms(1).merged == "xb")
    assert(d("xb")._2 == " xb ")
  }

  test("ties break on (count desc, left asc, right asc)") {
    // (a,b) and (b,a) both appear twice in "abab" x1 + ... construct:
    // "ab" freq 2 gives (a,b)=2; "ba" freq 2 gives (b,a)=2 -> (a,b) wins
    val docs = Seq((1L, "ab ab ba ba")).toDF("doc_id", "text")
    val (ms, _) = Bpe.train(docs, "text", 1)
    assert(ms.head.leftSym == "a" && ms.head.rightSym == "b")
  }

  test("merges compound: later ranks consume earlier merged symbols") {
    val docs = Seq((1L, "abc abc abc")).toDF("doc_id", "text")
    val (ms, dict) = Bpe.train(docs, "text", 2)
    assert(ms.map(_.merged) == Seq("ab", "abc"))
    assert(dictOf(dict)("abc")._2 == " abc ")
  }

  test("training exhausts when every word is one symbol") {
    val docs = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    val (ms, dict) = Bpe.train(docs, "text", 10)
    // 2 merges fully fuse both words; loop must stop, not error
    assert(ms.size == 2)
    assert(dictOf(dict).values.forall(_._2.count(_ == ' ') == 2))
  }

  test("encodeStats counts tokens under the trained segmentation") {
    val docs = Seq(
      (1L, "en", "abab cd", "s1"),
      (2L, "en", "abab", "s1"),
      (3L, "fr", "cd cd", "s2")).toDF("doc_id", "lang", "text", "source")
    val (_, dict) = Bpe.train(docs, "text", 1) // learns (a,b) count 4
    val r = Bpe.encodeStats(docs, "text", "doc_id", dict,
        Seq("lang", "source"))
      .orderBy("lang").collect()
    // en/s1: words=3 (abab,cd,abab) tokens= [ab,ab]=2 + [c,d]=2 + 2 = 6
    assert(r(0).getAs[Long]("n_docs") == 2L)
    assert(r(0).getAs[Long]("n_words") == 3L)
    assert(r(0).getAs[Long]("bpe_tokens") == 6L)
    assert(r(0).getAs[Double]("avg_tokens_per_word") == 2.0)
    // fr/s2: 2 words, cd stays [c,d] -> 4 tokens
    assert(r(1).getAs[Long]("bpe_tokens") == 4L)
  }

  test("docTokenCounts: per-doc sums under the trained segmentation") {
    val docs = Seq(
      (1L, "en", "abab cd abab"),
      (2L, "en", "cd"),
      (3L, "fr", "   ")).toDF("doc_id", "lang", "text")
    val (_, dict) = Bpe.train(docs, "text", 1) // learns (a,b)
    val r = Bpe.docTokenCounts(docs, "text", "doc_id", dict, Seq("lang"))
      .orderBy("doc_id").collect()
    // doc 1: [ab,ab]=2 + [c,d]=2 + [ab,ab]=2 = 6; doc 2: 2; doc 3 skipped
    assert(r.map(x => (x.getAs[Long]("doc_id"), x.getAs[String]("lang"),
      x.getAs[Long]("n_tokens"))).toSeq ==
      Seq((1L, "en", 6L), (2L, "en", 2L)))
  }

  test("trainBatched: batch=1 reproduces sequential train exactly") {
    // with batch=1 the pool rule degenerates to the argmax: rank-1 never
    // conflicts, the cap stops after it — so the batched trainer is a
    // strict generalization of the sequential one
    val docs = Seq((1L, "abc abc abc xy xy zq")).toDF("doc_id", "text")
    val seq = Bpe.train(docs, "text", 4)._1
    val bat = Bpe.trainBatched(docs, "text", nIters = 4, batch = 1)._1
    assert(seq == bat)
  }

  test("trainBatched: disjoint pairs merge together, conflicting pairs " +
    "wait for the next iteration") {
    // counts: (a,b)=6, (c,d)=4, (b,c)=3 — (b,c) shares 'b' with the
    // higher-ranked (a,b) and 'c' with (c,d), so one iteration of
    // batch=4 selects exactly {(a,b),(c,d)}; the merged dict then shows
    // both applied simultaneously
    val docs = Seq((1L, "ab ab ab ab ab abcd cd cd cd"))
      .toDF("doc_id", "text")
    val (ms, dict) = Bpe.trainBatched(docs, "text", nIters = 1, batch = 4)
    assert(ms.map(m => (m.rank, m.merged, m.pairCount)) ==
      Seq((1, "ab", 6L), (2, "cd", 4L)),
      s"selection drifted: $ms")
    assert(dictOf(dict)("abcd")._2 == " ab  cd ")
    // a second iteration is then free to merge the (ab, cd) product
    val (ms2, dict2) = Bpe.trainBatched(docs, "text", nIters = 2, batch = 4)
    assert(ms2.map(_.merged) == Seq("ab", "cd", "abcd"))
    assert(dictOf(dict2)("abcd")._2 == " abcd ")
  }

  test("trainBatched: exhaustion stops the loop early, ranks stay global") {
    val docs = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    val (ms, dict) = Bpe.trainBatched(docs, "text", nIters = 10, batch = 2)
    // (a,b) and (c,d) are disjoint -> ONE iteration fuses both words
    assert(ms.map(m => (m.rank, m.merged)) == Seq((1, "ab"), (2, "cd")))
    assert(dictOf(dict).values.forall(_._2.count(_ == ' ') == 2))
  }

  test("vocabIds + encodeIds: dense frequency-ranked ids, ordered " +
    "sequences, counts consistent with docTokenCounts") {
    val docs = Seq(
      (1L, "abab cd abab"),
      (2L, "cd"),
      (3L, null: String)).toDF("doc_id", "text")
    val (_, dict) = Bpe.train(docs, "text", 1) // learns (a,b) -> ab
    // final segmentation symbols: abab -> [ab, ab] (freq 2 words x 2),
    // cd -> [c, d] (freq 2). sym freqs: ab 4, c 2, d 2 -> ids 0,1,2
    val vocab = Bpe.vocabIds(dict).collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(vocab == Map("ab" -> (0, 4L), "c" -> (1, 2L), "d" -> (2, 2L)),
      s"vocab drifted: $vocab")
    val enc = Bpe.encodeIds(docs, "text", "doc_id", dict).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getSeq[Int](2).toList))).toMap
    // doc 1: abab cd abab -> [ab,ab, c,d, ab,ab] = [0,0,1,2,0,0]
    assert(enc(1L) == ((6L, List(0, 0, 1, 2, 0, 0))), s"doc1: ${enc(1L)}")
    assert(enc(2L) == ((2L, List(1, 2))))
    assert(!enc.contains(3L), "null-text doc must be dropped")
    // n_tokens agrees with the counting operator on every doc
    val counts = Bpe.docTokenCounts(docs, "text", "doc_id", dict, Nil)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(enc.view.mapValues(_._1).toMap == counts)
  }

  test("encodeIds: OOV words fall back to char segmentation, unknown " +
    "chars to the UNK sentinel") {
    val train = Seq((1L, "abab abab cd")).toDF("doc_id", "text")
    val (_, dict) = Bpe.train(train, "text", 1) // (a,b)->ab
    // serve docs: "ab" known word? no — known WORDS are abab, cd.
    // "acd" is OOV -> chars [a, c, d]; 'a' is in the vocab? vocab syms
    // over final dict: abab->[ab,ab], cd->[c,d] => {ab, c, d} — 'a' is
    // NOT a vocab symbol -> UNK -1; c,d map to their ids
    val serve = Seq((9L, "acd cd")).toDF("doc_id", "text")
    val enc = Bpe.encodeIds(serve, "text", "doc_id", dict).head()
    val vocab = Bpe.vocabIds(dict).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(enc.getAs[Long]("n_tokens") == 5L, s"got $enc")
    assert(enc.getSeq[Int](2).toList ==
      List(-1, vocab("c"), vocab("d"), vocab("c"), vocab("d")),
      s"OOV fallback drifted: ${enc.getSeq[Int](2)} vocab=$vocab")
  }

  test("persisted tokenizer == live tokenizer: merges, vocab, and " +
    "token-id sequences all bit-identical") {
    val docs = graft.io.Tables.documents(spark, TestSpark.sf0001)
    val (merges, dict) = Bpe.train(docs, "text", 8)
    val dir = java.nio.file.Files.createTempDirectory("graft-tok").toString
    Bpe.save(merges, dict, dir)
    val tok = Bpe.load(spark, dir)
    assert(tok.merges == merges, "merge table drifted through the artifact")
    val liveVocab = Bpe.vocabIds(dict).collect().map(_.toSeq).toSet
    assert(tok.vocab.collect().map(_.toSeq).toSet == liveVocab,
      "vocabulary drifted through the artifact")
    // the contract that matters: id sequences bit-equal on real docs
    val live = Bpe.encodeIds(docs, "text", "doc_id", dict)
      .select(col("doc_id"), col("n_tokens"),
        col("token_ids").cast("string").as("ids"))
    val loaded = tok.encodeIds(docs, "text", "doc_id")
      .select(col("doc_id"), col("n_tokens"),
        col("token_ids").cast("string").as("ids"))
    assert(live.exceptAll(loaded).count() == 0 &&
      loaded.exceptAll(live).count() == 0,
      "token-id sequences under the loaded tokenizer diverged")
    // facade round-trip is the same artifact
    val dir2 = java.nio.file.Files.createTempDirectory("graft-tok2").toString
    graft.api.Graft.tokenizerSave(merges, dict, dir2)
    assert(graft.api.Graft.tokenizerLoad(spark, dir2).merges == merges)
  }

  test("load validates version, row counts, and the dict fingerprint") {
    val docs = Seq((1L, "abab abab cd"), (2L, "cd ab")).toDF("doc_id", "text")
    val (merges, dict) = Bpe.train(docs, "text", 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-tok3").toString
    Bpe.save(merges, dict, dir)
    Bpe.load(spark, dir) // clean artifact loads
    // rewritten dict (one freq bumped) must trip the fingerprint, not
    // silently serve a mixed artifact
    val fs = java.nio.file.Paths.get(dir)
    spark.read.parquet(s"$dir/dict")
      .withColumn("freq", col("freq") + lit(1L))
      .write.mode("overwrite").parquet(s"$dir/dict2")
    org.apache.commons.io.FileUtils.deleteDirectory(
      fs.resolve("dict").toFile)
    java.nio.file.Files.move(fs.resolve("dict2"), fs.resolve("dict"))
    val e = intercept[IllegalArgumentException] { Bpe.load(spark, dir) }
    assert(e.getMessage.contains("fingerprint"),
      s"wrong failure mode: ${e.getMessage}")
    // unknown format version fails with the version message
    val dir4 = java.nio.file.Files.createTempDirectory("graft-tok4").toString
    Bpe.save(merges, dict, dir4)
    val fs4 = java.nio.file.Paths.get(dir4)
    spark.read.parquet(s"$dir4/meta")
      .withColumn("format_version", lit(Bpe.ArtifactFormatVersion + 1))
      .write.mode("overwrite").parquet(s"$dir4/meta2")
    org.apache.commons.io.FileUtils.deleteDirectory(
      fs4.resolve("meta").toFile)
    java.nio.file.Files.move(fs4.resolve("meta2"), fs4.resolve("meta"))
    val e2 = intercept[IllegalArgumentException] { Bpe.load(spark, dir4) }
    assert(e2.getMessage.contains("format_version="),
      s"wrong failure mode: ${e2.getMessage}")
  }

  test("encodeIdsWith fails loudly when the vocab comes from a " +
    "different dictionary") {
    val docsA = Seq((1L, "abab abab cd")).toDF("doc_id", "text")
    val docsB = Seq((1L, "xy xy z")).toDF("doc_id", "text")
    val (_, dictA) = Bpe.train(docsA, "text", 1) // syms {ab, c, d}
    val (_, dictB) = Bpe.train(docsB, "text", 1) // syms {xy, z}
    val vocabB = Bpe.vocabIds(dictB)
    val e = intercept[IllegalArgumentException] {
      Bpe.encodeIdsWith(docsA, "text", "doc_id", dictA, vocabB)
    }
    assert(e.getMessage.contains("DIFFERENT"),
      s"wrong failure mode: ${e.getMessage}")
    // the matched pairing still passes the guard
    assert(Bpe.encodeIdsWith(docsA, "text", "doc_id", dictA,
      Bpe.vocabIds(dictA)).count() == 1)
  }

  test("q_bpe_vocab merges are deterministic across reruns on sf0.001") {
    val q = SparkEntry.queries("q_bpe_vocab")
    val a = q(spark, TestSpark.sf0001).collect().map(_.toSeq)
    val b = q(spark, TestSpark.sf0001).collect().map(_.toSeq)
    assert(a.length == 8)
    assert(a.toSeq == b.toSeq)
    // rank-8 merge on this corpus compounds a rank-7 product
    val merged = a.map(_(3).asInstanceOf[String])
    assert(merged.last.length > 2)
  }
}
