package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ext.CacheScope.Cacheable

/** Text-analysis operators for a large-scale training-data pipeline:
  * tokenization, quality scoring, language ID, document fingerprinting.
  *
  * All columnar `functions._` / higher-order functions — no UDFs, so every
  * operator stays inside Catalyst (HOFs aren't whole-stage-codegen'd but are
  * still JVM-native expression eval, no serialization boundary) and scales
  * linearly with no shuffle: each is a narrow projection over the scan.
  */
object TextAnalysis {

  /** Whitespace tokenizer. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** BPE-ish sub-word tokenizer: letter runs, digit runs, and single
    * non-alnum symbols — the pre-tokenization regex family BPE vocabularies
    * are trained over. A proper trained-merges tokenizer would map over
    * this output; the token COUNT (the quantity pipelines budget by) comes
    * from this split.
    */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  /** Stopword list used for quality scoring and language ID. Bounded,
    * broadcast as a literal array into the plan.
    */
  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "or", "to", "in", "is", "was")

  /** Per-language marker tokens for the n-gram/stopword language-ID
    * heuristic. Deterministic argmax with fixed priority order.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "los", "las", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  private def arrayLit(xs: Seq[String]): Column = array(xs.map(lit): _*)

  /** Count of tokens that appear in `vocab`. */
  def countIn(toks: Column, vocab: Seq[String]): Column =
    size(filter(toks, t => array_contains(arrayLit(vocab), t))).cast("long")

  private val PunctChars = ".,!?;:"

  /** Token statistics: count, total token chars, punctuation count.
    *
    * Counting choices are cost-driven (identical values, cheaper eval):
    * n_punct as a translate length-diff (two char scans, no regex engine);
    * n_bpe_tokens via `regexp_count` (same non-overlapping match count as
    * sizing [[bpeTokens]]'s output, minus the per-row array allocation);
    * token_chars as the length of the whitespace-stripped text — equal by
    * construction to the sum of token lengths (the tokens ARE the
    * non-whitespace runs), in one codegen'd regex pass instead of the
    * interpreted `aggregate(transform(...))` fold it replaces (higher-order
    * functions evaluate per element with boxed lambdas — the same hot-path
    * trap unitVec and hyperplaneBucket hit at scale).
    */
  def withTokenStats(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    df.withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("token_chars",
        length(regexp_replace(trim(col(textCol)), "\\s+", "")).cast("long"))
      .withColumn("n_punct",
        (length(col(textCol)) -
          length(translate(col(textCol), PunctChars, ""))).cast("long"))
      .withColumn("n_stopwords", countIn(toks, Stopwords))
      .withColumn("n_bpe_tokens",
        regexp_count(lower(col(textCol)),
          lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")).cast("long"))
  }

  /** Quality score ∈ [0,1]: length saturation + non-punct + stopword
    * naturalness (the classic heuristic trio for web-scale corpus
    * filtering). Pure arithmetic over [[withTokenStats]] columns.
    */
  def qualityScore(nTokens: Column, tokenChars: Column, nPunct: Column,
                   nStop: Column): Column = {
    val lenScore = least(nTokens.cast("double") / 100.0, lit(1.0))
    val punctScore = lit(1.0) - least(
      nPunct.cast("double") / greatest(nTokens, lit(1L)).cast("double"), lit(1.0))
    val stopScore = least(
      nStop.cast("double") * 5.0 / greatest(nTokens, lit(1L)).cast("double"),
      lit(1.0))
    lenScore * 0.3 + punctScore * 0.4 + stopScore * 0.3
  }

  /** Language ID: argmax of per-language marker-token counts, priority order
    * = [[LangMarkers]] order, "und" (undetermined) when all scores are 0.
    */
  def withLanguageId(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(lower(col(textCol)))
    val scored = LangMarkers.foldLeft(df) { case (d, (l, markers)) =>
      d.withColumn(s"score_$l", countIn(toks, markers))
    }
    val best = LangMarkers.map(_._1).foldRight(lit("und")) { (l, els) =>
      val isMax = LangMarkers.map(_._1).filter(_ != l)
        .map(o => col(s"score_$l") >= col(s"score_$o"))
        .reduce(_ && _)
      when(col(s"score_$l") > 0 && isMax, lit(l)).otherwise(els)
    }
    scored.withColumn("lang_pred", best)
  }

  /** Document fingerprint: hash of the whitespace-normalized lowercased
    * text. md5 here for oracle parity; at 100 TB prefer `xxhash64` (8-byte,
    * no hex string) — same call shape.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))

  /** Per-document token Shannon entropy (nats) — the perplexity-proxy
    * quality signal: near-zero for degenerate repeated-token text, ~ln(n)
    * for fully diverse text. Computed from (doc, token) counts:
    * H = −Σ (c/n)·ln(c/n), so the shape is the same partial-aggregating
    * explode → groupBy pair as [[repetitionStats]]. Returns
    * (id, n_tokens, entropy).
    */
  def tokenEntropy(df: DataFrame, textCol: String, idCol: String)
      : DataFrame = {
    val counts = termFreq(df, textCol, idCol, cached = false)
    counts.groupBy(col(idCol))
      .agg(sum(col("c")).as("n_tokens"),
        sum(col("c").cast("double") * log(col("c").cast("double")))
          .as("__clogc"))
      // H = ln(n) − (Σ c·ln c)/n — one pass, no per-row division by n
      // before the aggregate (n isn't known until the groupBy completes)
      .select(col(idCol), col("n_tokens"),
        (log(col("n_tokens").cast("double")) -
          col("__clogc") / col("n_tokens").cast("double")).as("entropy"))
  }

  /** Repetition-based quality stats (the Gopher-style repetition filters):
    * per doc, the type-token ratio (distinct / total tokens) and the
    * most-frequent-bigram share of all bigrams. Highly repetitive machine
    * text scores low on the first and high on the second.
    *
    * Shape: the narrow stats (token counts, distinct ratio) are pure
    * projections; the top-bigram count needs a per-(doc, bigram) frequency,
    * so bigrams explode → two partial-aggregating groupBys on doc id → join
    * back. Both shuffles carry tiny rows and combine map-side; the join key
    * is the doc id on both sides (co-partitioned after the groupBy).
    * Returns (id, n_tokens, distinct_ratio, top_bigram_n, top_bigram_frac).
    */
  def repetitionStats(df: DataFrame, textCol: String, idCol: String)
      : DataFrame = {
    val ltoks = tokens(lower(col(textCol)))
    val base = Spread.cpu(df, idCol).select(col(idCol), ltoks.as("toks"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("distinct_ratio",
        size(array_distinct(col("toks"))).cast("double") /
          greatest(col("n_tokens"), lit(1L)).cast("double"))
    // adjacent (non-distinct) bigrams — Dedup.shingles dedups, which would
    // hide exactly the repetition this operator measures
    val bigrams = base.filter(col("n_tokens") >= 2)
      .select(col(idCol),
        explode(transform(sequence(lit(0L), col("n_tokens") - 2),
          i => array_join(slice(col("toks"), i + 1, lit(2)), " "))).as("bg"))
    val top = bigrams.groupBy(col(idCol), col("bg"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(idCol)).agg(max(col("c")).as("top_bigram_n"))
    base.drop("toks").join(top, Seq(idCol), "left")
      .withColumn("top_bigram_n", coalesce(col("top_bigram_n"), lit(0L)))
      .withColumn("top_bigram_frac",
        col("top_bigram_n").cast("double") /
          greatest(col("n_tokens") - 1, lit(1L)).cast("double"))
  }

  /** Per-document average negative log-likelihood under the corpus's own
    * unigram LM — the classic perplexity-proxy quality score (high = the
    * doc is made of corpus-rare tokens). NLL(d) = Σ c_t·(ln T − ln ctf_t)
    * / n_d over the doc's token counts, where ctf is the corpus term
    * frequency and T the corpus token total.
    *
    * Shape: one explode → (doc, token) partial-aggregating groupBy; the
    * vocabulary aggregates FROM that tf frame (a second tiny shuffle of
    * pre-combined pairs, same trick as the vocab/tf-idf queries); the
    * corpus total is a bounded scalar collect. The tf↔vocab join is
    * equi-key on the token; Zipf skew is bounded because tf already
    * collapsed per-doc repeats. Returns (id, n_tokens, avg_nll).
    */
  /** Gopher-style quality rule battery (Rae et al. 2021 §A1.1, adapted
    * thresholds): the five classic web-filter predicates as per-document
    * booleans plus the combined `keep` flag — token-count band, mean word
    * length band, stopword presence, symbol/punctuation ratio, and
    * repetition (top-bigram share + distinct-token ratio). Each ratio is
    * guard-rounded to 6dp BEFORE its comparison, so a boundary document
    * evaluates identically in any engine — the house determinism contract
    * applied to predicates, not just output floats.
    *
    * Shape: [[withTokenStats]] is a narrow projection over the scan; the
    * repetition rule rides [[repetitionStats]]' one (doc, bigram)
    * pre-aggregating shuffle; one equi-join on the id stitches them. No
    * collect, no cross-document state — scale-safe as a filter stage.
    */
  def gopherRules(df: DataFrame, textCol: String, idCol: String,
                  minTokens: Long = 50, maxTokens: Long = 100000)
      : DataFrame = {
    def g6(c: Column): Column = round(c + lit(1e-9), 6)
    val nSafe = greatest(col("n_tokens"), lit(1L)).cast("double")
    val st = withTokenStats(df, textCol)
      .select(col(idCol), col("n_tokens"), col("token_chars"),
        col("n_punct"), col("n_stopwords"))
    val rep = repetitionStats(df, textCol, idCol)
      .select(col(idCol), col("distinct_ratio"), col("top_bigram_frac"))
    st.join(rep, Seq(idCol))
      .withColumn("mean_word_len",
        g6(col("token_chars").cast("double") / nSafe))
      .withColumn("punct_ratio", g6(col("n_punct").cast("double") / nSafe))
      .select(col(idCol), col("n_tokens"), col("mean_word_len"),
        col("n_tokens").between(minTokens, maxTokens).as("r_len"),
        col("mean_word_len").between(3.0, 10.0).as("r_word_len"),
        (col("n_stopwords") >= 2).as("r_stop"),
        (col("punct_ratio") <= 0.1).as("r_punct"),
        (g6(col("top_bigram_frac")) <= 0.2 &&
          g6(col("distinct_ratio")) >= 0.5).as("r_rep"))
      .withColumn("keep",
        col("r_len") && col("r_word_len") && col("r_stop") &&
          col("r_punct") && col("r_rep"))
  }

  /** [[gopherRules]] computed ROW-LOCALLY — identical predicates and
    * output columns, but the repetition stats fold over the token array
    * with higher-order functions instead of riding the (doc, bigram)
    * shuffle: the top-bigram multiplicity is the longest run in the
    * SORTED bigram array (a sort + one linear fold per row). Zero
    * shuffle, zero cross-document state — the form that runs on an
    * unbounded STREAM ([[graft.streaming.StreamingCorpus]]), where the
    * batch operator's aggregation would need watermarked state for no
    * semantic gain. Same values row for row (integers and exact
    * divisions; spec-pinned against the batch operator), so the two
    * share one oracle.
    *
    * Batch-vs-local choice: at rest, prefer [[gopherRules]] — the
    * pre-aggregating shuffle bounds per-row memory on adversarially
    * long documents, while this form materializes the O(n_tokens)
    * bigram array per row.
    */
  def gopherRulesLocal(df: DataFrame, textCol: String, idCol: String,
                       minTokens: Long = 50, maxTokens: Long = 100000)
      : DataFrame =
    withGopherRulesLocal(df, textCol, minTokens, maxTokens)
      .select(col(idCol), col("n_tokens"), col("mean_word_len"),
        col("r_len"), col("r_word_len"), col("r_stop"), col("r_punct"),
        col("r_rep"), col("keep"))

  /** The additive form of [[gopherRulesLocal]]: every input column is
    * preserved and the rule columns (`n_tokens`, `mean_word_len`,
    * `r_*`, `keep` — these eight replace same-named input columns if
    * present) are appended — the shape a streaming gate needs, where
    * the payload must ride through the filter. Intermediates carry
    * `__g`-prefixed names, so payload columns like `token_chars` or
    * `n_punct` survive untouched (unlike [[withTokenStats]]' additive
    * names, which would collide and then be dropped).
    */
  def withGopherRulesLocal(df: DataFrame, textCol: String,
                           minTokens: Long = 50,
                           maxTokens: Long = 100000): DataFrame = {
    def g6(c: Column): Column = round(c + lit(1e-9), 6)
    val toks = tokens(col(textCol))
    val nSafe = greatest(col("n_tokens"), lit(1L)).cast("double")
    // longest run in the sorted bigram array == max bigram multiplicity;
    // fold state: (prev, run, best) — best flushed at finish
    val bigrams = array_sort(transform(
      sequence(lit(0L), col("n_tokens") - 2),
      i => array_join(slice(col("__glt"), i + 1, lit(2)), " ")))
    val maxRun = aggregate(bigrams,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => struct(
        x.as("prev"),
        when(x === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L)).as("run"),
        greatest(acc.getField("best"),
          when(x === acc.getField("prev"), acc.getField("run") + 1L)
            .otherwise(lit(1L))).as("best")),
      acc => acc.getField("best"))
    df.withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("__gchars",
        length(regexp_replace(trim(col(textCol)), "\\s+", "")).cast("long"))
      .withColumn("__gpunct",
        (length(col(textCol)) -
          length(translate(col(textCol), PunctChars, ""))).cast("long"))
      .withColumn("__gstop", countIn(toks, Stopwords))
      .withColumn("__glt", tokens(lower(col(textCol))))
      .withColumn("__gdistinct_ratio",
        size(array_distinct(col("__glt"))).cast("double") / nSafe)
      .withColumn("__gtop_bigram_frac",
        when(col("n_tokens") >= 2, maxRun).otherwise(lit(0L))
          .cast("double") /
          greatest(col("n_tokens") - 1, lit(1L)).cast("double"))
      .withColumn("mean_word_len",
        g6(col("__gchars").cast("double") / nSafe))
      .withColumn("__gpunct_ratio",
        g6(col("__gpunct").cast("double") / nSafe))
      .withColumn("r_len", col("n_tokens").between(minTokens, maxTokens))
      .withColumn("r_word_len", col("mean_word_len").between(3.0, 10.0))
      .withColumn("r_stop", col("__gstop") >= 2)
      .withColumn("r_punct", col("__gpunct_ratio") <= 0.1)
      .withColumn("r_rep", g6(col("__gtop_bigram_frac")) <= 0.2 &&
        g6(col("__gdistinct_ratio")) >= 0.5)
      .withColumn("keep",
        col("r_len") && col("r_word_len") && col("r_stop") &&
          col("r_punct") && col("r_rep"))
      .drop("__glt", "__gdistinct_ratio", "__gtop_bigram_frac",
        "__gpunct_ratio", "__gchars", "__gpunct", "__gstop")
  }

  /** The shared (doc, token) → count pre-agg every corpus-level text
    * metric starts from (entropy, NLL, OOV, vocab, tf-idf): one spread
    * explode, one partial-aggregating shuffle of pre-combined pairs.
    * `cached = true` for callers that fan multiple aggregations off it;
    * single-consumer callers pass false — materializing a one-shot frame
    * is pure memory pressure at corpus scale.
    */
  def termFreq(df: DataFrame, textCol: String, idCol: String,
               cached: Boolean = true): DataFrame = {
    val tf = Spread.cpu(df, idCol)
      .select(col(idCol), explode(tokens(lower(col(textCol)))).as("t"))
      .groupBy(col(idCol), col("t")).agg(count(lit(1)).as("c"))
    if (cached) tf.scopedCache() else tf
  }

  /** BM25 relevance of every document against a fixed term set — the
    * retrieval scorer behind dedup-against-eval and targeted corpus
    * sampling. score(d) = Σ_t idf(t)·tf·(k1+1) / (tf + k1·(1−b+b·len/avg)),
    * idf(t) = ln(1 + (N−df+0.5)/(df+0.5)).
    *
    * Shape: everything derives from the shared (doc, token) pre-agg — doc
    * lengths (groupBy id), term doc-frequencies (groupBy t over the tiny
    * matched subset), corpus stats (a 1-row agg cross-joined in, never a
    * driver collect). The scoring join touches only rows whose token is in
    * the query set — the IN-filter pushes into the tf scan, so corpus-scale
    * cost is proportional to postings of the query terms, exactly an
    * inverted-index probe. Returns (id, n_matched, score) for docs matching
    * ≥ 1 term.
    */
  def bm25(df: DataFrame, textCol: String, idCol: String,
           queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75)
      : DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    // cache (in termFreq): feeds doc lengths, corpus stats, and the scorer
    val tf = termFreq(df, textCol, idCol)
    val docLen = tf.groupBy(col(idCol)).agg(sum(col("c")).as("len"))
    // N and avg doc length as a 1-row frame: broadcast into the plan, no
    // collect — the stats stay inside the DAG at any corpus size
    val stats = docLen.agg(count(lit(1)).as("n_docs"),
      avg(col("len")).as("avg_len"))
    val matched = tf.filter(col("t").isin(queryTerms: _*))
    val dfreq = matched.groupBy(col("t"))
      .agg(count(lit(1)).as("dft")) // tf is distinct per (doc, t)
    matched
      .join(broadcast(dfreq), "t")
      .join(docLen, idCol)
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("dft") + 0.5) /
          (col("dft") + 0.5)))
      .withColumn("tf_norm",
        col("c") * (k1 + 1) / (col("c") + lit(k1) *
          (lit(1 - b) + lit(b) * col("len") / col("avg_len"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_matched"),
        sum(col("idf") * col("tf_norm")).as("score"))
  }

  /** Per-document average negative log-likelihood under the corpus's own
    * BIGRAM LM (MLE, no smoothing): NLL(d) = Σ c_bg·(ln c(w1·) − ln c(w1w2))
    * / n_bigrams, where c(w1w2) is the corpus bigram count and c(w1·) the
    * corpus count of w1 as a bigram head. The sharper perplexity proxy than
    * [[unigramNll]] — word-salad text has plausible unigrams but rare
    * bigrams. Docs with < 2 tokens have no bigrams and are absent.
    *
    * Shape: adjacent bigrams explode (same transform/slice HOF as
    * [[repetitionStats]]) → per-(doc, bigram) partial-aggregating groupBy;
    * corpus bigram counts aggregate FROM that frame (pre-combined pairs);
    * head counts aggregate from the corpus bigram frame (tiny). Both
    * attach joins are equi-key on the bigram/head string. MLE probabilities
    * are exact by construction (every doc bigram exists in the corpus LM),
    * so no smoothing parameter leaks into parity.
    */
  def bigramNll(df: DataFrame, textCol: String, idCol: String)
      : DataFrame = {
    val ltoks = tokens(lower(col(textCol)))
    val bigrams = Spread.cpu(df, idCol)
      .select(col(idCol), ltoks.as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .filter(col("n") >= 2)
      .select(col(idCol),
        explode(transform(sequence(lit(0L), col("n") - 2),
          i => array_join(slice(col("toks"), i + 1, lit(2)), " "))).as("bg"))
    // Corpus LM counts as WINDOW sums over the per-(doc, bigram) frame —
    // not groupBy + join-back: the join form re-shuffles the frame for the
    // bigram agg, the head agg, and both probe sides; the window form pays
    // one exchange per partition key and keeps the pipeline single-pass
    // (no cache needed). chead over the head partition equals the summed
    // cbg of that head because both sum the same underlying c rows.
    import org.apache.spark.sql.expressions.Window
    val dbg = bigrams.groupBy(col(idCol), col("bg"))
      .agg(count(lit(1)).as("c"))
    dbg
      .withColumn("cbg", sum(col("c")).over(Window.partitionBy(col("bg"))))
      .withColumn("head", substring_index(col("bg"), " ", 1))
      .withColumn("chead",
        sum(col("c")).over(Window.partitionBy(col("head"))))
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n_bigrams"),
        sum(col("c").cast("double") *
          (log(col("chead").cast("double")) -
            log(col("cbg").cast("double")))).as("__nll"))
      .select(col(idCol), col("n_bigrams"),
        (col("__nll") / col("n_bigrams").cast("double")).as("avg_nll"))
  }

  def unigramNll(df: DataFrame, textCol: String, idCol: String)
      : DataFrame = {
    // cache (in termFreq): tf feeds the corpus total AND the scoring pass
    val tf = termFreq(df, textCol, idCol)
    // coalesce: sum over an EMPTY corpus is null, and an empty corpus must
    // yield an empty result, not a driver NPE (ln(0) is never evaluated —
    // no tf rows remain to score)
    val total = tf.agg(coalesce(sum(col("c")), lit(0L)))
      .head.getLong(0)
    // corpus term frequency as a WINDOW sum over the t partition — the
    // groupBy + join-back form shuffles tf twice more (agg build + probe)
    tf.withColumn("ctf",
        sum(col("c")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("t"))))
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n_tokens"),
        sum(col("c").cast("double") *
          (log(lit(total.toDouble)) - log(col("ctf").cast("double"))))
          .as("__nll"))
      .select(col(idCol), col("n_tokens"),
        (col("__nll") / col("n_tokens").cast("double")).as("avg_nll"))
  }
}
