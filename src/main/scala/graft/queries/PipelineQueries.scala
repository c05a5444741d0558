package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.etl.Salting
import graft.ext.{AsOfJoin, Dedup, Drift, Packing, Sampling, TextAnalysis => TA}
import graft.feat.Sessions
import graft.io.Tables
import Parity._

/** Round-3 training-data-pipeline operators: sequence packing,
  * decontamination, stratified/mixture sampling, repetition quality,
  * skew-salted aggregation/join, null-safe join. Every query has a DuckDB
  * oracle reproducing the exact same deterministic rule (hash membership,
  * shingle sets, offsets) — see FIXTURES.md §B for the float discipline.
  */
object PipelineQueries {

  private val StopSql = TA.Stopwords.map(s => s"'$s'").mkString(", ")

  /** The mixture recipe exercised by q_mixture (bounded source domain). */
  private val MixtureWeights =
    Map("src0" -> 100, "src1" -> 75, "src2" -> 50, "src3" -> 25)
  private val MixtureDefault = 10

  /** Upsampling recipe for q_mixture_epochs (weights may exceed 100). */
  private val EpochWeights = Map("src0" -> 250, "src1" -> 100, "src2" -> 40)
  private val EpochDefault = 0

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Sequence packing: documents → fixed-size context windows (offset
    // packing, one window shuffle; see graft.ext.Packing for why greedy
    // first-fit is not a distributed plan)
    "q_seq_pack" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .withColumn("n_tokens", size(TA.tokens(col("text"))).cast("long"))
      val packed = Packing.packByOffset(docs, Seq("lang"), "doc_id",
        "n_tokens", ctxTokens = 256)
      Packing.packSummary(packed, Seq("lang"), "doc_id", "n_tokens")
        .orderBy(col("lang"), col("pack_id"))
    }),

    // Decontamination: training docs sharing 3-gram shingles with the test
    // split (stable hash split, so the protected set is reproducible)
    "q_contamination" -> ((s, dir) => {
      val sp = Sampling.withSplit(Tables.documents(s, dir), "doc_id", "graft")
      Dedup.contaminationOverlap(
          sp.filter(col("split") === "train"),
          sp.filter(col("split") === "test"), "text", "doc_id")
        .select(col("doc_id"), col("n_shared"), col("n_g"),
          ground(col("contamination"), 6).as("contamination"))
        .orderBy(col("doc_id"))
    }),

    // Exact stratified sample: 5 docs per language under deterministic
    // hash order
    "q_stratified_sample" -> ((s, dir) =>
      Sampling.stratifiedSample(Tables.documents(s, dir), Seq("lang"),
          "doc_id", salt = "strat", n = 5)
        .select(col("lang"), col("doc_id"), col("samp_rank"))
        .orderBy(col("lang"), col("samp_rank"))),

    // Mixture resampling: per-source target percentages (training-mixture
    // recipe), then the realized per-source counts
    "q_mixture" -> ((s, dir) =>
      Sampling.mixtureSample(Tables.documents(s, dir), "source",
          MixtureWeights, MixtureDefault, "doc_id", salt = "mix")
        .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        .orderBy(col("source"))),

    // Mixture with upsampling: 250% = 2 full epochs + a stable 50% third
    // copy — realized (source, epoch) counts
    "q_mixture_epochs" -> ((s, dir) =>
      Sampling.mixtureUpsample(Tables.documents(s, dir), "source",
          EpochWeights, EpochDefault, "doc_id", salt = "mix")
        .groupBy(col("source"), col("epoch"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("source"), col("epoch"))),

    // Temperature mixture: per-lang weights DERIVED from corpus counts
    // (w ∝ n^0.5 — the multilingual-pretraining flattening recipe),
    // realized as an exact deterministic per-group sample; n_kept and
    // min_kept_doc prove the realization, not just the arithmetic
    "q_temperature_mix" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val targets = Sampling.temperatureTargets(docs, "lang",
        alpha = 0.5, share = 0.5)
      // the join-back is null-safe (<=>, mirrored by IS NOT DISTINCT FROM
      // in the oracle) so a NULL-lang group — which the operator samples
      // like any other — survives the query-level realization too
      val kept = Sampling
        .temperatureSampleWith(docs, targets, "lang", "doc_id",
          salt = "temp")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), min(col("doc_id")).as("min_kept_doc"))
        .withColumnRenamed("lang", "__klang")
      targets
        .join(kept, col("lang") <=> col("__klang"), "left")
        .select(col("lang"), col("n_docs"), col("w_temp"), col("n_target"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          col("min_kept_doc"))
        .orderBy(col("lang"))
    }),

    // Ordered funnel (view → click → purchase, each within 24 h of the
    // previous stage — the conversion-window rule that creates real stage
    // attrition): three conditional-min passes, each a shuffle on user_id
    // (AQE broadcasts the shrinking stage frames)
    "q_funnel" -> ((s, dir) => {
      val winUs = 24L * 3600 * 1000000
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts").cast("timestamp")).as("us"))
      val s1 = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("us")).as("t1"))
      val s2 = ev.filter(col("event_type") === "click").join(s1, "user_id")
        .filter(col("us") > col("t1") && col("us") <= col("t1") + winUs)
        .groupBy(col("user_id"), col("t1")).agg(min(col("us")).as("t2"))
      val s3 = ev.filter(col("event_type") === "purchase").join(s2, "user_id")
        .filter(col("us") > col("t2") && col("us") <= col("t2") + winUs)
        .groupBy(col("user_id"), col("t2")).agg(min(col("us")).as("t3"))
      val staged = s1
        .join(s2.select(col("user_id"), col("t2")), Seq("user_id"), "left")
        .join(s3.select(col("user_id"), col("t3")), Seq("user_id"), "left")
        .select(col("user_id"),
          (lit(1L) + col("t2").isNotNull.cast("long") +
            col("t3").isNotNull.cast("long")).as("stage"))
      staged.groupBy(col("stage")).agg(count(lit(1)).as("n_users"))
        .orderBy(col("stage"))
    }),

    // End-to-end corpus prep, second flagship composition: exact-dedup
    // keepers → quality gate → mixture sample → stable split → sequence
    // packing per split. Narrow except the dedup groupBy, the pack window,
    // and the final small agg.
    "q_corpus_pack" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val keepers = Dedup.exactGroups(docs, "text", "doc_id")
        .select(col("keeper_id").as("doc_id"))
      val kept = docs.join(keepers, Seq("doc_id"), "left_semi")
      val st = TA.withTokenStats(kept, "text")
        .withColumn("quality",
          ground(TA.qualityScore(col("n_tokens"), col("token_chars"),
            col("n_punct"), col("n_stopwords")), 4))
        .filter(col("quality") >= 0.5)
      val mixed = Sampling.mixtureSample(st, "source", Map.empty,
        defaultPct = 50, "doc_id", salt = "prep")
      val split = Sampling.withSplit(mixed, "doc_id", "graft")
      val packed = Packing.packByOffset(split, Seq("split"), "doc_id",
        "n_tokens", ctxTokens = 512)
      Packing.packSummary(packed, Seq("split"), "doc_id", "n_tokens")
        .orderBy(col("split"), col("pack_id"))
    }),

    // EXISTS / NOT EXISTS predicate subqueries (Catalyst rewrites them to
    // semi/anti joins — the SQL-surface twin of q_semi_anti's explicit
    // join forms): customers with at least one order but none above 400k
    "q_exists_subquery" -> ((s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("customer_ex")
      Tables.orders(s, dir).createOrReplaceTempView("orders_ex")
      s.sql("""
        SELECT c_mktsegment, count(*) AS n
        FROM customer_ex c
        WHERE EXISTS (SELECT 1 FROM orders_ex o
                      WHERE o.o_custkey = c.c_custkey)
          AND NOT EXISTS (SELECT 1 FROM orders_ex o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 400000)
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    }),

    // CDC compaction: the LATEST record per key (row_number over ts desc,
    // event_id tiebreak for same-instant updates) — the upsert-materialize
    // step of a change-stream ingest
    "q_latest_per_key" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us").desc, col("event_id").desc)
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts").cast("timestamp")).as("us"), col("value"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("us"), col("value"))
        .orderBy(col("user_id"))
    }),

    // Forward as-of: each purchase matched to the user's NEXT error event
    // (at or after the purchase) — the mirror of q_asof_join's backward
    // lookup
    "q_asof_forward" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val errors = ev.filter(col("event_type") === "error")
      AsOfJoin.leftAsOfForward(purchases, errors, Seq("user_id"), "ts", "ts",
          Map("value" -> "next_error_value"))
        .select(col("event_id"), col("user_id"), col("next_error_value"))
        .orderBy(col("event_id"))
    }),

    // Cohort retention: users grouped by first-activity week, counted
    // distinct per week offset — two shuffles (first-seen, then the
    // cohort×offset distinct count)
    "q_cohort_retention" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"),
          date_trunc("week", col("ts").cast("timestamp")).cast("date")
            .as("week"))
      val first = ev.groupBy(col("user_id"))
        .agg(min(col("week")).as("cohort_week"))
      ev.join(first, "user_id")
        .withColumn("week_offset",
          datediff(col("week"), col("cohort_week")).cast("long") / 7)
        .withColumn("week_offset", col("week_offset").cast("long"))
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_week"), col("week_offset"))
    }),

    // Regular-grid resampling + LOCF gap fill over the daily spine — the
    // missing-day repair every window feature depends on
    "q_resample_locf" -> ((s, dir) =>
      graft.feat.Resample.dailyLocf(
          Parity.daily(s, dir).select(col("user_id"), col("date"),
            col("daily_value")), "user_id", "date", "daily_value")
        .orderBy(col("user_id"), col("date"))),

    // Linear-interpolation gap fill (the LOCF twin): gaps take the line
    // between surrounding observations, weighted by day offset
    "q_resample_lerp" -> ((s, dir) =>
      graft.feat.Resample.dailyLerp(
          Parity.daily(s, dir).select(col("user_id"), col("date"),
            col("daily_value")), "user_id", "date", "daily_value")
        .select(col("user_id"), col("date"), col("was_gap"),
          ground(col("value_filled"), 4).as("value_filled"))
        .orderBy(col("user_id"), col("date"))),

    // Wide→long unpivot (the inverse of q_pivot): per-user conditional
    // counts melted back to (metric, value) rows
    "q_unpivot" -> ((s, dir) => {
      val wide = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(count(when(col("event_type") === "click", 1)).as("n_click"),
          count(when(col("event_type") === "purchase", 1)).as("n_purchase"),
          count(when(col("event_type") === "error", 1)).as("n_error"))
      wide.unpivot(Array(col("user_id")),
          Array(col("n_click"), col("n_purchase"), col("n_error")),
          "metric", "n")
        .orderBy(col("user_id"), col("metric"))
    }),

    // Map-column family: build a per-user event_type→count map
    // (map_from_entries over a deterministically sorted entry list), then
    // read it back via element_at / size — map construction and lookup
    // without ever hashing a map-typed output column
    "q_map_funcs" -> ((s, dir) => {
      val cnt = Tables.events(s, dir)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      cnt.groupBy(col("user_id"))
        .agg(map_from_entries(sort_array(
          collect_list(struct(col("event_type"), col("n"))))).as("m"))
        .select(col("user_id"),
          size(col("m")).cast("long").as("n_types"),
          coalesce(element_at(col("m"), "click"), lit(0L)).as("n_click"),
          coalesce(element_at(col("m"), "purchase"), lit(0L)).as("n_purchase"),
          coalesce(element_at(col("m"), "error"), lit(0L)).as("n_error"))
        .orderBy(col("user_id"))
    }),

    // Value-window function family (complements q_rank_funcs's rank
    // family): first/last/nth value over an explicit full-partition frame —
    // default frames stop at CURRENT ROW, so last_value needs the
    // unbounded-following frame spelled out (classic silent-wrong-answer)
    "q_value_windows" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Parity.daily(s, dir)
      val wFull = Window.partitionBy(col("user_id")).orderBy(col("date"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      daily.select(col("user_id"), col("date"), col("daily_value"),
          first(col("daily_value")).over(wFull).as("first_val"),
          last(col("daily_value")).over(wFull).as("last_val"),
          nth_value(col("daily_value"), 2).over(wFull).as("second_val"))
        .orderBy(col("user_id"), col("date"))
    }),

    // Hopping (sliding) event-time windows: 1-hour windows every 30 min —
    // each event lands in exactly two windows (Spark plans the window()
    // expansion as an Expand, the same shape its streaming twin uses)
    "q_hopping_window" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts").cast("timestamp"), "1 hour", "30 minutes"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(col("window.start").as("win_start"),
          col("window.end").as("win_end"), col("n"), col("sum_value"))
        .orderBy(col("win_start"))),

    // Corrupt-record ingestion: a deterministic 1-in-13 slice of the JSON
    // payloads is mangled (prefix byte → unambiguously invalid), and the
    // pipeline must count the corrupt rows per group while aggregating the
    // valid ones — lenient parse (null on failure), never a job abort
    "q_json_corrupt" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("raw",
          when(pmod(col("event_id"), lit(13)) === 0,
            concat(lit("x"), col("props"))).otherwise(col("props")))
        .withColumn("k", get_json_object(col("raw"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          count(when(col("k").isNull, 1)).as("n_corrupt"),
          sum(col("k")).as("sum_k"))
        .orderBy(col("event_type"))),

    // Distribution drift: per-source Jensen-Shannon divergence vs the
    // whole corpus's token distribution (the mixing/ingest monitor)
    "q_source_drift" -> ((s, dir) =>
      Drift.tokenDistributionJsd(Tables.documents(s, dir), "text", "source")
        .select(col("source"), col("n_tokens"),
          ground(col("jsd"), 6).as("jsd"))
        .orderBy(col("source"))),

    // Token Shannon entropy per doc (perplexity-proxy quality signal)
    "q_token_entropy" -> ((s, dir) =>
      TA.tokenEntropy(Tables.documents(s, dir), "text", "doc_id")
        .select(col("doc_id"), col("n_tokens"),
          ground(col("entropy"), 6).as("entropy"))
        .orderBy(col("doc_id"))),

    // Repetition-based quality stats (Gopher-style): type-token ratio +
    // top-bigram share per doc
    "q_repetition" -> ((s, dir) =>
      TA.repetitionStats(Tables.documents(s, dir), "text", "doc_id")
        .select(col("doc_id"), col("n_tokens"),
          ground(col("distinct_ratio"), 6).as("distinct_ratio"),
          col("top_bigram_n"),
          ground(col("top_bigram_frac"), 6).as("top_bigram_frac"))
        .orderBy(col("doc_id"))),

    // Two-phase salted aggregation — result identical to the plain groupBy
    // (the oracle IS the plain groupBy); decimal sums so the extra partial
    // stage cannot change the float result
    "q_salted_agg" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("v", col("value").cast(DecimalType(18, 4)))
      Salting.saltedSumCount(ev, Seq("event_type"), "v", saltBuckets = 8)
        .select(col("event_type"), col("sum_v").cast("double").as("sum_value"),
          col("n"))
        .orderBy(col("event_type"))
    }),

    // Salted skew join — row-identical to the plain join (the oracle is the
    // plain join); the hot-key spread costs one small-side explode
    "q_salted_join" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val p = Tables.part(s, dir)
        .withColumnRenamed("p_partkey", "l_partkey")
        .select(col("l_partkey"), col("p_brand"))
      Salting.saltedJoin(li, p, Seq("l_partkey"), saltBuckets = 8)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("revenue"))
        .orderBy(col("p_brand"))
    }),

    // Incremental ingest dedup: the newest 20% of docs arrive as a batch
    // against the accepted corpus; classify dup-of-corpus / dup-in-batch /
    // novel per doc
    "q_incremental_dedup" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val cut = lit(400L)
      Dedup.incrementalDedupStatus(
          docs.filter(col("doc_id") >= cut),
          docs.filter(col("doc_id") < cut), "text", "doc_id")
        .orderBy(col("doc_id"))
    }),

    // Correlated scalar subquery (Catalyst rewrites it to an agg + join):
    // customers above their own nation's average balance. The threshold is
    // a decimal-exact sum / count so the comparison is engine-stable.
    "q_scalar_subquery" -> ((s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("customer_sq")
      s.sql("""
        SELECT c_nationkey, count(*) AS n_above
        FROM customer_sq c
        WHERE c_acctbal > (
          SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                 / count(*)
          FROM customer_sq c2 WHERE c2.c_nationkey = c.c_nationkey)
        GROUP BY c_nationkey ORDER BY c_nationkey""")
    }),

    // Range join (interval containment): events matched back into their
    // session intervals — every event lands in exactly one session, so
    // n_in_range must equal the session's own n_events. Equi-key on user
    // keeps the shuffle bounded; the interval predicate filters post-join.
    "q_range_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val sess = Sessions.sessionize(ev, "user_id", "ts", gapMinutes = 30)
        .withColumn("end_excl",
          col("session_end") + expr("INTERVAL '1' MICROSECOND"))
      AsOfJoin.rangeJoin(ev.select(col("user_id"), col("ts")), sess,
          Seq("user_id"), "ts", "session_start", "end_excl")
        .groupBy(col("user_id"), col("session_id"), col("n_events"))
        .agg(count(lit(1)).as("n_in_range"))
        .orderBy(col("user_id"), col("session_id"))
    }),

    // Sliding-window document chunking (RAG/embedding prep): 32-token
    // chunks every 24 tokens (8-token overlap); chunk text hashed so the
    // compare stays row-sized
    "q_doc_chunks" -> ((s, dir) =>
      Packing.chunkTokens(Tables.documents(s, dir), "text", "doc_id",
          chunkSize = 32, stride = 24)
        .select(col("doc_id"), col("chunk_id"), col("chunk_start"),
          col("n_chunk_tokens"), md5(col("chunk_text")).as("chunk_md5"))
        .orderBy(col("doc_id"), col("chunk_id"))),

    // Fixed-width histogram (the profiling primitive next to
    // q_percentiles): price distribution of lineitem in 5000-wide bins
    "q_histogram" -> ((s, dir) =>
      // bin by exact DECIMAL division + floor (double division could land
      // boundary prices on different sides in different engines)
      Tables.lineitem(s, dir)
        .groupBy(expr(
          "CAST(FLOOR(CAST(l_extendedprice AS DECIMAL(18,4)) / 5000) " +
            "AS BIGINT)").as("price_bin"))
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("total"))
        .orderBy(col("price_bin"))),

    // Null-safe equality join (<=>): a derived null-bearing key matches the
    // dim's null row instead of dropping out as SQL equality would
    "q_nullsafe_join" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .withColumn("key", when(pmod(col("k"), lit(7)) === 0,
          lit(null).cast("long")).otherwise(pmod(col("k"), lit(5))))
      val dim = Seq[(Option[Long], String)](
        Some(0L) -> "g0", Some(1L) -> "g1", Some(2L) -> "g2",
        Some(3L) -> "g3", Some(4L) -> "g4", None -> "g_null")
        .toDF("dkey", "grp")
      ev.join(dim, ev("key") <=> dim("dkey"), "left")
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy(col("grp"))
    })
  )

  val oracles: Map[String, String] = Map(

    "q_seq_pack" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(len(regexp_split_to_array(trim(text), '[\s\x0b]+'))
        |      AS BIGINT) AS n_tokens
        |  FROM documents
        |), o AS (
        |  SELECT lang, doc_id, n_tokens,
        |    coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS tok_offset
        |  FROM t
        |)
        |SELECT lang, CAST(tok_offset // 256 AS BIGINT) AS pack_id,
        |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM o GROUP BY 1, 2 ORDER BY lang, pack_id""".stripMargin,

    "q_contamination" ->
      s"""WITH sp AS (
         |  SELECT doc_id, text,
         |    CASE WHEN ${sqlBucket("graft", "doc_id")} < 80 THEN 'train'
         |         WHEN ${sqlBucket("graft", "doc_id")} < 90 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM documents
         |), sh AS (
         |  SELECT doc_id, split,
         |    list_distinct(list_transform(
         |      range(len(regexp_split_to_array(trim(text), '[\\s\\x0b]+')) - 2),
         |      i -> array_to_string(
         |        regexp_split_to_array(trim(text), '[\\s\\x0b]+')[i+1:i+3],
         |        ' '))) AS g
         |  FROM sp
         |), shx AS (
         |  SELECT doc_id, split, unnest(g) AS s FROM sh
         |), shared AS (
         |  SELECT doc_id, count(*) AS n_shared FROM shx
         |  WHERE split = 'train'
         |    AND s IN (SELECT DISTINCT s FROM shx WHERE split = 'test')
         |  GROUP BY 1
         |)
         |SELECT sh.doc_id, n_shared, CAST(len(g) AS BIGINT) AS n_g,
         |  round(n_shared / len(g) + 1e-9, 6) AS contamination
         |FROM shared JOIN sh USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "q_stratified_sample" ->
      s"""WITH r AS (
         |  SELECT lang, doc_id,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY ${sqlHashKey("strat", "doc_id")}, doc_id) AS samp_rank
         |  FROM documents
         |)
         |SELECT lang, doc_id, CAST(samp_rank AS BIGINT) AS samp_rank
         |FROM r WHERE samp_rank <= 5 ORDER BY lang, samp_rank""".stripMargin,

    "q_mixture" -> {
      val cases = MixtureWeights.toSeq.sortBy(_._1).map { case (src, p) =>
        s"WHEN source = '$src' THEN $p"
      }.mkString("\n         |         ")
      s"""SELECT source, count(*) AS n_docs FROM documents
         |WHERE ${sqlBucket("mix", "doc_id")} <
         |  CASE $cases
         |       ELSE $MixtureDefault END
         |GROUP BY 1 ORDER BY source""".stripMargin
    },

    "q_mixture_epochs" -> {
      val cases = EpochWeights.toSeq.sortBy(_._1).map { case (src, p) =>
        s"WHEN source = '$src' THEN $p"
      }.mkString("\n         |           ")
      s"""WITH w AS (
         |  SELECT doc_id, source,
         |    CASE $cases
         |         ELSE $EpochDefault END AS pct,
         |    ${sqlBucket("mix", "doc_id")} AS bkt
         |  FROM documents
         |), e AS (
         |  SELECT doc_id, source, pct, bkt,
         |    unnest(range(0, greatest((pct + 99) // 100, 1))) AS epoch
         |  FROM w
         |)
         |SELECT source, CAST(epoch AS BIGINT) AS epoch,
         |  count(*) AS n_docs
         |FROM e WHERE epoch * 100 + bkt < pct
         |GROUP BY 1, 2 ORDER BY source, epoch""".stripMargin
    },

    "q_temperature_mix" ->
      s"""WITH c AS (
         |  SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1
         |), t AS (
         |  SELECT lang, n_docs,
         |    ${sqlGround("pow(n_docs, 0.5) / sum(pow(n_docs, 0.5)) OVER ()", 6)}
         |      AS w_temp,
         |    floor(0.5 * sum(n_docs) OVER () + 1e-9) AS budget
         |  FROM c
         |), tt AS (
         |  SELECT lang, n_docs, w_temp,
         |    least(CAST(floor(w_temp * budget + 1e-9) AS BIGINT), n_docs)
         |      AS n_target
         |  FROM t
         |), r AS (
         |  SELECT lang, doc_id,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY ${sqlHashKey("temp", "doc_id")}, doc_id) AS samp_rank
         |  FROM documents
         |), k AS (
         |  SELECT r.lang, count(*) AS n_kept, min(doc_id) AS min_kept_doc
         |  FROM r JOIN tt ON r.lang IS NOT DISTINCT FROM tt.lang
         |  WHERE samp_rank <= n_target GROUP BY 1
         |)
         |SELECT tt.lang, n_docs, w_temp, n_target,
         |  coalesce(n_kept, 0) AS n_kept, min_kept_doc
         |FROM tt LEFT JOIN k ON tt.lang IS NOT DISTINCT FROM k.lang
         |ORDER BY tt.lang""".stripMargin,

    "q_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
        |), s1 AS (
        |  SELECT user_id, min(us) AS t1 FROM e
        |  WHERE event_type = 'view' GROUP BY 1
        |), s2 AS (
        |  SELECT e.user_id, min(us) AS t2 FROM e JOIN s1 USING (user_id)
        |  WHERE event_type = 'click' AND us > t1
        |    AND us <= t1 + 86400000000 GROUP BY 1
        |), s3 AS (
        |  SELECT e.user_id, min(us) AS t3 FROM e JOIN s2 USING (user_id)
        |  WHERE event_type = 'purchase' AND us > t2
        |    AND us <= t2 + 86400000000 GROUP BY 1
        |)
        |SELECT stage, count(*) AS n_users FROM (
        |  SELECT CAST(1 + CAST(s2.user_id IS NOT NULL AS BIGINT)
        |              + CAST(s3.user_id IS NOT NULL AS BIGINT) AS BIGINT)
        |    AS stage
        |  FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
        |) GROUP BY 1 ORDER BY stage""".stripMargin,

    "q_corpus_pack" ->
      s"""WITH keepers AS (
         |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
         |), d AS (
         |  SELECT documents.* FROM documents JOIN keepers USING (doc_id)
         |), t AS (
         |  SELECT doc_id, source, text,
         |    regexp_split_to_array(trim(text), '[\\s\\x0b]+') AS toks
         |  FROM d
         |), st AS (
         |  SELECT doc_id, source,
         |    CAST(len(toks) AS BIGINT) AS n_tokens,
         |    CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT)
         |      AS n_punct,
         |    CAST(len(list_filter(toks, t -> t IN ($StopSql))) AS BIGINT)
         |      AS n_stopwords
         |  FROM t
         |), q AS (
         |  SELECT doc_id, source, n_tokens,
         |    round(least(n_tokens / 100.0, 1.0) * 0.3
         |      + (1.0 - least(CAST(n_punct AS DOUBLE)
         |          / greatest(n_tokens, 1), 1.0)) * 0.4
         |      + least(CAST(n_stopwords AS DOUBLE) * 5.0
         |          / greatest(n_tokens, 1), 1.0) * 0.3
         |      + 1e-9, 4) AS quality
         |  FROM st
         |), mixed AS (
         |  SELECT * FROM q WHERE quality >= 0.5
         |    AND ${sqlBucket("prep", "doc_id")} < 50
         |), sp AS (
         |  SELECT *,
         |    CASE WHEN ${sqlBucket("graft", "doc_id")} < 80 THEN 'train'
         |         WHEN ${sqlBucket("graft", "doc_id")} < 90 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM mixed
         |), o AS (
         |  SELECT split, doc_id, n_tokens,
         |    coalesce(sum(n_tokens) OVER (PARTITION BY split ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS tok_offset
         |  FROM sp
         |)
         |SELECT split, CAST(tok_offset // 512 AS BIGINT) AS pack_id,
         |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM o GROUP BY 1, 2 ORDER BY split, pack_id""".stripMargin,

    "q_exists_subquery" ->
      """SELECT c_mktsegment, count(*) AS n
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_totalprice > 400000)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_latest_per_key" ->
      """SELECT user_id, event_id, event_type, us, value FROM (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rk
        |  FROM events
        |) WHERE rk = 1 ORDER BY user_id""".stripMargin,

    "q_asof_forward" ->
      """SELECT p.event_id, p.user_id, e.value AS next_error_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
        |  ON p.user_id = e.user_id AND e.ts >= p.ts
        |ORDER BY p.event_id""".stripMargin,

    "q_cohort_retention" ->
      """WITH e AS (
        |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
        |  FROM events
        |), f AS (
        |  SELECT user_id, min(week) AS cohort_week FROM e GROUP BY 1
        |)
        |SELECT cohort_week,
        |  CAST(datediff('day', cohort_week, week) // 7 AS BIGINT)
        |    AS week_offset,
        |  count(DISTINCT user_id) AS n_users
        |FROM e JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin,

    "q_resample_locf" ->
      s"""${Parity.dailySql}, span AS (
         |  SELECT user_id, min("date") AS d0, max("date") AS d1
         |  FROM daily GROUP BY 1
         |), grid AS (
         |  SELECT user_id,
         |    CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
         |      AS "date"
         |  FROM span
         |), j AS (
         |  SELECT g.user_id, g."date", d.daily_value
         |  FROM grid g LEFT JOIN daily d USING (user_id, "date")
         |)
         |SELECT user_id, "date",
         |  CAST(daily_value IS NULL AS BIGINT) AS was_gap,
         |  last_value(daily_value IGNORE NULLS) OVER (
         |    PARTITION BY user_id ORDER BY "date"
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    AS value_filled
         |FROM j ORDER BY user_id, "date"""".stripMargin,

    "q_resample_lerp" ->
      s"""${Parity.dailySql}, span AS (
         |  SELECT user_id, min("date") AS d0, max("date") AS d1
         |  FROM daily GROUP BY 1
         |), grid AS (
         |  SELECT user_id,
         |    CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
         |      AS "date"
         |  FROM span
         |), j AS (
         |  SELECT g.user_id, g."date", d.daily_value
         |  FROM grid g LEFT JOIN daily d USING (user_id, "date")
         |), anch AS (
         |  SELECT user_id, "date", daily_value,
         |    CAST(daily_value IS NULL AS BIGINT) AS was_gap,
         |    last_value(daily_value IGNORE NULLS) OVER wb AS pv,
         |    last_value(CASE WHEN daily_value IS NOT NULL THEN "date" END
         |      IGNORE NULLS) OVER wb AS pd,
         |    first_value(daily_value IGNORE NULLS) OVER wf AS nv,
         |    first_value(CASE WHEN daily_value IS NOT NULL THEN "date" END
         |      IGNORE NULLS) OVER wf AS nd
         |  FROM j
         |  WINDOW wb AS (PARTITION BY user_id ORDER BY "date"
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |  wf AS (PARTITION BY user_id ORDER BY "date"
         |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
         |)
         |SELECT user_id, "date", was_gap,
         |  round(CASE WHEN was_gap = 0 THEN daily_value
         |    ELSE pv + (nv - pv)
         |      * datediff('day', pd, "date")
         |      / datediff('day', pd, nd) END + 1e-9, 4) AS value_filled
         |FROM anch ORDER BY user_id, "date"""".stripMargin,

    "q_unpivot" ->
      """WITH wide AS (
        |  SELECT user_id,
        |    count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
        |    count(CASE WHEN event_type = 'purchase' THEN 1 END)
        |      AS n_purchase,
        |    count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error
        |  FROM events GROUP BY 1
        |)
        |SELECT user_id, metric, n FROM (
        |  SELECT user_id, 'n_click' AS metric, n_click AS n FROM wide
        |  UNION ALL
        |  SELECT user_id, 'n_purchase', n_purchase FROM wide
        |  UNION ALL
        |  SELECT user_id, 'n_error', n_error FROM wide
        |)
        |ORDER BY user_id, metric""".stripMargin,

    // Map semantics are reproduced as conditional aggregates — the values,
    // not the container, are the contract
    "q_map_funcs" ->
      """SELECT user_id,
        |  count(DISTINCT event_type) AS n_types,
        |  count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error
        |FROM events GROUP BY 1 ORDER BY user_id""".stripMargin,

    "q_value_windows" ->
      s"""${Parity.dailySql}
         |SELECT user_id, "date", daily_value,
         |  first_value(daily_value) OVER w AS first_val,
         |  last_value(daily_value) OVER w AS last_val,
         |  nth_value(daily_value, 2) OVER w AS second_val
         |FROM daily
         |WINDOW w AS (PARTITION BY user_id ORDER BY "date"
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         |ORDER BY user_id, "date"""".stripMargin,

    // Each event's two containing windows: the aligned 30-min slot and the
    // one 30 min earlier (duration 1h, slide 30m ⇒ exactly 2 per event)
    "q_hopping_window" ->
      """WITH e AS (
        |  SELECT ts, value,
        |    make_timestamp(epoch_us(ts) // 1800000000 * 1800000000) AS slot
        |  FROM events
        |), w AS (
        |  SELECT value,
        |    unnest([slot, slot - INTERVAL 30 MINUTE]) AS win_start
        |  FROM e
        |)
        |SELECT win_start, win_start + INTERVAL 1 HOUR AS win_end,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM w GROUP BY 1 ORDER BY win_start""".stripMargin,

    "q_json_corrupt" ->
      s"""WITH r AS (
         |  SELECT event_type,
         |    CASE WHEN event_id % 13 = 0 THEN 'x' || props ELSE props END
         |      AS raw
         |  FROM events
         |), p AS (
         |  SELECT event_type,
         |    CASE WHEN json_valid(raw)
         |         THEN CAST(json_extract_string(raw, '$$.k') AS BIGINT)
         |    END AS k
         |  FROM r
         |)
         |SELECT event_type, count(*) AS n,
         |  count(CASE WHEN k IS NULL THEN 1 END) AS n_corrupt,
         |  CAST(sum(k) AS BIGINT) AS sum_k
         |FROM p GROUP BY 1 ORDER BY event_type""".stripMargin,

    "q_source_drift" ->
      """WITH tok AS (
        |  SELECT source,
        |    unnest(regexp_split_to_array(trim(lower(text)), '[\s\x0b]+')) AS t
        |  FROM documents
        |), gt AS (
        |  SELECT source, t, count(*) AS c_gt FROM tok GROUP BY 1, 2
        |), g AS (
        |  SELECT source, CAST(sum(c_gt) AS BIGINT) AS n_g FROM gt GROUP BY 1
        |), o AS (
        |  SELECT t, sum(c_gt) AS c_t FROM gt GROUP BY 1
        |), tot AS (
        |  SELECT CAST(sum(c_t) AS DOUBLE) AS n FROM o
        |), j AS (
        |  SELECT gt.source,
        |    c_gt / g.n_g AS p,
        |    c_t / tot.n AS q
        |  FROM gt JOIN o USING (t) JOIN g USING (source) CROSS JOIN tot
        |)
        |SELECT j.source, g.n_g AS n_tokens,
        |  round((sum(p * ln(p / ((p + q) / 2)))
        |       + sum(q * ln(q / ((p + q) / 2)))) / 2
        |      + (1 - sum(q)) * ln(2) / 2 + 1e-9, 6) AS jsd
        |FROM j JOIN g ON j.source = g.source
        |GROUP BY 1, 2 ORDER BY j.source""".stripMargin,

    "q_token_entropy" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(regexp_split_to_array(trim(lower(text)), '[\s\x0b]+')) AS t
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, t, count(*) AS c FROM tok GROUP BY 1, 2
        |), h AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    sum(c * ln(c)) AS clogc
        |  FROM c GROUP BY 1
        |)
        |SELECT doc_id, n_tokens,
        |  round(ln(n_tokens) - clogc / n_tokens + 1e-9, 6) AS entropy
        |FROM h ORDER BY doc_id""".stripMargin,

    "q_repetition" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    regexp_split_to_array(trim(lower(text)), '[\s\x0b]+') AS toks
        |  FROM documents
        |), base AS (
        |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct
        |  FROM t
        |), bg AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(len(toks) - 1),
        |      i -> toks[i+1] || ' ' || toks[i+2])) AS b
        |  FROM t WHERE len(toks) >= 2
        |), top AS (
        |  SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bigram_n FROM (
        |    SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2
        |  ) GROUP BY 1
        |)
        |SELECT base.doc_id, n_tokens,
        |  round(n_distinct / n_tokens + 1e-9, 6) AS distinct_ratio,
        |  coalesce(top_bigram_n, 0) AS top_bigram_n,
        |  round(coalesce(top_bigram_n, 0) / greatest(n_tokens - 1, 1) + 1e-9, 6)
        |    AS top_bigram_frac
        |FROM base LEFT JOIN top USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // The salted two-phase agg is algebraically exact — its oracle is the
    // PLAIN aggregation (decimal sums make partial merge order irrelevant)
    "q_salted_agg" ->
      s"""SELECT event_type, ${sqlDsum("value")} AS sum_value,
         |  count(*) AS n
         |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,

    // Salted join ≡ plain join (salt only spreads shuffle keys)
    "q_salted_join" ->
      s"""SELECT p_brand, count(*) AS n,
         |  ${sqlDsum("l_extendedprice")} AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY 1 ORDER BY p_brand""".stripMargin,

    "q_incremental_dedup" ->
      """WITH b AS (
        |  SELECT doc_id, md5(coalesce(text, '')) AS h FROM documents
        |  WHERE doc_id >= 400
        |), known AS (
        |  SELECT DISTINCT md5(coalesce(text, '')) AS h FROM documents
        |  WHERE doc_id < 400
        |), firstin AS (
        |  SELECT h, min(doc_id) AS first_id FROM b GROUP BY h
        |)
        |SELECT b.doc_id,
        |  CASE WHEN known.h IS NOT NULL THEN 'dup_corpus'
        |       WHEN b.doc_id <> f.first_id THEN 'dup_batch'
        |       ELSE 'novel' END AS status
        |FROM b LEFT JOIN known ON b.h = known.h
        |JOIN firstin f ON b.h = f.h
        |ORDER BY b.doc_id""".stripMargin,

    "q_scalar_subquery" ->
      """SELECT c_nationkey, count(*) AS n_above
        |FROM customer c
        |WHERE c_acctbal > (
        |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
        |         / count(*)
        |  FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    // Oracle side does the same interval join against sessions rebuilt with
    // the lag/cumsum form (inclusive end; Spark passes end + 1µs exclusive)
    "q_range_join" ->
      """WITH e AS (
        |  SELECT user_id, ts, epoch_us(ts) AS us FROM events
        |), flagged AS (
        |  SELECT user_id, ts, us,
        |    CASE WHEN lag(us) OVER w IS NULL
        |           OR us - lag(us) OVER w > 30 * 60 * 1000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY us)
        |), numbered AS (
        |  SELECT user_id, ts, us,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY us
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM flagged
        |), sess AS (
        |  SELECT user_id, session_id,
        |    min(ts) AS session_start, max(ts) AS session_end,
        |    count(*) AS n_events
        |  FROM numbered GROUP BY 1, 2
        |)
        |SELECT s.user_id, s.session_id, s.n_events, count(*) AS n_in_range
        |FROM sess s JOIN events ev ON ev.user_id = s.user_id
        |  AND ev.ts >= s.session_start AND ev.ts <= s.session_end
        |GROUP BY 1, 2, 3 ORDER BY s.user_id, s.session_id""".stripMargin,

    "q_doc_chunks" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    regexp_split_to_array(trim(text), '[\s\x0b]+') AS toks
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, len(toks) AS n, toks,
        |    unnest(range(0, len(toks), 24)) AS chunk_start
        |  FROM t
        |)
        |SELECT doc_id, CAST(chunk_start // 24 AS BIGINT) AS chunk_id,
        |  CAST(chunk_start AS BIGINT) AS chunk_start,
        |  CAST(least(32, n - chunk_start) AS BIGINT) AS n_chunk_tokens,
        |  md5(array_to_string(toks[chunk_start+1:chunk_start+32], ' '))
        |    AS chunk_md5
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    "q_histogram" ->
      s"""SELECT CAST(FLOOR(CAST(l_extendedprice AS DECIMAL(18,4)) / 5000)
         |    AS BIGINT) AS price_bin,
         |  count(*) AS n, ${sqlDsum("l_extendedprice")} AS total
         |FROM lineitem GROUP BY 1 ORDER BY price_bin""".stripMargin,

    "q_nullsafe_join" ->
      s"""WITH e AS (
         |  SELECT CASE
         |      WHEN CAST(json_extract_string(props, '$$.k') AS BIGINT) % 7 = 0
         |      THEN NULL
         |      ELSE CAST(json_extract_string(props, '$$.k') AS BIGINT) % 5
         |    END AS key, value
         |  FROM events
         |), d(dkey, grp) AS (
         |  VALUES (0, 'g0'), (1, 'g1'), (2, 'g2'), (3, 'g3'), (4, 'g4'),
         |         (NULL, 'g_null')
         |)
         |SELECT grp, count(*) AS n, ${sqlDsum("value")} AS sum_value
         |FROM e LEFT JOIN d ON e.key IS NOT DISTINCT FROM d.dkey
         |GROUP BY 1 ORDER BY grp""".stripMargin
  )
}
