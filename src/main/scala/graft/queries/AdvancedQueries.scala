package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.AsOfJoin
import graft.io.Tables
import Parity._

/** Operators beyond the reference's surface that complete the engine:
  * as-of join, rollup/cube subtotals, set ops, approximate distinct.
  */
object AdvancedQueries {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // As-of join: each purchase sees the user's latest prior (or
    // same-instant) signup value — the classic point-in-time enrichment
    "q_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val signups = ev.filter(col("event_type") === "signup")
      AsOfJoin.leftAsOf(purchases, signups, Seq("user_id"), "ts", "ts",
          Map("value" -> "signup_value"))
        .select(col("event_id"), col("user_id"), col("value"),
          col("signup_value"))
        .orderBy(col("event_id"))
    }),

    // ROLLUP subtotals (SURVEY §2.4 "cube/rollup trivially available");
    // group keys coalesced to a sentinel so both engines order identically
    "q_rollup" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty"), col("n"))
        .orderBy(col("returnflag"), col("linestatus"))),

    // CUBE over two independent dims
    "q_cube" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("dow",
          dayofweek(col("ts")).cast("long"))
        .cube(col("event_type"), col("dow"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
          coalesce(col("dow"), lit(-1L)).as("dow"),
          col("n"), col("total_value"))
        .orderBy(col("event_type"), col("dow"))),

    // JSON column access: parse props, bucket by the extracted field
    "q_json_extract" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("k",
          get_json_object(col("props"), "$.k").cast("long"))
        .groupBy((col("k") / lit(10)).cast("long").as("k_bucket"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .orderBy(col("k_bucket"))),

    // Date/time scalar-function family (F-row breadth): arithmetic,
    // diffs, ISO week, day-of-year, month boundaries
    "q_datetime_funcs" -> ((s, dir) =>
      eventsT(s, dir).select(col("date")).distinct()
        .select(col("date"),
          date_add(col("date"), 7).as("plus_7d"),
          datediff(col("date"), lit("2024-01-01")).cast("long").as("days_since"),
          dayofyear(col("date")).cast("long").as("doy"),
          weekofyear(col("date")).cast("long").as("iso_week"),
          last_day(col("date")).as("month_end"),
          trunc(col("date"), "month").as("month_start"))
        .orderBy(col("date"))),

    // Exact interpolated percentiles per group (Spark `percentile` ==
    // DuckDB `quantile_cont`)
    "q_percentiles" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          expr("percentile(value, 0.5)").as("p50_raw"),
          expr("percentile(value, 0.9)").as("p90_raw"),
          max(col("value")).as("max_value"))
        .select(col("event_type"),
          ground(col("p50_raw"), 4).as("p50"),
          ground(col("p90_raw"), 4).as("p90"),
          col("max_value"))
        .orderBy(col("event_type"))),

    // Key-skew profile — the pre-flight diagnostic before choosing a
    // partitioning/salting strategy at scale: per-key counts collapse
    // FIRST (one map-side-combining shuffle of (key, count) rows), then
    // one global aggregate over the per-key frame yields row total, key
    // cardinality, the hottest key's share, and p50/p99 per-key counts —
    // the p99/p50 ratio and top share are what decide between plain
    // hash partitioning, salting, and AQE skew handling. Raw events
    // never cross the second aggregate.
    "q_skew_profile" -> ((s, dir) => {
      val counts = Tables.events(s, dir)
        .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      counts.agg(
        sum(col("c")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("c")).as("max_cnt"),
        ground(max(col("c")).cast("double") / sum(col("c")), 6)
          .as("top_share"),
        ground(expr("percentile(c, 0.5)"), 4).as("p50_cnt"),
        ground(expr("percentile(c, 0.99)"), 4).as("p99_cnt"))
    }),

    // String-function surface: case, substring, length, concat, replace,
    // padding, trim
    "q_string_funcs" -> ((s, dir) =>
      Tables.customer(s, dir)
        .filter(col("c_custkey") <= 100)
        .select(col("c_custkey"),
          upper(col("c_mktsegment")).as("seg_upper"),
          lower(col("c_name")).as("name_lower"),
          substring(col("c_name"), 1, 8).as("name_prefix"),
          length(col("c_name")).cast("long").as("name_len"),
          concat_ws("|", col("c_mktsegment"), col("c_name")).as("joined"),
          regexp_replace(col("c_name"), "[0-9]", "#").as("masked"),
          lpad(col("c_custkey").cast("string"), 8, "0").as("padded"))
        .orderBy(col("c_custkey"))),

    // Array/HOF scalar-function family (F-coverage: construction, slice,
    // distinct, sort, membership, transform/aggregate folds) — all
    // codegen-eval projections, no UDFs, no shuffle
    "q_array_funcs" -> ((s, dir) => {
      val toks = split(trim(col("text")), "\\s+")
      val tokLens = transform(toks, t => length(t).cast("long"))
      Tables.documents(s, dir).select(
          col("doc_id"),
          size(toks).cast("long").as("n_toks"),
          size(array_distinct(toks)).cast("long").as("n_uniq"),
          array_join(slice(toks, 1, 3), " ").as("first3"),
          sort_array(toks).getItem(0).as("min_tok"),
          array_contains(toks, "the").cast("long").as("has_the"),
          aggregate(tokLens, lit(0L), (a, x) => a + x).as("chars"),
          array_max(tokLens).as("max_tok_len"))
        .orderBy(col("doc_id"))
    }),

    // Pivot (long → wide): per-user value totals by event type. The value
    // list is EXPLICIT — pivot without one runs a distinct-collect planning
    // pass AND makes the output schema data-dependent (both wrong at scale
    // and for a stable oracle). One shuffle: groupBy(user) with map-side
    // pivot aggregation.
    "q_pivot" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .agg(dsum(col("value")))
        .orderBy(col("user_id"))),

    // Ranking window family per event type: row_number / rank /
    // dense_rank / percent_rank / ntile over (total desc, user) — ties in
    // total exercise the rank vs dense_rank vs row_number distinctions.
    // Scale note: ranking partitions by event_type, so each partition
    // holds one type's users — a bounded-cardinality global ranking. A
    // truly global full ranking is a total sort by construction; for
    // top-k-only asks use the TakeOrderedAndProject form (q_topk_users).
    "q_rank_funcs" -> ((s, dir) => {
      val totals = Tables.events(s, dir)
        .groupBy(col("user_id"), col("event_type"))
        .agg(dsum(col("value")).as("total"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("total").desc, col("user_id"))
      totals.select(col("user_id"), col("event_type"), col("total"),
          row_number().over(w).cast("long").as("rn"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          percent_rank().over(w).as("prnk"),
          ntile(4).over(w).cast("long").as("quartile"))
        .orderBy(col("event_type"), col("rn"))
    }),

    // Schema-evolution union: two corpus snapshots with different column
    // sets align by NAME with nulls for the missing ones — the ingest
    // shape for a corpus whose schema grew over time (positional union
    // would silently misalign columns)
    "q_union_by_name" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val v1 = docs.filter(col("doc_id") < 250)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val v2 = docs.filter(col("doc_id") >= 250)
        .select(col("doc_id"), col("source"), col("lang"))
      v1.unionByName(v2, allowMissingColumns = true)
        .orderBy(col("doc_id"))
    }),

    // GROUPING SETS through the SQL entry path (spark.sql over a temp
    // view) — arbitrary grouping-set combinations beyond rollup/cube.
    // The view registers on and the SQL runs against the frame's OWNING
    // session (`ev.sparkSession`, not the caller's `s`): on a legacy
    // NANOS-annotated events fixture Tables.events returns a frame bound
    // to its memoized nanosAsLong child session, where a view registered
    // there is invisible to the parent catalog (Sources.scala:75-91) —
    // regression-pinned by FixturesSpec's NANOS SQL-path case
    "q_grouping_sets" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      ev.createOrReplaceTempView("events_gs")
      ev.sparkSession.sql(s"""
        SELECT coalesce(event_type, 'ALL') AS event_type,
               coalesce(cast(user_id % 10 as string), 'ALL') AS user_band,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        FROM events_gs
        GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
        ORDER BY event_type, user_band""")
    }),

    // Conditional / argmax aggregate family: count_if, bool_or/bool_and,
    // max_by/min_by. The max_by ordering key is made UNIQUE
    // (value·10^6 + event_id — exact integers below 2^53 in both engines):
    // ties on raw value would resolve nondeterministically and differ
    // between engines.
    "q_cond_agg" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          expr("count_if(value > 10)").as("n_hi"),
          expr("cast(bool_or(value > 100) as long)").as("any_gt100"),
          expr("cast(bool_and(value >= 0) as long)").as("all_nonneg"),
          expr("max_by(event_id, value * 1000000 + event_id)").as("top_event"),
          expr("min_by(event_id, value * 1000000 + event_id)").as("low_event"))
        .orderBy(col("event_type"))),

    // INTERSECT / EXCEPT set ops
    "q_set_ops" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val buyers = ev.filter(col("event_type") === "purchase")
        .select(col("user_id")).distinct()
      val errorers = ev.filter(col("event_type") === "error")
        .select(col("user_id")).distinct()
      val both = buyers.intersect(errorers).withColumn("tag", lit("both"))
      val buyOnly = buyers.except(errorers).withColumn("tag", lit("buy_only"))
      both.union(buyOnly).orderBy(col("tag"), col("user_id"))
    })
  )

  val oracles: Map[String, String] = Map(

    "q_asof_join" ->
      """SELECT p.event_id, p.user_id, p.value, s.value AS signup_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
        |  ON p.user_id = s.user_id AND s.ts <= p.ts
        |ORDER BY p.event_id""".stripMargin,

    "q_rollup" ->
      s"""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
         |  coalesce(l_linestatus, 'ALL') AS linestatus,
         |  ${sqlDsum("l_quantity")} AS sum_qty,
         |  count(*) AS n
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY returnflag, linestatus""".stripMargin,

    "q_cube" ->
      s"""SELECT coalesce(event_type, 'ALL') AS event_type,
         |  coalesce(CAST(dayofweek(ts) + 1 AS BIGINT), -1) AS dow,
         |  count(*) AS n,
         |  ${sqlDsum("value")} AS total_value
         |FROM events GROUP BY CUBE(event_type, (CAST(dayofweek(ts) + 1 AS BIGINT)))
         |ORDER BY event_type, dow""".stripMargin,

    "q_json_extract" ->
      s"""SELECT CAST(CAST(json_extract_string(props, '$$.k') AS BIGINT) // 10
         |    AS BIGINT) AS k_bucket,
         |  count(*) AS n, ${sqlDsum("value")} AS total_value
         |FROM events GROUP BY 1 ORDER BY k_bucket""".stripMargin,

    "q_datetime_funcs" ->
      """SELECT DISTINCT CAST(ts AS DATE) AS "date",
        |  CAST(ts AS DATE) + 7 AS plus_7d,
        |  CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT)
        |    AS days_since,
        |  CAST(dayofyear(ts) AS BIGINT) AS doy,
        |  CAST(weekofyear(ts) AS BIGINT) AS iso_week,
        |  last_day(CAST(ts AS DATE)) AS month_end,
        |  date_trunc('month', CAST(ts AS DATE)) AS month_start
        |FROM events ORDER BY "date"""".stripMargin,

    "q_percentiles" ->
      s"""SELECT event_type,
         |  ${sqlGround("quantile_cont(value, 0.5)", 4)} AS p50,
         |  ${sqlGround("quantile_cont(value, 0.9)", 4)} AS p90,
         |  max(value) AS max_value
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_skew_profile" ->
      s"""WITH c AS (
         |  SELECT user_id, count(*) AS c FROM events GROUP BY 1
         |)
         |SELECT CAST(sum(c) AS BIGINT) AS n_rows,
         |  count(*) AS n_keys,
         |  max(c) AS max_cnt,
         |  ${sqlGround("CAST(max(c) AS DOUBLE) / sum(c)", 6)} AS top_share,
         |  ${sqlGround("quantile_cont(c, 0.5)", 4)} AS p50_cnt,
         |  ${sqlGround("quantile_cont(c, 0.99)", 4)} AS p99_cnt
         |FROM c""".stripMargin,

    "q_string_funcs" ->
      """SELECT c_custkey,
        |  upper(c_mktsegment) AS seg_upper,
        |  lower(c_name) AS name_lower,
        |  substr(c_name, 1, 8) AS name_prefix,
        |  CAST(length(c_name) AS BIGINT) AS name_len,
        |  concat_ws('|', c_mktsegment, c_name) AS joined,
        |  regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
        |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded
        |FROM customer WHERE c_custkey <= 100
        |ORDER BY c_custkey""".stripMargin,

    "q_cond_agg" ->
      """SELECT event_type,
        |  count(*) FILTER (WHERE value > 10) AS n_hi,
        |  CAST(bool_or(value > 100) AS BIGINT) AS any_gt100,
        |  CAST(bool_and(value >= 0) AS BIGINT) AS all_nonneg,
        |  max_by(event_id, value * 1000000 + event_id) AS top_event,
        |  min_by(event_id, value * 1000000 + event_id) AS low_event
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_union_by_name" ->
      """SELECT doc_id, lang, n_chars, NULL AS source
        |FROM documents WHERE doc_id < 250
        |UNION ALL
        |SELECT doc_id, lang, NULL AS n_chars, source
        |FROM documents WHERE doc_id >= 250
        |ORDER BY doc_id""".stripMargin,

    "q_grouping_sets" ->
      """SELECT coalesce(event_type, 'ALL') AS event_type,
        |       coalesce(CAST(user_id % 10 AS VARCHAR), 'ALL') AS user_band,
        |       count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
        |ORDER BY event_type, user_band""".stripMargin,

    // Conditional aggregation = the engine-portable pivot twin (DuckDB's
    // PIVOT syntax would also work, but CASE-sums pin the column order)
    "q_pivot" -> {
      val cols = Seq("click", "error", "purchase", "signup", "view").map(t =>
        s"""CAST(sum(CASE WHEN event_type = '$t'
           |    THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS "$t""""
          .stripMargin).mkString(",\n  ")
      s"""SELECT user_id,
         |  $cols
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
    },

    "q_rank_funcs" ->
      s"""WITH totals AS (
         |  SELECT user_id, event_type, ${sqlDsum("value")} AS total
         |  FROM events GROUP BY user_id, event_type
         |)
         |SELECT user_id, event_type, total,
         |  CAST(row_number() OVER w AS BIGINT) AS rn,
         |  CAST(rank() OVER w AS BIGINT) AS rnk,
         |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
         |  percent_rank() OVER w AS prnk,
         |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
         |FROM totals
         |WINDOW w AS (PARTITION BY event_type ORDER BY total DESC, user_id)
         |ORDER BY event_type, rn""".stripMargin,

    "q_array_funcs" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '[\s\x0b]+') AS toks
        |  FROM documents
        |)
        |SELECT doc_id,
        |  len(toks) AS n_toks,
        |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq,
        |  array_to_string(toks[1:3], ' ') AS first3,
        |  list_sort(toks)[1] AS min_tok,
        |  CAST(CASE WHEN list_contains(toks, 'the') THEN 1 ELSE 0 END
        |    AS BIGINT) AS has_the,
        |  CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT)
        |    AS chars,
        |  CAST(list_max(list_transform(toks, x -> length(x))) AS BIGINT)
        |    AS max_tok_len
        |FROM t ORDER BY doc_id""".stripMargin,

    "q_set_ops" ->
      """WITH buyers AS (
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
        |), errorers AS (
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
        |)
        |SELECT user_id, 'both' AS tag
        |  FROM (SELECT user_id FROM buyers INTERSECT SELECT user_id FROM errorers)
        |UNION ALL
        |SELECT user_id, 'buy_only' AS tag
        |  FROM (SELECT user_id FROM buyers EXCEPT SELECT user_id FROM errorers)
        |ORDER BY tag, user_id""".stripMargin
  )
}
