package graft

import org.apache.spark.sql.types._

/** Fixture-drift tripwire: asserts the READ schema of every driver testdata
  * table matches what [[graft.io.Tables]] expects, with a readable message.
  *
  * Exists because the round-8 testdata regeneration silently changed
  * `events.ts` from parquet TIMESTAMP(NANOS) to TIMESTAMP(MICROS) and the
  * old hard-coded nanos shim broke 76 queries and 126 tests with an opaque
  * DATATYPE_MISMATCH. This suite converts the next such environment change
  * into a one-line diagnosis. Keep it fast (< 5 s): schema-only reads, one
  * tiny count.
  */
class FixturesSpec extends SparkSpec {

  private val dir = TestSpark.sf0001

  private def assertCols(table: String, got: StructType,
                         want: (String, DataType => Boolean, String)*): Unit =
    want.foreach { case (name, ok, desc) =>
      val f = got.fields.find(_.name == name)
      assert(f.isDefined,
        s"$table: expected column '$name' ($desc) — file has " +
          got.fieldNames.mkString("[", ", ", "]"))
      assert(ok(f.get.dataType),
        s"$table.$name: expected $desc, file reads back as " +
          s"${f.get.dataType.simpleString} — the fixture format drifted; " +
          "update graft.io.Tables to dispatch on this shape")
    }

  private val temporal: DataType => Boolean = {
    case TimestampNTZType | TimestampType | DateType => true
    case _ => false
  }
  private val floatArray: DataType => Boolean = {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }
  private val numeric: DataType => Boolean =
    _.isInstanceOf[NumericType]
  private val stringy: DataType => Boolean = _ == StringType

  test("events: ts temporal after Tables shim, value numeric") {
    // go through Tables.events — the shim is part of the contract under test
    val df = graft.io.Tables.events(spark, dir)
    assertCols("events", df.schema,
      ("ts", temporal, "temporal (TIMESTAMP_NTZ after shim)"),
      ("value", numeric, "numeric reading value"),
      ("user_id", numeric, "numeric key"),
      ("event_type", stringy, "string"))
    assert(df.limit(1).count() == 1, "events: empty or unreadable")
    // containment contract: an events read NEVER mutates the caller's
    // session — the legacy nanosAsLong conf lives in a child session only
    assert(spark.conf
      .get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true",
      "Tables.events leaked nanosAsLong into the caller's session")
  }

  test("events: nanos-era files still read through the legacy shim branch") {
    // current fixtures are all TIMESTAMP(MICROS), so the LongType branch of
    // Tables.events (raw int64 nanos under nanosAsLong -> div 1000 ->
    // TIMESTAMP_NTZ) would otherwise be dead code until the next nanos file
    // appears. A BIGINT ts column presents to the reader exactly like a
    // nanos-typed column under the legacy conf, so this pins the shim's
    // arithmetic end-to-end.
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-nanos").toString
    val microsOfNoon = 1704110400000000L // 2024-01-01 12:00:00 UTC
    spark.range(3).select(
        col("id").as("event_id"),
        (lit(microsOfNoon * 1000L) + col("id") * 1000000000L).as("ts"),
        col("id").as("user_id"),
        lit("purchase").as("event_type"),
        lit(1.5).as("value"),
        lit(null).cast("string").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = graft.io.Tables.events(spark, dir)
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType,
      s"shim branch did not produce TIMESTAMP_NTZ: ${df.schema("ts")}")
    val got = df.orderBy("event_id")
      .select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")).collect()
      .map(_.getString(0)).toSeq
    assert(got == Seq("2024-01-01 12:00:00", "2024-01-01 12:00:01",
      "2024-01-01 12:00:02"), s"nanos shim arithmetic drifted: $got")
    assert(spark.conf
      .get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true",
      "a BIGINT-ts read must not touch the caller's session conf")
  }

  /** Write a REAL parquet TIMESTAMP(NANOS) events fixture (the round-≤7
    * fixture era) under a fresh temp dir — Spark cannot write one, so it
    * is built with parquet-mr directly. Returns the fixture dir.
    */
  private def writeNanosEventsFixture(): String = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val schema = Types.buildMessage()
      .required(INT64).named("event_id")
      .required(INT64).as(LogicalTypeAnnotation.timestampType(false,
        LogicalTypeAnnotation.TimeUnit.NANOS)).named("ts")
      .required(INT64).named("user_id")
      .required(BINARY).as(LogicalTypeAnnotation.stringType())
        .named("event_type")
      .required(DOUBLE).named("value")
      .named("events")
    val tmp = java.nio.file.Files.createTempDirectory("graft-nanos-ann")
      .toString
    val w = ExampleParquetWriter
      .builder(new Path(s"$tmp/events.parquet/part-00000.parquet"))
      .withType(schema).build()
    val microsOfNoon = 1704110400000000L // 2024-01-01 12:00:00 UTC
    val gf = new SimpleGroupFactory(schema)
    try (0 until 3).foreach { i =>
      val g = gf.newGroup()
      g.append("event_id", i.toLong)
      g.append("ts", microsOfNoon * 1000L + i * 1000000000L)
      g.append("user_id", i.toLong)
      g.append("event_type", "purchase")
      g.append("value", 1.5)
      w.write(g)
    } finally w.close()
    tmp
  }

  test("events: NANOS-annotated files read through an isolated child " +
    "session; the caller's session stays pristine") {
    // The unconf'd read throws at schema resolution; Tables.events must
    // fall back to its memoized nanosAsLong child session, shim ts to
    // TIMESTAMP_NTZ, and leave the caller's conf untouched.
    import org.apache.spark.sql.functions._
    val tmp = writeNanosEventsFixture()
    val df = graft.io.Tables.events(spark, tmp)
    assert(df.schema("ts").dataType == TimestampNTZType,
      s"NANOS branch did not produce TIMESTAMP_NTZ: ${df.schema("ts")}")
    val got = df.orderBy("event_id")
      .select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")).collect()
      .map(_.getString(0)).toSeq
    assert(got == Seq("2024-01-01 12:00:00", "2024-01-01 12:00:01",
      "2024-01-01 12:00:02"), s"NANOS-era arithmetic drifted: $got")
    assert(spark.conf
      .get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true",
      "Tables.events leaked nanosAsLong into the caller's session")
    // the child-session frame must compose with PARENT-session frames:
    // a parent-driven join + collect re-consults the scan's conf at
    // action time — it must see the child's conf, not the parent's
    val users = spark.range(3).select(col("id").as("user_id"),
      lit("u").as("tag"))
    val joined = users.join(df, "user_id")
    assert(joined.count() == 3,
      "cross-session composition of the NANOS-era frame broke")
  }

  test("SQL-path queries work on a NANOS-era events fixture (the view " +
    "registers on the frame's owning child session)") {
    // Regression for the ADVICE r11 medium: q_grouping_sets did
    // createOrReplaceTempView on Tables.events and then ran spark.sql on
    // the PARENT session — on a NANOS-annotated fixture the view lands
    // in the memoized child session's catalog and the parent-side SQL
    // failed with TABLE_OR_VIEW_NOT_FOUND. The query now issues its SQL
    // on the frame's owning session (ev.sparkSession.sql), which this
    // case pins end-to-end against a real NANOS file.
    val tmp = writeNanosEventsFixture()
    val out = graft.SparkEntry.queries("q_grouping_sets")(spark, tmp)
      .collect()
    // 3 purchase rows, users 0..2: one event_type set row, three
    // user-band rows, one grand total
    assert(out.length == 5,
      s"q_grouping_sets on the NANOS fixture returned ${out.length} rows")
    val total = out.filter(r =>
      r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(total.length == 1 && total(0).getDouble(3) == 4.5,
      s"grand-total grouping set wrong: ${total.toSeq}")
  }

  test("documents: doc_id/text/source/lang as expected") {
    val df = graft.io.Tables.documents(spark, dir)
    assertCols("documents", df.schema,
      ("doc_id", numeric, "numeric key"),
      ("text", stringy, "string body"),
      ("source", stringy, "string"),
      ("lang", stringy, "string"))
  }

  test("embeddings: vec_id numeric, embedding array<float>") {
    val df = graft.io.Tables.embeddings(spark, dir)
    assertCols("embeddings", df.schema,
      ("vec_id", numeric, "numeric key"),
      ("embedding", floatArray, "array<float> (or array<double>)"))
  }

  test("TPC-H spine: key columns present with expected kinds") {
    val li = graft.io.Tables.lineitem(spark, dir)
    assertCols("lineitem", li.schema,
      ("l_orderkey", numeric, "numeric key"),
      ("l_partkey", numeric, "numeric key"),
      ("l_quantity", numeric, "numeric"),
      ("l_extendedprice", numeric, "numeric"),
      ("l_discount", numeric, "numeric"),
      ("l_returnflag", stringy, "string flag"),
      ("l_shipdate", d => temporal(d) || d == StringType,
        "date-like (DATE or string)"))
    val o = graft.io.Tables.orders(spark, dir)
    assertCols("orders", o.schema,
      ("o_orderkey", numeric, "numeric key"),
      ("o_custkey", numeric, "numeric key"),
      ("o_totalprice", numeric, "numeric"),
      ("o_orderdate", d => temporal(d) || d == StringType,
        "date-like (DATE or string)"))
    val c = graft.io.Tables.customer(spark, dir)
    assertCols("customer", c.schema,
      ("c_custkey", numeric, "numeric key"),
      ("c_nationkey", numeric, "numeric key"),
      ("c_name", stringy, "string name"),
      ("c_acctbal", numeric, "numeric"))
  }

  test("TPC-H dims: every remaining Tables accessor pinned") {
    val s = graft.io.Tables.supplier(spark, dir)
    assertCols("supplier", s.schema,
      ("s_suppkey", numeric, "numeric key"),
      ("s_nationkey", numeric, "numeric key"),
      ("s_name", stringy, "string name"))
    val p = graft.io.Tables.part(spark, dir)
    assertCols("part", p.schema,
      ("p_partkey", numeric, "numeric key"),
      ("p_name", stringy, "string name"))
    val n = graft.io.Tables.nation(spark, dir)
    assertCols("nation", n.schema,
      ("n_nationkey", numeric, "numeric key"),
      ("n_regionkey", numeric, "numeric key"),
      ("n_name", stringy, "string name"))
    val r = graft.io.Tables.region(spark, dir)
    assertCols("region", r.schema,
      ("r_regionkey", numeric, "numeric key"),
      ("r_name", stringy, "string name"))
  }
}
