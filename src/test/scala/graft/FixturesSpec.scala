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
