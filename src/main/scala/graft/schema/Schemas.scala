package graft.schema

import org.apache.spark.sql.types._

/** Explicit schemas for every table the engine touches.
  *
  * The reference infers CSV schemas with a full extra scan
  * (`data_ingestion.py:59,90` — `inferSchema=True` over 167M rows); at 100 TB
  * that is a second pass over the entire input, so we declare schemas up front
  * (SURVEY.md §1.5, §4). Parquet carries its own schema; these StructTypes are
  * used for CSV ingestion, for `readStream` (which requires an explicit
  * schema), and as documentation of the engine's data model.
  */
object Schemas {

  // --- Reference-shaped tables (SURVEY.md §1.2, FIXTURES.md §A) ---

  /** Half-hourly smart-meter readings as ingested.
    * Mirrors `data_ingestion.py:59` + column names at
    * `data_preprocessing.py:111,119,122`. The energy column arrives as a
    * string with literal `"Null"` sentinels (note the trailing space in the
    * raw name, preserved here on purpose).
    */
  val rawEnergy: StructType = StructType(Seq(
    StructField("LCLid", StringType),
    StructField("stdorToU", StringType),
    StructField("DateTime", TimestampType),
    StructField("KWH/hh (per half hour) ", StringType)
  ))

  /** Tariff dim table (17,520 half-hours of one year).
    * The reference side-loads it from Excel (`data_preprocessing.py:57-64`);
    * we ship it as CSV/Parquet with this schema (SURVEY.md §7.4.6).
    */
  val tariffs: StructType = StructType(Seq(
    StructField("TariffDateTime", TimestampType),
    StructField("Tariff", StringType)
  ))

  // --- Driver testdata tables (TESTDATA.md / FIXTURES.md §B) ---

  val events: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  val lineitem: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)
  ))

  val orders: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)
  ))

  val customer: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)
  ))

  val supplier: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)
  ))

  val part: StructType = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)
  ))

  val nation: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)
  ))

  val region: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)
  ))

  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)
  ))

  val embeddings: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)
  ))
}
