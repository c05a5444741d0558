package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.io.Tables
import graft.plans.GraftExtensions

/** Library entry point: a session with graft's extensions installed and the
  * testdata tables registered as views, so the whole engine is usable
  * SQL-first:
  * {{{
  *   val spark = Engine.session()
  *   Engine.registerTables(spark, "/root/testdata/sf0.01")
  *   spark.sql("SELECT graft_dot(a.embedding_d, b.embedding_d) ...")
  * }}}
  */
object Engine {

  /** Session tuned per the 100 TB posture (AQE on, shuffle partitions =
    * cores for local mode, UTC) with [[GraftExtensions]] installed.
    */
  def session(master: String =
                s"local[${Runtime.getRuntime.availableProcessors()}]",
              shufflePartitions: Option[Int] = None): SparkSession = {
    val parts = shufflePartitions.getOrElse(
      Runtime.getRuntime.availableProcessors())
    val s = SessionTuning(SparkSession.builder()
      .master(master)
      .appName("graft")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.adaptive.enabled", "true"))
      // runtime bloom-filter join pruning: at fact-dim scale a bloom built
      // from the filtered dim side prunes fact rows BEFORE the shuffle —
      // semantics-preserving, so correctness gates are unaffected
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftExtensions.ensureRegistered(s) // getOrCreate may reuse a session
    s
  }

  /** SQL scalar UDFs (Spark 4 `CREATE FUNCTION … RETURN expr`) mirroring
    * the engine-portable hash helpers, so SQL-first users get the same
    * stable sampling/splitting rules as the Column API
    * ([[graft.ext.Sampling.hashBucket]] / [[graft.ext.Dedup.tokenHash]]).
    * SQL UDF bodies inline into the plan at analysis time — same codegen
    * as the Column form, no black-box function boundary.
    */
  def registerSqlFunctions(spark: SparkSession): Unit = {
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_token_hash(t STRING)
        |RETURNS BIGINT
        |RETURN CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT)
        |""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION
        |  graft_bucket(id BIGINT, salt STRING)
        |RETURNS BIGINT
        |RETURN pmod(graft_token_hash(concat(salt, ':', CAST(id AS STRING))),
        |            100)
        |""".stripMargin)
  }

  /** Register every testdata table as a temp view (events via its
    * nanos-safe reader). `embedding_d` is pre-cast for SQL vector work.
    */
  def registerTables(spark: SparkSession, dir: String): Unit = {
    val tables: Seq[(String, DataFrame)] = Seq(
      "region" -> Tables.region(spark, dir),
      "nation" -> Tables.nation(spark, dir),
      "customer" -> Tables.customer(spark, dir),
      "supplier" -> Tables.supplier(spark, dir),
      "part" -> Tables.part(spark, dir),
      "orders" -> Tables.orders(spark, dir),
      "lineitem" -> Tables.lineitem(spark, dir),
      "events" -> Tables.events(spark, dir),
      "documents" -> Tables.documents(spark, dir),
      "embeddings" -> Tables.embeddings(spark, dir)
        .withColumn("embedding_d",
          org.apache.spark.sql.functions.col("embedding").cast("array<double>")))
    tables.foreach { case (name, df) => df.createOrReplaceTempView(name) }
  }
}
