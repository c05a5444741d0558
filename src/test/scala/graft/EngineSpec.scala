package graft

/** SQL-first usage through [[Engine]]: views + the graft_dot extension
  * resolve inside plain spark.sql.
  */
class EngineSpec extends SparkSpec {

  test("graft_dot resolves in SQL through the session extension") {
    // the shared test session lacks the extension; build one with it
    val s = Engine.session(master = "local[2]", shufflePartitions = Some(2))
    try {
      Engine.registerTables(s, TestSpark.sf0001)
      val row = s.sql(
        """SELECT a.vec_id, b.vec_id,
          |  graft_dot(a.embedding_d, b.embedding_d) AS dot
          |FROM embeddings a JOIN embeddings b
          |  ON a.vec_id = 0 AND b.vec_id = 1""".stripMargin).head()
      assert(!row.isNullAt(2) && math.abs(row.getDouble(2)) < 1.5)
      // relational SQL over the registered views
      val n = s.sql(
        """SELECT count(*) FROM events e JOIN customer c
          |  ON e.user_id = c.c_custkey""".stripMargin).head().getLong(0)
      assert(n > 0)
      // fused cosine == dot of pre-normalized vectors (same pair)
      val cosRow = s.sql(
        """SELECT graft_cosine(a.embedding_d, b.embedding_d) AS c
          |FROM embeddings a JOIN embeddings b
          |  ON a.vec_id = 0 AND b.vec_id = 1""".stripMargin).head()
      import org.apache.spark.sql.functions.col
      val viaUnit = graft.ext.Similarity.bruteForceTopK(
        s.table("embeddings").filter(col("vec_id") === 0),
        s.table("embeddings").filter(col("vec_id") === 1),
        "vec_id", "embedding", k = 1).head().getAs[Double]("cosine")
      assert(math.abs(cosRow.getDouble(0) - viaUnit) < 1e-5)
    } finally {
      // shared TestSpark.spark must remain the active default session for
      // the other suites
      org.apache.spark.sql.SparkSession.setDefaultSession(TestSpark.spark)
      org.apache.spark.sql.SparkSession.setActiveSession(TestSpark.spark)
    }
  }

  test("SQL UDF graft_bucket matches the Column-API hash bucket") {
    val s = Engine.session(master = "local[2]", shufflePartitions = Some(2))
    try {
      Engine.registerSqlFunctions(s)
      import s.implicits._
      val ids = (1L to 50L).toDF("id")
      ids.createOrReplaceTempView("ids_sqludf")
      val viaSql = s.sql(
        "SELECT id, graft_bucket(id, 'graft') AS b FROM ids_sqludf")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaCol = ids.select($"id",
        graft.ext.Sampling.hashBucket($"id", "graft").as("b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaSql == viaCol)
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(TestSpark.spark)
      org.apache.spark.sql.SparkSession.setActiveSession(TestSpark.spark)
    }
  }


  test("Observation attaches zero-cost metrics to a query in flight") {
    import org.apache.spark.sql.Observation
    import org.apache.spark.sql.functions._
    // row counts and control totals ride the SAME job as the query —
    // no second pass over the data, the audit pattern for 100 TB loads
    // where a separate count() would double the scan
    val obs = Observation("daily_audit")
    val daily = graft.queries.Parity.daily(spark, TestSpark.sf0001)
      .observe(obs, count(lit(1)).as("n_rows"),
        sum(col("daily_value")).as("control_total"),
        sum(col("daily_value").isNull.cast("long")).as("null_values"))
    val collected = daily.collect()
    val m = obs.get
    assert(m("n_rows") == collected.length.toLong)
    val expected = collected.map(_.getAs[Double]("daily_value")).sum
    assert(math.abs(m("control_total").asInstanceOf[Double] - expected)
      < 1e-6)
    assert(m("null_values") == 0L)
  }
}
