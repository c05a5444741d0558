package graft

/** Contract tests for the driver interface: every query runs at sf0.001,
  * every oracle key has a query, entry() returns rows (t1 analogue).
  */
class QueriesSpec extends SparkSpec {

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("entry returns rows (t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs at sf0.001 with a nonempty schema") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val df = fn(spark, TestSpark.sf0001)
          if (df.schema.isEmpty) Some(s"$name: empty schema") else { df.count(); None }
        } catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
