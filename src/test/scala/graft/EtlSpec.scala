package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.etl.{Aggregate, Clean}

/** Operator unit tests for §2.2/§2.4/§2.3 rows (SURVEY.md §5.1): tiny
  * in-memory frames, exact expected rows.
  */
class EtlSpec extends SparkSpec {
  import spark.implicits._

  test("P2/P3: 'Null' sentinel → null, cast to float") {
    val df = Seq("1.5", "Null", "2.0").toDF("energy")
    val got = df.select(
      Clean.sentinelCast(col("energy"), FloatType).as("v"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getFloat(0))
    assert(got.toSeq == Seq(1.5f, null, 2.0f))
  }

  test("P4: dropNullKeys drops only rows null in the subset") {
    val df = Seq((Some(1), Some("a")), (None, Some("b")), (Some(3), None))
      .toDF("k", "v")
    assert(Clean.dropNullKeys(df, Seq("k")).count() == 2)
    assert(Clean.dropNullKeys(df, Seq("k", "v")).count() == 1)
  }

  test("P14: fillDefaults — numeric→0, string→Unknown") {
    val df = Seq((Some(1.0), Some("x")), (None, None))
      .toDF("n", "s")
    val r = Clean.fillDefaults(df).orderBy("n").collect()
    assert(r(0).getDouble(0) == 0.0 && r(0).getString(1) == "Unknown")
  }

  test("F1-F4: time features (weekday name, 1=Sun dayofweek)") {
    val df = Seq("2024-01-06 10:30:00", "2024-01-07 23:59:59")
      .toDF("raw").select(to_timestamp(col("raw")).as("ts"))
    val r = Clean.withTimeFeatures(df, "ts").orderBy("date")
      .select("date", "hour", "weekday", "day_of_week").collect()
    assert(r(0).get(0).toString == "2024-01-06")
    assert(r(0).getInt(1) == 10)
    assert(r(0).getString(2) == "Sat" && r(0).getInt(3) == 7)
    assert(r(1).getString(2) == "Sun" && r(1).getInt(3) == 1)
  }

  test("A1/A2: hourly and daily rollups sum consistently") {
    val df = Seq(
      (1L, "2024-01-01 00:10:00", 1.0), (1L, "2024-01-01 00:40:00", 2.0),
      (1L, "2024-01-01 01:10:00", 4.0), (2L, "2024-01-01 05:00:00", 8.0))
      .toDF("user_id", "raw", "value")
      .select(col("user_id"), to_timestamp(col("raw")).as("ts"), col("value"))
    val t = Clean.withTimeFeatures(df, "ts")
    val hourly = Aggregate.hourly(t, "user_id", "value")
    val daily = Aggregate.daily(t, "user_id", "value")
    assert(hourly.count() == 3)
    assert(hourly.agg(sum("hourly_value")).head.getDouble(0) == 15.0)
    val d1 = daily.filter($"user_id" === 1L).head
    assert(d1.getAs[Double]("daily_value") == 7.0)
    assert(d1.getAs[Long]("num_readings") == 3L)
    // invariant (SURVEY §5.3): hourly-sum == daily-sum per household
    val hSums = hourly.groupBy("user_id")
      .agg(sum("hourly_value").as("s")).orderBy("user_id").collect()
    val dSums = daily.orderBy("user_id").select("daily_value").collect()
    assert(hSums.map(_.getDouble(1)).toSeq == dSums.map(_.getDouble(0)).toSeq)
  }

  test("S10/S11: head-sample csv and gzip csv sinks") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    val df = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    graft.io.Writers.sampleCsv(df, s"$dir/head", n = 10, orderCol = Some("id"))
    val head = spark.read.option("header", "true").csv(s"$dir/head")
    assert(head.count() == 10)
    graft.io.Writers.csv(df, s"$dir/gz", gzip = true)
    assert(new java.io.File(s"$dir/gz").listFiles()
      .exists(_.getName.endsWith(".csv.gz")))
    assert(spark.read.option("header", "true").csv(s"$dir/gz").count() == 100)
  }

  test("S12 contract: jsonLines document export round-trips, gzips") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    val df = (1 to 50).map(i => (i.toLong, s"v$i", i * 1.5))
      .toDF("id", "v", "x")
    graft.io.Writers.jsonLines(df, s"$dir/docs")
    val back = spark.read.json(s"$dir/docs")
    assert(back.count() == 50)
    assert(back.filter(col("id") === 7).head.getAs[String]("v") == "v7")
    // each line is one self-contained JSON document (the mongoimport
    // contract) — check every raw line independently of the Spark reader
    // (readAllLines: no handle leak, and empty part files are fine)
    import scala.jdk.CollectionConverters._
    val lines = new java.io.File(s"$dir/docs").listFiles()
      .filter(_.getName.startsWith("part-"))
      .flatMap(f => java.nio.file.Files.readAllLines(f.toPath).asScala)
    assert(lines.length == 50)
    assert(lines.forall(l => l.startsWith("{") && l.endsWith("}")))
    graft.io.Writers.jsonLines(df, s"$dir/gz", gzip = true)
    assert(new java.io.File(s"$dir/gz").listFiles()
      .exists(_.getName.endsWith(".json.gz")))
    assert(spark.read.json(s"$dir/gz").count() == 50)
  }

  test("A3 at scale: approx_count_distinct within 5% of exact") {
    val ev = graft.io.Tables.events(spark, TestSpark.sf0001)
    val exact = graft.analytics.Queries.kpis(ev, "value", "user_id")
      .head.getAs[Long]("n_users")
    val approx = graft.analytics.Queries.kpis(ev, "value", "user_id",
      exact = false).head.getAs[Long]("n_users")
    assert(math.abs(approx - exact).toDouble / exact < 0.05)
  }

  test("salting: salted join and salted agg match their unsalted twins") {
    import graft.etl.Salting
    // skewed: 90% of rows on key 1
    val large = (1 to 1000).map(i =>
      (if (i <= 900) 1L else (i % 7).toLong, i.toDouble)).toDF("k", "v")
    val small = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d"))
      .toDF("k", "label")
    val plain = large.join(small, Seq("k")).groupBy("k", "label")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
    val salted = Salting.saltedJoin(large, small, Seq("k"), saltBuckets = 8)
      .groupBy("k", "label").agg(sum("v").as("s"), count(lit(1)).as("n"))
    assert(salted.exceptAll(plain).count() == 0 &&
      plain.exceptAll(salted).count() == 0)
    val aggPlain = large.groupBy("k").agg(sum("v").as("sum_v"),
      count(lit(1)).as("n"))
    val aggSalted = Salting.saltedSumCount(large, Seq("k"), "v", 8)
    assert(aggSalted.exceptAll(aggPlain).count() == 0 &&
      aggPlain.exceptAll(aggSalted).count() == 0)
  }

  test("J1: dim join is a broadcast hash join and preserves fact rows") {
    val fact = (1 to 100).map(i => (i.toLong, i % 3)).toDF("id", "k")
    val dim = Seq((0, "a"), (1, "b")).toDF("k", "label")
    val joined = Aggregate.dimJoin(fact, dim, fact("k") === dim("k"))
    assert(joined.count() == 100) // left join: unmatched k=2 kept
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }
}
