package graft

import org.apache.spark.sql.functions._

import graft.feat.Windows

class WindowsSpec extends SparkSpec {
  import spark.implicits._

  private def series(n: Int, id: String = "a") =
    (1 to n).map(i => (id, f"2024-01-$i%02d", i.toDouble))
      .toDF("id", "date", "v")

  test("W1: lag_k is null for the first k rows per partition") {
    val df = Windows.addLags(series(5), "id", "date", "v", lags = Seq(1, 3))
      .orderBy("date")
    val l1 = df.select("lag_1_day").collect().map(r =>
      if (r.isNullAt(0)) null else r.getDouble(0))
    assert(l1.toSeq == Seq(null, 1.0, 2.0, 3.0, 4.0))
    val l3 = df.select("lag_3_day").collect().map(r =>
      if (r.isNullAt(0)) null else r.getDouble(0))
    assert(l3.toSeq == Seq(null, null, null, 1.0, 2.0))
  }

  test("W2-W4: rolling frame EXCLUDES the current row (leakage guard)") {
    val df = Windows.addRolling(series(10), "id", "date", "v").orderBy("date")
    val r = df.select("rolling_avg_7d", "rolling_sum_7d", "rolling_max_7d")
      .collect()
    assert(r(0).isNullAt(0)) // empty frame on first row
    assert(r(1).getDouble(0) == 1.0) // only the previous row
    assert(r(9).getDouble(2) == 9.0) // max of rows 3..9, never 10 (current)
    assert(r(9).getDouble(1) == (3 to 9).sum.toDouble)
  }

  test("W1/W2: per-partition isolation — no bleed across ids") {
    val two = series(3, "a").union(series(3, "b"))
    val df = Windows.addLags(two, "id", "date", "v", lags = Seq(1))
    assert(df.filter($"lag_1_day".isNull).count() == 2) // one per id
  }

  test("P10: the three weekend definitions disagree exactly as documented") {
    // Fri 2024-01-05, Sat 06, Sun 07
    val df = Seq(("2024-01-05", "Fri", 6), ("2024-01-06", "Sat", 7),
      ("2024-01-07", "Sun", 1)).toDF("date", "weekday", "dow")
    val r = df.select(
      Windows.Weekend.byName($"weekday").as("byName"),
      Windows.Weekend.byDayOfWeek($"dow").as("byDow"),
      Windows.Weekend.byGte6($"dow").as("friSat")).collect()
    assert(r.map(_.getInt(0)).toSeq == Seq(0, 1, 1)) // Sat+Sun
    assert(r.map(_.getInt(1)).toSeq == Seq(0, 1, 1)) // Sat+Sun
    assert(r.map(_.getInt(2)).toSeq == Seq(1, 1, 0)) // Fri+Sat (the ref's bug)
  }

  test("F5: cyclical encodings use the truncated π") {
    val df = Seq((6, 15)).toDF("month", "day")
    val r = Windows.addCyclical(df).head
    assert(math.abs(r.getAs[Double]("month_sin") -
      math.sin(2 * 3.14159 * 6 / 12)) < 1e-12)
    // with true π sin(π)=1.2e-16; truncated π gives a visibly different value
    assert(math.abs(r.getAs[Double]("month_sin")) > 1e-7)
  }

  test("P11: one-hot from collected distinct labels, sorted column order") {
    val df = Seq("b", "a", "b", null).map(Tuple1(_)).toDF("lbl")
    val out = Windows.addOneHot(df, "lbl", "is")
    assert(out.columns.toSeq.containsSlice(Seq("is_a", "is_b")))
    assert(out.agg(sum("is_b")).head.getLong(0) == 2L)
  }

  test("W5-at-scale: addGroupStats matches the unbounded-window result") {
    val df = series(6, "a").union(series(4, "b"))
    val viaAgg = Windows.addGroupStats(df, "id", "v")
      .select("id", "date", "group_mean", "group_std")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("id")
    val viaWindow = df.select($"id", $"date",
      avg($"v").over(w).as("m"), stddev($"v").over(w).as("s"))
    val j = viaAgg.join(viaWindow, Seq("id", "date"))
      .filter(abs($"group_mean" - $"m") > 1e-12 ||
        abs($"group_std" - $"s") > 1e-12)
    assert(j.count() == 0)
  }
}
