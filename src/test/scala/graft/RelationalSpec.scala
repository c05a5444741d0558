package graft

import org.apache.spark.sql.functions._

import graft.ext.RuntimeFilter
import graft.io.Tables
import graft.SparkEntry

/** Round-4 relational/graph operators: semantics invariants plus the scale
  * mechanisms (bloom pruning loses nothing, the Q18 shape broadcasts, the
  * linkage join is an equi-join not a cross product).
  */
class RelationalSpec extends SparkSpec {

  private val dir = TestSpark.sf0001

  test("bloom prune keeps every true match and the composed join is exact") {
    val fact = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_extendedprice"))
    val dim = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val pruned = RuntimeFilter.bloomPrune(
      fact, dim, "l_orderkey", "o_orderkey", expectedItems = dim.count())
    // no false negatives: every fact row whose key IS in dim survives
    val trueMatches = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(pruned.join(dim, col("l_orderkey") === col("o_orderkey")).count()
      == trueMatches)
    // pruning actually prunes (urgent ≈ 1/5 of orders; fpp 1% ⇒ far fewer
    // than all rows pass)
    assert(pruned.count() < fact.count())
    // the composed inner join is bit-equal to the plain inner join
    val composed = RuntimeFilter.bloomInnerJoin(
        fact, dim, "l_orderkey", "o_orderkey", expectedItems = dim.count())
      .select(col("l_orderkey"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_extendedprice"))
    val plain = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_extendedprice"))
    assert(composed.collect().sameElements(plain.collect()))
  }

  test("late suppliers: status filter pushed to the orders scan, top-k sorts") {
    val df = SparkEntry.queries("q_late_suppliers")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(o_orderstatus,F)"),
      s"status filter not pushed:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"top-k sorts:\n$plan")
    // the lineitem scans read only the three needed columns
    assert(plan.contains(
      "ReadSchema: struct<l_orderkey:bigint,l_suppkey:bigint,l_shipdate:timestamp_ntz>"),
      s"lineitem scan not pruned:\n$plan")
  }

  test("bloom join plan: pruning filter sits scan-side, dim broadcasts") {
    val df = SparkEntry.queries("q_bloom_join")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"dim should broadcast:\n$plan")
    // the probe side reads only the three agg columns
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint," +
      "l_extendedprice:double,l_discount:double>"),
      s"fact scan not pruned:\n$plan")
    // the bloom probe is Catalyst's native might_contain expression, fully
    // codegen'd — a boxed ScalaUDF here would box every fact row in the
    // scan's hot path
    assert(plan.contains("might_contain"), s"native bloom probe:\n$plan")
    assert(!plan.contains("UDF"), s"no ScalaUDF in the probe path:\n$plan")
  }

  test("assoc rules: a synthetic hub order is cut by the basket guard — " +
    "no quadratic pair inflation") {
    import spark.implicits._
    // hub order 999 carries 60 parts (> MaxBasket = 50) and would alone emit
    // 60·59 = 3540 directed pair rows; five small orders each carry parts
    // {100, 101, 102} so their pairs clear the n_ab >= 3 support floor
    val hub = (1L to 60L).map(p => (999L, p))
    val small = (1L to 5L).flatMap(o => Seq(100L, 101L, 102L).map(p => (o, p)))
    val tmp = java.nio.file.Files.createTempDirectory("graft-hub").toString
    (hub ++ small).toDF("l_orderkey", "l_partkey")
      .write.parquet(s"$tmp/lineitem.parquet")
    val rules = SparkEntry.queries("q_assoc_rules")(spark, tmp).collect()
    // only the 6 directed pairs among {100, 101, 102} survive; every
    // hub-order part must be absent from both rule sides
    assert(rules.length == 6, s"expected 6 rules, got ${rules.length}")
    assert(rules.forall(r => r.getLong(0) >= 100L && r.getLong(1) >= 100L),
      "hub-order parts leaked into the rules")
    // and with the hub excluded from the universe, n_orders = 5 ⇒ every
    // pair has confidence 1 and lift 1 (each part in every small order)
    assert(rules.forall(_.getLong(2) == 5L))
  }

  test("big spenders: aggregate-first plan broadcasts both small sides") {
    val df = SparkEntry.queries("q_big_spenders")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"top-k sorts:\n$plan")
    // the lineitem scan feeds only the two agg columns
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"lineitem scan not pruned:\n$plan")
  }

  test("event transitions: per-source probabilities sum to 1") {
    val df = SparkEntry.queries("q_event_transitions")(spark, dir)
    val sums = df.groupBy(col("event_type"))
      .agg(sum(col("p")).as("psum")).collect()
    assert(sums.nonEmpty)
    sums.foreach(r =>
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-4, r.toString))
  }

  test("record linkage: blocked equi-join, near-identical names only") {
    val df = SparkEntry.queries("q_record_linkage")(spark, dir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getInt(2) <= 1)
    }
    // the candidate generator must be a hash/sort-merge EQUI join on the
    // blocking key — a cross/nested-loop product would be corpus-quadratic
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"linkage join degenerated to a cross product:\n$plan")
  }

  test("decile stats partition all users into 10 balanced tiles") {
    val df = SparkEntry.queries("q_decile_stats")(spark, dir)
    val rows = df.collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 10))
    val counts = rows.map(_.getLong(1))
    assert(counts.max - counts.min <= 1) // ntile balance guarantee
    val users = Tables.events(spark, dir).select("user_id").distinct().count()
    assert(counts.sum == users)
    // min ≤ avg ≤ max within each decile, deciles ordered by value
    rows.foreach { r =>
      assert(r.getDouble(3) <= r.getDouble(2) + 1e-6 &&
        r.getDouble(2) <= r.getDouble(4) + 1e-6)
    }
    val maxes = rows.map(_.getDouble(4))
    assert(maxes.sameElements(maxes.sorted))
  }

  test("entity resolution: entities are closed under the linkage pairs") {
    val ents = SparkEntry.queries("q_entity_resolution")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val pairs = SparkEntry.queries("q_record_linkage")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    // linked customers share an entity; the canonical id is the entity min
    pairs.foreach { case (a, b) => assert(ents(a)._1 == ents(b)._1) }
    val byEntity = ents.groupBy(_._2._1)
    byEntity.foreach { case (eid, members) =>
      assert(eid == members.keys.min)
      members.values.foreach { case (_, n) => assert(n == members.size) }
    }
  }

  test("ewma matches the sequential recurrence per user") {
    val got = SparkEntry.queries("q_ewma")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val daily = graft.queries.Parity.daily(spark, dir)
      .select(col("user_id"), col("date"), col("daily_value"))
      .orderBy(col("user_id"), col("date"))
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    val expected = daily.groupBy(_._1).map { case (u, xs) =>
      u -> xs.map(_._2).reduce((s, x) => 0.3 * x + 0.7 * s)
    }
    expected.foreach { case (u, e) =>
      assert(math.abs(got(u) - e) < 1e-4, s"user $u: ${got(u)} vs $e")
    }
  }

  test("streaks: longest run is consistent with the raw daily calendar") {
    val got = SparkEntry.queries("q_streaks")(spark, dir).collect()
    assert(got.nonEmpty)
    val daily = graft.queries.Parity.daily(spark, dir)
      .select(col("user_id"), col("date"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val byUser = daily.groupBy(_._1).map { case (u, xs) =>
      val ds = xs.map(_._2).sortBy(_.toEpochDay)
      val runs = ds.foldLeft(List.empty[Long]) { (acc, d) =>
        acc match {
          case h :: t if ds.contains(d.minusDays(1)) => (h + 1) :: t
          case _ => 1L :: acc
        }
      }
      u -> (runs.max, runs.size.toLong)
    }
    got.foreach { r =>
      val (longest, nStreaks) = byUser(r.getLong(0))
      assert(r.getLong(1) == longest && r.getLong(2) == nStreaks, r.toString)
    }
  }

  test("cusum peaks where a constructed level shift happens") {
    import spark.implicits._
    // 20 flat days then 20 shifted days → |CUSUM| peaks exactly at the
    // boundary (the last pre-shift day has max cumulative deviation)
    val rows = (1 to 40).map(i =>
      (1L, java.sql.Date.valueOf(f"2024-01-01").toLocalDate.plusDays(i - 1)
        .toString, if (i <= 20) 10.0 else 30.0))
    val df = rows.toDF("user_id", "d", "daily_value")
      .withColumn("date", to_date(col("d")))
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
    val running = byUser.orderBy(col("date"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val peak = df
      .withColumn("dev",
        col("daily_value") - avg(col("daily_value")).over(byUser))
      .withColumn("score",
        graft.queries.Parity.ground(abs(sum(col("dev")).over(running)), 6))
      .orderBy(col("score").desc, col("date"))
      .limit(1).collect().head
    assert(peak.getAs[java.sql.Date]("date").toString == "2024-01-20")
  }

  test("association rules: confidence and lift identities hold") {
    val rows = SparkEntry.queries("q_assoc_rules")(spark, dir).collect()
    assert(rows.nonEmpty)
    val op = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val nOrders = op.select("l_orderkey").distinct().count()
    val itemN = op.groupBy("l_partkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (ant, cons, nAb) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val conf = r.getDouble(3); val lift = r.getDouble(4)
      assert(nAb >= 3)
      assert(math.abs(conf - nAb.toDouble / itemN(ant)) < 1e-5)
      assert(math.abs(lift -
        nAb.toDouble * nOrders / (itemN(ant) * itemN(cons))) < 1e-4)
      // lift symmetry: the mirrored rule has the same lift
      val mirror = rows.find(m => m.getLong(0) == cons && m.getLong(1) == ant)
      mirror.foreach(m => assert(math.abs(m.getDouble(4) - lift) < 1e-5))
    }
  }

  test("stickiness is avg-dau over mau and bounded by (0, 1]") {
    val rows = SparkEntry.queries("q_stickiness")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val avgDau = r.getDouble(2); val mau = r.getLong(3)
      val st = r.getDouble(4)
      assert(st > 0 && st <= 1.0 + 1e-9, r.toString)
      assert(math.abs(st - avgDau / mau) < 1e-5)
      assert(avgDau <= mau + 1e-9)
    }
  }

  test("rolling actives: the calendar is the broadcast side of the range join") {
    val df = SparkEntry.queries("q_rolling_actives")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"range join should be broadcast nested-loop:\n$plan")
    // the broadcast build side must be the tiny day calendar, not the
    // (user, day) activity frame
    assert(plan.contains("BroadcastNestedLoopJoin BuildRight"),
      s"calendar should be the build side:\n$plan")
  }

  test("rolling 7-day actives match a brute-force recount") {
    val got = SparkEntry.queries("q_rolling_actives")(spark, dir)
      .collect().map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    val ud = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val days = ud.map(_._2).distinct
    days.foreach { day =>
      val expected = ud.filter { case (_, d) =>
        !d.isAfter(day) && d.isAfter(day.minusDays(7))
      }.map(_._1).distinct.size
      assert(got(day) == expected, s"day $day")
    }
  }

  test("conversion lag: count matches converters, median <= p90") {
    val r = SparkEntry.queries("q_conversion_lag")(spark, dir)
      .collect().head
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_type"))
      .collect().map(x => (x.getLong(0),
        x.getAs[java.time.LocalDateTime](1), x.getString(2)))
    implicit val ldtOrd: Ordering[java.time.LocalDateTime] =
      Ordering.fromLessThan(_ isBefore _)
    val converters = ev.filter(_._3 == "signup").groupBy(_._1)
      .map { case (u, xs) => u -> xs.map(_._2).min }
      .count { case (u, st) =>
        ev.exists(e => e._1 == u && e._3 == "purchase" && !e._2.isBefore(st)) }
    assert(r.getLong(0) == converters)
    assert(r.getDouble(1) <= r.getDouble(2) + 1e-9)
    assert(r.getDouble(1) > 0)
  }

  test("late suppliers: aggregate rewrite equals the EXISTS brute force") {
    val got = SparkEntry.queries("q_late_suppliers")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val lo = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
          .as("late"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byOrder = lo.groupBy(_._1)
    val waits = lo.filter(_._3).filter { case (ok, sk, _) =>
      val order = byOrder(ok)
      order.exists(_._2 != sk) && !order.exists(o => o._2 != sk && o._3)
    }.groupBy(_._2).map { case (sk, xs) => (sk, xs.size.toLong) }
    val expected = waits.toSeq.sortBy { case (sk, n) => (-n, sk) }.take(20)
    assert(got.toSeq == expected)
    assert(got.nonEmpty)
  }

  test("rolling median: first row equals its value, stays within the frame") {
    val med = SparkEntry.queries("q_rolling_median")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate,
        r.getDouble(2)))
    val daily = graft.queries.Parity.daily(spark, dir)
      .select(col("user_id"), col("date"), col("daily_value"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate,
        r.getDouble(2)))
      .groupBy(_._1).map { case (u, xs) =>
        u -> xs.map(x => x._2 -> x._3).sortBy(_._1.toEpochDay) }
    med.groupBy(_._1).foreach { case (u, rows) =>
      val series = daily(u)
      val first = rows.minBy(_._2.toEpochDay)
      assert(math.abs(first._3 - series.head._2) < 1e-5)
      rows.foreach { case (_, d, m) =>
        val idx = series.indexWhere(_._1 == d)
        val frame = series.slice(math.max(0, idx - 6), idx + 1).map(_._2)
        assert(m >= frame.min - 1e-6 && m <= frame.max + 1e-6)
      }
    }
  }

  test("pagerank: ranks bounded below by teleport, hubs above uniform") {
    val rows = SparkEntry.queries("q_pagerank3")(spark, dir).collect()
    assert(rows.length == 20)
    val n = Tables.lineitem(spark, dir)
      .select("l_partkey").distinct().count()
    val floor = 0.15 / n * 1e4
    rows.foreach(r => assert(r.getDouble(1) >= floor - 1e-6, r.toString))
    // the top-ranked node must beat the uniform rank (it has in-edges)
    assert(rows.head.getDouble(1) > 1e4 / n)
  }

  test("skyline sweep equals the NOT-EXISTS dominance brute force") {
    val got = SparkEntry.queries("q_skyline")(spark, dir)
      .select(col("o_orderpriority"), col("o_orderkey"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val all = Tables.orders(spark, dir)
      .select(col("o_orderpriority"), col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")), col("o_totalprice"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // kept iff nothing in the same priority dominates it: strictly later
    // date with >= price, same date with > price, or an identical
    // (date, price) point with a smaller key (tie dedup)
    val expected = all.filter { case (pr, k, d, p) =>
      !all.exists { case (pr2, k2, d2, p2) =>
        pr2 == pr && ((d2 > d && p2 >= p) || (d2 == d && p2 > p) ||
          (d2 == d && p2 == p && k2 < k))
      }
    }.map(t => (t._1, t._2)).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("co-purchase degree matches a brute-force count on tiny data") {
    import spark.implicits._
    val df = SparkEntry.queries("q_copurchase_degree")(spark, dir)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1)))
    // brute force over the same incidence (basket guard included)
    val inc = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .as[(Long, Long)].collect().toSeq
    val byOrder = inc.groupBy(_._1).filter(_._2.size <= 50)
    val partners = byOrder.values.toSeq.flatMap { items =>
      val parts = items.map(_._2)
      for (a <- parts; b <- parts if a != b) yield (a, b)
    }.distinct.groupBy(_._1).map { case (p, xs) => (p, xs.size.toLong) }
    val expected = partners.toSeq
      .sortBy { case (p, d) => (-d, p) }.take(20)
    assert(got.toSeq == expected)
  }
}
