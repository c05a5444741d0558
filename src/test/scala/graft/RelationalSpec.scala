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
