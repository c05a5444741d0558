package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Similarity, TextAnalysis}
import graft.feat.Windows

/** Degenerate-input battery: nulls, zeros, empties, singletons — the
  * library must degrade to nulls/empty results, never throw (ANSI mode
  * makes this easy to get wrong: x/0 and 0/0 raise by default).
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  test("null and empty text through the text/dedup operators") {
    val docs = Seq((1L, null: String, "en"), (2L, "", "en"),
      (3L, "one two three four", "en")).toDF("doc_id", "text", "lang")
    // none of these may throw
    assert(TextAnalysis.withTokenStats(docs, "text").count() == 3)
    assert(docs.select(TextAnalysis.fingerprint(col("text"))).count() == 3)
    assert(TextAnalysis.withLanguageId(docs, "text").count() == 3)
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      Seq("lang"), threshold = 0.0)
    assert(pairs.count() == 0) // null/empty produce no shingles, no pairs
    assert(Dedup.exactGroups(docs, "text", "doc_id").count() == 3)
    assert(Dedup.minHashLsh(docs, "text", "doc_id").count() == 0)
    assert(Dedup.simHashNearDups(docs, "text", "doc_id", Seq("lang"))
      .count() >= 0)
    // multimodal path: null text must become an empty payload, not an NPE
    val decoded = graft.ext.Multimodal.decodeBatches(spark,
      graft.ext.Multimodal.asMedia(docs.withColumn("source", lit("s")),
        "doc_id", "text", "source"))
    assert(decoded.count() == 3)
    assert(decoded.filter(col("byte_len") === 0).count() == 2)
  }

  test("zero vector degrades to null cosine, never divides by zero") {
    val vecs = Seq(
      (0L, Array(0.0f, 0.0f), 0),
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f), 0)).toDF("vec_id", "embedding", "label")
    val nn = Similarity.bucketedNN(vecs, "vec_id", "embedding", "label", k = 2)
    // query rows exist; pairs involving the zero vector carry null cosine
    assert(nn.count() > 0)
    val withZero = nn.filter(col("query_id") === 0L || col("neighbor_id") === 0L)
    assert(withZero.filter(col("cosine").isNotNull).count() == 0)
  }

  test("empty input through agg + windows yields empty, not error") {
    val empty = Seq.empty[(Long, java.sql.Timestamp, Double)]
      .toDF("user_id", "ts", "value")
    val t = graft.etl.Clean.withTimeFeatures(empty, "ts")
    val daily = graft.etl.Aggregate.daily(t, "user_id", "value")
    assert(daily.count() == 0)
    assert(Windows.addRolling(
      Windows.addLags(daily, "user_id", "date", "daily_value"),
      "user_id", "date", "daily_value").count() == 0)
  }

  test("single-row group: group stats give null stddev, guarded z-score") {
    val one = Seq(("u1", "2024-01-01", 5.0)).toDF("id", "date", "v")
    val g = Windows.addGroupStats(one, "id", "v")
    val r = g.head()
    assert(r.getAs[Double]("group_mean") == 5.0)
    assert(r.isNullAt(r.fieldIndex("group_std"))) // stddev_samp of 1 row
    val z = g.withColumn("z", (col("v") - col("group_mean")) /
      when(col("group_std") > 0, col("group_std")).otherwise(lit(1)))
    assert(z.head().getAs[Double]("z") == 0.0)
  }

  test("one-hot fails fast on a high-cardinality label column") {
    val wide = spark.range(5000).selectExpr("cast(id as string) AS lbl")
    intercept[IllegalArgumentException] {
      Windows.addOneHot(wide, "lbl", "oh", maxLabels = 100)
    }
    // bounded domain still works and is deterministic
    val small = Seq("b", "a", "b").toDF("lbl")
    val oh = Windows.addOneHot(small, "lbl", "oh", maxLabels = 100)
    assert(oh.columns.toSeq == Seq("lbl", "oh_a", "oh_b"))
  }

  test("as-of with empty right side keeps all left rows, null payload") {
    val left = Seq((1L, "k", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("id", "key", "t")
    val right = Seq.empty[(String, java.sql.Timestamp, Double)]
      .toDF("key", "rt", "payload")
    val got = graft.ext.AsOfJoin.leftAsOf(left, right, Seq("key"), "t", "rt",
      Map("payload" -> "p"))
    assert(got.count() == 1 && got.head().isNullAt(3))
  }
}
