package graft

import org.apache.spark.sql.functions._

import graft.ext.{NbClassifier, Sampling, TextAnalysis => TA}

/** NB quality-model persistence ([[graft.ext.NbClassifier.save]]/`load`):
  * the artifact must reproduce the live model BIT-identically — margins
  * are the serving contract, and doubles round-trip parquet exactly, so
  * any divergence is a bug, not float noise.
  */
class NbModelSpec extends SparkSpec {
  import spark.implicits._

  private def fixtureModel(): NbClassifier.NbModel = {
    val docs = graft.io.Tables.documents(spark, TestSpark.sf0001)
    val labeled = TA.withTokenStats(docs, "text")
      .withColumn("label_weak",
        round(TA.qualityScore(col("n_tokens"), col("token_chars"),
          col("n_punct"), col("n_stopwords")) + lit(1e-9), 4) >= 0.5)
      .select(col("doc_id"), col("text"), col("label_weak"))
    NbClassifier.train(
      labeled.filter(Sampling.hashBucket(col("doc_id"), "graft") < 80),
      "text", "doc_id", "label_weak")
  }

  test("persisted model == live model: weights, scalars, and served " +
    "margins all bit-identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nb").toString
    val live = fixtureModel()
    NbClassifier.save(spark, live, dir)
    val loaded = NbClassifier.load(spark, dir)
    assert(loaded.weights == live.weights, "weight map drifted")
    assert(loaded.floorW == live.floorW && loaded.prior == live.prior,
      "smoothing scalars drifted")
    // the contract that matters: served margins bit-equal on real docs
    val docs = graft.io.Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text"))
    val a = NbClassifier.scoreLocal(docs, "text", live)
      .select("doc_id", "n_tokens", "margin", "pred")
    val b = NbClassifier.scoreLocal(docs, "text", loaded)
      .select("doc_id", "n_tokens", "margin", "pred")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      "margins under the loaded model diverged from the live model")
  }

  test("facade round-trip + load validates the artifact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nb2").toString
    val live = fixtureModel()
    graft.api.Graft.qualityModelSave(spark, live, dir)
    val loaded = graft.api.Graft.qualityModelLoad(spark, dir)
    assert(loaded == live, "facade round-trip changed the model")
    // a weights/meta mismatch (partial write, mixed artifacts) must fail
    // loudly, not serve a silently coarser model
    Seq(("only", 1.0)).toDF("t", "w")
      .write.mode("overwrite").parquet(s"$dir/weights")
    val e = intercept[IllegalArgumentException] {
      NbClassifier.load(spark, dir)
    }
    assert(e.getMessage.contains("incomplete"),
      s"wrong failure mode: ${e.getMessage}")
  }

  test("load rejects unknown format versions and unversioned artifacts " +
    "with the version message, not a cast error") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nb3").toString
    val live = fixtureModel()
    NbClassifier.save(spark, live, dir)
    // future-version artifact: same columns, version bumped
    spark.read.parquet(s"$dir/meta")
      .withColumn("format_version", lit(NbClassifier.FormatVersion + 1))
      .write.mode("overwrite").parquet(s"$dir/meta2")
    val fs = java.nio.file.Paths.get(dir)
    org.apache.commons.io.FileUtils.deleteDirectory(
      fs.resolve("meta").toFile)
    java.nio.file.Files.move(fs.resolve("meta2"), fs.resolve("meta"))
    val e1 = intercept[IllegalArgumentException] {
      NbClassifier.load(spark, dir)
    }
    assert(e1.getMessage.contains("format_version="),
      s"wrong failure mode: ${e1.getMessage}")
    // pre-versioning artifact: meta row without the column at all
    Seq((live.floorW, live.prior, live.weights.size.toLong))
      .toDF("floor_w", "prior", "n_weights")
      .write.mode("overwrite").parquet(s"$dir/meta")
    val e2 = intercept[IllegalArgumentException] {
      NbClassifier.load(spark, dir)
    }
    assert(e2.getMessage.contains("no format_version"),
      s"wrong failure mode: ${e2.getMessage}")
  }

  test("load reads weight columns by name: a column-reordered rewrite of " +
    "the artifact loads identically") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nb4").toString
    val live = fixtureModel()
    NbClassifier.save(spark, live, dir)
    // rewrite weights with (w, t) column order — same data, swapped layout
    val swapped = spark.read.parquet(s"$dir/weights").select("w", "t")
    swapped.write.mode("overwrite").parquet(s"$dir/weights2")
    val fs = java.nio.file.Paths.get(dir)
    org.apache.commons.io.FileUtils.deleteDirectory(
      fs.resolve("weights").toFile)
    java.nio.file.Files.move(fs.resolve("weights2"), fs.resolve("weights"))
    assert(NbClassifier.load(spark, dir) == live,
      "column order changed the loaded model")
  }
}
