package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Persisted ANN index: build once from a corpus, serve queries many
  * times without re-learning anything — the deployment lifecycle the
  * live [[Similarity.ivfPqResSearch]] operator folds into one plan.
  *
  * At 100 TB the index build (one Lloyd pass for cells, m residual
  * sub-Lloyds, one codegen'd encode pass over the corpus) is a batch job
  * measured in node-hours; queries arrive continuously and must not pay
  * it. The artifacts are plain parquet — readable by any Spark session,
  * partition-prunable, and small relative to the corpus (codes are
  * 2 bytes per vector at m=4/kSub=16; unit vectors dominate and exist
  * for the exact stage-C re-rank only):
  *
  * {{{
  * dir/centroids  (bkt INT, cvec ARRAY<DOUBLE>)   |cells| rows
  * dir/codes      (bkt INT, uid, code ARRAY<INT>) one row per vector
  * dir/vectors    (uid, uvec ARRAY<DOUBLE>)       one row per vector
  * dir/books      (j INT, cj INT, center ARRAY<DOUBLE>)  m·kSub rows
  * dir/params     (dim, m, kSub, n_centers, n_base, format_version) 1 row
  * dir/uidbloom   (format_version, expected_items, fpp, bloom BINARY) 1 row
  * dir/addstate   (n_added BIGINT) 1 row, written/advanced by add()
  * }}}
  *
  * `format_version` (the [[NbClassifier]]/[[Bpe]] artifact convention) is
  * 1; params/uidbloom rows missing the column are pre-versioning
  * artifacts and load with fallback behavior (no bloom → full-scan dup
  * guard; no n_base → no staleness guard). `uidbloom` is a Bloom filter
  * over the LONG uids of every vector ever written (over-approximation by
  * construction — it is written BEFORE the row appends, so a failed add
  * leaves stale positives that the exact confirm clears, never false
  * negatives). It exists so [[add]]'s duplicate-id guard is DELTA-sized:
  * without it every nightly add pays a full index scan. Sketch size is
  * O(n) bits (~1.2 MB per million uids at fpp 0.01) — within the codebook
  * driver-side allowance for any index whose codes fit a cluster; shard
  * the index itself before the bloom is the bottleneck.
  *
  * [[search]] reloads the codebooks to the driver (m·kSub·dsub = k·dim
  * doubles — the codebook allowance every ANN operator shares) and runs
  * the EXACT serve plan of the live operator
  * ([[Similarity.ivfPqResServe]]), so a persisted-then-served query
  * returns the same rows the live search would — the equivalence the
  * spec asserts.
  */
object AnnIndex {

  /** Artifact format version stamped into `params` and `uidbloom`
    * (missing column = version 0, the pre-r14 layout, accepted). */
  val FormatVersion = 1

  private val BloomFpp = 0.01

  /** Learn and persist the index. The corpus must carry a coarse cell
    * column (from [[Similarity.kmeansBuckets]] or any bucketing).
    * Fails on an empty/all-null corpus — there is no codebook to learn.
    */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
            bucketCol: String, dir: String, dim: Int,
            m: Int = 4, kSub: Int = 16, iters: Int = 1,
            trainFraction: Double = 1.0): Unit = {
    val parts = Similarity.ivfPqResIndexParts(corpus, idCol, vecCol,
      bucketCol, dim, m, kSub, iters, trainFraction)
    require(parts.nonEmpty,
      "AnnIndex.build: corpus has no non-null vectors — nothing to index")
    val (cents, coded, unit, books) = parts.get
    val spark = corpus.sparkSession
    import spark.implicits._
    cents.write.mode("overwrite").parquet(s"$dir/centroids")
    coded.write.mode("overwrite").parquet(s"$dir/codes")
    unit.write.mode("overwrite").parquet(s"$dir/vectors")
    books.zipWithIndex.flatMap { case (cs, j) =>
      cs.zipWithIndex.map { case (c, cj) => (j, cj, c.toSeq) }
    }.toSeq.toDF("j", "cj", "center")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/books")
    // footer-stats count over the just-written codes (cheap) = the base
    // size the add() staleness guard measures growth against
    val nBase = spark.read.parquet(s"$dir/codes").count()
    Seq((dim, m, kSub, books(0).length, nBase, FormatVersion))
      .toDF("dim", "m", "kSub", "n_centers", "n_base", "format_version")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/params")
    // uid bloom — only for integral uid columns (the bloom probe hashes
    // longs); other key types fall back to add()'s full-scan dup guard
    if (isIntegral(coded.schema("uid").dataType))
      writeBloom(spark, dir,
        buildBloom(coded, math.max(2L * nBase, 1024L), BloomFpp),
        math.max(2L * nBase, 1024L), BloomFpp)
  }

  private def isIntegral(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  private[graft] def buildBloom(withUid: DataFrame, expectedItems: Long,
                         fpp: Double): org.apache.spark.util.sketch.BloomFilter =
    withUid.select(col("uid").cast("long").as("uid"))
      .stat.bloomFilter("uid", expectedItems, fpp)

  private[graft] def writeBloom(spark: SparkSession, dir: String,
                         bf: org.apache.spark.util.sketch.BloomFilter,
                         expectedItems: Long, fpp: Double): Unit = {
    import spark.implicits._
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    Seq((FormatVersion, expectedItems, fpp, out.toByteArray))
      .toDF("format_version", "expected_items", "fpp", "bloom")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/uidbloom")
  }

  private[graft] def readBloom(spark: SparkSession, dir: String)
      : Option[(org.apache.spark.util.sketch.BloomFilter, Long, Double)] = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/uidbloom")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) None
    else {
      val row = spark.read.parquet(s"$dir/uidbloom").head()
      requireVersion(row, "uidbloom") // same guard as params — a future
      // serialization bump must fail with the rebuild instruction, not
      // deserialize blindly into a wrong membership filter
      val bytes = row.getAs[Array[Byte]]("bloom")
      Some((org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bytes)),
        row.getAs[Long]("expected_items"), row.getAs[Double]("fpp")))
    }
  }

  private def requireVersion(row: org.apache.spark.sql.Row,
                             what: String): Unit =
    if (row.schema.fieldNames.contains("format_version")) {
      val v = row.getAs[Int]("format_version")
      require(v == FormatVersion,
        s"AnnIndex: $what format_version $v is not the supported " +
          s"$FormatVersion — rebuild the index with this library version")
    } // absent = pre-versioning artifact, accepted with fallback behavior

  /** INCREMENTAL index maintenance — the faiss `add()` contract: encode
    * `newVectors` under the index's FROZEN geometry (no retraining, no
    * touch of existing rows) and append them to `codes`/`vectors`, so
    * the next [[search]] retrieves old and new rows through one probe.
    *
    * Assignment rule: each new vector goes to the nearest STORED
    * centroid — the probe geometry queries use — then its residual
    * encodes under the frozen per-subspace codebooks with the exact
    * [[Similarity.assignOn]] kernel the build used (guard-rounded
    * distances, lowest-index ties), so added codes are bit-compatible
    * with built codes. For a corpus bucketed by [[Similarity.kmeansBuckets]]
    * the build-time bucketing used the Lloyd centers instead (the index
    * does not persist those); cell means are the next Lloyd iterate, so
    * the two geometries converge with `iters` — and probe-side
    * consistency is what recall actually depends on.
    *
    * Guards, all loud:
    *  - wrong-dimension vectors fail (cannot encode under the geometry);
    *  - uids already present in `codes` fail (a duplicate would fan out
    *    the exact re-rank join). The membership probe is DELTA-sized
    *    when the index carries a uid bloom: only bloom HITS pay an exact
    *    confirm against `codes` (false positives are cleared there) —
    *    a fresh-uid nightly add never scans the index. Pre-bloom
    *    indexes fall back to the full semi-join.
    *  - STALENESS: recall under frozen geometry decays as the vector
    *    distribution drifts from the frozen cells/books (measured curve
    *    in SCALING.md — recall@5 vs added fraction). `maxAddedFraction`
    *    bounds cumulative adds relative to the build size (`n_base`):
    *    exceeding it fails with a rebuild instruction. The counter rides
    *    `dir/addstate`.
    *
    * Failure/retry semantics (writes ordered bloom → vectors → codes →
    * addstate, each a single parquet job): the bloom over-approximates
    * (written first — a failed add leaves stale positives, cleared by
    * the exact confirm; never false negatives), an orphaned `vectors`
    * row (vectors committed, codes failed) is INERT for search
    * (candidates come from codes) and is SKIPPED on retry rather than
    * duplicated, so a rerun of a failed add CONVERGES to exactly-once.
    * A rerun after a fully-applied add correctly fails the duplicate
    * guard; if only the addstate bookkeeping write was lost, the
    * staleness counter undercounts by that one delta (guard slack, not
    * corruption).
    */
  def add(spark: SparkSession, dir: String, newVectors: DataFrame,
          idCol: String, vecCol: String,
          maxAddedFraction: Double = 2.0): Unit = {
    val params = spark.read.parquet(s"$dir/params").head()
    requireVersion(params, "params")
    val dim = params.getAs[Int]("dim")
    val m = params.getAs[Int]("m")
    val centFrame = spark.read.parquet(s"$dir/centroids")
    // centroids collected in BKT ORDER: the assignment kernel breaks
    // distance ties on array position, so a partition-order collect
    // would make tie resolution nondeterministic across runs
    val centPairs = centFrame.select(col("bkt"), col("cvec"))
      .orderBy(col("bkt")).collect()
      .map(r => r.getAs[Int]("bkt") -> r.getSeq[Double](1).toArray)
    require(centPairs.nonEmpty,
      s"AnnIndex.add: $dir has no centroids — not a built index")
    val bookRows = spark.read.parquet(s"$dir/books").collect()
    val books: Array[Array[Array[Double]]] = Array.tabulate(m) { j =>
      bookRows.filter(_.getAs[Int]("j") == j)
        .sortBy(_.getAs[Int]("cj")).map(_.getSeq[Double](2).toArray)
    }
    val vd = col(vecCol).cast("array<double>")
    val newV = newVectors.filter(vd.isNotNull)
      .select(col(idCol).as("uid"), vd.as("v"))
      .transform(CacheScope.cache) // guards + two appends read it
    require(newV.filter(size(col("v")) =!= dim).isEmpty,
      s"AnnIndex.add: input carries vectors whose dimension != $dim " +
        "(the index geometry) — they cannot be encoded")
    val deltaN = newV.count()
    // staleness guard: cumulative adds vs the build size (see SCALING.md
    // recall-vs-added-fraction curve for where the default comes from)
    val nBase =
      if (params.schema.fieldNames.contains("n_base"))
        Some(params.getAs[Long]("n_base"))
      else None
    val addPath = new org.apache.hadoop.fs.Path(s"$dir/addstate")
    val fs = addPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val nAdded =
      if (fs.exists(addPath))
        spark.read.parquet(s"$dir/addstate").head().getAs[Long]("n_added")
      else 0L
    nBase.foreach { nb =>
      require(nAdded + deltaN <= maxAddedFraction * nb,
        s"AnnIndex.add: cumulative adds (${nAdded + deltaN}) would exceed " +
          s"$maxAddedFraction of the build size ($nb) — recall under the " +
          "frozen geometry decays with added fraction (SCALING.md curve); " +
          "REBUILD the index over the grown corpus, or raise " +
          "maxAddedFraction if the measured recall decay is acceptable")
    }
    // duplicate-id / orphan guards, delta-sized via the uid bloom: only
    // uids the bloom claims to have seen pay the exact confirm scans
    val bloom = readBloom(spark, dir)
    val uidIntegral = isIntegral(newV.schema("uid").dataType)
    // a bloom-carrying index tracks LONG uids; appending rows the bloom
    // cannot represent would break its "contains every written uid"
    // invariant and let a LATER integral add of the same id skip the
    // duplicate guard silently — refuse instead
    require(bloom.isEmpty || uidIntegral,
      s"AnnIndex.add: this index carries a uid bloom over integral ids, " +
        s"but the input's $idCol is ${newV.schema("uid").dataType} — " +
        "cast the ids to long (or rebuild the index from the non-" +
        "integral-keyed corpus, which builds bloomless)")
    val cands = (bloom, uidIntegral) match {
      case (Some((bf, _, _)), true) =>
        val out = new java.io.ByteArrayOutputStream()
        bf.writeTo(out)
        newV.filter(ColumnBridge.column(BloomFilterMightContain(
          Literal(out.toByteArray, BinaryType),
          ColumnBridge.expression(col("uid").cast("long")))))
          .select(col("uid"))
      case _ => newV.select(col("uid")) // pre-bloom / non-integral: full scan
    }
    val candsEmpty = cands.isEmpty
    if (!candsEmpty) {
      require(spark.read.parquet(s"$dir/codes").select(col("uid"))
          .join(cands, Seq("uid"), "left_semi").isEmpty,
        "AnnIndex.add: input ids already exist in the index — a duplicate " +
          "uid would fan out the exact re-rank join; re-id or rebuild")
    }
    // orphaned vectors rows (a prior add wrote vectors, then failed
    // before codes): skip them on the vectors append — same bytes would
    // be rewritten (unitVec is deterministic), so skipping converges the
    // retry to exactly-once instead of fanning out the re-rank join
    val orphanFree =
      if (candsEmpty) newV
      else newV.join(spark.read.parquet(s"$dir/vectors").select(col("uid"))
        .join(cands, Seq("uid"), "left_semi"), Seq("uid"), "left_anti")
    // write order: bloom first (over-approximation is safe; a missing uid
    // would be a false NEGATIVE on retry), vectors before codes (orphan
    // vectors are inert; orphan codes would vanish from the re-rank)
    if (uidIntegral) bloom match {
      case Some((bf, expected, fpp)) =>
        val projected = nBase.getOrElse(0L) + nAdded + deltaN
        if (projected > expected) {
          // SATURATION: past the sketch's sizing point the fpp degrades
          // and every future add pays more exact-confirm scans — rebuild
          // the bloom over all written uids (vectors ⊇ codes incl.
          // orphans) at doubled capacity. One uid-column scan, rare by
          // construction (amortized doubling), vs. a quietly degrading
          // guard forever.
          val newExpected = math.max(2L * projected, 2L * expected)
          writeBloom(spark, dir,
            buildBloom(spark.read.parquet(s"$dir/vectors")
              .select(col("uid")).unionByName(newV.select(col("uid"))),
              newExpected, fpp),
            newExpected, fpp)
        } else {
          bf.mergeInPlace(buildBloom(newV, expected, fpp))
          writeBloom(spark, dir, bf, expected, fpp)
        }
      case None => () // pre-bloom index: stay bloomless (build writes it)
    }
    orphanFree.select(col("uid"), Similarity.unitVec(col("v")).as("uvec"))
      .write.mode("append").parquet(s"$dir/vectors")
    encodeFrozen(newV, centPairs, centFrame, books, dim / m)
      .write.mode("append").parquet(s"$dir/codes")
    import spark.implicits._
    Seq(nAdded + deltaN).toDF("n_added")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/addstate")
  }

  /** The frozen-geometry encode kernel [[add]] and the oracled
    * `q_ann_index_add` twin share: nearest stored centroid (codebook-
    * sized driver array, position ties = lowest bkt — `centPairs` must
    * be bkt-ordered), residual against that cell's mean, per-subspace
    * code via the exact build-time [[Similarity.assignOn]] kernel.
    * `newV` carries `(uid, v)`; returns `(bkt, uid, code)`.
    */
  private[graft] def encodeFrozen(newV: DataFrame,
                                  centPairs: Array[(Int, Array[Double])],
                                  centFrame: DataFrame,
                                  books: Array[Array[Array[Double]]],
                                  dsub: Int): DataFrame = {
    val bktIds = centPairs.map(_._1)
    val assigned = newV
      .withColumn("__pos",
        Similarity.assignOn(col("v"), centPairs.map(_._2)))
      .withColumn("bkt", element_at(lit(bktIds), col("__pos") + 1))
      .join(broadcast(centFrame), "bkt")
      .withColumn("rv", zip_with(col("v"), col("cvec"), (x, c) => x - c))
    val codeArr = array(books.indices.map { j =>
      Similarity.assignOn(slice(col("rv"), j * dsub + 1, dsub), books(j))
    }: _*)
    assigned.select(col("bkt"), col("uid"), codeArr.as("code"))
  }

  /** Operational stats of a persisted index, WITHOUT scanning it — one
    * row `(dim, m, kSub, n_centers, n_base, n_added, added_fraction,
    * format_version)` from the params + addstate artifacts only. The
    * observability face of the [[add]] staleness guard: alert when
    * `added_fraction` approaches the `maxAddedFraction` you deploy with,
    * and schedule the rebuild before the guard starts refusing adds.
    * Pre-versioning artifacts report nulls for the absent fields.
    */
  def stats(spark: SparkSession, dir: String): DataFrame = {
    val params = spark.read.parquet(s"$dir/params")
    val has = params.schema.fieldNames.toSet
    val addPath = new org.apache.hadoop.fs.Path(s"$dir/addstate")
    val fs = addPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val nAdded =
      if (fs.exists(addPath))
        spark.read.parquet(s"$dir/addstate").head().getAs[Long]("n_added")
      else 0L
    val nullL = lit(null).cast("long")
    params.select(col("dim"), col("m"), col("kSub"), col("n_centers"),
      (if (has("n_base")) col("n_base") else nullL).as("n_base"),
      lit(nAdded).as("n_added"),
      (if (has("n_base"))
        round(lit(nAdded) / col("n_base"), 4)
      else lit(null).cast("double")).as("added_fraction"),
      (if (has("format_version")) col("format_version")
      else lit(0)).as("format_version"))
  }

  /** Serve queries from a persisted index — no learning, no corpus scan
    * beyond the index artifacts. Same output contract as every ANN
    * operator: `(query_id, neighbor_id, cosine, rank)`, exact cosines.
    */
  def search(spark: SparkSession, dir: String, queries: DataFrame,
             idCol: String, vecCol: String, k: Int, nProbe: Int = 2,
             overfetch: Int = 3,
             maxBucket: Int = Int.MaxValue): DataFrame = {
    val params = spark.read.parquet(s"$dir/params").head()
    requireVersion(params, "params")
    val m = params.getAs[Int]("m")
    val kSub = params.getAs[Int]("kSub")
    val bookRows = spark.read.parquet(s"$dir/books")
      .orderBy(col("j"), col("cj")).collect()
    val flatBooks: Array[Array[Double]] = Array.tabulate(m) { j =>
      bookRows.filter(_.getAs[Int]("j") == j)
        .flatMap(_.getSeq[Double](2)).toArray
    }
    Similarity.ivfPqResServe(
      spark.read.parquet(s"$dir/centroids"),
      spark.read.parquet(s"$dir/codes"),
      spark.read.parquet(s"$dir/vectors"),
      queries, idCol, vecCol, flatBooks, kSub, k, nProbe, overfetch,
      maxBucket)
  }
}
