package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *    Cross join of queries × corpus; fine when |queries| is small or as the
  *    per-bucket kernel.
  *  - [[bucketedNN]]: IVF-style — restrict candidates to the same coarse
  *    bucket (here the `label` column plays the centroid-assignment role;
  *    with real data, assign buckets via a KMeans coarse quantizer). The
  *    join is equi-key on the bucket → shuffle-partitioned blocks instead of
  *    a full cross product; at 100 TB this is the only viable shape.
  *
  * All per-row vector math (dot, normalize, SQ8 encode/score, centroid
  * argmin, hyperplane signature) runs as native codegen'd Catalyst
  * expressions (`graft.functions.*` — no UDF serialization, no interpreted
  * higher-order functions in any scan or pair hot path); arrays are cast
  * to double so every fold matches the DuckDB oracle bit-for-bit modulo
  * the 6dp guard-rounding contract.
  */
object Similarity {

  /** dot(a, b) over double arrays — a native codegen'd Catalyst expression
    * ([[graft.functions.DotProduct]]); sequential left-to-right sum, same
    * order as the HOF fold it replaces (oracle parity preserved).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.graft_dot(a, b)

  def cosine(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>"); val bd = b.cast("array<double>")
    dot(ad, bd) / (sqrt(dot(ad, ad)) * sqrt(dot(bd, bd)))
  }

  /** Normalize to a unit vector ONCE before the pair join — cosine then
    * degenerates to a plain dot product, so the O(pairs) inner loop does
    * one fused multiply-add pass instead of three (dot + two norms). At
    * 2.5M candidate pairs × 64 dims that is the difference between the scan
    * dominating and the join dominating.
    */
  def unitVec(vec: Column): Column =
    // codegen'd one-pass norm+divide ([[graft.functions.UnitVec]]): the
    // Column spelling (`transform(v, x => try_divide(x, sqrt(dot(v, v))))`)
    // re-evaluated the norm per ELEMENT inside an interpreted higher-order
    // function — O(d²) per row, and at 100× corpus scale normalization
    // outweighed pair scoring. Same null contract (zero-norm / null-element
    // vectors normalize to all-null arrays and never rank).
    graft.functions.VectorFunctions.graft_unit(vec.cast("array<double>"))

  /** Deterministic per-bucket candidate cap — the ANN analogue of the
    * dedup family's hot-bucket guards ([[Dedup.minHashLsh]]'s
    * `maxBandBucket`, the hot-shingle DF cut): a coarse cell whose
    * population grows with the corpus turns the bucket equi-join quadratic
    * in exactly that cell. Rows beyond `cap` in a bucket are dropped from
    * the CANDIDATE side only (queries keep their ranking), selected by
    * md5-of-id order — a uniform, RNG-free, engine-portable sample of the
    * hot cell (same portable-hash discipline as [[graft.ext.Sampling]]),
    * not an id-biased prefix. The `row_number <= cap` filter rewrites to
    * WindowGroupLimit, so the guard itself is a bounded map-side top-cap
    * per partition, never a full per-bucket sort at scale.
    *
    * `cap == Int.MaxValue` (the default) bypasses the window entirely —
    * existing callers keep their exact plan.
    */
  private def capPerBucket(frame: DataFrame, bktCol: String, uidCol: String,
                           cap: Int): DataFrame =
    if (cap == Int.MaxValue) frame
    else {
      val w = Window.partitionBy(col(bktCol))
        .orderBy(md5(col(uidCol).cast("string")), col(uidCol))
      frame.withColumn("__bkt_rn", row_number().over(w))
        .filter(col("__bkt_rn") <= cap).drop("__bkt_rn")
    }

  private def topKByCosine(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"),
        col("rank").cast("long").as("rank"))
  }

  /** Exact top-k neighbors for each query vector (excluding self).
    * Deterministic rank: cosine rounded to 6dp desc, then candidate id.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      unitVec(col(vecCol)).as("q_vec"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      unitVec(col(vecCol)).as("c_vec"))
    // broadcast the (small, pre-limited) query side: an unhinted cross
    // join plans a CartesianProduct, which re-evaluates the CORPUS scan +
    // normalization once per left partition — measured 45 s at a 200k
    // corpus vs ~2 s with the probe side broadcast under one corpus pass
    val scored = broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        round(dot(col("q_vec"), col("c_vec")) + lit(1e-9), 6))
    topKByCosine(scored, k)
  }

  /** IVF-style nearest neighbor within a coarse bucket column.
    * `maxBucket` bounds per-cell candidate fan-in (see [[capPerBucket]]).
    */
  def bucketedNN(df: DataFrame, idCol: String, vecCol: String,
                 bucketCol: String, k: Int,
                 maxBucket: Int = Int.MaxValue): DataFrame = {
    val unit = df.select(col(bucketCol).as("bkt"), col(idCol).as("uid"),
      unitVec(col(vecCol)).as("uvec"))
    val a = unit.select(col("bkt"), col("uid").as("query_id"),
      col("uvec").as("q_vec"))
    val b = capPerBucket(unit, "bkt", "uid", maxBucket)
      .select(col("bkt"), col("uid").as("neighbor_id"),
        col("uvec").as("c_vec"))
    val scored = a.join(b, "bkt")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        round(dot(col("q_vec"), col("c_vec")) + lit(1e-9), 6))
    topKByCosine(scored, k)
  }

  /** Embedding near-dup pairs: same coarse bucket, cosine ≥ threshold,
    * id < id. The threshold variant of [[bucketedNN]] — candidate
    * generation identical (bucket equi-join), no per-query ranking.
    */
  def neighborPairs(df: DataFrame, idCol: String, vecCol: String,
                    bucketCol: String, threshold: Double,
                    maxBucket: Int = Int.MaxValue): DataFrame = {
    // pair mining is symmetric, so the guard caps bucket MEMBERSHIP (both
    // sides see the same md5-ordered sample) — an asymmetric candidate cap
    // would break the id_a < id_b pair contract
    val unit = capPerBucket(
      df.select(col(bucketCol).as("bkt"), col(idCol).as("uid"),
        unitVec(col(vecCol)).as("uvec")),
      "bkt", "uid", maxBucket)
    unit.select(col("bkt"), col("uid").as("id_a"), col("uvec").as("va"))
      .join(unit.select(col("bkt"), col("uid").as("id_b"), col("uvec").as("vb")),
        "bkt")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", round(dot(col("va"), col("vb")) + lit(1e-9), 6))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Multi-probe IVF nearest neighbor (VERDICT r5 item 6): single-assignment
    * IVF ([[bucketedNN]]) misses neighbors that straddle a bucket boundary —
    * a query lands in one cell and its true nearest neighbor sits in the
    * adjacent one. The standard recall fix: score each query against the
    * COARSE CENTROID CODEBOOK (one centroid per bucket — the element-wise
    * mean), then probe the `nProbe` nearest cells, not just the best one.
    *
    * Scale shape: the codebook is |buckets| rows by construction (a coarse
    * quantizer is coarse — hundreds to low thousands of cells at 100 TB),
    * so probe scoring is a broadcast of the codebook under the query stream;
    * the candidate join stays the same bucket EQUI-join as [[bucketedNN]],
    * just with each query exploded to `nProbe` bucket keys (linear fan-out,
    * no pair explosion). A corpus vector is assigned to exactly one cell, so
    * a (query, neighbor) pair appears at most once — no dedup stage needed.
    *
    * Determinism/oracle parity: centroid cosine is guard-rounded to 6dp
    * before probe ranking (ties → bucket id asc), absorbing FP summation-
    * order drift between engines, same contract as every scored rank here.
    */
  def multiProbeNN(df: DataFrame, idCol: String, vecCol: String,
                   bucketCol: String, k: Int, nProbe: Int,
                   maxBucket: Int = Int.MaxValue): DataFrame = {
    import graft.ext.CacheScope.Cacheable
    // cached frame holds ONLY the unit vectors (query side + corpus side
    // read it); the centroid aggregation scans the source once, uncached —
    // caching the raw doubles alongside would double the vector bytes held
    // in storage memory for a single consumer
    val base = df.select(col(bucketCol).as("bkt"), col(idCol).as("uid"),
      unitVec(col(vecCol)).as("uvec")).scopedCache()
    // per-bucket element-wise mean, distributed: explode to (bucket, dim)
    // cells, aggregate, reassemble in dimension order
    val cents = df
      .select(col(bucketCol).as("bkt"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("i", "x")))
      .groupBy(col("bkt"), col("i")).agg(avg(col("x")).as("c"))
      .groupBy(col("bkt"))
      .agg(transform(
        array_sort(collect_list(struct(col("i"), col("c")))),
        s => s("c")).as("cvec"))
    val centUnit = cents.select(col("bkt").as("cb"),
      unitVec(col("cvec")).as("cunit"))
    val probes = base.select(col("uid").as("query_id"), col("uvec").as("q_vec"))
      .crossJoin(broadcast(centUnit))
      .withColumn("cent_cosine",
        round(dot(col("q_vec"), col("cunit")) + lit(1e-9), 6))
      .withColumn("pr", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("cent_cosine").desc, col("cb"))))
      .filter(col("pr") <= nProbe)
      .select(col("query_id"), col("q_vec"), col("cb").as("bkt"))
    // the cap applies to the corpus candidate side only — every query
    // still probes its nProbe cells and gets a full ranking; the centroid
    // codebook is computed over the FULL corpus (capping the means would
    // shift cell geometry, not just bound join fan-in)
    val scored = probes
      .join(capPerBucket(base, "bkt", "uid", maxBucket)
        .select(col("bkt"), col("uid").as("neighbor_id"),
          col("uvec").as("c_vec")), "bkt")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        round(dot(col("q_vec"), col("c_vec")) + lit(1e-9), 6))
    topKByCosine(scored, k)
  }

  /** Two-stage scalar-quantized retrieval (SQ8): int8 codes score the
    * candidate join, exact float cosine re-ranks the short list — the
    * standard memory-bound ANN shape at corpus scale, where the float
    * vectors are 8× the code bytes and must NOT ride the candidate join.
    *
    * Stage A (index): per-dimension global [min, max] over the corpus
    * (distributed posexplode + agg; `dim` rows collect to the driver and
    * ship as literals). Code: `q_i = round((x_i − mn_i) · 255/(mx_i −
    * mn_i))` clamped to a constant-dimension degenerate 0.
    * Stage B (candidate scoring): the same bucket equi-join as
    * [[bucketedNN]] but carrying CODES, scored by the cosine of the
    * RECONSTRUCTED vectors (`x̂_i = mn_i + q_i · (mx_i − mn_i)/255` — a
    * pure function of the codes, so the DuckDB oracle reproduces it
    * bit-for-bit); per-query top-`k·overfetch` survive.
    * Stage C (re-rank): the survivors join back to the float unit vectors
    * BY ID (short list only), exact cosine orders the final top-k.
    *
    * Output cosines are EXACT (stage C), approximation affects only which
    * `k·overfetch` candidates reach the re-rank — the quantization error
    * per dim is bounded by (mx−mn)/510, so with overfetch ≥ 2 the sq8
    * top-k matches the float top-k except at genuine near-ties.
    */
  def sq8TopK(df: DataFrame, idCol: String, vecCol: String,
              bucketCol: String, k: Int, overfetch: Int = 3,
              maxBucket: Int = Int.MaxValue): DataFrame = {
    import graft.ext.CacheScope.Cacheable
    val vd = col(vecCol).cast("array<double>")
    // Stage A: per-dim stats → driver (dim rows) → literal arrays. A dim
    // whose min/max aggregates to null (all values null there) is treated
    // as zero-span — codes 0, decodes to 0, contributes nothing — keeping
    // the codebook aligned with the code-array dimension.
    val stats = df.select(posexplode(vd).as(Seq("i", "x")))
      .groupBy(col("i")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .collect().map { r =>
        if (r.isNullAt(1) || r.isNullAt(2)) (r.getInt(0), 0.0, 0.0)
        else (r.getInt(0), r.getDouble(1), r.getDouble(2))
      }
      .sortBy(_._1)
    // empty/all-null corpus: no codebook to build — empty result with the
    // output schema, matching the other Similarity operators' behavior
    // (Sq8Cosine would otherwise fail analysis on an empty mn/span)
    if (stats.isEmpty)
      return df.limit(0).select(col(idCol).as("query_id"),
        col(idCol).as("neighbor_id"), lit(0.0).as("cosine"),
        lit(0L).as("rank"))
    val mn = stats.map(_._2)
    val mx = stats.map(_._3)
    val span = mx.zip(mn).map { case (h, l) => h - l }
    // codes: int in [0,255]; zero-span dims code to 0. ONE codegen'd
    // expression (graft_sq8_encode, bit-equal to the nested zip_with
    // stack it replaced) — encode runs over EVERY corpus vector, the
    // same interpreted-HOF-on-the-scan trap unitVec hit at 100×.
    val coded = df.select(col(bucketCol).as("bkt"), col(idCol).as("uid"),
      graft.functions.Sq8Functions.graft_sq8_encode(vd, mn, span)
        .as("code")).scopedCache()
    val unit = df.select(col(idCol).as("uid"), unitVec(col(vecCol)).as("uvec"))
      .scopedCache()
    // Stage B: bucket equi-join on codes, approx score from reconstruction
    val a = coded.select(col("bkt"), col("uid").as("query_id"),
      col("code").as("qc"))
    val b = capPerBucket(coded, "bkt", "uid", maxBucket)
      .select(col("bkt"), col("uid").as("neighbor_id"),
        col("code").as("cc"))
    // fused codegen'd decode+cosine (graft_sq8_cosine): ONE primitive loop
    // decodes both int8 code arrays through the embedded affine codebook
    // and accumulates dot/norms — no interpreted zip_with reconstruction
    // in the per-pair hot path (HOFs evaluate per element with boxed
    // lambdas; this was 7 CPU-s of the query before). Zero-norm decode
    // (all-zero vector in a min=0 corpus) yields null — sorts last, never
    // ranks — instead of an ANSI divide-by-zero killing the query (same
    // contract as unitVec's try_divide).
    val shortlist = a.join(b, "bkt")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("approx",
        round(graft.functions.Sq8Functions.graft_sq8_cosine(
          col("qc"), col("cc"), mn, span) + lit(1e-9), 6))
      .withColumn("ar", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("approx").desc, col("neighbor_id"))))
      .filter(col("ar") <= k * overfetch)
      .select(col("query_id"), col("neighbor_id"))
    // Stage C: exact re-rank of the short list only
    val scored = shortlist
      .join(unit.select(col("uid").as("query_id"), col("uvec").as("q_vec")),
        "query_id")
      .join(unit.select(col("uid").as("neighbor_id"), col("uvec").as("c_vec")),
        "neighbor_id")
      .withColumn("cosine",
        round(dot(col("q_vec"), col("c_vec")) + lit(1e-9), 6))
    topKByCosine(scored, k)
  }

  /** The full production IVF retrieval pipeline in one operator: multi-probe
    * candidate generation (each query probes its `nProbe` nearest coarse
    * cells by centroid cosine) scored by SQ8 int8 codes, then exact float
    * re-rank of the per-query shortlist — the end-to-end shape a 100 TB
    * deployment runs, where [[kmeansBuckets]] supplies the learned
    * `bucketCol`. Composition of the three standalone stages with the
    * float-vector discipline intact end to end:
    *
    *  - the candidate join moves ONLY (bucket, id, int8 codes) — the floats
    *    never ride the probe fan-out (8× fewer bytes through the shuffle,
    *    the reason SQ8 exists);
    *  - the centroid codebook is |buckets| rows (coarse by construction)
    *    and broadcasts under the query stream, same as [[multiProbeNN]];
    *  - per-cell fan-in is bounded by the md5-order [[capPerBucket]] guard;
    *  - a corpus vector lives in exactly one cell, so (query, neighbor)
    *    pairs are unique across probes — no dedup stage.
    *
    * Output cosines are EXACT (stage C re-rank); approximation affects only
    * which `k·overfetch` candidates reach the re-rank. Determinism contract
    * as everywhere in this file: every score guard-rounded to 6dp before
    * ranking, ties to the lower id/bucket.
    */
  def ivfSq8TopK(df: DataFrame, idCol: String, vecCol: String,
                 bucketCol: String, k: Int, nProbe: Int, overfetch: Int = 3,
                 maxBucket: Int = Int.MaxValue): DataFrame = {
    import graft.ext.CacheScope.Cacheable
    val vd = col(vecCol).cast("array<double>")
    // sq8 codebook: per-dim global [min, max] → driver (dim rows) →
    // literals; all-null dims degrade to zero-span (code 0), as in sq8TopK
    val stats = df.select(posexplode(vd).as(Seq("i", "x")))
      .groupBy(col("i")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .collect().map { r =>
        if (r.isNullAt(1) || r.isNullAt(2)) (r.getInt(0), 0.0, 0.0)
        else (r.getInt(0), r.getDouble(1), r.getDouble(2))
      }
      .sortBy(_._1)
    if (stats.isEmpty)
      return df.limit(0).select(col(idCol).as("query_id"),
        col(idCol).as("neighbor_id"), lit(0.0).as("cosine"),
        lit(0L).as("rank"))
    val mn = stats.map(_._2)
    val span = stats.map { case (_, lo, hi) => hi - lo }
    // codes cache feeds the query side AND the capped corpus side; unit
    // vectors cache feeds probe scoring and the stage-C re-rank. Encode is
    // the codegen'd graft_sq8_encode (see sq8TopK) — one primitive loop
    // per corpus vector, no interpreted zip_with on the scan.
    val coded = df.select(col(bucketCol).as("bkt"), col(idCol).as("uid"),
      graft.functions.Sq8Functions.graft_sq8_encode(vd, mn, span)
        .as("code")).scopedCache()
    val unit = df.select(col(idCol).as("uid"), unitVec(col(vecCol)).as("uvec"))
      .scopedCache()
    // coarse centroid codebook: per-bucket element-wise mean over the FULL
    // corpus (capping the means would shift cell geometry — multiProbeNN's
    // contract), reassembled in dimension order
    val cents = df
      .select(col(bucketCol).as("bkt"), posexplode(vd).as(Seq("i", "x")))
      .groupBy(col("bkt"), col("i")).agg(avg(col("x")).as("c"))
      .groupBy(col("bkt"))
      .agg(transform(
        array_sort(collect_list(struct(col("i"), col("c")))),
        s => s("c")).as("cvec"))
    val centUnit = cents.select(col("bkt").as("cb"),
      unitVec(col("cvec")).as("cunit"))
    val probes = unit.select(col("uid").as("query_id"), col("uvec").as("q_vec"))
      .crossJoin(broadcast(centUnit))
      .withColumn("cent_cosine",
        round(dot(col("q_vec"), col("cunit")) + lit(1e-9), 6))
      .withColumn("pr", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("cent_cosine").desc, col("cb"))))
      .filter(col("pr") <= nProbe)
      .select(col("query_id"), col("cb").as("bkt"))
    // stage B: probe fan-out joins CODES only — query codes ride by id,
    // the capped corpus side by bucket; fused sq8 decode+cosine scores
    val qcodes = coded.select(col("uid").as("query_id"), col("code").as("qc"))
    val shortlist = probes
      .join(qcodes, "query_id")
      .join(capPerBucket(coded, "bkt", "uid", maxBucket)
        .select(col("bkt"), col("uid").as("neighbor_id"),
          col("code").as("cc")), "bkt")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("approx",
        round(graft.functions.Sq8Functions.graft_sq8_cosine(
          col("qc"), col("cc"), mn, span) + lit(1e-9), 6))
      .withColumn("ar", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("approx").desc, col("neighbor_id"))))
      .filter(col("ar") <= k * overfetch)
      .select(col("query_id"), col("neighbor_id"))
    // stage C: exact re-rank of the shortlist, floats joined by id only
    val scored = shortlist
      .join(unit.select(col("uid").as("query_id"), col("uvec").as("q_vec")),
        "query_id")
      .join(unit.select(col("uid").as("neighbor_id"), col("uvec").as("c_vec")),
        "neighbor_id")
      .withColumn("cosine",
        round(dot(col("q_vec"), col("c_vec")) + lit(1e-9), 6))
    topKByCosine(scored, k)
  }

  /** [[pqTopK]] with ASYMMETRIC (ADC) scoring — FAISS's default mode: the
    * corpus side of the candidate join stays m-code compressed (the big,
    * per-cell-capped side), but each query scores with its RAW float
    * vector against the candidate's reconstructed sub-centroids
    * ([[graft.functions.PqAdcCosine]], one codegen'd loop with the
    * codebooks embedded). Per-pair error drops to ONE quantization instead
    * of SDC's two — better shortlists at the same corpus memory — in
    * exchange for the query's floats riding the join (queries are the
    * small side of a retrieval workload; the corpus compression is what
    * matters at 100 TB). Stage-C exact re-rank and the determinism
    * contract are unchanged from [[pqTopK]].
    */
  def pqAdcTopK(df: DataFrame, idCol: String, vecCol: String,
                bucketCol: String, k: Int, dim: Int, m: Int = 4,
                kSub: Int = 16, iters: Int = 1, overfetch: Int = 3,
                maxBucket: Int = Int.MaxValue,
                trainFraction: Double = 1.0): DataFrame = {
    import graft.ext.CacheScope.Cacheable
    require(m > 0 && dim % m == 0,
      s"pqAdcTopK requires dim divisible by m, got dim=$dim m=$m")
    val dsub = dim / m
    val vd = col(vecCol).cast("array<double>")
    val books: Array[Array[Array[Double]]] = Array.tabulate(m) { j =>
      lloydCenters(df, idCol, slice(vd, j * dsub + 1, dsub), kSub, iters,
        trainFraction)
    }
    if (books.exists(_.isEmpty))
      return df.limit(0).select(col(idCol).as("query_id"),
        col(idCol).as("neighbor_id"), lit(0.0).as("cosine"),
        lit(0L).as("rank"))
    val codeArr = array((0 until m).map { j =>
      assignOn(slice(vd, j * dsub + 1, dsub), books(j))
    }: _*)
    // corpus side: codes only (capped); query side: raw doubles
    val coded = df.select(col(bucketCol).as("bkt"), col(idCol).as("uid"),
      codeArr.as("code")).scopedCache()
    val unit = df.select(col(idCol).as("uid"), unitVec(col(vecCol)).as("uvec"))
      .scopedCache()
    val flatBooks: Array[Array[Double]] = books.map(_.flatten)
    val a = df.select(col(bucketCol).as("bkt"),
      col(idCol).as("query_id"), vd.as("qv"))
    val b = capPerBucket(coded, "bkt", "uid", maxBucket)
      .select(col("bkt"), col("uid").as("neighbor_id"),
        col("code").as("cc"))
    val shortlist = a.join(b, "bkt")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("approx",
        round(graft.functions.PqFunctions.graft_pq_adc_cosine(
          col("qv"), col("cc"), flatBooks, kSub) + lit(1e-9), 6))
      .withColumn("ar", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("approx").desc, col("neighbor_id"))))
      .filter(col("ar") <= k * overfetch)
      .select(col("query_id"), col("neighbor_id"))
    val scored = shortlist
      .join(unit.select(col("uid").as("query_id"), col("uvec").as("q_vec")),
        "query_id")
      .join(unit.select(col("uid").as("neighbor_id"), col("uvec").as("c_vec")),
        "neighbor_id")
      .withColumn("cosine",
        round(dot(col("q_vec"), col("c_vec")) + lit(1e-9), 6))
    topKByCosine(scored, k)
  }

  /** The composed IVF-PQ retrieval pipeline — [[ivfSq8TopK]]'s multi-probe
    * candidate generation with [[pqTopK]]'s product-quantized scoring: each
    * query probes its `nProbe` nearest coarse cells by centroid cosine, the
    * probed candidates are scored by m-subspace PQ codes through the
    * codegen'd SDC table lookup (2 bytes of payload per candidate at
    * m=4/kSub=16 — 32× less than the floats, 8× less than SQ8's int8
    * codes), and the per-query `k·overfetch` shortlist is re-ranked on
    * exact float cosines joined by id only. This is the FAISS IVFPQ shape —
    * the configuration a 100 TB corpus actually deploys, where even int8
    * codes dominate the candidate shuffle.
    *
    * Structure mirrors [[ivfSq8TopK]] stage for stage (coarse centroid
    * codebook = per-cell means over the FULL corpus, broadcast under the
    * query stream; one cell per corpus vector so no pair dedup; md5-order
    * `capPerBucket` fan-in guard), with PQ codebooks/tables built as in
    * [[pqTopK]]. Output cosines are EXACT; determinism contract as
    * everywhere in this file.
    */
  def ivfPqTopK(df: DataFrame, idCol: String, vecCol: String,
                bucketCol: String, k: Int, nProbe: Int, dim: Int,
                m: Int = 4, kSub: Int = 16, iters: Int = 1,
                overfetch: Int = 3,
                maxBucket: Int = Int.MaxValue,
                trainFraction: Double = 1.0): DataFrame = {
    import graft.ext.CacheScope.Cacheable
    require(m > 0 && dim % m == 0,
      s"ivfPqTopK requires dim divisible by m, got dim=$dim m=$m")
    val dsub = dim / m
    val vd = col(vecCol).cast("array<double>")
    val books: Array[Array[Array[Double]]] = Array.tabulate(m) { j =>
      lloydCenters(df, idCol, slice(vd, j * dsub + 1, dsub), kSub, iters,
        trainFraction)
    }
    if (books.exists(_.isEmpty))
      return df.limit(0).select(col(idCol).as("query_id"),
        col(idCol).as("neighbor_id"), lit(0.0).as("cosine"),
        lit(0L).as("rank"))
    val codeArr = array((0 until m).map { j =>
      assignOn(slice(vd, j * dsub + 1, dsub), books(j))
    }: _*)
    val coded = df.select(col(bucketCol).as("bkt"), col(idCol).as("uid"),
      codeArr.as("code")).scopedCache()
    val unit = df.select(col(idCol).as("uid"), unitVec(col(vecCol)).as("uvec"))
      .scopedCache()
    val tables: Array[Array[Double]] = books.map { cs =>
      val t = new Array[Double](kSub * kSub)
      var a = 0
      while (a < cs.length) {
        var b = 0
        while (b < cs.length) {
          var s = 0.0
          var d = 0
          while (d < dsub) { s += cs(a)(d) * cs(b)(d); d += 1 }
          t(a * kSub + b) = s
          b += 1
        }
        a += 1
      }
      t
    }
    // coarse centroid codebook + probes: same construction as ivfSq8TopK
    val cents = df
      .select(col(bucketCol).as("bkt"), posexplode(vd).as(Seq("i", "x")))
      .groupBy(col("bkt"), col("i")).agg(avg(col("x")).as("c"))
      .groupBy(col("bkt"))
      .agg(transform(
        array_sort(collect_list(struct(col("i"), col("c")))),
        s => s("c")).as("cvec"))
    val centUnit = cents.select(col("bkt").as("cb"),
      unitVec(col("cvec")).as("cunit"))
    val probes = unit.select(col("uid").as("query_id"), col("uvec").as("q_vec"))
      .crossJoin(broadcast(centUnit))
      .withColumn("cent_cosine",
        round(dot(col("q_vec"), col("cunit")) + lit(1e-9), 6))
      .withColumn("pr", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("cent_cosine").desc, col("cb"))))
      .filter(col("pr") <= nProbe)
      .select(col("query_id"), col("cb").as("bkt"))
    // stage B: probe fan-out joins PQ CODES only, scored by table lookups
    val qcodes = coded.select(col("uid").as("query_id"), col("code").as("qc"))
    val shortlist = probes
      .join(qcodes, "query_id")
      .join(capPerBucket(coded, "bkt", "uid", maxBucket)
        .select(col("bkt"), col("uid").as("neighbor_id"),
          col("code").as("cc")), "bkt")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("approx",
        round(graft.functions.PqFunctions.graft_pq_cosine(
          col("qc"), col("cc"), tables, kSub) + lit(1e-9), 6))
      .withColumn("ar", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("approx").desc, col("neighbor_id"))))
      .filter(col("ar") <= k * overfetch)
      .select(col("query_id"), col("neighbor_id"))
    // stage C: exact re-rank of the shortlist, floats joined by id only
    val scored = shortlist
      .join(unit.select(col("uid").as("query_id"), col("uvec").as("q_vec")),
        "query_id")
      .join(unit.select(col("uid").as("neighbor_id"), col("uvec").as("c_vec")),
        "neighbor_id")
      .withColumn("cosine",
        round(dot(col("q_vec"), col("c_vec")) + lit(1e-9), 6))
    topKByCosine(scored, k)
  }

  /** [[ivfPqTopK]] with RESIDUAL coding — the configuration FAISS's IVFPQ
    * actually ships: sub-quantizers are trained on and code the residual
    * `r = x − c(cell)` instead of the raw vector, so the kSub cells of
    * each subspace model only the spread the coarse quantizer left behind
    * (a much better-conditioned codebook at the same 2-byte budget), and
    * candidates are scored ASYMMETRICALLY against their reconstruction
    * `x̂ = c(cell) + book_j(code_j)` through the codegen'd
    * [[graft.functions.PqResAdcCosine]] — one quantization per pair.
    *
    * Join payload shape vs [[ivfPqTopK]]: the corpus side of the candidate
    * join is unchanged (m codes per vector, capped per cell); the probe
    * side carries the query's raw floats plus the probed cell's mean
    * centroid (2·dim doubles per (query, cell) row — queries × nProbe
    * rows, the small side of a retrieval workload, and the payload never
    * shuffles per PAIR: pairs stream through the scorer inside the join's
    * codegen stage). Stage-C exact re-rank and the determinism contract
    * are unchanged.
    */
  def ivfPqResTopK(df: DataFrame, idCol: String, vecCol: String,
                   bucketCol: String, k: Int, nProbe: Int, dim: Int,
                   m: Int = 4, kSub: Int = 16, iters: Int = 1,
                   overfetch: Int = 3,
                   maxBucket: Int = Int.MaxValue,
                   trainFraction: Double = 1.0): DataFrame =
    ivfPqResSearch(df, df.select(col(idCol), col(vecCol)), idCol, vecCol,
      bucketCol, k, nProbe, dim, m, kSub, iters, overfetch, maxBucket,
      trainFraction)

  /** [[ivfPqResTopK]] with an EXTERNAL query set — the retrieval shape a
    * deployment actually serves: the index (cells, residual codebooks,
    * codes) is built from the CORPUS alone, and `queries` — any frame of
    * `(idCol, vecCol)` rows, typically vectors that are not in the
    * corpus at all — probe it. Every self-query operator in this file is
    * the special case `queries = corpus`; this is the general form
    * (query ids matching a corpus id are excluded from their own result
    * list, so self-search returns identical output through this path).
    */
  def ivfPqResSearch(df: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, bucketCol: String, k: Int,
                     nProbe: Int, dim: Int,
                     m: Int = 4, kSub: Int = 16, iters: Int = 1,
                     overfetch: Int = 3,
                     maxBucket: Int = Int.MaxValue,
                     trainFraction: Double = 1.0): DataFrame =
    ivfPqResIndexParts(df, idCol, vecCol, bucketCol, dim, m, kSub,
        iters, trainFraction) match {
      case None =>
        df.limit(0).select(col(idCol).as("query_id"),
          col(idCol).as("neighbor_id"), lit(0.0).as("cosine"),
          lit(0L).as("rank"))
      case Some((cents, coded, unit, books)) =>
        ivfPqResServe(cents, coded, unit, queries, idCol, vecCol,
          books.map(_.flatten), kSub, k, nProbe, overfetch, maxBucket)
    }

  /** The index-construction half of [[ivfPqResSearch]]: per-cell mean
    * centroids, residual PQ codes, corpus unit vectors, and the residual
    * sub-codebooks — the four artifacts a persisted index ([[AnnIndex]])
    * writes. `None` when the corpus has no non-null vectors (no codebook
    * can be learned).
    */
  private[graft] def ivfPqResIndexParts(df: DataFrame, idCol: String,
                                        vecCol: String, bucketCol: String,
                                        dim: Int, m: Int, kSub: Int,
                                        iters: Int,
                                        trainFraction: Double = 1.0)
      : Option[(DataFrame, DataFrame, DataFrame,
        Array[Array[Array[Double]]])] = {
    import graft.ext.CacheScope.Cacheable
    require(m > 0 && dim % m == 0,
      s"residual IVF-PQ requires dim divisible by m, got dim=$dim m=$m")
    val dsub = dim / m
    val vd = col(vecCol).cast("array<double>")
    // per-cell mean centroids over the FULL corpus (same construction as
    // ivfPqTopK's probe codebook, but also the residual origin here)
    val cents = df
      .select(col(bucketCol).as("bkt"), posexplode(vd).as(Seq("i", "x")))
      .groupBy(col("bkt"), col("i")).agg(avg(col("x")).as("c"))
      .groupBy(col("bkt"))
      .agg(transform(
        array_sort(collect_list(struct(col("i"), col("c")))),
        s => s("c")).as("cvec"))
      .scopedCache()
    // residuals: one broadcast join against the k-row codebook; zip_with
    // is training-side only (codes are computed from it once)
    val resDf = df
      .select(col(idCol).as("uid"), col(bucketCol).as("bkt"), vd.as("v"))
      .join(broadcast(cents), "bkt")
      .withColumn("rv", zip_with(col("v"), col("cvec"), (x, c) => x - c))
      .scopedCache()
    val books: Array[Array[Array[Double]]] = Array.tabulate(m) { j =>
      lloydCenters(resDf, "uid", slice(col("rv"), j * dsub + 1, dsub),
        kSub, iters, trainFraction)
    }
    if (books.exists(_.isEmpty)) return None
    val codeArr = array((0 until m).map { j =>
      assignOn(slice(col("rv"), j * dsub + 1, dsub), books(j))
    }: _*)
    val coded = resDf.select(col("bkt"), col("uid"), codeArr.as("code"))
      .scopedCache()
    val unit = df.select(col(idCol).as("uid"), unitVec(col(vecCol)).as("uvec"))
      .scopedCache()
    Some((cents, coded, unit, books))
  }

  /** The serve tail of [[ivfPqResSearch]] over ALREADY-MATERIALIZED index
    * parts — cells' mean centroids `(bkt, cvec)`, residual PQ codes
    * `(bkt, uid, code)`, corpus unit vectors `(uid, uvec)`, and the flat
    * residual codebooks — so a PERSISTED index ([[AnnIndex]]) serves
    * queries through exactly the plan the live operator runs.
    */
  private[graft] def ivfPqResServe(cents: DataFrame, coded: DataFrame,
                                   unit: DataFrame, queries: DataFrame,
                                   idCol: String, vecCol: String,
                                   flatBooks: Array[Array[Double]],
                                   kSub: Int, k: Int, nProbe: Int,
                                   overfetch: Int,
                                   maxBucket: Int): DataFrame = {
    import graft.ext.CacheScope.Cacheable
    val qunit = queries
      .select(col(idCol).as("uid"), unitVec(col(vecCol)).as("uvec"))
      .scopedCache()
    // probes: nProbe nearest cells by unit-centroid cosine, carrying the
    // probed cell's RAW mean for the residual reconstruction
    val centUnit = cents.select(col("bkt").as("cb"),
      unitVec(col("cvec")).as("cunit"), col("cvec"))
    val probes = qunit.select(col("uid").as("query_id"), col("uvec").as("qu"))
      .crossJoin(broadcast(centUnit))
      .withColumn("cent_cosine",
        round(dot(col("qu"), col("cunit")) + lit(1e-9), 6))
      .withColumn("pr", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("cent_cosine").desc, col("cb"))))
      .filter(col("pr") <= nProbe)
      .select(col("query_id"), col("cb").as("bkt"), col("cvec"))
    val qraw = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val shortlist = probes
      .join(qraw, "query_id")
      .join(capPerBucket(coded, "bkt", "uid", maxBucket)
        .select(col("bkt"), col("uid").as("neighbor_id"),
          col("code").as("cc")), "bkt")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("approx",
        round(graft.functions.PqFunctions.graft_pq_res_adc_cosine(
          col("qv"), col("cvec"), col("cc"), flatBooks, kSub) + lit(1e-9), 6))
      .withColumn("ar", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("approx").desc, col("neighbor_id"))))
      .filter(col("ar") <= k * overfetch)
      .select(col("query_id"), col("neighbor_id"))
    val scored = shortlist
      .join(qunit.select(col("uid").as("query_id"), col("uvec").as("q_vec")),
        "query_id")
      .join(unit.select(col("uid").as("neighbor_id"), col("uvec").as("c_vec")),
        "neighbor_id")
      .withColumn("cosine",
        round(dot(col("q_vec"), col("c_vec")) + lit(1e-9), 6))
    topKByCosine(scored, k)
  }

  /** Deterministic distributed Lloyd coarse quantizer: learns `k` centroids
    * over the vector column and returns `df` with an assignment column —
    * closing the loop the bucket operators above leave to the caller (the
    * `bucketCol` is no longer a given label; `k` scales with corpus size).
    *
    * Why hand-rolled Lloyd instead of MLlib `KMeans`: identical algorithm
    * (assign to nearest center by squared L2, recenter on the mean), but
    * with a DETERMINISTIC, engine-portable seed — the `k` smallest-id
    * vectors init the centers and iterations are fixed — so the whole
    * quantizer is reproducible in plain SQL and the queries built on it
    * stay hash-exact against the DuckDB oracle (MLlib's kmeans|| init is
    * seed-pinned but not expressible outside Spark, which is why the ML
    * family needs keys-envelope oracles). Distances are guard-rounded to
    * 6dp before the argmin (ties → lowest center index), the same contract
    * every scored rank in this file uses, so FP summation-order drift in
    * the distributed means cannot flip assignments between engines.
    *
    * Scale shape: the per-iteration work is one narrow scan + one
    * (bucket, dim)-key aggregation; centers live on the driver between
    * iterations (`k·dim` doubles — the codebook, bounded by construction,
    * same allowance as [[sq8TopK]]'s stats collect) and ship back as plan
    * literals, so assignment is a codegen'd expression, not a join. An
    * empty cell keeps its previous center (mirrored by the oracle's
    * `coalesce`). Null vectors are excluded from init/means and assign a
    * null bucket (they fall out of any downstream bucket equi-join).
    */
  def kmeansBuckets(df: DataFrame, idCol: String, vecCol: String, k: Int,
                    iters: Int = 2, bucketCol: String = "bucket",
                    trainFraction: Double = 1.0): DataFrame = {
    val centers = lloydCenters(df, idCol, col(vecCol), k, iters,
      trainFraction)
    // empty / all-null-vector corpus: nothing to learn — every row gets a
    // null bucket (and falls out of any bucket equi-join), matching
    // sq8TopK's empty-input contract instead of throwing
    if (centers.isEmpty)
      return df.withColumn(bucketCol, lit(null).cast("int"))
    df.withColumn(bucketCol, assignOn(col(vecCol), centers))
  }

  /** Nearest-center assignment as ONE codegen'd expression looping over the
    * centers matrix ([[graft.functions.ArgMinCentroid]]) — bit-equal to the
    * k-wide `array(round(dot − 2·dot + cc + 1e-9, 6))` → `array_min` →
    * `array_position` column stack it replaced, which carried k·dim doubles
    * as k plan literals and fell out of whole-stage codegen (64KB method
    * limit) past a few hundred centers — breaking the documented "grow k
    * with the corpus" recall lever. Constant bytecode at any k; the matrix
    * ships once as a reference object.
    */
  private[graft] def assignOn(vec: Column,
                              centers: Array[Array[Double]]): Column =
    graft.functions.ArgMinFunctions.graft_argmin_centroid(
      vec.cast("array<double>"), centers)

  /** The Lloyd center-learning loop behind [[kmeansBuckets]], factored out
    * so [[pqTopK]] can learn one codebook per SUBSPACE over a sliced vector
    * expression: deterministic k-smallest-id init, `iters` assign/recenter
    * passes (empty cells keep their previous center), centers on the driver
    * between iterations (≤ k·dim doubles — the codebook allowance every
    * ANN operator in this file shares). Returns empty when the corpus has
    * no non-null vectors; callers own that contract.
    *
    * `trainFraction` < 1 trains on a DETERMINISTIC hash sample of the
    * corpus (salted md5 bucket of the id over 10k buckets — the
    * [[Sampling.hashBucket]] family, so an oracle can replay the exact
    * training set) while assignment still covers every row: the 100 TB
    * codebook posture, where a few hundred thousand sampled vectors
    * train centers statistically identical to the full corpus's at a
    * tiny fraction of the per-iteration scan (SCALING.md round 11).
    * Default 1.0 — every existing oracle chain is unchanged.
    */
  private[graft] def lloydCenters(df: DataFrame, idCol: String, vec: Column,
                                  k: Int, iters: Int,
                                  trainFraction: Double = 1.0)
      : Array[Array[Double]] = {
    import graft.ext.CacheScope.Cacheable
    require(k > 0 && iters >= 0, "lloydCenters requires k > 0 and iters >= 0")
    require(trainFraction > 0 && trainFraction <= 1,
      s"trainFraction=$trainFraction must be in (0,1]")
    val all = df.select(col(idCol).as("__kid"),
        vec.cast("array<double>").as("__kv"))
      .filter(col("__kv").isNotNull)
    // threshold floored at 1 bucket (a fraction below 1e-4 would filter
    // to `< 0` = everything, guaranteed-empty) — and if the hash sample
    // still catches nothing on a small corpus, FALL BACK to full-corpus
    // training rather than silently returning no centers (which would
    // null-bucket every row of a populated corpus downstream)
    val sampled = (if (trainFraction >= 1.0) all
      else all.filter(
        Sampling.hashBucket(col("__kid"), "lloyd", buckets = 10000) <
          math.max(1L, math.round(trainFraction * 10000))))
      .scopedCache()
    var centers: Array[Array[Double]] = sampled.orderBy(col("__kid"))
      .limit(k).collect().map(_.getSeq[Double](1).toArray)
    val base =
      if (centers.nonEmpty || trainFraction >= 1.0) sampled
      else {
        val full = all.scopedCache()
        centers = full.orderBy(col("__kid")).limit(k)
          .collect().map(_.getSeq[Double](1).toArray)
        full
      }
    if (centers.isEmpty) return centers
    for (_ <- 1 to iters) {
      val means = base.withColumn("__kb", assignOn(col("__kv"), centers))
        .filter(col("__kb").isNotNull)
        .select(col("__kb"), posexplode(col("__kv")).as(Seq("__i", "__x")))
        .groupBy(col("__kb"), col("__i")).agg(avg(col("__x")).as("__c"))
        .collect() // ≤ k·dim rows — the codebook
      val byBucket = means.groupBy(_.getInt(0))
      centers = centers.indices.map { j =>
        byBucket.get(j) match {
          case Some(rows) => rows.sortBy(_.getInt(1)).map(_.getDouble(2))
          case None       => centers(j)
        }
      }.toArray
    }
    centers
  }

  /** Product-quantization top-k within a coarse bucket: the memory-scaling
    * step past [[sq8TopK]]. SQ8 stores one byte PER DIMENSION (64 B for a
    * 64-d vector); PQ splits the vector into `m` subspaces, learns a
    * `kSub`-center Lloyd codebook per subspace ([[lloydCenters]] on
    * `slice`s — same deterministic init/iteration contract as
    * [[kmeansBuckets]], so the whole quantizer stays SQL-expressible), and
    * stores one SMALL code per subspace: m·log2(kSub) bits — 2 B here for
    * the same 64-d vector, a 32× compression of what the candidate shuffle
    * moves.
    *
    * Scoring is symmetric SDC through a codegen'd table lookup
    * ([[graft.functions.PqSdcCosine]]): the m × kSub × kSub inner-product
    * tables between sub-centroids are built ONCE on the driver
    * (m·kSub²·8 bytes — 8 KB here, codebook-bounded like every driver
    * collect in this file) and shipped as one reference object; per
    * candidate pair the approximate cosine is m table lookups — no
    * per-pair decode at all, the reason FAISS-style engines run PQ where
    * SQ8 would already fit in memory. Output cosines are EXACT (stage-C
    * float re-rank of the per-query `k·overfetch` shortlist, floats joined
    * by id only); the codes decide only WHICH candidates reach the
    * re-rank. Determinism contract as everywhere in this file: scores
    * guard-rounded to 6dp (+1e-9) before ranking, ties to the lower id.
    */
  def pqTopK(df: DataFrame, idCol: String, vecCol: String,
             bucketCol: String, k: Int, dim: Int, m: Int = 4,
             kSub: Int = 16, iters: Int = 1, overfetch: Int = 3,
             maxBucket: Int = Int.MaxValue,
             trainFraction: Double = 1.0): DataFrame = {
    import graft.ext.CacheScope.Cacheable
    require(m > 0 && dim % m == 0,
      s"pqTopK requires dim divisible by m, got dim=$dim m=$m")
    val dsub = dim / m
    val vd = col(vecCol).cast("array<double>")
    // Stage A: one Lloyd codebook per subspace over the sliced corpus.
    // m driver round-trips of ≤ kSub·dsub doubles each — the same
    // codebook-learning allowance as kmeansBuckets; at 100 TB this stage
    // runs on a sample, the codes pass below is the full-corpus work.
    val books: Array[Array[Array[Double]]] = Array.tabulate(m) { j =>
      lloydCenters(df, idCol, slice(vd, j * dsub + 1, dsub), kSub, iters,
        trainFraction)
    }
    // empty/all-null corpus: no codebooks — empty result with the output
    // schema, the sq8TopK empty-input contract
    if (books.exists(_.isEmpty))
      return df.limit(0).select(col(idCol).as("query_id"),
        col(idCol).as("neighbor_id"), lit(0.0).as("cosine"),
        lit(0L).as("rank"))
    // codes: array of m sub-assignments, each ONE codegen'd argmin over
    // its subspace slice — the full-corpus encode pass moves m ints/row
    val codeArr = array((0 until m).map { j =>
      assignOn(slice(vd, j * dsub + 1, dsub), books(j))
    }: _*)
    val coded = df.select(col(bucketCol).as("bkt"), col(idCol).as("uid"),
      codeArr.as("code")).scopedCache()
    val unit = df.select(col(idCol).as("uid"), unitVec(col(vecCol)).as("uvec"))
      .scopedCache()
    // SDC tables: tables(j)(a·kSub + b) = Σ_d c_a[d]·c_b[d] over subspace
    // j, summed in dimension order (left fold) so the per-subspace partial
    // matches the oracle's list_inner_product over the same sub-centroid
    val tables: Array[Array[Double]] = books.map { cs =>
      val t = new Array[Double](kSub * kSub)
      var a = 0
      while (a < cs.length) {
        var b = 0
        while (b < cs.length) {
          var s = 0.0
          var d = 0
          while (d < dsub) { s += cs(a)(d) * cs(b)(d); d += 1 }
          t(a * kSub + b) = s
          b += 1
        }
        a += 1
      }
      t
    }
    // Stage B: bucket equi-join on CODES (m small ints per row through the
    // shuffle), scored by the fused SDC lookup expression
    val a = coded.select(col("bkt"), col("uid").as("query_id"),
      col("code").as("qc"))
    val b = capPerBucket(coded, "bkt", "uid", maxBucket)
      .select(col("bkt"), col("uid").as("neighbor_id"),
        col("code").as("cc"))
    val shortlist = a.join(b, "bkt")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("approx",
        round(graft.functions.PqFunctions.graft_pq_cosine(
          col("qc"), col("cc"), tables, kSub) + lit(1e-9), 6))
      .withColumn("ar", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("approx").desc, col("neighbor_id"))))
      .filter(col("ar") <= k * overfetch)
      .select(col("query_id"), col("neighbor_id"))
    // Stage C: exact re-rank of the short list only
    val scored = shortlist
      .join(unit.select(col("uid").as("query_id"), col("uvec").as("q_vec")),
        "query_id")
      .join(unit.select(col("uid").as("neighbor_id"), col("uvec").as("c_vec")),
        "neighbor_id")
      .withColumn("cosine",
        round(dot(col("q_vec"), col("c_vec")) + lit(1e-9), 6))
    topKByCosine(scored, k)
  }

  /** Deterministic signed permutation — the "random rotation" PQ
    * pre-conditioner (OPQ's cheap cousin: FAISS `RandomRotationMatrix`
    * restricted to the signed-permutation subgroup, which needs no
    * matrix multiply): applied before [[pqTopK]], it spreads
    * per-dimension energy across the m subspaces, so a corpus whose
    * variance concentrates in a few leading dimensions doesn't waste
    * all but one sub-codebook on noise. Orthogonal, so cosines are
    * mathematically unchanged; engine-exact (the permutation and signs
    * are integer-hash-derived and emitted as literals into the oracle).
    */
  private[graft] def mix32(i: Int): Int = {
    var x = i * 0x9E3779B9
    x ^= x >>> 16; x *= 0x85EBCA6B
    x ^= x >>> 13; x *= 0xC2B2AE35
    x ^ (x >>> 16)
  }

  /** The permutation: indices sorted by integer hash (id tiebreak). */
  def rotationPerm(dim: Int): Array[Int] =
    Array.range(0, dim).sortBy(i => (mix32(i), i))

  /** The per-dimension sign (±1), hash-derived. */
  def rotationSign(dim: Int): Array[Int] =
    Array.tabulate(dim)(i => if (((mix32(i) >>> 7) & 1) == 0) 1 else -1)

  /** The rotated vector as ONE array projection (no shuffle, no UDF):
    * `out_i = vec[perm(i)] · sign(i)` over an `array<double>` column.
    */
  def rotate(vec: Column, dim: Int): Column = {
    val perm = rotationPerm(dim)
    val sign = rotationSign(dim)
    array((0 until dim).map(i =>
      element_at(vec, perm(i) + 1) * lit(sign(i).toDouble)): _*)
  }

  /** Deterministic hyperplane component `j` of plane `p` — a pure integer
    * hash mapped into [-1, 1]: exact in ANY engine (the integer arithmetic
    * has one answer; /1000.0 and −1.0 are single IEEE ops), unlike the
    * earlier `sin(j·(p+1)·0.7391)` planes whose libm last-ulp drift between
    * JVMs and DuckDB sat underneath every sign test. Same portable-hash
    * discipline as [[graft.ext.Sampling]]'s md5 buckets. 2654435761 is the
    * Knuth multiplicative-hash constant; 2001 residues (0..2000) over
    * /1000 − 1 spread the components uniformly in [-1, 1].
    */
  private[graft] def planeComponent(p: Int, j: Int): Double =
    ((j.toLong * 2654435761L + (p + 1).toLong * 40503L) % 2001L) / 1000.0 - 1.0

  /** Random-hyperplane LSH bucket id for a vector: sign-bit signature over
    * `nPlanes` fixed pseudo-random hyperplanes — the text-free analogue of
    * [[graft.ext.Dedup.minHashLsh]]; bucket-join on this id is the
    * candidate generator when no trained quantizer exists yet (day-one
    * ingest, before [[kmeansBuckets]] has a corpus to learn from).
    *
    * ONE codegen'd expression ([[graft.functions.SignBits]]): the planes
    * matrix (`nPlanes·dim` doubles, built here from [[planeComponent]])
    * ships once as a reference object and the per-row work is two primitive
    * loops — replacing the interpreted
    * `aggregate(zip_with(transform(sequence(...))))` HOF stack that
    * re-generated plane components per element per row. Projections are
    * guard-rounded to 6dp before the sign test (the house determinism
    * contract), so the DuckDB oracle reproduces every bit exactly.
    */
  def hyperplaneBucket(vec: Column, dim: Int, nPlanes: Int = 8): Column = {
    require(dim > 0 && nPlanes > 0 && nPlanes <= 63,
      s"hyperplaneBucket requires dim > 0 and 1..63 planes, got " +
        s"dim=$dim nPlanes=$nPlanes")
    val planes = Array.tabulate(nPlanes, dim)(planeComponent)
    graft.functions.SignBitsFunctions.graft_sign_bits(
      vec.cast("array<double>"), planes)
  }

  /** Hard-negative mining over a retrieval frame — the contrastive-training
    * data step downstream of ANN search: the rank-1 neighbor is the
    * pseudo-positive and ranks 2..k become negatives, each with its cosine
    * `margin` below the positive (the quantity a triplet/InfoNCE loss
    * consumes, and the knob distillation recipes threshold on). Input
    * contract is the output of ANY top-k operator in this file:
    * `(query_id, neighbor_id, cosine, rank)`.
    *
    * Scale: one window partitioned by `query_id` over a frame of k rows per
    * query — the retrieval tail already hash-partitioned by `query_id` for
    * its own rank window, so this adds no data-sized shuffle; no join (the
    * positive is pulled down the frame with `first() OVER`).
    */
  def hardNegatives(retrieved: DataFrame): DataFrame = {
    // neighbor_id tie-break: a single top-k output has unique ranks, but
    // an input that bends the contract (e.g. a union of two retrievals)
    // must still pick a deterministic positive among tied rank-1 rows
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rank"), col("neighbor_id"))
    retrieved
      .withColumn("pos_id", first(col("neighbor_id")).over(w))
      .withColumn("pos_cosine", first(col("cosine")).over(w))
      .filter(col("rank") > 1)
      .select(col("query_id"), col("pos_id"),
        col("neighbor_id").as("neg_id"),
        (col("rank") - 1).as("neg_rank"), col("cosine"),
        round(col("pos_cosine") - col("cosine") + lit(1e-9), 6).as("margin"))
  }
}
