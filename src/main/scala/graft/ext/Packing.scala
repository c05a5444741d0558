package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training pipelines: assign documents to
  * fixed-size context windows ("packs") so the trainer reads contiguous
  * ~ctxTokens-sized batches instead of one ragged document at a time.
  *
  * This is OFFSET packing — the distributed-standard formulation: documents
  * are laid out in a deterministic stream order, each doc's pack is
  * `floor(tokens_before_it / ctxTokens)`, and a document may straddle a pack
  * boundary (the trainer truncates or continues it, exactly as done for
  * concatenate-and-chunk pretraining data). Greedy first-fit/best-fit
  * packing is inherently sequential (each decision depends on all prior
  * bins) and cannot be expressed as a distributed plan without a driver
  * loop; offset packing gives the same ~zero padding waste with a single
  * window shuffle.
  *
  * Scale: one shuffle on `streamCols`. Each packing stream is processed by
  * one task, so the caller picks enough streams for the cluster — e.g.
  * (source, hashBucket(id, 1024)) at 100 TB — and each stream's packs are
  * independent of every other stream's.
  */
object Packing {

  /** Adds `tok_offset` (tokens strictly before this doc in its stream) and
    * `pack_id` (= tok_offset div ctxTokens) per (streamCols, orderCol)
    * stream. Deterministic: order ties are impossible when `orderCol` is
    * unique per stream (callers pass the doc id).
    */
  def packByOffset(df: DataFrame, streamCols: Seq[String], orderCol: String,
                   nTokensCol: String, ctxTokens: Int): DataFrame = {
    require(ctxTokens > 0, s"ctxTokens=$ctxTokens must be positive")
    val w = Window.partitionBy(streamCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("tok_offset",
        coalesce(sum(col(nTokensCol)).over(w), lit(0L)))
      .withColumn("pack_id", expr(s"tok_offset div $ctxTokens"))
  }

  /** Per-pack summary: how many docs land in each pack, how many tokens the
    * pack holds, and its doc-id span. `pack_tokens` counts every token of
    * every doc whose OFFSET starts in the pack (boundary-straddling docs
    * count fully toward their starting pack, per the offset contract).
    */
  def packSummary(packed: DataFrame, streamCols: Seq[String],
                  orderCol: String, nTokensCol: String): DataFrame =
    packed.groupBy((streamCols :+ "pack_id").map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col(nTokensCol)).as("pack_tokens"),
        min(col(orderCol)).as("first_doc"),
        max(col(orderCol)).as("last_doc"))

  /** Materialize the actual TRAINING SHARDS — the concat-and-chunk token
    * stream a pretraining job reads: per (`streamCols`) stream, documents'
    * token-id sequences concatenate in `orderCol` order and the stream
    * splits at HARD `ctxTokens` boundaries, a document straddling a
    * boundary genuinely splitting across two shards (unlike
    * [[packByOffset]], which only assigns whole docs to their starting
    * pack). Output: one row per shard with `shard_id`, `n_tokens`
    * (= ctxTokens except the stream's final shard), and the ordered
    * `token_ids` array.
    *
    * Input contract: `encoded` carries `streamCols`, a unique-per-stream
    * `idCol`, `n_tokens`, and the ordered `token_ids` array — i.e.
    * [[Bpe.encodeIds]] output joined with its stream columns.
    *
    * Scale shape: the ONLY exchange is the [[packByOffset]] window's
    * stream-key shuffle over doc-count-sized rows — the shard aggregate
    * groups by (stream, shard), and a hash partitioning on the stream
    * key already clusters every such group, so Catalyst reuses the
    * window's exchange and the corpus-token-sized exploded rows NEVER
    * shuffle (verified in the executed plan: no exchange between the
    * posexplode and the final aggregate). Each aggregation group is
    * bounded at `ctxTokens` elements (a 1M-token document spreads over
    * ~4k shard groups, no long-document skew), and per-stream work is
    * partition-local — the caller picks enough streams for the cluster,
    * exactly the [[packByOffset]] contract. Order is restored per shard
    * by sorting the collected (pos, id) structs row-locally; global
    * positions are unique per stream by construction.
    */
  def shardTokens(encoded: DataFrame, streamCols: Seq[String],
                  idCol: String, ctxTokens: Int): DataFrame = {
    require(ctxTokens > 0, s"ctxTokens=$ctxTokens must be positive")
    val withOff = packByOffset(encoded, streamCols, idCol, "n_tokens",
      ctxTokens)
    withOff
      .select((streamCols.map(col) :+ col("tok_offset") :+
        posexplode(col("token_ids")).as(Seq("__p", "token_id"))): _*)
      .select((streamCols.map(col) :+
        (col("tok_offset") + col("__p")).as("__pos") :+
        col("token_id")): _*)
      .withColumn("shard_id", expr(s"__pos div $ctxTokens"))
      .groupBy((streamCols :+ "shard_id").map(col): _*)
      .agg(count(lit(1)).as("n_tokens"),
        transform(
          array_sort(collect_list(struct(col("__pos"), col("token_id")))),
          x => x.getField("token_id")).as("token_ids"))
  }

  /** INCREMENTAL [[shardTokens]] — the shard WRITER shape: emit only
    * COMPLETE shards (exactly `ctxTokens` ids) for this delta and carry
    * the stream's partial tail in the state, so chained deltas append to
    * shard storage without ever rewriting an emitted shard. State is one
    * frame `(streamCols…, tok_total, tail_ids, max_id)` — per-stream
    * total tokens seen, the current partial shard (< ctxTokens ids,
    * bounded), and the max seen id (the ordering guard's evidence) —
    * persist it as parquet between runs like the other artifacts.
    *
    * Returns `(completeShards, newState)`. [[shardTokensFlush]] emits the
    * final partials. EQUIVALENCE (oracled as `q_token_shards_incr`):
    * for id-ordered deltas, the union of every delta's complete shards
    * plus the final flush is IDENTICAL to one [[shardTokens]] pass over
    * the union — same shard ids, same id streams. (Out-of-order deltas
    * diverge from the batch order exactly as [[graft.api.Graft.corpusBuildDelta]]
    * documents.)
    *
    * Scale shape: same as [[shardTokens]] (the delta's stream-key window
    * exchange, token rows never reshuffled) plus two broadcast-sized
    * state joins (streams-bounded). A stream untouched by the delta
    * passes through: its tail re-groups to itself (ctxTokens-bounded
    * work) and emits nothing.
    */
  def shardTokensDelta(encoded: DataFrame, streamCols: Seq[String],
                       idCol: String, ctxTokens: Int,
                       state: Option[DataFrame],
                       checkIdOrder: Boolean = true)
      : (DataFrame, DataFrame) = {
    require(ctxTokens > 0, s"ctxTokens=$ctxTokens must be positive")
    require(streamCols.nonEmpty, "shardTokensDelta needs stream columns")
    // the convergence precondition is PER-STREAM id ordering (streams
    // are independent): a delta id at or below its stream's max seen id
    // would interleave differently than the batch writer — fail loudly
    // (one delta-sized probe; checkIdOrder=false accepts the divergence)
    if (checkIdOrder) state.foreach { st =>
      val stR = st.select(
        (streamCols.map(c => col(c).as(s"__ck_$c")) :+
          col("max_id").as("__ck_max")): _*)
      val cond = streamCols.map(c => col(c) <=> col(s"__ck_$c"))
        .reduce(_ && _)
      val bad = encoded.join(broadcast(stR), cond, "inner")
        .filter(col(idCol) <= col("__ck_max"))
      require(bad.isEmpty,
        s"shardTokensDelta: delta contains ids at or below a stream's " +
          "max seen id — deltas must arrive id-ordered per stream for " +
          "the incremental≡batch contract. Re-id the delta " +
          "(graft.api.Graft.withIngestIds), or pass checkIdOrder = false " +
          "to accept shard-order divergence")
    }
    val withOff = packByOffset(encoded, streamCols, idCol, "n_tokens",
      ctxTokens)
    // delta token rows at GLOBAL positions: state base + local offset
    val deltaToks = state match {
      case Some(st) =>
        // null-safe stream join — a null stream value is a real stream
        val stR = broadcast(st.select(
          (streamCols.map(c => col(c).as(s"__st_$c")) :+
            col("tok_total").as("__base")): _*))
        val cond = streamCols.map(c => col(c) <=> col(s"__st_$c"))
          .reduce(_ && _)
        withOff.join(stR, cond, "left")
          .withColumn("__b", coalesce(col("__base"), lit(0L)))
          .select((streamCols.map(col) :+ col("__b") :+ col("tok_offset") :+
            posexplode(col("token_ids")).as(Seq("__p", "token_id"))): _*)
          .select((streamCols.map(col) :+
            (col("__b") + col("tok_offset") + col("__p")).as("__pos") :+
            col("token_id")): _*)
      case None =>
        withOff
          .select((streamCols.map(col) :+ col("tok_offset") :+
            posexplode(col("token_ids")).as(Seq("__p", "token_id"))): _*)
          .select((streamCols.map(col) :+
            (col("tok_offset") + col("__p")).as("__pos") :+
            col("token_id")): _*)
    }
    // carried tails re-enter at their recorded positions
    // (tail spans [tok_total - len, tok_total) by construction)
    val allToks = state match {
      case Some(st) =>
        val tailToks = st
          .select((streamCols.map(col) :+
            (col("tok_total") - size(col("tail_ids")).cast("long"))
              .as("__t0") :+
            posexplode(col("tail_ids")).as(Seq("__p", "token_id"))): _*)
          .select((streamCols.map(col) :+
            (col("__t0") + col("__p")).as("__pos") :+
            col("token_id")): _*)
        tailToks.unionByName(deltaToks)
      case None => deltaToks
    }
    val grouped = allToks
      .withColumn("shard_id", expr(s"__pos div $ctxTokens"))
      .groupBy((streamCols :+ "shard_id").map(col): _*)
      .agg(count(lit(1)).as("n_tokens"),
        transform(
          array_sort(collect_list(struct(col("__pos"), col("token_id")))),
          x => x.getField("token_id")).as("token_ids"))
      .transform(graft.ext.CacheScope.cache)
    // positions are contiguous per stream, so every group is exactly
    // ctxTokens except each stream's (single) trailing partial
    val complete = grouped.filter(col("n_tokens") === ctxTokens)
    val tails = grouped.filter(col("n_tokens") < ctxTokens)
    // new per-stream totals: old total + delta tokens (union+re-agg —
    // the null-safe combine, same pattern as corpusBuildDelta's offsets)
    val deltaTot = encoded.groupBy(streamCols.map(col): _*)
      .agg(sum(col("n_tokens")).as("tok_total"),
        max(col(idCol)).as("max_id"))
    val totals = state match {
      case Some(st) =>
        st.select((streamCols.map(col) :+ col("tok_total") :+
            col("max_id")): _*)
          .unionByName(deltaTot)
          .groupBy(streamCols.map(col): _*)
          .agg(sum(col("tok_total")).as("tok_total"),
            max(col("max_id")).as("max_id"))
      case None => deltaTot
    }
    // typed empty-array literal without a cast (Spark rejects the
    // array<int>→array<int> cast over a containsNull mismatch): an
    // always-false filter over a one-element array of the right type
    val elemType = grouped.schema("token_ids").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
    val emptyIds = filter(array(lit(0).cast(elemType)), _ => lit(false))
    val tailsR = tails.select(
      (streamCols.map(c => col(c).as(s"__tl_$c")) :+
        col("token_ids").as("__tl_ids")): _*)
    val tCond = streamCols.map(c => col(c) <=> col(s"__tl_$c"))
      .reduce(_ && _)
    // max_id appended LAST so existing positional readers of the
    // (stream…, tok_total, tail_ids) layout keep working
    val newState = totals.join(broadcast(tailsR), tCond, "left")
      .select((streamCols.map(col) :+ col("tok_total") :+
        coalesce(col("__tl_ids"), emptyIds).as("tail_ids") :+
        col("max_id")): _*)
    (complete, newState)
  }

  /** Emit the final partial shard of every stream in a
    * [[shardTokensDelta]] state — the writer's close(): output matches
    * the [[shardTokens]] rows the complete-only emission withheld.
    */
  def shardTokensFlush(state: DataFrame, streamCols: Seq[String],
                       ctxTokens: Int): DataFrame = {
    require(ctxTokens > 0, s"ctxTokens=$ctxTokens must be positive")
    state.filter(size(col("tail_ids")) > 0)
      .select((streamCols.map(col) :+
        // the tail starts shard-aligned at tok_total - len
        expr(s"(tok_total - size(tail_ids)) div $ctxTokens")
          .as("shard_id") :+
        size(col("tail_ids")).cast("long").as("n_tokens") :+
        col("tail_ids").as("token_ids")): _*)
  }

  /** Sliding-window document chunking (the RAG/embedding-pipeline
    * primitive): each doc's whitespace tokens are cut into chunks of up to
    * `chunkSize` tokens starting every `stride` tokens (stride < chunkSize
    * ⇒ overlapping chunks; the final chunks may be short). Emits one row
    * per (doc, chunk): chunk_id (0-based), chunk_start (token offset),
    * n_chunk_tokens, chunk_text.
    *
    * Pure narrow projection — the explode is row-local (no shuffle, scales
    * linearly), and chunk boundaries are token-offset arithmetic, so the
    * rule is exactly reproducible in the SQL oracle.
    */
  def chunkTokens(df: DataFrame, textCol: String, idCol: String,
                  chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride=$stride <= chunkSize=$chunkSize")
    // the canonical tokenizer — a drifting inline copy would silently
    // misalign chunk boundaries with every other operator's token counts
    val toks = TextAnalysis.tokens(col(textCol))
    df.select(col(idCol), toks.as("__toks"))
      .withColumn("__n", size(col("__toks")))
      // chunk starts 0, stride, 2·stride, … strictly below n
      .select(col(idCol), col("__toks"), col("__n"),
        explode(sequence(lit(0), col("__n") - 1, lit(stride)))
          .as("chunk_start"))
      .select(col(idCol),
        (col("chunk_start") / stride).cast("long").as("chunk_id"),
        col("chunk_start").cast("long"),
        least(lit(chunkSize), col("__n") - col("chunk_start")).cast("long")
          .as("n_chunk_tokens"),
        array_join(slice(col("__toks"), col("chunk_start") + 1,
          lit(chunkSize)), " ").as("chunk_text"))
  }
}
