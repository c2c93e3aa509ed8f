package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.functions.token_partials

/** Structured Streaming face of the tier engine: the same per-row
  * mergeable state, aggregated with built-in (streaming-compatible)
  * aggregates over watermarked tumbling windows.
  *
  * Scope note (documented contract): streaming emits the orderless subset
  * of the state — moments, extrema, counts — because the cross-row
  * boundary bridge needs total order within a window (a lag), which the
  * incremental model cannot provide. Diff-family features (line_length,
  * Hjorth) come from the batch cascade; the streaming tier serves the
  * live dashboardable subset with exactly the batch values for those
  * columns (same partial sums, same finalize arithmetic).
  */
object StreamingRollup {

  /** Watermarked tumbling-window tier over a streaming token table. */
  def tier(stream: DataFrame, win: String, watermark: String,
           scale: Double): DataFrame = {
    val withState = stream
      .withColumn("P", token_partials(col("tokens"), scale))
      .where(col("P").isNotNull)
      .withWatermark("event_time", watermark)
    withState
      .groupBy(col("source"), window(col("event_time"), win).as("w"))
      .agg(sum("P.n").as("n"), sum("P.s1").as("s1"), sum("P.s2").as("s2"),
        sum("P.s3").as("s3"), sum("P.s4").as("s4"),
        min("P.mn").as("mn"), max("P.mx").as("mx"),
        count(lit(1)).as("rows_in"))
      .select(col("source"), col("w.start").as("bucket"),
        col("n"), col("rows_in"),
        (col("s1") / col("n")).as("mean"),
        ((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1))
          .as("variance"),
        sqrt(col("s2") / col("n")).as("rms"),
        (col("mx") - col("mn")).as("ptp_amp"))
  }

  /** Start the bounded-source tier into a memory sink without awaiting —
    * callers running several INDEPENDENT streaming gates can start them
    * all and await together, overlapping their micro-batch schedules
    * (Spark runs concurrently-started streaming queries side by side;
    * each keeps its own checkpoint + sink table). */
  def startOnce(spark: SparkSession, sourceDir: String, win: String,
                watermark: String, scale: Double,
                queryName: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = spark.read.parquet(sourceDir).schema
    val stream = spark.readStream.schema(schema).parquet(sourceDir)
    tier(stream, win, watermark, scale)
      .writeStream.outputMode("complete")
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Drive a bounded source synchronously into a memory sink (test/dev). */
  def runOnce(spark: SparkSession, sourceDir: String, win: String,
              watermark: String, scale: Double, queryName: String): DataFrame = {
    startOnce(spark, sourceDir, win, watermark, scale, queryName)
      .awaitTermination()
    spark.table(queryName)
  }

  /** Diff-family streaming tier (r3): the cross-row boundary bridge under
    * incremental processing. flatMapGroupsWithState carries, per (source,
    * window), the per-row BOUNDARY tuples (first/last two samples + edge
    * signs, in row order) plus the running row-internal sums; each trigger
    * re-derives the bridge terms from the sorted boundaries — so
    * line_length, Hjorth and zero-crossings come out EXACTLY equal to the
    * batch cascade regardless of arrival order, which a watermarked
    * groupBy (orderless) cannot do. State is O(rows-in-window) boundary
    * tuples, capped by `maxSegs` (hotter windows belong to the batch
    * cascade); windows evict on event-time timeout one watermark past the
    * window end.
    *
    * Incremental state (r4): `segs` is kept SORTED as a state invariant —
    * each trigger sorts only its own k arrivals and two-pointer-merges
    * them into the state, O(k log k + m) instead of the r3 full re-sort's
    * O(m log m) per trigger. The bridge walk stays the same sequential
    * O(m) pass (it is the output computation anyway), so the emitted
    * arithmetic — and the batch equivalence — is bit-identical.
    *
    * Hot-window fallback (r5): a window whose boundary-tuple count would
    * exceed `maxSegs` transitions to overflow mode instead of failing the
    * job — its segs are dropped, state stays O(1), and every subsequent
    * emission carries `overflow = true` with the diff-family fields
    * zeroed. The driver unions those windows back from the batch cascade
    * (runOnceDiffWithBatchFallback); orderless sums keep accumulating and
    * stay correct throughout. */
  def diffTier(stream: DataFrame, win: String, watermark: String,
               scale: Double, maxSegs: Int = 1 << 17): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import StreamingDiff._
    val spark = stream.sparkSession
    import spark.implicits._
    val winMs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(win))
    val winMillis = java.util.concurrent.TimeUnit.MICROSECONDS.toMillis(
      org.apache.spark.sql.catalyst.util.IntervalUtils.getDuration(
        winMs, java.util.concurrent.TimeUnit.MICROSECONDS))
    val wmMillis = java.util.concurrent.TimeUnit.MICROSECONDS.toMillis(
      org.apache.spark.sql.catalyst.util.IntervalUtils.getDuration(
        org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
          org.apache.spark.unsafe.types.UTF8String.fromString(watermark)),
        java.util.concurrent.TimeUnit.MICROSECONDS))
    val rows = stream
      .withColumn("P", token_partials(col("tokens"), scale))
      .where(col("P").isNotNull)
      .withWatermark("event_time", watermark)
      .select(col("source"),
        window(col("event_time"), win)("start").cast("long").as("bucketS"),
        // micros, not a seconds cast: sub-second timestamps must order
        // identically to the batch cascade's (event_time, doc_id) key
        unix_micros(col("event_time")).as("ts"), col("doc_id"),
        // the watermark-tagged column must reach the stateful operator for
        // EventTimeTimeout to be accepted (it is otherwise unused)
        col("event_time"),
        col("P.n"), col("P.s1"), col("P.s2"), col("P.s3"), col("P.s4"),
        col("P.mn"), col("P.mx"), col("P.sumAbsD"), col("P.sumDSq"),
        col("P.sumESq"), col("P.f1"), col("P.f2"), col("P.l1"), col("P.l2"),
        col("P.zc"), col("P.fSgn"), col("P.lSgn"),
        coalesce(col("n_tok").cast("long"), col("P.n")).as("rowTokens"))
      .as[In]
    rows.groupByKey(r => (r.source, r.bucketS))
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.EventTimeTimeout)(
        (key: (String, Long), it: Iterator[In], state: GroupState[St]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(St(Vector.empty, 0L,
              0.0, 0.0, 0.0, 0.0, Double.PositiveInfinity,
              Double.NegativeInfinity, 0.0, 0.0, 0.0, 0L, 0L, 0L,
              overflowed = false))
            val freshB = Vector.newBuilder[Seg]
            it.foreach { r =>
              freshB += Seg(r.ts, r.doc_id, r.f1, r.f2, r.l1, r.l2,
                r.fSgn, r.lSgn)
              st = st.copy(
                n = st.n + r.n, s1 = st.s1 + r.s1, s2 = st.s2 + r.s2,
                s3 = st.s3 + r.s3, s4 = st.s4 + r.s4,
                mn = math.min(st.mn, r.mn), mx = math.max(st.mx, r.mx),
                accAbsD = st.accAbsD + r.sumAbsD,
                accDSq = st.accDSq + r.sumDSq,
                accESq = st.accESq + r.sumESq, accZc = st.accZc + r.zc,
                rowsIn = st.rowsIn + 1, tokensIn = st.tokensIn + r.rowTokens)
            }
            val fresh = freshB.result()
            if (st.overflowed || st.segs.size + fresh.size > maxSegs) {
              // hot window: drop the boundary tuples (state back to O(1))
              // and flag every emission — the batch cascade owns this
              // window's diff family from here on
              st = st.copy(segs = Vector.empty, overflowed = true)
            } else {
              // sort only this trigger's arrivals; merge into sorted state
              st = st.copy(segs =
                mergeSorted(st.segs, fresh.sortBy(s => (s.ts, s.docId))))
            }
            state.update(st)
            // evict one watermark past the window end (never behind the
            // current watermark — Spark rejects stale timeout timestamps)
            state.setTimeoutTimestamp(math.max(
              (key._2 * 1000L) + winMillis + wmMillis,
              state.getCurrentWatermarkMs() + 1))
            if (st.overflowed) {
              Iterator.single(Out(key._1, key._2, st.n, st.s1, st.s2, st.s3,
                st.s4, st.mn, st.mx, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0L,
                0, 0, st.rowsIn, st.tokensIn, overflow = true))
            } else {
              val sorted = st.segs
              // bridge terms over consecutive boundaries — the same algebra
              // as TokenRollup.mergeToBuckets' lag bridge
              var sumAbsD = st.accAbsD; var sumDSq = st.accDSq
              var sumESq = st.accESq; var zc = st.accZc
              var i = 1
              while (i < sorted.length) {
                val a = sorted(i - 1); val b = sorted(i)
                val d = b.f1 - a.l1
                sumAbsD += math.abs(d)
                sumDSq += d * d
                sumESq += math.pow(d - (a.l1 - a.l2), 2) +
                  math.pow((b.f2 - b.f1) - d, 2)
                if (b.fSgn == 0 && a.lSgn != 0) zc += 1
                if (b.fSgn * a.lSgn < 0) zc += 1
                i += 1
              }
              val h = sorted.head; val l = sorted.last
              Iterator.single(Out(key._1, key._2, st.n, st.s1, st.s2, st.s3,
                st.s4, st.mn, st.mx, sumAbsD, sumDSq, sumESq,
                h.f1, h.f2, l.l1, l.l2, zc, h.fSgn, l.lSgn,
                st.rowsIn, st.tokensIn, overflow = false))
            }
          }
        })
      .toDF()
  }

  /** Two-pointer merge of sorted boundary-tuple runs (ties: existing
    * first — both orders are stable under the strict (ts, docId) key,
    * which is unique per row). O(m + k), allocation-exact. */
  private[graft] def mergeSorted(a: Vector[StreamingDiff.Seg],
                                 b: Vector[StreamingDiff.Seg]): Vector[StreamingDiff.Seg] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = Vector.newBuilder[StreamingDiff.Seg]
    out.sizeHint(a.size + b.size)
    var i = 0; var j = 0
    while (i < a.size && j < b.size) {
      val x = a(i); val y = b(j)
      val cmp = if (x.ts != y.ts) java.lang.Long.compare(x.ts, y.ts)
                else x.docId.compareTo(y.docId)
      if (cmp <= 0) { out += x; i += 1 } else { out += y; j += 1 }
    }
    while (i < a.size) { out += a(i); i += 1 }
    while (j < b.size) { out += b(j); j += 1 }
    out.result()
  }

  /** Start the diff tier into its memory sink without awaiting (see
    * startOnce for the concurrent-gates rationale). */
  def startOnceDiff(spark: SparkSession, sourceDir: String, win: String,
                    watermark: String, scale: Double, queryName: String,
                    maxSegs: Int = 1 << 17): org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = spark.read.parquet(sourceDir).schema
    val stream = spark.readStream.schema(schema).parquet(sourceDir)
    diffTier(stream, win, watermark, scale, maxSegs)
      .writeStream.outputMode("update")
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Collapse a finished diff run's Update-mode emission log to the final
    * (max rows_in) state per key. */
  def collapseDiff(spark: SparkSession, queryName: String): DataFrame = {
    val t = spark.table(queryName)
    val outCols = t.columns.filterNot(c => c == "source" || c == "bucketS")
    t.groupBy(col("source"), col("bucketS"))
      .agg(max_by(struct(outCols.map(col): _*), col("rows_in")).as("o"))
      .select(col("source") +: col("bucketS") +:
        outCols.map(c => col(s"o.$c").as(c)): _*)
  }

  /** Bounded-source synchronous run of the diff tier; emissions are
    * deduplicated to the final (max rows_in) state per key. */
  def runOnceDiff(spark: SparkSession, sourceDir: String, win: String,
                  watermark: String, scale: Double, queryName: String,
                  maxSegs: Int = 1 << 17): DataFrame = {
    startOnceDiff(spark, sourceDir, win, watermark, scale, queryName, maxSegs)
      .awaitTermination()
    collapseDiff(spark, queryName)
  }

  /** Diff tier with automatic hot-window batch fallback: windows the
    * stateful operator flagged as overflowed are recomputed by the batch
    * cascade over the same source and unioned back — the streamed subset
    * and the batch subset carry the identical state algebra, so the
    * combined frame equals an all-batch run. The overflowed-key set is
    * tiny by construction (only windows hotter than maxSegs), hence the
    * broadcast semi-join. */
  def runOnceDiffWithBatchFallback(spark: SparkSession, sourceDir: String,
                                   win: String, watermark: String,
                                   scale: Double, queryName: String,
                                   maxSegs: Int = 1 << 17): DataFrame =
    diffWithBatchFallback(spark,
      runOnceDiff(spark, sourceDir, win, watermark, scale, queryName, maxSegs),
      sourceDir, win, scale)

  /** The overflow-union step alone, over an already-collapsed diff frame
    * (callers that started the stream themselves — see startOnceDiff). */
  def diffWithBatchFallback(spark: SparkSession, streamed: DataFrame,
                            sourceDir: String, win: String,
                            scale: Double): DataFrame = {
    val ok = streamed.where(!col("overflow")).drop("overflow")
    val overKeys = streamed.where(col("overflow"))
      .select(col("source"), col("bucketS"))
    if (overKeys.isEmpty) return ok
    val src = spark.read.parquet(sourceDir)
    val batch = graft.engine.TokenRollup
      .mergeToBuckets(graft.engine.TokenRollup.rowStates(src, scale), win,
        Seq("event_time", "doc_id"))
      .select(Seq(col("source"), unix_timestamp(col("bucket")).as("bucketS")) ++
        graft.engine.TokenRollup.StateFields.map(f => col(s"P.$f").as(f)) ++
        Seq(col("rows_in"), col("tokens_in")): _*)
    ok.unionByName(
      batch.join(broadcast(overKeys), Seq("source", "bucketS")))
  }
}

/** Typed rows for the stateful diff tier. */
object StreamingDiff {
  final case class Seg(ts: Long, docId: String, f1: Double, f2: Double,
                       l1: Double, l2: Double, fSgn: Int, lSgn: Int)
  final case class St(segs: Vector[Seg], n: Long, s1: Double, s2: Double,
                      s3: Double, s4: Double, mn: Double, mx: Double,
                      accAbsD: Double, accDSq: Double, accESq: Double,
                      accZc: Long, rowsIn: Long, tokensIn: Long,
                      overflowed: Boolean)
  final case class In(source: String, bucketS: Long, ts: Long,
                      doc_id: String, event_time: java.sql.Timestamp,
                      n: Long, s1: Double, s2: Double,
                      s3: Double, s4: Double, mn: Double, mx: Double,
                      sumAbsD: Double, sumDSq: Double, sumESq: Double,
                      f1: Double, f2: Double, l1: Double, l2: Double,
                      zc: Long, fSgn: Int, lSgn: Int, rowTokens: Long)
  final case class Out(source: String, bucketS: Long, n: Long, s1: Double,
                       s2: Double, s3: Double, s4: Double, mn: Double,
                       mx: Double, sumAbsD: Double, sumDSq: Double,
                       sumESq: Double, f1: Double, f2: Double, l1: Double,
                       l2: Double, zc: Long, fSgn: Int, lSgn: Int,
                       rows_in: Long, tokens_in: Long, overflow: Boolean)
}
