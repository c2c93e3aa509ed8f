package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Streaming exact dedup: the batch `DedupOps.exact` contract — one row
  * per content hash with the minimum doc_id as keeper — maintained
  * INCREMENTALLY over an arriving document stream with
  * `flatMapGroupsWithState`.
  *
  * Per content hash the state is a single 16-byte (minDoc, n) struct;
  * each trigger that sees the hash emits the UPDATED (keeper, n_seen)
  * row, so a downstream Update-mode sink always holds the latest view and
  * the final row per hash equals the batch answer regardless of how the
  * input was split into micro-batches (min and count are
  * order-insensitive). That batch-split invariance is what the driver
  * gate exercises: the source is read with maxFilesPerTrigger so the SAME
  * documents arrive across several triggers, and the result must still
  * hash-match the one-shot batch oracle.
  *
  * Scale posture: state is one struct per DISTINCT hash — the minimum any
  * exact dedup can hold (Spark's own dropDuplicates keeps the same keys).
  * Bounded-horizon variants (dedup-within-watermark) would add an
  * event-time timeout here; documents carry no event time, so the gate
  * runs with NoTimeout and the horizon policy stays a caller decision.
  */
object StreamingDedup {

  final case class In(textHash: String, docId: Long)
  final case class DedupState(minDoc: Long, n: Long)
  final case class Out(text_hash: String, keep_doc_id: Long, n_seen: Long)

  /** The stateful dedup transform over a streaming (text_hash, doc_id)
    * projection: emits the running (keeper, count) per hash on every
    * trigger where the hash appears. */
  def dedupByHash(rows: Dataset[In]): Dataset[Out] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.groupByKey(_.textHash)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (hash: String, it: Iterator[In], state: GroupState[DedupState]) =>
          var minDoc = Long.MaxValue
          var n = 0L
          while (it.hasNext) {
            val r = it.next()
            if (r.docId < minDoc) minDoc = r.docId
            n += 1L
          }
          val prev = state.getOption.getOrElse(DedupState(Long.MaxValue, 0L))
          val next = DedupState(math.min(prev.minDoc, minDoc), prev.n + n)
          state.update(next)
          Iterator.single(Out(hash, next.minDoc, next.n))
      }
  }

  /** Drive a bounded parquet source through the stateful dedup in several
    * micro-batches (maxFilesPerTrigger) into a memory sink, then collapse
    * the Update-mode emission log to the final row per hash. min/max over
    * the running emissions equal the last emission's values (both are
    * monotone), so the collapse is exact, not a heuristic. */
  def runOnce(spark: SparkSession, sourceDir: String, queryName: String,
              filesPerTrigger: Int = 2): DataFrame = {
    import spark.implicits._
    val schema = spark.read.parquet(sourceDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", filesPerTrigger)
      .parquet(sourceDir)
    val rows = stream.select(
      md5(col("text").cast("binary")).as("textHash"),
      col("doc_id").as("docId")).as[In]
    val q = dedupByHash(rows)
      .writeStream.outputMode("update")
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
      .groupBy(col("text_hash"))
      .agg(min(col("keep_doc_id")).as("keep_doc_id"),
        max(col("n_seen")).as("n_seen"))
  }
}
