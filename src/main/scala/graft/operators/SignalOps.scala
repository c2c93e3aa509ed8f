package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builders turning relational event streams into per-key ordered signal
  * arrays — the bridge from a scalar fact table to the engine's
  * one-row-one-signal model (SURVEY.md §1.2).
  *
  * Scale note: `collect_list` here is bounded by the per-key series length
  * (e.g. one user's events, one (source, window) bucket), never by table
  * size; the groupBy shuffles once on the key and every downstream feature
  * is a narrow per-row kernel. At 100 TB the same plan holds as long as a
  * single key's window fits an executor — the engine's documented
  * holistic-feature contract (SURVEY.md §7.3); cap via maxSeqLen.
  */
object SignalOps {

  /** Hard per-key signal cap: one pathological key (a bot user, a template
    * source) must not OOM its executor. Signals longer than this keep their
    * FIRST MaxSeqLen samples in (ts, event_id) order and set `truncated` —
    * same contract as TokenRollup.holisticFeatures' maxTokens. */
  val MaxSeqLen: Int = 1 << 20

  /** Per-user signal from the events table, samples ordered by
    * (ts, event_id) — deterministic total order, capped at maxSeqLen by
    * the bounded-heap aggregate (O(maxSeqLen) state at every stage,
    * map-side partials included — not a post-hoc slice). */
  def eventSignals(spark: SparkSession, dir: String,
                   maxSeqLen: Int = MaxSeqLen): DataFrame = {
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    ev.groupBy(col("user_id"))
      .agg(graft.functions.bounded_sorted_collect(struct(col("ts"),
        col("event_id"), col("value")), maxSeqLen).as("evs"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("evs.value").as("signal"),
        (col("n_events") > maxSeqLen).as("truncated"))
  }

  /** Per (event_type, tumbling window) signal: the holistic-tier shape —
    * each window's samples concatenated in (ts, event_id) order, capped. */
  def bucketSignals(spark: SparkSession, dir: String, win: String,
                    maxSeqLen: Int = MaxSeqLen): DataFrame = {
    val ev = spark.read.parquet(s"$dir/events.parquet")
    ev.groupBy(col("event_type"), window(col("ts"), win).as("w"))
      .agg(graft.functions.bounded_sorted_collect(struct(col("ts"),
        col("event_id"), col("value")), maxSeqLen).as("evs"),
        count(lit(1)).as("n_events"))
      .select(col("event_type"),
        unix_timestamp(col("w.start")).as("bucket_s"),
        col("evs.value").as("signal"),
        (col("n_events") > maxSeqLen).as("truncated"))
  }

  /** First-difference array of a signal column (for diff-domain features). */
  def diffArray(signal: Column): Column =
    zip_with(slice(signal, lit(2), size(signal) - 1),
      slice(signal, lit(1), size(signal) - 1),
      (a, b) => a - b)
}
