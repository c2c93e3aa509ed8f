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

  /** Per-user signal from the events table, samples ordered by
    * (ts, event_id) — deterministic total order. */
  def eventSignals(spark: SparkSession, dir: String): DataFrame = {
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    ev.groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("ts"), col("event_id"),
        col("value")))).as("evs"))
      .select(col("user_id"), col("evs.value").as("signal"))
  }

  /** Per (event_type, tumbling window) signal: the holistic-tier shape —
    * each window's samples concatenated in (ts, event_id) order. */
  def bucketSignals(spark: SparkSession, dir: String, win: String): DataFrame = {
    val ev = spark.read.parquet(s"$dir/events.parquet")
    ev.groupBy(col("event_type"), window(col("ts"), win).as("w"))
      .agg(sort_array(collect_list(struct(col("ts"), col("event_id"),
        col("value")))).as("evs"))
      .select(col("event_type"),
        unix_timestamp(col("w.start")).as("bucket_s"),
        col("evs.value").as("signal"))
  }

  /** First-difference array of a signal column (for diff-domain features). */
  def diffArray(signal: Column): Column =
    zip_with(slice(signal, lit(2), size(signal) - 1),
      slice(signal, lit(1), size(signal) - 1),
      (a, b) => a - b)
}
