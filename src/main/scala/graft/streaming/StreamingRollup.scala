package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

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

  /** Drive a bounded source synchronously into a memory sink (test/dev). */
  def runOnce(spark: SparkSession, sourceDir: String, win: String,
              watermark: String, scale: Double, queryName: String): DataFrame = {
    val schema = spark.read.parquet(sourceDir).schema
    val stream = spark.readStream.schema(schema).parquet(sourceDir)
    val q = tier(stream, win, watermark, scale)
      .writeStream.outputMode("complete")
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
