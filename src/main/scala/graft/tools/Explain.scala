package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.TokenRollup
import graft.functions.FeatureParams

/** Plan auditor: prints formatted physical plans for the engine's core
  * shapes so scan pruning / codegen spans / exchange counts are reviewable.
  * `runMain graft.tools.Explain <tokensPath>`.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val tokensPath = args.lift(0).getOrElse("/tmp/graft_tokens")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tokens = spark.read.parquet(tokensPath)
    val scale = 1.0 / (1 << 24)
    val p = FeatureParams(sfreq = 256.0, scale = scale)

    println("==== RAW TIER (per-row features) ====")
    tokens.select(col("doc_id"),
      graft.functions.feature("spect_entropy", col("tokens"), p).as("se"))
      .explain("formatted")

    println("==== RAW TIER + partition filter (source pruning) ====")
    tokens.where(col("source") === "s3")
      .select(col("doc_id"),
        graft.functions.feature("mean", col("tokens"), p).as("m"))
      .explain("formatted")

    println("==== 1m BUCKET STATES (bridge + merge) ====")
    val states = TokenRollup.rowStates(tokens, scale)
    TokenRollup.mergeToBuckets(states, "1 minute", Seq("event_time", "doc_id"))
      .explain("formatted")

    println("==== CASCADE 1m -> 1h ====")
    val m1 = TokenRollup.mergeToBuckets(states, "1 minute", Seq("event_time", "doc_id"))
    TokenRollup.finalizeFeatures(TokenRollup.cascade(m1, "1 hour"))
      .explain("formatted")

    spark.stop()
  }
}
