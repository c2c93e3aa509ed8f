package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale demonstration for the r6 packSequences rewrite: on a
  * SINGLE-source corpus (the worst case for the r5 shape) time the old
  * per-source running-sum window against the distributed two-pass prefix
  * sum, on the same generated frame, and assert the aggregated outputs
  * match. `runMain graft.tools.PackSoak [nDocs] [cpus]`. */
object PackSoak {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(2000000)
    val cpus = args.lift(1).getOrElse("32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // one hot source, deterministic token counts 1..32 words
    val docs = spark.range(0, n, 1, 64)
      .select(col("id").as("doc_id"),
        concat(lit("w "), repeat(lit("w "), pmod(col("id"), lit(32)).cast("int")))
          .as("text"),
        lit("hot").as("source"))
      .persist()
    docs.count() // materialize off the clock
    def oldShape(): org.apache.spark.sql.DataFrame = {
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      docs.select(col("doc_id"), col("source"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
        .withColumn("cum_before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
        .withColumn("bin", expr("cum_before div 512L"))
        .groupBy(col("source"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
    }
    def checksum(df: org.apache.spark.sql.DataFrame): (Long, String) = {
      // exact order-insensitive digest: decimal sum cannot overflow ANSI
      val r = df.agg(count(lit(1)),
        sum(xxhash64(df.columns.map(c => col(c).cast("string")): _*)
          .cast("decimal(38,0)"))).collect()(0)
      (r.getLong(0), r.getDecimal(1).toString)
    }
    def timed(name: String)(body: => (Long, String)): (Long, String) = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[packsoak] $name sec=${(System.nanoTime() - t0) / 1e9}%.2f " +
        s"bins=${r._1} chk=${r._2}")
      r
    }
    val nw = timed("prefix_sum_r6")(checksum(
      graft.operators.PipelineOps.packSequences(docs, 512)))
    val od = timed("window_r5")(checksum(oldShape()))
    println(s"[packsoak] outputs_match=${nw == od}")
    spark.stop()
  }
}
