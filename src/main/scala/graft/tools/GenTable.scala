package graft.tools

import org.apache.spark.sql.SparkSession

/** Write a deterministic TokenGen.bulk table: `GenTable <out> <nDocs>`.
  * Used for the data-size linearity soak (BENCH.md) — same generator and
  * layout as graft.Bench phase 0, any doc count. */
object GenTable {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val docs = args(1).toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.gen.TokenGen.bulk(spark, docs, 16, 64, 4096)
      .write.mode("overwrite").partitionBy("source").parquet(out)
    println(s"[gentable] wrote $docs docs to $out")
    spark.stop()
  }
}
