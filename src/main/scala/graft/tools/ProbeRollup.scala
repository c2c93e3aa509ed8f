package graft.tools

import org.apache.spark.sql.SparkSession

/** One-shot phase-timed rollup workload probe (perf forensics). */
object ProbeRollup {
  def main(args: Array[String]): Unit = {
    val cpus = args.lift(0).getOrElse("8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (2 * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (32 * 1024).toString)
      .config("spark.sql.parquet.columnarReaderBatchSize", "512")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    RollupBench.workload(spark, "/tmp/graft_bench_tokens_160000", verbose = true)
    println(f"[probe] total ${(System.nanoTime() - t0) / 1e9}%.1fs")
    spark.stop()
  }
}
