package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.FeatureParams

/** Isolated raw-tier scaling probe: one warm-up + N timed repetitions of
  * ONLY the per-row feature aggregation job, at one parallelism level.
  * `runMain graft.tools.RawScale <tokensPath> <cpus> [reps]`.
  */
object RawScale {
  def main(args: Array[String]): Unit = {
    val tokensPath = args(0)
    val cpus = args(1).toInt
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", (2 * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (32 * 1024).toString)
      .config("spark.storage.memoryMapThreshold", "1g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val scale = 1.0 / (1 << 24)
    val p = FeatureParams(sfreq = 256.0, scale = scale)
    def rawJob(): Unit = {
      val tokens = spark.read.parquet(tokensPath)
      tokens.select(
        graft.functions.feature("mean", col("tokens"), p).as("mean"),
        graft.functions.feature("line_length", col("tokens"), p).as("line_length"),
        graft.functions.feature("hjorth_mobility", col("tokens"), p).as("hjorth_mobility"),
        graft.functions.feature("spect_entropy", col("tokens"), p).as("spect_entropy"),
        graft.functions.feature("higuchi_fd", col("tokens"), p).as("higuchi_fd"))
        .agg(avg("mean"), avg("line_length"), avg("hjorth_mobility"),
          avg("spect_entropy"), avg("higuchi_fd")).collect()
    }
    rawJob() // warm-up
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    for (r <- 1 to reps) {
      val cpu0 = osBean.getProcessCpuTime
      var gc0 = 0L
      gcBeans.forEach(b => gc0 += b.getCollectionTime)
      val t0 = System.nanoTime()
      rawJob()
      val wall = (System.nanoTime() - t0) / 1e9
      val cpuS = (osBean.getProcessCpuTime - cpu0) / 1e9
      var gc1 = 0L
      gcBeans.forEach(b => gc1 += b.getCollectionTime)
      println(f"[rawscale] cpus=$cpus rep=$r sec=$wall%.3f cpu=$cpuS%.1f " +
        f"cpuPerWall=${cpuS / wall}%.1f gcMs=${gc1 - gc0}")
    }
    spark.stop()
  }
}
