package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object JobProbe {
  def main(args: Array[String]): Unit = {
    val q = args.head
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", math.max(cpus, 8))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm
    val wf = graft.SparkEntry.queries("q_mean")(spark, sfDir)
    wf.select(xxhash64(wf.columns.map(c => col(c).cast("string")): _*).cast("double").as("h")).agg(avg("h"), count(lit(1))).collect()
    val listener = new org.apache.spark.scheduler.SparkListener {
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(js.jobId, System.nanoTime())
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = Option(starts.get(je.jobId)).getOrElse(0L)
        println(f"[jobprobe] job=${je.jobId} sec=${(System.nanoTime() - t0)/1e9}%.3f")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val df = graft.SparkEntry.queries(q)(spark, sfDir)
    val tBuild = System.nanoTime()
    df.select(xxhash64(df.columns.map(c => col(c).cast("string")): _*).cast("double").as("h")).agg(avg("h"), count(lit(1))).collect()
    val tEval = System.nanoTime()
    println(f"[jobprobe] build=${(tBuild-t0)/1e9}%.3f eval=${(tEval-tBuild)/1e9}%.3f total=${(tEval-t0)/1e9}%.3f")
    spark.stop()
  }
}
