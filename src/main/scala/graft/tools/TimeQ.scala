package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.head
    args.tail.foreach { q =>
      for (rep <- 1 to 3) {
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(q)(spark, dir)
        val cols = df.columns.map(c => col(c).cast("string"))
        df.select(xxhash64(cols: _*).cast("double").as("h")).agg(avg("h")).collect()
        df.count()
        println(f"[timeq] $q rep=$rep sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      }
    }
    spark.stop()
  }
}
