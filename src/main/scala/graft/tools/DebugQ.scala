package graft
import org.apache.spark.sql.SparkSession
object DebugQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.find(_.startsWith("/")).getOrElse("/root/testdata/sf0.01")
    args.filterNot(_.startsWith("/")).foreach { q =>
      try {
        val df = SparkEntry.queries(q)(spark, dir)
        println(s"[debug] $q rows=${df.count()}")
        df.show(5, false)
      } catch { case e: Throwable =>
        println(s"[debug] $q FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
        e.printStackTrace()
      }
    }
    spark.stop()
  }
}
