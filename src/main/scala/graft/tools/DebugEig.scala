package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DebugEig {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
      .where(col("user_id") === 57)
      .orderBy(col("ts"), col("event_id")).select("value").collect()
      .map(_.getDouble(0))
    println(s"n=${ev.length}")
    val sv = graft.core.Eig.embedSingularValues(ev, 10, 2)
    println("sigma=" + sv.mkString(","))
    println("entropy=" + graft.core.Features.svdEntropy(ev, 2, 10))
    spark.stop()
  }
}
