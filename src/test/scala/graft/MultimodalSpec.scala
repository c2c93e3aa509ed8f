package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MultimodalOps

class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("media pipeline: schema, batch extract, determinism, frame sampling") {
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = MultimodalOps.synthCorpus(spark, 200).persist()
    assert(corpus.count() == 200)
    // binary payload column + typed metadata
    val sch = corpus.schema
    assert(sch("bytes").dataType.typeName == "binary")
    assert(sch("sample_rate").dataType.typeName == "integer")

    val feats = MultimodalOps.extractFeatures(corpus)
    val rows = feats.collect()
    assert(rows.length == 200)
    assert(rows.forall(r => r.brightness >= 0.0 && r.brightness <= 1.0))
    // deterministic: second run bit-identical
    val again = MultimodalOps.extractFeatures(MultimodalOps.synthCorpus(spark, 200))
      .collect().map(r => r.media_id -> r.checksum).toMap
    rows.foreach(r => assert(again(r.media_id) == r.checksum))

    // frame sampling: offsets and sizes line up with the payload
    val frames = MultimodalOps.sampleFrames(corpus.toDF(), frameBytes = 512, stride = 4)
    val f = frames.withColumn("flen", length(col("frame")))
    assert(f.where(col("flen") > 512).count() == 0)
    assert(f.where(col("frame_idx") % 4 =!= 0).count() == 0)
    // every media contributes frame 0
    assert(frames.where(col("frame_idx") === 0).select("media_id").distinct.count() == 200)

    val resized = MultimodalOps.resizeMeta(corpus.toDF(), 64, 64)
    assert(resized.where(col("width") =!= 64 || col("height") =!= 64).count() == 0)
  }
}
