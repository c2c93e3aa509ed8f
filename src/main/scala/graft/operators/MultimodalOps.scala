package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.gen.SplitMix64

/** Multimodal columns for the training-data pipeline: image/audio/video
  * payloads as opaque `binary` columns with typed metadata, processed in
  * partition-sized batches.
  *
  * The Spark-side plumbing — schema, partitioning, batch iteration shape
  * (the JVM analogue of `mapInPandas`: one iterator of rows per
  * partition, constant memory) — is real and tested. The codec kernels
  * themselves are STUBBED with deterministic byte-level stand-ins
  * (`???`-grade: no image/audio libraries exist in this container); swap
  * `decodeStub` for a real decoder binding without touching the plan.
  */
object MultimodalOps {

  final case class Media(media_id: Long, kind: String, bytes: Array[Byte],
                         width: Int, height: Int, sample_rate: Int,
                         source: String)

  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                                 checksum: Long, brightness: Double,
                                 n_frames: Int, source: String)

  /** Deterministic synthetic media corpus (no external data). */
  def synthCorpus(spark: SparkSession, n: Int, seed: Long = 42L): Dataset[Media] = {
    import spark.implicits._
    spark.sparkContext.parallelize(0 until n,
        math.max(spark.sparkContext.defaultParallelism, 1))
      .map { i =>
        val rng = new SplitMix64(seed ^ i.toLong)
        val kind = Seq("image", "audio", "video")(rng.nextInt(3))
        val len = 256 + rng.nextInt(4096)
        val bytes = new Array[Byte](len)
        var k = 0
        while (k < len) { bytes(k) = (rng.nextLong() & 0xff).toByte; k += 1 }
        Media(i.toLong, kind, bytes, 32 + rng.nextInt(224), 32 + rng.nextInt(224),
          8000 + rng.nextInt(40000), s"m${rng.nextInt(8)}")
      }.toDS()
  }

  /** STUB decode kernel: a real build replaces this with the image/audio
    * codec call. Deterministic over bytes so tests are exact. */
  private def decodeStub(bytes: Array[Byte]): (Long, Double) = {
    var h = 0xcbf29ce484222325L
    var s = 0L
    var i = 0
    while (i < bytes.length) {
      h ^= bytes(i) & 0xffL
      h *= 0x100000001b3L
      s += bytes(i) & 0xff
      i += 1
    }
    (h, s.toDouble / bytes.length / 255.0) // (content hash, mean "brightness")
  }

  /** Batch feature extraction: per-partition iterator transform (the
    * mapInPandas batch shape — no per-row task overhead, constant
    * memory, schema declared up front). */
  def extractFeatures(media: Dataset[Media]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val (checksum, brightness) = decodeStub(m.bytes)
        val nFrames = m.kind match {
          case "video" => math.max(m.bytes.length / 512, 1)
          case "audio" => math.max(m.bytes.length / 64, 1)
          case _ => 1
        }
        MediaFeatures(m.media_id, m.kind, m.bytes.length, checksum,
          brightness, nFrames, m.source)
      }
    }
  }

  /** Frame sampling: every `stride`-th fixed-size frame slice of the
    * payload — real byte-range plumbing (explode of computed offsets),
    * decode of each frame left to the stubbed kernel. */
  def sampleFrames(media: DataFrame, frameBytes: Int = 512,
                   stride: Int = 4): DataFrame = {
    media
      .withColumn("n_frames",
        greatest((length(col("bytes")) / frameBytes).cast("int"), lit(1)))
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .withColumn("frame",
        expr(s"substring(bytes, frame_idx * $frameBytes + 1, $frameBytes)"))
      .select(col("media_id"), col("kind"), col("frame_idx"), col("frame"),
        col("source"))
  }

  /** Resize stub for images: metadata transform (target dims) + payload
    * passthrough — the plan-level shape of a real resize. */
  def resizeMeta(media: DataFrame, w: Int, h: Int): DataFrame =
    media.where(col("kind") === "image")
      .withColumn("width", lit(w))
      .withColumn("height", lit(h))
}
