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

  test("MediaCodecs: exact decodes on hand-built fixtures + roundtrips") {
    import graft.operators.MediaCodecs._
    // PGM: 2x2, pixels 0,64,128,255 -> mean 111.75
    val pgm = encodePgm(2, 2, Array(0, 64, 128, 255))
    val img = decodeNetpbm(pgm)
    assert(img.width == 2 && img.height == 2 && img.channels == 1)
    assert(img.pixels.toSeq == Seq(0, 64, 128, 255))
    assert(math.abs(img.meanPixel - 111.75) < 1e-12)
    // comments + arbitrary whitespace in header parse correctly
    val withComment = ("P5\n# a comment\n 2  2 \n255\n").getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3, 4)
    assert(decodeNetpbm(withComment).pixels.toSeq == Seq(1, 2, 3, 4))
    // BMP: 3x2 RGB roundtrip (exercises bottom-up rows + padding)
    val rgb = Array.tabulate(3 * 2 * 3)(i => (i * 17) % 256)
    val bmp = encodeBmp24(3, 2, rgb)
    val back = decodeBmp24(bmp)
    assert(back.width == 3 && back.height == 2 && back.pixels.toSeq == rgb.toSeq)
    // WAV: PCM16 roundtrip incl. negative samples
    val samples = Array[Short](0, 1000, -1000, 32767, -32768, 5)
    val wav = encodeWavPcm16(16000, 1, samples)
    val au = decodeWavPcm16(wav)
    assert(au.sampleRate == 16000 && au.channels == 1)
    assert(au.samples.toSeq == samples.toSeq)
    // resize: nearest-neighbour 2x2 -> 4x4 replicates quadrant pixels
    val up = resizeNearest(Image(2, 2, 1, Array(10, 20, 30, 40)), 4, 4)
    assert(up.pixels.toSeq == Seq(10, 10, 20, 20, 10, 10, 20, 20,
      30, 30, 40, 40, 30, 30, 40, 40))
    // malformed payloads throw with informative messages
    intercept[IllegalArgumentException](decodeNetpbm("P5\n2 2\n255\nXY".getBytes))
    intercept[IllegalArgumentException](decodeWavPcm16(wav.take(30)))
  }

  test("real decode path: magic dispatch, fallback flag, audio -> kernels") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = MultimodalOps.synthCorpus(spark, 150)
    val feats = MultimodalOps.extractFeatures(corpus).collect()
    val byKind = feats.groupBy(_.kind)
    // images (real PGM) and audio (real WAV) decode; raw video falls back
    assert(byKind("image").forall(f => f.decoded && f.dec_width > 0 &&
      f.dec_height > 0))
    assert(byKind("audio").forall(f => f.decoded && f.dec_sample_rate >= 8000))
    assert(byKind("video").forall(f => !f.decoded))
    // decoded image brightness equals meanPixel/255 of the ORIGINAL pixels
    val m0 = corpus.filter(_.kind == "image").head()
    val img0 = graft.operators.MediaCodecs.decodeNetpbm(m0.bytes)
    val f0 = feats.find(_.media_id == m0.media_id).get
    assert(math.abs(f0.brightness - img0.meanPixel / 255.0) < 1e-12)
    // decoded audio feeds the univariate kernels end to end
    val sig = MultimodalOps.audioSignals(corpus)
    assert(sig.count() == byKind("audio").length)
    val ent = sig.select(col("media_id"),
      graft.functions.feature("spect_entropy", col("signal"),
        graft.functions.FeatureParams(sfreq = 16000.0)).as("e"))
      .where(col("e").isNotNull)
    assert(ent.count() == sig.count())
    // a 440 Hz tone has LOW spectral entropy vs white noise
    assert(ent.agg(avg("e")).head.getDouble(0) < 5.0)
  }

  test("poison payloads degrade to the fallback row, never fail the job " +
    "(crafted magic bytes driving decoder index/alloc paths)") {
    import spark.implicits._
    import graft.operators.MultimodalOps.Media
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    // BMP with a hugely negative data offset (defeated the Int bound)
    val badBmp = {
      val b = new Array[Byte](60)
      b(0) = 'B'; b(1) = 'M'
      System.arraycopy(le32(-1000000000), 0, b, 10, 4)
      System.arraycopy(le32(2), 0, b, 18, 4)  // w
      System.arraycopy(le32(2), 0, b, 22, 4)  // h
      b(28) = 24                              // bpp
      b
    }
    // WAV whose first chunk declares a near-Int.Max size (Int wrap)
    val badWav = {
      val b = new Array[Byte](64)
      "RIFF".getBytes.copyToArray(b, 0)
      "WAVE".getBytes.copyToArray(b, 8)
      "junk".getBytes.copyToArray(b, 12)
      System.arraycopy(le32(0x7ffffff0), 0, b, 16, 4)
      b
    }
    // netpbm whose header dims multiply past Int.MaxValue
    val badPgm = "P5\n65536 32768\n255\n".getBytes ++ Array.fill(8)(1.toByte)
    // empty payload (division guard in the fallback stub)
    val rows = Seq(
      Media(1L, "image", badBmp, -1, -1, -1, "s"),
      Media(2L, "audio", badWav, -1, -1, -1, "s"),
      Media(3L, "image", badPgm, -1, -1, -1, "s"),
      Media(4L, "image", Array.empty[Byte], -1, -1, -1, "s")).toDS()
    val out = graft.operators.MultimodalOps.extractFeatures(rows).collect()
    assert(out.length == 4)
    out.foreach { f =>
      assert(!f.decoded, s"media ${f.media_id} must fall back")
      assert(!f.brightness.isNaN, s"media ${f.media_id} brightness NaN")
    }
  }
}
