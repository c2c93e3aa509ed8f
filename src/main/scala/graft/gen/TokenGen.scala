package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SplitMix64 PRNG (public-domain algorithm, Steele et al. 2014) — the
  * deterministic seed stream for all synthetic data. Gaussian via
  * Box-Muller (no ziggurat, fully reproducible).
  */
final class SplitMix64(seed: Long) extends Serializable {
  private var state = seed
  private var spare: Double = Double.NaN

  def nextLong(): Long = {
    state += 0x9e3779b97f4a7c15L
    var z = state
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Uniform in [0, 1). */
  def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16

  def nextGaussian(): Double = {
    if (!spare.isNaN) { val v = spare; spare = Double.NaN; return v }
    var u1 = nextDouble()
    while (u1 == 0.0) u1 = nextDouble()
    val u2 = nextDouble()
    val r = math.sqrt(-2.0 * math.log(u1))
    spare = r * math.sin(2 * math.Pi * u2)
    r * math.cos(2 * math.Pi * u2)
  }

  def nextInt(bound: Int): Int = ((nextLong() >>> 1) % bound).toInt
}

/** Deterministic synthetic token-sequence corpus (FIXTURES.md §4) matching
  * the north-rule input shape: (doc_id string, tokens array<int32>,
  * n_tok int32, source string) + derived event_time. No external data;
  * seed 42 throughout.
  *
  * Quantization convention (FIXTURES.md §2): token = round(x * 2^24), so
  * integer-valued reference fixtures are exact and continuous signals carry
  * error <= 2^-25 (below the reference's own 1e-7 oracle bar).
  */
object TokenGen {
  val Scale: Double = math.pow(2, 24)
  val T0Micros: Long = 1704067200000000L // 2024-01-01T00:00:00Z

  final case class Doc(doc_id: String, tokens: Array[Int], n_tok: Int,
                       source: String, event_time: java.sql.Timestamp)

  def quantize(x: Array[Double]): Array[Int] =
    x.map(v => math.round(v * Scale).toInt)

  def dequantize(t: Array[Int]): Array[Double] = t.map(_ / Scale)

  /** Zipf-ish truncated length draw in [minLen, maxLen], s=1.2 — long-doc
    * skew knob for the salting/benchmark story. */
  def zipfLen(rng: SplitMix64, minLen: Int, maxLen: Int): Int = {
    val s = 1.2
    val u = rng.nextDouble()
    // inverse-CDF of a continuous truncated Pareto with exponent s
    val a = math.pow(minLen.toDouble, 1 - s)
    val b = math.pow(maxLen.toDouble, 1 - s)
    math.pow(a + u * (b - a), 1.0 / (1 - s)).toInt.max(minLen).min(maxLen)
  }

  /** Bulk corpus: nDocs rows over nSources sources, event_time spread over
    * 3 days with every 7th minute empty (deliberate gaps for LOCF tests).
    */
  def bulk(spark: SparkSession, nDocs: Int, nSources: Int = 16,
           minLen: Int = 64, maxLen: Int = 4096, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val threeDaysMin = 3 * 24 * 60
    val docs = spark.sparkContext.parallelize(0 until nDocs,
        math.max(spark.sparkContext.defaultParallelism, 1))
      .map { i =>
        val rng = new SplitMix64(seed ^ (i.toLong * 0x9E3779B97F4A7C15L))
        val src = s"s${rng.nextInt(nSources)}"
        val n = zipfLen(rng, minLen, maxLen)
        val toks = new Array[Int](n)
        var k = 0
        while (k < n) { toks(k) = math.round(rng.nextGaussian() * Scale).toInt; k += 1 }
        // minute slot in [0, 3 days), skipping every 7th minute (gap)
        var minute = rng.nextInt(threeDaysMin)
        if (minute % 7 == 0) minute += 1
        val sec = rng.nextInt(60)
        val ts = new java.sql.Timestamp((T0Micros / 1000) + (minute.toLong * 60 + sec) * 1000)
        Doc(f"bulk/$src/$i%08d", toks, n, src, ts)
      }
    docs.toDF()
  }

  /** Parity fixtures (FIXTURES.md §3) as token rows. */
  def fixtures(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = scala.collection.mutable.ArrayBuffer.empty[Doc]
    def add(id: String, x: Array[Double], src: String, minuteOffset: Int): Unit =
      rows += Doc(id, quantize(x), x.length, src,
        new java.sql.Timestamp(T0Micros / 1000 + minuteOffset.toLong * 60000))
    add("data1/ch0", Array(0, 0, 2, -2, 0, -1, -1, 0), "fixtures", 0)
    add("data1/ch1", Array(1, 1, -1, -1, 0, 1, 1, 0), "fixtures", 1)
    add("samp1/ch0", Array(1, -1, 1, -1, 0, 1, -1, 1), "fixtures", 2)
    add("zeros_tail/ch0", Array(0, 0, 0, 0, 0, 0, 0.1), "fixtures", 3)
    val sin20 = Array.tabulate(20)(i => math.sin(4 * 2 * math.Pi * i / 19.0))
    add("sin20/ch0", sin20, "fixtures", 4)
    val dataSin = Array.tabulate(512) { k =>
      val tp = 2 * math.Pi * k / 512.0
      0.1 * math.sin(5 * tp) + 0.05 * math.sin(33 * tp)
    }
    add("sin512/ch0", dataSin, "fixtures", 5)
    val rng = new SplitMix64(42L)
    for (ch <- 0 until 20)
      add(s"data2/ch$ch", Array.fill(512)(rng.nextGaussian()), "noise", 6 + ch)
    rows.toSeq.toDF()
  }
}
