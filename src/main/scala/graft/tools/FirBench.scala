package graft.tools

/** Micro-bench: direct vs FFT overlap-add zero-phase FIR application on a
  * long signal under the longest gate band (0.5-4 Hz @ 256 Hz, 1691
  * taps) — evidence for the scale-path dispatch threshold. */
object FirBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1 << 20)
    val rng = new graft.gen.SplitMix64(5L)
    val x = Array.fill(n)(rng.nextGaussian())
    val h = graft.core.Firwin.designCached(256.0, 0.5, 4.0)
    def time[T](label: String)(f: => T): T = {
      f // warm
      val t0 = System.nanoTime()
      val r = f
      println(f"[firbench] $label n=$n taps=${h.length} sec=${(System.nanoTime() - t0) / 1e9}%.3f")
      r
    }
    val d = time("direct")(graft.core.Firwin.applyZeroPhase(x, h))
    val o = time("overlap-add")(graft.core.Firwin.applyZeroPhaseFft(x, h))
    var worst = 0.0
    for (i <- 0 until n)
      worst = math.max(worst, math.abs(d(i) - o(i)) / math.max(1.0, math.abs(d(i))))
    println(f"[firbench] worst rel diff $worst%.3e")
  }
}
