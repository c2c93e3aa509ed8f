package graft.codec

/** Gorilla XOR float compression (Pelkonen et al., "Gorilla: A Fast,
  * Scalable, In-Memory Time Series Database", VLDB 2015, §4.1.2) —
  * hand-built from the published scheme:
  *
  * - first value: raw 64 bits
  * - next values: XOR with predecessor;
  *   - 0            -> control bit '0'
  *   - fits in the predecessor's meaningful-bit window
  *                  -> '10' + meaningful bits (reusing prev lead/len)
  *   - otherwise    -> '11' + 5-bit leading-zero count + 6-bit length
  *                     (64 encoded as 0) + meaningful bits
  *
  * Encodes NaN / ±0 / ±Inf faithfully (pure bit transport). Header: 32-bit
  * count.
  */
object Gorilla {

  def encode(values: Array[Double]): Array[Byte] = {
    val w = new BitWriter(values.length + 16)
    w.writeBits(values.length.toLong, 32)
    if (values.isEmpty) return w.toBytes
    var prev = java.lang.Double.doubleToRawLongBits(values(0))
    w.writeBits(prev, 64)
    var prevLead = -1
    var prevLen = 0
    var i = 1
    while (i < values.length) {
      val cur = java.lang.Double.doubleToRawLongBits(values(i))
      val x = cur ^ prev
      if (x == 0L) {
        w.writeBit(false)
      } else {
        w.writeBit(true)
        val lead0 = java.lang.Long.numberOfLeadingZeros(x)
        val trail = java.lang.Long.numberOfTrailingZeros(x)
        val lead = math.min(lead0, 31) // 5-bit field
        val len = 64 - lead - trail
        if (prevLead >= 0 && lead >= prevLead && (64 - prevLead - prevLen) <= trail) {
          // inside previous window
          w.writeBit(false)
          w.writeBits(x >>> (64 - prevLead - prevLen), prevLen)
        } else {
          w.writeBit(true)
          w.writeBits(lead.toLong, 5)
          w.writeBits(if (len == 64) 0L else len.toLong, 6)
          w.writeBits(x >>> trail, len)
          prevLead = lead
          prevLen = len
        }
      }
      prev = cur
      i += 1
    }
    w.toBytes
  }

  def decode(bytes: Array[Byte]): Array[Double] = {
    val r = new BitReader(bytes)
    val n = r.readBits(32).toInt
    val out = new Array[Double](n)
    if (n == 0) return out
    var prev = r.readBits(64)
    out(0) = java.lang.Double.longBitsToDouble(prev)
    var lead = 0
    var len = 0
    var i = 1
    while (i < n) {
      if (!r.readBit()) {
        out(i) = java.lang.Double.longBitsToDouble(prev)
      } else {
        if (r.readBit()) {
          lead = r.readBits(5).toInt
          len = r.readBits(6).toInt
          if (len == 0) len = 64
        }
        val bits = r.readBits(len)
        val x = bits << (64 - lead - len)
        prev = prev ^ x
        out(i) = java.lang.Double.longBitsToDouble(prev)
      }
      i += 1
    }
    out
  }
}

/** Delta-of-delta timestamp codec (Gorilla §4.1.1, generalized ranges):
  * header = 32-bit count + raw 64-bit first timestamp; then first delta as
  * DoD against 0. Buckets:
  *   '0'                    dod == 0
  *   '10'   + 7 bits        dod in [-63, 64]
  *   '110'  + 9 bits        dod in [-255, 256]
  *   '1110' + 12 bits       dod in [-2047, 2048]
  *   '1111' + 64 bits       anything else (full range, unlike the paper's
  *                          32 bits — our buckets can be arbitrary epochs)
  * Values stored zigzag-free as (dod + bias) like the paper.
  */
object DeltaOfDelta {

  def encode(ts: Array[Long]): Array[Byte] = {
    val w = new BitWriter(ts.length * 2 + 16)
    w.writeBits(ts.length.toLong, 32)
    if (ts.isEmpty) return w.toBytes
    w.writeBits(ts(0), 64)
    var prev = ts(0)
    var prevDelta = 0L
    var i = 1
    while (i < ts.length) {
      val delta = ts(i) - prev
      val dod = delta - prevDelta
      if (dod == 0L) w.writeBit(false)
      else if (dod >= -63 && dod <= 64) {
        w.writeBits(0x2L, 2) // '10'
        w.writeBits(dod + 63, 7)
      } else if (dod >= -255 && dod <= 256) {
        w.writeBits(0x6L, 3) // '110'
        w.writeBits(dod + 255, 9)
      } else if (dod >= -2047 && dod <= 2048) {
        w.writeBits(0xeL, 4) // '1110'
        w.writeBits(dod + 2047, 12)
      } else {
        w.writeBits(0xfL, 4) // '1111'
        w.writeBits(dod, 64)
      }
      prev = ts(i)
      prevDelta = delta
      i += 1
    }
    w.toBytes
  }

  def decode(bytes: Array[Byte]): Array[Long] = {
    val r = new BitReader(bytes)
    val n = r.readBits(32).toInt
    val out = new Array[Long](n)
    if (n == 0) return out
    out(0) = r.readBits(64)
    var prev = out(0)
    var prevDelta = 0L
    var i = 1
    while (i < n) {
      val dod =
        if (!r.readBit()) 0L
        else if (!r.readBit()) r.readBits(7) - 63
        else if (!r.readBit()) r.readBits(9) - 255
        else if (!r.readBit()) r.readBits(12) - 2047
        else r.readBits(64)
      val delta = prevDelta + dod
      prev += delta
      out(i) = prev
      prevDelta = delta
      i += 1
    }
    out
  }
}
