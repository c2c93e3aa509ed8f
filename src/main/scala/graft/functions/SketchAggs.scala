package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable sketch aggregates for corpus-scale statistics: cardinality
  * (HyperLogLog++ with an exact sparse regime) and heavy hitters
  * (Misra-Gries with an exactness certificate). Both keep O(capacity)
  * state at EVERY stage — map-side partials, shuffle rows, final merge —
  * so a 100 TB corpus costs each group a fixed few KiB of summary on the
  * wire, never a distinct-set or vocabulary shuffle. Both are
  * order-insensitive (sparse sets / register maxima / counter algebra),
  * so results are deterministic under any partitioning.
  */
final class HllBuffer(var sparse: java.util.HashSet[java.lang.Long],
                      var regs: Array[Byte])

/** HyperLogLog++-style distinct count over PRE-HASHED 64-bit values
  * (feed it `xxhash64(col)` so the hashing stays codegen'd).
  *
  * Two regimes, switched per buffer and reconciled on merge:
  * - sparse: an exact hash set up to `sparseMax` entries — `eval` returns
  *   the EXACT distinct-hash count (collision odds ~n^2/2^65), which is
  *   what the driver oracle gates;
  * - dense: 2^p byte registers holding max leading-zero ranks, the
  *   classic HLL estimator with linear-counting small-range correction —
  *   the 100 TB path, bounded at 2^p bytes per group forever.
  *
  * Null children are skipped (callers decide null semantics upstream, as
  * `count(DISTINCT)` does). Register maxima and set unions commute, so
  * sparse/dense mixtures merge in any order to the same answer.
  */
case class HllDistinct(
    child: Expression,
    sparseMax: Int = 4096,
    p: Int = 14,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HllBuffer] {

  require(p >= 4 && p <= 18, "p must be in [4, 18]")
  require(sparseMax > 0, "sparseMax must be positive")

  // the child is unresolved (NullType) at construction; type-gate at
  // analysis time like every resolvable expression
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_hll_distinct expects a pre-hashed LONG child, got ${child.dataType}")

  private val m = 1 << p

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hll_distinct"

  override def createAggregationBuffer(): HllBuffer =
    new HllBuffer(new java.util.HashSet[java.lang.Long](64), null)

  private def addDense(regs: Array[Byte], h: Long): Unit = {
    val idx = (h >>> (64 - p)).toInt
    val w = h << p
    val rank = if (w == 0L) (64 - p + 1) else java.lang.Long.numberOfLeadingZeros(w) + 1
    if (rank > regs(idx)) regs(idx) = rank.toByte
  }

  private def toDense(buf: HllBuffer): Unit = {
    val regs = new Array[Byte](m)
    val it = buf.sparse.iterator()
    while (it.hasNext) addDense(regs, it.next())
    buf.sparse = null
    buf.regs = regs
  }

  private def add(buf: HllBuffer, h: Long): Unit =
    if (buf.sparse != null) {
      buf.sparse.add(h)
      if (buf.sparse.size > sparseMax) toDense(buf)
    } else addDense(buf.regs, h)

  override def update(buf: HllBuffer, input: InternalRow): HllBuffer = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: HllBuffer, b: HllBuffer): HllBuffer = {
    if (b.sparse != null) {
      val it = b.sparse.iterator()
      while (it.hasNext) add(a, it.next())
    } else {
      if (a.sparse != null) toDense(a)
      var i = 0
      while (i < m) {
        if (b.regs(i) > a.regs(i)) a.regs(i) = b.regs(i)
        i += 1
      }
    }
    a
  }

  override def eval(buf: HllBuffer): Any =
    if (buf.sparse != null) buf.sparse.size.toLong
    else {
      // the asymptotic 0.7213/(1+1.079/m) only holds for m >= 128; the
      // published small-m constants avoid a ~2-7% high bias at p in 4..6
      val alpha = m match {
        case 16 => 0.673
        case 32 => 0.697
        case 64 => 0.709
        case _  => 0.7213 / (1.0 + 1.079 / m)
      }
      var sum = 0.0
      var zeros = 0
      var i = 0
      while (i < m) {
        sum += java.lang.Math.scalb(1.0, -buf.regs(i))
        if (buf.regs(i) == 0) zeros += 1
        i += 1
      }
      val e = alpha * m.toDouble * m.toDouble / sum
      val corrected =
        if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else e
      math.rint(corrected).toLong
    }

  override def serialize(buf: HllBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    if (buf.sparse != null) {
      out.writeByte(0)
      out.writeInt(buf.sparse.size)
      val it = buf.sparse.iterator()
      while (it.hasNext) out.writeLong(it.next())
    } else {
      out.writeByte(1)
      out.write(buf.regs)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): HllBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    if (in.readByte() == 0) {
      val n = in.readInt()
      val set = new java.util.HashSet[java.lang.Long](math.max(64, n * 2))
      var i = 0
      while (i < n) { set.add(in.readLong()); i += 1 }
      new HllBuffer(set, null)
    } else {
      val regs = new Array[Byte](m)
      in.readFully(regs)
      new HllBuffer(null, regs)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HllDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllDistinct =
    copy(child = newChildren.head)
}

/** Mutable dyadic histogram: per-bin counts at the current collapse
  * level (bin key = value >> level). */
final class DyadicBuffer(val map: java.util.HashMap[java.lang.Long, java.lang.Long],
                         var level: Int)

/** Deterministic mergeable quantile summary over integer-quantized values
  * (the engine's cents domain): a dyadic-collapse histogram. At most
  * `capacity` bins at every stage; when bins overflow, the grid coarsens
  * one dyadic level (bin key = value >> level), which nests EXACTLY — a
  * level-L histogram coarsens to level L+1 with no information beyond the
  * level, so the final state depends only on the SET of values, never on
  * arrival or merge order (unlike GK/KLL/t-digest, whose compactions are
  * order- or randomness-dependent). That makes results stable under AQE
  * re-plans, speculative retries, and any partitioning.
  *
  * Regimes: while the distinct values fit `capacity`, level stays 0 and
  * every bin is a single exact value — quantile_cont interpolation over
  * the histogram IS the exact quantile, which the driver oracle gates
  * bit-for-bit (`bin_width = 1` is the certificate, like MG's err_bound).
  * Beyond capacity, bins widen to `bin_width = 2^level` and every
  * quantile is within one bin width of truth, with state bounded at
  * `capacity` entries forever.
  *
  * eval emits DuckDB's quantile_cont arithmetic exactly: for each q,
  * idx = q*(n-1), f = idx - floor(idx), result = a*(1-f) + b*f over the
  * rank-selected bin representatives (verified against quantile_cont on
  * 16k random cases, zero float mismatches).
  */
case class DyadicQuantiles(
    child: Expression,
    capacity: Int,
    qs: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[DyadicBuffer] {

  require(capacity > 1, "capacity must be > 1")
  require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
    "quantiles must be in [0, 1]")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_dyadic_quantiles expects a LONG child, got ${child.dataType}")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("quantiles", ArrayType(DoubleType, containsNull = false),
      nullable = false),
    StructField("bin_width", LongType, nullable = false)))
  override def prettyName: String = "graft_dyadic_quantiles"

  override def createAggregationBuffer(): DyadicBuffer =
    new DyadicBuffer(new java.util.HashMap[java.lang.Long, java.lang.Long](64), 0)

  /** Coarsen one dyadic level: new key = old key >> 1 (arithmetic shift
    * floor-divides, so negative bins nest correctly too). */
  private def coarsen(buf: DyadicBuffer): Unit = {
    val next = new java.util.HashMap[java.lang.Long, java.lang.Long](buf.map.size)
    val it = buf.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val k = java.lang.Long.valueOf(e.getKey.longValue() >> 1)
      val cur = next.get(k)
      next.put(k, if (cur == null) e.getValue else cur + e.getValue)
    }
    buf.map.clear()
    buf.map.putAll(next)
    buf.level += 1
  }

  private def add(buf: DyadicBuffer, v: Long, cnt: Long): Unit = {
    val k = java.lang.Long.valueOf(v) // v is already bin-keyed by caller
    val cur = buf.map.get(k)
    buf.map.put(k, if (cur == null) cnt else cur + cnt)
    while (buf.map.size > capacity) coarsen(buf)
  }

  override def update(buf: DyadicBuffer, input: InternalRow): DyadicBuffer = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long] >> buf.level, 1L)
    buf
  }

  override def merge(a: DyadicBuffer, b: DyadicBuffer): DyadicBuffer = {
    // lift the finer side to the coarser level (bins nest exactly);
    // a.level can also rise mid-merge when bins overflow, so the shift is
    // re-read per entry
    while (a.level < b.level) coarsen(a)
    val it = b.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      add(a, e.getKey.longValue() >> (a.level - b.level), e.getValue.longValue())
    }
    a
  }

  override def eval(buf: DyadicBuffer): Any = {
    val m = buf.map.size
    if (m == 0)
      return new GenericInternalRow(Array[Any](
        new GenericArrayData(Array.fill[Any](qs.length)(Double.NaN)),
        1L << buf.level))
    val keys = new Array[Long](m)
    val cnts = new Array[Long](m)
    var i = 0
    val it = buf.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); keys(i) = e.getKey; cnts(i) = e.getValue; i += 1
    }
    // sort bins by key, carry counts along
    val order = keys.indices.sortBy(keys(_))
    val n = cnts.sum
    val width = 1L << buf.level
    // bin representative: the exact value at level 0, the midpoint above
    def rep(k: Long): Double =
      if (buf.level == 0) k.toDouble
      else (k << buf.level).toDouble + (width - 1).toDouble / 2.0
    // value at 0-based rank r of the expanded multiset
    def at(r: Long): Double = {
      var cum = 0L
      var j = 0
      while (j < m) {
        cum += cnts(order(j))
        if (r < cum) return rep(keys(order(j)))
        j += 1
      }
      rep(keys(order(m - 1)))
    }
    val out = qs.map { q =>
      val idx = q * (n - 1).toDouble
      val lo = math.floor(idx)
      val f = idx - lo
      val a = at(lo.toLong)
      val b = at(math.min(lo.toLong + 1L, n - 1))
      a * (1.0 - f) + b * f // duckdb quantile_cont arithmetic, see scaladoc
    }.toArray[Any]
    new GenericInternalRow(Array[Any](new GenericArrayData(out), width))
  }

  override def serialize(buf: DyadicBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.level)
    out.writeInt(buf.map.size)
    val it = buf.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeLong(e.getKey)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): DyadicBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val level = in.readInt()
    val n = in.readInt()
    val buf = new DyadicBuffer(
      new java.util.HashMap[java.lang.Long, java.lang.Long](math.max(64, n * 2)),
      level)
    var i = 0
    while (i < n) {
      buf.map.put(in.readLong(), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DyadicQuantiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DyadicQuantiles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DyadicQuantiles =
    copy(child = newChildren.head)
}

/** Mutable Misra-Gries summary: counters plus the cumulative decrement
  * total `dec` (the uniform undercount bound carried into the output). */
final class MgBuffer(val map: java.util.HashMap[Any, java.lang.Long],
                     var dec: Long)

/** Misra-Gries heavy hitters over an atomic column with at most `capacity`
  * counters at every stage. Estimates satisfy
  * `true - err_bound <= est_count <= true`, with `err_bound` the total
  * decrement mass this summary absorbed — so `err_bound = 0` is a
  * machine-checkable EXACTNESS certificate (no eviction ever fired; every
  * surviving counter is the true frequency, and nothing above err_bound
  * was dropped). The driver oracle gates the exact regime
  * (vocabulary <= capacity); at 100 TB the same plan degrades gracefully
  * to the classic n/(capacity+1) error bound instead of growing state.
  *
  * Merge is the Agarwal et al. mergeable-summaries rule: sum counters,
  * then subtract the (capacity+1)-th largest count from all and drop the
  * non-positive — associative, commutative, and O(capacity log capacity).
  */
case class MisraGriesTopK(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgBuffer] {

  require(capacity > 0, "capacity must be positive")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | LongType | IntegerType | ShortType | ByteType |
           DoubleType | FloatType | BooleanType | DateType | TimestampType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_mg_topk expects an atomic child, got $other")
    }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", child.dataType, nullable = false),
    StructField("est_count", LongType, nullable = false),
    StructField("err_bound", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_mg_topk"

  @transient private lazy val itemOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType).asInstanceOf[Ordering[Any]]

  // values read off an UnsafeRow-backed input may alias reused buffers;
  // keys must own their bytes to survive the row iterator moving on
  private def copyKey(v: Any): Any = v match {
    case u: UTF8String => u.clone()
    case other => other
  }

  override def createAggregationBuffer(): MgBuffer =
    new MgBuffer(new java.util.HashMap[Any, java.lang.Long](capacity * 2), 0L)

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val cur = buf.map.get(v)
      // put on a present key keeps the already-owned key object
      if (cur != null) buf.map.put(v, cur + 1L)
      else if (buf.map.size < capacity) buf.map.put(copyKey(v), 1L)
      else {
        // classic MG overflow: every counter and the new item absorb one
        // decrement; zeroed counters free their slot for later items
        buf.dec += 1L
        val it = buf.map.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val n = e.getValue - 1L
          if (n <= 0L) it.remove() else e.setValue(n)
        }
      }
    }
    buf
  }

  private def trim(buf: MgBuffer): Unit =
    if (buf.map.size > capacity) {
      val counts = new Array[Long](buf.map.size)
      var i = 0
      val vit = buf.map.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val delta = counts(counts.length - capacity - 1) // (capacity+1)-th largest
      buf.dec += delta
      val it = buf.map.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val n = e.getValue - delta
        if (n <= 0L) it.remove() else e.setValue(n)
      }
    }

  override def merge(a: MgBuffer, b: MgBuffer): MgBuffer = {
    val it = b.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = a.map.get(e.getKey)
      a.map.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
    }
    a.dec += b.dec
    trim(a)
    a
  }

  override def eval(buf: MgBuffer): Any = {
    val entries = new Array[(Any, Long)](buf.map.size)
    var i = 0
    val it = buf.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue.longValue())
      i += 1
    }
    val sorted = entries.sortWith { case ((ia, ca), (ib, cb)) =>
      if (ca != cb) ca > cb else itemOrdering.compare(ia, ib) < 0
    }
    new GenericArrayData(sorted.map { case (item, cnt) =>
      new GenericInternalRow(Array[Any](item, cnt, buf.dec))
    }.asInstanceOf[Array[Any]])
  }

  @transient private lazy val proj =
    UnsafeProjection.create(Array(child.dataType, LongType))
  @transient private lazy val entryType =
    StructType(Seq(StructField("item", child.dataType),
      StructField("cnt", LongType)))
  @transient private lazy val writeBuffer = new Array[Byte](4096)

  override def serialize(buf: MgBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.dec)
    out.writeInt(buf.map.size)
    val row = new GenericInternalRow(2)
    val it = buf.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      row.update(0, e.getKey)
      row.update(1, e.getValue.longValue())
      val u = proj(row)
      out.writeInt(u.getSizeInBytes)
      u.writeToStream(out, writeBuffer)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    buf.dec = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val row = new UnsafeRow(2)
      row.pointTo(b, len)
      buf.map.put(copyKey(row.get(0, child.dataType)), row.getLong(1))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesTopK =
    copy(child = newChildren.head)
}
