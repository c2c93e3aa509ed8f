package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.gen.SplitMix64

/** Single-pass signature kernels for the dedup family. One JVM loop per
  * row instead of K stacked array-HOF passes — the difference between an
  * interpreted 64-pass plan and a tight O(K * n) kernel. All kernels have
  * real doGenCode (static call on the child value — no per-row InternalRow
  * materialization, r3): these are the inner loops of the shingle/minhash
  * scan over every document.
  */
case class MinHashExpr(child: Expression, k: Int = 64)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.TypeShims.AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any =
    MinHashExpr.kernel(input.asInstanceOf[ArrayData], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashExpr.kernel($c, $k)")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object MinHashExpr {
  val Prime: Long = 2147483647L // 2^31-1: a*h stays under 2^62
  val K = 64
  private[functions] val (coefA, coefB) = {
    val rng = new SplitMix64(42L)
    val a = Array.fill(K)((math.abs(rng.nextLong()) % (Prime - 1)) + 1)
    val b = Array.fill(K)(math.abs(rng.nextLong()) % Prime)
    (a, b)
  }

  def kernel(input: ArrayData, k: Int): ArrayData = {
    val sh = input.toLongArray()
    val out = Array.fill(k)(Long.MaxValue)
    val a = coefA
    val b = coefB
    val p = Prime
    var i = 0
    while (i < sh.length) {
      val h = ((sh(i) % p) + p) % p
      var j = 0
      while (j < k) {
        val v = (a(j) * h + b(j)) % p
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Word n-gram shingle hashes of a text column in one pass: lowercase,
  * whitespace-split, rolling window of n words, 64-bit FNV-1a over the
  * joined gram; distinct + sorted for set semantics. Replaces an
  * interpreted transform(sequence)+hash(concat_ws(slice)) pipeline that
  * re-walked the word array per gram. */
case class ShinglesExpr(child: Expression, n: Int = 3)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.TypeShims.AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any =
    ShinglesExpr.kernel(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShinglesExpr.kernel($c, $n)")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object ShinglesExpr {
  def fnv(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var j = 0
    while (j < s.length) { h ^= s.charAt(j).toLong; h *= 0x100000001b3L; j += 1 }
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
    h
  }

  def kernel(input: UTF8String, n: Int): ArrayData = {
    val text = input.toString.toLowerCase.trim
    val words = text.split("\\s+").filter(_.nonEmpty)
    val m = math.max(words.length - n + 1, 0)
    val out = new Array[Long](math.max(m, if (words.nonEmpty) 1 else 0))
    if (words.nonEmpty && m == 0) {
      out(0) = fnv(words.mkString(" "))
    } else {
      var i = 0
      while (i < m) {
        val sb = new java.lang.StringBuilder
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(words(i + k))
          k += 1
        }
        out(i) = fnv(sb.toString)
        i += 1
      }
    }
    val distinct = out.distinct
    java.util.Arrays.sort(distinct)
    new GenericArrayData(distinct)
  }
}

/** Polynomial rolling-hash document fingerprint over whitespace tokens:
  * h = (h * B + fnv(word) mod P) mod P with B=131, P=2147483629 (31-bit
  * prime — every intermediate fits int64, and the DuckDB oracle replicates
  * the arithmetic exactly). One pass per row. */
case class FingerprintExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.TypeShims.AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fingerprint"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      FingerprintExpr.kernel(input.asInstanceOf[UTF8String]))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FingerprintExpr.kernel($c)")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object FingerprintExpr {
  val P: Long = 2147483629L // prime < 2^31
  val B: Long = 131L

  def kernel(input: UTF8String): Long = {
    val text = input.toString.trim
    var h = 0L
    var start = 0
    val n = text.length
    var i = 0
    while (i <= n) {
      if (i == n || Character.isWhitespace(text.charAt(i))) {
        if (i > start) {
          var wh = 0xcbf29ce484222325L // FNV-1a 64 over the word
          var j = start
          while (j < i) { wh ^= text.charAt(j).toLong; wh *= 0x100000001b3L; j += 1 }
          wh ^= wh >>> 33; wh *= 0xff51afd7ed558ccdL; wh ^= wh >>> 33
          val wp = ((wh % P) + P) % P
          h = (h * B + wp) % P
        }
        start = i + 1
      }
      i += 1
    }
    h
  }
}

/** 64-bit SimHash over whitespace tokens of a text column, one pass. */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.TypeShims.AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      SimHash64Expr.kernel(input.asInstanceOf[UTF8String]))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64Expr.kernel($c)")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object SimHash64Expr {
  def kernel(input: UTF8String): Long = {
    val text = input.toString.toLowerCase.trim
    val votes = new Array[Int](64)
    var start = 0
    val n = text.length
    var i = 0
    while (i <= n) {
      if (i == n || Character.isWhitespace(text.charAt(i))) {
        if (i > start) {
          var h = 0xcbf29ce484222325L // FNV-1a 64
          var j = start
          while (j < i) { h ^= text.charAt(j).toLong; h *= 0x100000001b3L; j += 1 }
          h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}
