package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Single-pass embedding kernels. The interpreted alternative (stacked
  * `aggregate(zip_with(...))` higher-order functions) walks the vector once
  * per accumulator with per-element lambda dispatch; these walk it once
  * total, which matters when the operator is the hot inner loop of an
  * all-pairs or LSH candidate join.
  */

/** Cosine similarity of two double arrays. Accumulation is sequential
  * left-to-right per accumulator — bit-identical to DuckDB's
  * list_cosine_similarity and to the zip_with/aggregate formulation it
  * replaces. */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.TypeShims.AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSimExpr.kernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  // real doGenCode: both ArrayData children flow straight into the static
  // kernel — no per-row InternalRow wrap, no boxing of the double result.
  // This expression is the inner loop of the ANN broadcast join and the
  // LSH candidate verify.
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.CosineSimExpr.kernel($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object CosineSimExpr {
  /** Static single-pass cosine kernel (sequential accumulation — see class
    * doc for the bit-exactness contract). */
  def kernel(a: ArrayData, b: ArrayData): Double = {
    val x = a.toDoubleArray()
    val y = b.toDoubleArray()
    val n = math.min(x.length, y.length)
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      dot += x(i) * y(i)
      nx += x(i) * x(i)
      ny += y(i) * y(i)
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }
}

/** Symmetric int8 quantization of a double vector: scale = max|x|/127,
  * elements floor(x/scale + 0.5), kept as exact small integers in doubles
  * so downstream cosine arithmetic stays bit-mirrorable in SQL. Returns
  * null for zero vectors (scale 0) — they drop out of ranking like the
  * float path's zero-norm NaN filter. One pass for the scale, one for the
  * elements; the Column-HOF formulation of the same arithmetic re-inlines
  * the scale subexpression into the lambda, recomputing the O(dim)
  * array_max PER ELEMENT (measured ~3x the whole query's runtime). */
case class QuantizeInt8Expr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.TypeShims.AbstractDataType] =
    Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_quantize_int8"

  override def nullSafeEval(a: Any): Any =
    QuantizeInt8Expr.kernel(a.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.QuantizeInt8Expr.kernel($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

object QuantizeInt8Expr {
  /** Static kernel: null for the zero vector, else the quantized copy. */
  def kernel(a: ArrayData): ArrayData = {
    val x = a.toDoubleArray()
    var mx = 0.0
    var i = 0
    while (i < x.length) {
      val ab = math.abs(x(i))
      if (ab > mx) mx = ab
      i += 1
    }
    val s = mx / 127.0
    if (s == 0.0) return null
    val q = new Array[Double](x.length)
    i = 0
    while (i < x.length) {
      q(i) = math.floor(x(i) / s + 0.5)
      i += 1
    }
    new GenericArrayData(q)
  }
}

/** Random-hyperplane LSH band signatures: for each band b, an integer whose
  * bit j is sign(v . plane[b*bitsPerBand + j]). One pass over the planes,
  * vector loaded once. Planes are constructor constants so the expression
  * canonicalizes (equal seeds => equal plans => subexpression elimination).
  */
case class HyperplaneBandSigExpr(child: Expression,
                                 planes: Seq[Seq[Double]],
                                 bitsPerBand: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.TypeShims.AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hyperplane_bands"

  @transient private lazy val planeArr: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  // instance kernel (the planes are constructor state), called straight
  // from generated code with the child ArrayData
  def kernel(input: ArrayData): ArrayData = nullSafeEval(input).asInstanceOf[ArrayData]

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftHyperplanes", this,
      classOf[HyperplaneBandSigExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.kernel($c)")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData].toDoubleArray()
    val nBands = planeArr.length / bitsPerBand
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var sig = 0L
      var j = 0
      while (j < bitsPerBand) {
        val p = planeArr(b * bitsPerBand + j)
        var dot = 0.0
        var i = 0
        val n = math.min(v.length, p.length)
        while (i < n) { dot += v(i) * p(i); i += 1 }
        if (dot > 0) sig |= (1L << j)
        j += 1
      }
      out(b) = sig
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
