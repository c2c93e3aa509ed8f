package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import graft.codec.{DeltaOfDelta, Gorilla}

/** Catalyst expressions for the chunk codecs — compression happens inside
  * the projection, so a compressed-tier write is scan -> groupBy(chunk) ->
  * encode -> parquet with no driver involvement. Real doGenCode (r3): a
  * chunk row carries a day-sized series, and the CodegenFallback path
  * materialized (copied) it once per codec column per row.
  */
object CodecKernels {
  def gorillaEncode(a: ArrayData): Array[Byte] = Gorilla.encode(a.toDoubleArray())
  def gorillaDecode(b: Array[Byte]): ArrayData = new GenericArrayData(Gorilla.decode(b))
  def dodEncode(a: ArrayData): Array[Byte] = DeltaOfDelta.encode(a.toLongArray())
  def dodDecode(b: Array[Byte]): ArrayData = new GenericArrayData(DeltaOfDelta.decode(b))
}
case class GorillaEncodeExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.TypeShims.AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = BinaryType
  override def nullSafeEval(input: Any): Any =
    Gorilla.encode(input.asInstanceOf[ArrayData].toDoubleArray())
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CodecKernels.gorillaEncode($c)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class GorillaDecodeExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.TypeShims.AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(Gorilla.decode(input.asInstanceOf[Array[Byte]]))
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CodecKernels.gorillaDecode($c)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class DodEncodeExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.TypeShims.AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = BinaryType
  override def nullSafeEval(input: Any): Any =
    DeltaOfDelta.encode(input.asInstanceOf[ArrayData].toLongArray())
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CodecKernels.dodEncode($c)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class DodDecodeExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.TypeShims.AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(DeltaOfDelta.decode(input.asInstanceOf[Array[Byte]]))
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CodecKernels.dodDecode($c)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
