package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import graft.codec.{DeltaOfDelta, Gorilla}

/** Catalyst expressions for the chunk codecs — compression happens inside
  * the projection, so a compressed-tier write is scan -> groupBy(chunk) ->
  * encode -> parquet with no driver involvement.
  */
case class GorillaEncodeExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[org.apache.spark.sql.graft.TypeShims.AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = BinaryType
  override def nullSafeEval(input: Any): Any =
    Gorilla.encode(input.asInstanceOf[ArrayData].toDoubleArray())
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class GorillaDecodeExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[org.apache.spark.sql.graft.TypeShims.AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(Gorilla.decode(input.asInstanceOf[Array[Byte]]))
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class DodEncodeExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[org.apache.spark.sql.graft.TypeShims.AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = BinaryType
  override def nullSafeEval(input: Any): Any =
    DeltaOfDelta.encode(input.asInstanceOf[ArrayData].toLongArray())
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class DodDecodeExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[org.apache.spark.sql.graft.TypeShims.AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(DeltaOfDelta.decode(input.asInstanceOf[Array[Byte]]))
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
