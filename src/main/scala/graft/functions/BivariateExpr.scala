package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import graft.core.Bivariate

/** Cross-channel features over an epoch's channel set: input is
  * array<struct<ch: anything-sortable-string, sig: array<double>>> (the
  * collect_list of an epoch's channel rows, sorted for determinism);
  * channels are truncated to the common minimum length, matching the
  * reference requirement of a rectangular (n_channels, n_times) epoch.
  */
case class TokenBivariate(child: Expression, feature: String,
                          sfreq: Double = 256.0, includeDiag: Boolean = false)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = s"graft_biv_$feature"

  override def nullSafeEval(input: Any): Any = {
    val rows = input.asInstanceOf[ArrayData]
    val n = rows.numElements()
    if (n < 2) return null
    val sigs = new Array[Array[Double]](n)
    var minLen = Int.MaxValue
    var i = 0
    while (i < n) {
      val row = rows.getStruct(i, 2)
      val arr = row.getArray(1).toDoubleArray()
      sigs(i) = arr
      if (arr.length < minLen) minLen = arr.length
      i += 1
    }
    if (minLen < 8) return null
    val chans = sigs.map(s => java.util.Arrays.copyOf(s, minLen))
    val out = feature match {
      case "time_corr" => Bivariate.timeCorr(chans, withEigenvalues = true, includeDiag)
      case "spect_corr" => Bivariate.spectCorr(chans, sfreq, withEigenvalues = true, includeDiag)
      case "phase_lock_val" => Bivariate.phaseLockVal(chans, includeDiag)
      case "max_cross_corr" => Bivariate.maxCrossCorr(chans, sfreq, includeDiag)
      case "nonlin_interdep" => Bivariate.nonlinInterdep(chans, includeDiag = includeDiag)
      case other => throw new IllegalArgumentException(s"unknown bivariate '$other'")
    }
    if (out.exists(v => v.isNaN || v.isInfinite)) null
    else new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
