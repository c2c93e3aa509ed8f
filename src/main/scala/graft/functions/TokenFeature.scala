package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import graft.core.Features

/** Per-feature parameter bundle. One flat case class keeps the Catalyst
  * expression tree canonicalizable (stable equals/hashCode for subexpression
  * elimination). Mirrors the reference's `alias__param` namespace
  * (reference feature_extraction.py:475-479).
  *
  * `scale`: dequantization factor applied to every sample (token / 2^24
  * convention, FIXTURES.md §2); 1.0 for already-float signals.
  */
case class FeatureParams(
    sfreq: Double = 256.0,
    scale: Double = 1.0,
    emb: Int = 2,    // app/samp entropy embedding (reference emb=2 default)
    svdEmb: Int = 10, // SVD-family embedding (reference emb=10 default —
                      // the two families have DIFFERENT reference defaults)
    tau: Int = 2,
    kmax: Int = 10,
    threshold: Double = 2.220446049250313e-16,
    qs: Seq[Double] = Seq(0.75),
    bandEdges: Seq[Double] = Seq(0.5, 4, 8, 13, 30, 100),
    bandPairs: Seq[(Double, Double)] = Nil,
    normalize: Boolean = true,
    ratios: Option[String] = None,
    ratiosTriu: Boolean = false,
    psdMethod: String = "fft",
    logOut: Boolean = false,
    fmin: Double = 0.1,
    fmax: Double = 50.0,
    refFreq: Double = -1.0, // -1 => sfreq / 2 (reference default)
    edges: Seq[Double] = Seq(0.5),
    derivFilt: Boolean = true,
    // welch psd_params (reference utils.py:180-211)
    welchNFft: Int = 256,
    welchNPerSeg: Int = -1, // -1 => n_fft
    welchNOverlap: Int = 0,
    // multitaper knobs (mne psd_array_multitaper: bandwidth=None =>
    // half_nbw 4, low_bias=True, adaptive=False)
    mtHalfNbw: Double = 4.0,
    mtLowBias: Boolean = true,
    mtAdaptive: Boolean = false,
    // declared epoch length: drives the OUTPUT ARITY of the wavelet-family
    // features (decomposition depth = min(floor(log2(n/7)), 6) depends on
    // n). Callers with shorter epochs must declare it or the extra columns
    // come back NULL (element_at past the kernel's actual output).
    epochLen: Int = 1024) {

  def psdConf: graft.core.PsdConf =
    graft.core.PsdConf(psdMethod, welchNFft, welchNPerSeg, welchNOverlap,
      mtHalfNbw, mtLowBias, mtAdaptive)

  def bands: Array[(Double, Double)] =
    if (bandPairs.nonEmpty) bandPairs.toArray
    else bandEdges.sliding(2).map(p => (p(0), p(1))).toArray

  def refFreqOr: Double = if (refFreq < 0) sfreq / 2 else refFreq
}

/** Catalog of the engine's univariate feature operators: alias ->
  * (output arity, kernel dispatch, minimum input length). The alias set
  * and semantics mirror the reference registry built by `compute_*`
  * introspection (reference utils.py:257-314); here it is an explicit map
  * (no reflection), SURVEY.md §2.3.
  */
object FeatureCatalog {
  final case class FeatureDef(
      vector: Boolean,
      minLen: Int,
      eval: (Array[Double], FeatureParams) => Any)

  val all: Map[String, FeatureDef] = Map(
    "mean" -> FeatureDef(vector = false, 1, (x, _) => Features.meanF(x)),
    "variance" -> FeatureDef(vector = false, 2, (x, _) => Features.varianceF(x)),
    "std" -> FeatureDef(vector = false, 2, (x, _) => Features.stdF(x)),
    "ptp_amp" -> FeatureDef(vector = false, 1, (x, _) => Features.ptpAmp(x)),
    "skewness" -> FeatureDef(vector = false, 2, (x, _) => Features.skewness(x)),
    "kurtosis" -> FeatureDef(vector = false, 2, (x, _) => Features.kurtosis(x)),
    "rms" -> FeatureDef(vector = false, 1, (x, _) => Features.rms(x)),
    "quantile" -> FeatureDef(vector = true, 1,
      (x, p) => Features.quantiles(x, p.qs.toArray)),
    "hurst_exp" -> FeatureDef(vector = false, 64, (x, _) => Features.hurstExp(x)),
    "app_entropy" -> FeatureDef(vector = false, 8,
      (x, p) => Features.appEntropy(x, p.emb)),
    "samp_entropy" -> FeatureDef(vector = false, 8,
      (x, p) => Features.sampEntropy(x, p.emb)),
    "decorr_time" -> FeatureDef(vector = false, 4,
      (x, p) => Features.decorrTime(x, p.sfreq)),
    "pow_freq_bands" -> FeatureDef(vector = true, 4,
      (x, p) => Features.powFreqBands(x, p.sfreq, p.bands, p.normalize,
        p.ratios, p.ratiosTriu, p.psdMethod, p.logOut, p.psdConf)),
    "hjorth_mobility_spect" -> FeatureDef(vector = false, 4,
      (x, p) => Features.hjorthMobilitySpect(x, p.sfreq, p.normalize,
        p.psdMethod, p.psdConf)),
    "hjorth_complexity_spect" -> FeatureDef(vector = false, 4,
      (x, p) => Features.hjorthComplexitySpect(x, p.sfreq, p.normalize,
        p.psdMethod, p.psdConf)),
    "hjorth_mobility" -> FeatureDef(vector = false, 2,
      (x, _) => Features.hjorthMobility(x)),
    "hjorth_complexity" -> FeatureDef(vector = false, 3,
      (x, _) => Features.hjorthComplexity(x)),
    "higuchi_fd" -> FeatureDef(vector = false, 32,
      (x, p) => Features.higuchiFd(x, p.kmax)),
    "katz_fd" -> FeatureDef(vector = false, 3, (x, _) => Features.katzFd(x)),
    "zero_crossings" -> FeatureDef(vector = false, 1,
      (x, p) => Features.zeroCrossings(x, p.threshold)),
    "line_length" -> FeatureDef(vector = false, 2,
      (x, _) => Features.lineLength(x)),
    "spect_entropy" -> FeatureDef(vector = false, 4,
      (x, p) => Features.spectEntropy(x, p.sfreq, p.psdMethod, p.psdConf)),
    "svd_entropy" -> FeatureDef(vector = false, 16,
      (x, p) => Features.svdEntropy(x, p.tau, p.svdEmb)),
    "svd_fisher_info" -> FeatureDef(vector = false, 16,
      (x, p) => Features.svdFisherInfo(x, p.tau, p.svdEmb)),
    "spect_slope" -> FeatureDef(vector = true, 8,
      (x, p) => Features.spectSlope(x, p.sfreq, p.fmin, p.fmax, p.psdMethod,
        p.psdConf)),
    "energy_freq_bands" -> FeatureDef(vector = true, 8,
      (x, p) => Features.energyFreqBands(x, p.sfreq, p.bands, p.derivFilt)),
    "spect_edge_freq" -> FeatureDef(vector = true, 4,
      (x, p) => Features.spectEdgeFreq(x, p.sfreq, p.refFreqOr,
        p.edges.toArray, p.psdMethod, p.psdConf)),
    "wavelet_coef_energy" -> FeatureDef(vector = true, 8,
      (x, _) => Features.waveletCoefEnergy(x)),
    "teager_kaiser_energy" -> FeatureDef(vector = true, 16,
      (x, _) => Features.teagerKaiserEnergy(x))
  )

  def apply(name: String): FeatureDef = all.getOrElse(name,
    throw new IllegalArgumentException(
      s"unknown feature '$name'; valid: ${all.keys.toSeq.sorted.mkString(", ")}"))
}

/** Catalyst expression evaluating one univariate feature kernel over a
  * numeric array column (the row's token/signal array).
  *
  * Array-kernel design (SURVEY.md §1.2): the signal stays packed as Spark
  * `ArrayData` inside the row — no explode, no shuffle — so a raw-tier
  * feature pass is a single narrow projection that whole-stage codegen
  * pipelines over the parquet scan. The kernel itself is O(n..n^2) per row,
  * dwarfing the per-row kernel-call overhead.
  *
  * Null semantics: null input, arrays shorter than the kernel's minimum,
  * and non-finite kernel results (e.g. SampEn undefined — the reference
  * raises, univariate.py:546-547) all yield SQL NULL.
  *
  * Codegen: a real doGenCode (r3) — the child ArrayData flows straight
  * into the kernel call. The r2 CodegenFallback materialized an UnsafeRow
  * per row PER FEATURE COLUMN (copying the token array each time) just to
  * call eval(row); at a 5-feature raw-tier projection that was five array
  * copies per row of pure overhead.
  */
case class TokenFeature(child: Expression, feature: String,
                        params: FeatureParams)
    extends UnaryExpression {

  @transient private lazy val fdef = FeatureCatalog(feature)

  override def dataType: DataType =
    if (fdef.vector) ArrayType(DoubleType, containsNull = false)
    else DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = s"graft_$feature"

  @transient private lazy val elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case other => throw new IllegalArgumentException(
      s"graft_$feature expects array<numeric>, got $other")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(et, _) if et.isInstanceOf[NumericType] =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_$feature expects array<numeric>, got $other")
    }

  private def toDoubles(ad: ArrayData): Array[Double] = {
    val s = params.scale
    val out = elemType match {
      case DoubleType => ad.toDoubleArray()
      case IntegerType =>
        val a = ad.toIntArray(); val o = new Array[Double](a.length)
        var i = 0; while (i < a.length) { o(i) = a(i); i += 1 }; o
      case LongType =>
        val a = ad.toLongArray(); val o = new Array[Double](a.length)
        var i = 0; while (i < a.length) { o(i) = a(i).toDouble; i += 1 }; o
      case FloatType =>
        val a = ad.toFloatArray(); val o = new Array[Double](a.length)
        var i = 0; while (i < a.length) { o(i) = a(i).toDouble; i += 1 }; o
      case ShortType =>
        val a = ad.toShortArray(); val o = new Array[Double](a.length)
        var i = 0; while (i < a.length) { o(i) = a(i).toDouble; i += 1 }; o
      case other => throw new IllegalArgumentException(s"unsupported element type $other")
    }
    if (s != 1.0) {
      var i = 0
      while (i < out.length) { out(i) *= s; i += 1 }
    }
    out
  }

  override def nullSafeEval(input: Any): Any = {
    val x = toDoubles(input.asInstanceOf[ArrayData])
    if (x.length < fdef.minLen) return null
    fdef.eval(x, params) match {
      case d: Double => if (java.lang.Double.isFinite(d)) d else null
      case a: Array[Double] => new GenericArrayData(a)
      case other => other
    }
  }

  /** Codegen entry, scalar kernels: NaN encodes SQL NULL (the kernel's
    * null cases are exactly too-short input and non-finite results). */
  def kernelScalar(ad: ArrayData): Double = {
    val x = toDoubles(ad)
    if (x.length < fdef.minLen) return Double.NaN
    val d = fdef.eval(x, params).asInstanceOf[Double]
    if (java.lang.Double.isFinite(d)) d else Double.NaN
  }

  /** Codegen entry, vector kernels: null for too-short input. */
  def kernelArray(ad: ArrayData): ArrayData = {
    val x = toDoubles(ad)
    if (x.length < fdef.minLen) return null
    new GenericArrayData(fdef.eval(x, params).asInstanceOf[Array[Double]])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftFeature", this, classOf[TokenFeature].getName)
    if (fdef.vector) {
      nullSafeCodeGen(ctx, ev, c => {
        s"""
           |${ev.value} = $ref.kernelArray($c);
           |${ev.isNull} = (${ev.value} == null);
         """.stripMargin
      })
    } else {
      nullSafeCodeGen(ctx, ev, c => {
        s"""
           |${ev.value} = $ref.kernelScalar($c);
           |${ev.isNull} = java.lang.Double.isNaN(${ev.value});
         """.stripMargin
      })
    }
  }

  override protected def withNewChildInternal(newChild: Expression): TokenFeature =
    copy(child = newChild)
}
