package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{feature, FeatureParams}

/** The engine's `extract_features` analogue (reference
  * feature_extraction.py:447-538): select feature aliases, route
  * `alias__param` config, get one wide row per epoch with
  * reference-compatible flattened column names
  * `<alias>__<ch>[__<suffix>]` (the two-level MultiIndex of
  * `_format_as_dataframe`, feature_extraction.py:174-206, joined on "__";
  * channel renaming per ch_names, feature_extraction.py:234-241).
  *
  * User-defined feature functions (the reference's UDF surface,
  * feature_extraction.py:277-292) are accepted as (name, Column => Column).
  */
object FeatureEngine {

  /** Parse the reference's `alias__param` namespace into per-alias params. */
  def resolveParams(alias: String, base: FeatureParams,
                    conf: Map[String, String]): FeatureParams = {
    def p(name: String): Option[String] = conf.get(s"${alias}__$name")
    var out = base
    p("q").foreach(v => out = out.copy(qs = v.split(",").map(_.trim.toDouble).toSeq))
    p("kmax").foreach(v => out = out.copy(kmax = v.toInt))
    // alias-scoped, so setting both fields is safe: svd features read
    // svdEmb, app/samp entropy read emb
    p("emb").foreach(v => out = out.copy(emb = v.toInt, svdEmb = v.toInt))
    p("tau").foreach(v => out = out.copy(tau = v.toInt))
    p("threshold").foreach(v => out = out.copy(threshold = v.toDouble))
    p("freq_bands").foreach(v =>
      out = out.copy(bandEdges = v.split(",").map(_.trim.toDouble).toSeq, bandPairs = Nil))
    p("edge").foreach(v => out = out.copy(edges = v.split(",").map(_.trim.toDouble).toSeq))
    p("normalize").foreach(v => out = out.copy(normalize = v.toBoolean))
    p("ratios").foreach(v => out = out.copy(ratios = Some(v)))
    p("ratios_triu").foreach(v => out = out.copy(ratiosTriu = v.toBoolean))
    p("psd_method").foreach(v => out = out.copy(psdMethod = v))
    p("log").foreach(v => out = out.copy(logOut = v.toBoolean))
    p("fmin").foreach(v => out = out.copy(fmin = v.toDouble))
    p("fmax").foreach(v => out = out.copy(fmax = v.toDouble))
    p("ref_freq").foreach(v => out = out.copy(refFreq = v.toDouble))
    p("deriv_filt").foreach(v => out = out.copy(derivFilt = v.toBoolean))
    p("welch_n_fft").foreach(v => out = out.copy(welchNFft = v.toInt))
    p("welch_n_per_seg").foreach(v => out = out.copy(welchNPerSeg = v.toInt))
    p("welch_n_overlap").foreach(v => out = out.copy(welchNOverlap = v.toInt))
    p("epoch_len").foreach(v => out = out.copy(epochLen = v.toInt))
    p("mt_bandwidth").foreach(v => out = out.copy(mtHalfNbw = v.toDouble))
    p("mt_low_bias").foreach(v => out = out.copy(mtLowBias = v.toBoolean))
    p("mt_adaptive").foreach(v => out = out.copy(mtAdaptive = v.toBoolean))
    out
  }

  /** Output column names per alias, reproducing the reference
    * get_feature_names hooks (widths depend on params — dynamic schema). */
  def featureNames(alias: String, p: FeatureParams, ch: String): Seq[String] =
    alias match {
      case "quantile" =>
        if (p.qs.size == 1) Seq(s"${alias}__$ch")
        else p.qs.indices.map(i => s"${alias}__${ch}__$i")
      case "pow_freq_bands" =>
        val nb = p.bands.length
        val bandNames = (0 until nb).map(i => s"band$i")
        val powNames = bandNames.map(b => s"${alias}__${ch}__$b")
        val ratioNames = graft.core.Features.idxPairs(nb, p.ratiosTriu)
          .map { case (i, j) => s"${alias}__${ch}__${bandNames(i)}/${bandNames(j)}" }
        p.ratios match {
          case None => powNames
          case Some("only") => ratioNames.toSeq
          case _ => powNames ++ ratioNames
        }
      case "energy_freq_bands" =>
        p.bands.indices.map(i => s"${alias}__${ch}__band$i")
      case "spect_slope" =>
        Seq("intercept", "slope", "MSE", "R2").map(s => s"${alias}__${ch}__$s")
      case "spect_edge_freq" =>
        if (p.edges.size == 1) Seq(s"${alias}__$ch")
        else p.edges.indices.map(i => s"${alias}__${ch}__$i")
      // wavelet-family widths follow the decomposition depth for the
      // DECLARED epoch length (p.epochLen) — not a hard-coded n>=448
      // assumption; epochs shorter than declared yield NULL tail columns.
      case "wavelet_coef_energy" =>
        (0 until graft.core.Dwt.refLevel(p.epochLen))
          .map(i => s"${alias}__${ch}__$i")
      case "teager_kaiser_energy" =>
        (0 to graft.core.Dwt.refLevel(p.epochLen))
          .flatMap(i => Seq("mean", "std").map(s => s"${alias}__${ch}__${i}_$s"))
      case _ => Seq(s"${alias}__$ch")
    }

  /** Param suffixes resolveParams understands — one entry per `p(...)`
    * probe above. */
  private val KnownParamSuffixes: Set[String] = Set(
    "q", "kmax", "emb", "tau", "threshold", "freq_bands", "edge",
    "normalize", "ratios", "ratios_triu", "psd_method", "log", "fmin",
    "fmax", "ref_freq", "deriv_filt", "welch_n_fft", "welch_n_per_seg",
    "welch_n_overlap", "epoch_len", "mt_bandwidth", "mt_low_bias",
    "mt_adaptive")

  private val PsdSuffixes: Set[String] = Set("psd_method", "welch_n_fft",
    "welch_n_per_seg", "welch_n_overlap", "mt_bandwidth", "mt_low_bias",
    "mt_adaptive")

  /** Which suffixes each alias actually CONSUMES (mirrors the reference
    * feature functions' signatures) — routing a valid suffix to a feature
    * that never reads it is the silent-no-op the sklearn `set_params`
    * contract rejects (e.g. `mean__q`). Aliases not listed here take no
    * optional params. */
  private val AliasParamSuffixes: Map[String, Set[String]] = Map(
    "quantile" -> Set("q"),
    "higuchi_fd" -> Set("kmax"),
    "app_entropy" -> Set("emb"),
    "samp_entropy" -> Set("emb"),
    "svd_entropy" -> Set("tau", "emb"),
    "svd_fisher_info" -> Set("tau", "emb"),
    "zero_crossings" -> Set("threshold"),
    "pow_freq_bands" -> (Set("freq_bands", "normalize", "ratios",
      "ratios_triu", "log") ++ PsdSuffixes),
    "spect_edge_freq" -> (Set("ref_freq", "edge") ++ PsdSuffixes),
    "spect_entropy" -> PsdSuffixes,
    "spect_slope" -> (Set("fmin", "fmax") ++ PsdSuffixes),
    "hjorth_mobility_spect" -> (Set("normalize") ++ PsdSuffixes),
    "hjorth_complexity_spect" -> (Set("normalize") ++ PsdSuffixes),
    "energy_freq_bands" -> Set("freq_bands", "deriv_filt"),
    "wavelet_coef_energy" -> Set("epoch_len"),
    "teager_kaiser_energy" -> Set("epoch_len"))

  private def validate(selected: Seq[String],
                       funcsParams: Map[String, String] = Map(),
                       userFuncs: Seq[(String, Column => Column)] = Nil): Unit = {
    val known = graft.functions.FeatureCatalog.all.keySet
    val bad = selected.filterNot(known.contains)
    require(bad.isEmpty,
      s"unknown feature alias(es): ${bad.mkString(", ")} — valid: ${known.toSeq.sorted.mkString(", ")}")
    // the reference raises when a user-defined feature name shadows a
    // built-in alias (feature_extraction.py:277-292)
    val shadowed = userFuncs.map(_._1).filter(known.contains)
    require(shadowed.isEmpty,
      s"user-defined feature name(s) collide with built-in aliases: ${shadowed.mkString(", ")}")
    // funcs_params routing errors loudly on malformed/unknown keys AND on
    // valid suffixes routed to a feature that never reads them (the
    // reference's sklearn set_params contract): both would otherwise be
    // silently ignored
    funcsParams.keys.foreach { k =>
      val i = k.indexOf("__")
      require(i > 0 && known.contains(k.substring(0, i)) &&
        KnownParamSuffixes.contains(k.substring(i + 2)),
        s"malformed or unknown funcs_params key '$k' — expected <alias>__<param> " +
          s"with a catalog alias and a known param suffix")
      val (alias, suffix) = (k.substring(0, i), k.substring(i + 2))
      require(AliasParamSuffixes.getOrElse(alias, Set.empty).contains(suffix),
        s"funcs_params key '$k' routes param '$suffix' to '$alias', which " +
          s"does not take it — accepted: ${AliasParamSuffixes.getOrElse(alias, Set.empty).toSeq.sorted.mkString(", ")}")
    }
  }

  private def aliasCols(alias: String, tokensCol: String, chName: String,
                        base: FeatureParams,
                        funcsParams: Map[String, String]): Seq[Column] = {
    val p = resolveParams(alias, base, funcsParams)
    val names = featureNames(alias, p, chName)
    val c = feature(alias, col(tokensCol), p)
    if (names.size == 1) Seq(c.as(names.head))
    else names.zipWithIndex.map { case (nm, i) => element_at(c, i + 1).as(nm) }
  }

  /** Extract selected features as a wide DataFrame (one row per epoch). */
  def extract(df: DataFrame, tokensCol: String, selected: Seq[String],
              funcsParams: Map[String, String] = Map(),
              base: FeatureParams = FeatureParams(),
              chName: String = "ch0",
              keep: Seq[String] = Seq("doc_id"),
              userFuncs: Seq[(String, Column => Column)] = Nil): DataFrame = {
    validate(selected, funcsParams, userFuncs)
    val cols = selected.flatMap(aliasCols(_, tokensCol, chName, base, funcsParams)) ++
      userFuncs.map { case (nm, fn) => fn(col(tokensCol)).as(s"${nm}__$chName") }
    df.select((keep.map(col) ++ cols): _*)
  }

  /** Multi-channel extract — the reference's `ch_names` presentation
    * surface (feature_extraction.py:234-241): one signal column per
    * channel, output columns `<alias>__<chName>[__suffix]` alias-major
    * then channel (the reference's MultiIndex column order). `channels`
    * maps signal column name -> presented channel name (the rename the
    * reference applies via the `ch\\d+` regex). All channels share
    * `base`/`funcsParams` routing, exactly like the reference's
    * per-feature (not per-channel) params. */
  def extractMulti(df: DataFrame, channels: Seq[(String, String)],
                   selected: Seq[String],
                   funcsParams: Map[String, String] = Map(),
                   base: FeatureParams = FeatureParams(),
                   keep: Seq[String] = Seq("doc_id"),
                   userFuncs: Seq[(String, Column => Column)] = Nil): DataFrame = {
    validate(selected, funcsParams, userFuncs)
    require(channels.nonEmpty, "at least one channel required")
    require(channels.map(_._2).distinct.size == channels.size,
      s"channel names must be distinct: ${channels.map(_._2).mkString(", ")}")
    val cols = selected.flatMap { alias =>
      channels.flatMap { case (sigCol, chName) =>
        aliasCols(alias, sigCol, chName, base, funcsParams)
      }
    } ++ userFuncs.flatMap { case (nm, fn) =>
      channels.map { case (sigCol, chName) => fn(col(sigCol)).as(s"${nm}__$chName") }
    }
    df.select((keep.map(col) ++ cols): _*)
  }
}
