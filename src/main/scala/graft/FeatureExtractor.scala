package graft

import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.FeatureParams

/** sklearn-estimator-style facade over [[FeatureEngine]] — the reference's
  * `FeatureExtractor(BaseEstimator, TransformerMixin)` protocol
  * (reference feature_extraction.py:304-444) re-expressed Spark-first:
  *
  *  - `fit` performs the reference's "first epoch only" schema probe
  *    (feature_extraction.py:399-409): it resolves the DYNAMIC output
  *    schema (feature widths depend on routed params) and records the
  *    feature names. Spark needs no data pass for this — the plan's
  *    schema is static — but the probe still builds the plan against a
  *    one-row slice of X so invalid alias/param combinations fail in
  *    `fit`, like the reference.
  *  - `transform` extracts features for every epoch row; with `memory`
  *    set, results are cached under a key derived from the estimator
  *    config and the input plan (the joblib.Memory contract,
  *    feature_extraction.py:427-433: a second `transform` on the same
  *    input does not recompute) as a committed parquet directory.
  *  - `setParams` replaces the routed `alias__param` map and invalidates
  *    the fitted schema — the `GridSearchCV.set_params` re-route
  *    (feature_extraction.py:440-444, which replaces `self.params`).
  *
  * The heavy lifting (alias validation, param routing, dynamic naming,
  * user-defined funcs) stays in [[FeatureEngine]]; this class only adds
  * the estimator lifecycle.
  */
final class FeatureExtractor(
    val selectedFuncs: Seq[String],
    val base: FeatureParams = FeatureParams(),
    initialParams: Map[String, String] = Map.empty,
    val channels: Seq[(String, String)] = Seq("tokens" -> "ch0"),
    val keep: Seq[String] = Seq("doc_id"),
    val userFuncs: Seq[(String, Column => Column)] = Nil,
    val memory: Option[String] = None) {

  private var routedParams: Map[String, String] = initialParams
  private var fittedNames: Option[Seq[String]] = None

  def params: Map[String, String] = routedParams

  /** The `set_params` contract: replace the routed params wholesale (the
    * reference sets `self.params = params`) and drop the fitted schema —
    * a refit is required before `featureNamesOut`. Returns this (chained
    * calls, sklearn style). */
  def setParams(p: Map[String, String]): this.type = {
    routedParams = p
    fittedNames = None
    this
  }

  private def plan(df: DataFrame): DataFrame =
    FeatureEngine.extractMulti(df, channels, selectedFuncs, routedParams,
      base, keep, userFuncs)

  /** Schema probe on a one-row slice (reference `X[:1]` trick). */
  def fit(df: DataFrame): this.type = {
    fittedNames =
      Some(plan(df.limit(1)).schema.fieldNames.toSeq.filterNot(keep.contains))
    this
  }

  /** Fitted feature names (reference `get_feature_names_out`). */
  def featureNamesOut: Seq[String] = fittedNames.getOrElse(
    throw new IllegalStateException("FeatureExtractor is not fitted"))

  /** Extract features for every row of X; cached when `memory` is set.
    * Like the reference's `transform` (feature_extraction.py:421-433),
    * this does not require a prior `fit` — only `featureNamesOut` does. */
  def transform(df: DataFrame): DataFrame = {
    val out = plan(df)
    memory match {
      case None => out
      case Some(dir) =>
        // joblib.Memory analogue: key on the CANONICALIZED OUTPUT plan
        // (what the reference gets by hashing extract_features' args:
        // same logical input AND same extraction config => same key; no
        // data pass). The output plan embeds the input plan, the routed
        // params, and the user-defined funcs' actual column expressions —
        // keying on input + func NAMES alone let two different lambdas
        // under one name collide. toJSON, not toString: plan toString
        // truncates field lists at spark.sql.debug.maxToStringFields.
        val planKey = {
          val p = out.queryExecution.logical.canonicalized
          try p.toJSON catch { case _: Throwable => p.treeString }
        }
        val cfg = (selectedFuncs, routedParams.toSeq.sorted, channels, keep,
          base.toString, planKey).toString
        val key = java.security.MessageDigest.getInstance("MD5")
          .digest(cfg.getBytes("UTF-8")).map("%02x".format(_)).mkString
        val spark = df.sparkSession
        // hit-check through the Hadoop FS layer, not java.io.File — the
        // memory dir may be on any filesystem Spark can write to
        val success = new org.apache.hadoop.fs.Path(s"$dir/$key", "_SUCCESS")
        val fs = success.getFileSystem(spark.sessionState.newHadoopConf())
        if (!fs.exists(success)) {
          out.write.mode("overwrite").parquet(s"$dir/$key")
        }
        spark.read.parquet(s"$dir/$key")
    }
  }

  def fitTransform(df: DataFrame): DataFrame = fit(df).transform(df)
}
