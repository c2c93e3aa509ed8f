package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FeatureParams
import graft.gen.TokenGen

/** FeatureEngine facade + streaming tier + SQL registration. */
class EngineApiSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val scale: Double = 1.0 / (1 << 24)

  test("FeatureEngine.extract: reference-named wide output + param routing " +
    "+ user-defined feature (feature_extraction.py:447-538 surface)") {
    spark.sparkContext.setLogLevel("ERROR")
    val fx = TokenGen.fixtures(spark).where(col("doc_id").startsWith("data1"))
    val out = FeatureEngine.extract(fx, "tokens",
      selected = Seq("mean", "variance", "quantile", "pow_freq_bands", "spect_slope"),
      funcsParams = Map("quantile__q" -> "0.25,0.75",
        "pow_freq_bands__freq_bands" -> "1,2,3",
        "pow_freq_bands__psd_method" -> "fft"),
      base = FeatureParams(sfreq = 8.0, scale = scale, fmin = 0.0, fmax = 4.0))
    val cols = out.columns.toSeq
    assert(cols.contains("mean__ch0") && cols.contains("variance__ch0"))
    assert(cols.contains("quantile__ch0__0") && cols.contains("quantile__ch0__1"))
    assert(cols.contains("pow_freq_bands__ch0__band0") &&
      cols.contains("pow_freq_bands__ch0__band1"))
    assert(cols.contains("spect_slope__ch0__MSE") && cols.contains("spect_slope__ch0__R2"))
    val r = out.where(col("doc_id") === "data1/ch0").head
    assert(math.abs(r.getAs[Double]("mean__ch0") - (-0.25)) < 1e-9)
    assert(math.abs(r.getAs[Double]("variance__ch0") - 19.0 / 14) < 1e-7)
    assert(math.abs(r.getAs[Double]("quantile__ch0__0") - (-1.0)) < 1e-7)

    // unknown alias -> error (reference _check_funcs semantics)
    val err = intercept[IllegalArgumentException] {
      FeatureEngine.extract(fx, "tokens", Seq("not_a_feature"))
    }
    assert(err.getMessage.contains("not_a_feature"))
    // a user-defined name shadowing a built-in alias -> error
    // (feature_extraction.py:277-292)
    val shadow = intercept[IllegalArgumentException] {
      FeatureEngine.extract(fx, "tokens", Seq("mean"),
        userFuncs = Seq("kurtosis" -> (c => size(c).cast("double"))))
    }
    assert(shadow.getMessage.contains("kurtosis"))
    // a malformed / typo'd funcs_params key -> error (sklearn set_params
    // contract), instead of silently ignoring the routed param
    val typo = intercept[IllegalArgumentException] {
      FeatureEngine.extract(fx, "tokens", Seq("quantile"),
        funcsParams = Map("quantile__qq" -> "0.5"))
    }
    assert(typo.getMessage.contains("quantile__qq"))
    // a valid suffix routed to a feature that never reads it -> error
    // (the silent-no-op case: mean takes no q param)
    val wrongAlias = intercept[IllegalArgumentException] {
      FeatureEngine.extract(fx, "tokens", Seq("mean"),
        funcsParams = Map("mean__q" -> "0.9"))
    }
    assert(wrongAlias.getMessage.contains("mean__q"))

    // user-defined feature function
    val udfOut = FeatureEngine.extract(fx, "tokens", Seq("mean"),
      base = FeatureParams(scale = scale),
      userFuncs = Seq("n_higher_than_mean" -> (c =>
        size(filter(c, t => t.cast("double") * scale >
          aggregate(c, lit(0.0), (a, x) => a + x.cast("double") * scale) / size(c))))))
    assert(udfOut.columns.contains("n_higher_than_mean__ch0"))
  }

  test("FeatureEngine.extractMulti: ch_names presentation over multi-channel " +
    "epochs (feature_extraction.py:234-241)") {
    spark.sparkContext.setLogLevel("ERROR")
    // two channels per epoch row, custom presented names
    val fx = TokenGen.fixtures(spark)
    val two = fx.where(col("doc_id") === "data1/ch0")
      .select(lit(1L).as("epoch_id"), col("tokens").as("sigA"))
      .crossJoin(fx.where(col("doc_id") === "data1/ch1")
        .select(col("tokens").as("sigB")))
    val out = FeatureEngine.extractMulti(two,
      channels = Seq("sigA" -> "Fz", "sigB" -> "Cz"),
      selected = Seq("mean", "quantile"),
      funcsParams = Map("quantile__q" -> "0.25,0.75"),
      base = FeatureParams(sfreq = 8.0, scale = scale),
      keep = Seq("epoch_id"))
    // alias-major then channel (reference MultiIndex order), renamed chans
    assert(out.columns.toSeq == Seq("epoch_id",
      "mean__Fz", "mean__Cz",
      "quantile__Fz__0", "quantile__Fz__1",
      "quantile__Cz__0", "quantile__Cz__1"))
    val r = out.head
    assert(math.abs(r.getAs[Double]("mean__Fz") - (-0.25)) < 1e-9)
    // per-channel values match single-channel extract
    val single = FeatureEngine.extract(
      two.select(col("epoch_id").as("doc_id"), col("sigB").as("tokens")),
      "tokens", Seq("mean"), base = FeatureParams(sfreq = 8.0, scale = scale))
    assert(r.getAs[Double]("mean__Cz") ==
      single.head.getAs[Double]("mean__ch0"))
    // duplicate channel names rejected
    intercept[IllegalArgumentException] {
      FeatureEngine.extractMulti(two, Seq("sigA" -> "x", "sigB" -> "x"),
        Seq("mean"))
    }
  }

  test("SparkEntry.entry flagship returns rows (driver smoke contract)") {
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.contains("hjorth_mobility") && df.columns.contains("spect_entropy"))
  }

  test("SQL registration: graft_* functions usable from spark.sql") {
    graft.functions.registerAll(spark, FeatureParams(scale = scale))
    TokenGen.fixtures(spark).createOrReplaceTempView("tok")
    val r = spark.sql(
      """SELECT doc_id, graft_mean(tokens) AS m, graft_line_length(tokens) AS ll
         FROM tok WHERE doc_id = 'data1/ch0'""").head
    assert(math.abs(r.getDouble(1) - (-0.25)) < 1e-9)
    assert(math.abs(r.getDouble(2) - 10.0 / 7) < 1e-7)
  }

  test("streaming tier equals batch tier on the orderless features") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_stream").toString
    val bulk = TokenGen.bulk(spark, 300, nSources = 3, minLen = 64, maxLen = 256)
    bulk.write.mode("overwrite").parquet(dir)

    val streamed = graft.streaming.StreamingRollup
      .runOnce(spark, dir, "1 hour", "10 minutes", scale, "stream_tier")
      .select("source", "bucket", "n", "mean", "variance", "rms", "ptp_amp")

    val states = graft.engine.TokenRollup.rowStates(spark.read.parquet(dir), scale)
    val batch = graft.engine.TokenRollup.finalizeFeatures(
      graft.engine.TokenRollup.mergeToBuckets(states, "1 hour",
        Seq("event_time", "doc_id")))
      .select(col("source"), col("bucket"), col("n_samples").as("n"),
        col("mean"), col("variance"), col("rms"), col("ptp_amp"))

    val a = streamed.collect().map(r => (r.getString(0), r.get(1).toString) -> r).toMap
    val b = batch.collect().map(r => (r.getString(0), r.get(1).toString) -> r).toMap
    assert(a.keySet == b.keySet && a.nonEmpty)
    a.foreach { case (k, ra) =>
      val rb = b(k)
      for (i <- 2 until 7) {
        val va = ra.get(i).toString.toDouble
        val vb = rb.get(i).toString.toDouble
        assert(math.abs(va - vb) <= 1e-9 * math.max(1.0, math.abs(vb)), s"$k col $i: $va vs $vb")
      }
    }
  }

  test("stateful diff tier == batch cascade for the diff family " +
    "(line_length, Hjorth sums, zero crossings)") {
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("graft_sdiff").toString
    val scale = 1.0 / (1 << 24)
    TokenGen.bulk(spark, 300, nSources = 3, minLen = 64, maxLen = 256)
      .write.mode("overwrite").parquet(dir)

    val streamed = graft.streaming.StreamingRollup
      .runOnceDiff(spark, dir, "1 hour", "10 minutes", scale, "stream_diff")
      .select(col("source"), col("bucketS"),
        (col("sumAbsD") / (col("n") - 1)).as("line_length"),
        col("sumDSq"), col("sumESq"), col("zc"), col("n"))

    val states = graft.engine.TokenRollup.rowStates(spark.read.parquet(dir), scale)
    val batch = graft.engine.TokenRollup.mergeToBuckets(states, "1 hour",
      Seq("event_time", "doc_id"))
      .select(col("source"), unix_timestamp(col("bucket")).as("bucketS"),
        (col("P.sumAbsD") / (col("P.n") - 1)).as("line_length"),
        col("P.sumDSq"), col("P.sumESq"), col("P.zc"), col("P.n").as("n"))

    val a = streamed.collect().map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    val b = batch.collect().map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    assert(a.keySet == b.keySet && a.nonEmpty)
    a.foreach { case (k, ra) =>
      val rb = b(k)
      for (i <- 2 until 5) {
        val va = ra.getDouble(i); val vb = rb.getDouble(i)
        assert(math.abs(va - vb) <= 1e-9 * math.max(1.0, math.abs(vb)),
          s"$k col $i: stream $va vs batch $vb")
      }
      assert(ra.getLong(5) == rb.getLong(5), s"$k zc")
      assert(ra.getLong(6) == rb.getLong(6), s"$k n")
    }
  }

  test("hot-window overflow auto-falls back to the batch cascade: " +
    "combined output equals an all-batch run, overflow actually fired") {
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("graft_sover").toString
    val scale = 1.0 / (1 << 24)
    TokenGen.bulk(spark, 300, nSources = 3, minLen = 64, maxLen = 256)
      .write.mode("overwrite").parquet(dir)
    // maxSegs = 2: windows holding 3+ rows (a solid minority at this density)
    // engage — verify it actually did via a raw flagged run first
    val flagged = graft.streaming.StreamingRollup
      .runOnceDiff(spark, dir, "1 hour", "10 minutes", scale,
        "stream_overflow_raw", maxSegs = 2)
    assert(flagged.where(col("overflow")).count() > 0,
      "test setup: no window overflowed at maxSegs=2")
    assert(flagged.where(!col("overflow")).count() > 0,
      "test setup: every window overflowed; cold path untested")

    val combined = graft.streaming.StreamingRollup
      .runOnceDiffWithBatchFallback(spark, dir, "1 hour", "10 minutes",
        scale, "stream_overflow", maxSegs = 2)
      .select(col("source"), col("bucketS"), col("sumAbsD"), col("sumDSq"),
        col("sumESq"), col("zc"), col("n"), col("rows_in"))
    val states = graft.engine.TokenRollup.rowStates(spark.read.parquet(dir), scale)
    val batch = graft.engine.TokenRollup.mergeToBuckets(states, "1 hour",
      Seq("event_time", "doc_id"))
      .select(col("source"), unix_timestamp(col("bucket")).as("bucketS"),
        col("P.sumAbsD").as("sumAbsD"), col("P.sumDSq").as("sumDSq"),
        col("P.sumESq").as("sumESq"), col("P.zc").as("zc"),
        col("P.n").as("n"), col("rows_in"))
    val a = combined.collect().map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    val b = batch.collect().map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    assert(a.keySet == b.keySet && a.nonEmpty)
    a.foreach { case (k, ra) =>
      val rb = b(k)
      for (i <- 2 until 5) {
        val va = ra.getDouble(i); val vb = rb.getDouble(i)
        assert(math.abs(va - vb) <= 1e-9 * math.max(1.0, math.abs(vb)),
          s"$k col $i: combined $va vs batch $vb")
      }
      assert(ra.getLong(5) == rb.getLong(5), s"$k zc")
      assert(ra.getLong(6) == rb.getLong(6), s"$k n")
      assert(ra.getLong(7) == rb.getLong(7), s"$k rows_in")
    }
  }

  test("StreamingRollup.mergeSorted: order-preserving two-pointer merge " +
    "(ties keep existing-first, strict (ts, docId) key)") {
    import graft.streaming.StreamingDiff.Seg
    def seg(ts: Long, id: String) = Seg(ts, id, 0, 0, 0, 0, 0, 0)
    val a = Vector(seg(1, "a"), seg(3, "b"), seg(3, "c"), seg(9, "z"))
    val b = Vector(seg(0, "x"), seg(3, "bb"), seg(9, "y"), seg(12, "w"))
    val m = graft.streaming.StreamingRollup.mergeSorted(a, b)
    assert(m.map(s => (s.ts, s.docId)) == Vector(
      (0L, "x"), (1L, "a"), (3L, "b"), (3L, "bb"), (3L, "c"),
      (9L, "y"), (9L, "z"), (12L, "w")))
    assert(graft.streaming.StreamingRollup.mergeSorted(Vector.empty, b) == b)
    assert(graft.streaming.StreamingRollup.mergeSorted(a, Vector.empty) == a)
  }

  test("FeatureExtractor estimator lifecycle: fit schema probe, set_params " +
    "re-route, memory caching (feature_extraction.py:304-444 protocol)") {
    spark.sparkContext.setLogLevel("ERROR")
    val fx = TokenGen.fixtures(spark).where(col("doc_id").startsWith("data1"))
    val est = new FeatureExtractor(
      selectedFuncs = Seq("mean", "quantile"),
      base = FeatureParams(sfreq = 8.0, scale = scale))
    // unfitted estimator refuses feature names, like sklearn
    intercept[IllegalStateException](est.featureNamesOut)
    est.fit(fx)
    assert(est.featureNamesOut == Seq("mean__ch0", "quantile__ch0"))
    val out1 = est.transform(fx)
    assert(out1.columns.toSeq == "doc_id" +: est.featureNamesOut)
    // set_params re-route (GridSearchCV contract): widths change with the
    // routed quantile list, and the stale fit is invalidated
    est.setParams(Map("quantile__q" -> "0.25,0.5,0.75"))
    intercept[IllegalStateException](est.featureNamesOut)
    val out2 = est.fitTransform(fx)
    assert(est.featureNamesOut == Seq("mean__ch0", "quantile__ch0__0",
      "quantile__ch0__1", "quantile__ch0__2"))
    assert(out2.columns.length == 5)
    // memory: second transform on the same input reads the cached parquet
    val dir = java.nio.file.Files.createTempDirectory("fe_mem").toString
    val cached = new FeatureExtractor(
      selectedFuncs = Seq("mean", "variance"),
      base = FeatureParams(sfreq = 8.0, scale = scale),
      memory = Some(dir))
    val a = cached.fitTransform(fx).collect()
    val entries1 = new java.io.File(dir).listFiles().length
    val b = cached.transform(fx).collect()
    val entries2 = new java.io.File(dir).listFiles().length
    assert(entries1 == 1 && entries2 == 1, "one cache entry, reused")
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
    // a different input plan misses the cache instead of aliasing it
    cached.transform(fx.limit(1)).collect()
    assert(new java.io.File(dir).listFiles().length == 2)
  }
}
