package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Continuous-aggregate machinery: algebraic partial states as plain
  * columns (mergeable, codegen'd, AQE/salting-friendly), cascading tier
  * merges, and LOCF gap-fill (SURVEY.md §7.3).
  *
  * Design: the partial state for the algebraic feature family is
  * (n, sum, sumsq, min, max) — every built-in Spark aggregate, so the
  * 1m -> 1h -> 1d cascade is a pure partial-merge with no custom UDAF,
  * map-side combine for free, and identical results to a direct
  * aggregation (exactness verified by the driver's DuckDB oracle on
  * q_tier_1h_cascade).
  */
object Rollup {

  /** Tier durations, finest first. */
  val Tiers: Seq[(String, String)] =
    Seq("1m" -> "1 minute", "1h" -> "1 hour", "1d" -> "1 day")

  /** Algebraic partials for one tier from raw scalar samples. */
  def partials(df: DataFrame, keys: Seq[String], ts: String, value: String,
               win: String): DataFrame = {
    val v = col(value)
    df.groupBy((keys.map(col) :+ window(col(ts), win).as("w")): _*)
      .agg(count(v).as("p_n"), sum(v).as("p_sum"),
        sum(v * v).as("p_sumsq"), min(v).as("p_min"), max(v).as("p_max"))
      .withColumn("bucket", col("w.start")).drop("w")
  }

  /** Merge a finer tier's partials up to a coarser window — the cascade
    * step. Input must carry p_n/p_sum/p_sumsq/p_min/p_max + bucket. */
  def merge(finer: DataFrame, keys: Seq[String], win: String): DataFrame =
    finer.groupBy((keys.map(col) :+ window(col("bucket"), win).as("w")): _*)
      .agg(sum("p_n").as("p_n"), sum("p_sum").as("p_sum"),
        sum("p_sumsq").as("p_sumsq"), min("p_min").as("p_min"),
        max("p_max").as("p_max"))
      .withColumn("bucket", col("w.start")).drop("w")

  /** Finalize partials into the feature columns they support. */
  def finalize(partials: DataFrame): DataFrame =
    partials
      .withColumn("mean", col("p_sum") / col("p_n"))
      .withColumn("rms", sqrt(col("p_sumsq") / col("p_n")))

  /** Salted two-stage aggregation of partials: defuses hot keys (a single
    * (source, bucket) receiving a disproportionate share of rows) by
    * pre-aggregating on (keys, bucket, salt) then de-salting. At 10^12 rows
    * this is the difference between one straggler reducer and S-way
    * parallelism per hot bucket; cheap at small scale because stage one
    * already collapses to <= S rows per group.
    */
  def saltedPartials(df: DataFrame, keys: Seq[String], ts: String,
                     value: String, win: String, saltBuckets: Int): DataFrame = {
    val v = col(value)
    // salt from row content (deterministic under task retries)
    val salted = df.withColumn("_salt",
      pmod(hash(col(ts), v), lit(saltBuckets)))
    val stage1 = salted
      .groupBy((keys.map(col) ++ Seq(window(col(ts), win).as("w"), col("_salt"))): _*)
      .agg(count(v).as("p_n"), sum(v).as("p_sum"), sum(v * v).as("p_sumsq"),
        min(v).as("p_min"), max(v).as("p_max"))
    stage1.groupBy((keys.map(col) :+ col("w")): _*)
      .agg(sum("p_n").as("p_n"), sum("p_sum").as("p_sum"),
        sum("p_sumsq").as("p_sumsq"), min("p_min").as("p_min"),
        max("p_max").as("p_max"))
      .withColumn("bucket", col("w.start")).drop("w")
  }

  /** Dense-calendar LOCF gap-fill: explode the per-key [min, max] bucket
    * range at `step`, left-join the sparse rollup, carry the last
    * observation forward. The window scan is per key, ordered by bucket —
    * one shuffle on the key, linear scan after.
    */
  def gapFillLocf(rollup: DataFrame, keys: Seq[String], bucket: String,
                  valueCols: Seq[String], step: String): DataFrame = {
    val joined = denseGrid(rollup, keys, bucket, step)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(bucket))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valueCols.foldLeft(joined) { (df, c) =>
      df.withColumn(s"${c}_locf", last(col(c), ignoreNulls = true).over(w))
    }
    filled.withColumn("filled",
      when(col(valueCols.head).isNull, lit(1)).otherwise(lit(0)))
  }

  /** Dense-calendar LINEAR-interpolation gap-fill: interior gaps
    * interpolate between the surrounding observations (time-weighted);
    * trailing gaps carry the last observation forward (no future point
    * exists); LEADING gaps back-fill from the first observation (no past
    * point exists — reachable for secondary value columns whose first
    * buckets are null even though the grid starts at the key's first
    * observed bucket). Same single-shuffle-per-key shape as LOCF — two
    * ordered window scans instead of one. */
  def gapFillLinear(rollup: DataFrame, keys: Seq[String], bucket: String,
                    valueCols: Seq[String], step: String): DataFrame = {
    val joined = denseGrid(rollup, keys, bucket, step)
      .withColumn("_ts", unix_timestamp(col(bucket)))
    val wp = Window.partitionBy(keys.map(col): _*).orderBy(col(bucket))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wn = Window.partitionBy(keys.map(col): _*).orderBy(col(bucket))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = valueCols.foldLeft(joined) { (df, c) =>
      val pv = last(col(c), ignoreNulls = true).over(wp)
      val pt = last(when(col(c).isNotNull, col("_ts")), ignoreNulls = true).over(wp)
      val nv = first(col(c), ignoreNulls = true).over(wn)
      val nt = first(when(col(c).isNotNull, col("_ts")), ignoreNulls = true).over(wn)
      df.withColumn(s"${c}_lin",
        when(col(c).isNotNull, col(c))
          .when(nv.isNull, pv) // trailing gap: LOCF
          .when(pv.isNull, nv) // leading gap: next-observation back-fill
          .otherwise(pv + (nv - pv) * ((col("_ts") - pt) / (nt - pt))))
    }
    filled.withColumn("filled",
      when(col(valueCols.head).isNull, lit(1)).otherwise(lit(0)))
      .drop("_ts")
  }

  /** Per-key dense [min, max] bucket grid at `step`, left-joined onto the
    * sparse rollup. */
  private def denseGrid(rollup: DataFrame, keys: Seq[String], bucket: String,
                        step: String): DataFrame = {
    val bounds = rollup.groupBy(keys.map(col): _*)
      .agg(min(col(bucket)).as("_lo"), max(col(bucket)).as("_hi"))
    val grid = bounds.select((keys.map(col) :+
      explode(sequence(col("_lo"), col("_hi"), expr(s"interval $step")))
        .as(bucket)): _*)
    grid.join(rollup, keys :+ bucket, "left")
  }
}
