package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{dod_encode, gorilla_encode, FeatureParams}
import graft.table.TableIO

/** The spark-submit entry for the tiered rollup: token table in, per-tier
  * feature points + Gorilla/DoD-compressed chunks out, with manifest
  * commits per (tier, day-bucket) enabling checkpoint-resumable
  * incremental re-aggregation.
  *
  * - Commit unit = UTC day; resume = days absent from the manifest
  *   (idempotent: immutable snapshot dirs + last-commit-wins).
  * - Every tier row stores BOTH the finalized features and the mergeable
  *   state struct `P`, so a resumed run cascades from committed points
  *   without touching raw data — the incremental re-aggregation the
  *   north rule asks for.
  * - Lineage rows per (tier, day): rows/tokens in, points out, checksum.
  * - Compressed chunks: per (source, day) the bucket timestamps are
  *   delta-of-delta coded and each feature series Gorilla-coded.
  */
object RollupJob {

  final case class Conf(
      tableRoot: String,
      scale: Double = 1.0 / (1 << 24),
      tiers: Seq[(String, String)] = Rollup.Tiers,
      chunkFeatures: Seq[String] = Seq("mean", "variance", "line_length",
        "hjorth_mobility", "hjorth_complexity"),
      jobId: String = "rollup",
      // cascading retention: tier -> horizon seconds behind the newest
      // committed day; day buckets older than (max day - horizon) expire
      // (tombstone + vacuum) AFTER the full cascade committed, so every
      // coarser tier already holds the expired range
      retention: Map[String, Long] = Map.empty,
      manifestCheckpointEvery: Int = 16)

  final case class TierResult(tier: String, newDays: Seq[Long], points: Long)

  // UTC-day truncation from the epoch directly — NOT date_trunc('day'),
  // which follows spark.sql.session.timeZone: a non-UTC caller would get
  // day buckets misaligned with window('1 day')'s UTC-epoch alignment,
  // committing day D's data under bucket D-1 and breaking resume. run()
  // is the public API; only main() and the tests pin the session to UTC.
  private def dayOf(c: org.apache.spark.sql.Column) =
    floor(unix_timestamp(c) / 86400L).cast("long") * 86400L

  /** Run (or resume) the full cascade. */
  def run(spark: SparkSession, tokens: DataFrame, conf: Conf): Seq[TierResult] = {
    val io = new TableIO(conf.tableRoot, conf.manifestCheckpointEvery)
    val allDays = tokens.select(dayOf(col("event_time")).as("d"))
      .distinct().collect().map(_.getLong(0)).sorted.toSeq

    // every persist() this run makes is released before returning —
    // repeated run() calls on one session (the resume pattern) otherwise
    // accumulate dead cached blocks for the session's lifetime
    val cachedFrames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var statesRef: Option[DataFrame] = None
    def states: DataFrame = statesRef.getOrElse {
      val s = TokenRollup.rowStates(tokens, conf.scale)
        .withColumn("day", dayOf(col("event_time")))
        .persist()
      statesRef = Some(s)
      s
    }

    val results = scala.collection.mutable.ArrayBuffer.empty[TierResult]
    // bucket-states of the previous (finer) tier covering ALL days
    var finer: Option[DataFrame] = None

    conf.tiers.zipWithIndex.foreach { case ((tierName, win), tierIdx) =>
      // A day is done only when BOTH of its commits landed (features, then
      // chunks). A crash between the two leaves the day pending, so the
      // resume re-runs it — the feature re-commit is last-commit-wins on
      // the same bucket, keeping the documented idempotence contract.
      val done = io.doneBuckets(tierName)
        .intersect(io.doneBuckets(s"$tierName-chunks"))
      val pending = allDays.filterNot(done.contains)

      val fresh: Option[DataFrame] = if (pending.isEmpty) None else Some {
        val src = finer match {
          case Some(fs) =>
            TokenRollup.cascade(
              fs.where(dayOf(col("bucket")).isin(pending: _*)), win)
          case None =>
            TokenRollup.mergeToBuckets(
              states.where(col("day").isin(pending: _*)),
              win, Seq("event_time", "doc_id"))
        }
        val p = src.persist()
        cachedFrames += p
        p
      }

      fresh.foreach { bucketStates =>
        val feats = TokenRollup.finalizeFeatures(bucketStates)
          .withColumn("commit_bucket", dayOf(col("bucket")))
        // REBALANCE before the partitioned write (guide: output file
        // sizing): without it every upstream task writes a sliver into
        // every source dir — ~(tasks x sources) tiny files per snapshot,
        // taxing each subsequent manifest read and footer pass. AQE sizes
        // the rebalanced partitions (advisoryPartitionSizeInBytes), so
        // locally this collapses to one file per source while at scale it
        // yields size-targeted files — the Iceberg write.distribution-mode
        // = hash behaviour, at the documented cost of one extra exchange
        // of the (metadata-sized) tier output
        // the lineage aggregation and the feature commit's write are
        // independent jobs over the same persisted bucket-states — start
        // the lineage collect FIRST so its tasks overlap the commit write
        // (Spark runs driver-submitted jobs in parallel; actions are only
        // sequential when the driver calls them sequentially). The append
        // itself stays in the r5 order — after the feature commit, BEFORE
        // the chunks commit — so a crash can at worst duplicate lineage on
        // the re-run, never leave a done day without lineage rows.
        val linF = scala.concurrent.Future {
          feats.groupBy(col("commit_bucket"))
            .agg(count(lit(1)).as("points"), sum("tokens_in").as("tokens"),
              sum(hash(col("source"), col("bucket"),
                graft.functions.duckRound(col("mean"), 9)).cast("long")).as("chk"))
            .collect()
            .map(r => (r.getLong(0), r.getLong(1),
              if (r.isNullAt(2)) 0L else r.getLong(2), r.getLong(3).toHexString))
        }(scala.concurrent.ExecutionContext.global)
        io.commit(tierName, feats.hint("rebalance", "source"), pending,
          conf.jobId)
        val lin = scala.concurrent.Await.result(linF,
          scala.concurrent.duration.Duration.Inf)
        io.appendLineage(conf.jobId, tierName, lin.toSeq)

        val ordered = feats
          .withColumn("bs", unix_timestamp(col("bucket")))
          .groupBy(col("source"), col("commit_bucket"))
          .agg(sort_array(collect_list(struct((Seq("bs") ++ conf.chunkFeatures)
            .map(col): _*))).as("pts"))
        val chunks = ordered.select(
          Seq(col("source"), col("commit_bucket"), size(col("pts")).as("n_points"),
            dod_encode(col("pts.bs")).as("ts_dod")) ++
            conf.chunkFeatures.map(c =>
              gorilla_encode(col(s"pts.$c")).as(s"${c}_gor")): _*)
        io.commit(s"$tierName-chunks", chunks, pending, conf.jobId)
        // tier point count = the lineage rows' points summed — the former
        // bucketStates.count() ran one more Spark job per tier to restate
        // what the lineage aggregation already knows
        results += TierResult(tierName, pending, lin.map(_._2).sum)
      }
      if (fresh.isEmpty) results += TierResult(tierName, Nil, 0)

      // full bucket-state view of this tier for the next cascade:
      // committed days from the manifest + freshly computed days. Only
      // built when a coarser tier will actually consume it — for the last
      // tier it is dead work (a manifest resolve + per-snapshot parquet
      // schema read per run). Positional, not by name: a duplicated tier
      // name must not skip an interior tier's view.
      if (tierIdx != conf.tiers.size - 1) {
        val committedStates = io.read(spark, tierName).map { df =>
          df.where(!col("commit_bucket").isin(pending: _*))
            .select(col("source"), col("bucket"), col("P"),
              col("rows_in"), col("tokens_in"))
        }
        val freshStates = fresh.map(_.select(col("source"), col("bucket"),
          col("P"), col("rows_in"), col("tokens_in")))
        finer = (committedStates, freshStates) match {
          case (Some(a), Some(b)) => Some(a.unionByName(b))
          case (a, b) => a.orElse(b)
        }
      }
    }
    // Retention. The cascade above guarantees coarser coverage only for
    // days in THIS run's input — doneBuckets can hold older days whose
    // coarser commits crashed in a previous run and whose data never
    // reappeared in an input since. Expiring such a day would vacuum the
    // only source a future 1d repair could cascade from (silent loss), so
    // the cutoff is clamped to the coarser tiers' covered prefix: a fine
    // day expires only when every coarser tier (features AND chunks) has
    // it committed.
    conf.retention.foreach { case (tierName, horizon) =>
      val days = io.doneBuckets(tierName)
      val coarser = conf.tiers.map(_._1).dropWhile(_ != tierName).drop(1)
      if (days.nonEmpty) {
        val covered = coarser.foldLeft(days) { (acc, t) =>
          acc.intersect(io.doneBuckets(t))
            .intersect(io.doneBuckets(s"$t-chunks"))
        }
        val uncovered = days.diff(covered)
        val cutoff = math.min(days.max - horizon,
          uncovered.minOption.getOrElse(Long.MaxValue))
        io.expire(tierName, cutoff)
        io.expire(s"$tierName-chunks", cutoff)
      }
    }
    // all commits are on disk; nothing lazy escapes this method
    cachedFrames.foreach(_.unpersist(blocking = false))
    statesRef.foreach(_.unpersist(blocking = false))
    results.toSeq
  }

  def main(args: Array[String]): Unit = {
    val inPath = args.lift(0).getOrElse("/tmp/graft_tokens")
    val root = args.lift(1).getOrElse("/tmp/graft_table")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tokens = spark.read.parquet(inPath)
    val res = run(spark, tokens, Conf(tableRoot = root))
    res.foreach(r => println(s"[rollup] tier=${r.tier} newDays=${r.newDays.size} points=${r.points}"))
    spark.stop()
  }
}
