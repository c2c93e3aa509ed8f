package graft.table

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iceberg-style table layout: immutable per-commit data directories +
  * an append-only JSON-lines snapshot log (the manifest). No Iceberg
  * runtime jar exists in this environment (SURVEY.md §7.0), so the
  * snapshot/manifest/commit semantics are implemented directly and kept
  * behind this facade.
  *
  * Layout:
  *   root/data/<tier>/snap-<id>/   parquet (partitioned by source), immutable
  *   root/meta/snapshots.jsonl     one JSON object per committed snapshot
  *   root/meta/lineage.jsonl       per-(snapshot, bucket) lineage rows
  *
  * Commit protocol: write parquet to `<dir>.tmp`, atomic-rename to the
  * final dir, then append the snapshot line (newline-sealed + fsynced —
  * the manifest append IS the commit point). A crash before the manifest
  * append leaves an orphan directory that no reader ever sees (reads
  * resolve strictly through the manifest); the retry reclaims the orphan
  * and re-runs the bucket idempotently. A torn manifest tail (crash
  * mid-append) is skipped on read and sealed on the next append. Commits
  * across processes serialize on a file lock (snapshot ids are allocated
  * under it). Resume = input buckets minus `doneBuckets` (the manifest
  * high-water-mark); last-commit-wins on bucket collisions.
  */
final class TableIO(val root: String) {
  private val metaDir = Paths.get(root, "meta")
  private val snapshotsFile = metaDir.resolve("snapshots.jsonl")
  private val lineageFile = metaDir.resolve("lineage.jsonl")

  final case class Snapshot(id: Long, tier: String, dir: String,
                            buckets: Seq[Long], rows: Long, jobId: String,
                            committedAt: Long)

  private def deleteRec(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.forEach(c => deleteRec(c)) finally s.close()
    }
    Files.deleteIfExists(p)
  }

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  def snapshots(): Seq[Snapshot] = synchronized {
    if (!Files.exists(snapshotsFile)) return Nil
    val lines = Files.readAllLines(snapshotsFile, StandardCharsets.UTF_8)
    import scala.jdk.CollectionConverters._
    // Torn-write tolerance: a crash mid-append can leave a truncated
    // line. A complete manifest line always ends with '}' — a line that
    // doesn't is a torn tail and is skipped (its commit never became
    // visible; the orphan data dir is reclaimed on the next commit). A
    // '}'-terminated line that still fails to parse is real corruption
    // and fails loudly.
    lines.asScala.toSeq.filter(_.nonEmpty).flatMap { l =>
      if (!l.endsWith("}")) None else Some(parseSnapshot(l))
    }
  }

  // minimal JSON parsing for our own fixed-shape lines (no external deps).
  // String fields honour the escapes esc() writes (\" \\ \uXXXX), so a
  // quoted jobId/tier round-trips instead of truncating at the first '"'.
  private def parseSnapshot(line: String): Snapshot = {
    def field(name: String): String = {
      val i = line.indexOf("\"" + name + "\":")
      require(i >= 0, s"missing $name in $line")
      val start = i + name.length + 3
      line(start) match {
        case '"' =>
          val sb = new StringBuilder
          var j = start + 1
          while (j < line.length && line(j) != '"') {
            if (line(j) == '\\') {
              line(j + 1) match {
                case 'u' =>
                  sb.append(Integer.parseInt(line.substring(j + 2, j + 6), 16).toChar)
                  j += 6
                case c => sb.append(c); j += 2
              }
            } else { sb.append(line(j)); j += 1 }
          }
          sb.toString
        case '[' =>
          val end = line.indexOf(']', start)
          line.substring(start + 1, end)
        case _ =>
          var end = start
          while (end < line.length && line(end) != ',' && line(end) != '}') end += 1
          line.substring(start, end)
      }
    }
    Snapshot(field("id").toLong, field("tier"), field("dir"),
      field("buckets").split(",").filter(_.nonEmpty).map(_.trim.toLong).toSeq,
      field("rows").toLong, field("jobId"), field("committedAt").toLong)
  }

  /** Buckets already committed for a tier (checkpoint high-water-mark). */
  def doneBuckets(tier: String): Set[Long] =
    snapshots().filter(_.tier == tier).flatMap(_.buckets).toSet

  /** Append `payload` starting on a fresh line and fsync — the manifest
    * is the commit point, so a "committed" snapshot must survive power
    * loss, and a previously torn tail must not concatenate with the new
    * line (the '\n' seal turns the torn fragment into a skippable
    * non-'}'-terminated line). */
  private def appendDurable(file: Path, payload: String): Unit = {
    val ch = java.nio.channels.FileChannel.open(file,
      StandardOpenOption.CREATE, StandardOpenOption.READ,
      StandardOpenOption.WRITE)
    try {
      var pos = ch.size()
      if (pos > 0) {
        val last = java.nio.ByteBuffer.allocate(1)
        ch.read(last, pos - 1)
        if (last.get(0) != '\n'.toByte) {
          ch.write(java.nio.ByteBuffer.wrap(Array('\n'.toByte)), pos)
          pos += 1
        }
      }
      ch.write(java.nio.ByteBuffer.wrap(
        payload.getBytes(StandardCharsets.UTF_8)), pos)
      ch.force(true)
    } finally ch.close()
  }

  /** Run `body` holding the table's cross-process commit lock — two
    * writers on one root otherwise allocate colliding snapshot ids (the
    * instance-level `synchronized` only covers one JVM). */
  private def withCommitLock[T](body: => T): T = {
    val ch = java.nio.channels.FileChannel.open(metaDir.resolve("commit.lock"),
      StandardOpenOption.CREATE, StandardOpenOption.WRITE)
    try {
      val lock = ch.lock()
      try body finally lock.release()
    } finally ch.close()
  }

  /** Atomically commit a tier DataFrame covering `buckets`. */
  def commit(tier: String, df: DataFrame, buckets: Seq[Long], jobId: String,
             partitionBy: Seq[String] = Seq("source")): Snapshot = synchronized {
    // tier names become filesystem paths — keep them path- and JSON-safe
    require(tier.matches("[A-Za-z0-9._-]+"),
      s"tier '$tier' must match [A-Za-z0-9._-]+")
    // read() resolves bucket collisions through commit_bucket; enforce the
    // column at write time instead of failing at read time
    require(df.columns.contains("commit_bucket"),
      s"commit('$tier'): DataFrame must carry a commit_bucket column")
    Files.createDirectories(metaDir)
    withCommitLock {
    val id = snapshots().map(_.id).maxOption.getOrElse(0L) + 1
    // A bucket can legitimately finalize to zero rows (every input row
    // below the state minimum): record it in the manifest (it IS done —
    // resume must not re-run it forever) but write no data directory
    // (a 0-row partitioned parquet write has no readable footer).
    // The plan is evaluated ONCE — write to tmp first, then derive
    // emptiness from what was actually written (a separate isEmpty action
    // would re-execute the plan and could disagree with the written data
    // for nondeterministic inputs).
    val snapRel = s"data/$tier/snap-$id"
    val finalDir = Paths.get(root, snapRel)
    val tmpDir = Paths.get(root, snapRel + ".tmp")
    Files.createDirectories(finalDir.getParent)
    val writer = if (partitionBy.nonEmpty) df.write.partitionBy(partitionBy: _*) else df.write
    writer.mode("overwrite").parquet(tmpDir.toString)
    val hasData = {
      val s = Files.walk(tmpDir)
      try s.anyMatch(p => p.getFileName.toString.startsWith("part-"))
      finally s.close()
    }
    val rows =
      if (!hasData) 0L
      else df.sparkSession.read.parquet(tmpDir.toString).count()
    val relDir = if (rows == 0L) {
      deleteRec(tmpDir)
      ""
    } else {
      // a crash between this rename and the manifest append leaves an
      // orphan snap-<id> dir that no reader ever sees; the retry
      // recomputes the same id, so reclaim the orphan instead of letting
      // ATOMIC_MOVE fail on the non-empty target forever
      if (Files.exists(finalDir)) deleteRec(finalDir)
      Files.move(tmpDir, finalDir, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      snapRel
    }
    val snap = Snapshot(id, tier, relDir, buckets, rows, jobId,
      System.currentTimeMillis())
    val json = s"""{"id":${snap.id},"tier":"${esc(tier)}","dir":"${esc(relDir)}",""" +
      s""""buckets":[${buckets.mkString(",")}],"rows":$rows,""" +
      s""""jobId":"${esc(jobId)}","committedAt":${snap.committedAt}}""" + "\n"
    appendDurable(snapshotsFile, json)
    snap
    }
  }

  /** Read a tier through the manifest: union of committed snapshot dirs,
    * last-commit-wins per (bucket, key row) via snapshot precedence. */
  def read(spark: SparkSession, tier: String): Option[DataFrame] = {
    val snaps = snapshots().filter(_.tier == tier).sortBy(_.id)
    if (snaps.isEmpty) return None
    // bucket -> winning snapshot id (last commit wins, including data-less
    // zero-row commits: a bucket whose latest commit is empty reads empty)
    val winner = snaps.flatMap(s => s.buckets.map(_ -> s.id)).toMap
    val dfs = snaps.filter(_.dir.nonEmpty).map { s =>
      val keep = s.buckets.filter(b => winner(b) == s.id)
      val df = spark.read.parquet(Paths.get(root, s.dir).toString)
      // ALWAYS filter to the declared winning buckets — skipping the
      // filter when keep == declared let rows whose commit_bucket was
      // never declared leak past last-commit-wins (commit() does not
      // validate the data's buckets against the declared list)
      df.where(col("commit_bucket").isin(keep: _*))
    }
    if (dfs.isEmpty) None else Some(dfs.reduce(_ unionByName _))
  }

  /** Read a compressed chunk tier back as per-point rows: DoD-decoded
    * bucket timestamps zipped with every Gorilla-decoded feature series,
    * exploded. The scan + decode + explode are all native expressions
    * inside whole-stage codegen (the idiomatic read path — composing the
    * built-in parquet source with the codec expressions beats a custom
    * DataSource reimplementing parquet). Feature list is discovered from
    * the chunk schema (`<feature>_gor` columns). */
  def readChunkPoints(spark: SparkSession, tier: String): Option[DataFrame] =
    read(spark, s"$tier-chunks").map { chunks =>
      val feats = chunks.columns.filter(_.endsWith("_gor"))
        .map(_.stripSuffix("_gor")).toSeq
      val zipped = chunks.select(col("source"), col("commit_bucket"),
        arrays_zip((col("ts_dod") +: feats.map(f => col(s"${f}_gor")))
          .zip("bucket_s" +: feats)
          .map { case (c, nm) =>
            (if (nm == "bucket_s") graft.functions.dod_decode(c)
             else graft.functions.gorilla_decode(c)).as(nm)
          }: _*).as("z"))
      zipped.select(col("source"), col("commit_bucket"), explode(col("z")).as("p"))
        .select(Seq(col("source"), col("commit_bucket"),
          col("p.bucket_s").as("bucket_s")) ++
          feats.map(f => col(s"p.$f").as(f)): _*)
    }

  /** Append per-bucket lineage rows (driver-side, tiny). */
  def appendLineage(jobId: String, tier: String,
                    rows: Seq[(Long, Long, Long, String)]): Unit = synchronized {
    Files.createDirectories(metaDir)
    val sb = new StringBuilder
    rows.foreach { case (bucket, rowsOut, tokensIn, checksum) =>
      sb.append(s"""{"jobId":"${esc(jobId)}","tier":"${esc(tier)}",""" +
        s""""bucket":$bucket,"rowsOut":$rowsOut,"tokensIn":$tokensIn,""" +
        s""""checksum":"${esc(checksum)}"}""" + "\n")
    }
    appendDurable(lineageFile, sb.toString)
  }

  def lineageLines(): Seq[String] = synchronized {
    if (!Files.exists(lineageFile)) Nil
    else {
      import scala.jdk.CollectionConverters._
      Files.readAllLines(lineageFile, StandardCharsets.UTF_8).asScala.toSeq
    }
  }
}
