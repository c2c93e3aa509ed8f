package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline.
  *
  * Scale design:
  * - exact: one hash-groupBy shuffle on md5(text) — the canonical
  *   100 TB dedup plan (hash is 16 bytes/row on the wire, not the text).
  * - MinHash+LSH: shingle -> 64 minhashes -> 16 bands of 4 -> bucket
  *   self-join. Candidate generation touches only band-bucket groups with
  *   >1 member, so the cross product never materializes; estimated
  *   Jaccard = fraction of agreeing minhash slots, verified exactly only
  *   for emitted candidates.
  * - SimHash: 64-bit signature per doc via signed bit-vote over token
  *   hashes; near-dup candidates from 4x16-bit band equality (Hamming <= 3
  *   within a band by pigeonhole when distance <= 3 overall).
  * - n-gram Jaccard: exact set Jaccard on hashed 3-gram shingles for a
  *   bounded pair set (adjacent doc_ids here; at scale: LSH candidates).
  */
object DedupOps {

  /** Exact dedup groups by content hash. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text").cast("binary")).as("text_hash"))
      .agg(count(lit(1)).as("dup_count"), min(col("doc_id")).as("keep_doc_id"))

  /** Word 3-gram shingle hashes (distinct, sorted): single-pass kernel. */
  def shingles(text: Column, n: Int = 3): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.ShinglesExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(text), n))

  private val MinHashK = 64
  private val Bands = 16
  private val RowsPerBand = 4

  /** 64-slot minhash signature of a shingle-hash array (single-pass
    * kernel, functions.MinHashExpr). */
  def minhashSignature(sh: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.MinHashExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(sh), MinHashK))

  /** LSH candidate pairs with estimated Jaccard (fraction of agreeing
    * minhash slots), threshold-filtered. */
  def minhashCandidates(docs: DataFrame, minEstJaccard: Double = 0.5): DataFrame = {
    val sigs = docs
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .where(size(col("sh")) > 0)
      .select(col("doc_id"), minhashSignature(col("sh")).as("sig"))
      .persist() // signatures feed both sides of the band self-join
    val banded = sigs.select(col("doc_id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(Bands - 1)),
        b => hash(slice(col("sig"), b * lit(RowsPerBand) + lit(1), lit(RowsPerBand)), b))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val l = banded.select(col("band"), col("bucket"),
      col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val r = banded.select(col("band"), col("bucket"),
      col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    l.join(r, Seq("band", "bucket"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)), lit(0),
          (acc, v) => acc + v).cast("double") / MinHashK).as("est_jaccard"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(max(col("est_jaccard")).as("est_jaccard"))
      .where(col("est_jaccard") >= minEstJaccard)
  }

  /** 64-bit SimHash over word hashes: bit b of the signature = sign of the
    * vote sum over tokens' bit b. Computed per row with array expressions —
    * no explode, no shuffle. */
  def simhash(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.SimHash64Expr(
        org.apache.spark.sql.graft.ColumnBridge.expression(text)))

  def simhashSignatures(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), simhash(col("text")).as("simhash"))

  /** Exact n-gram Jaccard for a bounded candidate pair set; here adjacent
    * doc_ids (the scale path feeds LSH candidates instead). */
  def ngramJaccardAdjacent(docs: DataFrame): DataFrame = {
    val sh = docs.select(col("doc_id"), shingles(col("text")).as("sh"))
    val next = sh.select((col("doc_id") - 1).as("doc_id"), col("sh").as("sh_b"))
    sh.join(next, "doc_id")
      .select(col("doc_id").as("doc_a"), (col("doc_id") + 1).as("doc_b"),
        graft.functions.duckRound(size(array_intersect(col("sh"), col("sh_b"))).cast("double") /
          size(array_union(col("sh"), col("sh_b"))), 6).as("jaccard"))
  }

  /** Embedding cosine near-dup: random-hyperplane LSH bucket join, then
    * exact cosine on candidates. */
  def embeddingNearDup(emb: DataFrame, simThreshold: Double = 0.9,
                       planes: Int = 12): DataFrame = {
    val dim = 64
    val rng = new graft.gen.SplitMix64(7L)
    val hyper = Array.fill(planes)(Array.fill(dim)(rng.nextGaussian()))
    val e = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val sigBits = hyper.zipWithIndex.map { case (h, i) =>
      val dot = aggregate(zip_with(col("v"),
        array(h.map(lit).toIndexedSeq: _*), (x, y) => x * y),
        lit(0.0), (acc, t) => acc + t)
      when(dot > 0, lit(1L)).otherwise(lit(0L)) * lit(1L << i)
    }.reduce(_ + _)
    val sigs = e.withColumn("bucket", sigBits)
    val l = sigs.select(col("bucket"), col("vec_id").as("id_a"), col("v").as("va"))
    val r = sigs.select(col("bucket"), col("vec_id").as("id_b"), col("v").as("vb"))
    l.join(r, "bucket").where(col("id_a") < col("id_b"))
      .withColumn("cos_sim", AnnOps.cosine(col("va"), col("vb")))
      .where(col("cos_sim") >= simThreshold)
      .select(col("id_a"), col("id_b"), graft.functions.duckRound(col("cos_sim"), 5).as("cos_sim"))
  }
}
