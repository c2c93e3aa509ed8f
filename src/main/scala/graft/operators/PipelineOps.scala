package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-set assembly operators: sequence packing, test-set
  * decontamination, deterministic split assignment. Like the rest of the
  * pipeline layer these have no reference counterpart (the reference
  * takes prepared ndarrays, `feature_extraction.py:532-537`); they are
  * the operations a corpus-to-training-run pipeline needs around the
  * feature/dedup core, built scale-first from codegen'd built-ins.
  */
object PipelineOps {

  /** Concat-then-chunk sequence packing: per source, documents in
    * doc_id order are laid end to end and cut into bins of
    * `budgetTokens` whitespace tokens — bin = floor(tokens-before-me /
    * budget), the deterministic packing used when a trainer
    * concatenates documents and slices fixed-length contexts. A
    * document starting inside bin b counts wholly toward b, so a bin
    * can overrun the budget by less than its last document's length
    * (documents are not split; re-chunking to exact context length is
    * the trainer's token-level concern). One window + one aggregation,
    * both clustered by source — a single exchange, no driver state;
    * at 100 TB the window's per-source sequential scan is the same
    * order the pack output must respect, so no cheaper shape exists. */
  def packSequences(docs: DataFrame, budgetTokens: Int): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive: $budgetTokens")
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col("doc_id"), col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
      .withColumn("cum_before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      // integral `div`, not floor(double division): long/long in Spark
      // casts through double, whose 53-bit mantissa would diverge from
      // the oracle's exact `//` once a source's cumulative tokens pass
      // 2^53 — `div` keeps the arithmetic in longs at any scale
      .withColumn("bin", expr(s"cum_before div ${budgetTokens}L"))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
  }

  /** Test-set decontamination: flag every training document sharing at
    * least one word-3-gram shingle with the held-out set, with the
    * count of distinct shared shingles as the evidence column. Reuses
    * the dedup layer's single-pass shingle kernel on both sides. Scale
    * shape: the held-out shingle set is the SMALL side (a benchmark is
    * kilo-docs, the corpus is 100 TB) — distinct test shingles
    * broadcast, the exploded training shingles filter against them
    * map-side, and only matching (doc_id, shingle) pairs — rare by
    * construction — reach the per-doc exchange. Training docs whose
    * text yields no shingles cannot collide and report 0. */
  def decontaminate(train: DataFrame, test: DataFrame): DataFrame = {
    val testSh = DedupOps.shingled(test)
      .select(explode(col("sh")).as("h")).distinct()
    // shingles() returns DISTINCT hashes per doc, so post-join count(*)
    // IS the distinct shared-shingle count
    val hits = DedupOps.shingled(train)
      .select(col("doc_id"), explode(col("sh")).as("h"))
      .join(broadcast(testSh), "h")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
    train.select(col("doc_id")).join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        col("n_shared").isNotNull.as("contaminated"))
  }

  /** Deterministic train/val/test assignment: bucket = content
    * fingerprint mod 100 (the rolling-hash fingerprint already mirrored
    * bit-exactly by the DuckDB oracle), split by percentage cut
    * points. Content-keyed rather than doc_id-keyed on purpose: exact
    * duplicates land in the SAME split whatever their ids, so a dup
    * surviving dedup can never straddle the train/test boundary.
    * Pure per-row expressions — no shuffle, no state. */
  def splitAssign(docs: DataFrame, trainPct: Int = 80,
                  valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    TextOps.fingerprint(docs)
      .withColumn("bucket", pmod(col("fingerprint"), lit(100L)))
      .select(col("doc_id"), col("bucket"),
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test").as("split"))
  }
}
