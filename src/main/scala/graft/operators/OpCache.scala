package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Bounded FIFO persist registry shared by the operator layer: each call
  * persists a frame computed by THIS invocation and evicts only entries
  * beyond the cap, so repeated operator calls in one session keep
  * storage bounded without yanking a frame another live plan still
  * references. Nothing is memoized across calls — every invocation still
  * computes from its inputs.
  *
  * Two deliberate properties:
  *  - the persisted object is a FRESH projection over the caller's
  *    frame, never the caller's object itself: FIFO eviction must not
  *    strip a persistence level a caller set on its own DataFrame;
  *  - eviction of a not-yet-evaluated entry is safe: Spark's cache keys
  *    on the analyzed plan, and a recompute replays the SAME plan over
  *    the same shuffle outputs, so results (including
  *    spark_partition_id-derived columns, which always sit below the
  *    persisted projection) are reproduced deterministically for
  *    deterministic inputs — the operator layer's standing assumption.
  */
private[operators] final class OpCache(cap: Int) {
  private val cached = new java.util.ArrayDeque[DataFrame]()
  def apply(df: DataFrame): DataFrame = synchronized {
    val fresh = df.select(df.columns.map(col).toIndexedSeq: _*)
    cached.addLast(fresh)
    while (cached.size > cap) cached.pollFirst().unpersist(blocking = false)
    fresh.persist()
  }
}
