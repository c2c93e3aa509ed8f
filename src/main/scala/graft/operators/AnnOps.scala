package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column.
  *
  * - bruteForceTopK: exact cosine top-k — broadcast the (small) query set
  *   against the corpus: one scan, no shuffle of the corpus, a single-pass
  *   cosine kernel, then a MAP-SIDE bounded-heap top-k per query
  *   (TypedImperativeAggregate with O(k) state): only k rows per query per
  *   map partition cross the exchange, never the full (query x corpus)
  *   candidate set — a row_number window here would shuffle every
  *   similarity row through one hot-keyed exchange.
  * - ivf: IVF-style scale path — k-means-lite centroids (deterministic
  *   seeded sample), assign corpus to nearest centroid (one narrow pass),
  *   probe only the nProbe nearest cells per query.
  */
object AnnOps {

  /** Sequential-sum cosine — same left-to-right arithmetic as the DuckDB
    * oracle's list_cosine_similarity, so graft.functions.duckRound(,5)
    * hash-matches. Single-pass kernel (functions.CosineSimExpr): one walk
    * of both vectors instead of three stacked interpreted HOF passes. */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.CosineSimExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  def embeddings(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
        col("label"))

  // every ANN entry point reads its embedding frame several times (count /
  // centroid collect / corpus side / broadcast query side) — persisted per
  // call in the same bounded FIFO pattern as DedupOps' candidate caches
  // (each call persists a FRESH projection: nothing is memoized across
  // calls, and a caller's own persistence level is never touched)
  private val cacheReplacing = new OpCache(4)

  /** Exact top-k neighbours for the query subset (vec_id % queryMod == 0),
    * self-matches excluded; ties broken by ascending neighbour id. */
  def bruteForceTopK(emb: DataFrame, k: Int = 1, queryMod: Int = 50): DataFrame = {
    val e = cacheReplacing(emb)
    val queries = e.where(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val joined = e.select(col("vec_id").as("nn_id"), col("v").as("nv"))
      .join(broadcast(queries), col("nn_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("qv"), col("nv")))
      // zero-norm vectors yield NaN cosines; a NaN neighbour is
      // meaningless, so drop it BEFORE ranking (NaN sorts above every
      // double, so it would otherwise ride ordering quirks into top-k)
      .where(!isnan(col("sim")))
    // bounded-heap partial top-k: ascending (negsim, nn_id) = sim desc with
    // nn_id tiebreak — identical ranking to the former row_number window,
    // but with map-side partials so only O(k) rows per query per partition
    // reach the exchange
    joined.groupBy(col("query_id"))
      .agg(graft.functions.bounded_sorted_collect(
        struct((-col("sim")).as("negsim"), col("nn_id"), col("sim")), k)
        .as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t.nn_id").as("nn_id"),
        graft.functions.duckRound(col("t.sim"), 5).as("cos_sim"),
        (col("pos") + lit(1)).cast("int").as("rk"))
  }

  /** Lloyd k-means over a bounded deterministic sample (collected to the
    * driver — the sample is what bounds driver memory, not the corpus).
    * Cosine-normalized vectors, stride-seeded initial centroids, fixed
    * iteration count: fully deterministic. This is the production path for
    * skewed embedding distributions; the gated query uses the plain stride
    * centroids because those are DuckDB-expressible. */
  def kmeansCentroids(emb: DataFrame, k: Int, iters: Int = 10,
                      sampleCap: Int = 4096): Array[Array[Double]] = {
    val sample = emb.orderBy(col("vec_id")).limit(sampleCap)
      .select(col("v")).collect().map(_.getSeq[Double](0).toArray)
      .map { v =>
        val n = math.sqrt(v.map(x => x * x).sum)
        if (n == 0) v else v.map(_ / n)
      }
    val dim = sample.head.length
    var cents = Array.tabulate(k)(i => sample(i * sample.length / k).clone())
    for (_ <- 1 to iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val cnts = new Array[Long](k)
      sample.foreach { v =>
        var best = 0; var bd = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0; var j = 0
          while (j < dim) { val t = v(j) - cents(c)(j); d += t * t; j += 1 }
          if (d < bd) { bd = d; best = c }
          c += 1
        }
        var j = 0
        while (j < dim) { sums(best)(j) += v(j); j += 1 }
        cnts(best) += 1
      }
      cents = Array.tabulate(k)(c =>
        if (cnts(c) == 0) cents(c)
        else sums(c).map(_ / cnts(c)))
    }
    cents
  }

  /** IVF-bucketed approximate top-k: candidates from the probed cells,
    * ranked by the same map-side bounded heap as bruteForceTopK. */
  def ivfTopK(emb: DataFrame, k: Int, nLists: Int = 16, nProbe: Int = 4,
              queryMod: Int = 50): DataFrame = {
    val cand = ivfCandidates(emb, nLists, nProbe, queryMod)
    cand.groupBy(col("query_id"))
      .agg(graft.functions.bounded_sorted_collect(
        struct((-col("sim")).as("negsim"), col("nn_id"), col("sim")), k)
        .as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t.nn_id").as("nn_id"),
        graft.functions.duckRound(col("t.sim"), 5).as("cos_sim"),
        (col("pos") + lit(1)).cast("int").as("rk"))
  }

  /** IVF-bucketed approximate top-1: nLists deterministic centroids from
    * the corpus itself (every (n/nLists)-th vector by ascending id — a
    * seeded sample; see kmeansCentroids for the skew-robust variant),
    * corpus assigned to nearest centroid, queries probe nProbe cells. */
  def ivfTop1(emb: DataFrame, nLists: Int = 16, nProbe: Int = 4,
              queryMod: Int = 50): DataFrame = {
    val cand = ivfCandidates(emb, nLists, nProbe, queryMod)
    // map-side top-1: min_by on the (negsim, nn_id) order key is a plain
    // partial-aggregatable hash aggregate — one tiny struct per query per
    // partition crosses the exchange (vs a full candidate shuffle under a
    // row_number window)
    cand.groupBy(col("query_id"))
      .agg(min_by(struct(col("nn_id"), col("sim")),
        struct((-col("sim")).as("negsim"), col("nn_id"))).as("t"))
      .select(col("query_id"), col("t.nn_id").as("nn_id"),
        graft.functions.duckRound(col("t.sim"), 5).as("cos_sim"))
  }

  /** IVF top-k over k-means-refined centroids (the skew-robust production
    * path, now oracle-gated): converged Lloyd centroids become the probe
    * cells; candidate generation, cell ranking, and the bounded-heap
    * top-k are shared with the stride-centroid path. The DuckDB oracle
    * mirrors the full Lloyd iteration as a recursive CTE, so the centroid
    * set is recomputed — not smuggled — on the oracle side. */
  def ivfTopKKmeans(emb: DataFrame, k: Int, nLists: Int = 16, nProbe: Int = 4,
                    queryMod: Int = 50, iters: Int = 10,
                    sampleCap: Int = 4096): DataFrame = {
    val e = cacheReplacing(emb)
    val cents = kmeansCentroids(e, nLists, iters, sampleCap)
    val cArr = array(cents.zipWithIndex.map { case (v, i) =>
      struct(lit(i.toLong).as("cid"), array(v.map(lit).toIndexedSeq: _*).as("cv"))
    }.toIndexedSeq: _*)
    val cand = candidatesForCentroids(e, cArr, nProbe, queryMod)
    cand.groupBy(col("query_id"))
      .agg(graft.functions.bounded_sorted_collect(
        struct((-col("sim")).as("negsim"), col("nn_id"), col("sim")), k)
        .as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t.nn_id").as("nn_id"),
        graft.functions.duckRound(col("t.sim"), 5).as("cos_sim"),
        (col("pos") + lit(1)).cast("int").as("rk"))
  }

  /** Shared IVF candidate generation (centroids, cell assignment, probe
    * join). */
  private def ivfCandidates(emb: DataFrame, nLists: Int, nProbe: Int,
                            queryMod: Int): DataFrame = {
    val e = cacheReplacing(emb)
    val n = e.count()
    val stride = math.max(n / nLists, 1L)
    // sort before limit: an unordered distributed limit is not stable
    // across partitioning changes, and the centroid set must be
    // reproducible for the DuckDB oracle
    val centroids = e.where(pmod(col("vec_id"), lit(stride)) === 0)
      .orderBy(col("vec_id")).limit(nLists)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
      .collect()
    val cvs = centroids.map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val cArr = array(cvs.map { case (cid, v) =>
      struct(lit(cid).as("cid"), array(v.map(lit).toIndexedSeq: _*).as("cv"))
    }.toIndexedSeq: _*)
    candidatesForCentroids(e, cArr, nProbe, queryMod)
  }

  /** Candidate generation against a literal centroid array: assign the
    * corpus to its nearest cell (one narrow pass), probe the nProbe
    * nearest cells per query, exact cosine on the bucket-joined pairs. */
  private def candidatesForCentroids(emb: DataFrame, cArr: Column,
                                     nProbe: Int, queryMod: Int): DataFrame = {
    def nearestCells(v: Column, take: Int): Column =
      slice(transform(
        array_sort(transform(cArr, c =>
          struct((-cosine(v, c.getField("cv"))).as("negsim"),
            c.getField("cid").as("cid")))),
        s => s.getField("cid")), 1, take)
    val corpus = emb.withColumn("cell", element_at(nearestCells(col("v"), 1), 1))
    val queries = emb.where(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        explode(nearestCells(col("v"), nProbe)).as("cell"))
    corpus.select(col("cell"), col("vec_id").as("nn_id"), col("v").as("nv"))
      .join(broadcast(queries), Seq("cell"))
      .where(col("nn_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("qv"), col("nv")))
      .where(!isnan(col("sim"))) // see bruteForceTopK: NaN = zero-norm vector
  }

  /** Symmetric int8 quantization (single-pass codegen'd kernel — see
    * functions.QuantizeInt8Expr for the arithmetic contract): the memory
    * lever at 100 TB — 8-bit codes cut the resident corpus 4x against
    * float32 with ranking quality preserved, and the quantized codes are
    * what a PQ/IVF index would store. Zero vectors quantize to NULL and
    * drop out of ranking, same as the float path's zero-norm NaN filter. */
  def quantizeInt8(v: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.QuantizeInt8Expr(
        org.apache.spark.sql.graft.ColumnBridge.expression(v)))

  /** Brute-force top-k over int8-quantized vectors: identical plan shape
    * to bruteForceTopK (broadcast queries, map-side bounded heap) with
    * the quantized cosine as the ranking key. */
  def quantizedTopK(emb: DataFrame, k: Int = 1, queryMod: Int = 50): DataFrame =
    bruteForceTopK(
      emb.select(col("vec_id"), quantizeInt8(col("v")).as("v"), col("label"))
        .where(col("v").isNotNull),
      k, queryMod)
}
