package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions: the engine's SQL surface injected at session-build
  * time (spark.sql.extensions) — usable from pure SQL with no
  * registerAll call. */
class ExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  test("catalog features, kernels and codecs resolve from pure SQL") {
    spark.sparkContext.setLogLevel("ERROR")
    def one(sql: String): Any = spark.sql(sql).head.get(0)
    assert(one("SELECT graft_mean(array(1, 2, 3, 4))") == 2.5)
    // 3-arg form: sfreq + scale routing
    assert(math.abs(one("SELECT graft_mean(array(2, 4), 256.0, 0.5)")
      .asInstanceOf[Double] - 1.5) < 1e-12)
    assert(one("SELECT graft_zero_crossings(array(1, -1, 1, -1))") == 3.0)
    assert(math.abs(one("SELECT graft_cosine(array(1.0, 0.0), array(1.0, 0.0))")
      .asInstanceOf[Double] - 1.0) < 1e-12)
    assert(one("SELECT size(graft_shingles('a b c d', 3))") == 2)
    assert(one("SELECT graft_simhash64('x y z')") ==
      one("SELECT graft_simhash64('x y z')"))
    assert(one("""SELECT graft_gorilla_decode(
        graft_gorilla_encode(array(1.5, 1.5, -0.25)))""") ==
      Seq(1.5, 1.5, -0.25))
    assert(one("""SELECT graft_dod_decode(
        graft_dod_encode(array(60L, 120L, 180L)))""") == Seq(60L, 120L, 180L))
    // minhash over shingles, struct state from token_partials
    assert(one("SELECT size(graft_minhash(graft_shingles('a b c d e')))") == 64)
    assert(one("SELECT graft_token_partials(array(1, 2, 3)).n") == 3L)
    // arity errors are analysis-time and informative
    val err = intercept[Exception](spark.sql("SELECT graft_cosine(array(1.0))").head)
    assert(err.getMessage.contains("graft_cosine"))
  }
}
