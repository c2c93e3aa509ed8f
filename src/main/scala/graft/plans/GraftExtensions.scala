package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** Session extension wiring the engine's expression surface into every
  * session built with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions` — the idiomatic
  * Spark integration point (no per-session registerAll call needed; works
  * from pure SQL, thriftserver, and spark-submit alike).
  *
  * Registered SQL functions:
  *  - `graft_<alias>(tokens[, sfreq[, scale]])` for every catalog feature
  *    (the reference registry surface, utils.py:257-314),
  *  - `graft_token_partials(tokens[, scale])` — the mergeable state,
  *  - `graft_cosine(a, b)`, `graft_shingles(text[, n])`,
  *    `graft_minhash(shingles)`, `graft_simhash64(text)`,
  *    `graft_fingerprint(text)` — the dedup/ANN kernels,
  *  - `graft_gorilla_encode/decode`, `graft_dod_encode/decode` — codecs.
  *
  * Catalyst Expressions (not UDFs): every function participates in
  * codegen, null-propagation, and constant folding like a built-in.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def register(ext: SparkSessionExtensions, name: String,
                       usage: String)(
      builder: Seq[Expression] => Expression): Unit = {
    ext.injectFunction((FunctionIdentifier(name), info(name, usage),
      (children: Seq[Expression]) => builder(children)))
  }

  private def lit(e: Expression): Any = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v, _) => v
    case other => throw new IllegalArgumentException(
      s"expected a literal argument, got $other")
  }
  private def litDouble(e: Expression): Double = lit(e) match {
    case d: Double => d
    case i: Int => i.toDouble
    case l: Long => l.toDouble
    case d: java.math.BigDecimal => d.doubleValue()
    case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
    case other => other.toString.toDouble
  }
  private def litInt(e: Expression): Int = lit(e) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => other.toString.toDouble.toInt
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // feature catalog: graft_<alias>(tokens[, sfreq[, scale]])
    FeatureCatalog.all.keys.foreach { alias =>
      register(ext, s"graft_$alias",
        s"graft_$alias(tokens[, sfreq[, scale]]) - $alias feature kernel") {
        case Seq(c) => TokenFeature(c, alias, FeatureParams())
        case Seq(c, sf) =>
          TokenFeature(c, alias, FeatureParams(sfreq = litDouble(sf)))
        case Seq(c, sf, sc) => TokenFeature(c, alias,
          FeatureParams(sfreq = litDouble(sf), scale = litDouble(sc)))
        case args => throw new IllegalArgumentException(
          s"graft_$alias takes 1-3 arguments, got ${args.size}")
      }
    }
    register(ext, "graft_token_partials",
      "graft_token_partials(tokens[, scale]) - mergeable per-row state") {
      case Seq(c) => TokenPartialsExpr(c, 1.0)
      case Seq(c, sc) => TokenPartialsExpr(c, litDouble(sc))
      case args => throw new IllegalArgumentException(
        s"graft_token_partials takes 1-2 arguments, got ${args.size}")
    }
    register(ext, "graft_cosine",
      "graft_cosine(a, b) - sequential-sum cosine similarity") {
      case Seq(a, b) => CosineSimExpr(a, b)
      case args => throw new IllegalArgumentException(
        s"graft_cosine takes 2 arguments, got ${args.size}")
    }
    register(ext, "graft_shingles",
      "graft_shingles(text[, n]) - distinct sorted word n-gram hashes") {
      case Seq(c) => ShinglesExpr(c, 3)
      case Seq(c, n) => ShinglesExpr(c, litInt(n))
      case args => throw new IllegalArgumentException(
        s"graft_shingles takes 1-2 arguments, got ${args.size}")
    }
    register(ext, "graft_minhash",
      "graft_minhash(shingles) - 64-slot minhash signature") {
      case Seq(c) => MinHashExpr(c, 64)
      case args => throw new IllegalArgumentException(
        s"graft_minhash takes 1 argument, got ${args.size}")
    }
    register(ext, "graft_simhash64",
      "graft_simhash64(text) - 64-bit simhash signature") {
      case Seq(c) => SimHash64Expr(c)
      case args => throw new IllegalArgumentException(
        s"graft_simhash64 takes 1 argument, got ${args.size}")
    }
    register(ext, "graft_fingerprint",
      "graft_fingerprint(text) - rolling-hash document fingerprint") {
      case Seq(c) => FingerprintExpr(c)
      case args => throw new IllegalArgumentException(
        s"graft_fingerprint takes 1 argument, got ${args.size}")
    }
    register(ext, "graft_gorilla_encode",
      "graft_gorilla_encode(array<double>) - Gorilla XOR codec") {
      case Seq(c) => GorillaEncodeExpr(c)
      case args => throw new IllegalArgumentException("takes 1 argument")
    }
    register(ext, "graft_gorilla_decode",
      "graft_gorilla_decode(binary) - Gorilla XOR decode") {
      case Seq(c) => GorillaDecodeExpr(c)
      case args => throw new IllegalArgumentException("takes 1 argument")
    }
    register(ext, "graft_dod_encode",
      "graft_dod_encode(array<long>) - delta-of-delta codec") {
      case Seq(c) => DodEncodeExpr(c)
      case args => throw new IllegalArgumentException("takes 1 argument")
    }
    register(ext, "graft_dod_decode",
      "graft_dod_decode(binary) - delta-of-delta decode") {
      case Seq(c) => DodDecodeExpr(c)
      case args => throw new IllegalArgumentException("takes 1 argument")
    }
  }
}
