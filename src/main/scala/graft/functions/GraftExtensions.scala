package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL registration of the graft fingerprint kernels, so every function is
  * reachable from pure `spark.sql(...)` text as well as the Column API:
  *
  *   spark.sql("SELECT shingle_fingerprints(text, 8, 48, 0) FROM docs")
  *
  * Two entry points, same registrations:
  *  - `spark.sql.extensions=graft.functions.GraftExtensions` at session
  *    build time (the idiomatic SparkSessionExtensions hook), or
  *  - `GraftExtensions.registerAll(spark)` on a live session (session-
  *    scoped function registry).
  *
  * Int/long parameters must be literals — they parameterize codegen, so a
  * per-row value cannot apply (same restriction Spark's own
  * parameterized expressions carry).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name, usage),
        builder))
    }
}

object GraftExtensions {

  /** Constant integer parameter: accepts any FOLDABLE integral expression
    * (literal, `4+4`, `cast(8 as int)`), because these parameterize codegen
    * and so must be known at plan time.
    */
  private def lit(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other if other.foldable => other.eval() match {
      case v: Int => v.toLong
      case v: Long => v
      case v: Short => v.toLong
      case v: Byte => v.toLong
      case v => throw new IllegalArgumentException(
        s"$what must be a constant integer, got $v (${other.dataType.sql})")
    }
    case other => throw new IllegalArgumentException(
      s"$what must be a constant integer expression, got non-foldable $other")
  }

  private def arity(name: String, es: Seq[Expression], n: Int): Unit =
    if (es.length != n) throw new IllegalArgumentException(
      s"$name expects $n arguments, got ${es.length}")

  private[functions] val registrations: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("sgram_fingerprints",
      "sgram_fingerprints(tokens, s, hashBits, seed) — xxh64 fingerprints of every s-token window",
      (es: Seq[Expression]) => { arity("sgram_fingerprints", es, 4)
        SgramFingerprintsExpr(es.head,
          lit(es(1), "s").toInt, lit(es(2), "hashBits").toInt, lit(es(3), "seed")) }),
    ("shingle_fingerprints",
      "shingle_fingerprints(text, n, hashBits, seed) — xxh64 fingerprints of every n-char shingle",
      (es: Seq[Expression]) => { arity("shingle_fingerprints", es, 4)
        ShingleFingerprintsExpr(es.head,
          lit(es(1), "n").toInt, lit(es(2), "hashBits").toInt, lit(es(3), "seed")) }),
    ("graft_simhash",
      "graft_simhash(text, n, seed) — 64-bit SimHash over n-char shingles",
      (es: Seq[Expression]) => { arity("graft_simhash", es, 3)
        SimhashExpr(es.head, lit(es(1), "n").toInt, lit(es(2), "seed")) }),
    ("minhash_signature",
      "minhash_signature(text, n, k, seed) — k-slot MinHash signature over n-char shingles",
      (es: Seq[Expression]) => { arity("minhash_signature", es, 4)
        MinhashSignatureExpr(es.head,
          lit(es(1), "n").toInt, lit(es(2), "k").toInt, lit(es(3), "seed")) }),
    ("doc_fingerprint",
      "doc_fingerprint(text, seed) — rolling polynomial document fingerprint mod 2^61-1",
      (es: Seq[Expression]) => { arity("doc_fingerprint", es, 2)
        DocFingerprintExpr(es.head, lit(es(1), "seed")) }),
    ("float_dot",
      "float_dot(a, b) — double-precision dot product of two array<float> columns",
      (es: Seq[Expression]) => { arity("float_dot", es, 2)
        FloatDotExpr(es.head, es(1)) }),
    ("hyperplane_sig",
      "hyperplane_sig(embedding, planes, seed) — signed-random-projection LSH signature",
      (es: Seq[Expression]) => { arity("hyperplane_sig", es, 3)
        HyperplaneSigExpr(es.head, lit(es(1), "planes").toInt, lit(es(2), "seed")) }))

  /** Register every graft function into a live session's registry. */
  def registerAll(spark: SparkSession): Unit =
    registrations.foreach { case (name, usage, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name, usage),
        builder)
    }
}
