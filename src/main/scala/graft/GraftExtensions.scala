package graft

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.aggregate.{Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.IntegerType

/** Session-extension entry point: `--conf spark.sql.extensions=
  * graft.GraftExtensions` (or `builder.withExtensions(new
  * GraftExtensions)`) injects the engine's native functions into every
  * session built from that config — the idiomatic deployment surface for
  * a Spark-native library (no imperative `register(spark)` call needed,
  * works from pure-SQL clients too).
  *
  * `GraftFunctions.register` stays as the imperative twin for sessions
  * the caller didn't construct.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** Analysis-time check for the literal int parameters of the kernel
    * expressions: must be an `Int` literal and >= 1 (k/w/stride of 0 or
    * less would divide-by-zero or index out of bounds at eval time).
    */
  private def intLit(fn: String, e: Expression, name: String): Int = e match {
    case Literal(v: Int, IntegerType) if v >= 1 => v
    case Literal(v: Int, IntegerType) => throw new IllegalArgumentException(
      s"$fn: $name must be >= 1, got $v")
    case other => throw new IllegalArgumentException(
      s"$fn: $name must be an integer literal, got $other")
  }

  /** (identifier, doc, builder) triples shared by the extension injector
    * and [[GraftFunctions.register]].
    */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("exact_distinct"),
      info("exact_distinct", "exact_distinct(col) - exact distinct count, legal in window frames"),
      (es: Seq[Expression]) => ExactDistinct(es.head)),
    (FunctionIdentifier("gini_agg"),
      info("gini_agg", "gini_agg(x) - Gini coefficient of the group's values"),
      (es: Seq[Expression]) => GiniAgg(es.head)),
    (FunctionIdentifier("entropy_agg"),
      info("entropy_agg", "entropy_agg(x) - Shannon entropy (log2) of the value histogram"),
      (es: Seq[Expression]) => EntropyAgg(es.head)),
    (FunctionIdentifier("hhi_agg"),
      info("hhi_agg", "hhi_agg(x) - Herfindahl-Hirschman index of the value histogram"),
      (es: Seq[Expression]) => HhiAgg(es.head)),
    (FunctionIdentifier("gram_agg"),
      info("gram_agg", "gram_agg(vec) - one-pass Gram matrix over a float/double vector column: [n, d, sums..., upper-triangle product sums...]"),
      (es: Seq[Expression]) => GramAgg(es.head)),
    (FunctionIdentifier("array_dot"),
      info("array_dot", "array_dot(a, b) - dot product of two float/double vectors"),
      (es: Seq[Expression]) => ArrayDot(es(0), es(1))),
    (FunctionIdentifier("array_norm"),
      info("array_norm", "array_norm(a) - L2 norm of a float/double vector"),
      (es: Seq[Expression]) => ArrayNorm(es.head)),
    (FunctionIdentifier("array_sqdist"),
      info("array_sqdist", "array_sqdist(a, b) - squared euclidean distance of two vectors"),
      (es: Seq[Expression]) => ArraySqDist(es(0), es(1))),
    (FunctionIdentifier("simhash32"),
      info("simhash32", "simhash32(text) - one-pass 32-bit SimHash over whitespace tokens; NULL when no tokens"),
      (es: Seq[Expression]) => SimHash32(es.head)),
    (FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(text) - one-pass 64-bit SimHash over whitespace tokens (the wide64 banding fingerprint); NULL when no tokens"),
      (es: Seq[Expression]) => SimHash64(es.head)),
    // the bounded native top-k (map-side <= k buffers): SQL surface of
    // graft.ops.TopK — top_k(struct(orderKey, id, payload...), k) keeps
    // the k SMALLEST structs under the total order, sorted ascending
    (FunctionIdentifier("top_k"),
      info("top_k", "top_k(value, k) - array of the group's k smallest values under the total order, sorted ascending; bounded (<= k) partial buffers"),
      (es: Seq[Expression]) => TopKAgg(es(0), intLit("top_k", es(1), "k"))),
    // SURVEY §7.4's exact/approx twin selection as a FUNCTION: the builder
    // runs at analysis time with the active session's SQLConf, so one
    // query surface (`graft_distinct(x)`) resolves to exact
    // count(DISTINCT x) by default and to the mergeable HLL sketch when
    // `spark.graft.distinct.approx=true` — the oracle path and the 100 TB
    // path are the same query text, chosen by deployment config.
    (FunctionIdentifier("graft_distinct"),
      info("graft_distinct",
        "graft_distinct(col) - exact count distinct, or HLL approx when spark.graft.distinct.approx=true"),
      (es: Seq[Expression]) =>
        if (SQLConf.get.getConfString("spark.graft.distinct.approx", "false").toBoolean)
          new HyperLogLogPlusPlus(es.head).toAggregateExpression()
        else Count(es).toAggregateExpression(isDistinct = true)),
    (FunctionIdentifier("trigram_stats"),
      info("trigram_stats", "trigram_stats(text) - (total<<32)|distinct char trigrams of the lowercased, ws-collapsed text"),
      (es: Seq[Expression]) => TrigramStats(es.head)),
    (FunctionIdentifier("winnow"),
      info("winnow", "winnow(text, k, w) - distinct window-min k-gram hashes (MOSS fingerprints); k and w must be int literals"),
      (es: Seq[Expression]) =>
        WinnowFingerprints(es(0), intLit("winnow", es(1), "k"), intLit("winnow", es(2), "w"))),
    (FunctionIdentifier("rolling_hashes"),
      info("rolling_hashes", "rolling_hashes(text, k, stride) - sampled Rabin rolling k-gram hashes; k and stride must be int literals"),
      (es: Seq[Expression]) =>
        RollingHashes(es(0), intLit("rolling_hashes", es(1), "k"),
          intLit("rolling_hashes", es(2), "stride"))))
}
