package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Brute-force exact top-k is the correctness baseline: broadcast the
  * (small) query set, compute cosine with higher-order array expressions
  * (zip_with + aggregate — codegen'd, no UDF), take per-query top-k with
  * one window. The scale path buckets the corpus with random-hyperplane
  * LSH so the per-query scan touches only colliding buckets.
  */
object Similarity {

  /** dot(a,b) accumulated in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  /** Divisions kept left-associated (dot/|a|/|b|) so the oracle SQL can
    * reproduce bit-identical doubles.
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / norm(a) / norm(b)

  /** Exact cosine top-k: for each query vector, the k nearest corpus
    * vectors (self excluded), ties broken by corpus id.
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = corpus.select(col("vec_id").as("nbr_id"), col("embedding").as("ce"))
      .crossJoin(broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"))))
      .where(col("nbr_id") =!= col("query_id"))
      .select(col("query_id"), col("nbr_id"), cosine(col("qe"), col("ce")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Random-hyperplane LSH signature: bit p is the sign of the projection
    * onto plane p, whose components are deterministic pseudo-randoms in
    * [-1,1) derived from md5(p:dim) — reproducible anywhere, no RNG state.
    */
  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  def lshSignature(emb: Column, planes: Int, dim: Int): Column = {
    val bits = (0 until planes).map { p =>
      val proj = (0 until dim).map { d =>
        val u = java.lang.Long.parseLong(md5Hex(s"$p:$d").substring(0, 15), 16)
        val coef = (u.toDouble / (1L << 60).toDouble) * 2.0 - 1.0
        element_at(emb, d + 1).cast("double") * lit(coef)
      }.reduce(_ + _)
      when(proj > 0, lit(1L << p)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** Bucketed approximate top-k: candidates share the query's LSH bucket;
    * exact cosine within the bucket. Recall vs [[cosineTopK]] is asserted
    * in tests.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, planes: Int, dim: Int): DataFrame = {
    val cb = corpus.select(col("vec_id").as("nbr_id"), col("embedding").as("ce"),
      lshSignature(col("embedding"), planes, dim).as("bucket"))
    val qb = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"),
      lshSignature(col("embedding"), planes, dim).as("bucket"))
    val scored = cb.join(broadcast(qb), Seq("bucket"))
      .where(col("nbr_id") =!= col("query_id"))
      .select(col("query_id"), col("nbr_id"), cosine(col("qe"), col("ce")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
