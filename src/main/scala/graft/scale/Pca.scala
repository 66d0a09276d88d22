package graft.scale

import graft.scoring.KMeansOps.r6d
import org.apache.spark.sql.{Column, DataFrame}

/** Top principal component of an embedding corpus via power iteration on
  * the covariance matrix — the dimensionality screen an embedding
  * pipeline runs before index build / whitening (an engine extension,
  * like the dim-correlation screen in [[Similarity.dimCorrPairs]]).
  *
  * Scale shape: ONE distributed pass — the mergeable
  * [[graft.functions.GramAgg]] — reduces the n×d corpus to a d(d+3)/2+2
  * double buffer; everything after is O(d²) model-size arithmetic on the
  * driver (the [[graft.scoring.Trainer]]/[[graft.scoring.KMeansOps]]
  * convention: per-step driver state bounded by MODEL size, the data
  * never moves and is never re-read). At d = 64 the "matrix" is 32 KB;
  * the eigensolve is not distributed work, the Gram pass is.
  *
  * Cross-engine determinism (the q170/q172 recipe): every covariance
  * entry is rounded to the 4dp quantum before iteration; each iterate is
  * L2-normalized then re-rounded, so both engines walk the same rounded
  * chain and summation-order noise (~1e-15 per 64-term dot) stays far
  * below the quantum. Fixed iteration count, no convergence test; the
  * sign is pinned by the all-ones start vector.
  */
object Pca {

  /** Fitted component: 4dp loadings, Rayleigh-quotient eigenvalue,
    * explained-variance ratio λ / trace(cov), and the 4dp per-dim means
    * of the fit population (the centering vector a reconstruction-error
    * scorer needs).
    */
  final case class Component(loadings: Array[Double], lambda: Double,
      explainedRatio: Double, n: Long, d: Int,
      means: Array[Double] = Array.empty)

  def topComponent(corpus: DataFrame, emb: Column, iters: Int): Component =
    topComponents(corpus, emb, k = 1, iters).head

  /** Top-k components via power iteration with Hotelling deflation —
    * the k-dimensional "bottleneck" of the closed-form autoencoder
    * stand-in. After each component, the (rounded) covariance is
    * deflated with the ROUNDED λ and loadings — every input to the
    * deflation is a 4dp-exact double, so both engines produce the
    * bit-identical deflated matrix and walk the same chain for the next
    * component. Still ONE distributed Gram pass total; the k eigensolves
    * are O(k·d²) driver arithmetic. Requires k ≤ numerical rank: a
    * deflated matrix whose power iterate collapses to zero norm raises.
    */
  def topComponents(corpus: DataFrame, emb: Column, k: Int, iters: Int)
      : Seq[Component] = {
    require(iters >= 1, s"Pca.topComponents: iters must be >= 1, got $iters")
    require(k >= 1, s"Pca.topComponents: k must be >= 1, got $k")
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val g = corpus
      .agg(column(graft.functions.GramAgg(expression(emb))
        .toAggregateExpression()).as("g"))
      .head().getSeq[Double](0)
    val n = g(0)
    val d = g(1).toInt
    require(d >= 2 && n >= 2, s"Pca.topComponents: need n >= 2, d >= 2 (n=$n, d=$d)")
    require(k <= d, s"Pca.topComponents: k=$k exceeds dimensionality d=$d")
    // cov(i,j) = E[x_i x_j] − E[x_i]E[x_j] from the flat Gram layout
    // [n, d, sums, upper-triangle product sums], rounded to the quantum
    val c = Array.ofDim[Double](d, d)
    for (i <- 0 until d; j <- i until d) {
      val ps = g(2 + d + i * d - i * (i - 1) / 2 + (j - i))
      val cij = r6d(ps / n - (g(2 + i) / n) * (g(2 + j) / n))
      c(i)(j) = cij
      c(j)(i) = cij
    }
    val trace = (0 until d).map(i => c(i)(i)).sum
    val means = Array.tabulate(d)(i => r6d(g(2 + i) / n))
    (1 to k).map { comp =>
      var v = Array.fill(d)(1.0)
      for (_ <- 1 to iters) {
        val u = Array.tabulate(d)(i => (0 until d).map(j => c(i)(j) * v(j)).sum)
        val nm = math.sqrt(u.map(x => x * x).sum)
        require(nm > 0,
          s"Pca.topComponents: power iterate collapsed at component $comp " +
            "(zero-variance corpus or k above numerical rank)")
        v = u.map(x => r6d(x / nm))
      }
      val lamRaw =
        (for (i <- 0 until d; j <- 0 until d) yield v(i) * c(i)(j) * v(j)).sum
      val lam = r6d(lamRaw)
      // deflate IN PLACE with the rounded λ/v (4dp-exact inputs → the
      // next component's matrix is bit-identical on any IEEE engine);
      // skipped after the last component — nothing reads it
      if (comp < k)
        for (i <- 0 until d; j <- 0 until d)
          c(i)(j) = r6d(c(i)(j) - lam * v(i) * v(j))
      // ratio keeps the RAW Rayleigh quotient (the q187 oracle contract)
      Component(v, lam, r6d(lamRaw / trace), n.toLong, d, means)
    }
  }

  /** Squared reconstruction residual ||x−μ||² − ((x−μ)·v)² of an
    * embedding against a fitted component — the closed-form autoencoder
    * reconstruction-error anomaly score (a rank-1 "decoder": what the
    * component can't reproduce). Expanded to xx − 2xμ + μμ − (xv − μv)²
    * so the per-row work is three codegen [[Similarity.dot]] kernels
    * against literal model arrays — a join-free narrow pass; the μμ/μv
    * constants are model-size driver arithmetic.
    */
  def reconstructionError(emb: Column, c: Component): Column =
    reconstructionError(emb, Seq(c))

  /** k-component residual ||x−μ||² − Σ_c ((x−μ)·v_c)² — the k-dim
    * bottleneck's reconstruction error (all components share the fit
    * means). One extra ArrayDot kernel per component, still join-free.
    */
  def reconstructionError(emb: Column, cs: Seq[Component]): Column = {
    import org.apache.spark.sql.functions.{array, lit}
    require(cs.nonEmpty, "reconstructionError: no components")
    val m = cs.head.means
    require(m.length == cs.head.d,
      s"reconstructionError: component carries ${m.length} means for d=${cs.head.d}")
    cs.foreach { c =>
      require(c.d == cs.head.d && java.util.Arrays.equals(c.means, m),
        "reconstructionError: components come from different fits " +
          s"(d=${c.d} vs ${cs.head.d} or differing means)")
    }
    val mL = array(m.toIndexedSeq.map(lit): _*)
    val mm = m.map(x => x * x).sum
    val base = Similarity.dot(emb, emb) - lit(2.0) * Similarity.dot(emb, mL) +
      lit(mm)
    cs.foldLeft(base) { (acc, c) =>
      val vL = array(c.loadings.toIndexedSeq.map(lit): _*)
      val mv = m.zip(c.loadings).map { case (a, b) => a * b }.sum
      val proj = Similarity.dot(emb, vL) - lit(mv)
      acc - proj * proj
    }
  }
}
