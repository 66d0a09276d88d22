package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Per-customer DBSCAN outlier features (SURVEY A31; reference
  * `advanced_features.py:274-300`): standardize (amount, hour) per
  * customer, DBSCAN(eps=0.5, min_samples=2), emit outlier ratio and
  * cluster count; customers with <5 txns get the (0.0, 1.0) defaults.
  *
  * Spark has no DBSCAN; per-group sizes are small (one customer's txns),
  * so the right distribution is `groupByKey.mapGroups` with an in-JVM
  * clustering — each group is one task-local O(m²) union-find, the
  * groups themselves scale out on the entity key.
  *
  * sklearn parity notes: StandardScaler uses population std and leaves
  * zero-variance dims unscaled (scale_=1); with min_samples=2 every
  * non-noise point is core, so clusters are exactly the connected
  * components (size >= 2) of the eps-neighborhood graph.
  */
object Clustering {

  def dbscanFeatures(tx: DataFrame, eps: Double = 0.5, minSamples: Int = 2): DataFrame = {
    val spark = tx.sparkSession
    import spark.implicits._
    tx.select(col("customer_id").cast("long"), col("amount").cast("double"),
        hour(col("event_timestamp")).cast("double"))
      .as[(Long, Double, Double)]
      .groupByKey(_._1)
      .mapGroups { (k, it) =>
        val pts = it.map(t => Array(t._2, t._3)).toArray
        if (pts.length < 5) (k, 0.0, 1.0)
        else {
          val m = pts.length
          val scaled = standardize(pts)
          // union-find over eps-neighbors
          val parent = Array.tabulate(m)(identity)
          def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
          val hasNeighbor = Array.fill(m)(false)
          val eps2 = eps * eps
          var i = 0
          while (i < m) {
            var j = i + 1
            while (j < m) {
              val dx = scaled(i)(0) - scaled(j)(0)
              val dy = scaled(i)(1) - scaled(j)(1)
              if (dx * dx + dy * dy <= eps2) {
                hasNeighbor(i) = true; hasNeighbor(j) = true
                val (ri, rj) = (find(i), find(j))
                if (ri != rj) parent(ri) = rj
              }
              j += 1
            }
            i += 1
          }
          val outliers = (0 until m).count(!hasNeighbor(_))
          val clusters = (0 until m).filter(hasNeighbor(_)).map(find).distinct.size
          (k, outliers.toDouble / m, clusters.toDouble)
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble, Encoders.scalaDouble))
      .toDF("customer_id", "behavioral_outlier_ratio", "behavioral_n_clusters")
  }

  private def standardize(pts: Array[Array[Double]]): Array[Array[Double]] = {
    val m = pts.length
    val dims = pts(0).length
    val out = Array.ofDim[Double](m, dims)
    var d = 0
    while (d < dims) {
      val mean = pts.map(_(d)).sum / m
      val varP = pts.map(p => (p(d) - mean) * (p(d) - mean)).sum / m
      val scale = if (varP == 0.0) 1.0 else math.sqrt(varP)
      var i = 0
      while (i < m) { out(i)(d) = (pts(i)(d) - mean) / scale; i += 1 }
      d += 1
    }
    out
  }
}
