package graft.ops

import graft.scale.Splits
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hashed feature crossings: combine categorical columns into one
  * bounded-cardinality bucket id (the hashing-trick cross of wide-model
  * feature engineering). md5-based like every other deterministic hash
  * in the engine — narrow, engine-portable, no vocabulary build pass,
  * which is what makes a cross usable on a 100 TB table (a dictionary
  * cross would need a distinct-scan and a broadcast of unbounded size).
  */
object Interactions {

  /** Bucket id in [0, buckets) for the cross of `parts` (joined with a
    *  separator that cannot occur in the categorical values). NULL-strict:
    * any NULL part yields a NULL bucket -- concat_ws alone would silently
    * SKIP nulls, colliding cross(NULL,"x") with cross("x",NULL) (and
    * diverging from SQL's null-propagating ||).
    */
  def crossBucket(buckets: Int, parts: Column*): Column =
    when(parts.map(_.isNotNull).reduce(_ && _),
      Splits.bucket(concat_ws("\u0001", parts.map(_.cast("string")): _*),
        salt = "cross", n = buckets))
}
