package graft.scale

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines: md5-bucket the
  * record id (salted). Narrow, no RNG state, identical on any engine /
  * cluster size / run — the properties a reproducible 100 TB train/test
  * split needs (`sample()` has none of them: it is partitioning-dependent
  * and unrepeatable across engines).
  */
object Splits {
  def bucket(id: Column, salt: String = "split", n: Int = 100): Column =
    conv(substring(md5(concat(lit(s"$salt:"), id.cast("string"))), 1, 8), 16, 10)
      .cast("long") % n

  /** 80/10/10 train/valid/test assignment. */
  def assign(b: Column): Column =
    when(b < 80, "train").when(b < 90, "valid").otherwise("test")
}
