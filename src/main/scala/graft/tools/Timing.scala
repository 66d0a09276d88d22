package graft.tools
import org.apache.spark.sql.SparkSession

/** Ad-hoc repeated-run timer for plan investigation (not part of the
  * driver contract; Bench stays the official single-pass benchmark).
  */
object Timing {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_COALESCE", "64k"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10000000L).selectExpr("sum(id)").collect()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qs = if (args.nonEmpty) args.toSeq else Seq("q01_txn_counts")
    for (q <- qs; rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val df =
        if (q == "kernel37") // one-pass kernel vs the q37 window form
          graft.ops.MultiWindow.fullViewOnePass(graft.tables.Tables.transactions(spark, dir))
        else graft.SparkEntry.queries(q)(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      println(f"$q rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
