package graft

import graft.functions.GraftFunctions
import graft.ops.{CoreFeatures, Trailing}
import graft.tables.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("exact_distinct over range frames equals size(collect_set), groupBy equals countDistinct") {
    GraftFunctions.register(spark)
    val tx = Tables.transactions(spark, "/root/testdata/sf0.001")
    val w = Trailing.spec(col("customer_id"), col("event_timestamp"))
    val both = tx.select(
      expr("exact_distinct(ip_address)").over(Trailing.lastSeconds(w, 3600)).as("native"),
      CoreFeatures.distinctOver(col("ip_address"), w, 3600).as("workaround"))
    assert(both.where(col("native") =!= col("workaround")).count() == 0)

    val agg = tx.groupBy(col("customer_id"))
      .agg(expr("exact_distinct(merchant_id)").as("native"),
        countDistinct(col("merchant_id")).as("builtin"))
    assert(agg.where(col("native") =!= col("builtin")).count() == 0)
  }
}
