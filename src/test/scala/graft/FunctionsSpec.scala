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

  test("gini_agg native aggregate equals the relational and HOF forms") {
    GraftFunctions.register(spark)
    val tx = Tables.transactions(spark, "/root/testdata/sf0.001")
    // groupBy form vs Distribution.gini
    val native = tx.groupBy(col("customer_id").as("k"))
      .agg(expr("gini_agg(amount)").as("g"))
    val relational = graft.ops.Distribution.gini(tx, col("customer_id"), col("amount"), col("transaction_id"))
    assert(native.join(relational, "k")
      .where(abs(col("g") - col("gini")) > 1e-12).count() == 0)
    // window-frame form vs the HOF expression
    val w = Trailing.spec(col("customer_id"), col("event_timestamp"))
    val both = tx.select(
      expr("gini_agg(amount)").over(Trailing.lastSeconds(w, 604800)).as("native"),
      graft.ops.Distribution.giniOver(col("amount"), w, 604800).as("hof"))
    assert(both.where(abs(col("native") - col("hof")) > 1e-12).count() == 0)
  }
}
