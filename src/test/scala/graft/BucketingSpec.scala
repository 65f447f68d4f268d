package graft

import graft.io.Sinks
import org.apache.spark.sql.functions._

/** Bucketed co-located joins: writing both sides bucketed on the join key
  * removes the query-time shuffle entirely — verified on the physical plan.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned write enables partition pruning on read") {
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString
    Sinks.parquetSink(Tables.load(spark, sf0, "lineitem"), out,
      partitionCols = Seq("l_returnflag"))
    val pruned = spark.read.parquet(out).filter(col("l_returnflag") === "R")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(l_returnflag"),
      s"no partition pruning:\n$plan")
    val full = Tables.load(spark, sf0, "lineitem")
      .filter(col("l_returnflag") === "R").count()
    assert(pruned.count() == full)
  }

  test("join of two tables bucketed on the key plans without a shuffle") {
    val orders = Tables.load(spark, sf0, "orders")
    val lineitem = Tables.load(spark, sf0, "lineitem")
    Sinks.writeBucketed(orders, "orders_b", 4, Seq("o_orderkey"), Seq("o_orderkey"))
    Sinks.writeBucketed(lineitem, "lineitem_b", 4, Seq("l_orderkey"), Seq("l_orderkey"))

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
        !plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join still shuffles:\n$plan")
      // and the result matches the unbucketed join
      val expected = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect().toMap
      assert(joined.as[(String, Long)].collect().toMap == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
