package graft

import org.apache.spark.sql.functions._

/** Contract for the bench's dual-probe classifier (r17 VERDICT item 3):
  * `Bench.scanBroadcastClass` decides which calibration probe normalizes
  * a query — probe 1 (sort/agg/shuffle) or probe 2 (scan/broadcast). A
  * misclassification silently re-bases that query's `rollmin_norm_c`
  * history, so pin the decision boundary on representative plan shapes
  * rather than trusting the operator-name set by eye.
  */
class ProbeClassSpec extends SparkSpec {

  test("pure scan/filter/project is scan-class") {
    val df = spark.range(1000)
      .select(col("id"), (col("id") * 2).as("x"))
      .filter(col("x") > 10)
    assert(Bench.scanBroadcastClass("q_x", df))
  }

  test("broadcast join with expression-heavy projection is scan-class") {
    val dim = spark.range(100).select(col("id").as("k"), xxhash64(col("id")).as("v"))
    val df = spark.range(1000)
      .select(col("id"), pmod(col("id"), lit(100)).as("k"))
      .join(broadcast(dim), "k")
      .select(xxhash64(col("id"), col("v")).as("h"))
    assert(Bench.scanBroadcastClass("q_x", df))
  }

  test("groupBy aggregation is shuffle-class") {
    val df = spark.range(1000)
      .groupBy(pmod(col("id"), lit(10)).as("k")).agg(sum("id").as("s"))
    assert(!Bench.scanBroadcastClass("q_x", df))
  }

  test("global sort is shuffle-class") {
    val df = spark.range(1000).orderBy(col("id").desc).toDF()
    assert(!Bench.scanBroadcastClass("q_x", df))
  }

  test("window function is shuffle-class") {
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(1000)
      .select(col("id"), pmod(col("id"), lit(10)).as("k"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("k").orderBy("id")))
    assert(!Bench.scanBroadcastClass("q_x", df))
  }

  test("sort-merge join is shuffle-class") {
    // disable auto-broadcast so the join plans as SMJ
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = spark.range(1000).select(col("id").as("k"))
      val b = spark.range(1000).select(col("id").as("k"), col("id").as("v"))
      assert(!Bench.scanBroadcastClass("q_x", a.join(b, "k")))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("streaming gates are pinned shuffle-class regardless of plan") {
    val df = spark.range(10).select(col("id"))
    assert(!Bench.scanBroadcastClass("x_stream_window", df))
  }

  test("classification never throws on an unplannable frame") {
    // a frame whose planning fails must classify (conservatively) as
    // shuffle-class, not kill the bench
    val df = spark.range(10).filter(expr("assert_true(id < 5)").isNull).toDF()
    Bench.scanBroadcastClass("q_x", df) // must not throw
  }
}
