package graft

import graft.scale.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals direct aggregation") {
    // 90% of rows share one hot key
    val df = (1 to 1000).map(i =>
      (if (i <= 900) "hot" else s"k$i", i.toDouble, i.toLong))
      .toDF("k", "v", "id")
    val direct = df.groupBy("k")
      .agg(sum($"v").as("sum_v"), count(lit(1)).as("cnt"))
      .as[(String, Double, Long)].collect().map { case (k, s, c) => k -> (s, c) }.toMap
    val salted = Skew.saltedSumCount(df, Seq("k"), "v", 8, $"id")
      .as[(String, Double, Long)].collect().map { case (k, s, c) => k -> (s, c) }.toMap
    assert(salted == direct)
  }

  test("salted join equals plain join") {
    val big = (1 to 500).map(i => (if (i % 2 == 0) "hot" else s"k$i", i.toLong))
      .toDF("k", "id")
    val small = Seq(("hot", "H"), ("k1", "A"), ("k3", "B")).toDF("k", "tag")
    val plain = big.join(small, Seq("k")).select("id", "tag")
      .as[(Long, String)].collect().sorted
    val salted = Skew.saltedJoin(big, small, "k", 4, $"id").select("id", "tag")
      .as[(Long, String)].collect().sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("deterministic salt is retry-stable and bounded") {
    val df = (1 to 100).map(_.toLong).toDF("id")
    val s1 = df.select(Skew.salt(8, $"id").as("s")).as[Int].collect()
    val s2 = df.select(Skew.salt(8, $"id").as("s")).as[Int].collect()
    assert(s1.toSeq == s2.toSeq)
    assert(s1.forall(s => s >= 0 && s < 8))
  }
}
