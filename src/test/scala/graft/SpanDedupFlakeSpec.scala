package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Regression harness for the intermittent empty-dup-set result observed
  * in removeDuplicateSpans under AQE (round 8): the op's agg + left-semi
  * dup detection sporadically evaluated empty for a whole run. Loops the
  * op against the known answer on sf0.001 (57 docs carry cross-doc
  * 5-gram spans).
  */
class SpanDedupFlakeSpec extends SparkSpec {

  test("removeDuplicateSpans finds the same dup set on every evaluation") {
    val docs = Tables.load(spark, sf0, "documents")
    val expected = 57L
    (1 to 12).foreach { i =>
      val n = Dedup.removeDuplicateSpans(docs, "text", "doc_id", n = 5)
        .filter(col("n_removed") > 0).count()
      CacheScope.releaseAll()
      assert(n == expected, s"iteration $i: $n docs with removed spans")
    }
  }
}
