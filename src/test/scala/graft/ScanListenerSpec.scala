package graft

import org.apache.spark.sql.functions._

/** Live contract for the measured probe classifier (r18 VERDICT item 2):
  * `Bench.ScanTimeListener` attributes executor task run time to the
  * query named `current`, splitting scan-shaped tasks (no shuffle
  * records read or written) from shuffle participants. The task-end bus
  * is async, so assertions poll up to 5 s — the same slack the bench
  * gets from its per-query cache-release + GC window.
  */
class ScanListenerSpec extends SparkSpec {

  private def awaitFraction(lis: Bench.ScanTimeListener,
                            name: String): Option[Double] = {
    val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
    var f = lis.scanFraction(name)
    while (f.isEmpty && System.nanoTime() < deadline) {
      Thread.sleep(50)
      f = lis.scanFraction(name)
    }
    f
  }

  test("pure scan query measures scan-dominant; shuffle query does not") {
    val lis = new Bench.ScanTimeListener
    spark.sparkContext.addSparkListener(lis)
    try {
      lis.current = "t_scan_only"
      // scan-shaped: generate → project → filter → count (no exchange
      // of records between stages beyond the final driver-side count)
      spark.range(0L, 2L * 1000 * 1000, 1L, 4)
        .select(xxhash64(col("id")).as("h"))
        .filter(col("h") % 1000 === 0).count()
      lis.current = "t_shuffle_heavy"
      // shuffle-shaped: wide-key aggregation forces a real exchange
      spark.range(0L, 2L * 1000 * 1000, 1L, 4)
        .select(pmod(xxhash64(col("id")), lit(100000L)).as("k"))
        .groupBy("k").count().filter(col("count") < 0).count()
      lis.current = ""
      val scanF = awaitFraction(lis, "t_scan_only")
      val shufF = awaitFraction(lis, "t_shuffle_heavy")
      assert(scanF.exists(_ > 0.5), s"scan query fraction was $scanF")
      // the shuffle query's map AND reduce tasks both touch shuffle
      // records, so its scan fraction must be well under dominance
      assert(shufF.exists(_ < 0.5), s"shuffle query fraction was $shufF")
    } finally spark.sparkContext.removeSparkListener(lis)
  }

  test("tasks run while current is empty are not attributed") {
    val lis = new Bench.ScanTimeListener
    spark.sparkContext.addSparkListener(lis)
    try {
      spark.range(0L, 100000L, 1L, 2).count()
      Thread.sleep(300)
      assert(lis.scanFraction("").isEmpty)
    } finally spark.sparkContext.removeSparkListener(lis)
  }
}
