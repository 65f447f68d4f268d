package graft
import org.apache.spark.sql.SparkSession

/** Plan-audit diagnostic: for each named gate query, print exchange /
  * broadcast / SMJ / reuse counts and the pushed parquet filters —
  * the quick "is this the plan I'd want at 100 TB" check
  * (`sbt "runMain graft.ExplainAudit q9_product_profit …"`). The
  * assertable invariants live in PlanAssertionsSpec; this main is for
  * eyeballing new queries before writing those assertions.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // First arg may be a data dir (an existing directory — not a
    // substring heuristic, which misrouted relative paths), so plans can
    // be audited at the gated scale factor; remaining args are query names.
    val (dir, names) =
      if (args.nonEmpty && java.nio.file.Files.isDirectory(
          java.nio.file.Paths.get(args.head))) (args.head, args.tail)
      else ("/root/testdata/sf0.001", args)
    for (q <- names) {
      println(s"===== $q =====")
      val df = SparkEntry.queries(q)(spark, dir)
      val p = df.queryExecution.executedPlan.toString
      val ex = "Exchange hashpartitioning".r.findAllIn(p).length
      val bj = "BroadcastHashJoin".r.findAllIn(p).length
      val smj = "SortMergeJoin".r.findAllIn(p).length
      val reuse = "ReusedExchange".r.findAllIn(p).length
      println(s"exchanges=$ex broadcastJoins=$bj smj=$smj reusedExchange=$reuse")
      val scans = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(p).toSeq
      scans.take(6).foreach(s => println("  " + s.take(120)))
    }
    spark.stop()
  }
}
