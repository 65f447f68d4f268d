package graft.tools

import org.apache.spark.sql.SparkSession

/** Whole-board plan audit (optimization rounds): for EVERY registered
  * batch query, count parquet scans per input table, exchanges, joins and
  * cached-relation reads in the executed plan — the systematic "which
  * query recomputes a corpus-sized subtree" sweep (guide §2.4/§7.2).
  * Streaming gates are skipped (their returned frame is a memory-sink
  * scan; plan cost lives in the run). Output: one TSV row per query on
  * stdout. Run at sf0.001 — plan SHAPE is what's audited.
  *
  * Usage: sbt "runMain graft.tools.ScanAudit [dataDir] [prefix]"
  */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val prefix = args.drop(1).headOption.getOrElse("")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("query\tparquet_scans\tdup_table_scans\texchanges\tbcast\tsmj\tbnl\tinmem")
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)
         if !name.startsWith("x_stream") && name.startsWith(prefix)) {
      try {
        val df = fn(spark, dir)
        val p = df.queryExecution.executedPlan.toString
        val scans = "Scan parquet[^\\n]*".r.findAllIn(p).toSeq
        val files = "file:[^\\]\\,\\s]+".r.findAllIn(p).toSeq
          .filter(_.contains(dir))
        val byFile = files.groupBy(identity).view.mapValues(_.size)
        val dup = byFile.count(_._2 > 1)
        val ex = "Exchange".r.findAllIn(p).length
        val bc = "BroadcastExchange".r.findAllIn(p).length
        val smj = "SortMergeJoin".r.findAllIn(p).length
        val bnl = "BroadcastNestedLoopJoin".r.findAllIn(p).length
        val im = "InMemoryTableScan".r.findAllIn(p).length
        println(s"$name\t${scans.size}\t$dup\t$ex\t$bc\t$smj\t$bnl\t$im")
      } catch { case e: Throwable =>
        // padded to the 8-column header so TSV parsers stay aligned
        // across an audit containing a failed query (ADVICE r21)
        println(s"$name\tERR\t${e.getClass.getSimpleName}\t-\t-\t-\t-\t-")
      }
      graft.CacheScope.releaseAll()
      spark.sharedState.cacheManager.clearCache()
    }
    graft.CacheScope.releaseSession()
    spark.stop()
  }
}
