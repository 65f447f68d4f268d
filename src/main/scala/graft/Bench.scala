package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  * Per-query progress goes to stderr so a hung/slow query is identifiable.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up codegen/scan paths so the alphabetically-first query doesn't
    // absorb JVM+session startup in its timing.
    try {
      Tables.all.foreach(t => Tables.load(spark, sfDir, t).count())
    } catch { case e: Throwable =>
      System.err.println(s"[bench] warmup failed: ${e.getMessage}")
    }
    // Optional arg: only run queries whose name starts with the prefix
    // (focused timing runs while iterating).
    val prefix = args.headOption.getOrElse("")
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1.startsWith(prefix)).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val n = try fn(spark, sfDir).count()
               catch { case e: Throwable =>
                 System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-24s $sec%8.2fs  rows=$n")
      name -> sec
    }
    val total = results.map(_._2).sum
    def fmt(prec: String, v: Double): String =
      String.format(java.util.Locale.ROOT, prec, Double.box(v))
    def json(rs: Seq[(String, Double)], prec: String): String = {
      val qs = rs.map { case (k, v) => "\"" + k + "\":" + fmt(prec, v) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(prec, total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    }
    // Full per-query timings go to a file: the driver's stdout capture keeps
    // only a ~2k-char tail, which truncated the 90-query JSON line from the
    // front in rounds 1-2 ("parsed": null). The file is the machine-readable
    // record; stdout carries a compact headline subset that fits the tail.
    val outFile = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.out.json"))
    java.nio.file.Files.write(outFile, json(results, "%.6f").getBytes("UTF-8"))
    System.err.println(s"[bench] full timings -> ${outFile.toAbsolutePath}")
    val headline = Set(
      "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
      "q14_promo_revenue", "q_window_rank", "q_range_join", "q_asof_join",
      "q_custom_topk_agg", "d_dedup_exact", "d_minhash_pairs",
      "d_ngram_jaccard", "d_embed_neardup", "s_knn_brute", "s_knn_lsh",
      "m_avro_roundtrip", "m_grok", "t_quality_score", "mm_media_stats")
    println(json(results.filter(r => headline(r._1)), "%.3f"))
    spark.stop()
  }
}
