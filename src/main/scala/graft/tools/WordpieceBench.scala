package graft.tools

import org.apache.spark.sql.functions._

/** Standalone A/B for the WordPiece trainer's per-round score join
  * (r21 VERDICT item 1): the driver measured t_wordpiece_train
  * 3.05 → 4.63 s after the explicit per-round double broadcast landed,
  * with the 8-core run BEATING the 32-core run (ratio 0.59) — the
  * anti-scaling signature of per-round broadcast-build jobs. This tool
  * times the three candidate strategies on the SAME session and corpus,
  * asserts their merge tables are row-identical, and dumps the
  * per-round argmax plan for each (the change previously had no plan
  * evidence: the trainer returns a LocalRelation, so fingerprints can't
  * see the per-round plan).
  *
  * Usage: sbt "runMain graft.tools.WordpieceBench [dataDir] [iters]"
  */
object WordpieceBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.build(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val strategies = Seq("collect", "broadcast", "plain")
    // warm shared scan/codegen paths once (outside any timed run)
    docs.count()

    // plan evidence: the round-1 argmax frame per strategy
    val planDir = java.nio.file.Paths.get("plans/r22")
    java.nio.file.Files.createDirectories(planDir)
    val vocab = graft.CacheScope.cache(
      docs.select(explode(graft.text.TextAnalysis.asciiTokens(col("text")))
          .as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("wc"))
        .select(graft.text.CorpusStats.charSpread(col("tok")).as("seq"),
          col("wc")))
    vocab.count()
    for (st <- strategies) {
      val frame = graft.text.CorpusStats.wordpieceRoundFrame(
        vocab, "cnt * 1000000000 div (sa * sb)", st)
      val plan = frame.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        planDir.resolve(s"t_wordpiece_train_round_$st.txt"),
        plan.getBytes("UTF-8"))
    }
    graft.CacheScope.releaseAll()
    spark.sharedState.cacheManager.clearCache()

    // equivalence: identical merge tables across strategies
    val tables = strategies.map { st =>
      val t = graft.text.CorpusStats
        .wordpieceTrain(docs, "text", 5, forceDecimalTier = false, st)
        .collect().map(_.toString).toSeq
      graft.CacheScope.releaseAll()
      spark.sharedState.cacheManager.clearCache()
      st -> t
    }.toMap
    for (st <- strategies.tail) {
      require(tables(st) == tables(strategies.head),
        s"merge tables differ: ${strategies.head} vs $st")
    }
    println(s"[wpbench] merge tables identical across " +
      s"${strategies.mkString("/")} (${tables(strategies.head).size} rows)")

    // timing: interleaved iterations (host drift hits all strategies
    // equally), first round discarded as warmup
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (i <- 0 to iters; st <- strategies) {
      val t0 = System.nanoTime()
      val n = graft.text.CorpusStats
        .wordpieceTrain(docs, "text", 5, forceDecimalTier = false, st)
        .count()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.CacheScope.releaseAll()
      spark.sharedState.cacheManager.clearCache()
      require(n == 5, s"trainer returned $n merges")
      if (i > 0) times(st) = times(st) :+ dt
      System.err.println(f"[wpbench] iter=$i $st%-10s $dt%.3fs")
    }
    for (st <- strategies) {
      val ts = times(st).sorted
      println(f"[wpbench] $st%-10s median=${ts(ts.size / 2)}%.3fs " +
        f"min=${ts.head}%.3fs max=${ts.last}%.3fs n=${ts.size}")
    }
    spark.stop()
  }
}
