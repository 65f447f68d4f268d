package graft.tools

import org.apache.spark.sql.SparkSession

/** Memory-pressure / spill certification (r16 VERDICT item 1): every gate
  * run to date fit in RAM (8 GB JVMs even at the 10× blow-up), so the
  * Tungsten spill paths a 100 TB deployment lives in — `UnsafeExternalSorter`
  * sort spills, hash-aggregate fallback to sort-aggregate, shuffle spill —
  * had never executed under any correctness gate. A wrong-result-under-spill
  * bug (a non-associative partial-merge, a sort-key mismatch that only
  * surfaces in spill-file merge) would be invisible to the whole board.
  *
  * Protocol:
  *  1. The parent (this JVM, the roomy 8 GB sbt heap) computes reference
  *     hashes for a spill-prone headline subset over the CLEAN 10× blow-up
  *     of sf0.1 (6M-row lineitem, 50k docs — sf1-equivalent), recording its
  *     own spill metrics (expected ≈0: nothing should spill at 8 GB).
  *  2. It spawns a CHILD JVM with `-Xmx1500m` (SPARK_GRAFT_SPILL_HEAP) and
  *     few, large shuffle partitions (SPARK_GRAFT_SPILL_PARTS, default 8,
  *     on local[8]) so per-task execution memory is ~1500m·0.6/8 ≈ 110 MB
  *     against multi-hundred-MB per-task sorts — the spill paths MUST
  *     engage. The child records per-query `memoryBytesSpilled` /
  *     `diskBytesSpilled` from its own task metrics and the same canonical
  *     result hash.
  *  3. The parent asserts (a) every query's child hash equals its
  *     reference hash, and (b) the child actually spilled — a run with
  *     zero spilled bytes anywhere proves nothing and FAILS the
  *     certification rather than passing vacuously.
  *
  * Usage: sbt "runMain graft.tools.SpillCertify" — env knobs:
  *   SPARK_GRAFT_SF_DIR        base corpus (default /root/testdata/sf0.1)
  *   SPARK_GRAFT_SPILL_FACTOR  blow-up factor (default 10; 1 = base dir)
  *   SPARK_GRAFT_SPILL_HEAP    child -Xmx (default 1500m)
  *   SPARK_GRAFT_SPILL_CPUS    child local[k] (default 8)
  *   SPARK_GRAFT_SPILL_PARTS   child shuffle partitions (default 8)
  * Exit 0 = certified (all hashes equal AND spill engaged); 1 otherwise.
  */
object SpillCertify {

  /** Spill-prone headline subset: full-partition window sorts, sort-merge
    * as-of, multi-join TPC-H shapes, line-grain explode shuffles, corpus
    * TF-IDF, packing, subword encode, media hashing — plus q1 (tiny-group
    * hash agg) as the deliberately-unspillable control row. All are
    * oracle-gated on the 219 board and plan-fingerprinted. */
  val certQueries: Seq[String] = Seq(
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
    "q_window_rank", "q_asof_join", "q_custom_topk_agg",
    "d_dedup_exact", "d_line_dedup", "t_tfidf_topk",
    "p_pack_sequences", "t_wordpiece_encode", "mm_phash_dedup")

  private class SpillListener extends org.apache.spark.scheduler.SparkListener {
    val mem = new java.util.concurrent.atomic.AtomicLong
    val disk = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(
        te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        mem.addAndGet(m.memoryBytesSpilled)
        disk.addAndGet(m.diskBytesSpilled)
      }
    }
  }

  /** Run the queries serially, hashing each and snapshotting the spill
    * counters per query (1 s listener-bus drain before each snapshot —
    * task-end events are delivered async). Returns
    * (name, hash, rows, memSpilled, diskSpilled, seconds). */
  private def runAll(spark: SparkSession, sfDir: String, names: Seq[String],
                     tag: String): Seq[(String, String, Long, Long, Long, Double)] = {
    val lis = new SpillListener
    spark.sparkContext.addSparkListener(lis)
    val heapMax = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    System.err.println(s"[$tag] heap max = ${heapMax} MB, " +
      s"shuffle.partitions = ${spark.conf.get("spark.sql.shuffle.partitions")}, " +
      s"defaultParallelism = ${spark.sparkContext.defaultParallelism}")
    names.map { name =>
      val t0 = System.nanoTime()
      val (h, rows) =
        try {
          if (name == "__probe__") {
            // synthetic guaranteed-spill: a 30M-DISTINCT-group aggregation
            // whose hash map (~1 GB) cannot fit a small heap, forcing the
            // hash-agg → sort-agg fallback and shuffle spill — validates
            // the listener/metric path itself (a global orderBy would be
            // optimized away under count by EliminateSorts)
            import org.apache.spark.sql.functions._
            val n = spark.range(0L, 30L * 1000 * 1000, 1L, 8)
              .select(xxhash64(col("id")).as("k"), col("id"))
              .groupBy("k").agg(sum("id").as("s"))
              .filter(col("s") < 0).count()
            (s"probe-$n", n)
          } else
            ResultHash.of(graft.SparkEntry.queries(name)(spark, sfDir))
        } catch { case e: Throwable =>
          System.err.println(s"[$tag] $name FAILED: ${e.getMessage}")
          ("ERROR:" + e.getClass.getSimpleName, -1L)
        }
      val sec = (System.nanoTime() - t0) / 1e9
      graft.CacheScope.releaseAll()
      spark.sharedState.cacheManager.clearCache()
      Thread.sleep(1000) // drain async task-end events before the snapshot
      val (m, d) = (lis.mem.getAndSet(0L), lis.disk.getAndSet(0L))
      System.err.println(f"[$tag] $name%-22s rows=$rows%8d memSpilled=${m / 1048576}%6d MB diskSpilled=${d / 1048576}%6d MB ($sec%.1fs)")
      (name, h, rows, m, d, sec)
    }
  }

  private def childMain(runDir: java.nio.file.Path): Unit = {
    val conf = new String(java.nio.file.Files.readAllBytes(
      runDir.resolve("spill.conf")), "UTF-8").trim.split("\n")
    val (sfDir, cpus, parts) = (conf(0), conf(1), conf(2))
    val names = conf(3).split(",").toSeq
    // multi-JVM mode (r18): line 5 may carry a local-cluster master +
    // executor memory — spill then engages inside SEPARATE executor
    // processes, with shuffle blocks fetched across JVMs, the closest
    // local approximation of a memory-starved production executor.
    val master = if (conf.length > 4 && conf(4).nonEmpty) conf(4)
                 else s"local[$cpus]"
    val execMem = if (conf.length > 5) Some(conf(5)).filter(_.nonEmpty)
                  else None
    var b = SparkSession.builder().master(master)
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    if (master.startsWith("local-cluster"))
      b = graft.Sessions.wireLocalCluster(b, execMem)
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rs = runAll(spark, sfDir, names, "spill-child")
    val out = rs.map { case (n, h, r, m, d, s) =>
      f"$n\t$h\t$r\t$m\t$d\t$s%.2f" }.mkString("", "\n", "\n")
    java.nio.file.Files.write(runDir.resolve("child_results.tsv"),
      out.getBytes("UTF-8"))
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("child")) {
      childMain(java.nio.file.Paths.get(args(1))); return
    }
    val sfBase = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SPILL_FACTOR", "10").toInt
    val heap = sys.env.getOrElse("SPARK_GRAFT_SPILL_HEAP", "1500m")
    val childCpus = sys.env.getOrElse("SPARK_GRAFT_SPILL_CPUS", "8")
    val childParts = sys.env.getOrElse("SPARK_GRAFT_SPILL_PARTS", "8")
    val names = if (args.isEmpty) certQueries
                else if (args.contains("__probe__")) Seq("__probe__")
                else certQueries.filter(n => args.exists(n.startsWith))
    val spark = graft.Sessions.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val dir = if (factor <= 1) sfBase
              else graft.ScaleBench.ensureBlowup(spark, sfBase, factor)
    System.err.println(s"[spill] corpus: $dir (factor $factor), " +
      s"child heap $heap, local[$childCpus], $childParts shuffle partitions")

    val ref = runAll(spark, dir, names, "spill-ref")
    val refSpill = ref.map(r => r._4 + r._5).sum

    // optional multi-JVM child: SPARK_GRAFT_SPILL_MASTER (e.g.
    // 'local-cluster[2,2,4096]') + SPARK_GRAFT_SPILL_EXEC_MEM (e.g.
    // '1500m') starve the EXECUTOR processes instead of the child
    // driver; the -Xmx child heap then only bounds the driver side
    val childMaster = sys.env.getOrElse("SPARK_GRAFT_SPILL_MASTER", "")
    val childExecMem = sys.env.getOrElse("SPARK_GRAFT_SPILL_EXEC_MEM", "")
    if (childMaster.nonEmpty)
      System.err.println(s"[spill] child master: $childMaster" +
        (if (childExecMem.nonEmpty) s", executor memory $childExecMem"
         else ""))
    val runDir = java.nio.file.Files.createTempDirectory("graft-spill-")
    java.nio.file.Files.write(runDir.resolve("spill.conf"),
      (s"$dir\n$childCpus\n$childParts\n${names.mkString(",")}\n" +
        s"$childMaster\n$childExecMem\n").getBytes("UTF-8"))
    val jvmArgs = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments
    val cmd = new java.util.ArrayList[String]()
    cmd.add(System.getProperty("java.home") + "/bin/java")
    jvmArgs.forEach { a =>
      // strip inherited heap sizing (the whole point is a SMALL child
      // heap) and any debug agent; keep --add-opens etc.
      if (!a.startsWith("-agentlib") && !a.startsWith("-Xmx") &&
          !a.startsWith("-Xms")) cmd.add(a)
    }
    cmd.add(s"-Xmx$heap")
    cmd.add("-cp"); cmd.add(System.getProperty("java.class.path"))
    cmd.add("graft.tools.SpillCertify"); cmd.add("child")
    cmd.add(runDir.toString)
    val child = new ProcessBuilder(cmd).inheritIO().start()
    val exit = child.waitFor()
    if (exit != 0) {
      System.err.println(s"[spill] FAIL: child JVM exited $exit " +
        "(OOM or crash under pressure — that is itself a finding)")
      spark.stop(); sys.exit(1)
    }
    val got = new String(java.nio.file.Files.readAllBytes(
        runDir.resolve("child_results.tsv")), "UTF-8")
      .trim.split("\n").map { l =>
        val f = l.split("\t")
        f(0) -> (f(1), f(2).toLong, f(3).toLong, f(4).toLong, f(5).toDouble)
      }.toMap

    System.err.println(f"[spill] ${"query"}%-22s ${"rows"}%9s ${"hash"}%6s ${"memSpill"}%10s ${"diskSpill"}%10s ${"child s"}%8s")
    var allMatch = true
    var totalSpill = 0L
    var spilled = 0
    ref.foreach { case (n, refH, refRows, _, _, _) =>
      got.get(n) match {
        case Some((h, rows, m, d, s)) =>
          val okH = h == refH && rows == refRows
          allMatch &&= okH
          totalSpill += m + d
          if (m + d > 0) spilled += 1
          System.err.println(f"[spill] $n%-22s $rows%9d ${if (okH) "EQUAL" else "DIFF!"}%6s ${m / 1048576}%8d MB ${d / 1048576}%8d MB $s%8.1f")
        case None =>
          allMatch = false
          System.err.println(f"[spill] $n%-22s MISSING from child results")
      }
    }
    val engaged = totalSpill > 0
    System.err.println(
      f"[spill] reference-run spill (8G heap): ${refSpill / 1048576} MB; " +
        f"pressured-run spill ($heap): ${totalSpill / 1048576} MB across " +
        s"$spilled/${names.size} queries")
    val ok = allMatch && engaged
    System.err.println("[spill] " + (if (ok)
      "CERTIFIED: all hashes identical under memory pressure AND the spill paths demonstrably engaged"
    else if (!engaged)
      "FAIL: nothing spilled — the run proves nothing (shrink SPARK_GRAFT_SPILL_HEAP or partitions)"
    else "FAIL: result diverged under spill — wrong-result-under-pressure defect"))
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
