package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Executor-loss / non-graceful-stop fault injection (r15 VERDICT items
  * 2 and 6): the 100 TB deployment's daily reality is tasks dying
  * mid-query — executor JVMs OOM-killed, nodes preempted, drivers
  * crashing between micro-batches — and before this tool nothing in the
  * harness had ever *died* mid-run: local-cluster certified the process
  * boundary, the restart gates certified PLANNED stop/resume. Three
  * modes, each asserting the result hash is UNCHANGED by the fault:
  *
  *  - `batch`: under `local-cluster[2,8,*]`, SIGKILL one executor JVM
  *    mid-query (task retry + shuffle-stage recompute + Master executor
  *    relaunch must all engage) on a multi-stage batch query.
  *  - `stream`: same kill, mid-stream, on the production append gate
  *    (`x_stream_window_append`) — state-store recovery: the dead
  *    executor's loaded state is gone; the replacement must reload it
  *    from the checkpoint (run with SPARK_GRAFT_STATE_PROVIDER=rocksdb
  *    for the production provider).
  *  - `stream-total`: SIGKILL EVERY executor at once mid-stream (node
  *    preemption / spot reclaim): zero survivors carry loaded state, the
  *    app must finish on Master-relaunched executors — exercised on the
  *    merging session gate, the stateful family's hardest member.
  *  - `crash`: NON-GRACEFUL driver stop — phase 1 of the checkpointed
  *    restart runs in a SPAWNED child JVM that `Runtime.halt(9)`s
  *    mid-replay (no StreamingQuery.stop, no shutdown hooks, checkpoint
  *    possibly holding an offsets entry with no matching commit); the
  *    parent resumes from that torn checkpoint and the two-phase output
  *    must hash-equal a continuous single-run of the same aggregation
  *    (the exact gate aggregation — [[graft.queries.CorpusQueries
  *    .windowedAppendAgg]] / [[graft.queries.CorpusQueries
  *    .sessionAppendAgg]] — so there is no drift from the oracle-gated
  *    x_stream_restart family). Variants: `crash-early` halts after the
  *    FIRST data batch (the earliest possible torn checkpoint);
  *    `crash-session` recovers MERGING session-window state.
  *
  * Usage (see tools/fault_injection.sh):
  *   SPARK_GRAFT_MASTER=local-cluster[2,8,8192] \
  *     sbt "runMain graft.tools.FaultInjection batch <sfDir> [seed]"
  *   sbt "runMain graft.tools.FaultInjection crash <sfDir>"
  * Exit 0 = every asserted hash matched; non-zero = divergence or a
  * non-recoverable failure (a real defect).
  */
object FaultInjection {

  private def executorHandles(): Seq[ProcessHandle] = {
    import scala.jdk.CollectionConverters._
    ProcessHandle.current().descendants().iterator().asScala.filter { ph =>
      ph.info().commandLine().map[Boolean](
        _.contains("CoarseGrainedExecutorBackend")).orElse(false)
    }.toSeq
  }

  /** Canonical result hash: sorted row renderings → md5 (shared
    * [[ResultHash]] canonical form). */
  private def hashOf(df: DataFrame): (String, Long) = ResultHash.of(df)

  private def killOneExecutor(seed: Long): Boolean = {
    val ex = executorHandles()
    if (ex.isEmpty) { System.err.println("[fault] no executor JVMs found to kill"); false }
    else {
      val victim = ex((seed % ex.size).toInt.abs)
      System.err.println(s"[fault] SIGKILL executor pid=${victim.pid()} " +
        s"(of ${ex.size} executors)")
      victim.destroyForcibly()
      true
    }
  }

  /** TOTAL executor loss: SIGKILL every executor JVM at once — the
    * whole-node-preempted / spot-reclaim case. The app must survive on
    * Master-relaunched executors with zero survivors carrying state. */
  private def killAllExecutors(): Boolean = {
    val ex = executorHandles()
    if (ex.isEmpty) { System.err.println("[fault] no executor JVMs found to kill"); false }
    else {
      System.err.println(s"[fault] SIGKILL ALL ${ex.size} executors " +
        s"(pids ${ex.map(_.pid()).mkString(",")})")
      ex.foreach(_.destroyForcibly())
      true
    }
  }

  /** Run `build` once clean, once with executor(s) killed mid-run; assert
    * identical hashes. The kill must demonstrably land MID-RUN (advice
    * r16): a JIT-warm faulted run coasting on the clean run's CacheScope
    * caches can finish before the sleep elapses, in which case the SIGKILL
    * lands after the result is collected and the hash comparison asserts
    * nothing about recovery. Guards: (a) operator-internal caches are
    * released between the clean and faulted runs, so the faulted run
    * recomputes; (b) `fut.isCompleted` is checked BEFORE the kill — a
    * completed run is discarded and retried with an earlier kill point
    * (40% → 20% → 8% of clean wall time); if no attempt lands mid-run the
    * configuration FAILS loudly instead of passing vacuously. */
  private def killDuring(tag: String, seed: Long, killAll: Boolean = false)
                        (build: => DataFrame): Boolean = {
    val t0 = System.nanoTime()
    val cleanDf = build
    val spark = cleanDf.sparkSession
    val (cleanHash, cleanRows) = hashOf(cleanDf)
    val cleanSec = (System.nanoTime() - t0) / 1e9
    System.err.println(
      f"[fault] $tag clean: $cleanRows rows hash=$cleanHash ($cleanSec%.1fs)")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    var result: Option[(String, Long)] = None
    var killed = false
    val fracs = Seq(0.4, 0.2, 0.08)
    for (frac <- fracs if result.isEmpty) {
      // the faulted run must recompute, not read the clean run's caches
      graft.CacheScope.releaseAll()
      spark.sharedState.cacheManager.clearCache()
      val fut = Future(hashOf(build))
      Thread.sleep(math.max(100L, (cleanSec * 1000 * frac).toLong))
      if (fut.isCompleted) {
        System.err.println(
          f"[fault] $tag: faulted run finished BEFORE the ${frac * 100}%.0f%% " +
            "kill point (warm rerun outran the clean timing) — discarding " +
            "and retrying with an earlier kill, a post-completion kill " +
            "asserts nothing")
      } else {
        killed = if (killAll) killAllExecutors() else killOneExecutor(seed)
        result = Some(Await.result(fut, (cleanSec * 20 + 300).seconds))
      }
    }
    result match {
      case None =>
        System.err.println(s"[fault] $tag: FAIL (no kill landed mid-run " +
          s"after ${fracs.size} attempts — vacuous-pass guard)")
        false
      case Some((faultHash, faultRows)) =>
        System.err.println(
          s"[fault] $tag under executor loss: $faultRows rows hash=$faultHash")
        val ok = killed && faultHash == cleanHash
        System.err.println(s"[fault] $tag: " +
          (if (ok) "PASS (hash unchanged across mid-run executor SIGKILL)"
           else "FAIL (hash diverged, executor survived, or no kill)"))
        ok
    }
  }

  // ---------------------------------------------------------------- crash
  /** Child-JVM entry for `crash` mode: starts the gate aggregation over
    * the published input, and HALTS the JVM (exit 9, no shutdown hooks,
    * no graceful stop) after the second data-bearing micro-batch commits
    * — mid-replay by construction (4 quartile files, 1 per trigger). */
  private def aggFor(kind: String): DataFrame => DataFrame = kind match {
    case "session" => graft.queries.CorpusQueries.sessionAppendAgg
    case _ => graft.queries.CorpusQueries.windowedAppendAgg
  }

  private def crashChild(runDir: java.nio.file.Path): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.Sessions.stateProviderClass.foreach(p =>
      s.conf.set("spark.sql.streaming.stateStore.providerClass", p))
    // mirror the changelog-checkpointing mode in the CHILD too (default
    // ON since r18 — Sessions.rocksdbChangelogEnabled): without this the
    // child's phase 1 would write snapshot-mode checkpoints while the
    // parent's resume runs changelog-mode — a useful conf-migration
    // recovery case (kept green in PLANS r17) but not the pure
    // same-mode crash certification the default run asserts
    s.conf.set("spark.sql.streaming.stateStore.rocksdb" +
      ".changelogCheckpointing.enabled",
      graft.Sessions.rocksdbChangelogEnabled.toString)
    val schema = org.apache.spark.sql.types.DataType.fromJson(
      new String(java.nio.file.Files.readAllBytes(
        runDir.resolve("schema.json")), "UTF-8"))
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val conf = new String(java.nio.file.Files.readAllBytes(
      runDir.resolve("crash.conf")), "UTF-8").trim.split(":")
    val (aggKind, haltAfter) = (conf(0), conf(1).toInt)
    val batches = new java.util.concurrent.atomic.AtomicInteger
    s.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
        if (e.progress.numInputRows > 0 && batches.incrementAndGet() >= haltAfter) {
          System.err.println(s"[fault-child] halting JVM after batch " +
            s"${e.progress.batchId} ($aggKind, haltAfter=$haltAfter, no graceful stop)")
          Runtime.getRuntime.halt(9)
        }
    })
    val stream = s.readStream.schema(schema).format("parquet")
      .option("maxFilesPerTrigger", "1").load(runDir.resolve("in").toString)
    aggFor(aggKind)(stream)
      .writeStream.format("parquet")
      .option("path", runDir.resolve("out").toString)
      .option("checkpointLocation", runDir.resolve("ckpt").toString)
      .outputMode("append")
      .start()
      .awaitTermination(600000)
    // reaching here means the halt never fired — fail loudly
    System.err.println("[fault-child] stream ended without halting")
    sys.exit(3)
  }

  private def publish(stage: java.nio.file.Path, in: java.nio.file.Path,
                      q: Int): Unit = {
    val dst = in.resolve(f"part-$q%05d.parquet")
    java.nio.file.Files.copy(stage.resolve(f"part-$q%05d.parquet"), dst)
    java.nio.file.Files.setLastModifiedTime(dst,
      java.nio.file.attribute.FileTime.fromMillis(
        1700000000000L + q * 60000L))
  }

  private def crashMode(spark: SparkSession, sfDir: String,
                        aggKind: String = "window",
                        haltAfter: Int = 2): Boolean = {
    import graft.queries.CorpusQueries
    val (src, stageName) =
      if (aggKind == "session")
        (CorpusQueries.eventsWmSess(spark, sfDir), "events_wm_sess")
      else (CorpusQueries.eventsWm(spark, sfDir), "events_wm")
    val stage = CorpusQueries.stageOrderedQuartiles(
      spark, sfDir, stageName, src, "ts", nFilesOverride = 4)
    def runPhase(runDir: java.nio.file.Path): Unit = {
      val stream = spark.readStream.schema(src.schema).format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(runDir.resolve("in").toString)
      val q = CorpusQueries.startWithStreamConf(spark) {
        aggFor(aggKind)(stream)
          .writeStream.format("parquet")
          .option("path", runDir.resolve("out").toString)
          .option("checkpointLocation", runDir.resolve("ckpt").toString)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
      }
      q.awaitTermination()
    }
    // continuous reference: all four quartiles, one run, same aggregation
    val ref = java.nio.file.Files.createTempDirectory("graft-crashref-")
    java.nio.file.Files.createDirectories(ref.resolve("in"))
    (1 to 4).foreach(publish(stage, ref.resolve("in"), _))
    runPhase(ref)
    val (refHash, refRows) = hashOf(
      spark.read.parquet(ref.resolve("out").toString))
    System.err.println(s"[fault] crash($aggKind,halt=$haltAfter) reference: $refRows rows hash=$refHash")

    // faulted run: phase 1 in a child JVM that halts mid-replay
    val run = java.nio.file.Files.createTempDirectory("graft-crashrun-")
    java.nio.file.Files.createDirectories(run.resolve("in"))
    java.nio.file.Files.write(run.resolve("schema.json"),
      src.schema.json.getBytes("UTF-8"))
    java.nio.file.Files.write(run.resolve("crash.conf"),
      s"$aggKind:$haltAfter".getBytes("UTF-8"))
    (1 to 2).foreach(publish(stage, run.resolve("in"), _))
    val exit = childJvm(Seq("crash-child", run.toString)).start().waitFor()
    System.err.println(s"[fault] crash($aggKind,halt=$haltAfter) child exited $exit (9 = halted mid-replay)")
    if (exit != 9) {
      System.err.println("[fault] crash: FAIL (child did not halt as designed)")
      return false
    }
    // resume from the TORN checkpoint in this (different!) JVM
    (3 to 4).foreach(publish(stage, run.resolve("in"), _))
    runPhase(run)
    val (gotHash, gotRows) = hashOf(
      spark.read.parquet(run.resolve("out").toString))
    System.err.println(s"[fault] crash($aggKind,halt=$haltAfter) recovered: $gotRows rows hash=$gotHash")
    val ok = gotHash == refHash
    System.err.println(s"[fault] crash($aggKind,halt=$haltAfter): " +
      (if (ok) "PASS (non-graceful stop, recovery hash-identical)"
       else "FAIL (recovered output diverges from continuous run)"))
    Seq(ref, run).foreach(graft.queries.RestartRuns.deleteTree)
    ok
  }

  // ----------------------------------------------------------- batch-write
  /** Deterministic bulk frame for the batch-write tear: the full lineitem
    * slice a materialization stage would persist (numeric measures + the
    * low-cardinality partition key used by the partitioned variant). */
  private def batchWriteDf(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    graft.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_returnflag"), col("l_shipdate"))
      .repartition(8)
  }

  /** Count part-files anywhere under `dest` — committed task outputs AND
    * in-progress attempt files inside `_temporary` both match, so
    * haltAfter=1 tears at the earliest staged byte and haltAfter=3 tears
    * mid-job (some tasks committed, most still running on local[2]). */
  private def stagedPartFiles(dest: java.nio.file.Path): Int = {
    if (!java.nio.file.Files.exists(dest)) return 0
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Files.walk(dest)
    try s.iterator().asScala.count { p =>
      java.nio.file.Files.isRegularFile(p) &&
        p.getFileName.toString.startsWith("part-")
    } finally s.close()
  }

  /** Data files a READER would see: part-files whose path contains no
    * staging segment (`_temporary` / `.spark-staging-*`). The
    * FileOutputCommitter contract says a torn job must leave ZERO of
    * these. */
  private def visiblePartFiles(dest: java.nio.file.Path): Seq[String] = {
    if (!java.nio.file.Files.exists(dest)) return Nil
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Files.walk(dest)
    try s.iterator().asScala.filter { p =>
      java.nio.file.Files.isRegularFile(p) &&
        p.getFileName.toString.startsWith("part-") &&
        !dest.relativize(p).iterator().asScala.exists { seg =>
          val n = seg.toString
          n == "_temporary" || n.startsWith(".spark-staging")
        }
    }.map(dest.relativize(_).toString).toList
    finally s.close()
  }

  /** Child-JVM entry for batch-write: starts the write, and a daemon
    * watcher `Runtime.halt(9)`s the JVM (no shutdown hooks, no committer
    * cleanup) the moment `haltAfter` part-files have been staged —
    * mid-write by construction. */
  private def batchWriteChild(runDir: java.nio.file.Path): Unit = {
    val conf = new String(java.nio.file.Files.readAllBytes(
      runDir.resolve("bw.conf")), "UTF-8").trim.split(":")
    val (sfDir, variant, haltAfter) = (conf(0), conf(1), conf(2).toInt)
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        runDir.resolve("warehouse").toUri.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dest = if (variant == "bucketed")
      runDir.resolve("warehouse").resolve("fault_bw")
    else runDir.resolve("dest")
    val watcher = new Thread(() => {
      while (true) {
        val n = stagedPartFiles(dest)
        // Halt only while NOTHING is reader-visible yet: once
        // FileOutputCommitter's (non-atomic) job commit starts renaming
        // task outputs out of _temporary, a halt would land mid-commit —
        // visible part-files with no _SUCCESS is within the committer's
        // contract (readers gate on _SUCCESS), so the parent's stricter
        // zero-visible-part-files assertion would false-FAIL. Guarding on
        // visiblePartFiles.isEmpty pins the tear provably pre-commit;
        // commit outrunning every 5 ms poll still exits 3 (loud, caught
        // by the parent).
        if (n >= haltAfter && visiblePartFiles(dest).isEmpty) {
          System.err.println(s"[fault-child] halting JVM: $n part-file(s) " +
            s"staged, none committed (variant=$variant, " +
            s"haltAfter=$haltAfter)")
          Runtime.getRuntime.halt(9)
        }
        Thread.sleep(5)
      }
    })
    watcher.setDaemon(true)
    watcher.start()
    val df = batchWriteDf(spark, sfDir)
    variant match {
      case "partitioned" =>
        graft.io.Sinks.parquetSink(df, dest.toString, Seq("l_returnflag"))
      case "bucketed" =>
        graft.io.Sinks.writeBucketed(df, "fault_bw", 8, Seq("l_orderkey"),
          Seq("l_orderkey"))
      case _ => graft.io.Sinks.parquetSink(df, dest.toString)
    }
    // reaching here means the write outran the watcher — fail loudly
    System.err.println("[fault-child] write completed without halting")
    sys.exit(3)
  }

  /** Build the child-JVM command line: this JVM's args (minus any debug
    * agent) + classpath + the FaultInjection entry with `childArgs`. */
  private def childJvm(childArgs: Seq[String]): ProcessBuilder = {
    val jvmArgs = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments
    val cmd = new java.util.ArrayList[String]()
    cmd.add(System.getProperty("java.home") + "/bin/java")
    jvmArgs.forEach(a => if (!a.startsWith("-agentlib")) cmd.add(a))
    cmd.add("-cp"); cmd.add(System.getProperty("java.class.path"))
    cmd.add("graft.tools.FaultInjection")
    childArgs.foreach(cmd.add)
    new ProcessBuilder(cmd).inheritIO()
  }

  /** Batch-write crash atomicity (r16 VERDICT item 2): a writer JVM
    * `halt(9)`s mid-`df.write.parquet`; the destination must be invisible
    * to readers (zero part-files outside staging, no `_SUCCESS` — the
    * FileOutputCommitter contract), and a retried write over the torn
    * destination must produce the exact reference content. Variants:
    * `plain` (flat parquet), `partitioned` (dynamic partition dirs —
    * a different commit layout), `bucketed` (bucket spec via
    * saveAsTable). haltAfter=1 tears at the first staged byte;
    * haltAfter=3 tears mid-job with task outputs already committed. */
  private def batchWriteMode(spark: SparkSession, sfDir: String,
                             variant: String, haltAfter: Int): Boolean = {
    val tag = s"batch-write($variant,halt=$haltAfter)"
    val df = batchWriteDf(spark, sfDir)
    val (refHash, refRows) = hashOf(df)
    System.err.println(s"[fault] $tag reference: $refRows rows hash=$refHash")
    val runDir = java.nio.file.Files.createTempDirectory("graft-bw-")
    java.nio.file.Files.write(runDir.resolve("bw.conf"),
      s"$sfDir:$variant:$haltAfter".getBytes("UTF-8"))
    val exit = childJvm(Seq("batch-write-child", runDir.toString))
      .start().waitFor()
    System.err.println(s"[fault] $tag child exited $exit (9 = halted mid-write)")
    if (exit != 9) {
      System.err.println(s"[fault] $tag: FAIL (child did not halt mid-write " +
        "— tear never landed, nothing was asserted)")
      return false
    }
    val dest = if (variant == "bucketed")
      runDir.resolve("warehouse").resolve("fault_bw")
    else runDir.resolve("dest")
    val vis = visiblePartFiles(dest)
    val success = java.nio.file.Files.exists(dest.resolve("_SUCCESS"))
    if (vis.nonEmpty || success) {
      System.err.println(s"[fault] $tag: FAIL (torn write left reader-" +
        s"visible output: ${vis.size} part-file(s), _SUCCESS=$success — " +
        s"first: ${vis.take(3).mkString(", ")})")
      return false
    }
    System.err.println(s"[fault] $tag: torn destination invisible to " +
      s"readers (0 committed part-files, no _SUCCESS; " +
      s"${stagedPartFiles(dest)} file(s) stranded in staging)")
    // retried job: overwrite the torn destination, then read back and hash
    val reread = variant match {
      case "bucketed" =>
        // same writer path (bucket spec + saveAsTable); the parent session
        // has its own warehouse, so recovery writes the table fresh there —
        // the retry-over-torn-staging case is covered by the other variants.
        // A PREVIOUS run's table location can survive in the warehouse dir
        // while the fresh JVM's in-memory catalog has no table entry: DROP
        // is then a no-op and saveAsTable's CREATE path refuses the
        // existing location (locationAlreadyExists — caught by the first
        // back-to-back full fault_injection.sh sweep). Clear both.
        spark.sql("DROP TABLE IF EXISTS fault_bw_recover")
        val wh = spark.conf.get("spark.sql.warehouse.dir")
        val whDir = if (wh.startsWith("file:"))
          java.nio.file.Paths.get(java.net.URI.create(wh))
        else java.nio.file.Paths.get(wh)
        graft.queries.RestartRuns.deleteTree(whDir.resolve("fault_bw_recover"))
        graft.io.Sinks.writeBucketed(df, "fault_bw_recover", 8,
          Seq("l_orderkey"), Seq("l_orderkey"))
        spark.table("fault_bw_recover")
      case "partitioned" =>
        graft.io.Sinks.parquetSink(df, dest.toString, Seq("l_returnflag"))
        spark.read.parquet(dest.toString)
          .select(df.columns.map(org.apache.spark.sql.functions.col): _*)
      case _ =>
        graft.io.Sinks.parquetSink(df, dest.toString)
        spark.read.parquet(dest.toString)
    }
    val (gotHash, gotRows) = hashOf(reread)
    val ok = gotHash == refHash && gotRows == refRows
    System.err.println(s"[fault] $tag recovered: $gotRows rows hash=$gotHash")
    System.err.println(s"[fault] $tag: " +
      (if (ok) "PASS (torn write invisible; retried write hash-identical)"
       else "FAIL (retried write diverges from reference)"))
    graft.queries.RestartRuns.deleteTree(runDir)
    ok
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("all")
    if (mode == "crash-child") { crashChild(java.nio.file.Paths.get(args(1))); return }
    if (mode == "batch-write-child") {
      batchWriteChild(java.nio.file.Paths.get(args(1))); return
    }
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val seed = args.lift(2).map(_.toLong).getOrElse(20260815L)
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", "")
    val needsCluster =
      Set("batch", "stream", "stream-total", "all")(mode)
    if (needsCluster && !master.startsWith("local-cluster")) {
      System.err.println("[fault] batch/stream modes need " +
        "SPARK_GRAFT_MASTER=local-cluster[2,8,8192] (separate executor " +
        "JVMs to kill); see tools/fault_injection.sh")
      sys.exit(2)
    }
    val spark = graft.Sessions.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    var ok = true
    if (mode == "batch" || mode == "all") {
      // multi-stage, multi-job batch query: star-contraction clustering
      // (a sequence of shuffle jobs — executor loss lands mid-DAG)
      ok &= killDuring("batch d_cluster_keep_best", seed)(
        graft.SparkEntry.queries("d_cluster_keep_best")(spark, sfDir))
      graft.CacheScope.releaseAll()
    }
    if (mode == "stream" || mode == "all") {
      ok &= killDuring("stream x_stream_window_append", seed)(
        graft.SparkEntry.queries("x_stream_window_append")(spark, sfDir))
      graft.CacheScope.releaseAll()
    }
    if (mode == "stream-total" || mode == "all") {
      // TOTAL executor loss mid-stream: zero survivors hold any loaded
      // state store; the app runs on Master-relaunched executors only
      ok &= killDuring("stream-total x_stream_session_append", seed,
        killAll = true)(
        graft.SparkEntry.queries("x_stream_session_append")(spark, sfDir))
      graft.CacheScope.releaseAll()
    }
    if (mode == "crash" || mode == "all") ok &= crashMode(spark, sfDir)
    // batch-write tear: writer JVM halts mid-df.write.parquet — the torn
    // destination must be reader-invisible and the retried write exact
    if (mode == "batch-write" || mode == "all") {
      ok &= batchWriteMode(spark, sfDir, "plain", 3)
      ok &= batchWriteMode(spark, sfDir, "plain", 1)
      ok &= batchWriteMode(spark, sfDir, "partitioned", 3)
      ok &= batchWriteMode(spark, sfDir, "bucketed", 3)
    }
    // torn checkpoint at its earliest: halt after the FIRST data batch
    // (offsets for batch 1 may exist with no commit at all)
    if (mode == "crash-early" || mode == "all")
      ok &= crashMode(spark, sfDir, "window", haltAfter = 1)
    // merging session-window state across a non-graceful stop — the
    // restart family's hardest member, now also under the torn variant
    if (mode == "crash-session" || mode == "all")
      ok &= crashMode(spark, sfDir, "session", haltAfter = 2)
    spark.stop()
    if (!ok) sys.exit(1)
    System.err.println("[fault] ALL MODES PASS")
  }
}
