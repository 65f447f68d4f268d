package graft.queries

/** Working-dir registry for the checkpointed-RESTART gates
  * (`x_stream_restart*`): each invocation gets a fresh temp dir holding
  * its input files, checkpoint, and sink output; THAT GATE's previous
  * dir is deleted on the next invocation (iterations of one gate run
  * sequentially, so its prior DataFrame is already consumed) and
  * everything is removed by a JVM shutdown hook — unbounded /tmp
  * accumulation across bench/verify cycles was a round-13 self-review
  * finding. Keyed per gate name (advice r13): the gates return LAZY
  * parquet reads over their run dir, so a SIBLING gate constructing
  * must not invalidate an unconsumed sibling result. Shared by
  * CorpusQueries (`x_stream_restart` / `x_stream_restart_session`) and
  * LlmQueries (`x_stream_restart_knn`, the serving-path recovery gate). */
private[graft] object RestartRuns {
  private val last =
    new java.util.concurrent.ConcurrentHashMap[String, java.nio.file.Path]()

  private[graft] def deleteTree(p: java.nio.file.Path): Unit =
    if (p != null && java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val wk = java.nio.file.Files.walk(p)
      try wk.iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally wk.close()
    }

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    import scala.jdk.CollectionConverters._
    last.values().asScala.foreach(deleteTree)
  }))

  def fresh(gate: String): java.nio.file.Path = {
    val run = java.nio.file.Files.createTempDirectory(s"graft-restart-$gate-")
    deleteTree(last.put(gate, run))
    run
  }
}
