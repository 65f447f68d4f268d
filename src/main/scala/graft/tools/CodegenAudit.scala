package graft.tools

import org.apache.spark.sql.functions._

/** Codegen audit for the pair-scoring shapes (r15 VERDICT item 3): counts
  * how many times the O(dim) [[graft.exprs.HashExprs.VecDot]] loop appears
  * in the WHOLE-STAGE GENERATED code of a kNN-style scoring projection,
  * for (a) the pre-r16 safeCos shape (`when(p && !isnan(d), d / nProd)` —
  * d in both the predicate and a branch), and (b) the r16 shape (d only in
  * the branch, finite-filter on the projected attribute). Spark's codegen
  * does no CSE between a conditional's predicate and its branches, so
  * shape (a) is expected to inline the dot loop twice per pair.
  *
  * Ground truth is the generated Java, not a timing: the loop body is
  * `acc += a.getDouble(i) * b.getDouble(i)`, so the audit counts
  * occurrences of `.getDouble(` for-loops attributable to VecDot.
  */
object CodegenAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.build("4")
    // AQE wraps the plan in AdaptiveSparkPlanExec, which reports
    // "0 WholeStageCodegen subtrees" before execution — disable it here
    // so codegenString sees the compiled stages directly. The audited
    // expression shapes are identical either way.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val dim = 16
    val vecs = spark.range(64).select(col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => (pmod(col("id") + i.cast("long"), lit(7)) + 1).cast("double"))
        .as("v"))
      .withColumn("vn", graft.sim.Similarity.norm(col("v")))
    val q = vecs.limit(4).select(col("id").as("qid"), col("v").as("q"),
      col("vn").as("qn"))
    val d = graft.sim.Similarity.dot(col("v"), col("q"))
    val nProd = col("vn") * col("qn")
    def audit(tag: String, score: org.apache.spark.sql.Column,
              keep: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Unit = {
      val scored = vecs.crossJoin(broadcast(q))
        .select(col("qid"), col("id"), score.as("cosine"))
        .filter(keep(col("cosine")))
      val code = org.apache.spark.sql.execution.debug
        .codegenString(scored.queryExecution.executedPlan)
      // each inlined VecDot loop contains exactly one multiply-accumulate
      val dotLoops = "\\+= \\w+\\.getDouble\\(\\w+\\) \\* \\w+\\.getDouble\\(\\w+\\)"
        .r.findAllIn(code).size
      println(s"[audit] $tag: inlined VecDot loops in generated code = $dotLoops")
      if (args.contains("--dump")) println(code)
    }
    val oldScore = when(nProd > 0 && !isnan(d) &&
      nProd =!= lit(Double.PositiveInfinity), d / nProd)
    val newScore = when(nProd > 0 && !isnan(nProd) &&
      nProd =!= lit(Double.PositiveInfinity), d / nProd)
    // (2 of the loops in every row are the per-row norms, shared by all
    // shapes; the rest are the pair-scoring expression's copies — the
    // optimizer collapses Project+Filter and substitutes the full score
    // expression into the filter once per column reference.)
    audit("pre-r16 (isnan(d) in predicate, isNotNull filter)",
      oldScore, c => c.isNotNull)
    audit("r16 score with 3-reference finite filter (rejected)",
      newScore, c => c.isNotNull && !isnan(c) &&
        abs(c) =!= lit(Double.PositiveInfinity))
    audit("r16 final (d once, single-reference abs(c)<=MaxValue filter)",
      newScore, c => abs(c) <= lit(Double.MaxValue))
    spark.stop()
  }
}
