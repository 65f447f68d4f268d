package graft

import graft.queries.{CorpusQueries, LlmQueries, MorphlineQueries, RelationalQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query surface is assembled from three modules:
  *  - [[graft.queries.MorphlineQueries]] — the reference's operator
  *    inventory (SURVEY.md §2.A–§2.D), each via the graft.ops pipeline layer;
  *  - [[graft.queries.RelationalQueries]] — joins/aggs/windows/sorts/set ops
  *    (SURVEY.md §2.E + §7.2 step 8);
  *  - [[graft.queries.LlmQueries]] — dedup / similarity / text analysis /
  *    multimodal (the BASELINE.json north-star extensions).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A representative end-to-end pipeline: parse the JSON payload, derive
    * envelope fields, filter, enrich with a broadcast dimension, aggregate.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val events = Tables.load(spark, dir, "events")
    val pipe = graft.pipeline.Pipeline("flagship", Seq(
      graft.ops.ParserOps.readJson("props",
        new org.apache.spark.sql.types.StructType()
          .add("k", org.apache.spark.sql.types.IntegerType)),
      graft.ops.RecordOps.setValues("topic" -> "@{event_type}-out"),
      graft.ops.ControlOps.dropWhere(col("event_type") === "error")))
    pipe(events)
      .groupBy(col("topic"))
      .agg(count(lit(1)).as("n"), sum(col("json.k")).as("sum_k"))
      .orderBy(col("topic"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    MorphlineQueries.queries ++ RelationalQueries.queries ++
      LlmQueries.queries ++ CorpusQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (nondeterministic or
    * hash-function-dependent ops) get the driver's rows-only check.
    */
  def oracleSql: Map[String, String] =
    MorphlineQueries.oracle ++ RelationalQueries.oracle ++
      LlmQueries.oracle ++ CorpusQueries.oracle
}
