package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for the 100 TB shapes AQE can't always fix
  * (e.g. a single hot key that exceeds one executor's memory even after
  * AQE skew-join splitting, or aggregations whose partial states are large).
  *
  * Salting trades one shuffle for two balanced ones:
  *  - aggregate: key → (key, salt) partial agg → key final agg. Works for
  *    any algebraic aggregate (sum/count/min/max) — partials merge.
  *  - join: explode the small side `salt`× (replicate), salt the big side
  *    randomly-but-deterministically; the hot key spreads over `salt`
  *    partitions.
  */
object Skew {

  /** Deterministic per-row salt in [0, n): stable across retries (hash of
    * the row's key columns + a discriminator column), so task re-execution
    * is idempotent — `rand()`-based salting is not.
    */
  def salt(n: Int, cols: Column*): Column =
    pmod(hash(cols: _*), lit(n))

  /** Two-phase salted aggregation: `agg` must be algebraic (partial results
    * combine with the same function — sum, count via sum, min, max).
    */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     saltN: Int, discriminator: Column): DataFrame = {
    val partial = df
      .withColumn("__salt", salt(saltN, discriminator))
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("cnt"))
  }

  /** Salted equi-join for a skewed left side: the right (smaller) side is
    * replicated `saltN`× with every salt value; the left side gets its
    * deterministic salt. Join key becomes (key, salt) — the hot key's rows
    * spread across `saltN` reducers.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltN: Int, bigDiscriminator: Column,
                 joinType: String = "inner"): DataFrame = {
    val saltedBig = big.withColumn("__salt", salt(saltN, bigDiscriminator))
    val replicatedSmall = small
      .withColumn("__salt", explode(array((0 until saltN).map(lit): _*)))
    saltedBig.join(replicatedSmall, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Range-partition + sort-within for clustered output files (min/max
    * pruning on downstream reads — the write-side half of partition
    * pruning at scale).
    */
  def clusterBy(df: DataFrame, n: Int, cols: Column*): DataFrame =
    df.repartitionByRange(n, cols: _*).sortWithinPartitions(cols: _*)
}
