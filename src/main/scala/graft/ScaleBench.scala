package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Two-point scaling harness: times selected queries on the sf corpus and
  * on a synthetic `factor`× blow-up, printing ratio + log-exponent per
  * query (1.0 = linear, 0 = flat). This is the measured evidence behind
  * PLANS.md's "Measured scaling" table — round 7 built the blown-up corpus
  * ad-hoc; this main makes the experiment reproducible.
  *
  * Blow-up construction (documents): `factor` copies with id offsets; each
  * copy appends a per-copy suffix token to the text so copies are NEAR
  * duplicates of each other but not exact ones — the cross-copy duplicate
  * RATE stays constant and pair-producing ops grow output linearly, which
  * is what separates "plan went quadratic" from "answer got bigger".
  *
  * Usage: runMain graft.ScaleBench [queryPrefix ...]
  * Env: SPARK_GRAFT_SF_DIR (base corpus), SPARK_GRAFT_CPUS,
  *      SPARK_GRAFT_SCALE_FACTOR (default 10).
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val prefixes = if (args.isEmpty) Seq("") else args.toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val bigDir = s"/tmp/graft-scale$factor"
    val docs = Tables.load(spark, sfDir, "documents")
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
    val copies = spark.range(factor).select(col("id").as("cpy"))
    docs.crossJoin(copies)
      .select((col("doc_id") + col("cpy") * maxId).as("doc_id"),
        concat(col("text"), lit(" cpy"), col("cpy")).as("text"),
        col("lang"), col("source"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$bigDir/documents.parquet")
    // embeddings blow-up: byte-identical copies with offset ids —
    // deliberately adversarial for pair ops (true output grows
    // quadratically); labels keep their distribution
    val emb = Tables.load(spark, sfDir, "embeddings")
    val maxVid = emb.agg(max(col("vec_id"))).head().getLong(0) + 1
    emb.crossJoin(copies)
      .select((col("vec_id") + col("cpy") * maxVid).as("vec_id"),
        col("embedding"), col("label"))
      .write.mode("overwrite").parquet(s"$bigDir/embeddings.parquet")
    System.err.println(s"[scale] built ${factor}x documents+embeddings at $bigDir")

    def time(fn: => Long): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => prefixes.exists(n.startsWith))
    println(f"${"query"}%-24s ${"t1x"}%8s ${"t10x"}%8s ${"ratio"}%7s ${"expnt"}%6s")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      def median(dir: String): Double =
        (1 to 3).map(_ => time(fn(spark, dir).count())).sorted.apply(1)
      val t1 = median(sfDir)
      CacheScope.releaseAll() // the big run must not reuse 1x caches
      val tN = median(bigDir)
      CacheScope.releaseAll()
      val ratio = tN / t1
      val exp = math.log(ratio) / math.log(factor.toDouble)
      println(f"$name%-24s $t1%8.2f $tN%8.2f $ratio%7.1f $exp%6.2f")
    }
    spark.stop()
  }
}
