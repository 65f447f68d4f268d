package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-A/B harness for the BPE char-spread expression (r21): times
  * the bpeEncode pipeline with (a) the current regexp_replace spread and
  * (b) an array_join(split(tok, "")) spread, over the real sf0.1 token
  * stream. Also prints a semantic diff count between the two spreads so
  * equivalence is measured, not assumed. */
object SpreadBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, dir, "documents")
    val toks = docs.select(col("doc_id"),
      explode(graft.text.TextAnalysis.asciiTokens(col("text"))).as("tok"))
    val merges = Seq(("e","r"),("i","n"),("t","h"),("a","n"),("o","n"))
    def chain(spread: org.apache.spark.sql.Column) = {
      var c = concat(lit(" "), spread, lit(" "))
      for ((a, b) <- merges) c = replace(c, lit(s" $a  $b "), lit(s" $a$b "))
      size(split(trim(c), "  "))
    }
    val sprA = trim(regexp_replace(col("tok"), "(.)", "$1  "))
    val sprB = trim(array_join(split(col("tok"), ""), "  "))
    // equivalence first
    val diff = toks.select(sprA.as("a"), sprB.as("b"))
      .filter(col("a") =!= col("b")).count()
    println(s"spread diff rows: $diff")
    def time(tag: String, c: org.apache.spark.sql.Column): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        toks.select(col("doc_id"), c.as("ns"))
          .groupBy("doc_id").agg(count(lit(1)), sum("ns"))
          .write.format("noop").mode("overwrite").save()
        println(f"$tag iter$i: ${(System.nanoTime()-t0)/1e9}%.3f s")
      }
    }
    time("A regexp_replace", chain(sprA))
    time("B split-empty   ", chain(sprB))
    // and the spread alone, no merges, to isolate it
    time("A spread-only", length(sprA))
    time("B spread-only", length(sprB))
    spark.stop()
  }
}
