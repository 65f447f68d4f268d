package graft

import graft.text.CorpusStats
import org.apache.spark.sql.functions._

/** Cross-tier parity for wordpieceTrain's likelihood scoring: the
  * DECIMAL(38,0) tier (auto-engaged past the Long tier's √Long.Max
  * symbol bound, force-pinnable for tests) must produce the IDENTICAL
  * merge table — same truncating integer division, same argmax, same
  * tie-breaks — so a corpus crossing the bound trains the same
  * tokenizer, just with wider intermediates. */
class WordpieceTierSpec extends SparkSpec {
  import spark.implicits._

  test("decimal tier trains the identical merge table on a corpus with " +
      "score ties and skewed pair counts") {
    val docs = Seq(
      "the theme thesis there", "the the theme over over",
      "banana bandana ana ana", "over overt overture the",
      "zig zag zigzag zig", "banana ana theme").toDF("text")
    val long = CorpusStats.wordpieceTrain(docs, "text", steps = 6)
      .orderBy("step").collect().map(_.toSeq).toSeq
    val dec = CorpusStats
      .wordpieceTrain(docs, "text", steps = 6, forceDecimalTier = true)
      .orderBy("step").collect().map(_.toSeq).toSeq
    assert(long.nonEmpty)
    assert(long == dec)
  }
}
