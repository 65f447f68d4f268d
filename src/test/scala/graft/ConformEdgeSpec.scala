package graft

import graft.functions.Conform
import graft.multimodal.Multimodal
import graft.functions.Grok
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class ConformEdgeSpec extends SparkSpec {
  import spark.implicits._

  test("non-null union becomes a struct of nullable branches ({type: value} shape)") {
    val target =
      """{"type":"record","name":"U","fields":[
        |{"name":"v","type":["int","string"]}]}""".stripMargin
    val t = Conform.parseAvro(target)
    val vType = t.fields("v").dataType
    assert(vType.isInstanceOf[StructType])
    val st = vType.asInstanceOf[StructType]
    assert(st.fieldNames.toSet == Set("int", "string"))
    assert(st.fields.forall(_.nullable))
  }

  test("conform recurses into arrays of records") {
    val target =
      """{"type":"record","name":"A","fields":[
        |{"name":"items","type":{"type":"array","items":
        |  {"type":"record","name":"I","fields":[
        |    {"name":"x","type":"int"},
        |    {"name":"pad","type":["null","string"],"default":null}]}}}]}"""
        .stripMargin
    val df = Seq(Tuple1(Seq(Tuple1(1), Tuple1(2)))).toDF("items")
      .select(transform(col("items"), e => struct(e.getField("_1").as("x"))).as("items"))
    val out = Conform.conformTo(df, target)
    val itemsType = out.schema("items").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    assert(itemsType.fieldNames.toSeq == Seq("x", "pad"))
    val rows = out.select(explode(col("items")).as("i"))
      .select("i.x", "i.pad").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2))
    assert(rows.forall(_.isNullAt(1)))
  }

  test("grok supports custom pattern dictionaries with recursion") {
    val dict = Grok.basePatterns ++ Map(
      "KV" -> raw"%{WORD}=%{WORD}",
      "LINE" -> raw"%{KV}(?:\s+%{KV})*")
    val (regex, _) = Grok.expand("%{LINE:all}", dict)
    val df = Seq("a=1 b=2").toDF("s")
    val out = Grok.extract(df, col("s"), "%{LINE:all}", dict)
      .select("all").as[String].head()
    assert(out == "a=1 b=2")
  }

  test("grok rejects cyclic and exponentially-branching dictionaries") {
    // cycle: the depth guard must throw, not recurse forever
    val cyclic = Grok.basePatterns + ("A" -> "%{A}")
    val e1 = intercept[IllegalArgumentException](Grok.expand("%{A}", cyclic))
    assert(e1.getMessage.contains("recursion too deep"))
    // branching blowup: 4^depth characters would OOM long before the
    // depth guard trips — the size guard must throw first
    val branching = Grok.basePatterns ++
      ('A' to 'M').map(c => c.toString ->
        (s"%{${(c + 1).toChar}}" * 4)).toMap + ("N" -> "xxxxxxxxxx")
    val e2 = intercept[IllegalArgumentException](Grok.expand("%{A}", branching))
    assert(e2.getMessage.contains("exceeds 1MB"))
  }

  test("timestamp-millis coercion: every fallback branch survives ANSI mode") {
    val target =
      """{"type":"record","name":"T","fields":[
        |{"name":"id","type":"long"},
        |{"name":"ts","type":{"type":"long","logicalType":"timestamp-millis"}}]}"""
        .stripMargin
    val inputs = Seq(
      "2017-01-20T07:35:02.123Z",     // format 1: ISO with millis + offset
      "2017-01-20T07:35:02Z",         // format 2: ISO without millis
      "2017-01-20 07:35:02",          // format 3: plain datetime (session UTC)
      "1484897702123",                // epoch-millis digits
      "-1000",                        // negative epoch-millis
      "not a timestamp",              // unparseable → null, must not throw
      "99999999999999999999")         // >18 digits → null, not ANSI overflow
      .zipWithIndex.map(_.swap)
    val out = Conform.conformTo(inputs.toDF("id", "ts"), target)
      .orderBy("id").select(unix_millis(col("ts")))
      .as[java.lang.Long].collect().toSeq
    assert(out == Seq[java.lang.Long](
      1484897702123L, 1484897702000L, 1484897702000L,
      1484897702123L, -1000L, null, null))
  }

  test("frameSample explodes payloads into bounded chunks") {
    val df = Seq((1L, "x" * 1000), (2L, "y" * 10)).toDF("id", "text")
    val media = Multimodal.asMedia(df, "text", "video/fake")
    val out = Multimodal.frameSample(media, "media.body", chunkBytes = 64, stride = 2)
    val counts = out.groupBy("id").count().as[(Long, Long)].collect().toMap
    // 1000 bytes div 64 div 2 = 7 → frames 0..6; tiny payload → 1 frame
    assert(counts(1L) == 7L && counts(2L) == 1L)
    val frames = out.filter(col("id") === 1L).select(length(col("frame")))
      .as[Int].collect()
    assert(frames.forall(_ <= 64))
  }
}
