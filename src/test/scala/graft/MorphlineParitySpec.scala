package graft

import graft.functions.Conform
import graft.ops.{ControlOps, ParserOps, RecordOps}
import graft.pipeline.Pipeline
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Golden-parity tests mirroring the reference's test strategy
  * (SURVEY.md §5, FIXTURES.md): the person record in three payload shapes,
  * exact output assertions from MorphlineTransformTest.java.
  */
class MorphlineParitySpec extends SparkSpec {
  import spark.implicits._

  val personJson =
    """{"firstName": "example", "lastName": "user", "email": "example.user@example.com", "age": 27}"""

  /** F1 envelope: topic testing, partition 1, fixed timestamp. */
  def envelopeDf = Seq(
    (null: Array[Byte], personJson, "testing", 1, 1L, 1484897702123L)
  ).toDF("key", "value", "topic", "partition", "offset", "timestampMs")

  val personSchema = new StructType()
    .add("firstName", StringType).add("lastName", StringType)
    .add("email", StringType).add("age", IntegerType)

  test("F1 readjson: parse + path extraction golden (testReadJson :245-263)") {
    val pipe = Pipeline("readjson", Seq(
      ParserOps.readJson("value", personSchema),
      RecordOps.extractPaths("json",
        "firstName" -> "first_name", "lastName" -> "last_name",
        "email" -> "email_x", "age" -> "age_x")))
    val out = pipe(envelopeDf)
      .select("first_name", "last_name", "email_x", "age_x").collect()
    assert(out.toSeq == Seq(
      Row("example", "user", "example.user@example.com", 27)))
  }

  test("F1 readline: interpolation rebuild golden string (testReadLine :287-301)") {
    val pipe = Pipeline("rebuild", Seq(
      ParserOps.readJson("value", personSchema),
      RecordOps.extractPaths("json",
        "firstName" -> "firstName", "lastName" -> "lastName",
        "email" -> "email", "age" -> "age"),
      RecordOps.setValues("value" ->
        ("""{"firstName":"@{firstName}","lastName":"@{lastName}",""" +
         """"email":"@{email}","age":@{age}}"""))))
    val got = pipe(envelopeDf).select("value").as[String].head()
    assert(got ==
      """{"firstName":"example","lastName":"user","email":"example.user@example.com","age":27}""")
  }

  test("F1 drop: matching record vanishes (testDrop :216-242)") {
    val pipe = Pipeline("drop", Seq(
      ControlOps.dropWhere(col("topic") === "testing")))
    assert(pipe(envelopeDf).count() == 0)
  }

  test("F2 conform-to-schema: null-fill `missing`, keep others (testEnrichJson :176-213)") {
    val input = Seq(("whatever", 42, true, "etc"))
      .toDF("dont", "abc", "foo", "etc")
    val target =
      """{"type":"record","name":"ConnectDefault","namespace":"io.confluent.connect.avro",
        | "fields":[{"name":"dont","type":["null","string"],"default":null},
        |  {"name":"abc","type":"int"},
        |  {"name":"foo","type":"boolean"},
        |  {"name":"etc","type":["null","string"],"default":null},
        |  {"name":"missing","type":["null","string"],"default":null}]}""".stripMargin
    val out = Conform.conformTo(input, target)
    assert(out.columns.toSeq == Seq("dont", "abc", "foo", "etc", "missing"))
    val r = out.head()
    assert(r.getAs[String]("dont") == "whatever")
    assert(r.getAs[Int]("abc") == 42)
    assert(r.getAs[Boolean]("foo"))
    assert(r.getAs[String]("etc") == "etc")
    assert(r.isNullAt(r.fieldIndex("missing")))
    // union [null,string] → nullable string column
    assert(out.schema("missing").dataType == StringType)
    assert(out.schema("missing").nullable)
  }

  test("F2 conform: timestamp-millis coercion from ISO-8601 string") {
    val input = Seq(("2017-01-20T07:35:02.123Z")).toDF("ts")
    val target =
      """{"type":"record","name":"T","fields":[
        |{"name":"ts","type":{"type":"long","logicalType":"timestamp-millis"}}]}"""
        .stripMargin
    val out = Conform.conformTo(input, target)
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_millis(col("ts"))).as[Long].head() == 1484897702123L)
  }

  test("F4 producer fixture: dynamic topic, literal value, uuid key format") {
    val pipe = Pipeline("producer", Seq(
      RecordOps.setValues("topic" -> "@{topic}-copy", "value" -> "test"),
      RecordOps.generateUUID("key")))
    val r = pipe(envelopeDf).select("topic", "value", "key").head()
    assert(r.getString(0) == "testing-copy")
    assert(r.getString(1) == "test")
    assert(r.getString(2).matches(
      "[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"))
  }

  test("flagship entry() runs end-to-end with rows > 0 (driver smoke contract)") {
    val out = SparkEntry.entry(spark)
    assert(out.count() > 0)
    assert(out.columns.toSeq == Seq("topic", "n", "sum_k"))
    assert(!out.select("topic").as[String].collect().exists(_ == "error-out"))
  }

  test("SMT take-first semantics: 1→N parser keeps record[0] (MorphlineTransform.java:123)") {
    val multi = Seq((1L, "a\nb\nc"), (2L, "x\ny")).toDF("id", "payload")
    val pipe = Pipeline("smt", Seq(
      ParserOps.readLine("payload", "line"),
      ControlOps.takeFirstPer(Seq("id"), col("line"))))
    val out = pipe(multi).select("id", "line").orderBy("id")
      .as[(Long, String)].collect()
    assert(out.toSeq == Seq((1L, "a"), (2L, "x")))
  }
}
