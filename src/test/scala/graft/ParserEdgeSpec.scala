package graft

import graft.functions.TimeFunctions
import graft.ops.{ParserOps, RecordOps}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parser/codec fail-soft sweep (round 15): under Spark 4's default ANSI
  * mode, several scan-stage codecs aborted the WHOLE BATCH on one
  * malformed record — where the reference fails only that record
  * (command returns false → dropped / dead-lettered). Each test here
  * pins a job-abort found by probing: the malformed input must yield
  * NULL (filterable), and the valid-input behavior must be unchanged.
  */
class ParserEdgeSpec extends SparkSpec {
  import spark.implicits._

  test("convertTimestamp: unix pseudo-formats null on non-numeric input " +
      "instead of an ANSI cast abort, including as coalesce fallthrough") {
    val df = Seq("notadate", "1700000000123", "2024-01-02").toDF("v")
    val out = df.select(col("v"), TimeFunctions.convertTimestamp(col("v"),
        Seq("yyyy-MM-dd", "unixTimeInMillis"),
        "yyyy-MM-dd HH:mm:ss").as("t"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("notadate") == null) // pre-fix: CAST_INVALID_INPUT abort
    assert(out("1700000000123") == "2023-11-14 22:13:20")
    assert(out("2024-01-02") == "2024-01-02 00:00:00")
  }

  test("readAvro: truncated bytes -> null struct (not an EOF batch " +
      "abort); trailing bytes after one datum are ignored") {
    val rec = """{"type":"record","name":"r","fields":[
      {"name":"a","type":"string"},{"name":"b","type":"long"}]}"""
    val truncated = Seq(Array[Byte](2, 65)).toDF("v")
      .select(graft.exprs.AvroExprs.from_avro_binary(col("v"), rec).as("r"))
      .collect()
    assert(truncated(0).isNullAt(0)) // pre-fix: EOFException abort
    val trailing = Seq(Array[Byte](2, 120, 99, 99)).toDF("v")
      .select(graft.exprs.AvroExprs
        .from_avro_binary(col("v"), """{"type":"string"}""").as("r"))
      .collect()
    assert(trailing(0).getString(0) == "x")
  }

  test("gunzip: corrupt stream -> null (not a ZipException batch abort); " +
      "valid stream round-trips") {
    val corrupt = Seq(Array[Byte](1, 2, 3)).toDF("v")
      .select(graft.exprs.HashExprs.gunzip(col("v")).as("g")).collect()
    assert(corrupt(0).isNullAt(0)) // pre-fix: ZipException abort
    val baos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(baos)
    gz.write("payload".getBytes("UTF-8")); gz.close()
    val ok = Seq(baos.toByteArray).toDF("v")
      .select(graft.exprs.HashExprs.gunzip(col("v")).cast("string").as("g"))
      .collect()
    assert(ok(0).getString(0) == "payload")
  }

  test("readAvro: a length-prefix bomb (8 bytes claiming a 1 GB string) " +
      "nulls the record instead of OOMing the executor at allocation") {
    // zigzag varint length prefix for 2^30 bytes, then 3 bytes of data
    val len = 1L << 30
    var n = len << 1
    val out = new java.io.ByteArrayOutputStream()
    while ((n & ~0x7fL) != 0) { out.write(((n & 0x7f) | 0x80).toInt); n >>>= 7 }
    out.write(n.toInt)
    out.write(Array[Byte](65, 66, 67))
    val bomb = out.toByteArray
    assert(bomb.length < 16)
    val r = Seq(bomb).toDF("v")
      .select(graft.exprs.AvroExprs
        .from_avro_binary(col("v"), """{"type":"string"}""").as("r"))
      .collect()
    // pre-limit: GenericDatumReader allocates the full claimed length
    // before reading -> OutOfMemoryError (an Error, uncatchable-safe)
    assert(r(0).isNullAt(0))
    // ENGAGEMENT proof (the null alone would be vacuous on a big-heap
    // JVM, where the 1 GB allocation succeeds and EOF nulls the row
    // anyway): the decode above force-initialized the reader, which
    // must have installed the limit properties, and Avro's own check
    // must now throw BEFORE any allocation at the claimed length.
    assert(System.getProperty("org.apache.avro.limits.string.maxLength")
      == String.valueOf(256L * 1024 * 1024))
    intercept[org.apache.avro.SystemLimitException] {
      org.apache.avro.SystemLimitException.checkMaxStringLength(len)
    }
  }

  test("gunzip: decompressed-size cap nulls a zip bomb instead of " +
      "inflating it into executor heap; under-cap payloads unaffected") {
    def gz(raw: Array[Byte]): Array[Byte] = {
      val baos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(baos)
      g.write(raw); g.close(); baos.toByteArray
    }
    // ~4 MB of zeros compresses to ~4 KB — a bomb relative to a 1 MB cap
    val bomb = gz(new Array[Byte](4 * 1024 * 1024))
    val small = gz("ok".getBytes("UTF-8"))
    assert(bomb.length < 64 * 1024)
    val out = Seq(("bomb", bomb), ("small", small)).toDF("k", "v")
      .select(col("k"),
        graft.exprs.HashExprs.gunzip(col("v"), 1024L * 1024).as("g"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else new String(r.getAs[Array[Byte]](1), "UTF-8")))
      .toMap
    assert(out("bomb") == null) // pre-cap: 4 MB allocation per such record
    assert(out("small") == "ok")
  }

  test("decodeBase64: malformed payload -> null (not an " +
      "IllegalArgumentException batch abort); valid payload decodes") {
    val df = Seq("cGF5bG9hZA==", "!!!not-base64!!!").toDF("b64")
    val out = RecordOps.decodeBase64("b64")(df)
      .select(col("b64").cast("string").as("s")).collect().map(r =>
        if (r.isNullAt(0)) null else r.getString(0)).toSet
    assert(out == Set("payload", null)) // pre-fix: abort on row 2
  }

  test("toAvro: an unencodable record (null field under a non-nullable " +
      "schema) nulls WITHOUT corrupting the next record's bytes") {
    val schema = """{"type":"record","name":"d","fields":[
      {"name":"id","type":"long"},{"name":"t","type":"string"}]}"""
    // one partition, bad row FIRST: the failed write must not leave
    // buffered partial bytes that poison the following record's payload
    val df = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "x"))
      .toDF("id", "t").coalesce(1)
    val out = df.select(col("id"),
        graft.exprs.AvroExprs.from_avro_binary(
          graft.exprs.AvroExprs.to_avro_binary(
            struct(col("id"), col("t")), schema), schema).as("r"))
      .select(col("id"), col("r.t").as("t2"), col("r.id").as("idRt"))
      .orderBy("id").collect()
    assert(out(0).isNullAt(1)) // unencodable -> null (pre-fix: NPE abort)
    // pre-fix (encoder reuse bug): row 2 decoded to NULL or wrong values
    assert(out(1).getString(1) == "" && out(1).getLong(2) == 2L)
    assert(out(2).getString(1) == "x" && out(2).getLong(2) == 3L)
  }

  test("extractURIComponents / extractURIQueryParameters: malformed URI " +
      "-> null components (not an ANSI INVALID_URL batch abort)") {
    val df = Seq("http://example.com:8080/a/b?x=1&y=2#frag",
      "http://exa mple.com/a b?x=1#f").toDF("uri")
    val comps = RecordOps.extractUriComponents("uri")(df)
      .orderBy(length(col("uri"))).collect()
    // valid row: full components
    assert(comps(1).getAs[String]("uri_scheme") == "http")
    assert(comps(1).getAs[String]("uri_host") == "example.com")
    assert(comps(1).getAs[String]("uri_path") == "/a/b")
    assert(comps(1).getAs[String]("uri_query") == "x=1&y=2")
    assert(comps(1).getAs[String]("uri_fragment") == "frag")
    // malformed row: scheme still regex-extracted, parse_url parts null
    assert(comps(0).getAs[String]("uri_scheme") == "http")
    assert(comps(0).getAs[String]("uri_host") == null) // pre-fix: abort
    val qp = RecordOps.extractUriQueryParam("uri", "x", "xv")(df)
      .orderBy(length(col("uri"))).collect()
    assert(qp(1).getAs[String]("xv") == "1")
    assert(qp(0).getAs[String]("xv") == null)
  }

  test("splitKeyValue: duplicated keys take the last value (not a " +
      "DUPLICATED_MAP_KEY batch abort); str_to_map shape preserved") {
    def kv(s: Option[String]): Seq[(String, String)] =
      RecordOps.splitKeyValue("v", "m")(Seq(s).toDF("v"))
        .select(explode(map_entries(col("m"))).as("e"))
        .select(col("e.key"), col("e.value")).collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
    // pre-fix: ANSI DUPLICATED_MAP_KEY abort on the whole batch
    assert(kv(Some("a=1,a=2,b=3")) == Seq(("a", "2"), ("b", "3")))
    // str_to_map-equivalent shapes for duplicate-free input:
    assert(kv(Some("a=1=2,b=3")) == Seq(("a", "1=2"), ("b", "3")))
    assert(kv(Some("justtext")) == Seq(("justtext", null)))
    assert(kv(Some("a=1,")) == Seq(("a", "1"), ("", null)))
  }

  test("totality property: arbitrary byte/string garbage through every " +
      "fail-soft codec in one pass — no input may abort the batch") {
    // seeded adversarial + random corpus: ANSI triggers, regex metas,
    // partial valid prefixes, unicode, long runs
    val rnd = new scala.util.Random(4242)
    val adversarial = Seq(
      "", " ", "=", ",", "a=1,a=2,a=3", "%%%", "\u0000\u0001", "ht tp://x",
      "http://", "://nohost", "9".repeat(25), "-9".repeat(13),
      "AAAA====", "A", "====", "2024-13-45", "1e308", "NaN",
      "a=" + "x".repeat(500), "\\Q\\E$1${}", "%{INT:n}")
    val fuzz = (1 to 60).map { _ =>
      new String((1 to rnd.nextInt(24)).map(_ =>
        rnd.nextPrintableChar()).toArray)
    }
    val df = (adversarial ++ fuzz).toDF("v")
    val bytes = df.withColumn("b",
      when(length(col("v")) % 3 === 0, col("v").cast("binary"))
        .otherwise(lit(Array[Byte](31, -117, 8, 77, 1))))  // gzip-magic prefix junk
    val out = RecordOps.decodeBase64("v")(
      bytes.withColumn("v2", col("v")))
      .withColumn("uri_q", graft.exprs.HashExprs.gunzip(col("b")))
      .withColumn("ts", TimeFunctions.convertTimestamp(col("v2"),
        Seq("yyyy-MM-dd", "unixTimeInMillis", "unixTimeInSeconds"),
        "yyyy-MM-dd"))
      .withColumn("avro", graft.exprs.AvroExprs.from_avro_binary(col("b"),
        """{"type":"record","name":"r","fields":[{"name":"x","type":"string"}]}"""))
    val withUri = RecordOps.extractUriComponents("v2")(out)
    val withKv = RecordOps.splitKeyValue("v2", "kvm")(withUri)
    // the assertion IS that this materializes: pre-sweep, any of the
    // adversarial rows killed the job out of the scan
    assert(withKv.count() == (adversarial.size + fuzz.size))
  }

  test("readCSV: malformed rows degrade per-field (permissive), never " +
      "abort: bad types -> null fields, short rows -> null tail") {
    val schema = StructType(Seq(StructField("a", IntegerType),
      StructField("b", StringType)))
    val out = ParserOps.readCsv("v", schema)(
        Seq("1,ok", "notint,ok", "1").toDF("v"))
      .select(col("csv.a"), col("csv.b")).collect()
      .map(r => (if (r.isNullAt(0)) null else r.getInt(0).toString,
        r.getAs[String](1))).toSet
    assert(out == Set(("1", "ok"), (null, "ok"), ("1", null)))
  }
}
