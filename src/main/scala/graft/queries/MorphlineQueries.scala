package graft.queries

import graft.Tables
import graft.functions.Conform
import graft.ops.{ControlOps, ParserOps, RecordOps}
import graft.pipeline.Pipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's operator surface (SURVEY.md §2.A–§2.D), each exercised as
  * a deterministic query over the driver's parquet tables with a DuckDB
  * oracle. Every query routes through the library ops (graft.ops / graft
  * .functions) — these entries are both the correctness gate and living
  * examples.
  *
  * Oracle parity rules used throughout:
  *  - every output column aliased identically in Spark and SQL;
  *  - doubles only ever produced by identical integer/decimal→double casts
  *    or explicit round();
  *  - deterministic ORDER BY on both sides;
  *  - timestamps rendered as strings (morphline semantics anyway).
  */
object MorphlineQueries {

  /** Fail-fast certificate for `m_generate_uuid`: every value in `field`
    * must be canonical lowercase RFC-4122 v4 (8-4-4-4-12 hex, version
    * nibble '4', variant nibble in [89ab]) and globally unique; one
    * aggregate pass, throws on any violation. Extracted so the throw-path
    * is unit-testable (EntryContractSpec) — the gate's correctness claim IS
    * this throw.
    */
  private[graft] def certifyUuids(out: DataFrame, field: String): Unit = {
    val v4 =
      "^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$"
    val c = out.agg(
        count(lit(1)).as("n"),
        countDistinct(col(field)).as("n_distinct"),
        sum(when(col(field).rlike(v4), 1L).otherwise(0L)).as("n_valid"))
      .head()
    val (n, nDistinct, nValid) = (c.getLong(0), c.getLong(1), c.getLong(2))
    if (nValid != n)
      throw new IllegalStateException(
        s"m_generate_uuid: ${n - nValid} of $n values are not RFC-4122 v4")
    if (nDistinct != n)
      throw new IllegalStateException(
        s"m_generate_uuid: ${n - nDistinct} duplicate uuids among $n rows")
  }

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
  private def documents(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
  private def customer(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "customer")
  private def nation(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "nation")
  private def orders(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // readJson (kite-json): parse the JSON payload column with a schema.
    "m_read_json" -> ((s, dir) => {
      val pipe = Pipeline("readjson", Seq(
        ParserOps.readJson("props", new StructType().add("k", IntegerType)),
        RecordOps.extractPaths("json", "k" -> "k")))
      pipe(events(s, dir))
        .select(col("event_id"), col("k"))
        .orderBy("event_id")
    }),

    // extractJsonPaths + rename mappings (FIXTURES.md F3 shape).
    "m_extract_paths" -> ((s, dir) => {
      val pipe = Pipeline("extract", Seq(
        ParserOps.readJson("props", new StructType().add("k", IntegerType)),
        RecordOps.extractPaths("json", "k" -> "k_renamed")))
      pipe(events(s, dir))
        .select(col("event_id"), col("k_renamed"))
        .orderBy("event_id")
    }),

    // setValues with @{field} interpolation (producer.conf topic derivation).
    "m_set_values" -> ((s, dir) => {
      val pipe = Pipeline("setvalues", Seq(
        RecordOps.setValues(
          "topic" -> "@{event_type}-avro",
          "subject" -> "@{event_type}-value")))
      pipe(events(s, dir))
        .select(col("event_id"), col("topic"), col("subject"))
        .orderBy("event_id")
    }),

    // convertTimestamp: multi-format parse + render (cloudsolr.conf:43-51).
    "m_convert_timestamp" -> ((s, dir) => {
      val withStr = orders(s, dir)
        .withColumn("dstr", date_format(col("o_orderdate"), "yyyy-MM-dd"))
      val pipe = Pipeline("convertts", Seq(
        RecordOps.convertTimestamp("dstr",
          Seq("MM/dd/yyyy", "yyyy-MM-dd"), "yyyy-MM-dd HH:mm:ss", "converted")))
      pipe(withStr)
        .select(col("o_orderkey"), col("converted"))
        .orderBy("o_orderkey")
    }),

    // convertTimestamp unixTimeInMillis path (kafkaTimestamp, F5 fixture).
    "m_convert_unix_millis" -> ((s, dir) => {
      val withMs = orders(s, dir)
        .withColumn("ms", unix_millis(col("o_orderdate").cast("timestamp")))
      val pipe = Pipeline("convertms", Seq(
        RecordOps.convertTimestamp("ms",
          Seq("unixTimeInMillis"), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'", "iso")))
      pipe(withMs)
        .select(col("o_orderkey"), col("iso"))
        .orderBy("o_orderkey")
    }),

    // findReplace (regex replace on a field).
    "m_find_replace" -> ((s, dir) => {
      val pipe = Pipeline("findreplace", Seq(
        RecordOps.findReplace("event_type", "e", "3")))
      pipe(events(s, dir))
        .select(col("event_id"), col("event_type"))
        .orderBy("event_id")
    }),

    // split: tokenize a string field (value = token count + first token).
    "m_split" -> ((s, dir) => {
      val pipe = Pipeline("split", Seq(
        RecordOps.splitField("text", " ", "toks")))
      pipe(documents(s, dir))
        .select(col("doc_id"), size(col("toks")).as("n_toks"),
          element_at(col("toks"), 1).as("first_tok"))
        .orderBy("doc_id")
    }),

    // splitKeyValue: parse k=v pairs into a map.
    "m_split_kv" -> ((s, dir) => {
      val kv = events(s, dir)
        .withColumn("kvs", concat(lit("type="), col("event_type"),
          lit(",user="), col("user_id")))
      val pipe = Pipeline("splitkv", Seq(
        RecordOps.splitKeyValue("kvs", "m")))
      pipe(kv)
        .select(col("event_id"),
          element_at(col("m"), "type").as("type_v"),
          element_at(col("m"), "user").as("user_v"))
        .orderBy("event_id")
    }),

    // translate: dictionary lookup with default.
    "m_translate" -> ((s, dir) => {
      val pipe = Pipeline("translate", Seq(
        RecordOps.translate("n_name",
          Map("UNITED STATES" -> "US", "GERMANY" -> "DE", "FRANCE" -> "FR",
            "CHINA" -> "CN", "JAPAN" -> "JP"),
          lit("other"), "code")))
      pipe(nation(s, dir))
        .select(col("n_nationkey"), col("n_name"), col("code"))
        .orderBy("n_nationkey")
    }),

    // grok: regex-dictionary extraction over a synthesized log line.
    "m_grok" -> ((s, dir) => {
      val logs = events(s, dir).withColumn("line",
        concat(lit("INFO user="), col("user_id"),
          lit(" type="), col("event_type"), lit(" id="), col("event_id")))
      val pipe = Pipeline("grok", Seq(
        RecordOps.grok("line",
          "%{LOGLEVEL:level} user=%{INT:uid} type=%{WORD:etype}")))
      pipe(logs)
        .select(col("event_id"), col("level"), col("uid"), col("etype"))
        .orderBy("event_id")
    }),

    // toString with trim (identity.conf:183-188).
    "m_to_string_trim" -> ((s, dir) => {
      val padded = customer(s, dir)
        .withColumn("padded", concat(lit("  "), col("c_name"), lit("  ")))
      val pipe = Pipeline("tostring", Seq(
        RecordOps.toStringField("padded", trimOutput = true)))
      pipe(padded)
        .select(col("c_custkey"), col("padded").as("trimmed"))
        .orderBy("c_custkey")
    }),

    // base64 codecs (toByteArray/decodeBase64 ring).
    "m_base64" -> ((s, dir) => {
      val pipe = Pipeline("b64", Seq(
        RecordOps.encodeBase64("event_type")))
      pipe(events(s, dir).withColumn("orig", col("event_type")))
        .select(col("event_id"), col("event_type").as("b64"),
          unbase64(col("event_type")).cast("string").as("roundtrip"))
        .orderBy("event_id")
    }),

    // deterministic unique key (generateSolrSequenceKey at-scale variant).
    "m_sequence_key" -> ((s, dir) => {
      val pipe = Pipeline("seqkey", Seq(
        RecordOps.deterministicKey("id", col("event_type"), col("event_id"))))
      pipe(events(s, dir))
        .select(col("event_id"), col("id"))
        .orderBy("event_id")
    }),

    // generateUUID — the random bits are inherently unhashable across
    // engines, so (like q_hll_sketch / q_approx_percentile, round 15) the
    // gate is a CERTIFIED-OUTPUT contract: one aggregate pass proves every
    // generated value is RFC-4122 v4 (lowercase 8-4-4-4-12 hex, version
    // nibble '4', variant nibble in [89ab]) AND globally unique
    // (count distinct == count), throwing on any violation; the hashed
    // output is the deterministic per-record projection (event_id, version
    // nibble, length) under a full DuckDB oracle, so row coverage — one
    // uuid per input record, no drops or duplicates — is hash-checked too.
    "m_generate_uuid" -> ((s, dir) => {
      val pipe = Pipeline("uuid", Seq(RecordOps.generateUUID("uuid_s")))
      // uuid() is nondeterministic: cache so the certification pass and the
      // hashed projection observe the SAME generated values
      val out = graft.CacheScope.cache(
        pipe(events(s, dir)).select(col("event_id"), col("uuid_s")))
      certifyUuids(out, "uuid_s")
      out.select(col("event_id"),
          substring(col("uuid_s"), 15, 1).as("uuid_version"),
          length(col("uuid_s")).as("uuid_len"))
        .orderBy("event_id")
    }),

    // dropRecord (testDrop semantics: matching records vanish).
    "m_drop_record" -> ((s, dir) => {
      val pipe = Pipeline("drop", Seq(
        ControlOps.dropWhere(col("event_type") === "error")))
      pipe(events(s, dir))
        .select(col("event_id"), col("event_type"))
        .orderBy("event_id")
    }),

    // Kite-stdlib predicate config shapes compiled from verbatim HOCON:
    // field→value equals, nested `not`, value-list `contains`.
    "m_kite_filters" -> ((s, dir) => {
      val conf =
        """morphlines : [
          |  { id : kite, commands : [
          |    { equals { lang : en } }
          |    { not { contains { source : [src0, src1, src2] } } }
          |  ] }
          |]""".stripMargin
      val pipe = graft.pipeline.PipelineSpec.fromHocon(conf, "kite",
        env = _ => None)
      pipe(documents(s, dir))
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy("doc_id")
    }),

    // The `java { code : … }` extension point, Spark-first (SURVEY §2.F;
    // Kite stdlib's inline-code command): arbitrary per-record user code
    // becomes a USER-REGISTERED op — here a Scala UDF — added to the
    // OpRegistry at runtime and referenced from HOCON exactly like a
    // built-in command. The UDF is deliberate: this is the escape hatch
    // for logic Catalyst can't express; every shipped op stays codegen'd.
    "m_custom_udf" -> ((s, dir) => {
      val vowelCount = udf((t: String) =>
        if (t == null) null
        else java.lang.Long.valueOf(
          t.toLowerCase.count(c => "aeiou".indexOf(c.toInt) >= 0)))
      val registry = graft.pipeline.StandardOps.registry
        .register("userVowelScore") { c =>
          val f = c.getOrElse("field", "_attachment_body")
          val out = c.getOrElse("outputField", "score")
          graft.pipeline.Op(s"userVowelScore:$f")(df =>
            df.withColumn(out, vowelCount(col(f))))
        }
      val conf =
        """morphlines : [
          |  { id : custom, commands : [
          |    { userVowelScore { field : text, outputField : vowels } }
          |    { setValues { grade : "@{lang}-graded" } }
          |  ] }
          |]""".stripMargin
      val pipe = graft.pipeline.PipelineSpec.fromHocon(conf, "custom",
        registry, env = _ => None)
      pipe(documents(s, dir))
        .select(col("doc_id"), col("vowels"), col("grade"))
        .orderBy("doc_id")
    }),

    // pipe / callParentPipe (SURVEY §2.C; reference PipeBuilder — a
    // nested morphline as one command): TWO levels of `pipe` nesting
    // compiled from verbatim HOCON, with @{} interpolation flowing
    // through every level — fields set by the grandchild are visible to
    // the parent's later commands, exactly the reference's shared-record
    // semantics. Composition is plan construction: however deep the
    // nesting, it stays ONE Catalyst projection chain (no per-level
    // materialization).
    "m_pipe_nested" -> ((s, dir) => {
      val conf =
        """morphlines : [
          |  { id : parent, commands : [
          |    { setValues { stage : "parent" } }
          |    { pipe { id : child, commands : [
          |      { setValues { child_tag : "@{event_type}-in" } }
          |      { pipe { id : grandchild, commands : [
          |        { setValues { deep_tag : "@{child_tag}ner" } }
          |      ] } }
          |    ] } }
          |    { setValues { out_tag : "@{deep_tag}-out" } }
          |  ] }
          |]""".stripMargin
      val pipe = graft.pipeline.PipelineSpec.fromHocon(conf, "parent",
        env = _ => None)
      pipe(events(s, dir))
        .select(col("event_id"), col("stage"), col("child_tag"),
          col("deep_tag"), col("out_tag"))
        .orderBy("event_id")
    }),

    // Failure semantics / dead-letter channel (SURVEY §2.C): the
    // reference SKIPS a record a command rejects in the sink path
    // (MorphlineSinkTask.java:136-138) and DROPS it in the SMT path
    // (MorphlineTransform.java:113-121); at Spark scale the production
    // form is the badRecordsPath split — one pass, two channels, the
    // rejected rows carrying a machine-readable error instead of dying
    // in a log. The gate emits BOTH channels tagged, so the oracle
    // checks the split is a partition (every row in exactly one channel)
    // and the error column is right.
    "m_dead_letter" -> ((s, dir) => {
      val (good, bad) = ControlOps.deadLetterSplit(events(s, dir),
        col("event_type") =!= "error")
      good.select(col("event_id"), lit("ok").as("channel"),
          lit(null).cast("string").as("error"))
        .unionAll(bad.select(col("event_id"), lit("dead").as("channel"),
          concat(lit("bad_event_type:"), col("event_type")).as("error")))
        .orderBy("event_id")
    }),

    // if/then/else routing: column-level conditional.
    "m_if_then_else" -> ((s, dir) => {
      val pipe = Pipeline("ifelse", Seq(
        RecordOps.setColumns("tier" ->
          when(col("value") > 100, "high").otherwise("low"))))
      pipe(events(s, dir))
        .select(col("event_id"), col("tier"))
        .orderBy("event_id")
    }),

    // tryRules: first-matching-rule dispatch over branch pipelines.
    "m_try_rules" -> ((s, dir) => {
      val pipe = Pipeline("tryrules", Seq(
        ControlOps.tryRules(
          Seq(
            (col("event_type") === "purchase",
              (df: DataFrame) => df.withColumn("rule", lit("r_purchase"))),
            (col("value") > 150,
              (df: DataFrame) => df.withColumn("rule", lit("r_highvalue")))),
          catchAll = Some((df: DataFrame) => df.withColumn("rule", lit("r_default"))))))
      pipe(events(s, dir))
        .select(col("event_id"), col("rule"))
        .orderBy("event_id")
    }),

    // head / limit (batch-scoped).
    "m_head" -> ((s, dir) =>
      ControlOps.head(10)(events(s, dir).orderBy("event_id"))
        .select(col("event_id"), col("event_type"))),

    // deterministic sample (stable across retries — the scale-safe sample).
    "m_sample" -> ((s, dir) => {
      val pipe = Pipeline("sample", Seq(
        ControlOps.deterministicSample(col("event_id"), 20)))
      pipe(events(s, dir))
        .select(col("event_id"), col("event_type"))
        .orderBy("event_id")
    }),

    // readLine: 1→N explode of a multi-line payload.
    "m_read_line" -> ((s, dir) => {
      val multi = customer(s, dir)
        .withColumn("payload", concat_ws("\n", col("c_name"), col("c_mktsegment")))
      val pipe = Pipeline("readline", Seq(
        ParserOps.readLine("payload", "line")))
      pipe(multi)
        .select(col("c_custkey"), col("line"))
        .orderBy(col("c_custkey"), col("line"))
    }),

    // readCSV: delimited payload parse.
    "m_read_csv" -> ((s, dir) => {
      val csvLine = customer(s, dir)
        .withColumn("payload",
          concat_ws("|", col("c_custkey"), col("c_name"), col("c_mktsegment")))
      val pipe = Pipeline("readcsv", Seq(
        ParserOps.readCsv("payload",
          new StructType().add("id", LongType).add("name", StringType)
            .add("segment", StringType),
          sep = "|")))
      pipe(csvLine)
        .select(col("csv.id").as("id"), col("csv.name").as("name"),
          col("csv.segment").as("segment"))
        .orderBy("id")
    }),

    // conform-to-schema (enrichJson, F2 fixture): null-fill `missing`,
    // keep present fields, nullable unions → nullable columns.
    "m_conform_schema" -> ((s, dir) => {
      val parsed = events(s, dir)
        .select(col("event_id"), col("event_type"),
          // try_cast: $.k can be a NESTED OBJECT in hostile props, and an
          // ANSI cast of its json text to INT aborts the batch where the
          // reference's coercion fails only the record
          get_json_object(col("props"), "$.k").try_cast(IntegerType).as("k"))
      val target =
        """{"type":"record","name":"E","fields":[
          |{"name":"event_id","type":"long"},
          |{"name":"k","type":"int"},
          |{"name":"event_type","type":["null","string"],"default":null},
          |{"name":"missing","type":["null","string"],"default":null}]}"""
          .stripMargin
      Conform.conformTo(parsed, target).orderBy("event_id")
    }),

    // enrichJson with the schema loaded from a FILE (reference `schemaFile`,
    // KafkaDataProducerCommandBuilder.java:158-175) — written at plan time,
    // resolved once on the driver, embedded in the plan.
    "m_conform_file" -> ((s, dir) => {
      val schema =
        """{"type":"record","name":"E","fields":[
          |{"name":"event_id","type":"long"},
          |{"name":"user_id","type":"long"},
          |{"name":"event_type","type":["null","string"],"default":null},
          |{"name":"extra","type":["null","int"],"default":null}]}"""
          .stripMargin
      val f = java.nio.file.Files.createTempFile("graft-schema", ".avsc")
      java.nio.file.Files.write(f, schema.getBytes("UTF-8"))
      f.toFile.deleteOnExit()
      Conform.conformTo(events(s, dir),
        graft.schema.SchemaProvider.FromFile(f.toString)).orderBy("event_id")
    }),

    // enrichJson with the schema fetched by SUBJECT from a registry
    // (reference EnrichJsonBuilder.java:191-200; stub client — no egress) —
    // latest version wins, fetches cached per subject.
    "m_conform_registry" -> ((s, dir) => {
      val v1 = """{"type":"record","name":"E","fields":[
                 |{"name":"event_id","type":"long"}]}""".stripMargin
      val v2 = """{"type":"record","name":"E","fields":[
                 |{"name":"event_id","type":"long"},
                 |{"name":"value","type":["null","double"],"default":null}]}"""
        .stripMargin
      val client = new graft.schema.CachedRegistryClient(
        new graft.schema.InMemoryRegistry(Map("events-value" -> Seq(v1, v2))))
      Conform.conformTo(events(s, dir),
        graft.schema.SchemaProvider.FromRegistry(client, "events-value"))
        .orderBy("event_id")
    }),

    // enrichJson with a PER-RECORD schema field (reference `schemaField`,
    // EnrichJsonBuilder.java:153-160): distinct schemas are a bounded
    // driver-side model; rows route to one conformance branch per schema.
    "m_conform_by_field" -> ((s, dir) => {
      val sA = """{"type":"record","name":"A","fields":[
                 |{"name":"event_id","type":"long"},
                 |{"name":"event_type","type":"string"}]}""".stripMargin
      val sB = """{"type":"record","name":"B","fields":[
                 |{"name":"event_id","type":"long"},
                 |{"name":"user_id","type":"long"}]}""".stripMargin
      val tagged = events(s, dir).withColumn("schema",
        when(col("event_type") === "click", sA).otherwise(sB))
      Conform.conformByField(tagged, "schema", keep = Seq("event_id"))
        .orderBy("event_id")
    }),

    // readAvro/toAvro roundtrip (kite-avro commands over Apache Avro binary).
    "m_avro_roundtrip" -> ((s, dir) => {
      val schema =
        """{"type":"record","name":"Cust","fields":[
          |{"name":"id","type":"long"},
          |{"name":"name","type":["null","string"],"default":null},
          |{"name":"segment","type":"string"}]}""".stripMargin
      val pipe = Pipeline("avro", Seq(
        ParserOps.toAvroBytes(
          struct(col("c_custkey").as("id"), col("c_name").as("name"),
            col("c_mktsegment").as("segment")), schema, "avro_bytes"),
        ParserOps.readAvro("avro_bytes", schema, "decoded")))
      pipe(customer(s, dir))
        .select(col("decoded.id").as("id"), col("decoded.name").as("name"),
          col("decoded.segment").as("segment"))
        .orderBy("id")
    }),

    // Registry wire-format roundtrip: frame the Avro-encoded record with
    // the Confluent 5-byte header, unframe, decode — schema_id, payload
    // text, and the constant 5-byte overhead all oracle-checked.
    "m_confluent_wire" -> ((s, dir) => {
      val schema =
        """{"type":"record","name":"d","fields":[
          |{"name":"doc_id","type":"long"},{"name":"text","type":"string"}]}"""
          .stripMargin
      val d = Tables.load(s, dir, "documents")
      val framed = graft.exprs.AvroExprs.confluent_frame(
        graft.exprs.AvroExprs.to_avro_binary(
          struct(col("doc_id"), col("text")), schema),
        (col("doc_id") % 1000 + 1).cast("int"))
      d.select(col("doc_id"), framed.as("w"))
        .select(col("doc_id"), col("w"),
          graft.exprs.AvroExprs.confluent_unframe(col("w")).as("u"))
        .select(col("doc_id"),
          col("u.schema_id").as("schema_id"),
          md5(graft.exprs.AvroExprs.from_avro_binary(col("u.payload"), schema)
            .getField("text")).as("text_md5"),
          (length(col("w")) - length(col("u.payload"))).as("overhead"))
        .orderBy("doc_id")
    }),

    // extractJsonTree/extractAvroTree: recursive flatten of a nested struct.
    "m_extract_tree" -> ((s, dir) => {
      val nested = events(s, dir).select(col("event_id"),
        struct(col("event_type").as("type"),
          struct(col("user_id").as("id"), col("value").as("v")).as("user"))
          .as("tree"))
      val pipe = Pipeline("tree", Seq(RecordOps.extractTree("tree")))
      pipe(nested)
        .select(col("event_id"), col("tree_type"), col("tree_user_id"),
          col("tree_user_v"))
        .orderBy("event_id")
    }),

    // addValues/removeValues: multi-valued field lifecycle.
    "m_multivalue" -> ((s, dir) => {
      val pipe = Pipeline("mv", Seq(
        RecordOps.addValues("tags", col("event_type"), lit("all"), lit("raw")),
        RecordOps.removeValues("tags", lit("raw"))))
      pipe(events(s, dir))
        .select(col("event_id"), concat_ws(",", col("tags")).as("tags"))
        .orderBy("event_id")
    }),

    // removeFields: projection by dropping.
    "m_remove_fields" -> ((s, dir) => {
      val pipe = Pipeline("rm", Seq(
        RecordOps.removeFields("props", "value", "ts")))
      pipe(events(s, dir)).orderBy("event_id")
    }),

    // separateAttachments: one record per attachment (1→N explode).
    "m_separate_attachments" -> ((s, dir) => {
      val withAtt = events(s, dir)
        .withColumn("attachments",
          array(col("event_type"), col("user_id").cast("string")))
      val pipe = Pipeline("sep", Seq(
        ParserOps.separateAttachments("attachments", "att")))
      pipe(withAtt)
        .select(col("event_id"), col("att"))
        .orderBy("event_id", "att")
    }),

    // sanitizeUnknownSolrFields: schema-driven projection.
    "m_sanitize_fields" -> ((s, dir) =>
      graft.io.Sinks.sanitizeToSchema(events(s, dir),
          Seq("event_id", "event_type", "nonexistent_field"))
        .orderBy("event_id")),

    // logInfo/Metrics as observe: pass-through with named metrics attached.
    "m_observe" -> ((s, dir) => {
      val pipe = Pipeline("obs", Seq(
        RecordOps.observeMetrics("m_observe_metrics",
          count(lit(1)).as("n"), sum(col("value")).as("total")),
        ControlOps.keepWhere(col("event_type") =!= "error")))
      pipe(events(s, dir))
        .select(col("event_id"), col("event_type"))
        .orderBy("event_id")
    }),

    // Schemaless ingest via VariantType (Spark 4): parse_json with no
    // declared schema, typed access via variant_get — the modern answer to
    // the reference's schemaless Map payloads (Records.java:47-69).
    "m_variant_json" -> ((s, dir) =>
      events(s, dir)
        // try_parse_json, not parse_json: one malformed props string is a
        // dropped-record condition in the reference, not a batch abort
        // (MALFORMED_RECORD_IN_PARSING killed the whole scan — events
        // poisoned-corpus sweep)
        .withColumn("v", try_parse_json(col("props")))
        .select(col("event_id"),
          try_variant_get(col("v"), "$.k", "int").as("k"),
          try_variant_get(col("v"), "$.missing", "string").as("missing"))
        .orderBy("event_id")),

    // extractURIComponents / extractURIQueryParameters over synthesized URLs.
    "m_extract_uri" -> ((s, dir) => {
      val urls = events(s, dir).withColumn("url",
        concat(lit("https://example.com/ev/"), col("event_type"),
          lit("?user="), col("user_id"), lit("&k="), col("event_id"),
          lit("#frag")))
      val pipe = Pipeline("uri", Seq(
        RecordOps.extractUriComponents("url"),
        RecordOps.extractUriQueryParam("url", "user", "user_param")))
      pipe(urls)
        .select(col("event_id"), col("uri_scheme"), col("uri_host"),
          col("uri_path"), col("user_param"))
        .orderBy("event_id")
    }),

    // writeJson (fromConnectData converter:json serialize-back).
    "m_write_json" -> ((s, dir) => {
      val pipe = Pipeline("writejson", Seq(
        ParserOps.writeJson(Seq("event_id", "event_type"), "value")))
      pipe(events(s, dir))
        .select(col("event_id"), col("value"))
        .orderBy("event_id")
    })
  )

  val oracle: Map[String, String] = Map(
    // json_valid guard + TRY_CAST: DuckDB's json functions ABORT on
    // malformed json and an object-valued $.k fails the INT cast, where
    // Spark's from_json nulls the record (events poisoned-corpus sweep)
    "m_read_json" ->
      """SELECT event_id,
        |  CASE WHEN props IS NULL OR NOT json_valid(props) THEN NULL
        |    ELSE TRY_CAST(json_extract_string(props, '$.k') AS INT) END AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "m_extract_paths" ->
      """SELECT event_id,
        |  CASE WHEN props IS NULL OR NOT json_valid(props) THEN NULL
        |    ELSE TRY_CAST(json_extract_string(props, '$.k') AS INT) END AS k_renamed
        |FROM events ORDER BY event_id""".stripMargin,
    // @{field} of a missing/null field renders '' (kite Notations), so
    // null event_type still produces '-avro', not NULL
    "m_set_values" ->
      """SELECT event_id, coalesce(event_type, '') || '-avro' AS topic,
        |  coalesce(event_type, '') || '-value' AS subject
        |FROM events ORDER BY event_id""".stripMargin,
    // vowel count via pure nested replace (no regexp — engine-identical
    // greedy scans), mirroring the user UDF's toLowerCase + count
    "m_custom_udf" ->
      """SELECT doc_id,
        |  CAST(length(lower(text)) -
        |    length(replace(replace(replace(replace(replace(lower(text),
        |      'a',''),'e',''),'i',''),'o',''),'u','')) AS BIGINT) AS vowels,
        |  coalesce(lang, '') || '-graded' AS grade
        |FROM documents ORDER BY doc_id""".stripMargin,
    "m_convert_timestamp" ->
      """SELECT o_orderkey,
        |  strftime(coalesce(try_strptime(strftime(o_orderdate, '%Y-%m-%d'), '%m/%d/%Y'),
        |                    try_strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d')),
        |           '%Y-%m-%d %H:%M:%S') AS converted
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "m_convert_unix_millis" ->
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S.%g') || 'Z' AS iso
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "m_find_replace" ->
      """SELECT event_id, regexp_replace(event_type, 'e', '3', 'g') AS event_type
        |FROM events ORDER BY event_id""".stripMargin,
    "m_split" ->
      """SELECT doc_id, len(string_split(text, ' ')) AS n_toks,
        |  string_split(text, ' ')[1] AS first_tok
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the staged kv string is concat(type, user): a null in EITHER nulls
    // the whole string (Spark concat), so both extracted values null
    "m_split_kv" ->
      """SELECT event_id,
        |  CASE WHEN event_type IS NULL OR user_id IS NULL THEN NULL
        |       ELSE event_type END AS type_v,
        |  CASE WHEN event_type IS NULL OR user_id IS NULL THEN NULL
        |       ELSE CAST(user_id AS VARCHAR) END AS user_v
        |FROM events ORDER BY event_id""".stripMargin,
    "m_translate" ->
      """SELECT n_nationkey, n_name,
        |  CASE n_name WHEN 'UNITED STATES' THEN 'US' WHEN 'GERMANY' THEN 'DE'
        |    WHEN 'FRANCE' THEN 'FR' WHEN 'CHINA' THEN 'CN' WHEN 'JAPAN' THEN 'JP'
        |    ELSE 'other' END AS code
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    // the staged log line concats user_id and event_type: either null
    // nulls the line, grok of a null line extracts nothing (row kept)
    "m_grok" ->
      """SELECT event_id,
        |  CASE WHEN event_type IS NULL OR user_id IS NULL THEN NULL
        |       ELSE 'INFO' END AS level,
        |  CASE WHEN event_type IS NULL OR user_id IS NULL THEN NULL
        |       ELSE CAST(user_id AS VARCHAR) END AS uid,
        |  CASE WHEN event_type IS NULL OR user_id IS NULL THEN NULL
        |       ELSE event_type END AS etype
        |FROM events ORDER BY event_id""".stripMargin,
    "m_to_string_trim" ->
      """SELECT c_custkey, trim('  ' || c_name || '  ') AS trimmed
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "m_base64" ->
      """SELECT event_id, to_base64(encode(event_type)) AS b64,
        |  event_type AS roundtrip
        |FROM events ORDER BY event_id""".stripMargin,
    // concat_ws both sides: a null event_type is SKIPPED (key degrades
    // to the id), never a NULL key — doc-keyed sinks need a key per row
    "m_sequence_key" ->
      """SELECT event_id,
        |  md5(concat_ws(' ', event_type, CAST(event_id AS VARCHAR))) AS id
        |FROM events ORDER BY event_id""".stripMargin,
    // the certified-output projection: the random uuid bits stay out of the
    // hash (certified by the query's own fail-fast uniqueness+format pass);
    // what IS hashed proves per-record coverage and the deterministic
    // version/shape invariants
    "m_generate_uuid" ->
      """SELECT event_id, '4' AS uuid_version, 36 AS uuid_len
        |FROM events ORDER BY event_id""".stripMargin,
    // kite equals-on-missing fails => dropRecord's guard does NOT match a
    // null type; the record SURVIVES (unlike SQL's null-dropping <>)
    "m_drop_record" ->
      """SELECT event_id, event_type FROM events
        |WHERE event_type <> 'error' OR event_type IS NULL
        |ORDER BY event_id""".stripMargin,
    // `not` keeps rows whose nested predicate is null (kite: nested miss →
    // not succeeds) — hence the explicit IS NULL arm, unlike SQL NOT IN
    "m_kite_filters" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE lang = 'en'
        |  AND (source NOT IN ('src0', 'src1', 'src2') OR source IS NULL)
        |ORDER BY doc_id""".stripMargin,
    "m_if_then_else" ->
      """SELECT event_id, CASE WHEN value > 100 THEN 'high' ELSE 'low' END AS tier
        |FROM events ORDER BY event_id""".stripMargin,
    "m_try_rules" ->
      """SELECT event_id,
        |  CASE WHEN event_type = 'purchase' THEN 'r_purchase'
        |       WHEN value > 150 THEN 'r_highvalue'
        |       ELSE 'r_default' END AS rule
        |FROM events ORDER BY event_id""".stripMargin,
    "m_pipe_nested" ->
      """SELECT event_id, 'parent' AS stage,
        |  coalesce(event_type, '') || '-in' AS child_tag,
        |  coalesce(event_type, '') || '-inner' AS deep_tag,
        |  coalesce(event_type, '') || '-inner-out' AS out_tag
        |FROM events ORDER BY event_id""".stripMargin,
    "m_dead_letter" ->
      """SELECT event_id,
        |  CASE WHEN event_type <> 'error' THEN 'ok' ELSE 'dead' END
        |    AS channel,
        |  CASE WHEN event_type <> 'error' THEN CAST(NULL AS VARCHAR)
        |       ELSE 'bad_event_type:' || event_type END AS error
        |FROM events ORDER BY event_id""".stripMargin,
    "m_head" ->
      "SELECT event_id, event_type FROM events ORDER BY event_id LIMIT 10",
    "m_sample" ->
      """SELECT event_id, event_type FROM events
        |WHERE event_id % 20 = 0 ORDER BY event_id""".stripMargin,
    // concat_ws staging skips a null field: one line survives, the row
    // is never lost (|| would null the payload and drop the customer)
    "m_read_line" ->
      """SELECT c_custkey,
        |  unnest(string_split(concat_ws(chr(10), c_name, c_mktsegment),
        |    chr(10))) AS line
        |FROM customer ORDER BY c_custkey, line""".stripMargin,
    // concat_ws staging DROPS a null field from the delimited line, so
    // the remaining fields SHIFT LEFT at parse time — the classic CSV
    // null hazard, mirrored faithfully rather than papered over
    "m_read_csv" ->
      """SELECT c_custkey AS id,
        |  coalesce(c_name, c_mktsegment) AS name,
        |  CASE WHEN c_name IS NULL THEN NULL ELSE c_mktsegment END AS segment
        |FROM customer ORDER BY id""".stripMargin,
    "m_conform_schema" ->
      """SELECT event_id,
        |  CASE WHEN props IS NULL OR NOT json_valid(props) THEN NULL
        |    ELSE TRY_CAST(json_extract_string(props, '$.k') AS INT) END AS k,
        |  event_type, CAST(NULL AS VARCHAR) AS missing
        |FROM events ORDER BY event_id""".stripMargin,
    "m_conform_file" ->
      """SELECT event_id, user_id, event_type, CAST(NULL AS INT) AS extra
        |FROM events ORDER BY event_id""".stripMargin,
    "m_conform_registry" ->
      """SELECT event_id, value FROM events ORDER BY event_id""".stripMargin,
    "m_conform_by_field" ->
      """SELECT event_id,
        |  CASE WHEN event_type = 'click'
        |    THEN '{"event_id":' || event_id || ',"event_type":"' || event_type || '"}'
        |    ELSE '{"event_id":' || event_id || ',"user_id":' || user_id || '}'
        |  END AS enriched
        |FROM events ORDER BY event_id""".stripMargin,
    // name is union-null in the writer schema (nullable survives the
    // roundtrip) but segment is NOT: a null segment makes the record
    // unencodable -> encode fail-softs to a whole-record tombstone
    "m_avro_roundtrip" ->
      """SELECT
        |  CASE WHEN c_mktsegment IS NULL THEN NULL ELSE c_custkey END AS id,
        |  CASE WHEN c_mktsegment IS NULL THEN NULL ELSE c_name END AS name,
        |  c_mktsegment AS segment
        |FROM customer ORDER BY id""".stripMargin,
    // the wire roundtrip must reproduce the source text and the declared
    // schema id; the registry frame is 5 bytes by definition
    // a null-text doc is UNENCODABLE under the non-nullable writer
    // schema -> encode fail-softs to null, nothing frames (tombstone
    // contract), every derived column nulls — mirrored here so the
    // poisoned-corpus parity sweep holds
    "m_confluent_wire" ->
      """SELECT doc_id,
        |  CASE WHEN text IS NULL THEN NULL
        |       ELSE CAST(doc_id % 1000 + 1 AS INTEGER) END AS schema_id,
        |  md5(text) AS text_md5,
        |  CASE WHEN text IS NULL THEN NULL ELSE 5 END AS overhead
        |FROM documents ORDER BY doc_id""".stripMargin,
    "m_extract_tree" ->
      """SELECT event_id, event_type AS tree_type, user_id AS tree_user_id,
        |  value AS tree_user_v
        |FROM events ORDER BY event_id""".stripMargin,
    // concat_ws over the value list skips a null event_type
    "m_multivalue" ->
      """SELECT event_id,
        |  CASE WHEN event_type IS NULL THEN 'all'
        |       ELSE event_type || ',all' END AS tags
        |FROM events ORDER BY event_id""".stripMargin,
    "m_remove_fields" ->
      """SELECT event_id, user_id, event_type
        |FROM events ORDER BY event_id""".stripMargin,
    "m_separate_attachments" ->
      """SELECT event_id,
        |  unnest([event_type, CAST(user_id AS VARCHAR)]) AS att
        |FROM events ORDER BY event_id, att""".stripMargin,
    "m_sanitize_fields" ->
      """SELECT event_id, event_type FROM events ORDER BY event_id""".stripMargin,
    "m_observe" ->
      """SELECT event_id, event_type FROM events
        |WHERE event_type <> 'error' ORDER BY event_id""".stripMargin,
    "m_variant_json" ->
      """SELECT event_id,
        |  CASE WHEN props IS NULL OR NOT json_valid(props) THEN NULL
        |    ELSE TRY_CAST(json_extract_string(props, '$.k') AS INT) END AS k,
        |  CASE WHEN props IS NULL OR NOT json_valid(props) THEN NULL
        |    ELSE json_extract_string(props, '$.missing') END AS missing
        |FROM events ORDER BY event_id""".stripMargin,
    // the staged url concats event_type and user_id: either null nulls
    // the url, and every parsed component with it
    "m_extract_uri" ->
      """SELECT event_id,
        |  CASE WHEN event_type IS NULL OR user_id IS NULL THEN NULL
        |       ELSE 'https' END AS uri_scheme,
        |  CASE WHEN event_type IS NULL OR user_id IS NULL THEN NULL
        |       ELSE 'example.com' END AS uri_host,
        |  CASE WHEN event_type IS NULL OR user_id IS NULL THEN NULL
        |       ELSE '/ev/' || event_type END AS uri_path,
        |  CASE WHEN event_type IS NULL OR user_id IS NULL THEN NULL
        |       ELSE CAST(user_id AS VARCHAR) END AS user_param
        |FROM events ORDER BY event_id""".stripMargin,
    // to_json omits null fields entirely (reference writeJson too)
    "m_write_json" ->
      """SELECT event_id,
        |  CASE WHEN event_type IS NULL
        |    THEN '{"event_id":' || event_id || '}'
        |    ELSE '{"event_id":' || event_id || ',"event_type":"' ||
        |      event_type || '"}' END AS value
        |FROM events ORDER BY event_id""".stripMargin
  )
}
