package graft

import graft.exprs.{HashExprs, TextExprs}
import graft.sql.GraftSqlExtensions
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.functions._

/** SQL surface of the native expressions (SURVEY.md §2.F): every graft
  * Expression callable from `spark.sql(...)`, with the same results as the
  * Column API, through both installation paths.
  */
class SqlExtensionsSpec extends SparkSpec {

  private lazy val installed: Unit = GraftSqlExtensions.install(spark)

  // e-acute as one code point (NFC) vs 'e' + U+0301 COMBINING ACUTE ACCENT
  private val composed = "Caf\u00e9"
  private val decomposed = "Cafe\u0301"

  test("injectFunction path registers the full function table") {
    val names = GraftBridge.injectedFunctionNames(new GraftSqlExtensions()(_))
    val expected = GraftSqlExtensions.functions.map(_._1.funcName).toSet
    assert(expected.subsetOf(names.toSet), s"missing: ${expected -- names.toSet}")
    assert(expected.size == 14) // update when adding to GraftSqlExtensions.functions
  }

  test("graft_nearest_centroid assigns cells from a nested array literal") {
    installed
    val out = spark.sql(
      """SELECT graft_nearest_centroid(array(0.9D, 0.1D),
        |         array(array(1.0D, 0.0D), array(0.0D, 1.0D))) AS a,
        |       graft_nearest_centroid(array(0.1D, 2.0D),
        |         array(array(1.0D, 0.0D), array(0.0D, 1.0D))) AS b,
        |       graft_nearest_centroid(array(1.0D, 1.0D),
        |         array(array(0.0D, 0.0D), array(2.0D, 2.0D))) AS tie
        |""".stripMargin).head()
    assert(out.getInt(0) == 0)
    assert(out.getInt(1) == 1)
    assert(out.getInt(2) == 0, "equidistant must tie to the lower index")
  }

  test("graft_nearest_centroid widens int/float centroid literals") {
    installed
    // array(array(1, 0), ...) folds to int elements; an unchecked
    // getDouble on that ArrayData used to surface as INTERNAL_ERROR
    val out = spark.sql(
      """SELECT graft_nearest_centroid(array(0.9D, 0.1D),
        |         array(array(1, 0), array(0, 1))) AS a,
        |       graft_nearest_centroid(array(0.1D, 2.0D),
        |         array(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |               array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT)))) AS b
        |""".stripMargin).head()
    assert(out.getInt(0) == 0)
    assert(out.getInt(1) == 1)
  }

  test("graft_nearest_centroid rejects non-numeric centroid literals as analysis errors") {
    installed
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_nearest_centroid(array(1.0D), " +
        "array(array('x')))").collect()
    }
    assert(err.getMessage.contains("array<array<double>>"), err.getMessage)
  }

  test("graft_nearest_centroid casts an array<float> vector instead of misreading it") {
    installed
    // the embeddings table's raw column is array<float>; ImplicitCast on
    // NearestCentroid must insert the cast rather than misread bytes
    val out = spark.sql(
      """SELECT graft_nearest_centroid(
        |         array(CAST(0.1 AS FLOAT), CAST(2.0 AS FLOAT)),
        |         array(array(1.0D, 0.0D), array(0.0D, 1.0D))) AS a
        |""".stripMargin).head()
    assert(out.getInt(0) == 1)
  }

  test("NearestCentroid fails loudly on a dimension mismatch") {
    val df = spark.range(1).select(
      org.apache.spark.sql.classic.GraftBridge.column(
        graft.exprs.HashExprs.NearestCentroid(
          org.apache.spark.sql.classic.GraftBridge.expression(
            array(lit(1.0), lit(2.0), lit(3.0))),
          Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)))).as("c"))
    val err = intercept[Exception] { df.collect() }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(err).exists(_.getMessage != null) &&
      chain(err).exists(t => t.getMessage != null &&
        t.getMessage.contains("3 dims")), err.getMessage)
  }

  test("graft_confluent_frame/unframe roundtrip via SQL") {
    installed
    val out = spark.sql(
      """SELECT graft_confluent_unframe(
        |         graft_confluent_frame(CAST('payload' AS BINARY), 42)) AS u,
        |       graft_confluent_unframe(CAST('nosuchframe' AS BINARY)) AS bad
        |""".stripMargin).head()
    val u = out.getStruct(0)
    assert(u.getInt(0) == 42)
    assert(new String(u.getAs[Array[Byte]](1), "UTF-8") == "payload")
    assert(out.isNullAt(1), "malformed frame must be a filterable null")
  }

  test("SQL results match the Column API on real corpus text") {
    installed
    val docs = spark.read.parquet(s"$sf0/documents.parquet")
    docs.createOrReplaceTempView("sqlx_docs")
    val viaSql = spark.sql(
      """SELECT doc_id,
        |  graft_simhash(graft_word_shingles(text, 3)) AS sh,
        |  graft_minhash(graft_word_shingles(text, 3), 4) AS mh,
        |  graft_array_jaccard(graft_char_shingles(text, 5),
        |                      graft_char_shingles(upper(text), 5)) AS jac
        |FROM sqlx_docs ORDER BY doc_id LIMIT 20""".stripMargin).collect()
    val viaApi = docs
      .select(col("doc_id"),
        HashExprs.simhash64(HashExprs.word_shingles(col("text"), 3)).as("sh"),
        HashExprs.minhash_sig(HashExprs.word_shingles(col("text"), 3), 4).as("mh"),
        HashExprs.array_jaccard(HashExprs.char_shingles(col("text"), 5),
          HashExprs.char_shingles(upper(col("text")), 5)).as("jac"))
      .orderBy("doc_id").limit(20).collect()
    assert(viaSql.toSeq == viaApi.toSeq)
  }

  test("graft_nfc composes decomposed sequences; NFC text passes through") {
    installed
    assert(composed != decomposed, "fixture must start distinct")
    val out = spark.sql(
      s"SELECT graft_nfc('$composed') AS a, graft_nfc('$decomposed') AS b, " +
        "graft_nfc(CAST(NULL AS STRING)) AS c").head()
    assert(out.getString(0) == composed)
    assert(out.getString(1) == composed)
    assert(out.isNullAt(2))
    // normalization unifies the dedup fingerprint — the reason the op exists
    val fp = spark.sql(
      s"SELECT md5(graft_nfc('$composed')) = md5(graft_nfc('$decomposed')) AS same")
      .head()
    assert(fp.getBoolean(0))
  }

  test("graft_vec_dot and graft_hyperplane_lsh agree with the Column API") {
    installed
    val row = spark.sql(
      """SELECT graft_vec_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d,
        |       graft_hyperplane_lsh(array(0.5D, -0.25D, 1.5D, 0.75D), 8) AS b1,
        |       graft_hyperplane_lsh(array(0.5D, -0.25D, 1.5D, 0.75D), 8, 42L) AS b2
        |""".stripMargin).head()
    assert(row.getDouble(0) == 32.0)
    assert(row.getLong(1) == row.getLong(2), "default seed must be 42")
    val api = spark.range(1).select(
      HashExprs.hyperplane_lsh(
        array(lit(0.5), lit(-0.25), lit(1.5), lit(0.75)), 8, 42L)).head().getLong(0)
    assert(row.getLong(1) == api)
  }

  test("graft_gunzip round-trips through SQL") {
    installed
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write("corpus payload".getBytes("UTF-8")); gz.close()
      bos.toByteArray
    }
    import spark.implicits._
    Seq(bytes).toDF("raw").createOrReplaceTempView("sqlx_gz")
    val out = spark.sql(
      "SELECT CAST(graft_gunzip(raw) AS STRING) AS s FROM sqlx_gz").head()
    assert(out.getString(0) == "corpus payload")
  }

  test("non-literal shape parameter is rejected at analysis, not at runtime") {
    installed
    // must surface as an AnalysisException (user-facing invalid argument),
    // NOT SparkException [INTERNAL_ERROR] — the exception CLASS is the
    // assertion; a substring check alone also matches the internal error's
    // parameter dump and masks a broken error path
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_minhash(graft_word_shingles('a b c', 2), doc_id) " +
        "FROM (SELECT 1 AS doc_id)").collect()
    }
    assert(err.getMessage.contains("integer literal"), err.getMessage)
  }

  test("NfcNormalize Column API: mixed composed/decomposed corpus unifies") {
    val df = spark.createDataFrame(Seq(
      (1, s"$composed au lait"), (2, s"$decomposed au lait"), (3, "plain ascii")))
      .toDF("id", "t")
    assert(df.select(col("t")).distinct().count() == 3)
    val n = df.select(TextExprs.nfc_normalize(col("t")).as("n"))
      .distinct().count()
    assert(n == 2)
  }
}
