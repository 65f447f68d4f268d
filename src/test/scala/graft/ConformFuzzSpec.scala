package graft

import graft.functions.Conform
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen

import scala.jdk.CollectionConverters._

/** Conformance fuzzing (round-13 verdict item 6): ConformEdgeSpec pins the
  * known-subtle shapes on FIXED schemas; this suite generates random
  * Avro-shaped schemas (nested records / arrays / nullable unions /
  * multi-branch unions / timestamp-millis, depth ≤ 4) plus conforming and
  * deliberately-perturbed inputs, and asserts the enrichJson invariants
  * hold on every sample:
  *
  *  - totality: conformTo never throws — missing nullable fields, extra
  *    source fields, and null values all flow through;
  *  - target-shape: the output schema is exactly the target record's
  *    fields, in target order, with the target types (union branches as
  *    the sorted {type: value} struct);
  *  - null-fill: a nullable target field absent from the source is null
  *    on every row;
  *  - value preservation: every present field's value survives
  *    conformance bit-exactly (timestamp-millis via its epoch coercion).
  *
  * Maps are exercised in ConformEdgeSpec's fixed shapes and excluded here
  * (conformColumn treats them as opaque casts — nothing schema-dependent
  * to fuzz). Seeds are fixed (PropertySpec convention) so any
  * counterexample is reproducible.
  */
class ConformFuzzSpec extends SparkSpec {

  private val baseSeed: Long =
    sys.props.get("graft.prop.seed").map(_.toLong).getOrElse(42L)
  private def forAllSampled[T](gen: Gen[T], n: Int)(body: T => Unit): Unit = {
    var ran = 0
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default,
        org.scalacheck.rng.Seed(baseSeed + i * 1000L)).foreach { t =>
        ran += 1; body(t)
      }
    }
    // Gen.apply returns None on generator failure — a generator that
    // quietly fails most seeds would make the property vacuous
    assert(ran >= n / 2, s"only $ran/$n samples generated — fuzz is vacuous")
  }

  // ---- schema AST -------------------------------------------------------
  private sealed trait FS
  private case class FPrim(name: String) extends FS // int long double boolean string
  private case object FTs extends FS                // long + timestamp-millis
  private case class FUnion(branches: List[String]) extends FS // ≥2 prims
  private case class FArray(el: FS, elNullable: Boolean) extends FS
  private case class FRecord(fields: List[(String, FS, Boolean)]) extends FS
  // (name, type, nullable) — nullable renders as ["null", T]

  private val primNames = List("int", "long", "double", "boolean", "string")

  private def genCore(depth: Int): Gen[FS] = {
    val leaf = Gen.frequency(
      5 -> Gen.oneOf(primNames).map(FPrim),
      1 -> Gen.const(FTs),
      2 -> Gen.pick(2, primNames).map(bs => FUnion(bs.toList.sorted)))
    if (depth <= 0) leaf
    else Gen.frequency(
      4 -> leaf,
      2 -> (for { el <- genCore(depth - 1); n <- Gen.oneOf(true, false) }
        yield FArray(el, n)),
      2 -> genRecord(depth - 1))
  }

  private def genRecord(depth: Int): Gen[FRecord] = for {
    n <- Gen.chooseNum(1, 4)
    fields <- Gen.sequence((0 until n).map(i => for {
      t <- genCore(depth)
      nullable <- Gen.oneOf(true, false)
    } yield (s"f$i", t, nullable)).toList)
  } yield FRecord(fields.asScala.toList)

  // ---- Avro JSON rendering ---------------------------------------------
  private var recCounter = 0
  private def toAvro(fs: FS): String = fs match {
    case FPrim(n) => "\"" + n + "\""
    case FTs => """{"type":"long","logicalType":"timestamp-millis"}"""
    case FUnion(bs) => bs.map("\"" + _ + "\"").mkString("[", ",", "]")
    case FArray(el, elNull) =>
      val item = (el, elNull) match { // same union-flattening rule
        case (FUnion(bs), true) =>
          ("\"null\"" +: bs.map("\"" + _ + "\"")).mkString("[", ",", "]")
        case (_, true) => s"""["null",${toAvro(el)}]"""
        case (_, false) => toAvro(el)
      }
      s"""{"type":"array","items":$item}"""
    case FRecord(fields) =>
      recCounter += 1
      val fjson = fields.map { case (name, t, nullable) =>
        // Avro forbids unions inside unions: a nullable union flattens to
        // ["null", b1, b2] instead of nesting
        val tj = (t, nullable) match {
          case (FUnion(bs), true) =>
            ("\"null\"" +: bs.map("\"" + _ + "\"")).mkString("[", ",", "]")
          case (_, true) => s"""["null",${toAvro(t)}]"""
          case (_, false) => toAvro(t)
        }
        s"""{"name":"$name","type":$tj}"""
      }.mkString(",")
      s"""{"type":"record","name":"R$recCounter","fields":[$fjson]}"""
  }

  // ---- target Spark types (what conformTo must produce) -----------------
  private def sparkPrim(n: String): DataType = n match {
    case "int" => IntegerType
    case "long" => LongType
    case "double" => DoubleType
    case "boolean" => BooleanType
    case "string" => StringType
  }
  private def targetType(fs: FS): DataType = fs match {
    case FPrim(n) => sparkPrim(n)
    case FTs => TimestampType
    case FUnion(bs) =>
      StructType(bs.sorted.map(b => StructField(b, sparkPrim(b), true)))
    case FArray(el, elNull) => ArrayType(targetType(el), elNull)
    case FRecord(fields) => StructType(fields.map { case (n, t, nullable) =>
      StructField(n, targetType(t), nullable) })
  }
  private def stripNullability(dt: DataType): DataType = dt match {
    case StructType(fs) => StructType(fs.map(f =>
      StructField(f.name, stripNullability(f.dataType), nullable = true)))
    case ArrayType(el, _) => ArrayType(stripNullability(el), containsNull = true)
    case other => other
  }

  // ---- value generation -------------------------------------------------
  // For a field-presence decision PER SCHEMA PATH (the source StructType
  // must be row-consistent), generate (sourceType, valueGen, expected).
  // Doubles are integral so cross-collection equality is exact.
  private def primGen(n: String): Gen[Any] = n match {
    case "int" => Gen.chooseNum(-1000, 1000)
    case "long" => Gen.chooseNum(-100000L, 100000L)
    case "double" => Gen.chooseNum(-999, 999).map(_.toDouble)
    case "boolean" => Gen.oneOf(true, false)
    case "string" => Gen.alphaStr.map(_.take(8))
  }

  /** value + its conformed expectation for a core type; None = null. */
  private def genValue(fs: FS): Gen[Option[(Any, Any)]] = fs match {
    case FPrim(n) => primGen(n).map(v => Some((v, v)))
    case FTs => // source: epoch-millis digit string; expected: coerced ts
      Gen.chooseNum(0L, 2000000000000L).map(ms =>
        Some((ms.toString, new java.sql.Timestamp(ms))))
    case FUnion(bs) => for { // exactly one branch set (the wire shape)
      pick <- Gen.oneOf(bs)
      v <- primGen(pick)
    } yield {
      val vals = bs.sorted.map(b => if (b == pick) v else null)
      Some((Row.fromSeq(vals), Row.fromSeq(vals)))
    }
    case FArray(el, elNull) => for {
      n <- Gen.chooseNum(0, 3)
      els <- Gen.sequence((0 until n).map(_ =>
        if (elNull) Gen.frequency(3 -> genValue(el), 1 -> Gen.const(None))
        else genValue(el)).toList)
    } yield {
      val pairs = els.asScala.toList
      Some((pairs.map(_.map(_._1).orNull), pairs.map(_.map(_._2).orNull)))
    }
    case FRecord(fields) => genRecordValue(FRecord(fields), fields.map(_._1).toSet)
      .map { case (src, exp) => Some((src, exp)) }
  }

  /** Row for a record given the set of fields PRESENT in the source;
    * expected row always has ALL target fields (absent → null). */
  private def genRecordValue(rec: FRecord, present: Set[String])
      : Gen[(Row, Row)] =
    Gen.sequence(rec.fields.map { case (name, t, nullable) =>
      if (!present.contains(name)) Gen.const((name, None: Option[(Any, Any)], false))
      else {
        val g = if (nullable)
          Gen.frequency(4 -> genValue(t), 1 -> Gen.const(None))
        else genValue(t)
        g.map(v => (name, v, true))
      }
    }.toList).map { parts =>
      val ps = parts.asScala.toList
      val srcVals = ps.collect { case (_, v, true) => v.map(_._1).orNull }
      val expVals = ps.map { case (_, v, _) => v.map(_._2).orNull }
      (Row.fromSeq(srcVals), Row.fromSeq(expVals))
    }

  /** Source Spark type for a core type (ts fields arrive as strings). */
  private def sourceType(fs: FS): DataType = fs match {
    case FTs => StringType
    case FPrim(n) => sparkPrim(n)
    case u: FUnion => targetType(u)
    case FArray(el, elNull) => ArrayType(sourceType(el), containsNull = true)
    case FRecord(fields) => StructType(fields.map { case (n, t, _) =>
      StructField(n, sourceType(t), nullable = true) })
  }

  test("random schemas: conformTo is total, target-shaped, null-filling, " +
      "and value-preserving (depth ≤ 4)") {
    val sample = for {
      rec <- genRecord(3) // top-level record + 3 levels below = depth 4
      // drop a random subset of the NULLABLE top-level fields from the
      // source (they must come back null-filled)
      dropped <- Gen.sequence(rec.fields.map { case (n, _, nullable) =>
        if (nullable) Gen.oneOf(Some(n), None) else Gen.const(None)
      }.toList).map(_.asScala.flatten.toSet)
      present = rec.fields.map(_._1).toSet -- dropped
      extra <- Gen.oneOf(true, false) // extra source field, must be dropped
      rows <- Gen.listOfN(5, genRecordValue(rec, present))
    } yield (rec, present, extra, rows)

    forAllSampled(sample, n = 12) { case (rec, present, extra, rows) =>
      val schemaJson = toAvro(rec)
      val srcFields = rec.fields.filter(f => present.contains(f._1))
        .map { case (n, t, _) => StructField(n, sourceType(t), nullable = true) }
      val srcType = StructType(
        if (extra) srcFields :+ StructField("zz_extra", StringType, true)
        else srcFields)
      val srcRows = rows.map { case (src, _) =>
        if (extra) Row.fromSeq(src.toSeq :+ "dropme") else src }
      val df = spark.createDataFrame(srcRows.asJava, srcType)

      val out = Conform.conformTo(df, schemaJson) // totality: must not throw
      // target shape: exactly the target fields, target order, target types
      assert(stripNullability(out.schema) ==
        stripNullability(targetType(rec).asInstanceOf[StructType]),
        s"schema mismatch for $schemaJson:\n got ${out.schema}")
      val got = out.collect().toSeq
      val expected = rows.map(_._2)
      assert(got == expected,
        s"values diverged for $schemaJson (present=$present):\n" +
          s" got      $got\n expected $expected")
      // null-fill invariant, stated directly: every dropped field is null
      val idx = rec.fields.map(_._1).zipWithIndex.toMap
      for (d <- rec.fields.map(_._1).toSet -- present; r <- got)
        assert(r.isNullAt(idx(d)), s"dropped field $d not null-filled")
    }
  }

  test("conformByField dispatch over random schema sets ≡ the single-schema " +
      "path per subset; null schemas pass through null") {
    // The chained-when dispatch (one scan, N branches) is the part worth
    // fuzzing: for ANY set of schemas spread across rows, each row's
    // enriched JSON must equal what a single-schema run over just that
    // row's subset produces, and null-schema rows must yield null.
    val sample = for {
      k <- Gen.chooseNum(2, 4)
      recs <- Gen.listOfN(k, genRecord(1)) // depth-2 targets
      rows <- Gen.listOfN(10, for {
        a <- Gen.chooseNum(-1000, 1000)
        b <- Gen.alphaStr.map(_.take(6))
        pick <- Gen.chooseNum(-1, k - 1) // -1 = null schema
      } yield (a, b, pick))
    } yield (recs, rows)

    forAllSampled(sample, n = 10) { case (recs0, rows) =>
      // overlap the payload: rename the first two PRIMITIVE-typed target
      // fields to the payload's a/b so real values flow through the
      // dispatch (otherwise every field null-fills and the fuzz is
      // weak); non-primitive targets keep their names — a scalar source
      // into an array/record target is out of conformTo's contract
      val recs = recs0.map { r =>
        var used = List("a", "b")
        FRecord(r.fields.map { case (n, t, nl) => t match {
          case FPrim(_) | FTs if used.nonEmpty =>
            val nn = used.head; used = used.tail; (nn, t, nl)
          case _ => (n, t, nl)
        }})
      }
      val schemas = recs.map(toAvro)
      val srcType = StructType(Seq(
        StructField("rid", IntegerType, false),
        StructField("a", IntegerType, true),
        StructField("b", StringType, true),
        StructField("sch", StringType, true)))
      val srcRows = rows.zipWithIndex.map { case ((a, b, pick), i) =>
        Row(i, a, b, if (pick < 0) null else schemas(pick)) }
      val df = spark.createDataFrame(srcRows.asJava, srcType)
      val multi = Conform.conformByField(df, "sch", keep = Seq("rid"),
          maxSchemas = 8)
        .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
      // per-subset single-schema runs are the reference
      rows.zipWithIndex.foreach { case ((_, _, pick), i) =>
        if (pick < 0)
          assert(multi(i) == null, s"row $i: null schema must yield null")
      }
      schemas.zipWithIndex.foreach { case (sj, si) =>
        val subset = srcRows.filter(r => r.getString(3) == sj)
        if (subset.nonEmpty) {
          val single = Conform.conformByField(
              spark.createDataFrame(subset.asJava, srcType), "sch",
              keep = Seq("rid"), maxSchemas = 8)
            .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
          single.foreach { case (rid, json) =>
            assert(multi(rid) == json,
              s"dispatch diverged for schema #$si row $rid:\n" +
                s" multi  ${multi(rid)}\n single $json")
          }
        }
      }
    }
  }

  test("non-conforming inputs: castable type drift conforms, garbage " +
      "timestamps null out, non-nullable missing field throws the contract") {
    // int-where-long and long-as-string are the reference's coercions —
    // conformColumn casts; values must survive numerically
    val target =
      """{"type":"record","name":"C","fields":[
        |{"name":"a","type":"long"},
        |{"name":"b","type":["null","double"]},
        |{"name":"ts","type":{"type":"long","logicalType":"timestamp-millis"}}]}"""
        .stripMargin
    val src = StructType(Seq(StructField("a", IntegerType, false),
      StructField("b", StringType, true), StructField("ts", StringType, true)))
    val df = spark.createDataFrame(Seq(
      Row(7, "2.5", "not a ts"), Row(-3, null, "1484897702123")).asJava, src)
    val out = Conform.conformTo(df, target).collect().toSeq
    assert(out == Seq(
      Row(7L, 2.5, null),
      Row(-3L, null, new java.sql.Timestamp(1484897702123L))))
    // a NON-nullable target field absent from the source is a contract
    // violation — require() must throw, not silently null-fill
    val bad = intercept[IllegalArgumentException] {
      Conform.conformTo(df.drop("a"), target)
    }
    assert(bad.getMessage.contains("missing non-nullable field a"))
  }
}
