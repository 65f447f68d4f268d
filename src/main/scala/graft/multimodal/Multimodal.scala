package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata — the reference's attachment triple
  * (`_attachment_body/_mimetype/_charset`, FromConnectDataBuilder.java:104-117)
  * generalized into a first-class column pattern.
  *
  * The Spark-side plumbing (schema, batch shape, partition sizing) is real;
  * the media decode itself is STUBBED with a deterministic fake because the
  * image/audio codecs are not in this container — the stub consumes the real
  * bytes and emits a schema-correct feature row, so swapping in a real codec
  * changes no plan shape.
  */
object Multimodal {

  /** Canonical multimodal column triple + media metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("body", BinaryType, nullable = true),
    StructField("mimeType", StringType, nullable = true),
    StructField("charset", StringType, nullable = true)))

  /** Feature schema produced by the decode stage. */
  val featureSchema: StructType = StructType(Seq(
    StructField("byteLen", LongType, nullable = false),
    StructField("contentHash", LongType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = true)))

  /** Wrap any castable column as a media binary column with mime metadata. */
  def asMedia(df: DataFrame, srcCol: String, mimeType: String): DataFrame =
    df.withColumn("media", struct(
      col(srcCol).cast(BinaryType).as("body"),
      lit(mimeType).as("mimeType"),
      lit("binary").as("charset")))

  // ======================= STUB DECODE =======================
  // Deterministic fake decoder: derives pseudo width/height and an 8-dim
  // feature vector from the byte content. A real implementation would call
  // the codec here (per-partition, batched); everything else is unchanged.
  private[multimodal] def fakeDecode(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
    val h = java.util.Arrays.hashCode(bytes)
    val width = 16 + math.abs(h % 1024)
    val height = 16 + math.abs((h / 1024) % 1024)
    val feat = Array.tabulate(8)(i =>
      (((h * 31 + i * 2654435761L) & 0xFFFF).toFloat / 65535.0f))
    (width, height, feat)
  }
  // ===========================================================

  /** Decode / feature-extract over the media column.
    *
    * Runs as `mapPartitions` over the typed Dataset — the Scala-side
    * equivalent of `mapInPandas` batch decode: per-partition setup cost is
    * amortized (a codec would be initialized once per partition, not per
    * row), and partition byte size is bounded by
    * `spark.sql.files.maxPartitionBytes` at scan time so a partition of
    * blobs fits executor memory.
    */
  def decodeFeatures(spark: SparkSession, df: DataFrame,
                     bodyCol: String = "media.body"): DataFrame = {
    val withBytes = df.withColumn("__bytes", col(bodyCol))
    val schema = StructType(withBytes.schema.fields.filterNot(_.name == "__bytes") :+
      StructField("features", featureSchema, nullable = true))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    withBytes.mapPartitions { rows =>
      // per-partition: real codec init would happen here, once
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("__bytes")
        val base = Row.fromSeq(
          r.toSeq.zip(r.schema.fields).collect {
            case (v, f) if f.name != "__bytes" => v
          })
        val feats = if (bytes == null) null else {
          val (w, h, f) = fakeDecode(bytes)
          Row(bytes.length.toLong,
            java.util.Arrays.hashCode(bytes).toLong, w, h, f.toSeq)
        }
        Row.fromSeq(base.toSeq :+ feats)
      }
    }(enc)
  }

  /** Cheap columnar media stats that need no decode: pure expressions over
    * the binary column (length, hash, magic-byte sniff). These run in
    * whole-stage codegen — use them to pre-filter before the expensive
    * decode stage (decode-after-filter is the 100 TB pattern).
    */
  def mediaStats(df: DataFrame, bodyCol: String = "media.body"): DataFrame =
    df.withColumn("byteLen", length(col(bodyCol)).cast("long"))
      .withColumn("contentMd5", md5(col(bodyCol)))
      .withColumn("sniffedType",
        when(hex(substring(col(bodyCol), 1, 2)) === "FFD8", "image/jpeg")
          .when(hex(substring(col(bodyCol), 1, 4)) === "89504E47", "image/png")
          .otherwise("application/octet-stream"))

  /** Frame-sample stand-in for video columns: emit every `stride`-th chunk
    * of the payload as a "frame" (1→N explode). Real frame extraction slots
    * into the same explode shape.
    */
  def frameSample(df: DataFrame, bodyCol: String, chunkBytes: Int,
                  stride: Int): DataFrame =
    df.withColumn("frameIdx",
        explode(sequence(lit(0),
          greatest(expr(s"length($bodyCol) div $chunkBytes div $stride").cast("int") - 1,
            lit(0)))))
      .withColumn("frame",
        col(bodyCol).substr((col("frameIdx") * stride * chunkBytes + 1).cast("int"),
          lit(chunkBytes)))
}
