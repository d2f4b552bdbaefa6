package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed in distributed batches.
  *
  * The decode step is STUBBED (this container has no image/audio codecs):
  * `fakeDecodeFeatures` derives a deterministic pseudo-feature vector from
  * the payload bytes so the Spark-side plumbing — schema, partitioning,
  * batch shape, downstream joins — is real and testable. Swap
  * `fakeDecodeFeatures` for a real codec UDF / mapInPandas-equivalent in
  * production.
  */
object Multimodal {

  /** Canonical media schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)
  ))

  /** Sniff a format from magic bytes — real logic, works on any binary
    * column (hex of the first 4 payload bytes). */
  def sniffFormat(payload: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val magic = upper(hex(substring(payload, 1, 4)))
    when(magic.startsWith("FFD8FF"), "image/jpeg")
      .when(magic === "89504E47", "image/png")
      .when(magic === "47494638", "image/gif")
      .when(magic === "52494646", "audio/wav") // RIFF
      .when(magic === "664C6143", "audio/flac")
      .otherwise("application/octet-stream")
  }

  /** Attach byte-level metadata to a binary column — no decode needed. */
  def attachMeta(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("n_bytes", octet_length(col(payloadCol)))
      .withColumn("sniffed_mime", sniffFormat(col(payloadCol)))
      .withColumn("payload_hash", xxhash64(col(payloadCol)))

  /** STUB decode -> feature vector: deterministic pseudo-features from
    * payload hashes (`dim` doubles in [-1, 1]). Replace with a real codec;
    * the signature (binary in, array<float> out, per-row, no shuffle) is
    * what a real mapInPandas/UDF decode has. */
  def fakeDecodeFeatures(payload: org.apache.spark.sql.Column, dim: Int = 8)
      : org.apache.spark.sql.Column =
    transform(
      sequence(lit(0), lit(dim - 1)),
      i =>
        (pmod(xxhash64(payload, i), lit(2000001L)).cast("double") -
          lit(1000000.0)) / lit(1000000.0)
    ).cast("array<float>")

  /** Deterministic frame sampling plumbing for video-like payloads: emit
    * `nFrames` (frame_idx, frame_feature) rows per media row. The frame
    * decode itself is the same stub. */
  def sampleFrames(df: DataFrame, payloadCol: String, nFrames: Int = 4)
      : DataFrame =
    df.select(
      col("*"),
      posexplode(transform(
        sequence(lit(0), lit(nFrames - 1)),
        // frame index mixed into the payload as UTF-8 bytes (an int
        // cannot cast to binary under ANSI — caught by MultimodalSpec)
        i => fakeDecodeFeatures(
          concat(col(payloadCol), i.cast("string").cast("binary")), 8)
      )).as(Seq("frame_idx", "frame_features"))
    )

  /** Deterministic stub decoder: payload bytes -> `dim` floats in [-1, 1]
    * via a per-dimension byte fold. Stands in for a real image/audio
    * codec (none in this container) with the same signature shape:
    * bytes in, fixed-width feature vector out, pure per-row. */
  def stubDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var d = 0
    while (d < dim) {
      var h = 0L
      var i = 0
      while (i < bytes.length) {
        h = (h * (131 + d) + (bytes(i) & 0xff)) % 2000001L
        i += 1
      }
      out(d) = ((h - 1000000L).toDouble / 1000000.0).toFloat
      d += 1
    }
    out
  }

  /** Batched decode plumbing — the Scala analog of `mapInPandas`: a
    * pluggable decoder applied partition-wise, iterator-in/iterator-out,
    * so each task holds one row's payload at a time (constant memory) and
    * the decoder can amortize any per-batch setup across its partition.
    * Swap `decode` for a real codec; schema/partitioning/batch shape stay
    * identical. */
  def decodeBatched(
      df: DataFrame,
      payloadCol: String,
      dim: Int = 8,
      decode: Array[Byte] => Array[Float] = null
  ): DataFrame = {
    val dec: Array[Byte] => Array[Float] =
      if (decode == null) stubDecode(_, dim) else decode
    val outSchema = org.apache.spark.sql.types.StructType(
      df.schema.fields :+
        StructField("features", ArrayType(FloatType, containsNull = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val feats = if (payload == null) new Array[Float](dim)
                    else dec(payload)
        Row.fromSeq(r.toSeq :+ feats.toSeq)
      }
    }(enc)
  }

  /** Build a media table from any string column (test harness: the
    * container has no binary fixtures, so docs stand in for payloads). */
  def fromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      col(textCol).cast("binary").as("payload")
    )

  /** Portable variant of the decode stub: pseudo-feature i derived from
    * two char-fold base hashes, `((f1 + i*f2) mod 2000001 - 1e6) / 1e6`
    * — every arithmetic step is reproducible in the DuckDB oracle (m02),
    * so even the stubbed decode path is hash-verified end to end. */
  def portableFeature(
      f1: org.apache.spark.sql.Column,
      f2: org.apache.spark.sql.Column,
      i: org.apache.spark.sql.Column
  ): org.apache.spark.sql.Column =
    (pmod(f1 + i * f2, lit(2000001L)).cast("double") - lit(1000000.0)) /
      lit(1000000.0)
}
