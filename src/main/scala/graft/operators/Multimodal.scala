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
      // RIFF containers disambiguate on the form type at offset 8
      .when(magic === "52494646" &&
        upper(hex(substring(payload, 9, 4))) === "57454250",
        "image/webp")
      .when(magic === "52494646" &&
        upper(hex(substring(payload, 9, 4))) === "41564920",
        "video/x-msvideo") // RIFF form "AVI "
      .when(magic === "52494646", "audio/wav")
      .when(magic === "664C6143", "audio/flac")
      .when(magic === "504B0304", "application/zip")
      // ISO-BMFF: the brand box type at offset 4, not a leading magic
      .when(upper(hex(substring(payload, 5, 4))) === "66747970",
        "video/mp4")
      .when(magic === "25504446", "application/pdf") // "%PDF"
      .when(magic === "774F4646", "font/woff") // "wOFF"
      .when(magic === "7F454C46", "application/x-elf")
      .when(magic.startsWith("1F8B"), "application/gzip")
      .when(magic.startsWith("4D5A"), "application/x-msdownload") // MZ
      .when(magic.startsWith("494433"), "audio/mpeg") // ID3v2
      // bare MPEG audio frame: 11-bit sync FF Ex/Fx
      .when(substring(magic, 1, 2) === "FF" &&
        substring(magic, 3, 1).isin("E", "F"), "audio/mpeg")
      .when(magic.startsWith("424D"), "image/bmp")
      // ICO/CUR have no magic string: reserved 0x0000 then type 1/2 —
      // the 4-byte prefix is distinctive enough for a sniffer
      .when(magic === "00000100" || magic === "00000200", "image/x-icon")
      // zstd frame (LE magic FD2FB528) and its skippable siblings
      // (0x184D2A50..5F) — both belong to a zstd stream
      .when(magic === "28B52FFD", "application/zstd")
      .when(substring(magic, 3, 6) === "2A4D18" &&
        substring(magic, 1, 1) === "5", "application/zstd")
      // "WARC" then "/" — the web-archive record prefix (text magic)
      .when(magic === "57415243" &&
        upper(hex(substring(payload, 5, 1))) === "2F",
        "application/warc")
      // TAR has NO leading magic: "ustar" sits at byte offset 257,
      // after the NUL-padded name/mode/size region
      .when(upper(hex(substring(payload, 258, 5))) === "7573746172",
        "application/x-tar")
      .otherwise("application/octet-stream")
  }

  /** Attach byte-level metadata to a binary column — no decode needed. */
  def attachMeta(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("n_bytes", octet_length(col(payloadCol)))
      .withColumn("sniffed_mime", sniffFormat(col(payloadCol)))
      .withColumn("payload_hash", xxhash64(col(payloadCol)))

  /** Real image-header parsing over the payload bytes: width / height /
    * channels as a struct, null fields for non-image (or unparseable)
    * payloads.
    *
    *  - PNG: fixed-offset IHDR — width = bytes 16..19 big-endian,
    *    height = 20..23, channels mapped from the color-type byte 25
    *    (0 grey→1, 2 rgb→3, 3 palette→1, 4 grey+α→2, 6 rgba→4).
    *  - JPEG: segment offsets vary (APP/COM segments precede the frame
    *    header), so scan the first `maxScan` bytes for the SOF0/SOF2
    *    marker (FF C0 / FF C2): height = bytes sof+5..6, width =
    *    sof+7..8, channels = byte sof+9. The scan is the standard quick
    *    dims probe; a marker-length walk would need iteration and the
    *    only false-positive source is an FF C0 inside an APPn payload
    *    (e.g. an EXIF thumbnail) before the real SOF.
    *
    * The probe is ONE native codegen'd pass over the byte prefix
    * (MediaDimsPackExpr: dims packed into a long, unpacked here with
    * shifts that fuse into the same generated stage). The original
    * expression-tree formulation — an interpreted `filter` lambda over
    * `sequence(2, maxScan-10)` capturing the payload's hex image, which
    * Catalyst re-evaluates per element — cost ~maxScan² interpreted ops
    * per row and made m01 the most expensive bench query (9.7 s; this
    * form: ~0.2 s). The DuckDB m01 oracle keeps the equivalent hex-pair
    * arithmetic, so the kernel stays cross-engine verified. */
  def imageDims(payload: org.apache.spark.sql.Column, maxScan: Int = 256)
      : org.apache.spark.sql.Column = {
    val packed = org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.MediaDimsPackExpr(
        org.apache.spark.sql.GraftSqlBridge.expression(payload), maxScan))
    val c = packed.bitwiseAND(lit(15L))
    struct(
      when(packed >= 0L, shiftright(packed, 24)).as("width"),
      when(packed >= 0L, shiftright(packed, 4).bitwiseAND(lit(1048575L)))
        .as("height"),
      when(packed >= 0L && c =!= graft.functions.MediaDimsUtil.NoChannels, c)
        .as("channels"))
  }

  /** WAV header metadata as a struct: sample_rate / channels /
    * bits_per_sample / data_bytes, null fields for non-WAV payloads.
    * Two native chunk-walking passes over the byte prefix (WavFmtPackExpr
    * / WavDataSizeExpr) — a real demuxer walk, so LIST/INFO chunks
    * before `data` don't break the parse the way fixed offsets would. */
  def wavMeta(payload: org.apache.spark.sql.Column, maxScan: Int = 256)
      : org.apache.spark.sql.Column = {
    val fmt = org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.WavFmtPackExpr(
        org.apache.spark.sql.GraftSqlBridge.expression(payload), maxScan))
    val ds = org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.WavDataSizeExpr(
        org.apache.spark.sql.GraftSqlBridge.expression(payload), maxScan))
    struct(
      when(fmt >= 0L, shiftright(fmt, 10)).as("sample_rate"),
      when(fmt >= 0L, shiftright(fmt, 6).bitwiseAND(lit(15L)))
        .as("channels"),
      when(fmt >= 0L, fmt.bitwiseAND(lit(63L))).as("bits_per_sample"),
      when(ds >= 0L, ds).as("data_bytes"))
  }

  /** Deterministic planted WAV payloads (the audio analog of
    * [[plantedMedia]]): canonical RIFF/WAVE headers whose sample rate,
    * channel count and frame count all vary with the id, every third
    * row carrying a LIST/INFO chunk BEFORE `data` (so a fixed-offset
    * parse reads garbage there — the chunk walk is load-bearing), and
    * every fourth row a non-WAV text payload (null metadata).
    * Construction is hex + unhex, reproduced in the m03 oracle. */
  def plantedAudio(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val id = col(idCol)
    // byte k of a little-endian field: power-of-two division is exact
    // in double for these magnitudes (< 2^32), truncation = floor
    def byteAt(c: org.apache.spark.sql.Column, shift: Long) =
      pmod((c / lit(shift.toDouble)).cast("long"), lit(256L))
    def le16(c: org.apache.spark.sql.Column) =
      format_string("%02X%02X", byteAt(c, 1L), byteAt(c, 256L))
    def le32(c: org.apache.spark.sql.Column) =
      format_string("%02X%02X%02X%02X",
        byteAt(c, 1L), byteAt(c, 256L), byteAt(c, 65536L),
        byteAt(c, 16777216L))
    val sr = when(id % 5 === 0, 8000L).when(id % 5 === 1, 16000L)
      .when(id % 5 === 2, 22050L).when(id % 5 === 3, 44100L)
      .otherwise(48000L)
    val ch = (id % 2 + 1).cast("long")
    val nFrames = (id % 400 + 100).cast("long")
    val dataSize = nFrames * ch * 2L
    val fmtChunk = concat(
      lit("666D7420"), le32(lit(16L)), // "fmt ", size 16
      le16(lit(1L)), le16(ch), le32(sr),
      le32(sr * ch * 2L), le16(ch * 2L), le16(lit(16L)))
    val listChunk = // "LIST" size=4 "INFO" — parked BEFORE data
      concat(lit("4C495354"), le32(lit(4L)), lit("494E464F"))
    // RIFF length = everything after the 8-byte RIFF header: WAVE tag
    // (4) + fmt chunk (24) + data header (8) = 36, plus 12 more when the
    // LIST/INFO chunk is planted — a demuxer that validates the field
    // must accept these fixtures.
    val riffLen = dataSize + when(id % 3 === 0, lit(48L)).otherwise(lit(36L))
    val wavHex = concat(
      lit("52494646"), le32(riffLen), lit("57415645"),
      fmtChunk,
      when(id % 3 === 0, listChunk).otherwise(lit("")),
      lit("64617461"), le32(dataSize))
    df.select(
      id.as("media_id"),
      unhex(
        when(id % 4 === 3, hex(col(textCol).cast("binary")))
          .otherwise(wavHex)).as("payload"))
  }

  /** One payload byte (0-based offset `i`) out of a hex image of the
    * prefix — `conv` + `substring` are codegen'd builtins, so a handful
    * of byte reads stay inside whole-stage codegen. */
  private def hxByte(hx: org.apache.spark.sql.Column, i: Int)
      : org.apache.spark.sql.Column =
    conv(substring(hx, 2 * i + 1, 2), 16, 10).cast("long")

  /** GIF logical-screen dims as a struct (width, height) — fixed-offset
    * byte arithmetic: bytes 6-7 little-endian width, 8-9 height, valid
    * for GIF87a and GIF89a alike. Null fields for non-GIF payloads. */
  def gifDims(payload: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val hx = upper(hex(substring(payload, 1, 10)))
    val ok = length(hx) >= 20 && substring(hx, 1, 8) === "47494638"
    struct(
      when(ok, hxByte(hx, 6) + hxByte(hx, 7) * 256L).as("width"),
      when(ok, hxByte(hx, 8) + hxByte(hx, 9) * 256L).as("height"))
  }

  /** FLAC STREAMINFO as a struct (sample_rate, channels,
    * bits_per_sample, total_samples) — the spec pins STREAMINFO as the
    * first metadata block, so the packed audio parameters sit at fixed
    * offsets 18-25: sample rate 20 bits, channels-1 3 bits, bits-1
    * 5 bits, total samples 36 bits, all big-endian bit-packed. The
    * block-type check masks off the last-metadata-block flag (bit 7)
    * and the declared STREAMINFO length must be 34. Null fields for
    * non-FLAC (or malformed) payloads. */
  def flacStreamInfo(payload: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val hx = upper(hex(substring(payload, 1, 26)))
    val ok = length(hx) >= 52 &&
      substring(hx, 1, 8) === "664C6143" && // "fLaC"
      pmod(hxByte(hx, 4), lit(128L)) === 0L && // type 0 (flag masked)
      substring(hx, 11, 6) === "000022" // STREAMINFO length 34
    val b20 = hxByte(hx, 20)
    val b21 = hxByte(hx, 21)
    struct(
      when(ok,
        hxByte(hx, 18) * 4096L + hxByte(hx, 19) * 16L +
          (b20 / lit(16.0)).cast("long")).as("sample_rate"),
      when(ok, pmod((b20 / lit(2.0)).cast("long"), lit(8L)) + 1L)
        .as("channels"),
      when(ok,
        pmod(b20, lit(2L)) * 16L + (b21 / lit(16.0)).cast("long") + 1L)
        .as("bits_per_sample"),
      when(ok,
        pmod(b21, lit(16L)) * 4294967296L + hxByte(hx, 22) * 16777216L +
          hxByte(hx, 23) * 65536L + hxByte(hx, 24) * 256L + hxByte(hx, 25))
        .as("total_samples"))
  }

  /** BMP (BITMAPINFOHEADER) metadata as a struct (width, height,
    * top_down, bpp) — fixed offsets after the 14-byte file header:
    * DIB size at 14 (must be 40), width LE32 at 18, height LE32 at 22
    * **signed** (a negative height means a top-down row order — the
    * parser must two's-complement it back and surface the flag, not
    * report a 4-billion-pixel image), planes LE16 at 26 (must be 1),
    * bpp LE16 at 28. Null fields for non-BMP payloads. */
  def bmpMeta(payload: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val hx = upper(hex(substring(payload, 1, 30)))
    def le16at(i: Int) = hxByte(hx, i) + hxByte(hx, i + 1) * 256L
    def le32at(i: Int) =
      hxByte(hx, i) + hxByte(hx, i + 1) * 256L +
        hxByte(hx, i + 2) * 65536L + hxByte(hx, i + 3) * 16777216L
    val ok = length(hx) >= 60 &&
      substring(hx, 1, 4) === "424D" &&
      le32at(14) === 40L && // BITMAPINFOHEADER only
      le16at(26) === 1L // planes
    val hraw = le32at(22)
    val topDown = hraw >= 2147483648L
    struct(
      when(ok, le32at(18)).as("width"),
      when(ok, when(topDown, lit(4294967296L) - hraw).otherwise(hraw))
        .as("height"),
      when(ok, topDown).as("top_down"),
      when(ok, le16at(28)).as("bpp"))
  }

  /** ICO/CUR directory metadata as a struct (ico_kind, n_images,
    * first_width, first_height, first_bpp). The 6-byte header is
    * reserved(2)=0, type(2)=1 icon / 2 cursor, count(2); the first
    * 16-byte entry follows. Width/height are single bytes where **0
    * means 256** (the format's one famous quirk — load-bearing), bpp is
    * LE16 at entry offset 6. Null fields for non-ICO payloads. */
  def icoMeta(payload: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val hx = upper(hex(substring(payload, 1, 22)))
    def le16at(i: Int) = hxByte(hx, i) + hxByte(hx, i + 1) * 256L
    val tpe = le16at(2)
    val ok = length(hx) >= 44 &&
      substring(hx, 1, 4) === "0000" &&
      (tpe === 1L || tpe === 2L) &&
      le16at(4) >= 1L
    def dim(i: Int) = {
      val b = hxByte(hx, i)
      when(b === 0L, 256L).otherwise(b)
    }
    struct(
      when(ok, when(tpe === 1L, "icon").otherwise("cursor"))
        .as("ico_kind"),
      when(ok, le16at(4)).as("n_images"),
      when(ok, dim(6)).as("first_width"),
      when(ok, dim(7)).as("first_height"),
      when(ok, le16at(12)).as("first_bpp"))
  }

  /** GZIP member metadata as a struct (method, mtime, os, isize) —
    * crawls gzip everything, and the uncompressed size lives at the
    * WRONG END: the header carries method (must be 8 = deflate —
    * validation), the Unix mtime LE32 at 4, and the OS byte at 9,
    * while ISIZE (uncompressed length mod 2^32) is the LAST four bytes
    * of the member — a tail read, the PDF/ZIP discipline, reachable
    * whatever the compressed payload length. Null fields for non-gzip
    * payloads. */
  def gzipMeta(payload: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val hx = upper(hex(substring(payload, 1, 10)))
    def b(i: Int) = hxByte(hx, i)
    val n = octet_length(payload)
    val ok = length(hx) >= 20 && n >= 18 &&
      substring(hx, 1, 4) === "1F8B" && b(2) === 8L
    val tail = upper(hex(substring(payload, n - 3, lit(4))))
    def tb(i: Int) = hxByte(tail, i)
    struct(
      when(ok, lit("deflate")).as("method"),
      when(ok, b(4) + b(5) * 256L + b(6) * 65536L + b(7) * 16777216L)
        .as("mtime"),
      when(ok, b(9)).as("os"),
      when(ok, tb(0) + tb(1) * 256L + tb(2) * 65536L +
        tb(3) * 16777216L).as("isize"))
  }

  /** Deterministic planted GZIP / raw payloads (the m15 fixture): by
    * `id % 2`, a gzip member whose mtime / OS byte / ISIZE vary with
    * the id and whose fake compressed body VARIES IN LENGTH
    * (`id % 23` filler bytes — the tail read must find ISIZE wherever
    * the member ends), or the raw text bytes. */
  def plantedGzip(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val id = col(idCol)
    def byteAt(c: org.apache.spark.sql.Column, shift: Long) =
      pmod((c / lit(shift.toDouble)).cast("long"), lit(256L))
    def le32(c: org.apache.spark.sql.Column) =
      format_string("%02X%02X%02X%02X", byteAt(c, 1L), byteAt(c, 256L),
        byteAt(c, 65536L), byteAt(c, 16777216L))
    val mtime = (id * 7L + 1600000000L).cast("long")
    val os = pmod(id, lit(14L))
    val isize = (id % 1000000 + 1L).cast("long")
    val gzHex = concat(
      lit("1F8B"), lit("08"), lit("00"), le32(mtime), lit("00"),
      format_string("%02X", os),
      expr(s"repeat('00', $idCol % 23 + 1)"), // fake deflate body
      le32((id * 31L).cast("long") % 4294967296L), // CRC32 (unchecked)
      le32(isize))
    df.select(
      id.as("media_id"),
      unhex(
        when(id % 2 === 0, gzHex)
          .otherwise(hex(col(textCol).cast("binary")))).as("payload"))
  }

  /** Zstandard frame metadata as a struct (kind, single_segment,
    * has_checksum, dict_id, window_size, content_size, skip_size,
    * well_formed) — RFC 8878, the compression a modern lake actually
    * stores. The frame-header descriptor byte GOVERNS the whole
    * layout: Single_Segment decides whether a Window_Descriptor
    * exists, Dictionary_ID_flag picks a 0/1/2/4-byte field, and
    * Frame_Content_Size sits at the resulting DATA-DEPENDENT offset
    * with a size picked by FCS_flag — including the spec's +256 bias
    * on the 2-byte form (the classic implementation gotcha). The
    * RESERVED bit must be zero: a set bit keeps the zstd mime
    * (sniffing and structural validation are different layers, the
    * m13 discipline) but flags well_formed=false with null fields.
    * Skippable frames (0x184D2A50..5F) report their declared size.
    * Window size decodes as 2^(exp+10) + (2^(exp+10)/8)·mantissa —
    * exact integer arithmetic. All dynamic offsets are column
    * arithmetic over one short hex prefix; per-row, zero shuffle. */
  def zstdMeta(payload: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val hx = upper(hex(substring(payload, 1, 18)))
    def b(i: Int) = hxByte(hx, i)
    def dynB(pos: org.apache.spark.sql.Column) =
      conv(hx.substr(pos.cast("int") * 2 + 1, lit(2)), 16, 10)
        .cast("long")
    def dynLe(pos: org.apache.spark.sql.Column, n: Int) =
      (0 until n).map(j => dynB(pos + j) * lit(1L << (8 * j)))
        .reduce(_ + _)
    val isFrame = substring(hx, 1, 8) === "28B52FFD"
    val isSkip = substring(hx, 3, 6) === "2A4D18" &&
      substring(hx, 1, 1) === "5"
    val fhd = b(4)
    val fcsFlag = shiftright(fhd, 6)
    val single = pmod(shiftright(fhd, 5), lit(2L))
    val reserved = pmod(shiftright(fhd, 3), lit(2L))
    val checksum = pmod(shiftright(fhd, 2), lit(2L))
    val dictFlag = pmod(fhd, lit(4L))
    val ok = isFrame && reserved === 0L
    val dictPos = lit(6L) - single
    val dictLen = when(dictFlag === 0L, 0L).when(dictFlag === 1L, 1L)
      .when(dictFlag === 2L, 2L).otherwise(4L)
    val fcsPos = dictPos + dictLen
    val wd = b(5)
    val wPow = pow(lit(2.0), (shiftright(wd, 3) + 10L).cast("double"))
      .cast("long")
    val windowSize = wPow + (wPow / lit(8.0)).cast("long") *
      pmod(wd, lit(8L))
    val dictId = when(dictFlag === 1L, dynB(dictPos))
      .when(dictFlag === 2L, dynLe(dictPos, 2))
      .when(dictFlag === 3L, dynLe(dictPos, 4))
    // 8-byte FCS: a top byte >= 0x80 declares a content size above
    // Long.MaxValue — unrepresentable, and under ANSI mode the LE
    // reassembly would THROW ArithmeticException on such a (hostile /
    // corrupt) payload. Guard before summing: unrepresentable -> null
    // content_size, frame classification and the other fields stand.
    val contentSize =
      when(fcsFlag === 0L && single === 1L, dynB(fcsPos))
        .when(fcsFlag === 1L, dynLe(fcsPos, 2) + 256L)
        .when(fcsFlag === 2L, dynLe(fcsPos, 4))
        .when(fcsFlag === 3L && dynB(fcsPos + 7) < 128L,
          dynLe(fcsPos, 8))
    val skipSize = b(4) + b(5) * 256L + b(6) * 65536L +
      b(7) * 16777216L
    struct(
      when(isFrame, "frame").when(isSkip, "skippable").as("kind"),
      when(ok, single === 1L).as("single_segment"),
      when(ok, checksum === 1L).as("has_checksum"),
      when(ok, dictId).as("dict_id"),
      when(ok && single === 0L, windowSize).as("window_size"),
      when(ok, contentSize).as("content_size"),
      when(isSkip, skipSize).as("skip_size"),
      when(isFrame, reserved === 0L)
        .when(isSkip, lit(true)).as("well_formed"))
  }

  /** Deterministic planted zstd / skippable / raw payloads (the m18
    * fixture): by `id % 3`, a zstd frame whose descriptor varies the
    * WHOLE layout with the id (single-segment alternates, dictionary
    * id absent/1-byte/2-byte, content size via the 1-byte, biased
    * 2-byte, and 4-byte FCS forms, variable fake body), a skippable
    * frame with an id-varied magic nibble and declared size, or the
    * raw text bytes. Every fifth frame sets the RESERVED bit —
    * spec-malformed on purpose. */
  def plantedZstd(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val id = col(idCol)
    def byteAt(c: org.apache.spark.sql.Column, shift: Long) =
      pmod((c / lit(shift.toDouble)).cast("long"), lit(256L))
    def le(c: org.apache.spark.sql.Column, n: Int) =
      concat((0 until n).map(j =>
        format_string("%02X", byteAt(c, 1L << (8 * j)))): _*)
    val g = expr(s"$idCol div 3")
    val k = pmod(id, lit(3L))
    val mal = pmod(id, lit(5L)) === 0L
    val single = pmod(g, lit(2L))
    val checksum = pmod(id, lit(2L))
    val dictFlag = when(single === 1L, 0L).otherwise(pmod(g, lit(3L)))
    val fcsFlag =
      when(single === 1L, 0L).otherwise(lit(1L) + pmod(g, lit(2L)))
    val wd = pmod(id, lit(64L))
    val dictId = when(dictFlag === 1L, pmod(id, lit(200L)) + 1L)
      .when(dictFlag === 2L, pmod(id, lit(60000L)) + 300L)
    val cs = when(single === 1L, pmod(id, lit(200L)))
      .when(fcsFlag === 1L, pmod(id, lit(60000L)) + 256L)
      .otherwise(pmod(id, lit(100000L)) + 5000L)
    val fhd = fcsFlag * 64L + single * 32L +
      when(mal, 8L).otherwise(0L) + checksum * 4L + dictFlag
    val frameHex = concat(
      lit("28B52FFD"),
      format_string("%02X", fhd),
      when(single === 1L, lit("")).otherwise(format_string("%02X", wd)),
      when(dictFlag === 1L, le(dictId, 1))
        .when(dictFlag === 2L, le(dictId, 2)).otherwise(lit("")),
      when(single === 1L, le(cs, 1))
        .when(fcsFlag === 1L, le(cs - 256L, 2)).otherwise(le(cs, 4)),
      expr(s"repeat('00', $idCol % 7 + 1)"))
    val skipHex = concat(
      format_string("%02X", lit(80L) + pmod(id, lit(16L))),
      lit("2A4D18"),
      le(pmod(id, lit(100000L)), 4),
      expr(s"repeat('00', $idCol % 5)"))
    df.select(
      id.as("media_id"),
      unhex(
        when(k === 0L, frameHex)
          .when(k === 1L, skipHex)
          .otherwise(hex(col(textCol).cast("binary")))).as("payload"))
  }

  /** WARC record metadata as a struct (warc_version, warc_type,
    * target_uri, content_length, well_formed) — the web-archive format
    * crawl corpora actually arrive in (Common Crawl ships WARC;
    * training-data ingestion starts by splitting and auditing these
    * records). The header block is CRLF-terminated text ending at the
    * first blank line; named fields are extracted from it, and
    * `Content-Length` governs the payload span, so `well_formed`
    * re-derives the record's total byte length (header + declared
    * content + the closing CRLF CRLF) and compares it to the actual
    * payload — a LYING length (the truncation crawlers actually
    * produce) parses but flags false, the PDF-startxref discipline.
    * Null fields for non-WARC payloads. */
  def warcMeta(payload: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val head = substring(payload, 1, 512).cast("string")
    val version = regexp_extract(head, "^WARC/(1\\.[01])\r\n", 1)
    val hdrEnd = instr(head, "\r\n\r\n")
    val ok = version =!= "" && hdrEnd > 0
    def field(name: String) = {
      val v = regexp_extract(head, s"\r\n$name: ([^\r]+)\r\n", 1)
      when(v =!= "", v)
    }
    val clenS = regexp_extract(head, "\r\nContent-Length: (\\d+)\r\n", 1)
    val clen = when(clenS =!= "", clenS).cast("long")
    struct(
      when(ok, version).as("warc_version"),
      when(ok, field("WARC-Type")).as("warc_type"),
      when(ok, field("WARC-Target-URI")).as("target_uri"),
      when(ok, clen).as("content_length"),
      when(ok && clen.isNotNull,
        octet_length(payload) === hdrEnd + 3L + clen + 4L)
        .as("well_formed"))
  }

  /** Deterministic planted WARC / raw payloads (the m16 fixture): by
    * `id % 3`, a well-formed response record (declared Content-Length
    * equals the body), a request record whose declared length LIES by
    * 7 bytes (well_formed must flag false while the headers still
    * parse), or the raw text bytes. Body length varies with the id so
    * no fixed offset can find the record tail. */
  def plantedWarc(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val id = col(idCol)
    val bodyLen = pmod(id, lit(50L)) + lit(10L)
    val declared =
      when(pmod(id, lit(3)) === 1, bodyLen + 7L).otherwise(bodyLen)
    val wtype =
      when(pmod(id, lit(3)) === 1, lit("request")).otherwise(lit("response"))
    val rec = concat(
      lit("WARC/1.0\r\n"),
      lit("WARC-Type: "), wtype, lit("\r\n"),
      lit("WARC-Record-ID: <urn:uuid:"), id.cast("string"), lit(">\r\n"),
      lit("WARC-Target-URI: http://ex.com/p/"), id.cast("string"),
      lit("\r\n"),
      lit("Content-Length: "), declared.cast("string"), lit("\r\n"),
      lit("\r\n"),
      repeat(lit("A"), bodyLen.cast("int")),
      lit("\r\n\r\n"))
    df.select(
      id.as("media_id"),
      when(pmod(id, lit(3)) <= 1, rec.cast("binary"))
        .otherwise(col(textCol).cast("binary")).as("payload"))
  }

  /** Executable metadata as a struct (exe_format, bits, machine) — the
    * binary-junk detector a web-corpus cleaning pipeline needs (crawls
    * carry executables that must leave the text corpus, and WHAT they
    * are belongs in the audit):
    *
    *  - ELF: `7F 45 4C 46`, then EI_CLASS at 4 (1 = 32-bit, 2 = 64),
    *    EI_DATA at 5 (must be 1 or 2 — validation), e_machine LE16 at
    *    18 for little-endian files / BE16 for big (the endian byte
    *    GOVERNS the field decode — load-bearing, like TIFF's II/MM).
    *  - PE: 'MZ', then e_lfanew LE32 at 60 points at the 'PE\0\0'
    *    signature — PROBED, a lying offset fails (the PDF startxref
    *    discipline) — with Machine LE16 right after (0x14C = x86 -> 32
    *    bit, 0x8664 = x64).
    *
    * Machine ids surface numerically; null fields otherwise. */
  def exeMeta(payload: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val hx = upper(hex(substring(payload, 1, 24)))
    def b(i: Int) = hxByte(hx, i)
    val isElf = length(hx) >= 40 && substring(hx, 1, 8) === "7F454C46" &&
      (b(4) === 1L || b(4) === 2L) && (b(5) === 1L || b(5) === 2L)
    val elfMachine = when(b(5) === 1L, b(18) + b(19) * 256L)
      .otherwise(b(18) * 256L + b(19))
    val isMz = length(hx) >= 8 && substring(hx, 1, 4) === "4D5A"
    val lfanew = hxByte(upper(hex(substring(payload, 61, 4))), 0) +
      hxByte(upper(hex(substring(payload, 61, 4))), 1) * 256L +
      hxByte(upper(hex(substring(payload, 61, 4))), 2) * 65536L +
      hxByte(upper(hex(substring(payload, 61, 4))), 3) * 16777216L
    val peHdr = upper(hex(
      substring(payload, (lfanew + 1L).cast("int"), lit(6))))
    val isPe = isMz && length(peHdr) >= 12 &&
      substring(peHdr, 1, 8) === "50450000"
    val peMachine = hxByte(peHdr, 4) + hxByte(peHdr, 5) * 256L
    struct(
      when(isElf, "elf").when(isPe, "pe").as("exe_format"),
      when(isElf, b(4) * 32L)
        .when(isPe, when(peMachine === 0x8664L, 64L).otherwise(32L))
        .as("bits"),
      when(isElf, elfMachine).when(isPe, peMachine).as("machine"))
  }

  /** Deterministic planted ELF / PE / raw payloads (the m14 fixture):
    * by `id % 3`, an ELF header whose class, ENDIANNESS, and machine
    * id vary (big-endian rows byte-swap e_machine — decoding through
    * the EI_DATA byte is load-bearing), a PE stub whose e_lfanew
    * varies with the id (the DOS stub length shifts the PE signature —
    * a fixed offset reads the stub), or the raw text bytes. */
  def plantedExe(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val id = col(idCol)
    def b1(c: org.apache.spark.sql.Column) = format_string("%02X", c)
    def le16(c: org.apache.spark.sql.Column) =
      format_string("%02X%02X", pmod(c, lit(256L)),
        pmod((c / lit(256.0)).cast("long"), lit(256L)))
    def be16(c: org.apache.spark.sql.Column) =
      format_string("%02X%02X",
        pmod((c / lit(256.0)).cast("long"), lit(256L)),
        pmod(c, lit(256L)))
    val cls = (id % 2 + 1).cast("long") // 1 = 32-bit, 2 = 64
    val endian = (expr(s"$idCol div 2") % 2 + 1).cast("long")
    val mach = (id % 300 + 2).cast("long")
    val elfHex = concat(
      lit("7F454C46"), b1(cls), b1(endian), lit("01"), lit("0" * 18),
      // e_type(2) e_machine(2): both endian-governed
      when(endian === 1L, concat(lit("0200"), le16(mach)))
        .otherwise(concat(lit("0002"), be16(mach))),
      lit("0" * 16))
    val stub = (id % 40 + 64).cast("long") // e_lfanew: stub shifts it
    val peMach = when(id % 4 === 0, 0x8664L).otherwise(0x14CL)
    val peHex = concat(
      lit("4D5A"), lit("0" * 116), // DOS header through offset 59
      format_string("%02X%02X%02X%02X", pmod(stub, lit(256L)),
        pmod((stub / lit(256.0)).cast("long"), lit(256L)),
        lit(0L), lit(0L)),
      expr(s"repeat('00', $idCol % 40)"), // the variable DOS stub
      lit("50450000"), le16(peMach), lit("0" * 8))
    df.select(
      id.as("media_id"),
      unhex(
        when(id % 3 === 0, elfHex)
          .when(id % 3 === 1, peHex)
          .otherwise(hex(col(textCol).cast("binary")))).as("payload"))
  }

  /** WOFF web-font metadata as a struct (flavor, n_tables, sfnt_size,
    * version) — a BIG-endian container (the m-series parses LE RIFF
    * and BMP, BE TIFF-MM and this; byte order per format is the
    * discipline): 'wOFF' magic, then the wrapped sfnt FLAVOR at 4
    * ('OTTO' = CFF outlines, 0x00010000 = TrueType — the dispatch a
    * font loader keys on), table count BE16 at 12 (reserved at 14 must
    * be 0 per spec — load-bearing), uncompressed size BE32 at 16, and
    * the woff major.minor at 20/22. Null fields otherwise. */
  def woffMeta(payload: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val hx = upper(hex(substring(payload, 1, 24)))
    def be16at(i: Int) = hxByte(hx, i) * 256L + hxByte(hx, i + 1)
    def be32at(i: Int) =
      hxByte(hx, i) * 16777216L + hxByte(hx, i + 1) * 65536L +
        hxByte(hx, i + 2) * 256L + hxByte(hx, i + 3)
    val flavorHex = substring(hx, 9, 8)
    val ok = length(hx) >= 48 &&
      substring(hx, 1, 8) === "774F4646" &&
      be16at(14) === 0L && // reserved
      (flavorHex === "4F54544F" || flavorHex === "00010000")
    struct(
      when(ok, when(flavorHex === "4F54544F", "cff")
        .otherwise("truetype")).as("flavor"),
      when(ok, be16at(12)).as("n_tables"),
      when(ok, be32at(16)).as("sfnt_size"),
      when(ok, concat(be16at(20).cast("string"), lit("."),
        be16at(22).cast("string"))).as("version"))
  }

  /** Deterministic planted WOFF / raw payloads (the m13 fixture): by
    * `id % 3`, a TrueType- or CFF-flavored WOFF header with id-varying
    * table counts / sfnt sizes / versions (flavor flips with
    * `id div 3`, so both dispatch arms are exercised), a wOFF magic
    * with a NONZERO reserved field (spec-malformed — the reserved
    * check is load-bearing), or the raw text bytes. */
  def plantedWoff(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val id = col(idCol)
    def be16(c: org.apache.spark.sql.Column) =
      format_string("%02X%02X",
        pmod((c / lit(256.0)).cast("long"), lit(256L)),
        pmod(c, lit(256L)))
    def be32(c: org.apache.spark.sql.Column) =
      format_string("%02X%02X%02X%02X",
        pmod((c / lit(16777216.0)).cast("long"), lit(256L)),
        pmod((c / lit(65536.0)).cast("long"), lit(256L)),
        pmod((c / lit(256.0)).cast("long"), lit(256L)),
        pmod(c, lit(256L)))
    val flavor = when(expr(s"$idCol div 3") % 2 === 0,
      "00010000").otherwise("4F54544F")
    val nt = (id % 20 + 4).cast("long")
    val sf = (id % 100000 + 1000).cast("long")
    val maj = (id % 3).cast("long")
    val minv = (id % 10).cast("long")
    def header(reserved: org.apache.spark.sql.Column) = concat(
      lit("774F4646"), flavor, be32(sf + 44L), be16(nt),
      be16(reserved), be32(sf), be16(maj), be16(minv))
    df.select(
      id.as("media_id"),
      unhex(
        when(id % 3 === 0, header(lit(0L)))
          .when(id % 3 === 1, header(lit(7L))) // reserved != 0: reject
          .otherwise(hex(col(textCol).cast("binary")))).as("payload"))
  }

  /** AVI main-header metadata as a struct (width, height,
    * total_frames, duration_ms) — the THIRD RIFF form this library
    * demuxes (WAVE chunks walk, WEBP first-chunk dispatch, and now
    * "AVI "): the spec pins `LIST hdrl` as the first chunk and `avih`
    * as its first child, so the 56-byte MainAVIHeader sits at byte 32
    * — dwMicroSecPerFrame at +0, dwTotalFrames at +16, dwWidth/+32,
    * dwHeight/+36, all LE32. The form type AND the avih fourcc are
    * checked (a WAVE or WEBP payload must null out, not misparse).
    * duration_ms = frames · µs/frame / 1000 in integer arithmetic. */
  def aviMeta(payload: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val hx = upper(hex(substring(payload, 1, 72)))
    def le32at(i: Int) =
      hxByte(hx, i) + hxByte(hx, i + 1) * 256L +
        hxByte(hx, i + 2) * 65536L + hxByte(hx, i + 3) * 16777216L
    val ok = length(hx) >= 144 &&
      substring(hx, 1, 8) === "52494646" && // RIFF
      substring(hx, 17, 8) === "41564920" && // "AVI "
      substring(hx, 25, 8) === "4C495354" && // LIST
      substring(hx, 41, 8) === "6864726C" && // hdrl
      substring(hx, 49, 8) === "61766968" // avih
    val uspf = le32at(32)
    val frames = le32at(48)
    struct(
      when(ok, le32at(64)).as("width"),
      when(ok, le32at(68)).as("height"),
      when(ok, frames).as("total_frames"),
      when(ok, floor(frames * uspf / lit(1000.0)).cast("long"))
        .as("duration_ms"))
  }

  /** Deterministic planted AVI / raw payloads (the m12 fixture): by
    * `id % 3`, a minimal RIFF/"AVI " container with `LIST hdrl` +
    * `avih` and id-varying dims/frame counts/frame durations, a WAVE
    * payload (same RIFF magic, different form — the disambiguation is
    * load-bearing: aviMeta must null out, the sniffer must say wav),
    * or the raw text bytes. */
  def plantedAvi(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val id = col(idCol)
    def byteAt(c: org.apache.spark.sql.Column, shift: Long) =
      pmod((c / lit(shift.toDouble)).cast("long"), lit(256L))
    def le32(c: org.apache.spark.sql.Column) =
      format_string("%02X%02X%02X%02X", byteAt(c, 1L), byteAt(c, 256L),
        byteAt(c, 65536L), byteAt(c, 16777216L))
    val w = (id % 1920 + 2).cast("long")
    val h = (id % 1080 + 2).cast("long")
    val frames = (id % 9000 + 24).cast("long")
    val uspf = when(id % 3 === 0, 33333L).otherwise(41666L) // ~30/24fps
    // RIFF size: AVI (4) + LIST hdr (8) + hdrl (4) + avih hdr (8) +
    // avih body (56) = 80; LIST size: hdrl + avih hdr + body = 68
    val aviHex = concat(
      lit("52494646"), le32(lit(80L)), lit("41564920"),
      lit("4C495354"), le32(lit(68L)), lit("6864726C"),
      lit("61766968"), le32(lit(56L)),
      le32(uspf), le32(lit(0L)), le32(lit(0L)), le32(lit(16L)),
      le32(frames), le32(lit(0L)), le32(lit(1L)), le32(lit(0L)),
      le32(w), le32(h), lit("0" * 32)) // dwReserved[4]
    val wavHex = concat(
      lit("52494646"), le32(lit(36L)), lit("57415645"),
      lit("666D7420"), le32(lit(16L)), lit("0100010044AC0000"),
      lit("88580100020010006461746100000000"))
    df.select(
      id.as("media_id"),
      unhex(
        when(id % 3 === 0, aviHex)
          .when(id % 3 === 1, wavHex)
          .otherwise(hex(col(textCol).cast("binary")))).as("payload"))
  }

  /** MP3 metadata as a struct (id3_version, tag_size, mpeg_layer,
    * bitrate_kbps, sample_rate). The ID3v2 tag size is SYNCSAFE — four
    * 7-bit bytes (a naive base-256 read is wrong as soon as the tag
    * exceeds 127 bytes; the fixture plants tags past that boundary, so
    * the 7-bit decode is load-bearing) — and the first MPEG audio
    * frame header sits AFTER the tag, at a tag-size-dependent offset
    * (or at byte 0 for a bare stream: both entry layouts parsed).
    * Frame fields decode per the MPEG-1 Layer III tables (bitrate and
    * sample-rate indexes); out-of-contract frames null out. */
  def mp3Meta(payload: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val h = upper(hex(substring(payload, 1, 10)))
    def b(i: Int) = hxByte(h, i)
    val isId3 = length(h) >= 20 && substring(h, 1, 6) === "494433"
    val tagSize =
      b(6) * 2097152L + b(7) * 16384L + b(8) * 128L + b(9)
    val frameOff = when(isId3, tagSize + 10L).otherwise(0L)
    val fh = upper(hex(
      substring(payload, (frameOff + 1L).cast("int"), lit(4))))
    def fb(i: Int) = hxByte(fh, i)
    def shr(c: org.apache.spark.sql.Column, d: Long) =
      (c / lit(d.toDouble)).cast("long")
    val sync = length(fh) >= 8 && fb(0) === 255L &&
      shr(fb(1), 32L) % 8L === 7L
    val okFrame = sync &&
      shr(fb(1), 8L) % 4L === 3L && // MPEG-1
      shr(fb(1), 2L) % 4L === 1L // Layer III
    val brIdx = shr(fb(2), 16L)
    val srIdx = shr(fb(2), 4L) % 4L
    val br = when(brIdx === 1, 32L).when(brIdx === 2, 40L)
      .when(brIdx === 3, 48L).when(brIdx === 4, 56L)
      .when(brIdx === 5, 64L).when(brIdx === 6, 80L)
      .when(brIdx === 7, 96L).when(brIdx === 8, 112L)
      .when(brIdx === 9, 128L).when(brIdx === 10, 160L)
      .when(brIdx === 11, 192L).when(brIdx === 12, 224L)
      .when(brIdx === 13, 256L).when(brIdx === 14, 320L)
    val sr = when(srIdx === 0, 44100L).when(srIdx === 1, 48000L)
      .when(srIdx === 2, 32000L)
    struct(
      when(isId3, concat(lit("2."), b(3).cast("string")))
        .as("id3_version"),
      when(isId3, tagSize).as("tag_size"),
      when(okFrame, lit(3L)).as("mpeg_layer"),
      when(okFrame, br).as("bitrate_kbps"),
      when(okFrame, sr).as("sample_rate"))
  }

  /** Deterministic planted MP3 / raw payloads (the m11 fixture): by
    * `id % 3`, an ID3v2-tagged stream (tag payload of `id % 200 + 100`
    * bytes — crossing the 7-bit boundary, so a base-256 size read
    * lands the frame probe in the padding), a BARE frame stream (no
    * tag — the offset-0 entry layout), or the raw text bytes (null
    * metadata). Frame headers vary bitrate/sample-rate indexes with
    * the id on different residues per layout. */
  def plantedMp3(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val id = col(idCol)
    def b1(c: org.apache.spark.sql.Column) = format_string("%02X", c)
    def frame(brIdx: org.apache.spark.sql.Column,
        srIdx: org.apache.spark.sql.Column) =
      concat(lit("FFFB"), b1(brIdx * 16L + srIdx * 4L), lit("00"))
    val tagLen = (id % 200 + 100).cast("long")
    val taggedHex = concat(
      lit("494433"), b1(lit(3L) + id % 2), lit("00"), lit("00"),
      lit("0000"), b1((tagLen / 128L).cast("long")),
      b1(pmod(tagLen, lit(128L))),
      expr(s"repeat('00', $idCol % 200 + 100)"),
      frame((id % 14 + 1).cast("long"), (id % 3).cast("long")))
    val bareHex = frame((id * 5 % 14 + 1).cast("long"),
      (id * 7 % 3).cast("long"))
    df.select(
      id.as("media_id"),
      unhex(
        when(id % 3 === 0, taggedHex)
          .when(id % 3 === 1, bareHex)
          .otherwise(hex(col(textCol).cast("binary")))).as("payload"))
  }

  /** PDF document metadata as a struct (version, size, startxref,
    * xref_ok). The header pins the version ("%PDF-1.x", byte 7); the
    * TRAILER is found from the END — the last bytes carry
    * `trailer << /Size N >> startxref <offset> %%EOF`, and because
    * arbitrary body content precedes it, any fixed forward offset is
    * wrong (the same backward-scan discipline as ZIP's EOCD). The last
    * 128 bytes are decoded and the `/Size` and `startxref` fields
    * regexp-extracted; `xref_ok` then PROBES the declared offset — the
    * bytes at `startxref` must literally read "xref", a real
    * cross-field consistency check a fake parser would skip. Null
    * fields for non-PDF payloads. */
  def pdfMeta(payload: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val n = octet_length(payload)
    val tail = substring(payload, greatest(n - 127, lit(1)), lit(128))
      .cast("string")
    val ok = substring(payload, 1, 5).cast("string") === "%PDF-" &&
      tail.contains("%%EOF") && tail.contains("startxref")
    val sx = regexp_extract(tail, "startxref\\s+(\\d+)", 1)
    val size = regexp_extract(tail, "/Size\\s+(\\d+)", 1)
    struct(
      when(ok, substring(payload, 6, 3).cast("string")).as("version"),
      when(ok && size =!= "", size.cast("long")).as("size"),
      when(ok && sx =!= "", sx.cast("long")).as("startxref"),
      when(ok && sx =!= "",
        substring(payload, sx.cast("int") + 1, lit(4)).cast("string")
          === "xref").as("xref_ok"))
  }

  /** Deterministic planted PDF / raw payloads (the m10 fixture): by
    * `id % 3`, a minimal PDF whose version, object count, and —
    * crucially — xref OFFSET all vary (a `repeat`-generated filler of
    * `id % 37` bytes sits between header and xref, so startxref is
    * honest and fixed offsets read garbage), or the raw text bytes
    * (null metadata). The trailer's startxref field is computed FROM
    * the constructed prefix length, so the planted document is
    * internally consistent and the parser's xref probe must come back
    * true. */
  def plantedPdf(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val id = col(idCol)
    val ver = when(id % 3 === 0, "4").otherwise("7")
    val size = (id % 40 + 2).cast("long")
    val header = concat(lit("%PDF-1."), ver, lit("\n"))
    val filler = concat(expr(s"repeat('q', $idCol % 37)"), lit("\n"))
    val prefix = concat(header, filler)
    val pdf = concat(
      prefix,
      lit("xref\n0 1\n0000000000 65535 f \n"),
      lit("trailer\n<< /Size "), size.cast("string"),
      lit(" >>\nstartxref\n"), length(prefix).cast("string"),
      lit("\n%%EOF"))
    df.select(
      id.as("media_id"),
      when(id % 3 === 2, col(textCol).cast("binary"))
        .otherwise(pdf.cast("binary")).as("payload"))
  }

  /** Deterministic planted BMP / ICO / raw payloads (the m09 fixture):
    * by `id % 3`, a complete 54-byte BMP header whose height SIGN flips
    * with `id % 2` (top-down negative rows — two's-complement decode is
    * load-bearing), an ICO/CUR directory whose type, image count, and
    * first-entry fields all vary (and whose first dims hit the 0=256
    * byte rule whenever `id % 256 == 0`), or the raw text bytes (null
    * metadata). Hex + unhex construction like every m-fixture; the m09
    * oracle re-derives expectations from the same id arithmetic. */
  def plantedBmpIco(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val id = col(idCol)
    def byteAt(c: org.apache.spark.sql.Column, shift: Long) =
      pmod((c / lit(shift.toDouble)).cast("long"), lit(256L))
    def b1(c: org.apache.spark.sql.Column) = format_string("%02X", c)
    def le16(c: org.apache.spark.sql.Column) =
      format_string("%02X%02X", byteAt(c, 1L), byteAt(c, 256L))
    def le32(c: org.apache.spark.sql.Column) =
      format_string("%02X%02X%02X%02X", byteAt(c, 1L), byteAt(c, 256L),
        byteAt(c, 65536L), byteAt(c, 16777216L))
    val w = (id % 2000 + 1).cast("long")
    val h = (id % 1200 + 1).cast("long")
    val hEnc = when(id % 2 === 1, lit(4294967296L) - h).otherwise(h)
    val bpp = when(id % 5 === 0, 1L).when(id % 5 === 1, 4L)
      .when(id % 5 === 2, 8L).when(id % 5 === 3, 24L).otherwise(32L)
    val bmpHex = concat(
      lit("424D"), le32(lit(54L)), lit("00000000"), le32(lit(54L)),
      le32(lit(40L)), le32(w), le32(hEnc), lit("0100"), le16(bpp),
      lit("0" * 48)) // compression..important: six zero LE32 fields
    val tpe = (expr(s"$idCol div 3") % 2 + 1).cast("long")
    val n = (expr(s"$idCol div 6") % 3 + 1).cast("long")
    val w0 = pmod(id, lit(256L))
    val h0 = pmod(id * 3L, lit(256L))
    val bpp0 = when(expr(s"$idCol div 2") % 3 === 0, 4L)
      .when(expr(s"$idCol div 2") % 3 === 1, 8L).otherwise(32L)
    def entry(wi: org.apache.spark.sql.Column,
        hi: org.apache.spark.sql.Column,
        bi: org.apache.spark.sql.Column,
        i: Int) =
      concat(b1(wi), b1(hi), lit("0000"), lit("0100"), le16(bi),
        le32(lit(256L)), le32(n * 16L + 6L + 256L * i))
    val icoHex = concat(
      lit("0000"), le16(tpe), le16(n),
      entry(w0, h0, bpp0, 0),
      when(n >= 2, entry(pmod(id * 7L + 13L, lit(256L)),
        pmod(id * 5L + 7L, lit(256L)), lit(8L), 1)).otherwise(lit("")),
      when(n >= 3, entry(pmod(id * 11L + 26L, lit(256L)),
        pmod(id * 9L + 3L, lit(256L)), lit(32L), 2)).otherwise(lit("")))
    df.select(
      id.as("media_id"),
      unhex(
        when(id % 3 === 0, bmpHex)
          .when(id % 3 === 1, icoHex)
          .otherwise(hex(col(textCol).cast("binary")))).as("payload"))
  }

  /** Deterministic planted GIF / FLAC / raw payloads (the m04 fixture,
    * sibling of [[plantedMedia]]/[[plantedAudio]]): by `id % 3`, a
    * GIF89a header whose logical-screen dims vary with the id, a FLAC
    * fLaC + STREAMINFO block whose rate / channels / bit depth / total
    * samples all vary (and whose last-metadata-block flag flips with
    * `id % 2`, so the parser's type MASK is load-bearing), or the raw
    * text bytes (null metadata). Construction is hex + unhex; the m04
    * oracle derives expectations from the same id arithmetic. */
  def plantedMisc(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val id = col(idCol)
    def byteAt(c: org.apache.spark.sql.Column, shift: Long) =
      pmod((c / lit(shift.toDouble)).cast("long"), lit(256L))
    def b1(c: org.apache.spark.sql.Column) = format_string("%02X", c)
    def le16(c: org.apache.spark.sql.Column) =
      format_string("%02X%02X", byteAt(c, 1L), byteAt(c, 256L))
    val w = (id % 640 + 1).cast("long")
    val h = (id % 480 + 1).cast("long")
    val gifHex = concat(
      lit("474946383961"), // "GIF89a"
      le16(w), le16(h),
      lit("0000003B")) // flags, bg color, aspect, trailer
    val sr = when(id % 5 === 0, 8000L).when(id % 5 === 1, 16000L)
      .when(id % 5 === 2, 22050L).when(id % 5 === 3, 44100L)
      .otherwise(48000L)
    val ch = (id % 2 + 1).cast("long")
    val bits = when(expr(s"$idCol div 3") % 3 === 0, 8L)
      .when(expr(s"$idCol div 3") % 3 === 1, 16L)
      .otherwise(24L)
    val total = (id % 100000 + 4096).cast("long")
    val flacHex = concat(
      lit("664C6143"), // "fLaC"
      when(id % 2 === 0, "80").otherwise("00"), // last-flag | type 0
      lit("000022"), // STREAMINFO length 34
      lit("0FA00FA0"), // min/max blocksize 4000
      lit("000000"), lit("000000"), // min/max framesize (unset)
      b1(byteAt(sr, 4096L)), // sr bits 19-12
      b1(byteAt(sr, 16L)), // sr bits 11-4
      b1(pmod(sr, lit(16L)) * 16L + (ch - 1L) * 2L +
        ((bits - 1L) / lit(16.0)).cast("long")),
      b1(pmod(bits - 1L, lit(16L)) * 16L +
        (total / lit(4294967296.0)).cast("long")),
      b1(byteAt(total, 16777216L)), b1(byteAt(total, 65536L)),
      b1(byteAt(total, 256L)), b1(byteAt(total, 1L)),
      lit("0" * 32)) // MD5 signature (unset)
    df.select(
      id.as("media_id"),
      unhex(
        when(id % 3 === 0, gifHex)
          .when(id % 3 === 1, flacHex)
          .otherwise(hex(col(textCol).cast("binary")))).as("payload"))
  }

  /** WebP metadata as a struct (webp_kind, width, height) — all three
    * first-chunk layouts of the RIFF/WEBP container
    * (developers.google.com/speed/webp/docs/riff_container):
    *
    *  - `VP8 ` (lossy): the key-frame start code 9D 01 2A at payload
    *    bytes 3-5 is REQUIRED (load-bearing check), then 14-bit
    *    little-endian width and height (the top 2 bits of each 16-bit
    *    field are the scaling hint — masked off, not part of the dims).
    *  - `VP8L` (lossless): the 2F signature byte, then one LE32 whose
    *    bits 0-13 are width-1 and 14-27 height-1.
    *  - `VP8X` (extended): 4 flag/reserved bytes, then 24-bit LE
    *    canvas width-1 and height-1.
    *
    * The chunk fourcc at the spec-pinned offset 12 dispatches the
    * three layouts (VP8X is mandatory-first when present; simple lossy/
    * lossless files open with their bitstream chunk), so the whole
    * parse is fixed-offset arithmetic over ONE 30-byte hex prefix —
    * codegen'd builtins, the m04 discipline, no walker needed. Null
    * fields for non-WebP or sync-code-less payloads. */
  def webpMeta(payload: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val hx = upper(hex(substring(payload, 1, 30)))
    val riff =
      substring(hx, 1, 8) === "52494646" &&
      substring(hx, 17, 8) === "57454250" // "WEBP"
    val fourcc = substring(hx, 25, 8)
    def le16(i: Int) = hxByte(hx, i) + hxByte(hx, i + 1) * 256L
    def le24(i: Int) = hxByte(hx, i) + hxByte(hx, i + 1) * 256L +
      hxByte(hx, i + 2) * 65536L
    // each layout's length bound covers exactly the bytes it reads (a
    // minimal VP8L file is 25 bytes — shorter than the other two)
    val lossy = riff && length(hx) >= 60 && fourcc === "56503820" &&
      substring(hx, 47, 6) === "9D012A" // key-frame start code
    val lossless = riff && length(hx) >= 50 && fourcc === "5650384C" &&
      substring(hx, 41, 2) === "2F" // VP8L signature byte
    val extended = riff && length(hx) >= 60 && fourcc === "56503858"
    val l32 = le16(21) + le16(23) * 65536L // VP8L packed dims
    struct(
      when(lossy, "lossy").when(lossless, "lossless")
        .when(extended, "extended").as("webp_kind"),
      when(lossy, pmod(le16(26), lit(16384L)))
        .when(lossless, pmod(l32, lit(16384L)) + 1L)
        .when(extended, le24(24) + 1L).as("width"),
      when(lossy, pmod(le16(28), lit(16384L)))
        .when(lossless, pmod(shiftright(l32, 14), lit(16384L)) + 1L)
        .when(extended, le24(27) + 1L).as("height"))
  }

  /** Deterministic planted WebP payloads (the m07 fixture, sibling of
    * [[plantedMisc]]): by `id % 4`, a lossy `VP8 ` file (dims under the
    * 14-bit mask, key-frame start code planted — and the two scaling-
    * hint bits set when `id % 8 = 0`, so the parser's 14-bit MASK is
    * load-bearing), a lossless `VP8L` file (dims packed minus-one into
    * the LE32), an extended `VP8X` file (24-bit canvas dims minus-one),
    * or the raw text bytes (null metadata). RIFF/chunk sizes are
    * consistent with the constructed payloads. */
  def plantedWebp(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val id = col(idCol)
    def byteAt(c: org.apache.spark.sql.Column, shift: Long) =
      pmod((c / lit(shift.toDouble)).cast("long"), lit(256L))
    def le16(c: org.apache.spark.sql.Column) =
      format_string("%02X%02X", byteAt(c, 1L), byteAt(c, 256L))
    def le24(c: org.apache.spark.sql.Column) =
      format_string("%02X%02X%02X",
        byteAt(c, 1L), byteAt(c, 256L), byteAt(c, 65536L))
    def le32(c: org.apache.spark.sql.Column) =
      format_string("%02X%02X%02X%02X", byteAt(c, 1L), byteAt(c, 256L),
        byteAt(c, 65536L), byteAt(c, 16777216L))
    val w0 = (id % 3000 + 16).cast("long")
    val h0 = (id % 2000 + 16).cast("long")
    // scaling-hint bits (15-14) set for half the lossy rows (id%8):
    // the parser's 14-bit mask is load-bearing, not decorative
    val hint = when(id % 8 === 0, lit(49152L)).otherwise(lit(0L))
    val lossyHex = concat(
      lit("52494646"), lit("16000000"), lit("57454250"), // RIFF 22 WEBP
      lit("56503820"), lit("0A000000"), // "VP8 " size 10
      lit("000000"), lit("9D012A"), // frame tag + start code
      le16(w0 + hint), le16(h0 + hint))
    val w1 = (id % 4000 + 16).cast("long")
    val h1 = (id % 3000 + 16).cast("long")
    val losslessHex = concat(
      lit("52494646"), lit("11000000"), lit("57454250"), // RIFF 17 WEBP
      lit("5650384C"), lit("05000000"), lit("2F"), // "VP8L" size 5, sig
      le32(w1 - 1L + (h1 - 1L) * 16384L))
    val w2 = (id % 50000 + 16).cast("long")
    val h2 = (id % 40000 + 16).cast("long")
    val extendedHex = concat(
      lit("52494646"), lit("16000000"), lit("57454250"), // RIFF 22 WEBP
      lit("56503858"), lit("0A000000"), // "VP8X" size 10
      lit("2A000000"), // feature flags + reserved
      le24(w2 - 1L), le24(h2 - 1L))
    df.select(
      id.as("media_id"),
      unhex(
        when(id % 4 === 0, lossyHex)
          .when(id % 4 === 1, losslessHex)
          .when(id % 4 === 2, extendedHex)
          .otherwise(hex(col(textCol).cast("binary")))).as("payload"))
  }

  /** TIFF baseline metadata as a struct (byte_order, width, height,
    * orientation) — a real IFD walk, BOTH byte orders: the header picks
    * II/MM (every later read is endian-aware), bytes 4-7 locate IFD0
    * (padding before it floats, so the offset read is load-bearing),
    * and each of up to `maxEntries` 12-byte entries is matched against
    * the target tags WITHIN the declared entry count. SHORT (3) and
    * LONG (4) value encodings both decode (left-justified in the
    * 4-byte value field per the spec); unreadable types leave the
    * search open for a later same-tag entry. Missing tags and non-TIFF
    * payloads yield null fields; hostile offsets/sizes are bounds-
    * checked, never trusted. ONE native codegen'd pass over the byte
    * prefix (TiffPackExpr — the builtin conv/substr formulation
    * re-materialized the hex projection per byte read and measured
    * 105 s/5k rows; the kernel is the WAV/MP4 discipline). */
  def tiffMeta(payload: org.apache.spark.sql.Column, maxScan: Int = 256,
      maxEntries: Int = 8): org.apache.spark.sql.Column = {
    val packed = org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.TiffPackExpr(
        org.apache.spark.sql.GraftSqlBridge.expression(payload),
        maxScan, maxEntries))
    val w = packed.bitwiseAND(lit(0xFFFFFFL))
    val h = shiftright(packed, 24).bitwiseAND(lit(0xFFFFFFL))
    val o = shiftright(packed, 48).bitwiseAND(lit(0x1FL))
    val mm = shiftright(packed, 53).bitwiseAND(lit(1L))
    struct(
      when(packed >= 0L, when(mm === 1L, "MM").otherwise("II"))
        .as("byte_order"),
      when(packed >= 0L && w =!= graft.functions.TiffMetaUtil.MissingDim,
        w).as("width"),
      when(packed >= 0L && h =!= graft.functions.TiffMetaUtil.MissingDim,
        h).as("height"),
      when(packed >= 0L && o =!= graft.functions.TiffMetaUtil.MissingOri,
        o).as("orientation"))
  }

  /** Deterministic planted TIFF payloads (the m06 fixture): by `id % 3`
    * a little-endian TIFF, a big-endian TIFF, or the raw text bytes.
    * The IFD floats behind `id % 5` padding bytes (the offset read is
    * load-bearing), a leading NewSubfileType entry keeps the target
    * tags out of slot 0, width/height are LONG entries, orientation a
    * SHORT entry present only for even ids (the declared entry count is
    * load-bearing), all varying with the id so the m06 oracle derives
    * expectations from the same arithmetic. */
  def plantedTiff(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val id = col(idCol)
    def byteAt(c: org.apache.spark.sql.Column, shift: Long) =
      pmod((c / lit(shift.toDouble)).cast("long"), lit(256L))
    def le16(c: org.apache.spark.sql.Column) =
      format_string("%02X%02X", byteAt(c, 1L), byteAt(c, 256L))
    def be16(c: org.apache.spark.sql.Column) = format_string("%04X", c)
    def le32(c: org.apache.spark.sql.Column) =
      format_string("%02X%02X%02X%02X", byteAt(c, 1L), byteAt(c, 256L),
        byteAt(c, 65536L), byteAt(c, 16777216L))
    def be32(c: org.apache.spark.sql.Column) = format_string("%08X", c)
    val w = (id % 4000 + 16).cast("long")
    val h = (id % 3000 + 16).cast("long")
    val ori = (id % 8 + 1).cast("long")
    val pad = (id % 5).cast("long")
    val ifdOff = pad + 8L
    val hasOri = id % 2 === 0
    val cnt = when(hasOri, 4L).otherwise(3L).cast("long")
    val zeros = lit("00000000").substr(lit(1), (pad * 2).cast("int"))
    def entry(le: Boolean, tag: Long, typ: Long,
        v: org.apache.spark.sql.Column) = {
      val t16 = if (le) le16 _ else be16 _
      val t32 = if (le) le32 _ else be32 _
      val value =
        if (typ == 3L) concat(t16(v), lit("0000")) else t32(v)
      concat(t16(lit(tag)), t16(lit(typ)), t32(lit(1L)), value)
    }
    def body(le: Boolean) = {
      val t16 = if (le) le16 _ else be16 _
      val t32 = if (le) le32 _ else be32 _
      val head =
        if (le) concat(lit("49492A00"), t32(ifdOff))
        else concat(lit("4D4D002A"), t32(ifdOff))
      concat(
        head, zeros, t16(cnt),
        entry(le, 254L, 4L, lit(0L)),
        entry(le, 256L, 4L, w),
        entry(le, 257L, 4L, h),
        when(hasOri, entry(le, 274L, 3L, ori)).otherwise(lit("")),
        lit("00000000"))
    }
    df.select(
      id.as("media_id"),
      unhex(
        when(id % 3 === 0, body(le = true))
          .when(id % 3 === 1, body(le = false))
          .otherwise(hex(col(textCol).cast("binary")))).as("payload"))
  }

  /** MP4 movie-header metadata as a struct (major_brand, timescale,
    * duration): brand from the spec-pinned `ftyp` position (offset 8 of
    * the mandatory first box), timescale/duration from a real two-level
    * box walk (top-level -> `moov` -> `mvhd`, v0 AND v1 layouts) in one
    * native codegen'd pass per field (Mp4TimescaleExpr /
    * Mp4DurationExpr) — fixed offsets cannot work because `free`
    * padding floats before `moov` and `mvhd` v1 shifts every field.
    * Null fields for non-MP4 (or unparseable) payloads. */
  def mp4Meta(payload: org.apache.spark.sql.Column, maxScan: Int = 512)
      : org.apache.spark.sql.Column = {
    val ts = org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.Mp4TimescaleExpr(
        org.apache.spark.sql.GraftSqlBridge.expression(payload), maxScan))
    val dur = org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.Mp4DurationExpr(
        org.apache.spark.sql.GraftSqlBridge.expression(payload), maxScan))
    struct(
      when(ts >= 0L, substring(payload, 9, 4).cast("string"))
        .as("major_brand"),
      when(ts >= 0L, ts).as("timescale"),
      when(dur >= 0L, dur).as("duration"))
  }

  /** Deterministic planted MP4 payloads (the video sibling of
    * [[plantedAudio]]): canonical ftyp + moov/mvhd structures whose
    * brand, timescale and duration all vary with the id. By `id % 3`:
    * (0) an mvhd VERSION 0 file with a variable-length `free` box
    * parked BEFORE `moov` — a fixed moov offset reads garbage, the
    * top-level walk is load-bearing; (1) an mvhd VERSION 1 file (64-bit
    * times — every field shifted, so version dispatch is load-bearing)
    * with `moov` directly after `ftyp`; (2) the raw text bytes (null
    * metadata). Construction is hex + unhex; the m05 oracle derives
    * expectations from the same id arithmetic. */
  def plantedVideo(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val id = col(idCol)
    def be32(c: org.apache.spark.sql.Column) = format_string("%08X", c)
    def be64(c: org.apache.spark.sql.Column) = format_string("%016X", c)
    val brand = when(id % 4 === 0, "69736F6D") // isom
      .when(id % 4 === 1, "6D703432") // mp42
      .when(id % 4 === 2, "61766331") // avc1
      .otherwise("4D344120") // "M4A "
    val ts = when(id % 5 === 0, 600L).when(id % 5 === 1, 1000L)
      .when(id % 5 === 2, 90000L).when(id % 5 === 3, 44100L)
      .otherwise(48000L)
    val dur = (id % 100000 + 500).cast("long") * 100L
    val ftypHex = concat(
      lit("00000014"), lit("66747970"), // size 20, "ftyp"
      brand, lit("00000000"), brand) // major, minor, one compatible
    val pad = (id % 7).cast("int")
    val freeHex = concat( // "free", size 8 + pad
      be32(pad + 8), lit("66726565"),
      lit("4141414141414141").substr(lit(1), pad * lit(2)))
    // v0 mvhd: 8 hdr + 4 ver/flags + 4+4 times + 4 ts + 4 dur, then
    // rate/volume/reserved/matrix/predefined/next-track zero-padded to
    // the declared 108; v1 widens the times and duration to 64-bit (120)
    val mvhd0 = concat(
      lit("0000006C"), lit("6D766864"), lit("00000000"), // v0, flags
      lit("0000000000000000"), // creation, modification
      be32(ts), be32(dur),
      lit("0" * 160)) // rate..next_track_id
    val mvhd1 = concat(
      lit("00000078"), lit("6D766864"), lit("01000000"), // v1, flags
      lit("0" * 32), // creation, modification (64-bit each)
      be32(ts), be64(dur),
      lit("0" * 160))
    def moov(mvhdHex: org.apache.spark.sql.Column, mvhdLen: Long) =
      concat(be32(lit(8L + mvhdLen)), lit("6D6F6F76"), mvhdHex)
    val mdatHex = lit("000000086D646174") // empty mdat
    val mp4Hex =
      when(id % 3 === 0,
        concat(ftypHex, freeHex, moov(mvhd0, 108L), mdatHex))
        .otherwise(concat(ftypHex, moov(mvhd1, 120L), mdatHex))
    df.select(
      id.as("media_id"),
      unhex(
        when(id % 3 === 2, hex(col(textCol).cast("binary")))
          .otherwise(mp4Hex)).as("payload"))
  }

  /** Deterministic planted media payloads over a document table: by
    * `id % 3`, a well-formed PNG (IHDR + IEND), a well-formed baseline
    * JPEG (APP0 + variable-length COM + SOF0 + EOI), or the raw text
    * bytes. Dims (1 + id % 640 × 1 + id % 480), PNG color type and the
    * COM padding all vary with the id, so [[imageDims]] cannot pass by
    * accident of fixed offsets. Construction is hex-string + unhex,
    * reproduced verbatim in the m01 oracle SQL. */
  def plantedMedia(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val id = col(idCol)
    val w = (id % 640 + 1).cast("long")
    val h = (id % 480 + 1).cast("long")
    val ct = when(expr(s"$idCol div 3") % 3 === 0, 0L)
      .when(expr(s"$idCol div 3") % 3 === 1, 2L)
      .otherwise(6L)
    val pad = (id % 7).cast("int")
    val pngHex = concat(
      lit("89504E470D0A1A0A0000000D49484452"),
      format_string("%08X", w), format_string("%08X", h),
      lit("08"), format_string("%02X", ct),
      lit("00000000000000"), // compression, filter, interlace + IHDR CRC
      lit("0000000049454E44AE426082")) // IEND
    val jpegHex = concat(
      lit("FFD8FFE000104A46494600010100000100010000"), // SOI + APP0/JFIF
      lit("FFFE"), format_string("%04X", pad + 2),
      lit("414141414141").substr(lit(1), pad * lit(2)), // pad × 'A'
      lit("FFC0001108"), format_string("%04X", h), format_string("%04X", w),
      lit("03012200021101031101"), // 3 components
      lit("FFD9")) // EOI
    df.select(
      id.as("media_id"),
      unhex(
        when(id % 3 === 0, pngHex)
          .when(id % 3 === 1, jpegHex)
          .otherwise(hex(col(textCol).cast("binary")))).as("payload"))
  }

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

  // ---- ZIP archives (document containers: epub/docx/jar are all ZIP) --

  /** One payload byte at a DYNAMIC 0-based offset (Column), read from a
    * hex image — `Column.substr(Column, Column)` keeps the walk inside
    * codegen'd builtins like the static [[hxByte]]. */
  private def dynByte(
      hx: org.apache.spark.sql.Column,
      off: org.apache.spark.sql.Column
  ): org.apache.spark.sql.Column =
    conv(hx.substr((off * 2 + 1).cast("int"), lit(2)), 16, 10).cast("long")

  /** Little-endian unsigned integer of `nBytes` at dynamic offset. */
  private def dynLe(
      hx: org.apache.spark.sql.Column,
      off: org.apache.spark.sql.Column,
      nBytes: Int
  ): org.apache.spark.sql.Column =
    (0 until nBytes).map(b =>
      dynByte(hx, off + b) * lit(1L << (8 * b))).reduce(_ + _)

  /** ZIP central-directory metadata as a struct
    * (n_entries, cd_size, total_usize, names) — parsed the way the ZIP
    * spec (APPNOTE 4.3) demands: find the End-Of-Central-Directory
    * record by scanning BACKWARD from the end for its signature
    * (a variable-length archive comment means no fixed offset —
    * load-bearing: the fixture plants one), read the entry count /
    * directory size / directory offset from it, then WALK the central
    * directory — each entry's 46-byte fixed header carries the
    * uncompressed size and the name/extra/comment lengths that
    * determine where the NEXT entry starts.
    *
    * One native pass over the raw bytes (ZipInfoExpr): backward
    * signature scan, then a bounded directory walk. The original
    * expression-tree formulation chained each entry's offset into the
    * next entry's six field reads, duplicating the upstream subtree
    * (including a full-payload hex) per use — m08 cost 69 s at sf0.1;
    * the kernel runs it in milliseconds with identical null/poison
    * semantics (hostile specs + the m08 oracle gate the rewrite).
    * Archives beyond `maxEntries` report their n_entries but only the
    * first `maxEntries` names/sizes. Null fields for payloads with no
    * valid EOCD. */
  def zipInfo(
      payload: org.apache.spark.sql.Column,
      maxEntries: Int = 3
  ): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.ZipInfoExpr(
        org.apache.spark.sql.GraftSqlBridge.expression(payload),
        maxEntries))

  /** Planted ZIP fixtures: `(doc_id div 3) % 3 + 1` entries with
    * DIFFERENT name lengths (f.txt / ff.txt / fff.txt — so each walk
    * step's offset depends on the previous entry's name length), stored
    * sizes varying with the id, local-header stubs so the directory
    * offset is real, and a VARIABLE-length archive comment (`id % 7`
    * bytes) so the EOCD is never at a fixed distance from the end —
    * the backward scan is load-bearing. Every third row raw text →
    * null metadata. Construction is hex + unhex; the m08 oracle
    * derives expectations from the same id arithmetic. */
  def plantedZip(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val id = col(idCol)
    def byteAt(c: org.apache.spark.sql.Column, shift: Long) =
      pmod((c / lit(shift.toDouble)).cast("long"), lit(256L))
    def le16(c: org.apache.spark.sql.Column) =
      format_string("%02X%02X", byteAt(c, 1L), byteAt(c, 256L))
    def le32(c: org.apache.spark.sql.Column) =
      format_string("%02X%02X%02X%02X", byteAt(c, 1L), byteAt(c, 256L),
        byteAt(c, 65536L), byteAt(c, 16777216L))
    val nameHex = Seq("662E747874", "66662E747874", "6666662E747874")
    val nameLen = Seq(5, 6, 7)
    val n = (expr(s"$idCol div 3") % 3 + 1).cast("long")
    val usize = (0 until 3).map(j => (id * 7 + j * 13) % 100000L)
    val localLen = nameLen.map(30 + _)
    val localOff = localLen.scanLeft(0)(_ + _)
    def entHex(j: Int) = concat(
      lit("504B0102"), lit("00" * 12), // versions/flags/method/time/date
      lit("00000000"), // crc (unset in fixture)
      le32(usize(j)), le32(usize(j)),
      le16(lit(nameLen(j).toLong)), lit("0000"), lit("0000"),
      lit("0000"), lit("0000"), lit("00000000"),
      le32(lit(localOff(j).toLong)), lit(nameHex(j)))
    def localHex(j: Int) =
      concat(lit("504B0304"), lit("00" * 26), lit(nameHex(j)))
    val cdSizes = nameLen.map(46 + _).scanLeft(0)(_ + _) // prefix sums
    val cdSize = when(n === 1, cdSizes(1)).when(n === 2, cdSizes(2))
      .otherwise(cdSizes(3)).cast("long")
    val cdOff = when(n === 1, localOff(1)).when(n === 2, localOff(2))
      .otherwise(localOff(3)).cast("long")
    def firstN(parts: Seq[org.apache.spark.sql.Column]) =
      concat(parts.zipWithIndex.map { case (p, j) =>
        when(n >= j + 1, p).otherwise(lit(""))
      }: _*)
    val cl = (id % 7).cast("long")
    val zipHex = concat(
      firstN((0 until 3).map(localHex)),
      firstN((0 until 3).map(entHex)),
      lit("504B0506"), lit("0000"), lit("0000"),
      le16(n), le16(n), le32(cdSize), le32(cdOff),
      le16(cl), expr(s"repeat('78', $idCol % 7)"))
    df.select(
      id.as("media_id"),
      unhex(
        when(id % 3 === 2, hex(col(textCol).cast("binary")))
          .otherwise(zipHex)).as("payload"))
  }

  /** TAR member/sample walk as a struct (n_members, n_samples,
    * total_size, max_mtime, names, well_formed) — one native pass
    * ([[graft.functions.TarInfoExpr]]) over the ustar block chain:
    * octal-ASCII size fields govern where the next header starts, the
    * stored checksum is RECOMPUTED over each header (chksum field as
    * 8 spaces, per spec), and members group into WebDataset samples
    * by the basename before the first dot. A checksum mismatch still
    * parses but flags well_formed = false. Null fields for payloads
    * whose first block carries no ustar magic. */
  def tarInfo(
      payload: org.apache.spark.sql.Column,
      maxMembers: Int = 64
  ): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.TarInfoExpr(
        org.apache.spark.sql.GraftSqlBridge.expression(payload),
        maxMembers))

  /** Planted ustar fixtures (the m17 WebDataset-shard audit): by
    * `id % 3`, a THREE-member shard holding TWO samples (`<id>.txt` +
    * `<id>.cls` share a key; `<id+1>.txt` is its own — the grouping
    * convention is load-bearing), a one-member tar whose stored
    * checksum LIES by one (headers parse, well_formed must flag), or
    * the raw text bytes. Headers are built field-by-field in hex with
    * REAL checksums — constant 1981 for the fixed fields, plus the
    * name's ASCII sum and both octal fields' digit sums — so the
    * parser's spec-mandated recomputation is verified bit-for-bit by
    * the oracle's id arithmetic. Member sizes vary with the id; data
    * regions pad to 512-byte blocks; two zero blocks close. */
  def plantedTar(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val id = col(idCol)
    // ASCII sum of the id's decimal digits (no leading zeros)
    def dsum(c: org.apache.spark.sql.Column) = (0 to 9).map { i =>
      val p = math.pow(10, i).toLong
      when(lit(i) === 0 || c >= p,
        lit(48L) + pmod((c / lit(p.toDouble)).cast("long"), lit(10L)))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    // digit-value sum of the 11-digit zero-padded octal rendering
    def osum(c: org.apache.spark.sql.Column) = (0 to 10).map { i =>
      pmod((c / lit(math.pow(8, i))).cast("long"), lit(8L))
    }.reduce(_ + _)
    def oct(c: org.apache.spark.sql.Column, w: Int) =
      lpad(conv(c.cast("string"), 10, 8), w, "0")
    val mt = lit(1600000000L) + id
    // one 512-byte header: name[100] mode uid gid size[12] mtime[12]
    // chksum[8] typeflag linkname[100] magic version tail-zeros[247]
    def header(name: org.apache.spark.sql.Column,
        nameSum: org.apache.spark.sql.Column,
        size: org.apache.spark.sql.Column,
        lie: Boolean): org.apache.spark.sql.Column = {
      val ck0 = lit(1981L) + nameSum + lit(1056L) + osum(size) + osum(mt)
      val ck = if (lie) ck0 + lit(1L) else ck0
      concat(
        rpad(hex(name), 200, "0"),
        lit("3030303036343400"), // mode "0000644\0"
        lit("3030303030303000"), // uid "0000000\0"
        lit("3030303030303000"), // gid
        hex(oct(size, 11)), lit("00"),
        hex(oct(mt, 11)), lit("00"),
        hex(oct(ck, 6)), lit("0020"), // 6 octal digits, NUL, space
        lit("30"), // typeflag '0'
        lit("00" * 100), // linkname
        lit("757374617200"), // magic "ustar\0"
        lit("3030"), // version "00"
        lit("00" * 247)) // uname/gname/dev/prefix/pad
    }
    // member data: size bytes of 'A', zero-padded to the block edge
    def dataHex(sizeSql: String) = expr(
      s"concat(repeat('41', $sizeSql), " +
        s"repeat('00', 512 * (($sizeSql + 511) div 512) - ($sizeSql)))")
    val s1sql = s"$idCol % 800 + 10"
    val s2sql = s"$idCol % 4 + 1"
    val s3sql = s"($idCol + 1) % 800 + 10"
    val s1 = expr(s1sql).cast("long")
    val s2 = expr(s2sql).cast("long")
    val s3 = expr(s3sql).cast("long")
    val nameTxt = concat(id.cast("string"), lit(".txt"))
    val nameCls = concat(id.cast("string"), lit(".cls"))
    val nameTxt2 = concat((id + 1).cast("string"), lit(".txt"))
    val endBlocks = lit("00" * 1024)
    val shard3 = concat(
      header(nameTxt, dsum(id) + lit(398L), s1, lie = false),
      dataHex(s1sql),
      header(nameCls, dsum(id) + lit(368L), s2, lie = false),
      dataHex(s2sql),
      header(nameTxt2, dsum(id + 1) + lit(398L), s3, lie = false),
      dataHex(s3sql),
      endBlocks)
    val shard1Lie = concat(
      header(nameTxt, dsum(id) + lit(398L), s1, lie = true),
      dataHex(s1sql),
      endBlocks)
    df.select(
      id.as("media_id"),
      unhex(
        when(pmod(id, lit(3)) === 2, hex(col(textCol).cast("binary")))
          .when(pmod(id, lit(3)) === 1, shard1Lie)
          .otherwise(shard3)).as("payload"))
  }
}
