package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** One-pass image-header probe over a payload's byte prefix.
  *
  * Replaces the interpreted higher-order formulation of
  * `Multimodal.imageDims` (a `filter` over `sequence(2, maxScan-10)`
  * whose lambda captured the hex image of the payload — Catalyst
  * re-evaluates captured expressions per element, so the SOF scan cost
  * ~maxScan² interpreted ops per row; it was the single most expensive
  * query in the r5 bench at 9.7 s). This kernel is one JIT-hot loop over
  * at most `maxScan` bytes, codegen-friendly, and the decoded arithmetic
  * is identical to the hex-pair formulation the m01 DuckDB oracle runs.
  */
object MediaDimsUtil {

  /** Channels sentinel for "header parsed but color type unknown":
    * PNG color types outside {0,2,3,4,6} carry dims but no channel
    * count, mirroring the `when`-without-`otherwise` of the original
    * column formulation. */
  val NoChannels = 15L

  /** Parse PNG IHDR (fixed offsets) or JPEG SOF0/SOF2 (marker scan over
    * the first `maxScan` bytes) and pack the result as
    * `(width << 24) | (height << 4) | channels` — or -1 when the payload
    * is not a (complete-enough) image header.
    *
    * Bounds: width/height must fit 20 bits (always true for JPEG, whose
    * dims are 16-bit; a PNG claiming dims >= 2^20 returns -1 — such a
    * header is indistinguishable from corruption at training-data scale
    * and the caller surfaces null dims either way). Truncated payloads
    * (PNG shorter than the 26-byte IHDR span, JPEG with the marker torn
    * at the scan edge) return -1 rather than the partial nulls of the
    * old expression tree — planted fixtures and real files are always
    * longer. */
  def packDims(bytes: Array[Byte], maxScan: Int): Long = {
    if (bytes == null) return -1L
    val n = math.min(bytes.length, maxScan)
    @inline def b(i: Int): Int = bytes(i) & 0xff
    // PNG magic: 89 50 4E 47 0D 0A 1A 0A
    if (n >= 26 && b(0) == 0x89 && b(1) == 0x50 && b(2) == 0x4E &&
        b(3) == 0x47 && b(4) == 0x0D && b(5) == 0x0A && b(6) == 0x1A &&
        b(7) == 0x0A) {
      val w = (b(16).toLong << 24) | (b(17) << 16) | (b(18) << 8) | b(19)
      val h = (b(20).toLong << 24) | (b(21) << 16) | (b(22) << 8) | b(23)
      if (w >= (1L << 20) || h >= (1L << 20)) return -1L
      val c = b(25) match {
        case 0 => 1L
        case 2 => 3L
        case 3 => 1L
        case 4 => 2L
        case 6 => 4L
        case _ => NoChannels
      }
      return (w << 24) | (h << 4) | c
    }
    // JPEG SOI: FF D8 FF; scan for SOF0 (FFC0) / SOF2 (FFC2)
    if (n >= 3 && b(0) == 0xff && b(1) == 0xd8 && b(2) == 0xff) {
      var p = 2
      val lim = n - 10
      while (p <= lim) {
        if (b(p) == 0xff && (b(p + 1) == 0xc0 || b(p + 1) == 0xc2)) {
          val h = (b(p + 5) << 8) | b(p + 6)
          val w = (b(p + 7) << 8) | b(p + 8)
          val c = b(p + 9).toLong
          if (c > 14) return -1L // component count is 1..4 in any real SOF
          return (w.toLong << 24) | (h.toLong << 4) | c
        }
        p += 1
      }
    }
    -1L
  }
}

/** RIFF/WAVE header walker — the audio sibling of the image probe.
  * Canonical WAVs put `fmt ` at offset 12, but real files interleave
  * LIST/INFO (and other) chunks before `data`, so this walks the chunk
  * list like a real demuxer instead of trusting fixed offsets. */
object WavMetaUtil {

  /** Walk the chunk list and pack `(sampleRate << 10) | (channels << 6)
    * | bitsPerSample` — or -1 when the payload is not a parseable
    * PCM-style WAV (bad magic, missing fmt, or fields out of packing
    * range: rate < 2^21, channels < 16, bits < 64 cover every real
    * file). */
  def packFmt(bytes: Array[Byte], maxScan: Int): Long =
    walk(bytes, maxScan, wantData = false)

  /** The `data` chunk's declared byte size, or -1 when absent. */
  def dataSize(bytes: Array[Byte], maxScan: Int): Long =
    walk(bytes, maxScan, wantData = true)

  private def walk(bytes: Array[Byte], maxScan: Int,
      wantData: Boolean): Long = {
    if (bytes == null) return -1L
    val n = math.min(bytes.length, maxScan)
    @inline def b(i: Int): Int = bytes(i) & 0xff
    @inline def le16(i: Int): Int = b(i) | (b(i + 1) << 8)
    @inline def le32(i: Int): Long =
      b(i).toLong | (b(i + 1).toLong << 8) | (b(i + 2).toLong << 16) |
        (b(i + 3).toLong << 24)
    // "RIFF" .... "WAVE"
    if (n < 12 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' ||
        b(3) != 'F' || b(8) != 'W' || b(9) != 'A' || b(10) != 'V' ||
        b(11) != 'E') return -1L
    // Cursor and sizes stay in Long: a chunk size is an untrusted u32,
    // and truncating it to Int (old code) let a crafted size like
    // 0xFFFFFFF8 advance the cursor by zero — an unkillable tight loop
    // on a malformed header. In Long the advance is always >= 8, so the
    // walk strictly progresses and terminates.
    var p = 12L
    while (p + 8 <= n) {
      val pi = p.toInt
      val size = le32(pi + 4) // u32 in [0, 2^32): never negative as Long
      val isFmt = b(pi) == 'f' && b(pi + 1) == 'm' && b(pi + 2) == 't' &&
        b(pi + 3) == ' '
      val isData = b(pi) == 'd' && b(pi + 1) == 'a' && b(pi + 2) == 't' &&
        b(pi + 3) == 'a'
      // `data`'s declared size may exceed the scanned prefix — we only
      // read the header, so return it without a bounds check.
      if (isData && wantData) return size
      if (isFmt && !wantData) {
        // A fmt chunk declaring < 16 bytes cannot hold the PCM fields;
        // reading on would interpret the *next* chunk's bytes as fmt.
        if (size < 16 || p + 8 + 16 > n) return -1L
        val ch = le16(pi + 10)
        val rate = le32(pi + 12)
        val bits = le16(pi + 22)
        if (rate >= (1L << 21) || ch >= 16 || bits >= 64) return -1L
        return (rate << 10) | (ch.toLong << 6) | bits.toLong
      }
      // chunks are word-aligned: odd sizes carry a pad byte
      p += 8L + size + (size & 1L)
    }
    -1L
  }
}

case class WavFmtPackExpr(child: Expression, maxScan: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "wav_fmt_pack"
  override def nullSafeEval(input: Any): Any =
    WavMetaUtil.packFmt(input.asInstanceOf[Array[Byte]], maxScan)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WavMetaUtil.packFmt($c, $maxScan)")
  override protected def withNewChildInternal(newChild: Expression)
      : WavFmtPackExpr = copy(child = newChild)
}

case class WavDataSizeExpr(child: Expression, maxScan: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "wav_data_size"
  override def nullSafeEval(input: Any): Any =
    WavMetaUtil.dataSize(input.asInstanceOf[Array[Byte]], maxScan)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WavMetaUtil.dataSize($c, $maxScan)")
  override protected def withNewChildInternal(newChild: Expression)
      : WavDataSizeExpr = copy(child = newChild)
}

/** Native packed image-dims probe: binary payload in, packed long out
  * (-1 = not parseable; see MediaDimsUtil.packDims). Stays inside
  * whole-stage codegen — the unpack (shifts + masks) composes with it in
  * the same generated function. */
case class MediaDimsPackExpr(child: Expression, maxScan: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "image_dims_pack"

  override def nullSafeEval(input: Any): Any =
    MediaDimsUtil.packDims(input.asInstanceOf[Array[Byte]], maxScan)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MediaDimsUtil.packDims($c, $maxScan)")

  override protected def withNewChildInternal(newChild: Expression)
      : MediaDimsPackExpr = copy(child = newChild)
}

/** ISO-BMFF (MP4/MOV) box walker — the video sibling of the WAV chunk
  * walk. `ftyp` is pinned first by the spec, but `moov` floats (after
  * `free`/`skip` padding, before or after `mdat`), and `mvhd`'s field
  * offsets depend on its version byte — so both the top-level walk and
  * the `moov`-children walk are load-bearing, as is v0-vs-v1 handling.
  */
object Mp4MetaUtil {

  def timescale(bytes: Array[Byte], maxScan: Int): Long =
    walk(bytes, maxScan, wantDuration = false)

  def duration(bytes: Array[Byte], maxScan: Int): Long =
    walk(bytes, maxScan, wantDuration = true)

  /** Walk the top-level box list to `moov`, then its children to
    * `mvhd`, and return the movie timescale or duration — or -1 when
    * the payload is not a parseable MP4 (no leading `ftyp`, no
    * `moov`/`mvhd` in the scanned prefix, torn header, or a hostile
    * size field). All cursors and sizes stay in Long: box sizes are
    * untrusted u32/u64, and the `size < header` guard keeps every
    * advance strictly positive, so the walk always terminates —
    * the WavMetaUtil discipline. */
  private def walk(bytes: Array[Byte], maxScan: Int,
      wantDuration: Boolean): Long = {
    if (bytes == null) return -1L
    val n: Long = math.min(bytes.length, maxScan).toLong
    @inline def b(i: Long): Int = bytes(i.toInt) & 0xff
    @inline def be32(i: Long): Long =
      (b(i).toLong << 24) | (b(i + 1).toLong << 16) |
        (b(i + 2).toLong << 8) | b(i + 3).toLong
    @inline def be64(i: Long): Long =
      (be32(i) << 32) | be32(i + 4)
    @inline def typ(i: Long, t: String): Boolean =
      b(i) == t.charAt(0) && b(i + 1) == t.charAt(1) &&
        b(i + 2) == t.charAt(2) && b(i + 3) == t.charAt(3)
    // the spec pins ftyp as the first box
    if (n < 12 || !typ(4L, "ftyp")) return -1L
    var p = 0L
    while (p + 8 <= n) {
      val size0 = be32(p)
      var hdr = 8L
      var size = size0
      if (size0 == 1L) { // 64-bit largesize follows the type
        if (p + 16 > n) return -1L
        size = be64(p + 8)
        hdr = 16L
        if (size < 0L) return -1L // >= 2^63: hostile
      } else if (size0 == 0L) { // box extends to end of file
        size = n - p
      }
      if (size < hdr) return -1L // advance must be strictly positive
      if (typ(p + 4, "moov")) {
        val end = math.min(p + size, n)
        var q = p + hdr
        while (q + 8 <= end) {
          val cs0 = be32(q)
          var chdr = 8L
          var cs = cs0
          if (cs0 == 1L) {
            if (q + 16 > end) return -1L
            cs = be64(q + 8)
            chdr = 16L
            if (cs < 0L) return -1L
          } else if (cs0 == 0L) {
            cs = end - q
          }
          if (cs < chdr) return -1L
          if (typ(q + 4, "mvhd")) {
            if (q + 9 > n) return -1L
            val version = b(q + 8)
            if (version == 0) {
              // v0: ver/flags(4) creation(4) modification(4) ts(4) dur(4)
              if (q + 28 > n) return -1L
              return if (wantDuration) be32(q + 24) else be32(q + 20)
            } else if (version == 1) {
              // v1: ver/flags(4) creation(8) modification(8) ts(4) dur(8)
              if (q + 40 > n) return -1L
              val d = be64(q + 32)
              if (d < 0L) return -1L
              return if (wantDuration) d else be32(q + 28)
            } else return -1L
          }
          q += cs
        }
        return -1L // moov scanned, no mvhd
      }
      p += size
    }
    -1L
  }
}

case class Mp4TimescaleExpr(child: Expression, maxScan: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "mp4_timescale"
  override def nullSafeEval(input: Any): Any =
    Mp4MetaUtil.timescale(input.asInstanceOf[Array[Byte]], maxScan)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Mp4MetaUtil.timescale($c, $maxScan)")
  override protected def withNewChildInternal(newChild: Expression)
      : Mp4TimescaleExpr = copy(child = newChild)
}

case class Mp4DurationExpr(child: Expression, maxScan: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "mp4_duration"
  override def nullSafeEval(input: Any): Any =
    Mp4MetaUtil.duration(input.asInstanceOf[Array[Byte]], maxScan)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Mp4MetaUtil.duration($c, $maxScan)")
  override protected def withNewChildInternal(newChild: Expression)
      : Mp4DurationExpr = copy(child = newChild)
}

/** Native TIFF IFD walk (see graft.operators.Multimodal.tiffMeta for
  * the field semantics). One pass, both byte orders, entry count and
  * SHORT/LONG value types honored, untrusted offsets bounded by the
  * scan window. Packs `order(1) | orientation(5) | height(24) |
  * width(24)` with all-ones sentinels for missing fields; -1 = not a
  * TIFF header at all. Replaces the builtin conv/substr formulation,
  * which re-materialized the hex projection per byte read (~200 reads
  * per row — measured 105 s for the m06 scaling cell at sf0.1; this
  * kernel: one array pass, whole-stage codegen). */
object TiffMetaUtil {

  val MissingDim = 0xFFFFFFL
  val MissingOri = 0x1FL

  def pack(bytes: Array[Byte], maxScan: Int, maxEntries: Int): Long = {
    if (bytes == null) return -1L
    val n = math.min(bytes.length, maxScan)
    if (n < 8) return -1L
    @inline def b(i: Int): Int = bytes(i) & 0xff
    val isLE = b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0
    val isBE = b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42
    if (!isLE && !isBE) return -1L
    @inline def u16(i: Int): Int =
      if (isBE) (b(i) << 8) | b(i + 1) else b(i) | (b(i + 1) << 8)
    @inline def u32(i: Int): Long =
      if (isBE)
        (b(i).toLong << 24) | (b(i + 1).toLong << 16) |
          (b(i + 2).toLong << 8) | b(i + 3).toLong
      else
        b(i).toLong | (b(i + 1).toLong << 8) |
          (b(i + 2).toLong << 16) | (b(i + 3).toLong << 24)
    var width = MissingDim
    var height = MissingDim
    var ori = MissingOri
    val order = if (isBE) 1L else 0L
    val ifd = u32(4) // untrusted u32: bounds-checked before every read
    if (ifd >= 8L && ifd + 2L <= n) {
      val cnt = u16(ifd.toInt)
      var i = 0
      while (i < cnt && i < maxEntries &&
          ifd + 2L + (i + 1L) * 12L <= n) {
        val base = (ifd + 2L + i * 12L).toInt
        val tag = u16(base)
        val typ = u16(base + 2)
        // SHORT (3) and LONG (4) decode; other types stay unreadable
        // (the search continues — a later same-tag entry may decode)
        val v: Long =
          if (typ == 3) u16(base + 8).toLong
          else if (typ == 4) u32(base + 8)
          else -1L
        if (v >= 0L) {
          if (tag == 256 && width == MissingDim && v < MissingDim)
            width = v
          else if (tag == 257 && height == MissingDim && v < MissingDim)
            height = v
          else if (tag == 274 && ori == MissingOri && v < MissingOri)
            ori = v
        }
        i += 1
      }
    }
    (order << 53) | (ori << 48) | (height << 24) | width
  }
}

case class TiffPackExpr(child: Expression, maxScan: Int, maxEntries: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "tiff_pack"
  override def nullSafeEval(input: Any): Any =
    TiffMetaUtil.pack(input.asInstanceOf[Array[Byte]], maxScan, maxEntries)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TiffMetaUtil.pack($c, $maxScan, $maxEntries)")
  override protected def withNewChildInternal(newChild: Expression)
      : TiffPackExpr = copy(child = newChild)
}

/** ZIP central-directory metadata in ONE native pass — replaces the
  * expression-tree walk in `Multimodal.zipInfo`, whose chained entry
  * offsets (entry N's position feeds entry N+1's six field reads)
  * duplicated the whole upstream subtree per use: the tree re-hexed the
  * full payload hundreds of times per row and made m08 the most
  * expensive bench query by far (69 s at sf0.1; this kernel: one
  * backward signature scan + one bounded directory walk over the raw
  * bytes). Field semantics replicate the tree formulation exactly —
  * same null/poison rules, same name concatenation — so the m08 oracle
  * and the hostile-payload specs gate the rewrite. */
object ZipInfoUtil {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.unsafe.types.UTF8String

  private def row(n: Any, cd: Any, tot: Any, names: Any): InternalRow =
    new GenericInternalRow(Array[Any](n, cd, tot, names))

  def info(bytes: Array[Byte], maxEntries: Int): InternalRow = {
    val L = bytes.length
    @inline def b(i: Int): Long = bytes(i) & 0xffL
    def le(i: Long, w: Int): java.lang.Long =
      if (i < 0 || i + w > L) null
      else {
        var v = 0L
        var k = w - 1
        while (k >= 0) { v = (v << 8) | b((i + k).toInt); k -= 1 }
        v
      }
    // EOCD: the spec's BACKWARD scan for 50 4B 05 06 (a variable-length
    // archive comment makes any fixed end offset wrong)
    var e = L - 4
    var found = -1
    while (e >= 0 && found < 0) {
      if (bytes(e) == 0x50 && bytes(e + 1) == 0x4B &&
        bytes(e + 2) == 0x05 && bytes(e + 3) == 0x06) found = e
      e -= 1
    }
    if (found < 0) return row(null, null, null, null)
    val n = le(found + 10L, 2)
    val cdSize = le(found + 12L, 4)
    val cdOff = le(found + 16L, 4)
    if (n == null || cdOff == null) return row(n, cdSize, null, null)
    // bounded central-directory walk; an expected-but-malformed entry
    // poisons the size total (null), exactly like the tree formulation
    var off = cdOff.longValue
    var total = 0L
    var poisoned = false
    val names = new java.lang.StringBuilder
    var sep = false
    var j = 0
    var walkable = true
    while (j < maxEntries) {
      if (n.longValue >= j + 1) {
        val sigOk = walkable && off >= 0 && off + 4 <= L &&
          bytes(off.toInt) == 0x50 && bytes(off.toInt + 1) == 0x4B &&
          bytes(off.toInt + 2) == 0x01 && bytes(off.toInt + 3) == 0x02
        if (!sigOk) { poisoned = true; walkable = false }
        else {
          val usize = le(off + 24, 4)
          val nameLen = le(off + 28, 2)
          val extraLen = le(off + 30, 2)
          val cmtLen = le(off + 32, 2)
          if (usize == null) poisoned = true else total += usize.longValue
          if (nameLen != null) {
            val start = off + 46
            val avail = math.max(0L,
              math.min(nameLen.longValue, L - start)).toInt
            if (sep) names.append(',')
            if (start < L && avail > 0)
              names.append(
                new String(bytes, start.toInt, avail,
                  java.nio.charset.StandardCharsets.UTF_8))
            sep = true
          }
          if (nameLen == null || extraLen == null || cmtLen == null)
            walkable = false
          else off = off + 46 + nameLen + extraLen + cmtLen
        }
      }
      j += 1
    }
    row(n, cdSize, if (poisoned) null else java.lang.Long.valueOf(total),
      UTF8String.fromString(names.toString))
  }
}

case class ZipInfoExpr(child: Expression, maxEntries: Int)
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_entries", LongType),
      org.apache.spark.sql.types.StructField("cd_size", LongType),
      org.apache.spark.sql.types.StructField("total_usize", LongType),
      org.apache.spark.sql.types.StructField("names",
        org.apache.spark.sql.types.StringType)))
  override def prettyName: String = "zip_info"
  override def nullSafeEval(input: Any): Any =
    ZipInfoUtil.info(input.asInstanceOf[Array[Byte]], maxEntries)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ZipInfoUtil.info($c, $maxEntries)")
  override protected def withNewChildInternal(newChild: Expression)
      : ZipInfoExpr = copy(child = newChild)
}

/** TAR (ustar) archive walk — the WebDataset shard audit. Training
  * corpora ship as tar shards whose members pair up into samples by
  * key (the basename before the first dot: `000123.txt` +
  * `000123.cls` is ONE sample — the WebDataset convention), so the
  * ingestion audit needs member count, SAMPLE count, total payload
  * size, and header-checksum validation in one pass over the raw
  * bytes. Header layout per the POSIX ustar spec: 512-byte blocks,
  * NUL-padded name at 0 (100 bytes), octal-ASCII size at 124 (12),
  * octal mtime at 136 (12), octal checksum at 148 (8 — computed over
  * the header with the checksum field read as 8 SPACES), typeflag at
  * 156, magic "ustar" at 257; member data follows, padded to 512; two
  * zero blocks end the archive. A header whose stored checksum
  * disagrees with the recomputed sum still PARSES (fields surface)
  * but flags well_formed = false — corruption detection is the first
  * audit any shard ingest runs, and it must not hide the fields that
  * locate the damage. */
object TarInfoUtil {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.unsafe.types.UTF8String

  private def row(n: Any, samples: Any, tot: Any, mt: Any, names: Any,
      wf: Any): InternalRow =
    new GenericInternalRow(Array[Any](n, samples, tot, mt, names, wf))

  def info(bytes: Array[Byte], maxMembers: Int): InternalRow = {
    val L = bytes.length
    @inline def b(i: Int): Int = bytes(i) & 0xff
    // octal-ASCII field: optional space/NUL LEFT padding (GNU tar and
    // other common writers right-align size/mtime/chksum), then digits
    // until a NUL/space terminator; null on any other byte
    def octal(off: Int, w: Int): java.lang.Long = {
      if (off < 0 || off + w > L) return null
      var v = 0L
      var i = off
      var seen = false
      while (i < off + w && (b(i) == ' ' || b(i) == 0)) i += 1
      while (i < off + w) {
        val c = b(i)
        if (c >= '0' && c <= '7') { v = (v << 3) | (c - '0'); seen = true }
        else if (c == 0 || c == ' ') i = off + w - 1 // terminator
        else return null
        i += 1
      }
      if (seen) v else null
    }
    def zeroBlock(off: Int): Boolean = {
      if (off + 512 > L) return false
      var i = off
      while (i < off + 512) { if (bytes(i) != 0) return false; i += 1 }
      true
    }
    if (L < 512) return row(null, null, null, null, null, null)
    // first header must carry the ustar magic, else: not a tar
    if (!(b(257) == 'u' && b(258) == 's' && b(259) == 't' &&
        b(260) == 'a' && b(261) == 'r'))
      return row(null, null, null, null, null, null)
    var off = 0
    var n = 0L
    var total = 0L
    var maxMtime = Long.MinValue
    var allOk = true
    val names = new java.lang.StringBuilder
    val keys = new java.util.HashSet[String]()
    var halted = false
    while (!halted && n < maxMembers && off + 512 <= L &&
        !zeroBlock(off)) {
      val magicOk = b(off + 257) == 'u' && b(off + 258) == 's' &&
        b(off + 259) == 't' && b(off + 260) == 'a' && b(off + 261) == 'r'
      if (!magicOk) { allOk = false; halted = true }
      else {
        // name: NUL-terminated within its 100 bytes
        var nl = 0
        while (nl < 100 && off + nl < L && bytes(off + nl) != 0) nl += 1
        val name = new String(bytes, off, nl,
          java.nio.charset.StandardCharsets.UTF_8)
        val size = octal(off + 124, 12)
        val mtime = octal(off + 136, 12)
        val stored = octal(off + 148, 8)
        // recompute: checksum field counts as 8 spaces
        var sum = 0L
        var i = off
        while (i < off + 512 && i < L) {
          sum += (if (i - off >= 148 && i - off < 156) ' ' else b(i))
          i += 1
        }
        if (stored == null || stored.longValue != sum) allOk = false
        if (size == null) { allOk = false; halted = true }
        else {
          n += 1
          total += size.longValue
          if (mtime != null && mtime.longValue > maxMtime)
            maxMtime = mtime.longValue
          if (names.length > 0) names.append(',')
          names.append(name)
          val dot = name.indexOf('.')
          keys.add(if (dot >= 0) name.substring(0, dot) else name)
          val dataBlocks = (size.longValue + 511L) / 512L
          val next = off + 512L + dataBlocks * 512L
          if (next > Int.MaxValue) halted = true
          else off = next.toInt
        }
      }
    }
    row(java.lang.Long.valueOf(n), java.lang.Long.valueOf(keys.size.toLong),
      java.lang.Long.valueOf(total),
      if (maxMtime == Long.MinValue) null
      else java.lang.Long.valueOf(maxMtime),
      UTF8String.fromString(names.toString),
      java.lang.Boolean.valueOf(allOk))
  }
}

case class TarInfoExpr(child: Expression, maxMembers: Int)
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_members", LongType),
      org.apache.spark.sql.types.StructField("n_samples", LongType),
      org.apache.spark.sql.types.StructField("total_size", LongType),
      org.apache.spark.sql.types.StructField("max_mtime", LongType),
      org.apache.spark.sql.types.StructField("names",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("well_formed",
        org.apache.spark.sql.types.BooleanType)))
  override def prettyName: String = "tar_info"
  override def nullSafeEval(input: Any): Any =
    TarInfoUtil.info(input.asInstanceOf[Array[Byte]], maxMembers)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TarInfoUtil.info($c, $maxMembers)")
  override protected def withNewChildInternal(newChild: Expression)
      : TarInfoExpr = copy(child = newChild)
}
