package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mediaFixture = Seq(
    (1L, Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte, 1, 2)),
    (2L, Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10)),
    (3L, Array[Byte]('G', 'I', 'F', '8', '9', 'a')),
    (4L, Array[Byte]('R', 'I', 'F', 'F', 0, 0)),
    (5L, "plain text".getBytes("UTF-8"))
  ).toDF("media_id", "payload")

  test("sniffFormat recognizes magic bytes") {
    val mimes = mediaFixture
      .select(col("media_id"), Multimodal.sniffFormat(col("payload")))
      .as[(Long, String)].collect().toMap
    assert(mimes(1L) == "image/jpeg")
    assert(mimes(2L) == "image/png")
    assert(mimes(3L) == "image/gif")
    assert(mimes(4L) == "audio/wav")
    assert(mimes(5L) == "application/octet-stream")
  }

  test("imageDims parses real PNG IHDR and JPEG SOF headers byte-wise") {
    def hx(s: String): Array[Byte] =
      s.replaceAll("\\s", "").grouped(2)
        .map(Integer.parseInt(_, 16).toByte).toArray
    // real headers, hand-assembled: a 640x481 RGB PNG; a 1024x77 3-channel
    // baseline JPEG whose SOF0 sits behind APP0 + a 5-byte COM segment (so
    // a fixed-offset parse would misread it); a grayscale 16x16 PNG
    val png = hx("89504E470D0A1A0A 0000000D 49484452" +
      " 00000280 000001E1 08 02 000000 00000000")
    val pngGrey = hx("89504E470D0A1A0A 0000000D 49484452" +
      " 00000010 00000010 08 00 000000 00000000")
    val jpeg = hx("FFD8 FFE00010 4A46494600 0101 00 0001 0001 0000" +
      " FFFE0007 4142434445" +
      " FFC00011 08 004D 0400 03 012200 021101 031101 FFD9")
    val rows = Seq((1L, png), (2L, jpeg), (3L, pngGrey),
      (4L, "not an image at all".getBytes("UTF-8")),
      (5L, hx("FFD8FFE1 0004 0000"))) // JPEG magic but no SOF marker
      .toDF("media_id", "payload")
    val dims = rows
      .withColumn("d", Multimodal.imageDims(col("payload")))
      .select($"media_id", $"d.width", $"d.height", $"d.channels")
      .as[(Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(dims(1L) == ((Some(640L), Some(481L), Some(3L))))
    assert(dims(2L) == ((Some(1024L), Some(77L), Some(3L))))
    assert(dims(3L) == ((Some(16L), Some(16L), Some(1L))))
    assert(dims(4L) == ((None, None, None)))
    assert(dims(5L) == ((None, None, None)))
  }

  test("wavMeta walks chunk lists: fmt behind LIST/INFO parses, " +
      "non-WAV and truncated payloads give nulls") {
    def hx(s: String): Array[Byte] =
      s.replaceAll("\\s", "").grouped(2)
        .map(Integer.parseInt(_, 16).toByte).toArray
    // canonical 44.1k stereo 16-bit with a LIST chunk before data
    val wav = hx("52494646 40000000 57415645" +
      " 666D7420 10000000 0100 0200 44AC0000 10B10200 0400 1000" +
      " 4C495354 04000000 494E464F" +
      " 64617461 20000000")
    val rows = Seq(
      (1L, wav),
      (2L, "definitely not a wav file at all".getBytes("UTF-8")),
      (3L, hx("52494646 08000000 57415645")) // magic but no chunks
    ).toDF("media_id", "payload")
    val out = rows
      .withColumn("m", Multimodal.wavMeta(col("payload")))
      .select($"media_id", $"m.sample_rate", $"m.channels",
        $"m.bits_per_sample", $"m.data_bytes")
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(1L) ==
      ((Some(44100L), Some(2L), Some(16L), Some(32L))))
    assert(out(2L) == ((None, None, None, None)))
    assert(out(3L) == ((None, None, None, None)))
  }

  test("wavMeta terminates on hostile chunk sizes (untrusted u32)") {
    def hx(s: String): Array[Byte] =
      s.replaceAll("\\s", "").grouped(2)
        .map(Integer.parseInt(_, 16).toByte).toArray
    val prefix = "52494646 40000000 57415645"
    val rows = Seq(
      // chunk size 0xFFFFFFF8: as Int that's -8, the old walker's
      // advance was 8 + (-8) + 0 = 0 — an infinite loop; as u32-in-Long
      // the cursor jumps past n and the walk ends
      (1L, hx(prefix + " 4C495354 F8FFFFFF 00000000")),
      // size 0x7FFFFFFD (near Int.MaxValue): 8 + size overflowed Int to
      // a negative index -> ArrayIndexOutOfBounds before the fix
      (2L, hx(prefix + " 4C495354 FDFFFF7F 00000000")),
      // fmt declaring 8 bytes: too small to hold PCM fields; reading on
      // would interpret the following chunk's bytes as rate/bits
      (3L, hx(prefix + " 666D7420 08000000 0100 0200 44AC0000" +
        " 64617461 20000000"))
    ).toDF("media_id", "payload")
    val out = rows
      .withColumn("m", Multimodal.wavMeta(col("payload")))
      .select($"media_id", $"m.sample_rate", $"m.data_bytes")
      .as[(Long, Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((None, None)))
    assert(out(2L) == ((None, None)))
    assert(out(3L) == ((None, Some(32L)))) // data still found past bad fmt
  }

  test("plantedAudio RIFF length field is internally consistent") {
    val docs = (0L until 24L).map(i => (i, s"document number $i"))
      .toDF("doc_id", "text")
    val out = Multimodal.plantedAudio(docs, "doc_id", "text")
      .filter($"media_id" % 4 =!= 3) // WAV rows only
      .select($"media_id", col("payload")).as[(Long, Array[Byte])]
      .collect()
    assert(out.nonEmpty)
    out.foreach { case (id, bytes) =>
      val declared = (bytes(4) & 0xffL) | ((bytes(5) & 0xffL) << 8) |
        ((bytes(6) & 0xffL) << 16) | ((bytes(7) & 0xffL) << 24)
      // header-only fixture: actual payload ends at the data header, so
      // declared = header bytes after RIFF (len-8) + the data body the
      // header promises
      val nFrames = id % 400 + 100
      val body = nFrames * (id % 2 + 1) * 2L
      assert(declared == (bytes.length - 8) + body,
        s"media_id=$id declared=$declared header=${bytes.length}")
    }
  }

  test("plantedMedia payloads round-trip through the header parser") {
    val docs = (0L until 24L).map(i => (i, s"document number $i"))
      .toDF("doc_id", "text")
    val out = Multimodal.plantedMedia(docs, "doc_id", "text")
      .withColumn("mime", Multimodal.sniffFormat(col("payload")))
      .withColumn("d", Multimodal.imageDims(col("payload")))
      .select($"media_id", $"mime", $"d.width", $"d.height", $"d.channels")
      .as[(Long, String, Option[Long], Option[Long], Option[Long])]
      .collect()
    out.foreach { case (id, mime, w, h, c) =>
      id % 3 match {
        case 0 =>
          assert(mime == "image/png")
          assert(w.contains(id % 640 + 1) && h.contains(id % 480 + 1))
          // planted color types 0/2/6 -> channels 1/3/4
          assert(Set(1L, 3L, 4L).contains(c.get))
        case 1 =>
          assert(mime == "image/jpeg")
          assert(w.contains(id % 640 + 1) && h.contains(id % 480 + 1))
          assert(c.contains(3L))
        case _ =>
          assert(mime == "application/octet-stream")
          assert(w.isEmpty && h.isEmpty && c.isEmpty)
      }
    }
  }

  test("attachMeta adds byte length, mime, and payload hash") {
    val meta = Multimodal.attachMeta(mediaFixture, "payload")
    assert(meta.columns.toSet.contains("n_bytes"))
    val n = meta.filter($"media_id" === 5L).select("n_bytes")
      .as[Int].head()
    assert(n == "plain text".getBytes("UTF-8").length)
  }

  test("decodeBatched: mapPartitions plumbing with fixed-width features") {
    val out = Multimodal.decodeBatched(mediaFixture, "payload", dim = 8)
    assert(out.schema.fieldNames.last == "features")
    val feats = out.select("media_id", "features")
      .as[(Long, Seq[Float])].collect().toMap
    assert(feats.size == 5)
    feats.values.foreach { f =>
      assert(f.length == 8)
      f.foreach(v => assert(v >= -1.0f && v <= 1.0f))
    }
    // deterministic: second run yields identical vectors
    val again = Multimodal.decodeBatched(mediaFixture, "payload", dim = 8)
      .select("media_id", "features").as[(Long, Seq[Float])].collect().toMap
    assert(again == feats)
  }

  test("sampleFrames emits nFrames indexed rows per media row") {
    val frames = Multimodal.sampleFrames(mediaFixture, "payload", nFrames = 4)
    assert(frames.count() == 5 * 4)
    val idxs = frames.filter($"media_id" === 1L).select("frame_idx")
      .as[Int].collect().sorted.toSeq
    assert(idxs == Seq(0, 1, 2, 3))
  }

  test("gifDims + flacStreamInfo recover the planted parameters; " +
      "sniff and parse agree") {
    val ids = spark.range(0, 60)
      .select($"id".as("doc_id"), concat(lit("text payload "),
        $"id".cast("string")).as("text"))
    val parsed = Multimodal.plantedMisc(ids, "doc_id", "text")
      .withColumn("mime", Multimodal.sniffFormat($"payload"))
      .withColumn("g", Multimodal.gifDims($"payload"))
      .withColumn("f", Multimodal.flacStreamInfo($"payload"))
      .collect()
    parsed.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val mime = r.getAs[String]("mime")
      val g = r.getAs[org.apache.spark.sql.Row]("g")
      val f = r.getAs[org.apache.spark.sql.Row]("f")
      (id % 3) match {
        case 0 =>
          assert(mime == "image/gif")
          assert(g.getAs[Long]("width") == id % 640 + 1)
          assert(g.getAs[Long]("height") == id % 480 + 1)
          assert(f.isNullAt(f.fieldIndex("sample_rate")))
        case 1 =>
          assert(mime == "audio/flac")
          assert(g.isNullAt(g.fieldIndex("width")))
          val srExp = Seq(8000L, 16000L, 22050L, 44100L, 48000L)(
            (id % 5).toInt)
          assert(f.getAs[Long]("sample_rate") == srExp)
          assert(f.getAs[Long]("channels") == id % 2 + 1)
          assert(f.getAs[Long]("bits_per_sample") ==
            Seq(8L, 16L, 24L)(((id / 3) % 3).toInt))
          assert(f.getAs[Long]("total_samples") == id % 100000 + 4096)
        case _ =>
          assert(g.isNullAt(g.fieldIndex("width")))
          assert(f.isNullAt(f.fieldIndex("sample_rate")))
      }
    }
  }

  test("gif/flac parsers handle boundary values: max dims, 20-bit rate, " +
      "8 channels, 32-bit depth, 36-bit total") {
    def hexBytes(h: String): Array[Byte] =
      h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // GIF: w=65535, h=1 (le16 max / min)
    val gif = hexBytes("474946383961" + "FFFF" + "0100" + "0000003B")
    // FLAC: sr=1048575 (20-bit max), ch=8, bits=32, total=2^36-1
    val sr = 1048575L; val ch = 8L; val bits = 32L
    val total = (1L << 36) - 1
    val b18 = f"${sr >> 12}%02X"
    val b19 = f"${(sr >> 4) & 0xFF}%02X"
    val b20 = f"${((sr & 0xF) << 4) | ((ch - 1) << 1) | ((bits - 1) >> 4)}%02X"
    val b21 = f"${(((bits - 1) & 0xF) << 4) | ((total >> 32) & 0xF)}%02X"
    val rest = f"${total & 0xFFFFFFFFL}%08X"
    val flac = hexBytes("664C6143" + "80" + "000022" + "0FA00FA0" +
      "000000" + "000000" + b18 + b19 + b20 + b21 + rest + "00" * 16)
    val out = Seq((1L, gif), (2L, flac)).toDF("media_id", "payload")
      .withColumn("g", Multimodal.gifDims($"payload"))
      .withColumn("f", Multimodal.flacStreamInfo($"payload"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val g = out(1L).getAs[org.apache.spark.sql.Row]("g")
    assert(g.getAs[Long]("width") == 65535L && g.getAs[Long]("height") == 1L)
    val f = out(2L).getAs[org.apache.spark.sql.Row]("f")
    assert(f.getAs[Long]("sample_rate") == sr)
    assert(f.getAs[Long]("channels") == ch)
    assert(f.getAs[Long]("bits_per_sample") == bits)
    assert(f.getAs[Long]("total_samples") == total)
  }

  test("gif/flac parsers null out truncated and malformed payloads") {
    val hostile = Seq(
      Array[Byte](0x47, 0x49, 0x46, 0x38), // GIF magic, truncated
      "fLaC".getBytes("UTF-8"), // FLAC magic, no block
      // fLaC + non-STREAMINFO first block (type 4, len 34)
      ("664C6143" + "04" + "000022" + "00" * 34).grouped(2)
        .map(Integer.parseInt(_, 16).toByte).toArray,
      // fLaC + STREAMINFO with a wrong declared length
      ("664C6143" + "00" + "000021" + "00" * 34).grouped(2)
        .map(Integer.parseInt(_, 16).toByte).toArray,
      Array[Byte]() // empty
    ).zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("media_id", "payload")
    val out = hostile
      .withColumn("g", Multimodal.gifDims($"payload"))
      .withColumn("f", Multimodal.flacStreamInfo($"payload"))
      .collect()
    out.foreach { r =>
      val g = r.getAs[org.apache.spark.sql.Row]("g")
      val f = r.getAs[org.apache.spark.sql.Row]("f")
      assert(g.isNullAt(g.fieldIndex("width")),
        s"row ${r.getLong(0)} width should be null")
      assert(f.isNullAt(f.fieldIndex("sample_rate")),
        s"row ${r.getLong(0)} sample_rate should be null")
    }
  }

  test("plantedVideo round-trips through mp4Meta: floating free box " +
      "(v0), 64-bit mvhd v1, and raw-text rows -> nulls") {
    val df = (0L to 11L).map(i => (i, s"doc text $i"))
      .toDF("doc_id", "text")
    val out = Multimodal.plantedVideo(df, "doc_id", "text")
      .withColumn("mime", Multimodal.sniffFormat($"payload"))
      .withColumn("m", Multimodal.mp4Meta($"payload"))
      .select($"media_id", $"mime", $"m.major_brand", $"m.timescale",
        $"m.duration")
      .collect().map(r => r.getLong(0) -> r).toMap
    val brands = Seq("isom", "mp42", "avc1", "M4A ")
    val tss = Seq(600L, 1000L, 90000L, 44100L, 48000L)
    (0L to 11L).foreach { i =>
      val r = out(i)
      if (i % 3 == 2) { // raw text: not an MP4
        assert(r.getString(1) == "application/octet-stream")
        assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
      } else {
        // i%3==0 parks a (i%7)-byte free box before moov (v0 mvhd);
        // i%3==1 is mvhd v1 with 64-bit times — both must parse
        assert(r.getString(1) == "video/mp4", s"id $i mime")
        assert(r.getString(2) == brands((i % 4).toInt), s"id $i brand")
        assert(r.getLong(3) == tss((i % 5).toInt), s"id $i timescale")
        assert(r.getLong(4) == (i % 100000 + 500) * 100L, s"id $i dur")
      }
    }
  }

  test("mp4 box walker rejects hostile payloads without looping: " +
      "torn headers, zero/undersized boxes, negative largesize") {
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val ftyp = "0000001466747970" + "69736F6D" + "00000000" + "69736F6D"
    val hostile = Seq(
      hx("0000001066747970"), // ftyp declared, payload torn off
      hx(ftyp + "00000007" + "6D6F6F76"), // moov size 7 < header 8
      hx(ftyp + "00000001" + "6D6F6F76" + "FFFFFFFFFFFFFFFF"), // neg largesize
      hx(ftyp + "000000106D6F6F76" + "00000007" + "6D766864"), // child size 7
      hx(ftyp + "000000186D6F6F76" + "000000106D766864" + "02000000" +
        "00000000"), // mvhd version 2: unknown layout
      hx(ftyp), // no moov at all
      Array[Byte]()
    ).zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("media_id", "payload")
    val out = hostile.withColumn("m", Multimodal.mp4Meta($"payload"))
      .select($"media_id", $"m.timescale", $"m.duration").collect()
    out.foreach { r =>
      assert(r.isNullAt(1) && r.isNullAt(2),
        s"hostile row ${r.getLong(0)} must null out")
    }
    // size0 == 0 ("to end of file") on the LAST box is legal and must
    // still terminate: moov extends to EOF, mvhd v0 inside
    val toEof = hx(ftyp + "00000000" + "6D6F6F76" +
      "0000006C6D766864" + "00000000" + "0000000000000000" +
      "000003E8" + "00001388" + "00" * 80)
    val ok = Seq((0L, toEof)).toDF("media_id", "payload")
      .withColumn("m", Multimodal.mp4Meta($"payload"))
      .select($"m.timescale", $"m.duration").head()
    assert(ok.getLong(0) == 1000L && ok.getLong(1) == 5000L)
  }

  test("plantedTiff round-trips through tiffMeta in both byte orders; " +
      "floating IFD and entry count are honored") {
    val src = (0L until 60L).map(i => (i, s"doc text $i"))
      .toDF("doc_id", "text")
    val out = Multimodal.plantedTiff(src)
      .withColumn("m", Multimodal.tiffMeta($"payload"))
      .select($"media_id", $"m.byte_order", $"m.width", $"m.height",
        $"m.orientation")
      .collect()
    out.foreach { r =>
      val id = r.getLong(0)
      id % 3 match {
        case 2 =>
          assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
        case k =>
          assert(r.getString(1) == (if (k == 0) "II" else "MM"))
          assert(r.getLong(2) == id % 4000 + 16)
          assert(r.getLong(3) == id % 3000 + 16)
          if (id % 2 == 0) assert(r.getLong(4) == id % 8 + 1)
          else assert(r.isNullAt(4),
            s"id $id: orientation must respect the entry count")
      }
    }
  }

  test("tiffMeta nulls out hostile payloads: truncated headers, " +
      "out-of-range IFD offsets, zero entries, unknown value types") {
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val hostile = Seq(
      hx("49492A"), // truncated magic
      hx("49492A00FFFFFFFF"), // IFD offset far out of range
      hx("49492A0008000000" + "0000"), // zero entries
      hx("49492A0008000000"), // offset ok, IFD torn off
      // one entry, tag 256, but value type 5 (RATIONAL — unsupported)
      hx("49492A0008000000" + "0100" + "0001" + "0500" + "01000000" +
        "10000000" + "00000000"),
      hx("4D4D002A"), // BE header with no offset bytes
      Array[Byte]()
    ).zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("media_id", "payload")
    val out = hostile.withColumn("m", Multimodal.tiffMeta($"payload"))
      .select($"media_id", $"m.width", $"m.height", $"m.orientation")
      .collect()
    out.foreach { r =>
      assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3),
        s"hostile row ${r.getLong(0)} must null out")
    }
  }

  test("webpMeta parses hand-assembled lossy/lossless/extended files; " +
      "the 14-bit mask strips scaling hints; WEBP sniffs as image not " +
      "wav; hostile payloads null out") {
    def hx(s: String): Array[Byte] =
      s.replaceAll("\\s", "").grouped(2)
        .map(Integer.parseInt(_, 16).toByte).toArray
    val fixture = Seq(
      // 1: lossy 640x480, scaling-hint bits set on BOTH dims
      //    (0x8280 = 640 | 0x8000, 0xC1E0 = 480 | 0xC000)
      (1L, hx("52494646 16000000 57454250 56503820 0A000000" +
        "000000 9D012A 8082 E0C1")),
      // 2: lossless 17x9 -> bits = 16 + 8*16384 = 0x00020010
      (2L, hx("52494646 11000000 57454250 5650384C 05000000 2F" +
        "10000200")),
      // 3: extended canvas 70000x40000 (beyond 16 bits: LE24 matters)
      //    69999 = 0x01116F, 39999 = 0x009C3F
      (3L, hx("52494646 16000000 57454250 56503858 0A000000" +
        "2A000000 6F1101 3F9C00")),
      // 4: lossy chunk WITHOUT the key-frame start code -> null
      (4L, hx("52494646 16000000 57454250 56503820 0A000000" +
        "000000 FFFFFF 8002 E001")),
      // 5: RIFF but WAVE form -> not webp at all
      (5L, hx("52494646 16000000 57415645 56503820 0A000000" +
        "000000 9D012A 8002 E001")),
      // 6: truncated mid-header
      (6L, hx("52494646 16000000 574542")),
      (7L, Array[Byte]())
    ).toDF("media_id", "payload")
    val out = fixture
      .withColumn("mime", Multimodal.sniffFormat($"payload"))
      .withColumn("m", Multimodal.webpMeta($"payload"))
      .select($"media_id", $"mime", $"m.webp_kind", $"m.width",
        $"m.height")
      .as[(Long, String, Option[String], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(out(1L) == ("image/webp", Some("lossy"), Some(640L),
      Some(480L)))
    assert(out(2L) == ("image/webp", Some("lossless"), Some(17L),
      Some(9L)))
    assert(out(3L) == ("image/webp", Some("extended"), Some(70000L),
      Some(40000L)))
    assert(out(4L) == ("image/webp", None, None, None),
      "missing start code must null the lossy parse")
    assert(out(5L)._1 == "audio/wav" && out(5L)._2.isEmpty,
      "RIFF/WAVE must not parse as webp")
    assert(out(6L)._2.isEmpty && out(7L)._2.isEmpty)
  }

  test("zipInfo nulls out hostile payloads: truncated EOCD, directory " +
      "offset past the end, misaligned signature hex, no signature") {
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val hostile = Seq(
      hx("504B0506"), // EOCD signature, truncated record
      // full EOCD but cd offset (0xFFFF) far past the end, 1 entry
      hx("504B0506" + "0000" + "0000" + "0100" + "0100" +
        "33000000" + "FFFF0000" + "0000"),
      // "504B0506" as hex chars straddling a byte boundary:
      // bytes 0x25 0x04 0xB0 0x50 0x6? -> contains the substring
      // "504B0506" at an EVEN position only
      hx("2504B05060"),
      "no zip here at all".getBytes("UTF-8"),
      Array[Byte]()
    ).zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("media_id", "payload")
    val out = hostile.withColumn("z", Multimodal.zipInfo($"payload"))
      .select($"media_id", $"z.n_entries", $"z.total_usize", $"z.names")
      .collect()
    out.foreach { r =>
      assert(r.isNullAt(2),
        s"row ${r.getLong(0)}: total_usize should be null, got $r")
    }
    // the truncated-record case still reads a (garbage) n from beyond
    // the buffer -> conv(null) -> null; the misaligned case must be
    // rejected by the parity check, not parsed
    assert(out.forall(r => r.isNullAt(3) || r.getString(3).isEmpty))
  }

  test("plantedZip round-trips through zipInfo: entry walk spans " +
      "variable name lengths and the comment shifts the EOCD") {
    val df = (0L to 20L).map(i => (i, s"doc text $i"))
      .toDF("doc_id", "text")
    val out = Multimodal.plantedZip(df, "doc_id", "text")
      .withColumn("z", Multimodal.zipInfo($"payload"))
      .select($"media_id", $"z.n_entries", $"z.names")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) null else r.getString(2))).toMap
    for (i <- 0L to 20L) {
      if (i % 3 == 2) assert(out(i) == ((-1L, null)), s"raw row $i")
      else {
        val n = (i / 3) % 3 + 1
        val names = Seq("f.txt", "ff.txt", "fff.txt").take(n.toInt)
          .mkString(",")
        assert(out(i) == ((n, names)), s"zip row $i")
      }
    }
  }

  test("bmpMeta decodes the signed height both ways; hostile payloads " +
      "null out (V5 header, zero planes, truncated)") {
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // hand-assembled 800x600 bottom-up 24bpp, and 16x32 TOP-DOWN
    // (height stored as -32 = FFFFFFE0) 32bpp
    val dib = "00" * 24
    val up = hx("424D" + "36000000" + "00000000" + "36000000" +
      "28000000" + "20030000" + "58020000" + "0100" + "1800" + dib)
    val down = hx("424D" + "36000000" + "00000000" + "36000000" +
      "28000000" + "10000000" + "E0FFFFFF" + "0100" + "2000" + dib)
    val v5 = hx("424D" + "36000000" + "00000000" + "36000000" +
      "7C000000" + "20030000" + "58020000" + "0100" + "1800" + dib)
    val zeroPlanes = hx("424D" + "36000000" + "00000000" + "36000000" +
      "28000000" + "20030000" + "58020000" + "0000" + "1800" + dib)
    val rows = Seq(
      (0L, up), (1L, down), (2L, v5), (3L, zeroPlanes),
      (4L, hx("424D3600")), (5L, Array[Byte]()))
      .toDF("media_id", "payload")
      .withColumn("b", Multimodal.bmpMeta($"payload"))
      .select($"media_id", $"b.width", $"b.height", $"b.top_down",
        $"b.bpp")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(0L).getLong(1) == 800 && rows(0L).getLong(2) == 600 &&
      !rows(0L).getBoolean(3) && rows(0L).getLong(4) == 24)
    assert(rows(1L).getLong(1) == 16 && rows(1L).getLong(2) == 32 &&
      rows(1L).getBoolean(3) && rows(1L).getLong(4) == 32)
    // V5 headers (DIB size 124) are out of the parser's contract, a
    // zero planes field is malformed, truncation can't parse: all null
    Seq(2L, 3L, 4L, 5L).foreach(i =>
      assert(rows(i).isNullAt(1), s"row $i should be null: ${rows(i)}"))
  }

  test("icoMeta: 0-byte dims mean 256, type dispatches icon/cursor, " +
      "hostile payloads null out (type 3, zero count, truncated)") {
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    def entry(w: String, h: String, bpp: String) =
      w + h + "0000" + "0100" + bpp + "00010000" + "16000000"
    val icon256 = hx("0000" + "0100" + "0100" + entry("00", "00", "2000"))
    val cursor = hx("0000" + "0200" + "0200" + entry("30", "40", "0800"))
    val type3 = hx("0000" + "0300" + "0100" + entry("10", "10", "0400"))
    val zeroCount = hx("0000" + "0100" + "0000" + entry("10", "10", "0400"))
    val rows = Seq(
      (0L, icon256), (1L, cursor), (2L, type3), (3L, zeroCount),
      (4L, hx("00000100")), (5L, "text".getBytes("UTF-8")))
      .toDF("media_id", "payload")
      .withColumn("i", Multimodal.icoMeta($"payload"))
      .select($"media_id", $"i.ico_kind", $"i.n_images",
        $"i.first_width", $"i.first_height", $"i.first_bpp")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(0L).getString(1) == "icon" && rows(0L).getLong(2) == 1 &&
      rows(0L).getLong(3) == 256 && rows(0L).getLong(4) == 256 &&
      rows(0L).getLong(5) == 32)
    assert(rows(1L).getString(1) == "cursor" && rows(1L).getLong(2) == 2 &&
      rows(1L).getLong(3) == 0x30 && rows(1L).getLong(4) == 0x40 &&
      rows(1L).getLong(5) == 8)
    Seq(2L, 3L, 4L, 5L).foreach(i =>
      assert(rows(i).isNullAt(1), s"row $i should be null: ${rows(i)}"))
  }

  test("pdfMeta probes the declared xref offset; hostile payloads " +
      "null out or fail the probe") {
    val good = ("%PDF-1.7\nqq\nxref\n0 1\n" +
      "trailer\n<< /Size 5 >>\nstartxref\n12\n%%EOF").getBytes("UTF-8")
    // startxref LIES (points at the header): parse succeeds, probe
    // must come back false — the cross-field check a fake parser skips
    val lying = ("%PDF-1.4\nxref\n" +
      "trailer\n<< /Size 3 >>\nstartxref\n0\n%%EOF").getBytes("UTF-8")
    val noTrailer = "%PDF-1.4\nxref\nno terminator".getBytes("UTF-8")
    val rows = Seq(
      (0L, good), (1L, lying), (2L, noTrailer),
      (3L, "plain text".getBytes("UTF-8")))
      .toDF("media_id", "payload")
      .withColumn("p", Multimodal.pdfMeta($"payload"))
      .select($"media_id", $"p.version", $"p.size", $"p.startxref",
        $"p.xref_ok")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(0L).getString(1) == "1.7" && rows(0L).getLong(2) == 5 &&
      rows(0L).getLong(3) == 12 && rows(0L).getBoolean(4))
    assert(rows(1L).getString(1) == "1.4" && !rows(1L).getBoolean(4),
      "a lying startxref must fail the probe, not pass silently")
    Seq(2L, 3L).foreach(i =>
      assert(rows(i).isNullAt(1), s"row $i should be null: ${rows(i)}"))
  }

  test("mp3Meta: syncsafe decode is load-bearing; out-of-contract " +
      "frames and truncation null out") {
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // tag payload 130 bytes: syncsafe 01 02 (1*128+2) — a base-256
    // reader computes 258 and probes 128 bytes past the real frame
    val tag130 = hx("494433" + "0400" + "00" + "0000" + "0102" +
      "00" * 130 + "FFFB" + "94" + "00") // brIdx 9, srIdx 1
    val bare = hx("FFFB" + "E8" + "00") // brIdx 14, srIdx 2
    val mpeg2 = hx("FFF3" + "94" + "00") // version bits 10: not MPEG-1
    val truncTag = hx("494433" + "0300" + "00" + "0000" + "0102")
    val rows = Seq(
      (0L, tag130), (1L, bare), (2L, mpeg2), (3L, truncTag),
      (4L, "not audio".getBytes("UTF-8")))
      .toDF("media_id", "payload")
      .withColumn("p", Multimodal.mp3Meta($"payload"))
      .select($"media_id", $"p.id3_version", $"p.tag_size",
        $"p.bitrate_kbps", $"p.sample_rate")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(0L).getString(1) == "2.4" && rows(0L).getLong(2) == 130 &&
      rows(0L).getLong(3) == 128 && rows(0L).getLong(4) == 48000)
    assert(rows(1L).isNullAt(1) && rows(1L).getLong(3) == 320 &&
      rows(1L).getLong(4) == 32000)
    // MPEG-2 frame: sync fine, but outside the Layer-III/MPEG-1
    // contract — frame fields null, not garbage
    assert(rows(2L).isNullAt(3) && rows(2L).isNullAt(4))
    // tag header intact but the frame is missing: tag fields parse,
    // frame fields null
    assert(rows(3L).getString(1) == "2.3" && rows(3L).getLong(2) == 130
      && rows(3L).isNullAt(3))
    assert(rows(4L).isNullAt(1) && rows(4L).isNullAt(3))
  }

  test("warcMeta: header-block extraction, Content-Length span check " +
      "(lying lengths flag, not fail), hostile payloads null out") {
    def rec(ver: String, clen: Long, body: String, tail: String) =
      (s"WARC/$ver\r\n" +
        "WARC-Type: response\r\n" +
        "WARC-Target-URI: http://h/x\r\n" +
        s"Content-Length: $clen\r\n" +
        "\r\n" + body + tail).getBytes("UTF-8")
    val good = rec("1.0", 5L, "AAAAA", "\r\n\r\n")
    val lying = rec("1.1", 9L, "AAAAA", "\r\n\r\n")
    val noBlank = ("WARC/1.0\r\nWARC-Type: response\r\n")
      .getBytes("UTF-8") // header never terminates
    val noLen = ("WARC/1.0\r\nWARC-Type: warcinfo\r\n\r\nbody\r\n\r\n")
      .getBytes("UTF-8")
    val raw = "plain text, not a record".getBytes("UTF-8")
    val rows = Seq(
      (0L, good), (1L, lying), (2L, noBlank), (3L, noLen), (4L, raw))
      .toDF("media_id", "payload")
      .withColumn("w", Multimodal.warcMeta($"payload"))
      .select($"media_id", $"w.warc_version", $"w.warc_type",
        $"w.content_length", $"w.well_formed")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(0L).getString(1) == "1.0" &&
      rows(0L).getString(2) == "response" &&
      rows(0L).getLong(3) == 5L && rows(0L).getBoolean(4))
    // the lie parses (headers intact) but the span check flags it
    assert(rows(1L).getString(1) == "1.1" && rows(1L).getLong(3) == 9L &&
      !rows(1L).getBoolean(4))
    // an unterminated header block is not a record
    assert(rows(2L).isNullAt(1) && rows(2L).isNullAt(4))
    // no Content-Length: fields parse, the span check abstains
    assert(rows(3L).getString(2) == "warcinfo" && rows(3L).isNullAt(3) &&
      rows(3L).isNullAt(4))
    assert(rows(4L).isNullAt(1) && rows(4L).isNullAt(2))
  }

  test("tarInfo terminates on hostile payloads: lying octal sizes, " +
      "missing magic mid-chain, truncated headers, no end blocks") {
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // a minimal VALID one-member tar via the planted builder, to
    // splice hostility into
    val planted = Multimodal.plantedTar(
      Seq((1L, "t")).toDF("doc_id", "text")).collect()
    val valid = planted(0).getAs[Array[Byte]]("payload") // id 1 % 3 == 1: lying checksum, still walks
    val hostile = Seq(
      Array[Byte](), // empty
      "not a tar at all".getBytes("UTF-8"), // short, no magic
      Array.fill[Byte](600)(0x41), // long, magic absent at 257
      { // valid first header but the size field points past the end
        val b = valid.clone()
        // size field at 124: 11 octal digits -> claim 7777777777 (huge)
        val big = "37" * 10 + "3700"
        hx(big).copyToArray(b, 124)
        b.take(1024) // and truncate
      },
      { // size field carries a NON-octal byte: header poisons, halt
        val b = valid.clone(); b(124) = 'Z'.toByte; b
      },
      valid.take(500) // truncated below one block
    ).zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("media_id", "payload")
    val out = hostile.withColumn("t", Multimodal.tarInfo($"payload"))
      .select($"media_id", $"t.n_members", $"t.well_formed")
      .collect().map(r => r.getLong(0) -> r).toMap
    // rows 0-2, 5: not tars -> all-null struct fields
    Seq(0L, 1L, 2L, 5L).foreach { i =>
      assert(out(i).isNullAt(1) && out(i).isNullAt(2),
        s"row $i must be all-null, got ${out(i)}")
    }
    // rows 3-4: first magic present, walk starts, hostility flags
    assert(!out(3L).getBoolean(2),
      "a size pointing past the end must not report well_formed")
    assert(!out(4L).getBoolean(2) && out(4L).getLong(1) == 0L,
      "a non-octal size byte must poison the header and halt the walk")
  }

  test("plantedTar round-trips through tarInfo: sample grouping, " +
      "checksum verification, and the lying-checksum flag") {
    val df = (0L to 8L).map(i => (i, s"doc text $i"))
      .toDF("doc_id", "text")
    val out = Multimodal.plantedTar(df)
      .withColumn("mime", Multimodal.sniffFormat($"payload"))
      .withColumn("t", Multimodal.tarInfo($"payload"))
      .select($"media_id", $"mime", $"t.n_members", $"t.n_samples",
        $"t.total_size", $"t.well_formed")
      .collect().map(r => r.getLong(0) -> r).toMap
    (0L to 8L).foreach { i =>
      val r = out(i)
      (i % 3) match {
        case 0 => // 3 members, 2 samples, valid checksums
          assert(r.getString(1) == "application/x-tar" &&
            r.getLong(2) == 3L && r.getLong(3) == 2L &&
            r.getLong(4) == (i % 800 + 10) + (i % 4 + 1) +
              ((i + 1) % 800 + 10) &&
            r.getBoolean(5), s"row $i: $r")
        case 1 => // 1 member, checksum lies -> parses, flags
          assert(r.getString(1) == "application/x-tar" &&
            r.getLong(2) == 1L && r.getLong(3) == 1L &&
            !r.getBoolean(5), s"row $i: $r")
        case _ => // raw text
          assert(r.getString(1) == "application/octet-stream" &&
            r.isNullAt(2), s"row $i: $r")
      }
    }
  }

  test("zstdMeta survives hostile payloads: truncated frame, bare " +
      "magic, reserved bit, biased 2-byte FCS decodes with +256") {
    import spark.implicits._
    def hexDf(rows: (Long, String)*) =
      rows.toDF("media_id", "hx")
        .select($"media_id", unhex($"hx").as("payload"))
    val out = hexDf(
      // 0: bare magic, nothing after — fields null, no crash
      0L -> "28B52FFD",
      // 1: magic + descriptor only (single-segment, FCS byte MISSING)
      1L -> "28B52FFD20",
      // 2: reserved bit set — frame, well_formed false, fields null
      2L -> "28B52FFD2800",
      // 3: non-single, fcsFlag=1 (2-byte biased): field 0x0102=258
      //    -> content 514; dictFlag=0; wd=0x13
      3L -> "28B52FFD40130201",
      // 4: skippable 0x184D2A5A, size 0x00000105 = 261
      4L -> "5A2A4D1805010000",
      // 5: empty payload
      5L -> "")
      .withColumn("z", graft.operators.Multimodal.zstdMeta($"payload"))
      .select($"media_id", $"z.kind", $"z.content_size",
        $"z.window_size", $"z.skip_size", $"z.well_formed")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getString(1) == "frame" && out(0L).isNullAt(2))
    // truncated single-segment: kind stands, content null (conv(''))
    assert(out(1L).getString(1) == "frame" && out(1L).isNullAt(2))
    assert(out(2L).getString(1) == "frame" &&
      !out(2L).getBoolean(5) && out(2L).isNullAt(2),
      s"reserved bit must flag malformed: ${out(2L)}")
    assert(out(3L).getString(1) == "frame" &&
      out(3L).getLong(2) == 258L + 256L &&
      out(3L).getBoolean(5),
      s"2-byte FCS must add the +256 bias: ${out(3L)}")
    // wd=0x13: exp=2+10=12, mantissa=3 -> 4096 + 512*3 = 5632
    assert(out(3L).getLong(3) == 5632L, s"window: ${out(3L)}")
    assert(out(4L).getString(1) == "skippable" &&
      out(4L).getLong(4) == 261L && out(4L).getBoolean(5))
    assert(out(5L).isNullAt(1) && out(5L).isNullAt(5))
  }

  test("zstdMeta == JVM reference decode over 400 seeded-random " +
      "payloads (descriptor-driven layout, truncation, ANSI-safe " +
      "unrepresentable 8-byte FCS)") {
    import spark.implicits._
    // Independent reference decoder mirroring RFC 8878's header walk
    // with explicit three-valued logic (None == SQL null), including
    // the unrepresentable-FCS rule (8-byte form, top byte >= 0x80 ->
    // null content_size instead of a Long overflow).
    def ref(p0: Array[Byte]): (Option[String], Option[Boolean],
        Option[Boolean], Option[Long], Option[Long], Option[Long],
        Option[Long], Option[Boolean]) = {
      val q = p0.take(18)
      def b(i: Long): Option[Long] =
        if (i >= 0 && i < q.length) Some(q(i.toInt) & 0xffL) else None
      val isFrame = q.length >= 4 && (q(0) & 0xff) == 0x28 &&
        (q(1) & 0xff) == 0xB5 && (q(2) & 0xff) == 0x2F &&
        (q(3) & 0xff) == 0xFD
      val isSkip = q.length >= 4 && ((q(0) >> 4) & 0xf) == 5 &&
        (q(1) & 0xff) == 0x2A && (q(2) & 0xff) == 0x4D &&
        (q(3) & 0xff) == 0x18
      val fhd = b(4)
      val fcsFlag = fhd.map(_ >> 6)
      val single = fhd.map(v => (v >> 5) & 1)
      val reserved = fhd.map(v => (v >> 3) & 1)
      val checksum = fhd.map(v => (v >> 2) & 1)
      val dictFlag = fhd.map(_ & 3)
      val ok: Option[Boolean] =
        if (!isFrame) Some(false) else reserved.map(_ == 0L)
      val okT = ok.contains(true)
      val dictPos = single.map(6L - _)
      val dictLen = dictFlag.map {
        case 0L => 0L; case 1L => 1L; case 2L => 2L; case _ => 4L }
      val fcsPos = for { a <- dictPos; l <- dictLen } yield a + l
      def dynB(pos: Option[Long], off: Long): Option[Long] =
        pos.flatMap(x => b(x + off))
      def dynLe(pos: Option[Long], n: Int): Option[Long] = {
        val parts = (0 until n)
          .map(j => dynB(pos, j).map(_ * (1L << (8 * j))))
        if (parts.forall(_.isDefined)) Some(parts.map(_.get).sum)
        else None
      }
      val wd = b(5)
      val windowSize = wd.map { v =>
        val wPow = math.pow(2.0, ((v >> 3) + 10).toDouble).toLong
        wPow + (wPow / 8.0).toLong * (v % 8)
      }
      val dictId: Option[Long] = dictFlag match {
        case Some(1L) => dynB(dictPos, 0)
        case Some(2L) => dynLe(dictPos, 2)
        case Some(3L) => dynLe(dictPos, 4)
        case _        => None
      }
      val contentSize: Option[Long] = (fcsFlag, single) match {
        case (Some(0L), Some(1L)) => dynB(fcsPos, 0)
        case (Some(1L), _)        => dynLe(fcsPos, 2).map(_ + 256L)
        case (Some(2L), _)        => dynLe(fcsPos, 4)
        case (Some(3L), _) =>
          if (dynB(fcsPos, 7).exists(_ < 128L)) dynLe(fcsPos, 8)
          else None
        case _ => None
      }
      val skipSize = for {
        a <- b(4); x <- b(5); y <- b(6); z <- b(7)
      } yield a + x * 256L + y * 65536L + z * 16777216L
      val kind =
        if (isFrame) Some("frame")
        else if (isSkip) Some("skippable") else None
      def ifOk[T](v: Option[T]): Option[T] = if (okT) v else None
      (kind, ifOk(single.map(_ == 1L)), ifOk(checksum.map(_ == 1L)),
        ifOk(dictId),
        if (okT && single.contains(0L)) windowSize else None,
        ifOk(contentSize),
        if (isSkip) skipSize else None,
        if (isFrame) reserved.map(_ == 0L)
        else if (isSkip) Some(true) else None)
    }
    val rnd = new scala.util.Random(0xC0FFEEL)
    val payloads: Seq[(Long, Array[Byte])] = (0 until 400).map { i =>
      val tail = Array.fill(rnd.nextInt(15))(rnd.nextInt(256).toByte)
      val bytes = i % 4 match {
        case 0 => // zstd frame magic + random descriptor/fields
          Array(0x28, 0xB5, 0x2F, 0xFD).map(_.toByte) ++ tail
        case 1 => // skippable magic (random low nibble) + random size
          Array(0x50 | rnd.nextInt(16), 0x2A, 0x4D, 0x18)
            .map(_.toByte) ++ tail
        case 2 => // frame magic + descriptor forcing the 8-byte FCS
          Array(0x28, 0xB5, 0x2F, 0xFD,
            0xC0 | (rnd.nextInt(8) << 2) | rnd.nextInt(4))
            .map(_.toByte) ++ tail
        case _ => // raw garbage, any length
          Array.fill(rnd.nextInt(19))(rnd.nextInt(256).toByte)
      }
      (i.toLong, bytes)
    }
    val got = payloads.toDF("media_id", "payload")
      .withColumn("z", graft.operators.Multimodal.zstdMeta($"payload"))
      .select($"media_id", $"z.kind", $"z.single_segment",
        $"z.has_checksum", $"z.dict_id", $"z.window_size",
        $"z.content_size", $"z.skip_size", $"z.well_formed")
      .collect().map(r => r.getLong(0) -> r).toMap
    payloads.foreach { case (i, bytes) =>
      val e = ref(bytes)
      val r = got(i)
      def os(j: Int) = if (r.isNullAt(j)) None else Some(r.getString(j))
      def ob(j: Int) = if (r.isNullAt(j)) None else Some(r.getBoolean(j))
      def ol(j: Int) = if (r.isNullAt(j)) None else Some(r.getLong(j))
      val gotT = (os(1), ob(2), ob(3), ol(4), ol(5), ol(6), ol(7),
        ob(8))
      assert(gotT == e,
        s"payload $i (${bytes.map("%02X".format(_)).mkString}): " +
          s"got $gotT expected $e")
    }
  }

  test("tarInfo accepts space-padded octal fields (GNU tar style): " +
      "right-aligned size/mtime/chksum parse identically") {
    // re-encode every header's numeric fields as leading-space-padded
    // octal (what GNU tar and other common writers emit), recomputing
    // the checksum over the modified header bytes
    def spacePad(src: Array[Byte]): Array[Byte] = {
      val out = src.clone()
      def octAt(o: Int, w: Int): Long = {
        var v = 0L; var i = o
        while (i < o + w && out(i) >= '0' && out(i) <= '7') {
          v = (v << 3) | (out(i) - '0'); i += 1
        }
        v
      }
      def putPadded(o: Int, w: Int, v: Long): Unit = {
        val s = java.lang.Long.toOctalString(v)
        var i = 0
        while (i < w - 1 - s.length) { out(o + i) = ' '; i += 1 }
        s.getBytes("US-ASCII").copyToArray(out, o + w - 1 - s.length)
        out(o + w - 1) = 0
      }
      var off = 0
      while (off + 512 <= out.length && out(off + 257) == 'u') {
        val size = octAt(off + 124, 12)
        putPadded(off + 124, 12, size)
        putPadded(off + 136, 12, octAt(off + 136, 12))
        var i = off + 148
        while (i < off + 156) { out(i) = ' '; i += 1 }
        var sum = 0L
        i = off
        while (i < off + 512) { sum += out(i) & 0xff; i += 1 }
        val cs = java.lang.Long.toOctalString(sum)
        var j = 0
        while (j < 6 - cs.length) { out(off + 148 + j) = ' '; j += 1 }
        cs.getBytes("US-ASCII")
          .copyToArray(out, off + 148 + 6 - cs.length)
        out(off + 154) = 0
        out(off + 155) = ' '
        off += 512 + 512 * ((size.toInt + 511) / 512)
      }
      out
    }
    // doc_id 0 -> the 3-member well-formed shard
    val valid = Multimodal.plantedTar(Seq((0L, "t")).toDF("doc_id", "text"))
      .collect()(0).getAs[Array[Byte]]("payload")
    val both = Seq((0L, valid), (1L, spacePad(valid)))
      .toDF("media_id", "payload")
      .withColumn("t", Multimodal.tarInfo($"payload"))
      .select($"media_id", $"t.n_members", $"t.n_samples",
        $"t.total_size", $"t.max_mtime", $"t.well_formed")
      .collect().map(r => r.getLong(0) -> r).toMap
    val (orig, pad) = (both(0L), both(1L))
    assert(pad.getBoolean(5),
      "space-padded octal headers must still verify as well-formed")
    (1 to 4).foreach(i => assert(orig.get(i) == pad.get(i),
      s"field $i must parse identically under space padding: " +
        s"${orig.get(i)} vs ${pad.get(i)}"))
    assert(orig.getBoolean(5))
  }
}
