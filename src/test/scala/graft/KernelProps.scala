package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.{CharFoldUtil, VectorKernels}
import graft.lake.SchemaTools

/** Pure-JVM property tests for the native kernels and the promotion
  * ladder (no Spark session — runs 100 cases each in milliseconds). */
object KernelProps extends Properties("graft-kernels") {

  private val P = 2147483647L

  private def refFold(s: String, base: Long): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * base + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  private val asciiStr: Gen[String] =
    Gen.listOf(Gen.choose(32.toChar, 126.toChar)).map(_.mkString)

  property("charFold == reference fold") = forAll(asciiStr) { s =>
    CharFoldUtil.fold(UTF8String.fromString(s), 131L) == refFold(s, 131L)
  }

  property("charFold lands in [0, P)") = forAll(asciiStr) { s =>
    val h = CharFoldUtil.fold(UTF8String.fromString(s), 137L)
    h >= 0L && h < P
  }

  property("charFold is prefix-sensitive") =
    forAll(asciiStr, Gen.choose(33.toChar, 126.toChar)) { (s, c) =>
      // appending a non-zero codepoint changes the fold unless it cancels
      // mod P — astronomically unlikely for random input; just check the
      // recurrence holds exactly
      val h = CharFoldUtil.fold(UTF8String.fromString(s), 131L)
      val h2 = CharFoldUtil.fold(UTF8String.fromString(s + c), 131L)
      h2 == (h * 131L + c.toLong) % P
    }

  private val vec: Gen[Array[Double]] =
    Gen.containerOfN[Array, Double](16, Gen.choose(-5.0, 5.0))

  property("dot == sequential left fold, bit for bit") =
    forAll(vec, vec) { (a, b) =>
      val got = VectorKernels.dot(new GenericArrayData(a),
        new GenericArrayData(b))
      var acc = 0.0
      var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      java.lang.Double.doubleToLongBits(got) ==
        java.lang.Double.doubleToLongBits(acc)
    }

  private val hashes: Gen[Array[Long]] =
    Gen.nonEmptyContainerOf[Array, Long](Gen.choose(0L, (1L << 62) - 1))

  property("simhash == per-bit vote reference") = forAll(hashes) { hs =>
    val got = VectorKernels.simhash(new GenericArrayData(hs), 56)
    val ref = (0 until 56).map { b =>
      val vote = hs.map(h => if (((h >> b) & 1L) == 1L) 1 else -1).sum
      if (vote > 0) 1L << b else 0L
    }.sum
    got == ref
  }

  property("simhash of identical arrays has hamming 0") = forAll(hashes) {
    hs =>
      val a = VectorKernels.simhash(new GenericArrayData(hs), 56)
      val b = VectorKernels.simhash(new GenericArrayData(hs.clone()), 56)
      java.lang.Long.bitCount(a ^ b) == 0
  }

  /** Reference shingle fold: materialize the space-joined n-gram strings,
    * dedupe preserving first occurrence, fold each with both bases. */
  private def refShinglePack(tokens: Seq[String], n: Int): Seq[Long] = {
    val wins = tokens.sliding(n).filter(_.size == n).map(_.mkString(" "))
    val seen = scala.collection.mutable.LinkedHashSet[Long]()
    wins.foreach { s =>
      seen += (refFold(s, 131L) | (refFold(s, 137L) << 31))
    }
    seen.toSeq
  }

  private val tokenArr: Gen[Seq[String]] =
    Gen.listOf(Gen.listOf(Gen.choose(33.toChar, 126.toChar)).map(_.mkString))

  property("shinglePack == folds of materialized shingle strings") =
    forAll(tokenArr, Gen.choose(1, 5)) { (tks, n) =>
      val in = new GenericArrayData(
        tks.map(t => UTF8String.fromString(t): AnyRef).toArray)
      val got = CharFoldUtil.shinglePack(in, n)
      val ref = refShinglePack(tks, n)
      got.numElements() == ref.size &&
        (0 until got.numElements()).forall(i => got.getLong(i) == ref(i))
    }

  property("shinglePackAll == positional folds of every window, " +
      "duplicates kept") =
    forAll(tokenArr, Gen.choose(1, 5)) { (tks, n) =>
      val in = new GenericArrayData(
        tks.map(t => UTF8String.fromString(t): AnyRef).toArray)
      val got = CharFoldUtil.shinglePackAll(in, n)
      val ref = tks.sliding(n).filter(_.size == n).map(_.mkString(" "))
        .map(s => refFold(s, 131L) | (refFold(s, 137L) << 31)).toSeq
      got.numElements() == ref.size &&
        got.numElements() == math.max(0, tks.size - (n - 1)) &&
        (0 until got.numElements()).forall(i => got.getLong(i) == ref(i))
    }

  property("shinglePackAll distinct set == shinglePack") =
    forAll(tokenArr, Gen.choose(1, 4)) { (tks, n) =>
      val in = new GenericArrayData(
        tks.map(t => UTF8String.fromString(t): AnyRef).toArray)
      val all = CharFoldUtil.shinglePackAll(in, n)
      val dis = CharFoldUtil.shinglePack(in, n)
      (0 until all.numElements()).map(all.getLong).toSet ==
        (0 until dis.numElements()).map(dis.getLong).toSet
    }

  private val dimGen: Gen[(Int, Int, Int)] = for {
    w <- Gen.choose(1, 65535)
    h <- Gen.choose(1, 65535)
    ct <- Gen.oneOf(0, 2, 3, 4, 6)
  } yield (w, h, ct)

  property("packDims parses any well-formed PNG IHDR") =
    forAll(dimGen) { case (w, h, ct) =>
      val bytes = new Array[Byte](32)
      val magic = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      magic.zipWithIndex.foreach { case (b, i) => bytes(i) = b.toByte }
      def be32(off: Int, v: Int): Unit = {
        bytes(off) = (v >>> 24).toByte; bytes(off + 1) = (v >>> 16).toByte
        bytes(off + 2) = (v >>> 8).toByte; bytes(off + 3) = v.toByte
      }
      be32(16, w); be32(20, h)
      bytes(25) = ct.toByte
      val packed = graft.functions.MediaDimsUtil.packDims(bytes, 256)
      val expC = Map(0 -> 1L, 2 -> 3L, 3 -> 1L, 4 -> 2L, 6 -> 4L)(ct)
      packed >= 0 &&
        (packed >> 24) == w.toLong &&
        ((packed >> 4) & 0xFFFFF) == h.toLong &&
        (packed & 15L) == expC
    }

  property("packDims finds JPEG SOF0 behind a variable APP0+COM prefix") =
    forAll(dimGen, Gen.choose(0, 40)) { case ((w, h, _), pad) =>
      val com = Array.fill(pad)(0x41.toByte) // 'A' * pad, no FF C0 inside
      val b = scala.collection.mutable.ArrayBuffer[Byte]()
      b ++= Array(0xff, 0xd8, 0xff, 0xe0, 0x00, 0x04, 0x4a, 0x46)
        .map(_.toByte)
      b ++= Array(0xff, 0xfe).map(_.toByte) // COM marker
      b += ((pad + 2) >>> 8).toByte; b += ((pad + 2) & 0xff).toByte
      b ++= com
      b ++= Array(0xff, 0xc0, 0x00, 0x11, 0x08).map(_.toByte)
      b += (h >>> 8).toByte; b += (h & 0xff).toByte
      b += (w >>> 8).toByte; b += (w & 0xff).toByte
      b += 3.toByte
      b ++= Array(0xff, 0xd9).map(_.toByte)
      val packed = graft.functions.MediaDimsUtil.packDims(b.toArray, 256)
      packed >= 0 &&
        (packed >> 24) == w.toLong &&
        ((packed >> 4) & 0xFFFFF) == h.toLong &&
        (packed & 15L) == 3L
    }

  property("shinglePack values are non-negative 62-bit") =
    forAll(tokenArr) { tks =>
      val in = new GenericArrayData(
        tks.map(t => UTF8String.fromString(t): AnyRef).toArray)
      val got = CharFoldUtil.shinglePack(in, 3)
      (0 until got.numElements()).forall { i =>
        val v = got.getLong(i); v >= 0L && v < (1L << 62)
      }
    }

  import org.apache.spark.sql.types._
  private val scalarTypes: Gen[DataType] = Gen.oneOf(
    ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType,
    StringType, DateType, TimestampType, BooleanType)

  property("promote is commutative") =
    forAll(scalarTypes, scalarTypes) { (a, b) =>
      SchemaTools.promote(a, b) == SchemaTools.promote(b, a)
    }

  property("promote is idempotent") = forAll(scalarTypes) { t =>
    SchemaTools.promote(t, t) == t
  }

  property("promote is associative") =
    forAll(scalarTypes, scalarTypes, scalarTypes) { (a, b, c) =>
      SchemaTools.promote(SchemaTools.promote(a, b), c) ==
        SchemaTools.promote(a, SchemaTools.promote(b, c))
    }

  // r6: promote recurses into arrays and nullability is normalized —
  // the same laws must hold over nested types, or drift-conform results
  // would depend on file arrival order.
  private val nestedTypes: Gen[DataType] = Gen.oneOf(
    scalarTypes,
    Gen.oneOf(DecimalType(10, 2), DecimalType(12, 2)),
    Gen.zip(scalarTypes, Gen.oneOf(true, false))
      .map { case (t, n) => ArrayType(t, n) },
    scalarTypes.map(t => ArrayType(ArrayType(t, containsNull = false),
      containsNull = true)),
    Gen.zip(scalarTypes, scalarTypes).map { case (a, b) =>
      StructType(Seq(StructField("x", a), StructField("y", b)))
    })

  property("promote is commutative over nested types") =
    forAll(nestedTypes, nestedTypes) { (a, b) =>
      SchemaTools.promote(a, b) == SchemaTools.promote(b, a)
    }

  property("promote is associative over nested types") =
    forAll(nestedTypes, nestedTypes, nestedTypes) { (a, b, c) =>
      SchemaTools.promote(SchemaTools.promote(a, b), c) ==
        SchemaTools.promote(a, SchemaTools.promote(b, c))
    }

  property("promote normalizes nullability-only differences, not to " +
      "string") = forAll(scalarTypes) { t =>
    SchemaTools.promote(
      ArrayType(t, containsNull = false), ArrayType(t, containsNull = true)
    ) == ArrayType(t, containsNull = true)
  }

  // unifySchemas folds promote per column name — with commutativity +
  // associativity the unified schema is invariant under schema arrival
  // order (drift-conform must not depend on which batch came first)
  private val colNames = Gen.oneOf("a", "b", "c", "d", "e")
  private val schemaGen: Gen[StructType] = Gen
    .nonEmptyListOf(Gen.zip(colNames, nestedTypes))
    .map(fs => StructType(
      fs.toMap.toSeq.map { case (n, t) => StructField(n, t) }))

  property("unifySchemas is permutation-invariant") =
    forAll(Gen.nonEmptyListOf(schemaGen)) { schemas =>
      val fwd = SchemaTools.unifySchemas(schemas)
      SchemaTools.unifySchemas(schemas.reverse) == fwd &&
        SchemaTools.unifySchemas(schemas.sortBy(_.length)) == fwd
    }
}
