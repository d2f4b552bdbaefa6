package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Custom Catalyst aggregate: MinHash signature in ONE buffer.
  *
  * Folds each shingle's two portable base hashes (f1, f2 ∈ [0, 2^31-1))
  * into `numHashes` running minima of `h_i = (f1 + i*f2) mod P` — the
  * same 2-universal family as the expression formulation, but:
  *  - one `Array[Long]` buffer per group instead of `numHashes` separate
  *    aggregate buffers (leaner hash map, less GC);
  *  - `h_i` computed incrementally (one add + conditional subtract per i,
  *    no multiply/pmod) — exact because f1, f2 < P, so the running value
  *    stays in [0, 2P) and a single subtraction reduces it.
  *
  * Values are bit-identical to `min(pmod(f1 + i*f2, P))`, so the d06
  * DuckDB oracle is unchanged. */
case class MinHashAgg(
    f1: Expression,
    f2: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]] {

  private val P = 2147483647L

  override def children: Seq[Expression] = Seq(f1, f2)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val a = f1.eval(input)
    val b = f2.eval(input)
    if (a != null && b != null) {
      val h2 = b.asInstanceOf[Long]
      var h = a.asInstanceOf[Long] % P
      var i = 0
      while (i < numHashes) {
        if (h < buf(i)) buf(i) = h
        h += h2
        if (h >= P) h -= P
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (other(i) < buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(f1 = newChildren(0), f2 = newChildren(1))
}
