package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Single-pass MinHash signature aggregate.
  *
  * Replaces `numHashes` separate `min((a + k·b) % P)` aggregate expressions
  * with ONE aggregate holding all `numHashes` running minima in a primitive
  * long array. The per-row update is a tight JVM loop with an incremental
  * modular step (`h_{k+1} = h_k + b mod P` — no multiply, one conditional
  * subtraction instead of `%`), so cost per row is `numHashes` adds instead
  * of `numHashes` full expression evaluations, each re-reading the input
  * row. Hash family is identical to the expression form
  * (Kirsch–Mitzenmacher double hashing, `h_k = (a + k·b) mod P`), so the
  * DuckDB replay oracles are unchanged.
  *
  * Scale shape: `TypedImperativeAggregate` runs under
  * `ObjectHashAggregateExec` with map-side partial aggregation — per-key
  * state is `numHashes` longs, and only partial signatures cross the
  * shuffle, exactly like the 128-column form but with one buffer instead
  * of 128 boxed fields.
  */
case class MinHashAgg(
    a: Expression,
    b: Expression,
    numHashes: Int,
    prime: Long,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(a, b)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_agg"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val av = a.eval(input)
    val bv = b.eval(input)
    if (av != null && bv != null) {
      // inputs are 32-bit md5 halves: nonneg and < prime, so the seed is
      // `a` itself and the increment needs no initial reduction
      var h = av.asInstanceOf[Long] % prime
      val step = bv.asInstanceOf[Long] % prime
      var k = 0
      while (k < numHashes) {
        if (h < buf(k)) buf(k) = h
        h += step
        if (h >= prime) h -= prime
        k += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var k = 0
    while (k < numHashes) {
      if (other(k) < buf(k)) buf(k) = other(k)
      k += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    UnsafeArrayData.fromPrimitiveArray(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    var k = 0
    while (k < numHashes) { bb.putLong(buf(k)); k += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](numHashes)
    var k = 0
    while (k < numHashes) { out(k) = bb.getLong(); k += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(a = newChildren(0), b = newChildren(1))
}

object MinHashAgg {
  /** Column API: aggregate `(a, b)` md5-half pairs into the
    * `numHashes`-long MinHash signature array.
    */
  def apply(a: Column, b: Column, numHashes: Int, prime: Long): Column =
    ColumnBridge.column(
      MinHashAgg(ColumnBridge.expression(a), ColumnBridge.expression(b),
        numHashes, prime).toAggregateExpression())
}

/** Single-pass 64-bit SimHash aggregate: replaces 64 separate
  * `sum(±1 per bit)` aggregates with one aggregate holding the 64 bit
  * counters in a primitive int array, folding to the fingerprint long
  * (bit j set iff counter j > 0) at eval — same construction
  * (Charikar 2002 / Manku et al. WWW'07) and same result as the
  * expression form, one update call per row.
  */
case class SimHashAgg(
    a: Expression,
    b: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(a, b)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_agg"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val av = a.eval(input)
    val bv = b.eval(input)
    if (av != null && bv != null) {
      val al = av.asInstanceOf[Long]
      val bl = bv.asInstanceOf[Long]
      var j = 0
      while (j < 32) {
        buf(j) += (((al >>> j) & 1L).toInt << 1) - 1
        buf(j + 32) += (((bl >>> j) & 1L).toInt << 1) - 1
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Int], other: Array[Int]): Array[Int] = {
    var j = 0
    while (j < 64) { buf(j) += other(j); j += 1 }
    buf
  }

  override def eval(buf: Array[Int]): Any = {
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (buf(j) > 0) fp |= 1L << j
      j += 1
    }
    fp
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * 64)
    var j = 0
    while (j < 64) { bb.putInt(buf(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Int](64)
    var j = 0
    while (j < 64) { out(j) = bb.getInt(); j += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(a = newChildren(0), b = newChildren(1))
}

object SimHashAgg {
  /** Column API: aggregate `(a, b)` md5-half pairs into the 64-bit
    * SimHash fingerprint.
    */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      SimHashAgg(ColumnBridge.expression(a), ColumnBridge.expression(b))
        .toAggregateExpression())
}
