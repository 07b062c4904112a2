package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Both 32-bit MinHash/SimHash seed halves from one md5 digest, packed
  * into a single long: `(a << 32) | b` where `a`/`b` are the unsigned
  * big-endian ints of digest bytes 0–3 / 4–7 — bit-identical to the
  * composed form `conv(substring(md5(x), 1, 8), 16, 10)` /
  * `conv(substring(md5(x), 9, 8), 16, 10)` that the DuckDB oracles
  * replay, so swapping it in changes no query result.
  *
  * Why native: the composed form materializes the 32-char hex string and
  * parses two 8-char substrings back to longs — per SHINGLE, on the
  * hottest loop of the dedup family (§2.8). This expression goes digest →
  * two longs with no string allocation; unpack with `shiftrightunsigned`
  * / `& 0xFFFFFFFF` (plain long arithmetic in the same codegen stage).
  */
case class Md5Pack(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_pack requires binary input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_pack"

  override protected def nullSafeEval(input: Any): Any =
    Md5Pack.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Pack.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Pack =
    copy(child = newChild)
}

object Md5Pack {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Digest bytes 0–7 as `(unsigned-int(0..3) << 32) | unsigned-int(4..7)`.
    * Called from generated code via the static forwarder.
    */
  def compute(bytes: Array[Byte]): Long = {
    val d = digests.get()
    val dig = d.digest(bytes) // digest() resets the instance afterwards
    val a = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
      ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
    val b = ((dig(4) & 0xffL) << 24) | ((dig(5) & 0xffL) << 16) |
      ((dig(6) & 0xffL) << 8) | (dig(7) & 0xffL)
    (a << 32) | b
  }

  /** Column API. Casts to binary explicitly (same effect as the implicit
    * string→binary cast Spark's own `md5` gets from the analyzer).
    */
  def apply(c: Column): Column =
    ColumnBridge.column(Md5Pack(ColumnBridge.expression(c.cast("binary"))))
}
