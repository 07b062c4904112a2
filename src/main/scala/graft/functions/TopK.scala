package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate flowing into the top-k aggregate: `score` is the
  * sort key (ascending; negate for descending), `id` the deterministic
  * tie-break, `payload` an opaque rider (e.g. the class label for KNN).
  */
case class Scored(score: Double, id: Long, payload: Long)

/** Result wrapper so the output encoder is a plain product encoder
  * (`hits` is the ascending-sorted top-k list).
  */
case class TopKHits(hits: Seq[Scored])

/** Bounded top-k-per-group aggregate.
  *
  * The scale story: a global top-k via `row_number().over(Window)` shuffles
  * the ENTIRE candidate set and sorts all candidates inside each group's
  * partition — O(|candidates|) memory/sort per key. This aggregate instead
  * keeps a k-bounded sorted buffer per (partition, key) during the partial
  * (map-side) phase, so only `k` rows per key per input partition ever
  * reach the shuffle, and the final merge is a k·P list merge. At 1000
  * executors × 100 TB the shuffle volume drops from |train|·|test| rows to
  * k·P·|test| rows.
  *
  * Ordering uses `java.lang.Double.compare` (NaN sorts last, matching
  * Spark SQL and DuckDB ascending sort), id ascending as tie-break.
  */
class TopKAgg(k: Int) extends Aggregator[Scored, ArrayBuffer[Scored], TopKHits] {
  require(k > 0)

  private def less(a: Scored, b: Scored): Boolean = {
    val c = java.lang.Double.compare(a.score, b.score)
    c < 0 || (c == 0 && a.id < b.id)
  }

  /** Insert into the ascending-sorted bounded buffer (O(k) shift; k is
    * small by construction — this is a top-k, not a sort).
    */
  private def insert(buf: ArrayBuffer[Scored], x: Scored): ArrayBuffer[Scored] = {
    if (buf.length >= k && !less(x, buf.last)) return buf
    var i = buf.length
    while (i > 0 && less(x, buf(i - 1))) i -= 1
    buf.insert(i, x)
    if (buf.length > k) buf.remove(buf.length - 1)
    buf
  }

  override def zero: ArrayBuffer[Scored] = ArrayBuffer.empty

  override def reduce(buf: ArrayBuffer[Scored], x: Scored): ArrayBuffer[Scored] =
    insert(buf, x)

  override def merge(a: ArrayBuffer[Scored], b: ArrayBuffer[Scored]): ArrayBuffer[Scored] = {
    var i = 0
    while (i < b.length) { insert(a, b(i)); i += 1 }
    a
  }

  override def finish(buf: ArrayBuffer[Scored]): TopKHits = TopKHits(buf.toSeq)

  override def bufferEncoder: Encoder[ArrayBuffer[Scored]] =
    Encoders.kryo[ArrayBuffer[Scored]]

  override def outputEncoder: Encoder[TopKHits] = Encoders.product[TopKHits]
}
