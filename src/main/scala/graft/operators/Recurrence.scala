package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Generic keyed ordered-scan kernel for order-dependent recurrences
  * (EWMA, Holt, scalar/matrix Kalman, discrete simulations, observers).
  *
  * The reference runs these as interpreted per-sample Python loops
  * (`fdi_flow/preprocessing/filters.py:72-73,115-117,344-354`). Spark has no
  * native "ordered scan per group" operator, so this kernel implements one
  * with a *secondary sort*: repartition by the series key, sort within each
  * partition by (key, order), then stream rows through `mapPartitions`
  * detecting key-change boundaries. State is O(1) per series and rows are
  * never materialized per group — a partition can hold millions of series of
  * any length, which is what survives a 100 TB scale-up (the alternative,
  * `flatMapGroups` + in-memory sort of each group, buffers whole series).
  */
object Recurrence {

  /** Streams each series (rows sharing `keyCols`, ordered by `orderCols`)
    * through a stateful scan and appends the emitted values as new columns.
    *
    * @param outFields schema of the appended columns
    * @param init      state + emitted values for the first row of a series
    * @param step      state + emitted values for each subsequent row
    */
  def rowScan[S](
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      outFields: Seq[StructField])(
      init: Row => (S, Seq[Any]))(
      step: (S, Row) => (S, Seq[Any])): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ outFields)
    val enc = Encoders.row(outSchema)
    val keyIdx = keyCols.map(df.schema.fieldIndex)
    val sorted = df
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions((keyCols ++ orderCols).map(col): _*)
    sorted.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var state: S = null.asInstanceOf[S]
      it.map { r =>
        val k = keyIdx.map(r.get)
        val (s, out) =
          if (curKey == null || k != curKey) { curKey = k; init(r) }
          else step(state, r)
        state = s
        Row.fromSeq(r.toSeq ++ out)
      }
    }(enc)
  }

  /** Scalar convenience: scan `valueCol` (cast to double) per series into a
    * single double `outCol`.
    */
  def scan[S](
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      valueCol: String,
      outCol: String)(
      init: Double => (S, Double))(
      step: (S, Double) => (S, Double)): DataFrame = {
    val tmp = "__scan_v"
    val withV = df.withColumn(tmp, col(valueCol).cast(DoubleType))
    val vIdx = withV.schema.fieldIndex(tmp)
    // NULL samples enter the recurrence as NaN (numpy parity: the reference
    // propagates NaN through the arithmetic instead of crashing).
    def v(r: Row): Double = if (r.isNullAt(vIdx)) Double.NaN else r.getDouble(vIdx)
    rowScan[S](withV, keyCols, orderCols,
      Seq(StructField(outCol, DoubleType, nullable = false))) { r =>
      val (s, o) = init(v(r)); (s, Seq(o))
    } { (s, r) =>
      val (s2, o) = step(s, v(r)); (s2, Seq(o))
    }.drop(tmp)
  }
}
