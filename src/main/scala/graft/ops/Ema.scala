package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Exponential moving average — a *recursive* window function
  * (`y_i = α·x_i + (1-α)·y_{i-1}`, seeded `y_0 = x_0`) that no
  * frame-based window can express (reference
  * `functions/window/EmaDoubleWindowFunctionFactory.java`).
  *
  * Lowering: repartition by series key, sort each partition by
  * (key, ts), then a single sequential fold per partition
  * (`mapPartitions`). One shuffle, O(1) state per open series — the
  * same access pattern any keyed stateful operator needs at scale.
  */
object Ema {
  def ema(df: DataFrame, ts: String, keys: Seq[String],
          valueCol: String, alpha: Double, out: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField(out, DoubleType, nullable = true))
    val keyIdx = keys.map(df.columns.indexOf(_))
    val valIdx = df.columns.indexOf(valueCol)
    val sortCols = (keys :+ ts).map(col)

    val partitioned =
      if (keys.isEmpty) df.repartitionByRange(1, col(ts)).sortWithinPartitions(col(ts))
      else df.repartition(keys.map(col): _*).sortWithinPartitions(sortCols: _*)

    partitioned.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var state: Double = Double.NaN
      var hasState = false
      it.map { r =>
        val k = keyIdx.map(r.get)
        if (curKey == null || k != curKey) { curKey = k; hasState = false }
        val x = if (r.isNullAt(valIdx)) null else r.getDouble(valIdx)
        val y: Any =
          if (x == null) { if (hasState) state else null }
          else {
            state = if (hasState) alpha * x.asInstanceOf[Double] + (1 - alpha) * state
                    else x.asInstanceOf[Double]
            hasState = true
            state
          }
        Row.fromSeq(r.toSeq :+ y)
      }
    }(Encoders.row(outSchema))
  }
}
