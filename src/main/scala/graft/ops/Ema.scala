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
  /** Volume-weighted EMA (reference `VwemaDoubleWindowFunctionFactory`):
    * two coupled recursions — `num = α·p·v + (1-α)·num_prev`,
    * `den = α·v + (1-α)·den_prev`, output `num/den`. Same
    * repartition-by-key sorted fold as [[ema]].
    */
  def vwema(df: DataFrame, ts: String, keys: Seq[String],
            priceCol: String, volumeCol: String, alpha: Double, out: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField(out, DoubleType, nullable = true))
    val keyIdx = keys.map(df.columns.indexOf(_))
    val pIdx = df.columns.indexOf(priceCol)
    val vIdx = df.columns.indexOf(volumeCol)
    val sortCols = (keys :+ ts).map(col)
    val partitioned =
      if (keys.isEmpty) df.repartitionByRange(1, col(ts)).sortWithinPartitions(col(ts))
      else df.repartition(keys.map(col): _*).sortWithinPartitions(sortCols: _*)
    partitioned.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var num = 0.0; var den = 0.0; var hasState = false
      it.map { r =>
        val k = keyIdx.map(r.get)
        if (curKey == null || k != curKey) { curKey = k; hasState = false }
        // a row participates only when price is finite and volume is
        // finite AND positive (reference VwemaDoubleWindowFunction:
        // volume <= 0 keeps the previous VWEMA)
        val participating = !r.isNullAt(pIdx) && !r.isNullAt(vIdx) && {
          val p = r.getDouble(pIdx); val v = r.getDouble(vIdx)
          java.lang.Double.isFinite(p) && java.lang.Double.isFinite(v) && v > 0
        }
        val y: Any =
          if (!participating) {
            if (hasState && den != 0.0) num / den else null
          } else {
            val p = r.getDouble(pIdx); val v = r.getDouble(vIdx)
            if (hasState) {
              // alpha * (p*v): association matches the oracle's fold over
              // precomputed p*v elements
              num = alpha * (p * v) + (1 - alpha) * num
              den = alpha * v + (1 - alpha) * den
            } else { num = p * v; den = v; hasState = true }
            if (den != 0.0) num / den else null
          }
        Row.fromSeq(r.toSeq :+ y)
      }
    }(Encoders.row(outSchema))
  }

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

  /** Time-decay EMA / VWEMA (reference EmaDoubleWindowFunctionFactory
    * time-unit modes): per-row `α_i = 1 - exp(-Δt/τ)`, first row of a
    * series seeds with its value. `volumeCol = None` → plain EMA.
    * Rows fold in `ts` (window ORDER BY) order, but Δt reads the
    * DESIGNATED timestamp `timeCol` — the window may order by any key
    * (VwemaWindowFunctionTest sort_key). */
  def emaDecay(df: DataFrame, ts: String, keys: Seq[String],
               priceCol: String, volumeCol: Option[String], tauUs: Long,
               out: String, timeCol: Option[String] = None): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField(out, DoubleType, nullable = true))
    val keyIdx = keys.map(df.columns.indexOf(_))
    val pIdx = df.columns.indexOf(priceCol)
    val vIdx = volumeCol.map(df.columns.indexOf(_))
    val tIdx = df.columns.indexOf(timeCol.getOrElse(ts))
    val sortCols = (keys :+ ts).map(col)
    val partitioned =
      if (keys.isEmpty) df.repartitionByRange(1, col(ts)).sortWithinPartitions(col(ts))
      else df.repartition(keys.map(col): _*).sortWithinPartitions(sortCols: _*)
    partitioned.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var num = 0.0; var den = 0.0; var state = 0.0
      var prevUs = 0L; var hasState = false
      it.map { r =>
        val k = keyIdx.map(r.get)
        if (curKey == null || k != curKey) { curKey = k; hasState = false }
        val us = r.get(tIdx) match {
          case t: java.sql.Timestamp => t.getTime * 1000L + (t.getNanos % 1000000) / 1000L
          case t: java.time.Instant => t.getEpochSecond * 1000000L + t.getNano / 1000L
          case l: java.lang.Long => l.longValue()
          case _ => 0L
        }
        // vwema participation requires a FINITE POSITIVE volume — a
        // zero/negative volume keeps the previous value and does not
        // seed the state (reference VwemaDoubleWindowFunction)
        val invalid = r.isNullAt(pIdx) || vIdx.exists(r.isNullAt) ||
          vIdx.exists { vi =>
            val v = r.getDouble(vi)
            !java.lang.Double.isFinite(v) || v <= 0
          } || !java.lang.Double.isFinite(r.getDouble(pIdx))
        val y: Any =
          if (invalid) {
            if (hasState) (if (vIdx.isDefined) { if (den != 0.0) num / den else null } else state)
            else null
          } else {
            val p = r.getDouble(pIdx)
            val alpha =
              if (!hasState) 1.0
              else {
                val dt = us - prevUs
                if (dt <= 0) 1.0 else 1.0 - math.exp(-dt.toDouble / tauUs)
              }
            vIdx match {
              case Some(vi) =>
                val v = r.getDouble(vi)
                if (!hasState) { num = p * v; den = v }
                else { num = alpha * (p * v) + (1 - alpha) * num
                       den = alpha * v + (1 - alpha) * den }
              case None =>
                state = if (!hasState) p else alpha * p + (1 - alpha) * state
            }
            hasState = true
            prevUs = us
            if (vIdx.isDefined) { if (den != 0.0) num / den else null } else state
          }
        if (hasState) prevUs = us
        Row.fromSeq(r.toSeq :+ y)
      }
    }(Encoders.row(outSchema))
  }
}
