package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Arbitrary-stride timestamp arithmetic (reference
  * `functions/date/TimestampFloorFunctionFactory`,
  * `TimestampCeilFunctionFactory`, `DateAddFunctionFactory`,
  * `DateDiffFunctionFactory`): micro-epoch arithmetic, codegen-friendly,
  * no UDFs.
  */
object TimeFns {

  /** timestamp_floor('5m', ts) — floor to an arbitrary micro stride. */
  def timestampFloor(strideMicros: Long, ts: Column): Column =
    timestamp_micros((unix_micros(ts) - pmod(unix_micros(ts), lit(strideMicros))).cast("long"))

  /** timestamp_ceil('5m', ts) — exclusive ceiling (identity on bucket
    * boundaries, next boundary otherwise).
    */
  def timestampCeil(strideMicros: Long, ts: Column): Column = {
    val us = unix_micros(ts)
    val rem = pmod(us, lit(strideMicros))
    timestamp_micros(when(rem === 0, us).otherwise(us - rem + lit(strideMicros)).cast("long"))
  }

  private val unitMicros = Map(
    "s" -> 1000000L, "m" -> 60000000L, "h" -> 3600000000L,
    "d" -> 86400000000L, "w" -> 7L * 86400000000L)

  /** dateadd('h', n, ts) for fixed-width units; months/years go through
    * calendar arithmetic.
    */
  def dateAdd(unit: String, n: Int, ts: Column): Column = unit match {
    // calendar interval keeps the time-of-day and clamps month ends
    // (add_months would truncate to a date)
    case "M" => ts + expr(s"INTERVAL $n MONTH")
    case "y" => ts + expr(s"INTERVAL $n YEAR")
    case u => timestamp_micros((unix_micros(ts) + lit(n * unitMicros(u))).cast("long"))
  }

  /** datediff('m', a, b) — boundary-crossing count (truncate both to the
    * unit, then diff), matching the reference and DuckDB `date_diff`.
    */
  def dateDiff(unit: String, a: Column, b: Column): Column = {
    val u = unitMicros(unit)
    (floor(unix_micros(b) / lit(u)) - floor(unix_micros(a) / lit(u))).cast("long")
  }
}
