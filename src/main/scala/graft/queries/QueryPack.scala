package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A named group of driver-checkable queries.
  *
  * Contract (see `graft.SparkEntry`): every entry in [[queries]] runs on
  * an sf directory of parquet tables; entries that also appear in
  * [[oracles]] must produce byte-identical results to the DuckDB SQL when
  * both are sorted the same way. Conventions that make hash-compare
  * robust across engines:
  *
  *   - every query ends in a total-order `ORDER BY` (same on both sides;
  *     nulls position spelled out explicitly — Spark defaults NULLS FIRST
  *     on ASC while DuckDB defaults NULLS LAST);
  *   - double aggregates whose value depends on summation order are
  *     either computed exactly (sum over `decimal`) or rounded;
  *   - column names are aliased identically on both sides.
  */
trait QueryPack {
  type Fn = (SparkSession, String) => DataFrame
  def queries: Map[String, Fn]
  def oracles: Map[String, String]

  // ---- shared helpers ----------------------------------------------------

  protected def table(s: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.load(s, dir, name)

  /** Order-independent exact sum of a money-like double expression:
    * per-row cast to decimal is deterministic across engines *as long as
    * the scale covers the value's exact decimal expansion* (2-decimal
    * inputs multiplied ≤3 times → ≤6 decimals; at a covering scale there
    * is no rounding, so no engine-specific tie-breaking), then
    * integer-exact decimal addition.
    *
    * The final double is rounded at 4 decimals: a sum of magnitude M has
    * double resolution ~M·2⁻⁵², and engines' `round` disagree when the
    * quantum approaches that resolution (seen at sf0.1 where M≈4e9 made
    * a 6-dp round flap) — 4 dp keeps a ≥100× margin through sf1.
    */
  protected def sumDec(c: Column): Column = {
    // Per-row: exact 6-dp scaling in pure double arithmetic. A double→
    // decimal Cast (and Round on doubles) goes through BigDecimal.valueOf
    // = a per-row Double.toString — it dominated q1_agg's runtime. The
    // 6-dp-exact input means x*1e6 is within ~1e-9 of an integer, so
    // half-away-from-zero via floor(|x|+0.5) recovers it exactly, all
    // inside whole-stage codegen.
    val scaled = when(c >= 0, floor(c * 1e6 + 0.5))
      .otherwise(-floor(-c * 1e6 + 0.5)).cast("long")
    // Final (per output row, not per input row): exact decimal division,
    // then the same single decimal→double rounding the oracle performs.
    // Long-sum bound: |Σx| < 2⁶³/10⁶ ≈ 9.2e12 — covers ~sf50 money sums;
    // beyond that, widen to the decimal-cast sum.
    round((sum(scaled).cast("decimal(28,0)") / lit(1000000L)).cast("double"), 4)
  }

  /** DuckDB-side twin of [[sumDec]]. */
  protected def sumDecSql(e: String): String =
    s"round(CAST(sum(CAST($e AS DECIMAL(24,6))) AS DOUBLE), 4)"
}
