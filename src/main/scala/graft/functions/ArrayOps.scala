package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** N-dim array operations (reference `functions/array/` over the ARRAY
  * column type — transpose, matmul, elementwise stats; 2-D modeled as
  * `array<array<double>>`). All lambda-expression lowerings (no UDFs) so
  * they evaluate per-row inside the scan.
  */
object ArrayOps {

  /** Transpose a 2-D array column (rows must be rectangular). */
  def transpose(m: String): Column =
    expr(s"""transform(sequence(1, size(element_at($m, 1))),
            |  j -> transform($m, row -> element_at(row, CAST(j AS INT))))""".stripMargin)

  /** Matrix multiply two 2-D array columns: (n×k) · (k×m). */
  def matmul(a: String, b: String): Column =
    expr(s"""transform($a, arow ->
            |  transform(sequence(1, size(element_at($b, 1))), j ->
            |    aggregate(
            |      zip_with(arow, transform($b, brow -> element_at(brow, CAST(j AS INT))),
            |               (x, y) -> x * y),
            |      0D, (acc, v) -> acc + v)))""".stripMargin)

  /** Elementwise stats over a 1-D double array. */
  def arrayAvg(a: String): Column =
    expr(s"aggregate($a, 0D, (acc, v) -> acc + v) / size($a)")

  def arraySum(a: String): Column =
    expr(s"aggregate($a, 0D, (acc, v) -> acc + v)")

  /** Dot product of two 1-D arrays (double accumulate). */
  def dot(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)")

  /** L2 norm. */
  def l2Norm(a: String): Column = sqrt(dot(a, a))

  /** Elementwise scalar ops. */
  def scale(a: String, k: Double): Column = expr(s"transform($a, x -> x * $k)")
}
