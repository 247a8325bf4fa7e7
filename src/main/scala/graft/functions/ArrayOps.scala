package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** N-dim array operations (reference `functions/array/` over the ARRAY
  * column type, ≤32 dims — `cairo/ColumnType.java:108`; transpose,
  * matmul, elementwise stats). 2-D is `array<array<double>>`, 3-D adds
  * a leading batch axis (`array<array<array<double>>>` — the reference's
  * order-book-over-time shape). All lambda-expression lowerings (no
  * UDFs) so they evaluate per-row inside the scan; the 3-D forms reuse
  * the 2-D bodies under a `transform`/`zip_with` over the batch axis,
  * which is how deeper dims compose too.
  */
object ArrayOps {

  private def transposeBody(m: String): String =
    s"""transform(sequence(1, size(element_at($m, 1))),
       |  j -> transform($m, row -> element_at(row, CAST(j AS INT))))""".stripMargin

  private def matmulBody(a: String, b: String): String =
    s"""transform($a, arow ->
       |  transform(sequence(1, size(element_at($b, 1))), j ->
       |    aggregate(
       |      zip_with(arow, transform($b, brow -> element_at(brow, CAST(j AS INT))),
       |               (x, y) -> x * y),
       |      0D, (acc, v) -> acc + v)))""".stripMargin

  /** Transpose a 2-D array column (rows must be rectangular). */
  def transpose(m: String): Column = expr(transposeBody(m))

  /** Matrix multiply two 2-D array columns: (n×k) · (k×m). */
  def matmul(a: String, b: String): Column = expr(matmulBody(a, b))

  /** Transpose each matrix of a 3-D array (batch of 2-D): axes (1,3,2). */
  def transpose3(a: String): Column =
    expr(s"transform($a, m3 -> ${transposeBody("m3")})")

  /** Batched matrix multiply of two 3-D arrays: per batch index,
    * (n×k) · (k×m) — the shape a per-timestamp order-book transform
    * takes at scale (one lambda per row, no shuffle).
    */
  def matmul3(a: String, b: String): Column =
    expr(s"zip_with($a, $b, (ma, mb) -> ${matmulBody("ma", "mb")})")

  /** Shape of a (rectangular) 3-D array as [d1, d2, d3]. */
  def shape3(a: String): Column =
    expr(s"array(size($a), size(element_at($a, 1)), size(element_at(element_at($a, 1), 1)))")

  /** Sum of every element of a 3-D array. */
  def sumAll3(a: String): Column =
    expr(s"aggregate(flatten(flatten($a)), 0D, (acc, v) -> acc + v)")

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
