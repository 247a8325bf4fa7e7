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

  // ---- general N-dim tensors (beyond the nested 1-3-D forms above) ---------
  //
  // The reference stores N-D arrays (≤32 dims, cairo/ColumnType.java:108)
  // as a flat vector plus shape/strides; the Spark-native mirror is a
  // struct<shape: array<int>, data: array<double>> column with row-major
  // flat data. Axis count is a call-site constant (like the reference's
  // typed columns), so index arithmetic unrolls into plain codegen'd
  // integer expressions inside transform() lambdas — per-row, no shuffle,
  // no UDF. Shape values stay dynamic.

  /** Pack flat row-major `data` with `shape` into an N-D tensor value. */
  def ndMake(data: Column, shape: Column): Column =
    struct(shape.cast("array<int>").as("shape"), data.cast("array<double>").as("data"))

  def ndShape(nd: Column): Column = nd.getField("shape")
  def ndData(nd: Column): Column = nd.getField("data")

  /** Total element count: product of dims. */
  def ndSize(nd: Column): Column =
    aggregate(ndShape(nd), lit(1L), (acc, d) => acc * d.cast("long"))

  /** Shape rendered `d1xd2x...` (handy for compact assertions). */
  def ndShapeStr(nd: Column): Column = array_join(ndShape(nd), "x")

  private def ndDim(nd: Column, i: Int): Column = element_at(ndShape(nd), i + 1)

  /** Integral division — Column./ is double division, which would turn
    * flat-index decomposition fractional.
    */
  private def ldiv(a: Column, b: Column): Column = floor(a / b).cast("long")

  /** Row-major stride of axis `i` given `n` total axes. */
  private def ndStride(nd: Column, i: Int, n: Int): Column =
    (i + 1 until n).map(j => ndDim(nd, j).cast("long")).foldLeft(lit(1L))(_ * _)

  /** Element at 0-based indices (one per axis). */
  def ndGet(nd: Column, idx: Seq[Column]): Column = {
    val n = idx.length
    val flat = idx.zipWithIndex.map { case (ix, i) => ix.cast("long") * ndStride(nd, i, n) }
      .reduce(_ + _)
    element_at(ndData(nd), (flat + 1).cast("int"))
  }

  /** General axis permutation: new axis `i` takes old axis `perm(i)`.
    * `ndTranspose(t, Seq(1, 0))` is the 2-D transpose; reversing the
    * axes matches the reference's full transpose.
    */
  def ndTranspose(nd: Column, perm: Seq[Int]): Column = {
    val n = perm.length
    val newShape = array(perm.map(p => ndDim(nd, p)): _*)
    // new strides, in terms of the permuted dims
    def newStride(i: Int): Column =
      (i + 1 until n).map(j => ndDim(nd, perm(j)).cast("long")).foldLeft(lit(1L))(_ * _)
    val data = transform(sequence(lit(0L), ndSize(nd) - 1), f => {
      // decompose the new flat index, recompose against the old strides
      val oldFlat = (0 until n).map { i =>
        val newIdx = ldiv(f, newStride(i)) % ndDim(nd, perm(i)).cast("long")
        newIdx * ndStride(nd, perm(i), n)
      }.reduce(_ + _)
      element_at(ndData(nd), (oldFlat + 1).cast("int"))
    })
    struct(newShape.cast("array<int>").as("shape"), data.as("data"))
  }

  /** Drop `axis` by fixing it at `index` (0-based): shape loses one dim. */
  def ndSlice(nd: Column, axis: Int, ndims: Int, index: Column): Column = {
    val keep = (0 until ndims).filterNot(_ == axis)
    val newShape = array(keep.map(p => ndDim(nd, p)): _*)
    def outStride(i: Int): Column = // stride of the i-th kept axis in the output
      (i + 1 until keep.length).map(j => ndDim(nd, keep(j)).cast("long")).foldLeft(lit(1L))(_ * _)
    val outSize = keep.map(p => ndDim(nd, p).cast("long")).foldLeft(lit(1L))(_ * _)
    val data = transform(sequence(lit(0L), outSize - 1), f => {
      val fromKept = keep.zipWithIndex.map { case (p, i) =>
        (ldiv(f, outStride(i)) % ndDim(nd, p).cast("long")) * ndStride(nd, p, ndims)
      }.reduce(_ + _)
      val oldFlat = fromKept + index.cast("long") * ndStride(nd, axis, ndims)
      element_at(ndData(nd), (oldFlat + 1).cast("int"))
    })
    struct(newShape.cast("array<int>").as("shape"), data.as("data"))
  }

  /** Reassign the shape (row-major data unchanged); null when the new
    * shape's element count doesn't match (reference errors — null keeps
    * the column expression total, the dialect can `coalesce` a guard).
    */
  def ndReshape(nd: Column, newShape: Column): Column = {
    val ns = newShape.cast("array<int>")
    val ok = aggregate(ns, lit(1L), (a, d) => a * d.cast("long")) === ndSize(nd)
    when(ok, struct(ns.as("shape"), ndData(nd).as("data")))
  }

  /** Sum of every element. */
  def ndSum(nd: Column): Column =
    aggregate(ndData(nd), lit(0.0), (acc, v) => acc + v)
}
