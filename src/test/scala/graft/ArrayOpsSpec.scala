package graft

import graft.functions.ArrayOps
import org.apache.spark.sql.functions._

class ArrayOpsSpec extends SparkSpec {
  import spark.implicits._

  private val m = Seq((1, Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)), Seq(Seq(5.0, 6.0), Seq(7.0, 8.0))))
    .toDF("id", "a", "b")

  test("transpose") {
    val t = m.select(ArrayOps.transpose("a")).head().getSeq[Seq[Double]](0)
    assert(t == Seq(Seq(1.0, 3.0), Seq(2.0, 4.0)))
  }

  test("matmul 2x2") {
    val p = m.select(ArrayOps.matmul("a", "b")).head().getSeq[Seq[Double]](0)
    assert(p == Seq(Seq(19.0, 22.0), Seq(43.0, 50.0)))
  }

  test("dot / norm / avg on embeddings table") {
    val e = Tables.load(spark, sfDir, "embeddings").limit(10)
    val r = e.select(
      ArrayOps.dot("embedding", "embedding").as("d"),
      ArrayOps.l2Norm("embedding").as("n"),
      ArrayOps.arrayAvg("embedding").as("avg")).collect()
    r.foreach { row =>
      assert(math.abs(row.getDouble(0) - row.getDouble(1) * row.getDouble(1)) < 1e-6)
      assert(!row.isNullAt(2))
    }
  }

  test("scale") {
    val s = Seq(Tuple1(Seq(1.0, -2.0))).toDF("a").select(ArrayOps.scale("a", 3.0))
      .head().getSeq[Double](0)
    assert(s == Seq(3.0, -6.0))
  }

  test("3-D: batched matmul, per-batch transpose, shape, flatten-sum") {
    // two batches: A = [[1,2],[3,4]], B = [[5,6],[7,8]]
    val t3 = Seq(Tuple1(Seq(Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)),
      Seq(Seq(5.0, 6.0), Seq(7.0, 8.0))))).toDF("t")
    val r = t3.select(
      ArrayOps.matmul3("t", "t").as("mm"),
      ArrayOps.transpose3("t").as("tr"),
      ArrayOps.shape3("t").as("sh"),
      ArrayOps.sumAll3("t").as("s")).head()
    import scala.collection.{Seq => CSeq}
    val mm = r.getSeq[CSeq[CSeq[Double]]](0)
    assert(mm(0) == Seq(Seq(7.0, 10.0), Seq(15.0, 22.0)))    // A·A
    assert(mm(1) == Seq(Seq(67.0, 78.0), Seq(91.0, 106.0)))  // B·B
    val tr = r.getSeq[CSeq[CSeq[Double]]](1)
    assert(tr(0) == Seq(Seq(1.0, 3.0), Seq(2.0, 4.0)))
    assert(tr(1) == Seq(Seq(5.0, 7.0), Seq(6.0, 8.0)))
    assert(r.getSeq[Int](2) == Seq(2, 2, 2))
    assert(r.getDouble(3) == 36.0)
  }

  test("N-D tensors: 5-D get/transpose/slice/reshape round-trip") {
    import ArrayOps._
    val df = Seq(1).toDF("one")
      .withColumn("t", ndMake(transform(sequence(lit(0), lit(31)), i => i.cast("double")),
        array(Seq.fill(5)(lit(2)): _*)))
    val t = col("t")
    val rev = ndTranspose(t, Seq(4, 3, 2, 1, 0))
    val r = df.select(
      ndShapeStr(t).as("s"),
      ndGet(t, Seq(1, 0, 1, 1, 0).map(lit)).as("g"), // flat 16+4+2 = 22
      ndGet(rev, Seq(0, 1, 1, 0, 1).map(lit)).as("gt"), // the same element, axes reversed
      ndSum(ndSlice(t, 2, 5, lit(1))).as("ssum"), // 16 elements with axis2 fixed = 1
      ndShapeStr(ndTranspose(t, Seq(1, 0, 2, 3, 4))).as("st"),
      ndGet(ndReshape(t, array(lit(8), lit(4))), Seq(lit(5), lit(2))).as("rr"),
      ndSize(t).as("n"),
      ndReshape(t, array(lit(3), lit(11))).isNull.as("bad")).head()
    assert(r.getString(0) == "2x2x2x2x2")
    assert(r.getDouble(1) == 22.0 && r.getDouble(2) == 22.0)
    assert(r.getDouble(3) == 280.0)
    assert(r.getString(4) == "2x2x2x2x2")
    assert(r.getDouble(5) == 22.0)
    assert(r.getLong(6) == 32L && r.getBoolean(7))
  }
}
