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
}
