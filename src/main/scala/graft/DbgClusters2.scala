package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-round timing of the clusters() fixpoint + variant experiments. */
object DbgClusters2 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"  $label%-26s ${(System.nanoTime() - t0) / 1e9}%7.3f s"); a
    }
    try SparkEntry.queries("q1_agg")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => }
    val docs = Tables.load(spark, dir, "documents")
    val pairs = graft.pipeline.Dedup.minhashCandidates(docs, "doc_id", "text", 3, 8, 4, words = true)

    def runLoop(tag: String): Unit = {
      println(s"== $tag")
      val e0 = t("persist e0") { val e = pairs.select(col("a").as("src"), col("b").as("dst")).persist(); e.count(); e }
      val edges = t("edges distinct") { val e = e0.union(e0.select(col("dst").as("src"), col("src").as("dst"))).distinct().persist(); e.count(); e }
      var labels = t("init labels") {
        edges.groupBy(col("src"))
          .agg(least(col("src"), min(col("dst"))).as("lbl"))
          .select(col("src").as("node"), col("lbl"))
          .localCheckpoint(true)
      }
      var converged = false
      var it = 0
      while (!converged && it < 25) {
        val prev = labels
        val nbrMin = edges
          .join(prev.select(col("node").as("dst"), col("lbl").as("dlbl")), Seq("dst"))
          .groupBy(col("src").as("node"))
          .agg(min(col("dlbl")).as("nmin"))
        val next = t(s"round $it checkpoint") {
          prev.join(nbrMin, Seq("node"), "left")
            .select(col("node"),
              least(col("lbl"), coalesce(col("nmin"), col("lbl"))).as("lbl"),
              (col("nmin").isNotNull && col("nmin") < col("lbl")).as("chg"))
            .localCheckpoint(true)
        }
        converged = t(s"round $it isEmpty") { next.filter(col("chg")).isEmpty }
        labels = next.select("node", "lbl")
        it += 1
      }
      println(s"  rounds=$it")
      t("final noop") {
        labels.write.format("noop").mode("overwrite").save()
      }
      edges.unpersist(); e0.unpersist()
    }
    runLoop("pass1")
    runLoop("pass2")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    runLoop("pass3 parallelismFirst=false")
    runLoop("pass4 parallelismFirst=false")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    runLoop("pass5 pf=false sp=4")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
    spark.stop()
  }
}
