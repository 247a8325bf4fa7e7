package graft

import org.apache.spark.sql.functions._

/** Stage-level dissection of q_dedup_clusters: times candidate-pair
  * generation vs the label-propagation fixpoint vs the final join, and
  * reports how many propagation rounds sf0.1 actually needs.
  */
object DbgClusters {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s"); a
    }
    // warm
    try SparkEntry.queries("q1_agg")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => }
    for (_ <- 1 to 2) {
      val docs = Tables.load(spark, dir, "documents")
      val pairs = graft.pipeline.Dedup.minhashCandidates(docs, "doc_id", "text", 3, 8, 4, words = true)
      val mat = t("candidates (noop)") {
        pairs.write.format("noop").mode("overwrite").save(); pairs
      }
      val cl = t("clusters fixpoint") {
        val c = graft.pipeline.Dedup.clusters(mat)
        c.write.format("noop").mode("overwrite").save(); c
      }
      t("full query (noop)") {
        SparkEntry.queries("q_dedup_clusters")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      println("pairs=" + mat.count() + " nodes=" + cl.count())
    }
    spark.stop()
  }
}
