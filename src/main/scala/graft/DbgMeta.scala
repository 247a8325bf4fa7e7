package graft

/** Decompose the pg_catalog / information_schema snapshot rebuild cost
  * (the per-DDL tax every later meta-touching query pays): times each
  * builder DataFrame, each CREATE OR REPLACE VIEW round-trip, and the
  * catalog listings they run.
  */
object DbgMeta {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    Tables.registerAll(spark, dir)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"  $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.3f s"); a
    }
    // warm
    Catalog.ensureMetaViews(spark)
    for (round <- 1 to 3) {
      println(s"== rebuild $round")
      Catalog.invalidateMetaViews(spark)
      t("full ensureMetaViews")(Catalog.ensureMetaViews(spark))
    }
    println("== pieces (warm)")
    t("listTables().collect()")(spark.catalog.listTables().collect())
    t("listFunctions().collect()")(spark.catalog.listFunctions().collect())
    val pc = t("pgClass df")(Catalog.pgClass(spark))
    val pa = t("pgAttribute df")(Catalog.pgAttribute(spark))
    val pp = t("pgProc df")(Catalog.pgProc(spark))
    val it = t("infoTables df")(Catalog.informationSchemaTables(spark))
    val ic = t("infoColumns df")(Catalog.informationSchemaColumns(spark))
    def reg(db: String, name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val n = df.collect().length
      t(s"CREATE VIEW $db.$name ($n rows)") {
        spark.sql(s"CREATE OR REPLACE VIEW $db.$name AS " +
          ("SELECT * FROM VALUES " + df.collect().map(r =>
            r.toSeq.map {
              case null => "NULL"
              case s: String => "'" + s.replace("'", "''") + "'"
              case b: Boolean => if (b) "TRUE" else "FALSE"
              case x => x.toString
            }.mkString("(", ", ", ")")).mkString(", ") +
            s" AS t(${df.schema.fields.map(_.name).mkString(", ")})"))
      }
    }
    // public vs internal function listing — must be identical row sets
    val pub = spark.catalog.listFunctions().collect().toSeq
      .filterNot(_.name.startsWith("__")).map(_.name).sorted
    val internal = t("internal listFunctions") {
      spark.sessionState.catalog.listFunctions("default", "*")
        .map(_._1.funcName).filterNot(_.startsWith("__")).distinct.sorted
    }
    println(s"  pub=${pub.size} internal=${internal.size} equal=${pub == internal}")
    if (pub != internal) {
      println("  only-pub: " + pub.diff(internal).take(10).mkString(","))
      println("  only-int: " + internal.diff(pub).take(10).mkString(","))
    }
    reg("pg_catalog", "pg_class", pc)
    reg("pg_catalog", "pg_attribute", pa)
    reg("pg_catalog", "pg_proc", pp)
    reg("information_schema", "tables", it)
    reg("information_schema", "columns", ic)
    spark.stop()
  }
}
