package graft.queries

import org.apache.spark.sql.functions._

/** Core relational surface: scan/filter/project, joins of every type,
  * grouped aggregation, distinct, set ops, order/limit (incl. QuestDB's
  * negative LIMIT tail semantics).
  *
  * Reference inventory: SURVEY.md §2.1–2.3, §2.6–2.7 — e.g. hash joins
  * (`io/questdb/griffin/engine/join/HashJoinRecordCursorFactory.java`),
  * limits (`engine/LimitRecordCursorFactory.java`). Spark-first: all of
  * these lower to plain DataFrame ops so Catalyst keeps pushdown/pruning;
  * small dimension sides are broadcast explicitly.
  */
object RelationalQueries extends QueryPack {

  def queries: Map[String, Fn] = Map(
    "q1_agg" -> ((s, dir) => {
      import s.implicits._
      table(s, dir, "lineitem")
        .filter($"l_shipdate" <= to_timestamp(lit("2000-12-01 00:00:00")))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sumDec($"l_quantity").as("sum_qty"),
          sumDec($"l_extendedprice").as("sum_base_price"),
          sumDec($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
          sumDec($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")).as("sum_charge"),
          round(avg($"l_quantity"), 4).as("avg_qty"),
          round(avg($"l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    "q_filter_project" -> ((s, dir) => {
      import s.implicits._
      table(s, dir, "lineitem")
        .filter($"l_quantity" > 45 &&
          $"l_shipdate".between(to_timestamp(lit("1997-01-01 00:00:00")), to_timestamp(lit("1998-01-01 00:00:00"))))
        .select($"l_orderkey", $"l_linenumber",
          $"l_extendedprice", upper($"l_returnflag").as("rf"),
          ($"l_extendedprice" * $"l_discount").as("disc_amount"))
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    "q_join_salted" -> ((s, dir) => {
      import s.implicits._
      // skew-salted join: events' low-cardinality event_type is the
      // classic hot-key shape; the salt scatters each key across 8
      // reducers while the per-type aggregate side is replicated 8x.
      // Results must equal the plain join (the oracle is the plain SQL).
      val ev = table(s, dir, "events")
      val dim = ev.groupBy($"event_type").agg(avg($"value").as("type_avg"))
      graft.ops.Salting.saltedJoin(
        ev.select($"event_id", $"event_type", $"value"), dim, Seq("event_type"), 8)
        .filter($"value" > 495.0)
        .select($"event_id", $"event_type", $"value", round($"type_avg", 6).as("type_avg"))
        .orderBy($"event_id")
    }),

    "q_join_bucketed" -> ((s, dir) => {
      import s.implicits._
      // co-located join: both sides pre-bucketed on the join key, so the
      // join itself plans with no Exchange (PlanSpec asserts the shape);
      // at 100 TB the one-off bucketed write amortizes across every
      // subsequent join on the key
      val wh = new java.io.File(System.getProperty("java.io.tmpdir"), "graft-bucketed")
        .getAbsolutePath
      graft.ops.Bucketing.writeBucketed(
        table(s, dir, "orders").select($"o_custkey".as("custkey"), $"o_orderkey", $"o_totalprice"),
        "bkt_orders", Seq("custkey"), 8, Some(s"$wh/orders"))
      graft.ops.Bucketing.writeBucketed(
        table(s, dir, "customer").select($"c_custkey".as("custkey"), $"c_name", $"c_mktsegment"),
        "bkt_customer", Seq("custkey"), 8, Some(s"$wh/customer"))
      graft.ops.Bucketing.colocatedJoin(s, "bkt_orders", "bkt_customer", Seq("custkey"))
        .filter($"o_totalprice" > 450000.0)
        .select($"custkey", $"o_orderkey", $"o_totalprice", $"c_name", $"c_mktsegment")
        .orderBy($"o_orderkey")
    }),

    "q_join_inner" -> ((s, dir) => {
      import s.implicits._
      val o = table(s, dir, "orders")
      val c = table(s, dir, "customer")
      // customer is the small dimension side: broadcast, no shuffle of orders.
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "inner")
        .filter($"o_totalprice" > 450000.0)
        .select($"o_orderkey", $"c_name", $"c_mktsegment", $"o_totalprice")
        .orderBy($"o_orderkey")
    }),

    "q_join_left" -> ((s, dir) => {
      import s.implicits._
      val c = table(s, dir, "customer")
      val o = table(s, dir, "orders").filter($"o_totalprice" > 480000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .select($"c_custkey", $"c_name", $"o_orderkey", $"o_totalprice")
        .orderBy($"c_custkey".asc, $"o_orderkey".asc_nulls_first)
    }),

    "q_join_right" -> ((s, dir) => {
      import s.implicits._
      val o = table(s, dir, "orders").filter($"o_totalprice" > 480000.0)
      val c = table(s, dir, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"), "right")
        .select($"c_custkey", $"c_name", $"o_orderkey", $"o_totalprice")
        .orderBy($"c_custkey".asc, $"o_orderkey".asc_nulls_first)
    }),

    "q_join_full" -> ((s, dir) => {
      import s.implicits._
      // Suppliers vs high-balance customers on nationkey slices — both
      // sides produce unmatched rows.
      val sup = table(s, dir, "supplier").filter($"s_nationkey" < 12)
        .groupBy($"s_nationkey").agg(count(lit(1)).as("n_suppliers"))
      val cust = table(s, dir, "customer").filter($"c_nationkey" >= 8)
        .groupBy($"c_nationkey").agg(count(lit(1)).as("n_customers"))
      sup.join(cust, sup("s_nationkey") === cust("c_nationkey"), "full")
        .select($"s_nationkey", $"c_nationkey", $"n_suppliers", $"n_customers")
        .orderBy($"s_nationkey".asc_nulls_first, $"c_nationkey".asc_nulls_first)
    }),

    "q_join_cross" -> ((s, dir) => {
      import s.implicits._
      val r = table(s, dir, "region")
      val n = table(s, dir, "nation")
      r.crossJoin(n)
        .select($"r_name", $"n_name", ($"r_regionkey" * lit(100) + $"n_nationkey").as("pair_id"))
        .orderBy($"pair_id")
    }),

    "q_join_semi" -> ((s, dir) => {
      import s.implicits._
      val c = table(s, dir, "customer")
      val big = table(s, dir, "orders").filter($"o_totalprice" > 470000.0)
      c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
        .select($"c_custkey", $"c_name", $"c_acctbal")
        .orderBy($"c_custkey")
    }),

    "q_join_anti" -> ((s, dir) => {
      import s.implicits._
      val c = table(s, dir, "customer")
      val big = table(s, dir, "orders").filter($"o_totalprice" > 400000.0)
      c.join(big, c("c_custkey") === big("o_custkey"), "left_anti")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    }),

    "q_distinct" -> ((s, dir) => {
      import s.implicits._
      table(s, dir, "customer")
        .select($"c_mktsegment", $"c_nationkey")
        .distinct()
        .orderBy($"c_mktsegment", $"c_nationkey")
    }),

    "q_union_all" -> ((s, dir) => {
      import s.implicits._
      val c = table(s, dir, "customer").select($"c_nationkey".as("nationkey"), lit("customer").as("src"))
      val sup = table(s, dir, "supplier").select($"s_nationkey".as("nationkey"), lit("supplier").as("src"))
      c.unionByName(sup)
        .groupBy($"nationkey", $"src").agg(count(lit(1)).as("n"))
        .orderBy($"nationkey", $"src")
    }),

    "q_union_distinct" -> ((s, dir) => {
      import s.implicits._
      val c = table(s, dir, "customer").select($"c_nationkey".as("nationkey"))
      val sup = table(s, dir, "supplier").select($"s_nationkey".as("nationkey"))
      c.union(sup).distinct().orderBy($"nationkey")
    }),

    "q_intersect" -> ((s, dir) => {
      import s.implicits._
      val hi = table(s, dir, "customer").filter($"c_acctbal" > 8000.0).select($"c_nationkey".as("nationkey"))
      val sup = table(s, dir, "supplier").filter($"s_acctbal" > 5000.0).select($"s_nationkey".as("nationkey"))
      hi.intersect(sup).orderBy($"nationkey")
    }),

    "q_except" -> ((s, dir) => {
      import s.implicits._
      val c = table(s, dir, "customer").select($"c_nationkey".as("nationkey"))
      val sup = table(s, dir, "supplier").filter($"s_acctbal" > 7000.0).select($"s_nationkey".as("nationkey"))
      c.except(sup).orderBy($"nationkey")
    }),

    "q_orderby_limit" -> ((s, dir) => {
      import s.implicits._
      // TakeOrderedAndProject: per-partition top-k then merge — no full sort.
      table(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"o_orderpriority")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        .limit(15)
    }),

    "q_limit_negative" -> ((s, dir) => {
      import s.implicits._
      // QuestDB `LIMIT -10`: last 10 rows in designated-ts order
      // (engine/LimitRecordCursorFactory.java:336-377). Lowered to a
      // reverse top-k (no full sort, no count pre-pass) then re-sorted.
      graft.ops.Limits.tail(
        graft.Tables.events(s, dir), 10,
        Seq($"ts", $"event_id"))
        .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    })
  )

  def oracles: Map[String, String] = Map(
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sumDecSql("l_quantity")} AS sum_qty,
         |  ${sumDecSql("l_extendedprice")} AS sum_base_price,
         |  ${sumDecSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |  ${sumDecSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
         |  round(avg(l_quantity), 4) AS avg_qty,
         |  round(avg(l_discount), 6) AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice,
        |  upper(l_returnflag) AS rf,
        |  l_extendedprice * l_discount AS disc_amount
        |FROM lineitem
        |WHERE l_quantity > 45
        |  AND l_shipdate BETWEEN TIMESTAMP '1997-01-01 00:00:00' AND TIMESTAMP '1998-01-01 00:00:00'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_join_salted" ->
      """WITH d AS (SELECT event_type, avg(value) AS type_avg FROM events GROUP BY event_type)
        |SELECT e.event_id, e.event_type, e.value, round(d.type_avg, 6) AS type_avg
        |FROM events e JOIN d ON e.event_type = d.event_type
        |WHERE e.value > 495.0
        |ORDER BY e.event_id""".stripMargin,

    "q_join_bucketed" ->
      """SELECT o_custkey AS custkey, o_orderkey, o_totalprice, c_name, c_mktsegment
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_totalprice > 450000.0
        |ORDER BY o_orderkey""".stripMargin,

    "q_join_inner" ->
      """SELECT o_orderkey, c_name, c_mktsegment, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_totalprice > 450000.0
        |ORDER BY o_orderkey""".stripMargin,

    "q_join_left" ->
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 480000.0) o
        |  ON c_custkey = o.o_custkey
        |ORDER BY c_custkey ASC, o_orderkey ASC NULLS FIRST""".stripMargin,

    "q_join_right" ->
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM (SELECT * FROM orders WHERE o_totalprice > 480000.0) o
        |RIGHT JOIN customer ON o.o_custkey = c_custkey
        |ORDER BY c_custkey ASC, o_orderkey ASC NULLS FIRST""".stripMargin,

    "q_join_full" ->
      """SELECT s_nationkey, c_nationkey, n_suppliers, n_customers
        |FROM (SELECT s_nationkey, count(*) AS n_suppliers FROM supplier WHERE s_nationkey < 12 GROUP BY s_nationkey) s
        |FULL JOIN (SELECT c_nationkey, count(*) AS n_customers FROM customer WHERE c_nationkey >= 8 GROUP BY c_nationkey) c
        |  ON s_nationkey = c_nationkey
        |ORDER BY s_nationkey ASC NULLS FIRST, c_nationkey ASC NULLS FIRST""".stripMargin,

    "q_join_cross" ->
      """SELECT r_name, n_name, r_regionkey * 100 + n_nationkey AS pair_id
        |FROM region CROSS JOIN nation
        |ORDER BY pair_id""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 470000.0)
        |ORDER BY c_custkey""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,

    "q_distinct" ->
      """SELECT DISTINCT c_mktsegment, c_nationkey
        |FROM customer
        |ORDER BY c_mktsegment, c_nationkey""".stripMargin,

    "q_union_all" ->
      """SELECT nationkey, src, count(*) AS n FROM (
        |  SELECT c_nationkey AS nationkey, 'customer' AS src FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nationkey, 'supplier' AS src FROM supplier
        |) GROUP BY nationkey, src ORDER BY nationkey, src""".stripMargin,

    "q_union_distinct" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "q_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 8000.0
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 5000.0
        |ORDER BY nationkey""".stripMargin,

    "q_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT
        |SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 7000.0
        |ORDER BY nationkey""".stripMargin,

    "q_orderby_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 15""".stripMargin,

    "q_limit_negative" ->
      """SELECT event_id, ts, user_id, event_type, value FROM (
        |  SELECT * FROM events ORDER BY ts DESC, event_id DESC LIMIT 10
        |) ORDER BY ts, event_id""".stripMargin
  )
}
