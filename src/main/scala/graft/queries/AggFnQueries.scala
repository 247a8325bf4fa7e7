package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Aggregators

/** Aggregate-function breadth (SURVEY §2.4 — the reference's 449
  * group-by functions). Spark built-ins cover most; ksum/nsum/vwap/twap
  * are custom (graft.functions.Aggregators). Definition deltas handled
  * in the oracle: DuckDB's skewness/kurtosis are sample-corrected while
  * Spark's (and QuestDB's default) are population moments, so those
  * oracles compute moments explicitly.
  */
object AggFnQueries extends QueryPack {

  def queries: Map[String, Fn] = Map(
    "q_agg_stats" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          round(stddev_samp(col("value")), 6).as("sd_samp"),
          round(stddev_pop(col("value")), 6).as("sd_pop"),
          round(var_samp(col("value")), 6).as("v_samp"),
          round(var_pop(col("value")), 6).as("v_pop"),
          round(corr(col("value"), col("user_id").cast("double")), 6).as("corr_vu"),
          round(covar_samp(col("value"), col("user_id").cast("double")), 6).as("cov_s"),
          round(covar_pop(col("value"), col("user_id").cast("double")), 6).as("cov_p"))
        .orderBy(col("event_type"))
    }),

    "q_agg_moments" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          round(skewness(col("value")), 6).as("skew"),
          round(kurtosis(col("value")), 6).as("kurt"))
        .orderBy(col("event_type"))
    }),

    "q_agg_minmax_by" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          max_by(col("event_id"), struct(col("value"), col("event_id"))).as("id_of_max"),
          min_by(col("event_id"), struct(col("value"), col("event_id"))).as("id_of_min"),
          max(col("value")).as("max_v"),
          min(col("value")).as("min_v"))
        .orderBy(col("event_type"))
    }),

    "q_agg_first_last" -> ((s, dir) => {
      // QuestDB first()/last() = by designated-ts order → min_by/max_by(ts)
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(
          min_by(col("value"), struct(col("ts"), col("event_id"))).as("first_v"),
          max_by(col("value"), struct(col("ts"), col("event_id"))).as("last_v"),
          min(col("ts")).as("first_ts"),
          max(col("ts")).as("last_ts"))
        .orderBy(col("user_id"))
    }),

    "q_agg_count_distinct" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          countDistinct(col("user_id")).as("n_users"),
          count(col("value")).as("n"),
          countDistinct(col("user_id"), col("event_id")).as("n_pairs"))
        .orderBy(col("event_type"))
    }),

    "q_agg_heavy_hitters" -> ((s, dir) => {
      // Misra-Gries heavy hitters in the exact regime (capacity >= NDV:
      // nothing evicted, err = 0, counts equal GROUP BY) — the sketch
      // itself is bounded-memory and mergeable for unbounded-cardinality
      // corpora (see HeavyHittersSpec for the approximate-bound tests)
      Tables.events(s, dir)
        .agg(graft.functions.HeavyHitters.heavyHitters(col("event_type"), 5, 64).as("hh"))
        .select(explode(col("hh")).as("h"))
        .select(col("h.item").as("item"), col("h.cnt").as("cnt"), col("h.err").as("err"))
        .orderBy(desc("cnt"), col("item"))
    }),

    "q_agg_approx" -> ((s, dir) => {
      // HLL / t-digest sketches differ across engines, so the oracle
      // checks the *contract* instead of the bits: the sketch must land
      // within its advertised error of the exact answer (computed here
      // alongside), and the exact answers hash-match DuckDB directly.
      val ev = Tables.events(s, dir)
      // exact distinct on a narrow pre-distinct projection (no Expand
      // plan from mixing distinct + non-distinct aggregates), joined to
      // the single-pass sketch aggregation on the 5-row group key
      val exactUsers = ev.select(col("event_type"), col("user_id")).distinct()
        .groupBy(col("event_type")).agg(count(lit(1)).as("exact_users"))
      ev.groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.5)"), 6).as("exact_median"),
          // graft's own sketches (Aggregators.HyperLogLog / ApproxPercentile),
          // mirroring the reference's HLL + HdrHistogram implementations
          Aggregators.approxCountDistinct(col("user_id")).as("approx_users"),
          Aggregators.approxPercentile(col("value"), 0.5).as("approx_median"))
        .join(broadcast(exactUsers), Seq("event_type"))
        .select(
          col("event_type"), col("exact_users"), col("exact_median"),
          (abs(col("approx_users") - col("exact_users")) <=
            greatest(lit(1.0), col("exact_users") * 0.03)).as("hll_within_3pct"),
          (abs(col("approx_median") - col("exact_median")) <=
            greatest(lit(0.5), abs(col("exact_median")) * 0.02)).as("median_within_2pct"))
        .orderBy(col("event_type"))
    }),

    "q_agg_percentile" -> ((s, dir) => {
      // exact continuous percentile (linear interpolation) — same
      // definition as DuckDB quantile_cont
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.5)"), 6).as("p50"),
          round(expr("percentile(value, 0.9)"), 6).as("p90"),
          round(expr("percentile(value, 0.99)"), 6).as("p99"))
        .orderBy(col("event_type"))
    }),

    "q_agg_bool_bit" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          bool_and(col("value") > 0.0).as("all_pos"),
          bool_or(col("value") > 480.0).as("any_huge"),
          bit_and(col("user_id")).as("band"),
          bit_or(col("user_id")).as("bor"),
          bit_xor(col("user_id")).as("bxor"))
        .orderBy(col("event_type"))
    }),

    "q_agg_collect" -> ((s, dir) => {
      Tables.events(s, dir).filter(col("user_id") < 5)
        .groupBy(col("user_id"))
        .agg(
          array_join(array_sort(collect_list(col("event_type"))), ",").as("types_csv"),
          // arrays crash the driver's pandas hash-comparator → serialize
          array_join(array_sort(collect_set(col("event_type"))), ",").as("distinct_types"),
          count(lit(1)).as("n"))
        .orderBy(col("user_id"))
    }),

    "q_agg_ksum" -> ((s, dir) => {
      // Kahan/Neumaier compensated sums are within ~2 ulp of the exact
      // sum, so round(·,6) makes them hash-comparable to the oracle's
      // integer-exact decimal sum.
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          round(Aggregators.ksum(col("value")), 6).as("ksum_v"),
          round(Aggregators.nsum(col("value")), 6).as("nsum_v"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }),

    "q_agg_vwap" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          // decimal→double of a >2^53 mantissa can differ 1 ulp across
          // engines → round the final quotient
          round(Aggregators.vwap(col("l_extendedprice"), col("l_quantity")), 6).as("vwap"),
          sumDec(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }),

    "q_agg_twap" -> ((s, dir) => {
      // time-weighted average price per user: each value holds until the
      // next event (lead(ts) window supplies the holding interval)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc)
      Tables.events(s, dir).filter(col("user_id") < 30)
        .withColumn("next_ts", lead(col("ts"), 1).over(w))
        .filter(col("next_ts").isNotNull)
        .withColumn("w_us", unix_micros(col("next_ts")) - unix_micros(col("ts")))
        .groupBy(col("user_id"))
        // decimal→double of a >2^53 mantissa can differ 1 ulp across
        // engines → round the final quotient
        .agg(round(Aggregators.timeWeightedAvg(col("value"), col("w_us")), 6).as("twap"))
        .orderBy(col("user_id"))
    }),

    "q_rollup" -> ((s, dir) => {
      Tables.load(s, dir, "orders")
        .rollup(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sumDec(col("o_totalprice")).as("sum_price"))
        .orderBy(col("o_orderpriority").asc_nulls_first, col("o_orderstatus").asc_nulls_first)
    }),

    "q_pivot" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L)
        .orderBy(col("user_id"))
    }),

    "q_agg_string_distinct" -> ((s, dir) => {
      // string_distinct_agg: sorted-unique CSV (reference
      // StringDistinctAggGroupByFunction)
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(array_join(array_sort(collect_set(col("event_type"))), ",").as("types"))
        .orderBy(col("user_id"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q_agg_stats" ->
      """SELECT event_type,
        |  round(stddev_samp(value), 6) AS sd_samp,
        |  round(stddev_pop(value), 6) AS sd_pop,
        |  round(var_samp(value), 6) AS v_samp,
        |  round(var_pop(value), 6) AS v_pop,
        |  round(corr(value, CAST(user_id AS DOUBLE)), 6) AS corr_vu,
        |  round(covar_samp(value, CAST(user_id AS DOUBLE)), 6) AS cov_s,
        |  round(covar_pop(value, CAST(user_id AS DOUBLE)), 6) AS cov_p
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_agg_moments" ->
      """WITH m AS (SELECT event_type, avg(value) AS a FROM events GROUP BY 1)
        |SELECT e.event_type,
        |  round(avg(pow(value - a, 3)) / pow(avg(pow(value - a, 2)), 1.5), 6) AS skew,
        |  round(avg(pow(value - a, 4)) / pow(avg(pow(value - a, 2)), 2) - 3.0, 6) AS kurt
        |FROM events e JOIN m ON e.event_type = m.event_type
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    "q_agg_minmax_by" ->
      """WITH ranked AS (
        |  SELECT event_type, event_id, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id DESC) AS rmax,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value ASC, event_id ASC) AS rmin
        |  FROM events)
        |SELECT event_type,
        |  max(CASE WHEN rmax = 1 THEN event_id END) AS id_of_max,
        |  max(CASE WHEN rmin = 1 THEN event_id END) AS id_of_min,
        |  max(value) AS max_v, min(value) AS min_v
        |FROM ranked GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_agg_first_last" ->
      """WITH ranked AS (
        |  SELECT user_id, ts, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rf,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rl
        |  FROM events)
        |SELECT user_id,
        |  max(CASE WHEN rf = 1 THEN value END) AS first_v,
        |  max(CASE WHEN rl = 1 THEN value END) AS last_v,
        |  min(ts) AS first_ts, max(ts) AS last_ts
        |FROM ranked GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_agg_count_distinct" ->
      """SELECT event_type,
        |  count(DISTINCT user_id) AS n_users,
        |  count(value) AS n,
        |  count(DISTINCT (user_id, event_id)) AS n_pairs
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_agg_percentile" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.9), 6) AS p90,
        |  round(quantile_cont(value, 0.99), 6) AS p99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_agg_bool_bit" ->
      """SELECT event_type,
        |  bool_and(value > 0.0) AS all_pos,
        |  bool_or(value > 480.0) AS any_huge,
        |  bit_and(user_id) AS band,
        |  bit_or(user_id) AS bor,
        |  bit_xor(user_id) AS bxor
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_agg_heavy_hitters" ->
      """SELECT event_type AS item, count(*) AS cnt, CAST(0 AS BIGINT) AS err
        |FROM events GROUP BY event_type
        |ORDER BY cnt DESC, item LIMIT 5""".stripMargin,

    "q_agg_approx" ->
      """SELECT event_type,
        |  count(DISTINCT user_id) AS exact_users,
        |  round(quantile_cont(value, 0.5), 6) AS exact_median,
        |  TRUE AS hll_within_3pct,
        |  TRUE AS median_within_2pct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_agg_collect" ->
      """SELECT user_id,
        |  string_agg(event_type, ',' ORDER BY event_type) AS types_csv,
        |  string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS distinct_types,
        |  count(*) AS n
        |FROM events WHERE user_id < 5
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_agg_ksum" ->
      """SELECT event_type,
        |  round(CAST(sum(CAST(value AS DECIMAL(24,6))) AS DOUBLE), 6) AS ksum_v,
        |  round(CAST(sum(CAST(value AS DECIMAL(24,6))) AS DOUBLE), 6) AS nsum_v,
        |  count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_agg_vwap" ->
      s"""SELECT l_returnflag,
         |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
         |    / CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 6) AS vwap,
         |  ${sumDecSql("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_agg_twap" ->
      """WITH t AS (
        |  SELECT user_id, ts, value,
        |    lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts ASC) AS next_ts
        |  FROM events WHERE user_id < 30)
        |SELECT user_id,
        |  round(CAST(sum(CAST(value AS DECIMAL(12,2)) * CAST(epoch_us(next_ts) - epoch_us(ts) AS DECIMAL(20,0))) AS DOUBLE)
        |    / CAST(sum(CAST(epoch_us(next_ts) - epoch_us(ts) AS DECIMAL(20,0))) AS DOUBLE), 6) AS twap
        |FROM t WHERE next_ts IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_rollup" ->
      s"""SELECT o_orderpriority, o_orderstatus, count(*) AS n,
         |  ${sumDecSql("o_totalprice")} AS sum_price
         |FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
         |ORDER BY o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin,

    "q_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (event_type = 'click') AS click,
        |  count(*) FILTER (event_type = 'error') AS error,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup') AS signup,
        |  count(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_agg_string_distinct" ->
      """SELECT user_id,
        |  string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
