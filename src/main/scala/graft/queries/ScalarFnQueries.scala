package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Scalar function surface (SURVEY §2.8): date/time, string, regex,
  * math, conditional, cast, json, array — Spark built-ins throughout
  * (codegen'd; no UDFs in these paths). Dialect deltas live in the
  * oracle SQL (e.g. DuckDB dayofweek is 0-based, ceil returns double,
  * double→int casts round instead of truncate).
  */
object ScalarFnQueries extends QueryPack {

  def queries: Map[String, Fn] = Map(
    "q_fn_datetime" -> ((s, dir) => {
      Tables.events(s, dir).filter(col("event_id") < 500)
        .select(
          col("event_id"), col("ts"),
          year(col("ts")).as("y"),
          month(col("ts")).as("mo"),
          dayofmonth(col("ts")).as("d"),
          hour(col("ts")).as("h"),
          minute(col("ts")).as("mi"),
          second(col("ts")).as("sec"),
          dayofweek(col("ts")).as("dow"),
          weekofyear(col("ts")).as("woy"),
          dayofyear(col("ts")).as("doy"),
          date_trunc("day", col("ts")).as("day_ts"),
          date_trunc("month", col("ts")).as("month_ts"),
          (col("ts") + expr("INTERVAL 3 DAYS")).as("plus3d"),
          (col("ts") - expr("INTERVAL 90 MINUTES")).as("minus90m"),
          timestamp_micros(unix_micros(col("ts")) - pmod(unix_micros(col("ts")), lit(300000000L))).as("floor_5m"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm").as("fmt"),
          unix_micros(col("ts")).as("epoch_us"))
        .orderBy(col("event_id"))
    }),

    "q_fn_string" -> ((s, dir) => {
      Tables.load(s, dir, "documents").filter(col("doc_id") < 200)
        .select(
          col("doc_id"),
          length(col("text")).as("len"),
          upper(substring(col("text"), 1, 20)).as("head_upper"),
          lower(col("lang")).as("lang_lower"),
          concat(col("lang"), lit(":"), col("source")).as("tag"),
          lpad(col("lang"), 5, "_").as("lp"),
          rpad(col("source"), 8, ".").as("rp"),
          trim(lit("  pad  ")).as("trimmed"),
          substring(col("text"), 5, 10).as("mid"),
          expr("split_part(text, ' ', 3)").as("word3"),
          instr(col("text"), "data").as("pos_data"),
          regexp_replace(col("text"), "[aeiou]", "").as("novowel_head"),
          md5(col("lang")).as("lang_md5"),
          sha2(col("source"), 256).as("source_sha"),
          reverse(col("lang")).as("gnal"),
          repeat(col("lang"), 3).as("lang3"),
          col("text").startsWith("the").as("starts_the"),
          col("text").contains("query").as("has_query"))
        .withColumn("novowel_head", substring(col("novowel_head"), 1, 30))
        .orderBy(col("doc_id"))
    }),

    "q_fn_math" -> ((s, dir) => {
      Tables.events(s, dir).filter(col("event_id") < 500)
        .select(
          col("event_id"), col("value"),
          abs(col("value") - 250.0).as("dist"),
          ceil(col("value")).as("c"),
          floor(col("value")).as("f"),
          round(col("value"), 1).as("r1"),
          round(sqrt(col("value")), 6).as("sq"),
          round(pow(col("value"), 1.5), 4).as("pw"),
          round(log(col("value") + 1.0), 6).as("lnv"),
          round(log10(col("value") + 1.0), 6).as("l10"),
          round(exp(col("value") / 100.0), 6).as("ex"),
          signum(col("value") - 250.0).cast("int").as("sgn"),
          pmod(col("event_id"), lit(7L)).as("m7"),
          greatest(col("value"), col("user_id").cast("double")).as("g"),
          least(col("value"), col("user_id").cast("double")).as("l"))
        .orderBy(col("event_id"))
    }),

    "q_fn_regex" -> ((s, dir) => {
      Tables.load(s, dir, "documents").filter(col("doc_id") < 200)
        .select(
          col("doc_id"),
          col("text").rlike("qu[ae]ry").as("m_query"),
          regexp_extract(col("text"), "([a-z]+) (join|scan)", 1).as("before_op"),
          regexp_count(col("text"), lit("the")).as("n_the"),
          col("lang").like("e%").as("lang_e"),
          col("source").ilike("SRC%").as("src_i"))
        .orderBy(col("doc_id"))
    }),

    "q_fn_conditional" -> ((s, dir) => {
      Tables.events(s, dir).filter(col("event_id") < 500)
        .select(
          col("event_id"),
          when(col("value") < 100.0, "low")
            .when(col("value") < 400.0, "mid")
            .otherwise("high").as("band"),
          coalesce(nullif(col("event_type"), lit("view")), lit("(hidden)")).as("etype"),
          when(col("user_id") % 2 === 0, col("value")).as("even_value"),
          nvl2(nullif(col("event_type"), lit("view")), lit(1), lit(0)).as("visible"))
        .orderBy(col("event_id"))
    }),

    "q_fn_cast" -> ((s, dir) => {
      Tables.events(s, dir).filter(col("event_id") < 500)
        .select(
          col("event_id"),
          expr("CAST(value AS INT)").as("v_int"), // truncation semantics
          col("value").cast("string").as("v_str"),
          col("user_id").cast("double").as("u_dbl"),
          col("user_id").cast("string").as("u_str"),
          concat(lit("id_"), col("event_id").cast("string")).as("tag"),
          col("ts").cast("date").cast("string").as("d_str"),
          (col("value") > 250.0).cast("int").as("b_int"))
        .orderBy(col("event_id"))
    }),

    "q_fn_json" -> ((s, dir) => {
      Tables.events(s, dir).filter(col("event_id") < 500)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k_val"),
          (get_json_object(col("props"), "$.k").cast("long") % 10).as("k_mod"))
        .orderBy(col("event_id"))
    }),

    "q_fn_array" -> ((s, dir) => {
      // a 2×2×2 tensor built from the embedding head exercises the 3-D
      // ops (batched matmul, per-batch transpose, flatten-sum, shape);
      // all outputs projected as scalars (arrays crash the driver's
      // pandas hash-comparator)
      val t = "array(array(slice(__e, 1, 2), slice(__e, 3, 2)), " +
        "array(slice(__e, 5, 2), slice(__e, 7, 2)))"
      Tables.load(s, dir, "embeddings").filter(col("vec_id") < 100)
        .withColumn("__e", expr("transform(slice(embedding, 1, 8), x -> CAST(x AS DOUBLE))"))
        .withColumn("__t", expr(t))
        .withColumn("__mm", graft.functions.ArrayOps.matmul3("__t", "__t"))
        .withColumn("__tr", graft.functions.ArrayOps.transpose3("__t"))
        .select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          element_at(col("embedding"), 1).as("first_e"),
          element_at(col("embedding"), -1).as("last_e"),
          array_max(col("embedding")).as("max_e"),
          array_min(col("embedding")).as("min_e"),
          // arrays crash the driver's pandas hash-comparator → project
          // the slice as scalar columns instead
          element_at(col("embedding"), 1).as("h1"),
          element_at(col("embedding"), 2).as("h2"),
          element_at(col("embedding"), 3).as("h3"),
          element_at(col("embedding"), 4).as("h4"),
          expr("element_at(element_at(element_at(__mm, 1), 1), 1)").as("mm111"),
          expr("element_at(element_at(element_at(__mm, 1), 1), 2)").as("mm112"),
          expr("element_at(element_at(element_at(__mm, 2), 2), 2)").as("mm222"),
          expr("element_at(element_at(element_at(__tr, 1), 1), 2)").as("tr112"),
          expr("element_at(element_at(element_at(__tr, 2), 2), 1)").as("tr221"),
          graft.functions.ArrayOps.sumAll3("__t").as("t_sum"),
          element_at(graft.functions.ArrayOps.shape3("__t"), 3).cast("int").as("d3"))
        .orderBy(col("vec_id"))
    }),

    "q_unnest" -> ((s, dir) => {
      // UNNEST WITH ORDINALITY (reference join/UnnestRecordCursorFactory)
      Tables.load(s, dir, "embeddings").filter(col("vec_id") < 5)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "val")))
        .orderBy(col("vec_id"), col("pos"))
    }),

    "q_ndarray" -> ((s, dir) => {
      // general N-dim tensors (flat row-major + shape, the reference's
      // ≤32-dim ARRAY model): 4-D build, full axis reversal, axis slice,
      // reshape — all index arithmetic closed-form for the oracle
      import graft.functions.ArrayOps._
      val t4 = col("__t4")
      val t4t = ndTranspose(t4, Seq(3, 2, 1, 0))
      val sl = ndSlice(t4, 1, 4, lit(2))
      val r = ndReshape(t4, array(lit(4), lit(6)))
      Tables.events(s, dir).filter(col("event_id") < 60)
        .withColumn("__data", transform(sequence(lit(0), lit(23)),
          i => (col("event_id") * 24 + i).cast("double")))
        .withColumn("__t4", ndMake(col("__data"),
          array(lit(2), lit(3), lit(2), lit(2))))
        .select(col("event_id"),
          ndShapeStr(t4).as("shape4"),
          ndShapeStr(t4t).as("shape4t"),
          ndShapeStr(sl).as("shape_sl"),
          ndSize(t4).as("nelems"),
          ndGet(t4, Seq(lit(1), lit(2), lit(1), lit(1))).as("g1"),
          ndGet(t4t, Seq(lit(1), lit(1), lit(2), lit(1))).as("g2"),
          ndSum(t4).as("total"),
          ndSum(sl).as("slice_sum"),
          ndGet(r, Seq(lit(2), lit(3))).as("r15"),
          r.isNull.as("ok_is_null"),
          ndReshape(t4, array(lit(5), lit(5))).isNull.as("bad_is_null"))
        .orderBy(col("event_id"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q_fn_datetime" ->
      """SELECT event_id, ts,
        |  CAST(year(ts) AS INT) AS y, CAST(month(ts) AS INT) AS mo, CAST(day(ts) AS INT) AS d,
        |  CAST(hour(ts) AS INT) AS h, CAST(minute(ts) AS INT) AS mi, CAST(second(ts) AS INT) AS sec,
        |  CAST(dayofweek(ts) + 1 AS INT) AS dow,
        |  CAST(weekofyear(ts) AS INT) AS woy, CAST(dayofyear(ts) AS INT) AS doy,
        |  CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_ts,
        |  CAST(date_trunc('month', ts) AS TIMESTAMP) AS month_ts,
        |  ts + INTERVAL 3 DAYS AS plus3d,
        |  ts - INTERVAL 90 MINUTES AS minus90m,
        |  time_bucket(INTERVAL 5 MINUTES, ts, TIMESTAMP '1970-01-01') AS floor_5m,
        |  strftime(ts, '%Y-%m-%d %H:%M') AS fmt,
        |  epoch_us(ts) AS epoch_us
        |FROM events WHERE event_id < 500 ORDER BY event_id""".stripMargin,

    "q_fn_string" ->
      """SELECT doc_id,
        |  CAST(length(text) AS INT) AS len,
        |  upper(substring(text, 1, 20)) AS head_upper,
        |  lower(lang) AS lang_lower,
        |  lang || ':' || source AS tag,
        |  lpad(lang, 5, '_') AS lp,
        |  rpad(source, 8, '.') AS rp,
        |  trim('  pad  ') AS trimmed,
        |  substring(text, 5, 10) AS mid,
        |  split_part(text, ' ', 3) AS word3,
        |  CAST(strpos(text, 'data') AS INT) AS pos_data,
        |  substring(regexp_replace(text, '[aeiou]', '', 'g'), 1, 30) AS novowel_head,
        |  md5(lang) AS lang_md5,
        |  sha256(source) AS source_sha,
        |  reverse(lang) AS gnal,
        |  repeat(lang, 3) AS lang3,
        |  starts_with(text, 'the') AS starts_the,
        |  contains(text, 'query') AS has_query
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin,

    "q_fn_math" ->
      """SELECT event_id, value,
        |  abs(value - 250.0) AS dist,
        |  CAST(ceil(value) AS BIGINT) AS c,
        |  CAST(floor(value) AS BIGINT) AS f,
        |  round(value, 1) AS r1,
        |  round(sqrt(value), 6) AS sq,
        |  round(pow(value, 1.5), 4) AS pw,
        |  round(ln(value + 1.0), 6) AS lnv,
        |  round(log10(value + 1.0), 6) AS l10,
        |  round(exp(value / 100.0), 6) AS ex,
        |  CAST(sign(value - 250.0) AS INT) AS sgn,
        |  event_id % 7 AS m7,
        |  greatest(value, CAST(user_id AS DOUBLE)) AS g,
        |  least(value, CAST(user_id AS DOUBLE)) AS l
        |FROM events WHERE event_id < 500 ORDER BY event_id""".stripMargin,

    "q_fn_regex" ->
      """SELECT doc_id,
        |  regexp_matches(text, 'qu[ae]ry') AS m_query,
        |  regexp_extract(text, '([a-z]+) (join|scan)', 1) AS before_op,
        |  CAST(len(regexp_extract_all(text, 'the')) AS INT) AS n_the,
        |  lang LIKE 'e%' AS lang_e,
        |  source ILIKE 'SRC%' AS src_i
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin,

    "q_fn_conditional" ->
      """SELECT event_id,
        |  CASE WHEN value < 100.0 THEN 'low'
        |       WHEN value < 400.0 THEN 'mid'
        |       ELSE 'high' END AS band,
        |  coalesce(nullif(event_type, 'view'), '(hidden)') AS etype,
        |  CASE WHEN user_id % 2 = 0 THEN value END AS even_value,
        |  CASE WHEN nullif(event_type, 'view') IS NOT NULL THEN 1 ELSE 0 END AS visible
        |FROM events WHERE event_id < 500 ORDER BY event_id""".stripMargin,

    "q_fn_cast" ->
      """SELECT event_id,
        |  CAST(trunc(value) AS INT) AS v_int,
        |  CAST(value AS VARCHAR) AS v_str,
        |  CAST(user_id AS DOUBLE) AS u_dbl,
        |  CAST(user_id AS VARCHAR) AS u_str,
        |  'id_' || CAST(event_id AS VARCHAR) AS tag,
        |  CAST(CAST(ts AS DATE) AS VARCHAR) AS d_str,
        |  CASE WHEN value > 250.0 THEN 1 ELSE 0 END AS b_int
        |FROM events WHERE event_id < 500 ORDER BY event_id""".stripMargin,

    "q_fn_json" ->
      """SELECT event_id,
        |  CAST(props->>'$.k' AS BIGINT) AS k_val,
        |  CAST(props->>'$.k' AS BIGINT) % 10 AS k_mod
        |FROM events WHERE event_id < 500 ORDER BY event_id""".stripMargin,

    "q_fn_array" ->
      """WITH d AS (
        |  SELECT vec_id, embedding, CAST(embedding AS DOUBLE[]) AS e
        |  FROM embeddings WHERE vec_id < 100)
        |SELECT vec_id,
        |  CAST(len(embedding) AS INT) AS dim,
        |  embedding[1] AS first_e,
        |  embedding[-1] AS last_e,
        |  list_max(embedding) AS max_e,
        |  list_min(embedding) AS min_e,
        |  embedding[1] AS h1, embedding[2] AS h2,
        |  embedding[3] AS h3, embedding[4] AS h4,
        |  e[1]*e[1] + e[2]*e[3] AS mm111,
        |  e[1]*e[2] + e[2]*e[4] AS mm112,
        |  e[7]*e[6] + e[8]*e[8] AS mm222,
        |  e[3] AS tr112,
        |  e[6] AS tr221,
        |  e[1]+e[2]+e[3]+e[4]+e[5]+e[6]+e[7]+e[8] AS t_sum,
        |  2 AS d3
        |FROM d ORDER BY vec_id""".stripMargin,

    "q_unnest" ->
      """SELECT vec_id,
        |  CAST(unnest(range(0, len(embedding))) AS INT) AS pos,
        |  unnest(embedding) AS val
        |FROM embeddings WHERE vec_id < 5 ORDER BY vec_id, pos""".stripMargin,

    "q_ndarray" ->
      """SELECT event_id,
        |  '2x3x2x2' AS shape4,
        |  '2x2x3x2' AS shape4t,
        |  '2x2x2' AS shape_sl,
        |  CAST(24 AS BIGINT) AS nelems,
        |  CAST(event_id * 24 + 23 AS DOUBLE) AS g1,
        |  CAST(event_id * 24 + 23 AS DOUBLE) AS g2,
        |  CAST(event_id * 576 + 276 AS DOUBLE) AS total,
        |  CAST(event_id * 192 + 124 AS DOUBLE) AS slice_sum,
        |  CAST(event_id * 24 + 15 AS DOUBLE) AS r15,
        |  FALSE AS ok_is_null,
        |  TRUE AS bad_is_null
        |FROM events WHERE event_id < 60 ORDER BY event_id""".stripMargin
  )
}
