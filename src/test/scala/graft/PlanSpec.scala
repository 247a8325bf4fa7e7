package graft

/** Plan-quality regression guard: the physical plans that make these
  * operators scale must not silently degrade — pushdown reaching the
  * parquet scan, dimension sides broadcast, the asof union-merge staying
  * a single key shuffle, aggregates keeping their partial (map-side)
  * phase.
  */
class PlanSpec extends SparkSpec {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan.toString

  test("q1_agg: filter pushed to the scan, partial+final aggregation") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(p.contains("partial_sum"))
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("q_join_inner: dimension side broadcast, fact filter pushed") {
    val p = plan("q_join_inner")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("GreaterThan(o_totalprice,450000.0)"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q_asof_join: defaults to the native merge exec, filters pushed to both scans") {
    val p = plan("q_asof_join")
    assert(p.contains("AsOfJoin ")) // native sorted-merge is the default lowering
    assert(!p.contains("Window "))
    assert("EqualTo\\(event_type,purchase\\)".r.findAllIn(p).nonEmpty)
    assert("EqualTo\\(event_type,click\\)".r.findAllIn(p).nonEmpty)
  }

  test("asofKeyedWindow fallback: exactly one hash shuffle (the key)") {
    val p = ops.AsofJoin.asofKeyedWindow(
      Tables.events(spark, sfDir).filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
        .select("event_id", "ts", "user_id", "value"),
      Tables.events(spark, sfDir).filter(org.apache.spark.sql.functions.col("event_type") === "click")
        .select(org.apache.spark.sql.functions.col("user_id"), org.apache.spark.sql.functions.col("ts"),
          org.apache.spark.sql.functions.col("value").as("click_value")),
      "ts", "ts", Seq("user_id"), Seq("click_value"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size == 1)
  }

  test("asofRangeNoKey: distributed plan — no driver collect, no object serialization") {
    val ev = Tables.events(spark, sfDir)
    val f = org.apache.spark.sql.functions.col("event_type")
    val p = ops.AsofJoin.asofRangeNoKey(
      ev.filter(f === "purchase").select("event_id", "ts", "value"),
      ev.filter(f === "signup").select(org.apache.spark.sql.functions.col("ts"),
        org.apache.spark.sql.functions.col("value").as("signup_value")),
      "ts", "ts", Seq("signup_value"))
      .queryExecution.executedPlan.toString
    // the broadcast-binary-search path shows up as SerializeFromObject /
    // mapPartitions; the scale path must not
    assert(!p.contains("SerializeFromObject"))
    assert(!p.contains("MapPartitions"))
    // bucketed merge: a hash exchange on the bucket id
    assert(p.contains("__graft_bucket"))
  }

  test("q_latest_on: partial max_by aggregation, no sort of the fact table") {
    val p = plan("q_latest_on")
    assert(p.contains("partial_max_by") || p.contains("partial_finalmerge") || p.contains("HashAggregate"))
    assert(!p.contains("Window ")) // hash-agg lowering, not a row_number window
  }

  test("q_asof_native: custom AsOfJoinExec planned, one hash exchange per side, no window") {
    val p = plan("q_asof_native")
    assert(p.contains("AsOfJoin ")) // AsOfJoinExec renders without the suffix
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size == 2)
    assert(!p.contains("Window "))
  }

  test("q_orderby_limit: top-k, not a full global sort") {
    val p = plan("q_orderby_limit")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q_limit_range: offset+limit fuse into top-k, no single-stream global limit") {
    val p = plan("q_limit_range")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("GlobalLimit"))
  }

  test("q_sql_interval_scan: dialect interval literal reaches the scan as pushed range") {
    val p = plan("q_sql_interval_scan")
    assert(p.contains("GreaterThanOrEqual(ts") || p.contains("(ts#"))
    assert(p.contains("PushedFilters"))
    // the rewrite produced a range predicate, not a full scan + filter
    assert(p.contains("IsNotNull(ts)") || p.contains("GreaterThanOrEqual"))
  }

  test("sample-by fill spine: broadcast when coarse, distributed when fine-grained") {
    import org.apache.spark.sql.execution.{RangeExec, SparkPlan}
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    import org.apache.spark.sql.functions.{col, count}
    // at sparkPlan stage the broadcast decision is the BNLJ build side
    def spineBroadcast(p: SparkPlan): Boolean = p.collect {
      case b: BroadcastNestedLoopJoinExec =>
        val build = b.buildSide match { case BuildLeft => b.left; case BuildRight => b.right }
        build.collectLeaves().exists(_.isInstanceOf[RangeExec])
    }.exists(identity)
    val ev = Tables.events(spark, sfDir).limit(100)
    def planFor(bucket: String, to: String): SparkPlan =
      ops.SampleBy.sampleBy(ev, "ts", bucket, Seq("event_type"),
        Seq("n" -> count(col("value"))), ops.SampleBy.FillNull,
        range = Some((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
          java.sql.Timestamp.valueOf(to))))
        .queryExecution.sparkPlan
    // ~1.4k hourly buckets → broadcast; ~5.2M 1s buckets must stay distributed
    assert(spineBroadcast(planFor("1 hour", "2024-03-01 00:00:00")))
    assert(!spineBroadcast(planFor("1 second", "2024-03-01 00:00:00")))
  }

  test("un-keyed FILL(PREV) carry is segmented, not one global window over data") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.functions.{col, avg}
    val ev = Tables.events(spark, sfDir).limit(500)
    val df = ops.SampleBy.sampleBy(ev, "ts", "1 hour", Seq.empty,
      Seq("v" -> avg(col("value"))), ops.SampleBy.FillPrev,
      range = Some((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        java.sql.Timestamp.valueOf("2024-03-01 00:00:00"))))
    val windows = df.queryExecution.sparkPlan.collect {
      case w: WindowExec => w
    }
    // the per-bucket carry must partition by the segment column; only the
    // bounded segment-spine prefix-merge (≤ nSegs rows) may be global
    assert(windows.exists(w => w.partitionSpec.nonEmpty &&
      w.partitionSpec.exists(_.toString.contains("__graft_seg"))),
      "expected a __seg-partitioned carry window")
    // correctness vs a single-key run of the keyed path
    val keyed = ops.SampleBy.sampleBy(ev.withColumn("one", org.apache.spark.sql.functions.lit(1)),
      "ts", "1 hour", Seq("one"), Seq("v" -> avg(col("value"))), ops.SampleBy.FillPrev,
      range = Some((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        java.sql.Timestamp.valueOf("2024-03-01 00:00:00")))).drop("one")
    def dump(d: org.apache.spark.sql.DataFrame) = d.orderBy("ts").collect()
      .map(r => (r.getTimestamp(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(dump(df).sameElements(dump(keyed)), "segmented fill diverges from keyed fill")
  }

  test("fused GROUPS-frame aggregates: few window passes, one shuffle") {
    for (q <- Seq("q_window_groups_frame", "q_window_groups_minmax")) {
      val p = SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan.toString
      // one rank + shared frame/peer specs — not a stacked tower of
      // re-ranking windows (was 11 nodes when the single-agg helpers chained)
      assert("Window \\[".r.findAllIn(p).size <= 4, q)
      assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, q)
    }
  }

  test("q_filter_project: column-pruned scan") {
    val p = plan("q_filter_project")
    // only the referenced lineitem columns reach the reader
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_partkey"))
    assert(!p.contains("l_suppkey"))
  }

  test("q_pii_redact: one map-only codegen stage — no shuffle before the sort") {
    val p = plan("q_pii_redact")
    // regex counts + redaction all evaluate as projections over the
    // scan (codegen'd expressions, no UDF boundary); the only exchanges
    // are the parallelism-floor round-robin over the tiny scan
    // (Tables.spread — absent at real input sizes) and the final
    // presentation ORDER BY; never a KEYED shuffle of the data
    assert("Exchange".r.findAllIn(p).size <= 2, p)
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(p.contains("regexp_extract_all") && p.contains("regexp_replace"))
    assert(!p.contains("BatchEvalPython") && !p.contains("SerializeFromObject"))
  }

  test("q_chunk_tokens: map-side explode, no shuffle before the sort") {
    val p = plan("q_chunk_tokens")
    assert(p.contains("Generate explode"), p)
    // chunk fan-out happens where the docs live; only the final ORDER
    // BY exchanges
    assert("Exchange".r.findAllIn(p).size == 1, p)
  }

  test("q_pack_tokens: packing window partitioned by shard — never a single global partition") {
    val p = plan("q_pack_tokens")
    assert(p.contains("Window"), p)
    assert("Exchange hashpartitioning\\(source".r.findAllIn(p).nonEmpty, p)
    // a global cumsum would plan Exchange SinglePartition before the
    // window — the one shape that cannot scale
    assert(!p.contains("Exchange SinglePartition, ENSURE_REQUIREMENTS"), p)
  }

  test("q_contamination: bench shingles broadcast, corpus never re-shuffled for the join") {
    val p = plan("q_contamination")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("dedup pair joins: keyed on shingle/bucket/cluster, never a cartesian product") {
    for (q <- Seq("q_dedup_jaccard", "q_dedup_minhash", "q_dedup_semantic")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), q)
      assert(!p.contains("BroadcastNestedLoopJoin"), q)
      // the self-join must key on the shingle/bucket equi-join columns
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
        p.contains("BroadcastHashJoin"), q)
    }
  }

  test("substring/line dedup: hash-keyed joins only, window rollup keeps its partial phase") {
    for (q <- Seq("q_dedup_substring", "q_dedup_substring_clean", "q_dedup_lines")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), q)
      assert(!p.contains("BroadcastNestedLoopJoin"), q)
      // the per-doc rollup must collapse map-side before its shuffle
      // (substring_clean's canonical selection now rides h-partitioned
      // window aggregates; its per-doc span rollup is the
      // partial_collect_set ObjectHashAggregate)
      assert(p.contains("partial_count") || p.contains("partial_min") ||
        p.contains("partial_sum") || p.contains("partial_collect_set"), q)
    }
  }

  test("session keeps AQE + skew-join + coalescing on (preferSortMergeJoin=false safety net)") {
    // preferSortMergeJoin=false lets the planner pick shuffled-hash from
    // size ESTIMATES; on exploded intermediates those misestimate, and
    // the runtime guard against an unspillable build side is AQE's skew
    // handling/fallback — these must never be turned off with it.
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
    assert(spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled") == "true")
  }

  test("no gate query plans an unpartitioned window over unbounded input") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    // "WindowExec: No Partition Defined" moves ALL rows to one partition —
    // fatal at scale, so every declared query must partition its windows.
    // Sole allowed exception: q_asof_nokey_range's prevailing-value window
    // runs over the derived BUCKET table (one row per time bucket, bounded
    // by the chosen stride — guide-§8 "decide on small rows"), never over
    // the raw event rows.
    val allow = Set("q_asof_nokey_range")
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1) if !allow(name)) {
      val hits = fn(spark, sfDir).queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty =>
          w.windowExpressions.map(_.sql).mkString("; ").take(100)
      }
      assert(hits.isEmpty, s"$name plans an unpartitioned Window: ${hits.mkString(" | ")}")
    }
  }

  test("q_bm25/q_dsir: pruned postings, broadcast models, top-k never a global sort") {
    for (q <- Seq("q_bm25", "q_dsir")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), q)
      assert(p.contains("TakeOrderedAndProject"), q) // top-k, not a full sort
      assert(p.contains("BroadcastHashJoin"), q)     // df/log-ratio sides broadcast
      assert(p.contains("partial_count") || p.contains("partial_sum"), q)
    }
  }

  test("q_quality_rules: map-only measures — the single Exchange is the output sort") {
    val p = plan("q_quality_rules")
    assert(!p.contains("Join"), p)
    // output sort + (small-scan-only) parallelism-floor round-robin;
    // no keyed shuffle
    assert("Exchange".r.findAllIn(p).size <= 2, p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("q_quality_classifier: map-only scoring — the single Exchange is the output sort") {
    val p = plan("q_quality_classifier")
    // one scan, no joins, no aggregation shuffle; the only Exchanges
    // are the ORDER BY doc_id of the gate itself and the
    // (small-scan-only) parallelism-floor round-robin
    assert(!p.contains("Join"), p)
    assert("Exchange".r.findAllIn(p).size <= 2, p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("q_perplexity: LM sides broadcast, doc rollup keeps its partial phase") {
    val p = plan("q_perplexity")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, "bigram+unigram joins should broadcast")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "per-doc rollup must partial-aggregate before the shuffle")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_similarity_topk: queries broadcast, one corpus pass, no corpus shuffle before ranking") {
    val p = plan("q_similarity_topk")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("ivfAssign: map-side arg-max — partial+final max_by, no window over the corpus×nlist expansion") {
    import org.apache.spark.sql.functions._
    val corpus = Tables.load(spark, sfDir, "embeddings")
    val cent = graft.pipeline.Similarity.ivfCentroids(corpus, "vec_id", "embedding", 8)
    val p = graft.pipeline.Similarity.ivfAssign(corpus, cent, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    // the broadcast expansion must collapse in a partial hash aggregate
    // before any exchange — a Window partitioned by the corpus id would
    // shuffle corpus×nlist rows (the nlist-row centroid seeding keeps
    // its own tiny Window; that one is fine)
    assert(p.contains("partial_max_by"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert("Window \\[[^\\n]*vec_id".r.findAllIn(p).isEmpty, p)
    assert("Exchange hashpartitioning\\(vec_id".r.findAllIn(p).size == 1, p)
  }

  test("ivfTopK probe stage: per-query top-nprobe is a partial aggregate, not a window over qid") {
    val p = plan("q_similarity_ivf")
    // probes: partial_collect_list collapses the queries×nlist broadcast
    // expansion map-side; the only Window left is the final candidate
    // ranking (bounded by the probed lists)
    assert(p.contains("partial_collect_list") || p.contains("objHashAggregate") ||
      p.contains("ObjectHashAggregate"), p)
    // rank-within-lists now goes through the bounded topk_pairs
    // aggregate too — no per-qid window anywhere in the plan
    assert(p.contains("partial_topk_pairs"), p)
    assert("Window \\[[^\\n]*qid".r.findAllIn(p).isEmpty, p)
  }

  test("pqEncode: map-only — codebook literals ride the expression, zero Exchange") {
    val corpus = Tables.load(spark, sfDir, "embeddings")
    val p = graft.pipeline.Similarity.pqEncode(corpus, "vec_id", "embedding", 4, 16)
      .queryExecution.executedPlan.toString
    // encoding a 100 TB corpus must be a single scan: no join against a
    // codebook table, no aggregation, no shuffle of any kind
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Join"), p)
  }

  test("pqTopK: queries broadcast; ranking is a bounded partial aggregate, not a qid window") {
    val p = plan("q_similarity_pq")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    // the corpus reaches the join shuffle-free
    assert("Exchange hashpartitioning\\(vec_id".r.findAllIn(p).isEmpty, p)
    // per-query top-k must partial-merge map-side (≤ k pairs per query
    // per partition reach the shuffle) — a Window over qid would move
    // the entire |corpus|-per-query ADC expansion
    assert(p.contains("partial_topk_pairs"), p)
    assert("Window \\[[^\\n]*qid".r.findAllIn(p).isEmpty, p)
  }

  test("ivfPqTopK: same bounded-aggregate ranking within probed lists") {
    val p = plan("q_similarity_ivfpq")
    assert(p.contains("partial_topk_pairs"), p)
    assert("Window \\[[^\\n]*qid".r.findAllIn(p).isEmpty, p)
  }

  test("bucketed co-located join: sort-merge over aligned buckets, no Exchange") {
    import org.apache.spark.sql.functions.col
    val wh = java.nio.file.Files.createTempDirectory("graft-bkt").toString
    val orders = Tables.load(spark, sfDir, "orders")
      .select(col("o_custkey").as("custkey"), col("o_orderkey"), col("o_totalprice"))
    val cust = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey").as("custkey"), col("c_name"))
    graft.ops.Bucketing.writeBucketed(orders, "pbkt_orders", Seq("custkey"), 4, Some(s"$wh/o"))
    graft.ops.Bucketing.writeBucketed(cust, "pbkt_customer", Seq("custkey"), 4, Some(s"$wh/c"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try {
      val j = graft.ops.Bucketing.colocatedJoin(spark, "pbkt_orders", "pbkt_customer",
        Seq("custkey"))
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange"), s"bucketed join must not re-shuffle either side:\n$p")
      assert(j.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS pbkt_orders")
      spark.sql("DROP TABLE IF EXISTS pbkt_customer")
    }
  }
}
