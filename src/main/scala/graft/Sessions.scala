package graft

import org.apache.spark.sql.SparkSession

/** One place for the session config every entry point (Verify, Bench,
  * tests, user code) needs. Designed for a real cluster: nothing here
  * is local-mode-specific except the caller-provided master/parallelism.
  */
object Sessions {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder = {
    // session.timeZone=UTC covers Catalyst, but collected
    // java.sql.Timestamp values rendered back into SQL text (pivot
    // labels, folded SAMPLE BY bounds) go through toLocalDateTime,
    // which uses the JVM default zone — pin it so a non-UTC driver JVM
    // can't shift literals by its zone offset
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
    SparkSession.builder()
      .master(master)
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      // reference numeric semantics are Java's: arithmetic wraps, a bad
      // cast yields null, x/0 is null — Spark's legacy (non-ANSI) mode,
      // not ANSI's throw-on-overflow
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Janino-compiled codegen classes are cached by generated source,
      // but the default cache holds only 100 entries; a session running
      // a workload of hundreds of distinct queries (this engine's whole
      // point) evicts every entry before any query repeats, so each
      // re-execution pays 0.3-1.2 s of whole-stage recompilation
      // (measured: q_uuid run1 1.57 s vs cached rerun 0.38 s). 4096
      // entries keeps every plan of a large workload warm for the cost
      // of some metaspace. Static conf — must be set before the first
      // session; every entry point builds through here.
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      // lazily-checkpointed intermediates (shingle/bucket tables …) hold
      // executor storage until a DRIVER GC lets the ContextCleaner
      // release the unreferenced RDDs; a workload of hundreds of queries
      // per session accumulates them far faster than the 30min default,
      // and the resulting storage pressure/evictions tax every later
      // query. One minute keeps the cleaner ahead of the workload at any
      // scale (the GC itself is cheap next to a single query here).
      .config("spark.cleaner.periodicGC.interval", "1min")
      // Prefer shuffled-hash over sort-merge when per-partition build
      // sides fit (guide §3.1): skips the per-partition sorts; AQE can
      // still fall back, and OOM-risky builds are bounded by the same
      // size checks on a real cluster.
      .config("spark.sql.join.preferSortMergeJoin", "false")
      // events.parquet carries TIMESTAMP(NANOS) which the vectorized
      // reader otherwise rejects; read as long, Tables normalizes.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // reference array functions are null-in-null-out: array_length of
      // a null array is null, not legacy Spark's -1
      .config("spark.sql.legacy.sizeOfNull", "false")
      // write timestamps as micros (not INT96) so the oracle reads the
      // exact same values back
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
  }

  def local(cpus: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt): SparkSession = {
    val s = builder(s"local[$cpus]", math.max(cpus, 4)).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
