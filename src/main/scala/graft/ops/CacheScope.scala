package graft.ops

import org.apache.spark.sql.DataFrame

/**
 * Query-scoped cache lifecycle: operators that persist an intermediate
 * consumed more than once inside ONE query plan (LSH candidate pairs,
 * banded batch signatures) register the handle here instead of eagerly
 * materializing-and-unpersisting inside the query path. The HARNESS
 * (Verify / a long-lived serving session) calls [[releaseAll]] after it
 * materializes a query, so:
 *
 *  - the query key stays a LAZY plan (pushdown into downstream joins is
 *    preserved, nothing materializes before the caller asks), and
 *  - repeated invocations of the same query inside one session REUSE
 *    the persisted intermediate (Spark's CacheManager dedupes by plan),
 *    so a bench rep measures the query, not a rebuild of its cache, and
 *  - a session that runs thousands of distinct queries releases each
 *    query's blocks at its own cadence instead of accumulating them
 *    forever (the round-9 leak) or paying a full eager materialization
 *    per call (the round-9 fix's cost, BENCH_r09 dedup_edit_verify
 *    0.78 s → 1.69 s).
 *
 * Corpus-lifetime artifacts (signature tables, ANN indexes) do NOT
 * register here — they are session-level caches by design.
 */
object CacheScope {
  private val pinned = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Register a persisted frame for deferred release; returns it. */
  def register(df: DataFrame): DataFrame = synchronized { pinned += df; df }

  /** Unpersist every registered frame (non-blocking) and clear. */
  def releaseAll(): Unit = synchronized {
    pinned.foreach(df => try df.unpersist(false) catch { case _: Throwable => () })
    pinned.clear()
  }

  /** Number of currently registered (unreleased) handles. */
  def pinnedCount: Int = synchronized(pinned.size)
}
