package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped registry for the persisted intermediates query builders
  * create (shingle bases, signature frames, normalized embeddings, ...).
  *
  * Problem it solves (round-10 ADVICE): every detector persists one or
  * more corpus-scale frames that the RETURNED plan references several
  * times. The builder cannot unpersist them itself — the caller hasn't
  * executed the plan yet — so a long-lived session running many
  * detectors back-to-back accumulated corpus-scale cache without bound.
  *
  * Contract: builders persist through [[persist]] (which registers the
  * frame under its session); every `SparkEntry.queries` entry drains the
  * frames REGISTERED BEFORE IT starts building, so cache occupancy in a
  * query-after-query session is bounded by one query's intermediates.
  * Direct callers of the query objects can release explicitly with
  * [[drain]].
  *
  * Laziness is preserved: nothing is materialized here, and a drain
  * never breaks correctness — cached-plan substitution happens at
  * execution time, so a plan whose intermediates were dropped simply
  * recomputes them. The only pattern that loses the persist BENEFIT is
  * building query B before executing query A's plan; build-execute-build
  * (Bench, Verify, the driver, tests) keeps it fully.
  */
object CacheScope {

  private val reg =
    new ConcurrentHashMap[SparkSession, java.util.ArrayDeque[DataFrame]]()

  /** Persist `df` (default storage level) and register it for the next
    * [[drain]] of its session. Usable point-free in a plan chain:
    * `.transform(graft.CacheScope.persist)`.
    *
    * Safe against a concurrent [[drain]] (ADVICE r11): persist happens
    * BEFORE registration, and if a drain removes our queue between
    * registration and the re-check, we de-register from the orphaned
    * queue and retry — so a frame can never end up persisted but
    * invisible to every later drain. The benign race that remains is
    * semantic, not a leak: a drain that lands right after a successful
    * registration unpersists the frame immediately, which is exactly
    * the drain contract (recompute stays correct; see the scaladoc
    * above and CacheScopeSpec's recompute-correctness test).
    */
  def persist(df: DataFrame): DataFrame = {
    df.persist()
    var registered = false
    while (!registered) {
      val q = reg.computeIfAbsent(df.sparkSession,
        _ => new java.util.ArrayDeque[DataFrame]())
      q.synchronized { q.addLast(df) }
      registered = reg.get(df.sparkSession) eq q
      if (!registered) {
        // a concurrent drain claimed q (and may have just unpersisted
        // df): pull df back out of the orphaned queue and retry —
        // re-persist first so the retry's registration covers a
        // persisted frame either way
        q.synchronized { q.remove(df) }
        df.persist()
      }
    }
    df
  }

  /** [[persist]] + immediate materialization (`count()` populates every
    * cached partition). For frames consumed by SEVERAL independent
    * exchange subtrees of one query: AQE materializes those subtrees
    * CONCURRENTLY, and concurrent first readers of a lazily-persisted
    * frame each recompute its partitions from source (the storage layer
    * keeps one copy — "Block rdd already exists" — but the compute is
    * paid per reader; measured 2-4 duplicate corpus passes inside
    * q_dedup_agreement, optimization r16). Eager population runs the
    * build exactly once, before the branches fan out. Still inside the
    * per-execution cache scope — drained like every other persist, so
    * nothing survives across bench samples.
    */
  def persistEager(df: DataFrame): DataFrame = {
    val out = persist(df)
    out.count()
    out
  }

  /** Unpersist (blocking, so storage accounting is deterministic) every
    * frame registered for `spark` and forget them.
    */
  def drain(spark: SparkSession): Unit = {
    val q = reg.remove(spark)
    if (q != null) q.synchronized {
      q.forEach(df => df.unpersist(blocking = true))
      q.clear()
    }
  }

  /** Number of frames currently registered for `spark` (diagnostics). */
  def registered(spark: SparkSession): Int = {
    val q = reg.get(spark)
    if (q == null) 0 else q.synchronized { q.size() }
  }

  /** Drain what previous scopes registered, then build — the wrapper
    * every `SparkEntry.queries` entry runs under.
    */
  def scopedBuild[T](spark: SparkSession)(build: => T): T = {
    drain(spark)
    build
  }
}
