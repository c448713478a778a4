package graft.operators

import org.apache.spark.sql.SparkSession

/** The ONE bound + key discipline for every session-scoped derived-
  * artifact cache in the engine (shingle base / pair scores / dedup
  * index, raw-space PQ codebooks+codes, trained k-means centroids,
  * language-ID bucket counts). Each family used to carry its own copy
  * of the cap and the clear-on-overflow policy; four copies of the
  * same magic number drift independently (review finding r14), so the
  * policy lives here once and the families hold only their typed maps.
  *
  * Contract (unchanged from the original DedupQueries cache scaladoc):
  * keyed by (applicationId, tag, corpus dir) so a new session or a
  * different SF never sees stale blocks; bounded at [[Cap]] entries,
  * cleared WHOLESALE on overflow (dropped entries' localCheckpoint
  * blocks are GC-reclaimed with their RDDs); only immutable corpus
  * tables are cached — callers with mutable inputs use the uncached
  * `*Of` derivations. Every cache registered here must have a recorded
  * COLD bench owner that always rebuilds and [[seed]]s (the
  * dedup_artifact_build discipline, VERDICT r12 "what's wrong" #1).
  */
private[graft] object SessionArtifacts {

  /** Max entries per cache. One (session, corpus) pair uses one entry
    * per cache, so 12 covers every SF the suite touches with room for
    * spec-local corpora.
    */
  val Cap = 12

  def key(s: SparkSession, tag: String, d: String): String =
    s.sparkContext.applicationId + "|" + tag + "|" + d

  /** Overflow policy (review finding r15): evict only when an INSERT
    * would exceed [[Cap]] — the old pre-check `size > Cap` both let the
    * map stabilize at Cap+1 (off by one vs the documented bound) and,
    * because it ran before the lookup, wiped the very entry a hit was
    * about to return, forcing a spurious rebuild.
    */
  private def evictIfFullFor[V](m: java.util.concurrent.ConcurrentHashMap[String, V],
                                k: String): Unit =
    if (!m.containsKey(k) && m.size >= Cap) m.clear()

  /** Read-through: return the cached artifact or build + cache it. */
  def cached[V](m: java.util.concurrent.ConcurrentHashMap[String, V],
                s: SparkSession, tag: String, d: String)(build: => V): V = {
    val k = key(s, tag, d)
    evictIfFullFor(m, k)
    m.computeIfAbsent(k, _ => build)
  }

  /** Seed a cache entry from an artifact built OUTSIDE the cache — the
    * recorded-build-owner handoff: the cold owner query pays the full
    * build every execution (so the cost lands in ITS bench number) and
    * puts the result here, so consumers hit the cache on first touch
    * instead of paying the build a second time.
    */
  def seed[V](m: java.util.concurrent.ConcurrentHashMap[String, V],
              s: SparkSession, tag: String, d: String, v: V): Unit = {
    val k = key(s, tag, d)
    evictIfFullFor(m, k)
    m.put(k, v)
  }
}
