package graft.join

import org.apache.spark.broadcast.Broadcast

/** Executor-local cache of values derived from a broadcast variable (e.g. a
  * prepared STRtree built from broadcast geometry bytes).
  *
  * Each task deserializes its own `Broadcast` wrapper instance, so keying by
  * object identity (a `WeakHashMap[Broadcast, _]`) never hits across tasks
  * and the derived value is rebuilt per partition. Keying by `bc.id` alone
  * is wrong the other way: broadcast ids restart at 0 for every
  * SparkContext, so an id-keyed map can serve a stale value after a context
  * restart in the same JVM. The composite key (spark.app.id, bc.id) is
  * unique across contexts AND stable across tasks of one context.
  *
  * Entries are LRU-bounded: eviction only costs a rebuild, never
  * correctness, and the bound keeps long-lived executors from accumulating
  * one tree per historical join.
  */
private[graft] class BroadcastCache[V](maxEntries: Int = 64) {
  private val cache =
    new java.util.LinkedHashMap[(String, Long), LazyCell](16, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[(String, Long), LazyCell]) =
        size() > maxEntries
    }

  def getOrBuild(bc: Broadcast[_])(build: => V): V = {
    val appId = org.apache.spark.SparkEnv.get.conf.getAppId
    val key = (appId, bc.id)
    // the cache-wide lock covers only the (fast, access-ordered) map
    // operations; the potentially seconds-long build runs OUTSIDE it via
    // the lazy cell — a tree build for one broadcast no longer blocks
    // cache hits for a different broadcast on the same executor, while
    // concurrent requests for the SAME key still share one build
    // (lazy-val semantics on the shared cell).
    val cell = cache.synchronized {
      val hit = cache.get(key)
      if (hit != null) hit
      else { val c = new LazyCell(build); cache.put(key, c); c }
    }
    cell.value
  }

  private final class LazyCell(thunk: => V) {
    lazy val value: V = thunk
  }
}
