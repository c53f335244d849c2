package graft.core

/** Bounded driver-side memo for metadata derived from an EXACT
  * version fingerprint (manifest versions, file mtimes): a hit can
  * only return what recomputation would — any commit moves the
  * fingerprint and misses. Shared by the always-on planner rules
  * ([[graft.plans.GraftScanStats]]'s size/row/column-stat memos,
  * `GraftScanPlanner.liveBytes`), which probe every graft relation on
  * every optimizer pass: the memo turns a per-plan metadata walk into
  * O(1) map lookups.
  *
  * Bounding evicts a QUARTER of the entries (whatever the map's
  * iteration order surfaces first — effectively an arbitrary subset)
  * instead of a wholesale clear, so overflow under a many-table
  * workload degrades smoothly rather than discarding every hot
  * planner entry at once. Concurrent computes of the same key
  * deduplicate through `computeIfAbsent` — one thread runs the
  * metadata walk, the rest wait on the bin (driver-side, bounded
  * walk; the brief bin lock is cheaper than N duplicate walks).
  */
final class FingerprintMemo[K, V <: AnyRef](cap: Int = 4096) {
  private val m = new java.util.concurrent.ConcurrentHashMap[K, V]()
  def getOrElseUpdate(k: K)(compute: => V): V = {
    val hit = m.get(k)
    if (hit != null) hit
    else {
      if (m.size > cap) {
        val it = m.keySet.iterator
        var n = cap / 4
        while (n > 0 && it.hasNext) { it.next(); it.remove(); n -= 1 }
      }
      m.computeIfAbsent(k, _ => compute)
    }
  }
}
