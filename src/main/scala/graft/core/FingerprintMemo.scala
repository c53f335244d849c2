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
  * Bounded by wholesale clear past `cap` entries (tables × versions;
  * the check-then-clear is racy under concurrent puts, which can
  * transiently overshoot the cap — harmless for a cache whose entries
  * are all re-computable).
  */
final class FingerprintMemo[K, V <: AnyRef](cap: Int = 4096) {
  private val m = new java.util.concurrent.ConcurrentHashMap[K, V]()
  def getOrElseUpdate(k: K)(compute: => V): V = {
    val hit = m.get(k)
    if (hit != null) hit
    else {
      val v = compute
      if (m.size > cap) m.clear()
      m.put(k, v)
      v
    }
  }
}
