package graft

/** The one (kind, key) → value memo behind every gate-fixture layer
  * (the CEP shared replay, the semdedup assignment/flat tables, the
  * substring index/runs). Values are session-independent plain JVM
  * data — parquet PATHS or collected fixture rows — never DataFrames
  * (a cached DataFrame would pin a stopped SparkSession).
  *
  * Deliberately get-then-putIfAbsent, NEVER computeIfAbsent: fixture
  * builders NEST (the flat-drop table builds on the assignment table,
  * the detect runs build on the shingle index, the CEP replay builds
  * on the day-folded fixture), and a nested insert inside a
  * computeIfAbsent on the same ConcurrentHashMap is forbidden on
  * JDK 9+ — it throws IllegalStateException("Recursive update")
  * whenever the two keys land in the same bin, which is deterministic
  * per key string and so can appear out of nowhere with a new sf dir.
  * The benign race this trades for (two threads both building before
  * one putIfAbsent wins) is idempotent: builders are deterministic
  * and write to fresh temp dirs.
  */
private[graft] object FixtureMemo {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), AnyRef]

  def of[T <: AnyRef](kind: String, key: String)(build: => T): T = {
    val k = (kind, key)
    val cur = cache.get(k)
    if (cur != null) cur.asInstanceOf[T]
    else {
      val v = build
      val prev = cache.putIfAbsent(k, v)
      (if (prev != null) prev else v).asInstanceOf[T]
    }
  }
}
