package graft

import org.apache.spark.sql.DataFrame

/** Registry of persisted frames shared across the query registry (e.g. the
  * dedup shingle scan and MinHash pair graph, consumed by several queries
  * in one Verify/Bench run). Library queries return LAZY frames, so
  * try/finally scoping can't bound a cache's life inside the query
  * function — instead every cross-query `persist()` registers here and a
  * host with a long-lived session calls [[releaseAll]] when the batch of
  * queries is done (the driver mains do). Registered release hooks let
  * modules also drop their memo tables so a later call rebuilds cleanly.
  */
object Caches {
  private val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
  private val hooks  = scala.collection.mutable.ArrayBuffer.empty[() => Unit]
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(org.apache.spark.sql.SparkSession, String, String), DataFrame]()

  def register(df: DataFrame): DataFrame = synchronized { frames += df; df }
  def onRelease(hook: () => Unit): Unit = synchronized { hooks += hook }

  /** Cross-query memo: build-and-persist a frame once per
    * (session, dir, key) so every registry query consuming it in one
    * Verify/Bench run shares the same cached copy. Keyed on the session
    * OBJECT (reference equality) — NOT identityHashCode, which a new
    * session can reuse after the old one is GC'd, resurrecting frames
    * bound to a dead session. The strong key reference adds no lifetime:
    * the memoized DataFrames themselves pin their session until
    * [[releaseAll]] clears both.
    *
    * NOT computeIfAbsent: builders recursively memoize sub-frames on the
    * same map, and a nested computeIfAbsent throws "Recursive update"
    * whenever two keys share a hash bin (surfaced as a FLAKY
    * dedup_groups failure). Plain get + putIfAbsent allows the nesting;
    * a lost race (impossible in the single-threaded registry runs,
    * harmless otherwise) just persists a duplicate frame that
    * [[releaseAll]] cleans up.
    */
  def memoized(spark: org.apache.spark.sql.SparkSession, dir: String, key: String)
              (build: => DataFrame): DataFrame = {
    val k = (spark, dir, key)
    val cached = memo.get(k)
    if (cached != null) cached
    else {
      val df = register(build.persist())
      val prev = memo.putIfAbsent(k, df)
      if (prev != null) prev else df
    }
  }

  def releaseAll(): Unit = synchronized {
    frames.foreach(_.unpersist())
    frames.clear()
    memo.clear()
    hooks.foreach(_.apply())
  }
}
