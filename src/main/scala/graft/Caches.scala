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
  *
  * Thread contract: every mutation runs under the object monitor,
  * INCLUDING the whole memoized build-and-insert — a concurrent
  * [[releaseAll]] can therefore never observe (and drop) a frame that is
  * registered but not yet in the memo map, which previously left an
  * unreleasable entry behind. The monitor is reentrant, so builders that
  * recursively memoize sub-frames (dedup_groups → minhash pairs →
  * shingles) nest fine; cross-thread callers serialize, which is the
  * intended behavior for a shared cache. (Under `Test / fork := true`
  * without `testForkedParallel`, sbt runs suites sequentially anyway —
  * the lock makes the contract hold regardless of harness config.)
  */
object Caches {
  private val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
  private val hooks  = scala.collection.mutable.ArrayBuffer.empty[() => Unit]
  private val memo = scala.collection.mutable.HashMap
    .empty[(org.apache.spark.sql.SparkSession, String, String), DataFrame]

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
    */
  def memoized(spark: org.apache.spark.sql.SparkSession, dir: String, key: String)
              (build: => DataFrame): DataFrame = synchronized {
    // explicit get/update, not getOrElseUpdate: builders recursively
    // memoize sub-frames on this same map mid-build, which
    // getOrElseUpdate's cached-slot optimization does not allow
    val k = (spark, dir, key)
    memo.get(k) match {
      case Some(df) => df
      case None =>
        val df = register(build.persist())
        memo.update(k, df)
        df
    }
  }

  def releaseAll(): Unit = synchronized {
    frames.foreach(_.unpersist())
    frames.clear()
    memo.clear()
    hooks.foreach(_.apply())
  }

  /** Test introspection (CachesSpec lifecycle assertions): the currently
    * registered frames and memo entries, snapshotted under the lock.
    */
  private[graft] def snapshot: (Seq[DataFrame], Int) =
    synchronized { (frames.toSeq, memo.size) }
}
