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

  def register(df: DataFrame): DataFrame = synchronized { frames += df; df }
  def onRelease(hook: () => Unit): Unit = synchronized { hooks += hook }

  def releaseAll(): Unit = synchronized {
    frames.foreach(_.unpersist())
    frames.clear()
    hooks.foreach(_.apply())
  }
}
