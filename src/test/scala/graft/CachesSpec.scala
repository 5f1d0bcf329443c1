package graft

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** Memo-lifecycle contract: [[Caches]] frames persist for the whole
  * Verify/Bench run, and [[Caches.releaseAll]] must actually unpersist
  * every one of them and clear the memo map — a leak here grows silently
  * with the registry (90+ queries share the shingle scan, pair graph,
  * dup-group labels and IR index through this object).
  */
class CachesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("releaseAll unpersists every registered frame and clears the memo") {
    import spark.implicits._
    var builds = 0
    def build() = { builds += 1; Seq(1, 2, 3).toDF("x") }

    val a = Caches.memoized(spark, "caches-spec", "a")(build())
    val b = Caches.register(Seq(4, 5).toDF("y").persist())
    a.count(); b.count()
    assert(a.storageLevel != StorageLevel.NONE, "memoized frame not persisted")
    assert(b.storageLevel != StorageLevel.NONE, "registered frame not persisted")

    // memo hit: same (session, dir, key) returns the cached frame, no rebuild
    val a2 = Caches.memoized(spark, "caches-spec", "a")(build())
    assert(builds == 1)
    assert(a2 eq a)

    Caches.releaseAll()
    assert(a.storageLevel == StorageLevel.NONE, "memoized frame leaked past releaseAll")
    assert(b.storageLevel == StorageLevel.NONE, "registered frame leaked past releaseAll")

    // memo cleared: the next request rebuilds (and re-registers) cleanly
    val a3 = Caches.memoized(spark, "caches-spec", "a")(build())
    assert(builds == 2)
    a3.count()
    assert(a3.storageLevel != StorageLevel.NONE)
    Caches.releaseAll()
    assert(a3.storageLevel == StorageLevel.NONE)
  }

  test("nested memoized builds (builder memoizes sub-frames) register cleanly") {
    import spark.implicits._
    val outer = Caches.memoized(spark, "caches-spec", "outer") {
      val inner = Caches.memoized(spark, "caches-spec", "inner")(Seq(1, 2).toDF("x"))
      inner.select(org.apache.spark.sql.functions.col("x") * 2)
    }
    outer.count()
    val (frames, memoSize) = Caches.snapshot
    assert(memoSize >= 2, "both nesting levels should be memoized")
    Caches.releaseAll()
    assert(frames.forall(_.storageLevel == StorageLevel.NONE))
    assert(Caches.snapshot._2 == 0)
  }

  test("concurrent memoized builds do not serialize behind the monitor") {
    import spark.implicits._
    import java.util.concurrent.{CountDownLatch, TimeUnit}
    // Thread A enters its build and then WAITS for thread B to complete a
    // memoized build of a different key. Under the old design (whole
    // build under the object monitor) this deadlocks: B blocks on the
    // monitor A holds, A waits on B. Under the epoch-guard design builds
    // run unlocked, so B finishes and A completes.
    val aStarted = new CountDownLatch(1)
    val bDone = new CountDownLatch(1)
    @volatile var aOk = false
    val tA = new Thread(() => {
      Caches.memoized(spark, "caches-spec", "slowA") {
        aStarted.countDown()
        aOk = bDone.await(30, TimeUnit.SECONDS)
        Seq(1).toDF("x")
      }
    })
    tA.start()
    assert(aStarted.await(30, TimeUnit.SECONDS), "builder A never started")
    Caches.memoized(spark, "caches-spec", "fastB")(Seq(2).toDF("y"))
    bDone.countDown()
    tA.join(30000)
    assert(!tA.isAlive, "builder A deadlocked behind builder B")
    assert(aOk, "builder A timed out waiting for B — monitor still held across builds")
    assert(Caches.snapshot._2 >= 2, "both keys should be memoized")
    Caches.releaseAll()
  }

  test("a release racing a build does not resurrect the entry") {
    import spark.implicits._
    // the build itself triggers releaseAll — the single-threaded stand-in
    // for a concurrent release landing mid-build (builds run OUTSIDE the
    // monitor, so this no longer deadlocks or serializes releases)
    val df = Caches.memoized(spark, "caches-spec", "raced") {
      Caches.releaseAll()
      Seq(1).toDF("x")
    }
    df.count()
    assert(df.storageLevel == StorageLevel.NONE,
      "a frame whose build raced a release must come back unpersisted")
    assert(Caches.snapshot._2 == 0,
      "a raced build must not re-insert into the released memo")
  }

  /** The registry-wide leak guard: materialize EVERY registered query at
    * the smoke tier (a full Verify-shaped pass — this is also the one
    * place all 100+ queries execute under `sbt test`), then prove
    * releaseAll unpersists every frame the pass registered and empties
    * the memo. A leak here grows with the registry, which is exactly
    * when it would start to hurt.
    */
  test("a full registry pass releases every memoized frame") {
    val sf = TestSpark.sf
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try fn(spark, sf).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => fail(s"$name failed at smoke tier: ${e.getMessage}") }
    }
    val (frames, memoSize) = Caches.snapshot
    assert(frames.nonEmpty && memoSize > 0, "pass should have populated the memo")
    Caches.releaseAll()
    val leaked = frames.filter(_.storageLevel != StorageLevel.NONE)
    assert(leaked.isEmpty, s"${leaked.size} frames leaked past releaseAll")
    assert(Caches.snapshot._2 == 0, "memo not emptied")
  }
}
