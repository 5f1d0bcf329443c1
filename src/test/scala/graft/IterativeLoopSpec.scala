package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.graph.IterativeLoop

/** Contract tests for the shared iterative-loop harness the six graph/ML
  * driver loops run on: fixed-budget composition, convergence-probe
  * semantics, the oracle-depth round cap, and cache lifecycle.
  */
class IterativeLoopSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("fixedBudget composes exactly `rounds` steps as one lazy plan") {
    import spark.implicits._
    val init = Seq(1L).toDF("v")
    var stepsComposed = 0
    val out = IterativeLoop.fixedBudget(init, rounds = 5) { (df, i) =>
      stepsComposed += 1
      assert(i == stepsComposed, "steps see 1-based round numbers in order")
      df.select((col("v") * 2).as("v"))
    }
    assert(stepsComposed == 5, "composition is eager, execution lazy")
    assert(out.head().getLong(0) == 32L) // 1 * 2^5
  }

  test("fixedBudget cutEvery=0 never re-cuts (step cuts internally)") {
    import spark.implicits._
    val out = IterativeLoop.fixedBudget(Seq(3L).toDF("v"), rounds = 3, cutEvery = 0) {
      (df, _) => df.select((col("v") + 1).as("v")).localCheckpoint(eager = false)
    }
    assert(out.head().getLong(0) == 6L)
  }

  test("converge runs until the probe says done and returns the final state") {
    import spark.implicits._
    // state: one row counting down from 5; halt when it reaches 0
    val init = Seq(5L).toDF("v")
    var rounds = 0
    val out = IterativeLoop.converge[Long](init, maxRounds = 10, what = "countdown")(
      (df, _) => { rounds += 1; df.select((col("v") - 1).as("v")) })(
      _.head().getLong(0))(
      (_, p, _, _) => p == 0L)
    assert(rounds == 5)
    assert(out.head().getLong(0) == 0L)
  }

  test("converge feeds the previous probe to the halt decision") {
    import spark.implicits._
    // fixpoint detection via probe equality: v -> max(v - 1, 2)
    val init = Seq(5L).toDF("v")
    val out = IterativeLoop.converge[Long](
      init, maxRounds = 10, what = "fixpoint", initialProbe = Some(5L))(
      (df, _) => df.select(greatest(col("v") - 1, lit(2L)).as("v")))(
      _.head().getLong(0))(
      (prev, p, _, _) => prev.contains(p))
    assert(out.head().getLong(0) == 2L)
  }

  test("converge throws past maxRounds instead of diverging from the oracle") {
    import spark.implicits._
    val init = Seq(1L).toDF("v")
    val e = intercept[IllegalArgumentException] {
      IterativeLoop.converge[Long](init, maxRounds = 3, what = "runaway")(
        (df, _) => df)(_.head().getLong(0))((_, _, _, _) => false)
    }
    assert(e.getMessage.contains("runaway"))
    assert(e.getMessage.contains("3"))
  }

  test("converge unpersists superseded states (and keeps them with dropSuperseded=false)") {
    import spark.implicits._
    var seen = List.empty[org.apache.spark.sql.DataFrame]
    def run(drop: Boolean): List[org.apache.spark.sql.DataFrame] = {
      seen = Nil
      IterativeLoop.converge[Long](
        Seq(3L).toDF("v"), maxRounds = 10, what = "lifecycle",
        dropSuperseded = drop)(
        (df, _) => df.select((col("v") - 1).as("v")))(
        df => { seen ::= df; df.head().getLong(0) })(
        (_, p, _, _) => p == 0L)
      seen
    }
    val dropped = run(drop = true)
    // all but the FINAL state were unpersisted eagerly
    assert(dropped.tail.forall(_.storageLevel == org.apache.spark.storage.StorageLevel.NONE))
    assert(dropped.head.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
    val kept = run(drop = false)
    assert(kept.forall(_.storageLevel != org.apache.spark.storage.StorageLevel.NONE))
    Caches.releaseAll()
  }
}
