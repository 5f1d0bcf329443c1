package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.events.Temporal

/** Temporal join operators: semantic pins (as-of tie rules, range-join
  * exactness vs brute force) and the 100 TB plan-shape guarantees (the
  * binned range join must never plan a nested loop; the as-of join must
  * shuffle each side once, by user).
  */
class TemporalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("asof join: every purchase appears exactly once, matches precede") {
    val out = Temporal.asofJoin(spark, sf).collect()
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(out.length == purchases)
    out.filter(!_.isNullAt(3)).foreach { r =>
      assert(r.getAs[Long]("ms_since_click") >= 0,
        s"click after purchase: $r")
    }
  }

  test("asof join: matched click is the latest preceding one (brute-force check)") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_millis(col("ts")).as("t_ms"))
      .as[(Long, Long, String, Long)].collect()
    val clicks = ev.filter(_._3 == "click").groupBy(_._2)
    val expect = ev.filter(_._3 == "purchase").map { case (pid, uid, _, pms) =>
      val best = clicks.getOrElse(uid, Array.empty)
        .filter(_._4 <= pms) // tie at equal ms: click counts
        .sortBy(c => (c._4, c._1)).lastOption // then max event_id
      pid -> best.map(_._1)
    }.toMap
    val got = Temporal.asofJoin(spark, sf).collect().map { r =>
      r.getAs[Long]("purchase_id") ->
        (if (r.isNullAt(2)) None else Some(r.getAs[Long]("click_id")))
    }.toMap
    assert(got == expect)
  }

  test("range join: binned rewrite equals the brute-force theta join") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), unix_millis(col("ts")).as("t_ms"),
        col("value").cast("decimal(12,2)").as("v"))
    val inc = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("incident_id"), col("t_ms").as("start_ms"))
    val brute = inc.join(ev,
        col("t_ms") > col("start_ms") && col("t_ms") < col("start_ms") + 3600000L,
        "left")
      .groupBy(col("incident_id"))
      .agg(count(col("event_id")).as("n_events"),
        coalesce(sum(col("v")), lit(0).cast("decimal(22,2)"))
          .cast("double").as("sum_value"))
    val got = Temporal.rangeJoin(spark, sf)
    assert(got.exceptAll(brute).isEmpty && brute.exceptAll(got).isEmpty)
  }

  test("range join plans as an equi-join on the bin, never a nested loop") {
    val p = plan(Temporal.rangeJoin(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"nested loop in range join:\n$p")
  }

  test("asof join shuffles by user once and never expands pairs") {
    val p = plan(Temporal.asofJoin(spark, sf))
    assert(!p.contains("Join"), s"as-of should be window-only, no join operator:\n$p")
    assert(p.contains("Window"), p)
  }

  test("user deltas: gaps are positive and first-event rows are null") {
    val rows = Temporal.userDeltas(spark, sf).collect()
    val users = Tables.events(spark, sf).select(col("user_id")).distinct().count()
    assert(rows.count(_.isNullAt(3)) == users) // one null gap per user
    rows.filter(!_.isNullAt(3)).foreach(r => assert(r.getAs[Long]("gap_ms") > 0))
  }

  test("rollup: level rows reconcile (grand total == sum of type rows)") {
    val rows = Temporal.rollupDaily(spark, sf).collect()
    val grand = rows.filter(_.getAs[Long]("lvl") == 3)
    assert(grand.length == 1)
    val typeRows = rows.filter(_.getAs[Long]("lvl") == 1)
    assert(typeRows.map(_.getAs[Long]("n")).sum == grand.head.getAs[Long]("n"))
    val leafRows = rows.filter(_.getAs[Long]("lvl") == 0)
    assert(leafRows.map(_.getAs[Long]("n")).sum == grand.head.getAs[Long]("n"))
  }

  test("funnel stages are ordered and complete") {
    val rows = Temporal.funnel(spark, sf).collect()
    val signups = Tables.events(spark, sf)
      .filter(col("event_type") === "signup")
      .select(col("user_id")).distinct().count()
    assert(rows.length == signups)
    rows.foreach { r =>
      val stage = r.getAs[Long]("stage")
      assert(stage >= 1 && stage <= 3)
      assert((stage >= 2) == !r.isNullAt(2)) // c_ms present iff stage >= 2
      assert((stage == 3) == !r.isNullAt(3))
      if (stage >= 2) assert(r.getAs[Long]("c_ms") >= r.getAs[Long]("s_ms"))
      if (stage == 3) assert(r.getAs[Long]("p_ms") >= r.getAs[Long]("c_ms"))
    }
  }

  test("cohort matrix: every user is active on their cohort day") {
    val rows = Temporal.cohortRetention(spark, sf).collect()
      .map(r => (r.getAs[Long]("cohort_day"), r.getAs[Long]("active_day"),
        r.getAs[Long]("n_users")))
    val users = Tables.events(spark, sf).select(col("user_id")).distinct().count()
    val diagonal = rows.filter(t => t._1 == t._2).map(_._3).sum
    assert(diagonal == users) // first-event day is an active day by definition
    rows.foreach(t => assert(t._2 >= t._1, "active before cohort entry"))
  }

  test("unpivoting the type pivot recovers the per-(user, type) counts") {
    val p = Temporal.typePivot(spark, sf)
    val types = Seq("click", "error", "purchase", "signup", "view")
    val un = p.unpivot(Array(col("user_id")), types.map(col).toArray, "event_type", "n")
      .where(col("n") > 0)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val direct = Tables.events(spark, sf)
      .groupBy(col("user_id"), col("event_type")).count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(un == direct)
  }

  test("rolling 7-day actives match a driver-side window replay") {
    val du = Tables.events(spark, sf)
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct().collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val days = du.map(_._1).distinct
    val expect = days.map { d =>
      val active = du.collect {
        case (dd, u) if !dd.isAfter(d) && dd.isAfter(d.minusDays(7)) => u
      }.distinct.length.toLong
      val today = du.collect { case (dd, u) if dd == d => u }.distinct.length.toLong
      d.toString -> (active, today)
    }.toMap
    val got = Temporal.activeUsers(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_active_7d"), r.getAs[Long]("n_active_1d"))).toMap
    assert(got == expect)
  }

  test("MAD z-scores match a driver-side median replay") {
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val pos = 0.5 * (s.length - 1)
      val lo = pos.toInt
      val frac = pos - lo
      if (frac == 0) s(lo) else s(lo) + (s(lo + 1) - s(lo)) * frac
    }
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), col("value").cast("double"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val byType = ev.groupBy(_._2)
    val want: Map[Long, Double] = byType.toSeq.flatMap { case (_, rows) =>
      val vs = rows.map(_._3).toSeq
      val med = r6(median(vs))
      val mad = r6(median(vs.map(v => math.abs(v - med))))
      rows.toSeq.map { case (id, _, v) => id -> r6(0.6745 * (v - med) / mad) }
    }.toMap
    val got = Temporal.madZscores(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("rz")).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (id, w) => assert(got(id) == w, s"event $id: ${got(id)} vs $w") }
  }

  test("approx_count_distinct tracks the exact distinct counts (HLL drop-in)") {
    val exact = Temporal.distinctUsers(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_users")).toMap
    val approx = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("n_users"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_users")).toMap
    exact.foreach { case (t, e) =>
      assert(math.abs(approx(t) - e) <= math.max(3.0, e * 0.05),
        s"HLL drifted for $t: exact=$e approx=${approx(t)}")
    }
  }

  test("approx rolling actives track the exact window (the 100 TB drop-in)") {
    // the documented drop-in: approx_count_distinct over the SAME
    // day-fan-out plan shape, bounded sketch instead of the exact expand
    val du = Tables.events(spark, sf)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val days = du.select(col("day").as("rday")).distinct()
    val approx = du.select(col("day"), col("user_id"),
        explode(sequence(lit(0), lit(6))).as("i"))
      .select(date_add(col("day"), col("i")).as("rday"), col("user_id"))
      .join(broadcast(days), "rday")
      .groupBy(col("rday"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("n"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val exact = Temporal.activeUsers(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_active_7d")).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (d, e) =>
      assert(math.abs(approx(d) - e) <= math.max(3.0, e * 0.05),
        s"HLL drifted on $d: exact=$e approx=${approx(d)}")
    }
  }

  test("percentile_approx tracks the exact quantiles (the 100 TB drop-in)") {
    val exact = Temporal.valueQuantiles(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("p50")).toMap
    val approx = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("p50")).toMap
    exact.foreach { case (t, e) =>
      assert(math.abs(approx(t) - e) <= math.abs(e) * 0.02 + 1.0,
        s"approx p50 drifted for $t: exact=$e approx=${approx(t)}")
    }
  }

  test("MAD z-score: a constant-valued type (MAD=0) yields NULL, not inf") {
    import spark.implicits._
    // type "const": every value 5.0 -> MAD 0; type "vary": real spread
    val ev = Seq(
      (1L, "const", 5.0), (2L, "const", 5.0), (3L, "const", 5.0),
      (4L, "vary", 1.0), (5L, "vary", 2.0), (6L, "vary", 9.0))
      .toDF("event_id", "event_type", "v")
    val rz = Temporal.madZscoresOn(ev).collect()
      .map(r => r.getLong(0) -> Option(r.getAs[java.lang.Double]("rz"))).toMap
    assert(Seq(1L, 2L, 3L).forall(rz(_).isEmpty), "MAD=0 must yield NULL rz")
    assert(Seq(4L, 5L, 6L).forall(id => rz(id).exists(d => !d.isNaN && !d.isInfinite)))
  }

  test("decay score matches a scalar fold over collected events") {
    val out = Temporal.decayScore(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date]("day").toLocalDate, r.getDouble(2)))
    val horizon = ev.map(_._2).maxBy(_.toEpochDay)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val want = ev.groupBy(_._1).map { case (u, rows) =>
      val score = rows.map { case (_, day, v) =>
        val wk = math.min((horizon.toEpochDay - day.toEpochDay) / 7, 62L)
        r6(v / (1L << wk).toDouble)
      }.sum
      u -> (rows.length.toLong, score.toDouble)
    }
    assert(out == want)
  }

  test("merged histogram quantiles: estimates track the exact percentiles") {
    import org.apache.spark.sql.functions.{col, round => sround, percentile, lit}
    val est = Temporal.quantilesMerged(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val exact = Tables.events(spark, sf).groupBy(col("event_type"))
      .agg(sround(percentile(col("value"), lit(0.5)), 6).as("p50"),
        sround(percentile(col("value"), lit(0.9)), 6).as("p90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(est.keySet == exact.keySet)
    est.foreach { case (t, (p50e, p90e)) =>
      // unit-width buckets: the rank-walk midpoint tracks the
      // interpolated exact percentile to a few buckets wherever the
      // distribution has mass (values themselves are hash-gated; this
      // tracks accuracy, p99's clamp-exposed tail is not bounded)
      assert(math.abs(p50e - exact(t)._1) <= 2.0, s"$t p50 $p50e vs ${exact(t)._1}")
      assert(math.abs(p90e - exact(t)._2) <= 5.0, s"$t p90 $p90e vs ${exact(t)._2}")
    }
    // linearity certificate: the artifacts' bucket-wise merge equals the
    // whole-corpus histogram exactly (same contract as the CM merge)
    graft.Caches.releaseAll()
  }

  test("ewma 40-lag truncation matches the sequential recurrence beyond day 41") {
    // the fixture calendar is 30 days per type, so the gate never fires
    // the t−40 cutoff — this series is 60 days, so days 42..60 DROP the
    // oldest lags and the scaladoc's bound (dropped tail < 2^14·2^−40,
    // strictly below the 6-dp grid) must hold against the untruncated
    // sequential fold s_t = (x_t + s_{t−1})/2, s_1 = x_1
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val days = 60
    val counts = (1 to days).map(t => ((t * 37) % 1000) + 1)
    val ev = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)((java.time.LocalDate.of(2024, 1, 1).plusDays(i).toString, "click"))
    }.toDF("d", "event_type")
      .select(col("event_type"), to_timestamp(col("d")).as("ts"))
    val got = graft.events.Temporal.ewmaEvents(ev)
      .orderBy("day").collect()
      .map(r => (r.getString(1), r.getDouble(3)))
    assert(got.length == days)
    // untruncated sequential fold: every term an exact power-of-two
    // scaled integer, so the Double fold is exact
    val seq = counts.map(_.toDouble).scanLeft(Option.empty[Double]) {
      case (None, x)    => Some(x)
      case (Some(s), x) => Some((x + s) / 2.0)
    }.flatten
    got.zip(seq).zipWithIndex.foreach { case (((day, g), s), i) =>
      assert(math.abs(g - s) <= 6e-7,
        s"day $day (t=${i + 1}): ewma $g vs sequential $s")
    }
  }
}
