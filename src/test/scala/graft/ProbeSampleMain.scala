package graft

/** Probe-noise sampler (dev tool): prints the AmbientProbe distribution
  * on the current box so the flag ratio can be anchored to measured
  * quiet-box noise instead of guesses. Run with
  * `sbt "Test/runMain graft.ProbeSampleMain [n] [sleepMs]"` on an idle
  * box (and again alongside a running bench) to see both regimes.
  */
object ProbeSampleMain {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(120)
    val sleepMs = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val calib = AmbientProbe.calibrate()
    val ps = (1 to n).map { _ => Thread.sleep(sleepMs); AmbientProbe.probe() }
    val s = ps.sorted
    def pct(q: Double) = s(math.min(s.size - 1, (q * s.size).toInt))
    println(f"calib $calib%.4f min ${s.head}%.4f p10 ${pct(0.1)}%.4f " +
      f"p50 ${pct(0.5)}%.4f p90 ${pct(0.9)}%.4f p99 ${pct(0.99)}%.4f max ${s.last}%.4f")
    Seq(1.25, 1.4, 1.6, 2.0).foreach { r =>
      println(f"share>${r}x-min: ${s.count(_ > r * s.head).toDouble / s.size}%.3f")
    }
  }
}
