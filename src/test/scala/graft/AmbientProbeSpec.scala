package graft

import org.scalatest.funsuite.AnyFunSuite

/** r13 verdict task 1: the fixed-work probe must catch synthetic
  * CO-TENANT load — CPU competition from inside the guest — which by
  * construction produces ZERO hypervisor-steal ticks, the exact blind
  * spot that let dedup_minhash_big publish a 2.7× median with nothing
  * flagged in r12.
  */
class AmbientProbeSpec extends AnyFunSuite {

  private def stealJiffies(): Long =
    try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/stat")),
        java.nio.charset.StandardCharsets.UTF_8)
      .linesIterator.next().split("\\s+")(8).toLong
    catch { case scala.util.control.NonFatal(_) => -1L }

  test("probe flags in-guest co-tenant load that steal ticks cannot see") {
    val calib = AmbientProbe.calibrate()
    assert(calib > 0.0)
    // synthetic co-tenant: one busy-spin thread per core IN THIS GUEST.
    // The volatile read per iteration keeps the JIT from eliding the loop.
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val s0 = stealJiffies()
    val w0 = System.nanoTime()
    val busy = (0 until AmbientProbe.Threads).map { i =>
      val t = new Thread(() => {
        var x = i.toLong
        while (!stop.get()) x = x * 6364136223846793005L + 1
        if (x == 42L) System.err.println(x) // blackhole
      }, s"cotenant-$i")
      t.setDaemon(true)
      t.start()
      t
    }
    val contended =
      try {
        Thread.sleep(50) // let the load establish
        AmbientProbe.probe()
      } finally {
        stop.set(true)
        busy.foreach(_.join(2000))
      }
    val wall = (System.nanoTime() - w0) / 1e9
    val st = stealJiffies() - s0
    // a full co-tenant load roughly halves effective throughput; the
    // probe must stretch past the flag ratio UNCONDITIONALLY — it is a
    // superset sensor (it also sees hypervisor steal, which only adds)
    assert(contended > AmbientProbe.FlagRatio * calib,
      s"probe did not flag: calib=$calib contended=$contended")
    // the blind-spot half: when the window's hypervisor steal stayed
    // under Bench's 5% flag bar, the steal sensor would NOT have
    // flagged this rep — yet the probe did. On this box the host often
    // steals under full guest load too (then steal ALSO sees it and
    // this half is vacuous for the run — report, don't fail: the
    // superset property above is the load-bearing claim).
    val ncores = Runtime.getRuntime.availableProcessors()
    val stealShare =
      if (s0 < 0 || wall <= 0) 0.0 else st.toDouble / (ncores * wall * 100.0)
    if (st <= 10 || stealShare < 0.05)
      info(f"steal stayed quiet (share $stealShare%.3f) — probe caught what steal missed")
    else
      info(f"hypervisor also stole this window (share $stealShare%.3f) — superset property still held")
  }

  test("checkedProbe retries a hot first shot and returns the min") {
    val calib = AmbientProbe.calibrate()
    // on a quiet box the checked probe should land near calibration —
    // and never ABOVE a plain probe's worst case by construction
    val p = AmbientProbe.checkedProbe(calib)
    assert(p > 0.0)
  }
}
