package graft

/** Fixed-work CPU probe for CO-TENANT contention (r13 verdict task 1).
  *
  * The bench's hypervisor-steal reader (`/proc/stat` field 9) only sees
  * cycles the HOST stole from this guest; load from sibling cgroups /
  * processes inside the same guest stretches wall time with ZERO steal
  * ticks — r12 forensics caught dedup_minhash_big at 2.7× its quiet
  * median with nothing flagged. This probe measures the thing that
  * actually distorts a rep: effective CPU throughput of the whole box.
  * It runs one fixed-iteration integer-mix kernel per core on a
  * dedicated daemon pool and reports the barrier's wall seconds; when
  * N other runnable threads compete for the cores, the probe's wall
  * stretches by ~(cores+N)/cores — the same factor a 32-way Spark
  * stage suffers — regardless of whether the competition is hypervisor
  * steal, a co-tenant process, or another cgroup.
  *
  * Calibration is a min-of-reps at run start, but flagging always
  * compares against the RUNNING MIN of every probe seen (the quietest
  * observed window): a contended run start must not become a baseline
  * that hides later contention. The kernel's result is folded into a
  * volatile blackhole so the JIT cannot elide the work.
  */
object AmbientProbe {
  @volatile private var blackhole: Long = 0L

  val Threads: Int = Runtime.getRuntime.availableProcessors()

  /** ~8 ms/probe on a quiet 3 GHz-class core: long enough that OS
    * scheduling quanta average out, short enough that ~700 per-rep
    * probes cost under 10 s of a full-registry run.
    */
  private val Iters: Int = 2000000

  /** A rep BOTH of whose bracketing probes exceed `FlagRatio` × the
    * run's min probe rode co-tenant contention. The ratio is anchored
    * to MEASURED idle-box noise (ProbeSampleMain, this box: p50 1.18×,
    * p90 1.54×, p99 2.2× of min — scheduler quanta and GC pauses, not
    * contention): at 1.5× a retry-hardened probe ([[checkedProbe]],
    * min-of-3 when hot) false-fires ~1% of the time, and requiring both
    * brackets hot squares that again — while the 2-3× sustained
    * distortions the flag exists to catch (r12: dedup_minhash_big at
    * 2.7× quiet, zero steal ticks) hold every probe hot for minutes.
    */
  val FlagRatio = 1.5

  private lazy val pool = java.util.concurrent.Executors.newFixedThreadPool(
    Threads,
    new java.util.concurrent.ThreadFactory {
      private val n = new java.util.concurrent.atomic.AtomicInteger()
      def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"graft-probe-${n.getAndIncrement()}")
        t.setDaemon(true)
        t
      }
    })

  private def kernel(seed: Long): Long = {
    var h = seed
    var i = 0
    while (i < Iters) {
      h = h * 0x9E3779B97F4A7C15L + i
      h ^= h >>> 29
      i += 1
    }
    h
  }

  /** One fixed-work probe: `Threads` kernels in parallel, wall seconds
    * of the full barrier.
    */
  def probe(): Double = {
    val t0 = System.nanoTime()
    val fs = (0 until Threads).map { i =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = kernel(t0 + i)
      })
    }
    blackhole ^= fs.map(_.get()).reduce(_ ^ _)
    (System.nanoTime() - t0) / 1e9
  }

  /** Probe with up to two retries: a single-shot probe can ride a GC
    * pause or one scheduler hiccup; sustained co-tenant load holds all
    * three shots hot. Returns the min of the shots taken — retries fire
    * only while the running min reads hot against `baseline` (cheap in
    * the common case, self-limiting under real contention).
    */
  def checkedProbe(baseline: Double): Double = {
    var p = probe()
    var retries = 2
    while (retries > 0 && baseline > 0 && p > FlagRatio * baseline) {
      p = math.min(p, probe())
      retries -= 1
    }
    p
  }

  /** JIT-warm the kernel, then the min of `reps` probes. */
  def calibrate(reps: Int = 5): Double = {
    (1 to 3).foreach(_ => probe())
    (1 to reps).map(_ => probe()).min
  }
}
