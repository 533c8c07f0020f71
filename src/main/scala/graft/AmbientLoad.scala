package graft

/** Ambient-load estimator shared by [[Bench]], [[ScaleSmoke]], and the
  * standalone probe tools (VERDICT r13 #1, generalized r15): the 1-min
  * loadavg right after a timed stage mostly measures the suite's OWN
  * just-finished work, so a raw-load1 gate rejects windows that are
  * genuinely quiet. A daemon thread samples THIS process's CPU usage
  * every 2 s and folds it into an EWMA with the same 60 s time constant
  * the kernel's 1-min loadavg uses;
  * `ambient = max(0, load1 − ownEwma)` estimates the load OTHER
  * processes put on the box — the thing that actually contends with a
  * probe.
  *
  * Own-work accounting covers this JVM plus its DIRECT child
  * processes (r15): the race soak forks RaceChild JVMs whose CPU the
  * process-MXBean cannot see, and on an otherwise-idle box the race
  * stage's ambient read ~6 — permanently "contaminated" in the
  * record. Child CPU is summed from `/proc/<pid>/stat` utime+stime of
  * processes whose ppid is this JVM (Linux; degrades to JVM-only
  * elsewhere), so a forked probe's burst is the suite's own load, not
  * ambient.
  *
  * Remaining blind spots, recorded here as the field's provenance
  * (ADVICE r14): (a) grandchildren and children that exit between
  * 2 s samples are partially missed; (b) loadavg on Linux includes
  * D-state (uninterruptible IO) tasks while process CPU does not, so
  * this JVM's own IO-bound stalls read as ambient. Both biases are
  * conservative for gating (they can only make a quiet box look busy,
  * never a busy box look quiet).
  *
  * Sampler robustness (ADVICE r14): the sampling loop is
  * exception-guarded — one OS-bean quirk must not silently kill the
  * thread and freeze the EWMA at a stale value with no trace in the
  * record. Recoverable exceptions (NonFatal) count in
  * [[samplerErrors]] and the loop continues; a fatal Error or a
  * thread interrupt kills the loop and flips [[samplerDead]] — both
  * land in the bench JSON, so a frozen EWMA is always attributable
  * from the artifact.
  */
private[graft] object AmbientLoad {
  private val ownEwmaBits = new java.util.concurrent.atomic.AtomicLong(
    java.lang.Double.doubleToLongBits(0.0))
  private val errors = new java.util.concurrent.atomic.AtomicLong(0L)
  @volatile private var dead = false
  @volatile private var started = false

  private def cpus: Int =
    try Runtime.getRuntime.availableProcessors() catch { case _: Throwable => 1 }

  /** Total utime+stime jiffies of this process's DIRECT children:
    * enumerated via ProcessHandle.current().children() (exactly the
    * direct children — no /proc-wide scan filtering by ppid, which on
    * a busy multi-tenant box would open thousands of stat files every
    * 2 s), jiffies read from each child's /proc/<pid>/stat (Linux);
    * -1 where either is unavailable. */
  private[graft] def childJiffies(): Long = {
    val kids = try {
      import scala.jdk.CollectionConverters._
      ProcessHandle.current().children().iterator().asScala.toSeq
    } catch { case _: Throwable => return -1L }
    if (!new java.io.File("/proc/self/stat").exists()) return -1L
    var total = 0L
    kids.foreach { h =>
      try {
        val stat = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"/proc/${h.pid()}/stat")), "UTF-8")
        // fields after the parenthesized comm (which may contain
        // spaces): state ppid pgrp ... utime(11) stime(12)
        val rest = stat.substring(stat.lastIndexOf(')') + 2).split(' ')
        if (rest.length > 12)
          total += rest(11).toLong + rest(12).toLong
      } catch { case _: Throwable => () } // child exited mid-read
    }
    total
  }

  /** Idempotent: the first caller starts the daemon sampler. */
  def start(): Unit = synchronized {
    if (started) return
    started = true
    val t = new Thread(() => {
      val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      var last = System.nanoTime()
      var lastChild = childJiffies()
      try {
        while (true) {
          Thread.sleep(2000)
          try {
            val now = System.nanoTime()
            val dt = (now - last) / 1e9
            last = now
            // children: USER_HZ is 100 on Linux /proc regardless of the
            // kernel tick; an exiting child drops out of the cumulative
            // sum (negative delta) — clamp, never subtract own work
            val curChild = childJiffies()
            val childCores =
              if (curChild < 0 || lastChild < 0 || dt <= 0) 0.0
              else math.max(0.0, (curChild - lastChild) / 100.0 / dt)
            lastChild = curChild
            val own = os match {
              case b: com.sun.management.OperatingSystemMXBean =>
                val f = b.getProcessCpuLoad
                if (f >= 0) f * cpus + childCores else -1.0
              case _ => -1.0
            }
            if (own >= 0) {
              val prev = java.lang.Double.longBitsToDouble(ownEwmaBits.get)
              val next = prev + (own - prev) * (1 - math.exp(-dt / 60.0))
              ownEwmaBits.set(java.lang.Double.doubleToLongBits(next))
            }
          } catch {
            // NonFatal only: an Error (OOM, etc.) must not keep a
            // possibly-corrupted sampler alive reporting healthy — it
            // propagates to the outer catch and flips samplerDead
            case scala.util.control.NonFatal(t) =>
              errors.incrementAndGet()
              System.err.println(
                s"[ambient] sampler error (continuing): ${t.getClass.getSimpleName}: ${t.getMessage}")
          }
        }
      } catch { case _: Throwable => dead = true }
    }, "graft-ambient-load")
    t.setDaemon(true)
    t.start()
  }

  def load1Now(): Double = try {
    java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .getSystemLoadAverage
  } catch { case _: Throwable => -1.0 }

  def ownEwma(): Double =
    java.lang.Double.longBitsToDouble(ownEwmaBits.get)

  /** External-load estimate; −1 when loadavg itself is unavailable.
    * Callers that never called [[start]] get raw load1 (EWMA 0). */
  def ambientNow(): Double = {
    val l = load1Now()
    if (l < 0) l else math.max(0.0, l - ownEwma())
  }

  def samplerErrors: Long = errors.get
  def samplerDead: Boolean = dead
}

/** IO-pressure and IO-volume provenance (VERDICT r15 #1): the
  * CPU-based [[AmbientLoad]] estimator cannot see page-cache or
  * writeback (D-state) pressure, which made the IO-bound index-build
  * smoke stages swing ±60% with no attributable cause in the record
  * (containment_index: 360.7 s at CPU-ambient 0.1 vs 166–199 s in
  * quiet legs). Three Linux sources, each optional (−1 when absent):
  *
  *  - `/proc/pressure/io` PSI totals (µs any-task-stalled "some" and
  *    all-tasks-stalled "full") — SYSTEM-WIDE IO pressure; a stage's
  *    delta ÷ wall is the fraction of the window the box spent
  *    IO-stalled. Includes our own IO, so it attributes "this window
  *    was IO-pressured", not who caused it — exactly the signal the
  *    CPU ambient lacks.
  *  - `/proc/self/io` read_bytes / write_bytes — bytes this process
  *    PHYSICALLY moved through the block layer (read_bytes counts
  *    page-cache MISSES only; write_bytes is accounted at
  *    page-dirtying time), so a stage re-run that jumps from ~0 to
  *    corpus-sized read_bytes was a cold-cache run.
  *  - Hadoop [[org.apache.hadoop.fs.GlobalStorageStatistics]]
  *    bytesRead / bytesWritten summed over schemes — the LOGICAL
  *    bytes the stage pushed through the FileSystem API (local mode:
  *    executor threads share this JVM, so the totals are complete).
  *    Deterministic per plan; the denominator for "did the rewrite
  *    actually shrink the IO". CAVEAT (measured): `bytesWritten` is
  *    complete, but Spark's vectorized parquet reader pulls data
  *    pages outside the statistics-wrapped stream — reading an
  *    8.4 MB parquet moves `bytesRead` by only ~24 KB (footers).
  *    Use `fs_wmb` for write-volume A/Bs and `io_rmb` (physical,
  *    cache-miss) for the read side.
  */
private[graft] object IoLoad {
  final case class Snap(psiSomeUs: Long, psiFullUs: Long,
                        procReadBytes: Long, procWriteBytes: Long,
                        fsReadBytes: Long, fsWriteBytes: Long,
                        atNanos: Long)

  private def readProcFile(path: String): Option[String] =
    try Some(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))
    catch { case _: Throwable => None }

  /** (someTotalUs, fullTotalUs) from /proc/pressure/io; (-1,-1) when
    * PSI is unavailable (non-Linux, CONFIG_PSI off). */
  private[graft] def psiTotals(): (Long, Long) =
    readProcFile("/proc/pressure/io").map { txt =>
      def total(line: String): Long =
        line.split(' ').collectFirst {
          case f if f.startsWith("total=") => f.stripPrefix("total=").toLong
        }.getOrElse(-1L)
      val lines = txt.split('\n')
      (lines.find(_.startsWith("some")).map(total).getOrElse(-1L),
       lines.find(_.startsWith("full")).map(total).getOrElse(-1L))
    }.getOrElse((-1L, -1L))

  /** (read_bytes, write_bytes) from /proc/self/io; (-1,-1) elsewhere. */
  private[graft] def procIo(): (Long, Long) =
    readProcFile("/proc/self/io").map { txt =>
      def field(k: String): Long = txt.split('\n')
        .find(_.startsWith(k + ":"))
        .map(_.split(':')(1).trim.toLong).getOrElse(-1L)
      (field("read_bytes"), field("write_bytes"))
    }.getOrElse((-1L, -1L))

  /** (bytesRead, bytesWritten) summed over every Hadoop FS scheme's
    * global storage statistics; (-1,-1) if the walk throws. */
  private[graft] def fsBytes(): (Long, Long) =
    try {
      var r = 0L; var w = 0L
      val it = org.apache.hadoop.fs.GlobalStorageStatistics.INSTANCE.iterator()
      while (it.hasNext) {
        val s = it.next()
        val br = s.getLong("bytesRead"); val bw = s.getLong("bytesWritten")
        if (br != null) r += br.longValue()
        if (bw != null) w += bw.longValue()
      }
      (r, w)
    } catch { case _: Throwable => (-1L, -1L) }

  def snap(): Snap = {
    val (ps, pf) = psiTotals()
    val (pr, pw) = procIo()
    val (fr, fw) = fsBytes()
    Snap(ps, pf, pr, pw, fr, fw, System.nanoTime())
  }

  /** PSI "some" 10-second average (%, 0–100) — the gate-grade instant
    * IO-pressure read, PSI's own EWMA over the last 10 s; −1 when
    * unavailable. The IO analogue of [[AmbientLoad.ambientNow]], minus
    * the own-work subtraction (PSI cannot attribute stall to a
    * process — callers gate on "the box is IO-quiet", which own
    * writeback from a prior rep delays but quiet-waiting absorbs). */
  def ioSome10Now(): Double =
    readProcFile("/proc/pressure/io").flatMap { txt =>
      txt.split('\n').find(_.startsWith("some")).flatMap(_.split(' ')
        .collectFirst { case f if f.startsWith("avg10=") =>
          f.stripPrefix("avg10=").toDouble })
    }.getOrElse(-1.0)

  /** Per-stage delta fields: stall percentages of the wall window plus
    * physical and logical MB moved. −1 where a source was absent. */
  def stageFields(prefix: String, before: Snap, after: Snap): Seq[(String, Double)] = {
    val wallUs = math.max(1L, (after.atNanos - before.atNanos) / 1000L)
    def pct(b: Long, a: Long): Double =
      if (b < 0 || a < 0) -1.0 else 100.0 * math.max(0L, a - b) / wallUs
    def mb(b: Long, a: Long): Double =
      if (b < 0 || a < 0) -1.0 else math.max(0L, a - b) / 1048576.0
    Seq(
      s"${prefix}_io_stall" -> pct(before.psiSomeUs, after.psiSomeUs),
      s"${prefix}_io_full" -> pct(before.psiFullUs, after.psiFullUs),
      s"${prefix}_io_rmb" -> mb(before.procReadBytes, after.procReadBytes),
      s"${prefix}_io_wmb" -> mb(before.procWriteBytes, after.procWriteBytes),
      s"${prefix}_fs_rmb" -> mb(before.fsReadBytes, after.fsReadBytes),
      s"${prefix}_fs_wmb" -> mb(before.fsWriteBytes, after.fsWriteBytes))
  }
}
