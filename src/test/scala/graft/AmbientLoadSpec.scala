package graft

import org.scalatest.funsuite.AnyFunSuite

/** The ambient estimator's own-work accounting (r15): CPU burned by
  * DIRECT child processes must count as the suite's own load — the
  * race soak forks RaceChild JVMs, and before this fix an idle box
  * read ambient ~6 during that stage (the children's burst was
  * misattributed to "other processes"). */
class AmbientLoadSpec extends AnyFunSuite {

  test("childJiffies sees a CPU-burning direct child") {
    val base = AmbientLoad.childJiffies()
    assume(base >= 0, "/proc unavailable on this platform")
    // ~1-2 s of pure shell CPU in a direct child
    val p = new ProcessBuilder("sh", "-c",
      "i=0; while [ $i -lt 2000000 ]; do i=$((i+1)); done").start()
    try {
      val deadline = System.currentTimeMillis() + 15000
      var grew = false
      while (!grew && System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
        // ≥10 jiffies = 0.1 s of child CPU attributed to own work
        grew = AmbientLoad.childJiffies() - base >= 10
      }
      assert(grew, "a busy direct child never showed up in childJiffies")
    } finally {
      p.destroyForcibly()
      p.waitFor()
    }
  }

  test("sampler health surface: no errors, not dead, ambient finite") {
    AmbientLoad.start()
    Thread.sleep(2500)
    assert(!AmbientLoad.samplerDead, "sampler thread died")
    val a = AmbientLoad.ambientNow()
    assert(a == -1.0 || a >= 0.0)
    assert(AmbientLoad.ownEwma() >= 0.0)
  }

  // r16: the IO provenance sources the smoke stages and probe gates
  // read — each degrades to −1 off-Linux, never throws
  test("IoLoad sources read or degrade cleanly") {
    val (ps, pf) = IoLoad.psiTotals()
    assert(ps >= -1L && pf >= -1L)
    val (pr, pw) = IoLoad.procIo()
    assert(pr >= -1L && pw >= -1L)
    val io10 = IoLoad.ioSome10Now()
    assert(io10 == -1.0 || (io10 >= 0.0 && io10 <= 100.0))
    if (new java.io.File("/proc/pressure/io").exists()) {
      assert(ps >= 0L, "PSI present but some-total unparsed")
      assert(io10 >= 0.0, "PSI present but avg10 unparsed")
    }
  }

  test("IoLoad sees this process's own physical writes") {
    val (pr0, pw0) = IoLoad.procIo()
    assume(pw0 >= 0, "/proc/self/io unavailable")
    val f = java.nio.file.Files.createTempFile("graft-ioload", ".bin")
    try {
      // fsync forces the dirty pages to the block layer so write_bytes
      // moves deterministically (page-dirtying alone also counts, but
      // pin it hard)
      val ch = java.nio.channels.FileChannel.open(f,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        ch.write(java.nio.ByteBuffer.wrap(new Array[Byte](4 * 1024 * 1024)))
        ch.force(true)
      } finally ch.close()
      val (_, pw1) = IoLoad.procIo()
      assert(pw1 - pw0 >= 4L * 1024 * 1024,
        s"4MB fsync'd write moved write_bytes by only ${pw1 - pw0}")
    } finally java.nio.file.Files.deleteIfExists(f)
  }

  test("stageFields math: stall pct of wall, MB deltas, -1 degrade") {
    val b = IoLoad.Snap(psiSomeUs = 1000000L, psiFullUs = 0L,
      procReadBytes = 0L, procWriteBytes = 1048576L,
      fsReadBytes = -1L, fsWriteBytes = 0L, atNanos = 0L)
    val a = IoLoad.Snap(psiSomeUs = 2000000L, psiFullUs = 0L,
      procReadBytes = 10485760L, procWriteBytes = 1048576L,
      fsReadBytes = -1L, fsWriteBytes = 2097152L, atNanos = 4000000000L)
    val m = IoLoad.stageFields("x", b, a).toMap
    assert(m("x_io_stall") == 25.0)   // 1s stalled over a 4s wall
    assert(m("x_io_full") == 0.0)
    assert(m("x_io_rmb") == 10.0)
    assert(m("x_io_wmb") == 0.0)
    assert(m("x_fs_rmb") == -1.0)     // absent source degrades
    assert(m("x_fs_wmb") == 2.0)
  }
}
