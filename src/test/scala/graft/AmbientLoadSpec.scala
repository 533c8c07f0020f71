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
}
