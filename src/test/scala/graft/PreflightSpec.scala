package graft

import org.scalatest.funsuite.AnyFunSuite

/** The scratch preflight's decision logic against synthetic disk
  * states (the real sf100 shortfall can't be reproduced in CI, so the
  * pure `warning` function is the tested surface — `check` only wires
  * it to a footer count and `getUsableSpace`). */
class PreflightSpec extends AnyFunSuite {

  test("scratch preflight fires on synthetic low disk, silent with headroom") {
    // the sf100 corpus (5M docs) must estimate in the ballpark of the
    // measured ~68 GB containment-verify peak — calibration drift law
    val est = core.ScratchPreflight.estimateBytes(5000000L)
    assert(est > 60L * 1000 * 1000 * 1000 && est < 90L * 1000 * 1000 * 1000,
      s"calibration drifted from the measured sf100 peak: $est bytes")
    // 10 GB free against a ~73 GB estimate → warn, and the warning
    // names the remedy
    val w = core.ScratchPreflight.warning(est, 10L << 30, Seq("/tmp"))
    assert(w.nonEmpty, "low-disk simulation must fire the preflight")
    assert(w.get.contains("SPARK_LOCAL_DIRS"), "warning must name the remedy")
    // 200 GB free → silent
    assert(core.ScratchPreflight.warning(est, 200L << 30, Seq("/tmp")).isEmpty)
    // end-to-end on the test corpus: a 500-doc estimate is KBs — the
    // real check must pass on any machine that can run the suite
    assert(core.ScratchPreflight.check(TestSpark.spark, TestSpark.Sf).isEmpty,
      "test-scale preflight must be silent")
  }
}
