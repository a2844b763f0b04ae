package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's cross-artifact gate predicate and the stale-redefined
  * audit (r13 VERDICT item 7: a stale entry in the checked-in
  * BENCH_REDEFINED.txt now FAILS the run instead of warning, so the file
  * cannot accumulate disarmed entries). Pure functions — the sweep runs
  * exactly these.
  */
class BenchGateSpec extends AnyFunSuite {

  test("wouldFlag: 2x load-normalized with absolute floors") {
    assert(Bench.wouldFlag(10.0, 1.0, 1.0)) // 10x raw
    assert(!Bench.wouldFlag(10.0, 1.0, 10.0), "calibration normalizes a uniform machine factor")
    assert(Bench.wouldFlag(10.0, 1.0, 4.0), "2.5x normalized still flags")
    assert(!Bench.wouldFlag(0.09, 0.04, 1.0), "baseline under the 50ms floor never flags")
    assert(!Bench.wouldFlag(0.65, 0.3, 1.0), "2.2x but delta under the 0.5s floor")
    assert(!Bench.wouldFlag(1.9, 1.0, 1.0), "under 2x")
  }

  test("staleRedefined: a deliberately stale declaration is caught; a load-bearing one is kept") {
    val baseline = Map("q_regressed" -> 1.0, "q_fine" -> 1.0)
    val med = Map("q_regressed" -> 5.0, "q_fine" -> 1.1)
    // q_regressed is 5x its baseline — the declaration still disarms a
    // genuine flag, so it is NOT stale; q_fine passes the gate on its own
    // merits — its declaration is STALE and must be pruned
    assert(Bench.staleRedefined(Set("q_regressed", "q_fine"), med, baseline, 1.0)
      === Set("q_fine"))
    // under heavy ambient load the normalized gate wouldn't flag
    // q_regressed either — the declaration reads stale THAT sweep; the
    // fail-on-stale only fires when calibration says the machine is clean
    assert(Bench.staleRedefined(Set("q_regressed"), med, baseline, 5.0)
      === Set("q_regressed"))
    // empty declaration set: nothing to audit
    assert(Bench.staleRedefined(Set.empty, med, baseline, 1.0) === Set.empty)
  }
}
