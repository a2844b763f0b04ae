package graft

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pointInInterval: boundaries, multi-cell spans, empty intervals") {
    val pts = Seq((0L, 0L), (1L, 10L), (2L, 19L), (3L, 20L), (4L, 35L), (5L, 99L))
      .toDF("pid", "t")
    val ivs = Seq(
      (100L, 10L, 20L), // [10,20): catches t=10 (inclusive), not t=20
      (101L, 5L, 36L),  // spans cells 0..3 at width 10
      (102L, 50L, 50L), // empty → dropped
      (103L, 60L, 55L)  // inverted → dropped
    ).toDF("iid", "start", "end")
    val r = RangeJoin.pointInInterval(pts, ivs, width = 10L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      (100L, 1L, 10L), (100L, 2L, 19L),
      (101L, 1L, 10L), (101L, 2L, 19L), (101L, 3L, 20L), (101L, 4L, 35L)))
  }

  test("pointInInterval matches the brute-force cross filter") {
    val pts = (0 until 300).map(i => (i.toLong, ((i * 97) % 500).toLong))
      .toDF("pid", "t")
    val ivs = (0 until 40)
      .map(i => (i.toLong, ((i * 61) % 450).toLong, ((i * 61) % 450 + 7 + (i % 50)).toLong))
      .toDF("iid", "start", "end")
    val got = RangeJoin.pointInInterval(pts, ivs, width = 16L)
      .as[(Long, Long, Long)].collect().toSet
    val want = (for {
      (pid, t) <- pts.as[(Long, Long)].collect()
      (iid, s, e) <- ivs.as[(Long, Long, Long)].collect()
      if t >= s && t < e
    } yield (iid, pid, t)).toSet
    assert(got == want && got.nonEmpty)
  }

  test("intervalOverlap: nested/identical/touching cases, each pair once") {
    val l = Seq((1L, 0L, 10L), (2L, 25L, 60L)).toDF("lid", "lstart", "lend")
    val r = Seq(
      (10L, 2L, 5L),   // nested in 1
      (11L, 0L, 10L),  // identical to 1
      (12L, 10L, 20L), // touches 1's end → NO overlap (half-open)
      (13L, 59L, 80L), // tail overlap with 2
      (14L, 0L, 100L)  // covers both
    ).toDF("rid", "rstart", "rend")
    val got = RangeJoin.intervalOverlap(l, r, width = 8L)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 10L), (1L, 11L), (1L, 14L), (2L, 13L), (2L, 14L)))
    assert(got.distinct == got) // the max-first-cell trick: no duplicates
  }

  test("intervalOverlap matches brute force on hashed intervals") {
    def mk(n: Int, salt: Int) = (0 until n)
      .map(i => (i.toLong, ((i * salt) % 300).toLong,
        ((i * salt) % 300 + 5 + (i * 7) % 40).toLong))
    val l = mk(50, 37).toDF("lid", "lstart", "lend")
    val r = mk(60, 53).toDF("rid", "rstart", "rend")
    val got = RangeJoin.intervalOverlap(l, r, width = 16L)
      .as[(Long, Long)].collect()
    val want = (for {
      (lid, ls, le) <- mk(50, 37)
      (rid, rs, re) <- mk(60, 53)
      if ls < re && rs < le
    } yield (lid, rid)).toSet
    assert(got.toSet == want && got.length == want.size) // exactly once each
  }
}
