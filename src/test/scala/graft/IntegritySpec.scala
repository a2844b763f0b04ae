package graft

import graft.operators.Integrity

class IntegritySpec extends SparkSpec {
  import spark.implicits._

  test("gaps finds every hole, multi-width, without a global window") {
    // keys: 1..3, 7, 9..10, 15  → gaps [4,6], [8,8], [11,14]
    val keys = Seq(1L, 2L, 3L, 7L, 9L, 10L, 15L, 10L /*dup*/).toDF("k")
    val r = Integrity.gaps(keys, "k").as[(Long, Long)].collect().toSeq
    assert(r == Seq((4L, 6L), (8L, 8L), (11L, 14L)))
  }

  test("gaps on a contiguous sequence is empty") {
    val keys = (1L to 100L).toDF("k")
    assert(Integrity.gaps(keys, "k").count() == 0)
  }

  test("lastValid = min missing requested - 1 (BlockTracker semantics)") {
    val requested = (1L to 10L).toDF("r")
    val actual = Seq(1L, 2L, 3L, 5L, 6L).toDF("a")
    val r = Integrity.lastValid(requested, "r", actual, "a").as[Long].collect()(0)
    assert(r == 3L) // 4 is the first requested-but-missing
  }

  test("lastValid falls back to max(actual) when nothing is missing") {
    val requested = (1L to 5L).toDF("r")
    val actual = (1L to 8L).toDF("a")
    val r = Integrity.lastValid(requested, "r", actual, "a").as[Long].collect()(0)
    assert(r == 8L)
  }

  test("incremental import: distinct staging rows minus already-imported") {
    val staging = Seq((1L, "x"), (1L, "x"), (2L, "y"), (3L, "z")).toDF("event_id", "v")
    val main = Seq((1L, "x")).toDF("event_id", "v")
    val r = Integrity.incrementalImport(staging, main, "event_id")
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(r == Seq(2L, 3L))
  }

  test("completeGroups keeps only groups whose count matches declared max") {
    val li = Seq(
      (10L, 1), (10L, 2), (10L, 3), // complete: 3 items, max linenumber 3
      (20L, 1), (20L, 3) // incomplete: 2 items, max 3
    ).toDF("l_orderkey", "l_linenumber")
    val r = Integrity.completeGroups(li).select("o_orderkey").as[Long].collect().toSeq
    assert(r == Seq(10L))
  }
}
