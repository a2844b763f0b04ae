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

  test("datasetChecksum: permutation/partition-invariant, change-sensitive, total on empty") {
    val df = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("id", "t")
    def sum(d: org.apache.spark.sql.DataFrame) =
      Integrity.datasetChecksum(d, Seq("id", "t")).as[(Long, String)].head()
    val base = sum(df)
    assert(base._1 == 3L)
    // row order and partitioning are irrelevant
    assert(sum(df.orderBy($"id".desc)) == base)
    assert(sum(df.repartition(7)) == base)
    // any changed, added, or removed row changes the fingerprint
    assert(sum(Seq((1L, "alpha"), (2L, "BETA"), (3L, "gamma")).toDF("id", "t")) != base)
    assert(sum(df.where($"id" =!= 2L))._2 != base._2)
    assert(sum(df.unionAll(Seq((4L, "delta")).toDF("id", "t")))._2 != base._2)
    // a duplicated row changes it too (multiset, not set, semantics)
    assert(sum(df.unionAll(df.where($"id" === 1L)))._2 != base._2)
    // empty input: (0, "0"), not a throw
    assert(sum(df.where($"id" < 0L)) == ((0L, "0")))
  }

  test("schemaDiff: added/removed/type-changed classes; identical schemas clean") {
    import graft.operators.Integrity
    import org.apache.spark.sql.functions.col
    val oldDf = Seq((1L, "x", 1.0)).toDF("id", "name", "score")
    val newDf = Seq((1L, 1, true)).toDF("id", "name", "active")
      .select(col("id"), col("name"), col("active")) // name: string → int
    val d = Integrity.schemaDiff(oldDf, newDf)
      .as[(String, String, String, String)].collect()
      .map(x => x._1 -> ((x._2, Option(x._3), Option(x._4)))).toMap
    assert(d("score") == (("removed", Some("DOUBLE"), None)))
    assert(d("active") == (("added", None, Some("BOOLEAN"))))
    assert(d("name")._1 == "type_changed" &&
      d("name")._2 == Some("STRING") && d("name")._3 == Some("INT"))
    assert(!d.contains("id")) // unchanged dropped by default
    val full = Integrity.schemaDiff(oldDf, newDf, keepUnchanged = true)
      .where(col("status") === "unchanged").as[(String, String, String, String)]
      .collect()
    assert(full.map(_._1).toSeq == Seq("id"))
    // identical schemas → empty diff
    assert(Integrity.schemaDiff(oldDf, oldDf).count() == 0)
  }
}
