package graft

import graft.operators.Profiler
import org.apache.spark.sql.functions._

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("profile: one pass, hand-computed counts/range/decimal mean per column") {
    val df = Seq(
      (Some(1.0), Some(10L)), (Some(2.5), Some(10L)),
      (None, Some(30L)), (Some(2.5), None)
    ).toDF("x", "y")
    val p = Profiler.profile(df, Seq("x", "y"))
      .as[(String, Long, Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect().toList
    def rd(v: Double) =
      BigDecimal(v).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(p == List(
      ("x", 4L, 1L, 2L, Some(1.0), Some(2.5), Some(rd((1.0 + 2.5 + 2.5) / 3))),
      ("y", 4L, 1L, 2L, Some(10.0), Some(30.0), Some(rd(50.0 / 3)))))
  }

  test("profile: all-null column keeps null range and mean; empty input yields zero-count rows") {
    val df = Seq((Some(1.0), Option.empty[Double]), (Some(2.0), None))
      .toDF("x", "z")
    val p = Profiler.profile(df, Seq("z")).collect().head
    assert(p.getLong(1) == 2L && p.getLong(2) == 2L && p.getLong(3) == 0L)
    assert(p.isNullAt(4) && p.isNullAt(5) && p.isNullAt(6))
    val e = Profiler.profile(df.limit(0), Seq("x", "z")).collect()
    assert(e.length == 2 && e.forall(r => r.getLong(1) == 0L && r.isNullAt(6)))
  }

  test("dqReport: planted orphans, childless parents, dup PKs, null FKs") {
    val parent = Seq(100L, 200L, 300L).toDF("pk")
    val child = Seq(
      (Some(100L), 1), (Some(100L), 1),           // duplicate (fk, line) PK
      (Some(200L), 1), (Some(999L), 2),           // 999 has no parent
      (None, 3)                                   // null FK (not an orphan)
    ).toDF("fk", "line")
    val r = Profiler.dqReport(child, parent, "fk", "pk", Seq("fk", "line"))
      .as[(String, Long)].collect().toMap
    assert(r == Map(
      "orphan_children" -> 1L,    // the 999 row
      "childless_parents" -> 1L,  // 300
      "duplicate_child_pk" -> 1L, // one violating PK group
      "null_child_fk" -> 1L))
  }

  test("dqReport: clean tables report all-zero violations (the report is total)") {
    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq((1L, 1), (1L, 2), (2L, 1)).toDF("fk", "line")
    val r = Profiler.dqReport(child, parent, "fk", "pk", Seq("fk", "line"))
      .as[(String, Long)].collect().toMap
    assert(r.values.forall(_ == 0L) && r.size == 4)
  }
}
