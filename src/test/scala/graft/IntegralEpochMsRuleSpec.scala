package graft

import graft.plans.{GraftExtensions, IntegralEpochMsRule}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class IntegralEpochMsRuleSpec extends SparkSpec {
  import spark.implicits._

  test("floor-division rewrite is value-identical, including pre-epoch timestamps") {
    val df = Seq(
      Timestamp.valueOf("2024-01-01 10:00:00.123456"),
      Timestamp.valueOf("1969-12-31 23:59:59.999"),
      Timestamp.valueOf("1900-06-15 00:00:00.000001") // negative, non-multiple
    ).toDF("ts")
    val viaFloor = df.select(
      floor(unix_micros(col("ts")) / lit(1000.0d)).cast("long")).as[Long].collect().toSeq
    val viaRewrite = df.select(
      expr("(unix_micros(ts) - pmod(unix_micros(ts), 1000)) div 1000")).as[Long].collect().toSeq
    assert(viaFloor == viaRewrite)
    assert(viaFloor.head == 1704103200123L)
  }

  test("rule fires on the floor/divide idiom and not on other divisors") {
    val floored = Seq(Timestamp.valueOf("2024-01-01 10:00:00.123")).toDF("ts")
      .select(floor(unix_micros(col("ts")) / lit(1000.0d)).cast("long").as("ms"))
    val hit = IntegralEpochMsRule(floored.queryExecution.analyzed)
    assert(hit.toString.contains(" div "), s"rule did not fire:\n$hit")

    val other = Seq(Timestamp.valueOf("2024-01-01 10:00:00")).toDF("ts")
      .select(floor(unix_micros(col("ts")) / lit(999.5d)).as("x"))
    val plan = other.queryExecution.analyzed
    assert(IntegralEpochMsRule(plan) == plan)
  }

  test("rule is active in an extensions-registered session (non-foldable source)") {
    val s = SparkSpec.session.newSession()
    GraftExtensions.registerAll(s)
    val li = Tables.lineitem(s, "/root/testdata/sf0.001")
      .select(floor(unix_micros(col("l_shipdate").cast("timestamp")) / lit(1000.0d)).cast("long").as("ms"))
    assert(li.queryExecution.optimizedPlan.toString.contains(" div "))
    // and the values survive the rewrite
    assert(li.limit(5).collect().forall(_.getLong(0) > 0))
  }
}
