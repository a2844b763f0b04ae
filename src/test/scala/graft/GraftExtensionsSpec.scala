package graft

import graft.plans.GraftExtensions
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSpec.session.newSession()
    GraftExtensions.registerAll(s)
    s
  }

  test("custom expressions are callable from SQL") {
    import spark.implicits._
    Seq((0L, "alpha beta gamma delta"), (1L, "alpha beta gamma delta"), (2L, "x y z"))
      .toDF("id", "text").createOrReplaceTempView("docs")

    val sigs = spark.sql("SELECT id, graft_simhash64(text) AS sig FROM docs")
      .as[(Long, Long)].collect().toMap
    assert(sigs(0L) == sigs(1L) && sigs(0L) != sigs(2L))

    val mh = spark.sql("SELECT graft_minhash_sig(text, 3, 16) AS s FROM docs WHERE id = 0")
      .as[Seq[Long]].collect()(0)
    assert(mh.length == 16)

    val top = spark.sql(
      "SELECT graft_top_k(named_struct('v', id), 2) AS t FROM docs")
      .selectExpr("t.v").as[Seq[Long]].collect()(0)
    assert(top == Seq(0L, 1L))

    // reverse mode: the k LARGEST, largest-first
    val bottom = spark.sql(
      "SELECT graft_top_k(named_struct('v', id), 2, true) AS t FROM docs")
      .selectExpr("t.v").as[Seq[Long]].collect()(0)
    assert(bottom == Seq(2L, 1L))
  }
}
