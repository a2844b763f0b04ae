package graft

import graft.functions.HexUtils

class HexUtilsSpec extends SparkSpec {
  import spark.implicits._

  test("topic → address strips the 24-zero-hex prefix (classifier semantics)") {
    val topic = "0x000000000000000000000000de374ece6fa50e781e81aac78e811b33d16912c4"
    val r = Seq(topic).toDF("t").select(HexUtils.topicToAddress($"t")).as[String].collect()(0)
    assert(r == "0xde374ece6fa50e781e81aac78e811b33d16912c4")
  }

  test("hex quantity → long (HexBigInteger semantics for < 2^63)") {
    val r = Seq("0x2a", "0xff", "0x0").toDF("h")
      .select(HexUtils.hexToLong($"h")).as[Long].collect().toSeq
    assert(r == Seq(42L, 255L, 0L))
  }

  test("longToTopic round-trips through topicToAddress + hexToLong") {
    val r = Seq(42L).toDF("id")
      .select(HexUtils.hexToLong(HexUtils.topicToAddress(HexUtils.longToTopic($"id"))))
      .as[Long].collect()(0)
    assert(r == 42L)
  }
}
