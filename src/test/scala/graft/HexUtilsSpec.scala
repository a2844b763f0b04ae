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

  // Inputs covering every guard branch: valid small/large, all-zero,
  // boundary significant-digit counts, non-hex, empty, >64 chars,
  // mixed-case, overflow-shaped words that crash an unguarded conv.
  private val guardCases = Seq(
    "2a", "0" * 64, "0" * 49 + "f" * 15, "0" * 48 + "f" * 16, "f" * 64,
    "zz", "", "12xg", "ABCdef", "0" * 63 + "5", "1" + "0" * 64, "0x2a", " 2a"
  )

  test("native guarded hexLong matches the rlike+conv Column formulation") {
    import graft.operators.ReceiptClassifier
    val both = guardCases.toDF("h")
      .select(HexUtils.hexLongGuarded($"h").as("native"),
        ReceiptClassifier.hexLongRef($"h").as("ref"))
      .as[(Option[Long], Option[Long])].collect()
    guardCases.zip(both).foreach { case (in, (n, r)) =>
      assert(n == r, s"input [$in]: native=$n ref=$r")
    }
  }

  test("fused hexPadLower matches the concat/lpad/lower/hex chain bit-for-bit") {
    import org.apache.spark.sql.functions.{concat, hex, lit, lower, lpad}
    // values covering: zero, single digit, the demo id spaces, >width
    // digit counts for the truncation arm, negatives (hex() renders the
    // UNSIGNED 64-bit value), both long extremes, and null
    val vals: Seq[java.lang.Long] = Seq[java.lang.Long](
      0L, 1L, 15L, 16L, 149L, 1000042L, 2000149L, 0xdeadbeefL,
      Long.MaxValue, -1L, Long.MinValue, -42L, null)
    val df = vals.toDF("v")
    for (width <- Seq(1, 8, 15, 16, 17, 40, 64); with0x <- Seq(true, false)) {
      val chain = {
        val padded = lpad(lower(hex($"v")), width, "0")
        if (with0x) concat(lit("0x"), padded) else padded
      }
      val both = df.select(
          HexUtils.hexPadLower($"v", width, with0x).as("native"),
          chain.as("ref"))
        .as[(Option[String], Option[String])].collect()
      vals.zip(both).foreach { case (in, (n, r)) =>
        assert(n == r, s"v=$in width=$width with0x=$with0x: native=$n ref=$r")
      }
    }
  }

  test("native hexWordDecimal matches the decimal-Horner Column formulation") {
    import graft.operators.ReceiptClassifier
    val words = Seq(
      "0" * 64, "0" * 63 + "7", "0" * 33 + "f" * 31, f"${77000L}%064x",
      "0" * 32 + "1" + "f" * 31, // top-33 not all zero → null
      "f" * 64, "0" * 63 + "g", "0" * 62, "0" * 33 + "F" * 31
    )
    val both = words.toDF("w")
      .select(HexUtils.hexWordDecimal($"w").as("native"),
        ReceiptClassifier.hexDecimalStringRef($"w").as("ref"))
      .as[(Option[String], Option[String])].collect()
    words.zip(both).foreach { case (in, (n, r)) =>
      assert(n == r, s"input [$in]: native=$n ref=$r")
    }
  }
}
