package graft

import graft.functions.LshKeys
import graft.operators.Ann
import org.apache.spark.sql.functions._

/** The native LSH key kernel must bucket EXACTLY like the Column reference
  * formulation — sign bit i of `Ann.lshKey`'s bitstring is bit (bits−1−i)
  * of the native long key, and the table tag sits above the sign bits.
  */
class LshKeysSpec extends SparkSpec {

  private val dim = 64
  private val bits = 8
  private val numTables = 4

  private lazy val emb = Tables.embeddings(spark, "/root/testdata/sf0.001").limit(200)

  test("native sign keys match the Column formulation bit-for-bit, all tables") {
    val strCols = (0 until numTables).map(t => Ann.lshKey(col("embedding"), dim, bits, t).as(s"s$t"))
    val rows = emb.select(
      (LshKeys.signKeys(col("embedding"), dim, bits, numTables).as("keys") +: strCols): _*
    ).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val keys = r.getSeq[Long](0)
      (0 until numTables).foreach { t =>
        val key = keys(t)
        assert(key >>> bits == t.toLong, s"table tag wrong: $key")
        val s = r.getString(1 + t)
        (0 until bits).foreach { i =>
          val nativeBit = (key >> (bits - 1 - i)) & 1L
          assert(nativeBit == (s.charAt(i) - '0').toLong,
            s"bit $i of table $t disagrees: native=$nativeBit string=$s")
        }
      }
    }
  }

  test("keys are deterministic across evaluations and tables are independent") {
    val a = emb.select(col("vec_id"), LshKeys.signKeys(col("embedding"), dim, bits, numTables).as("k"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b = emb.select(col("vec_id"), LshKeys.signKeys(col("embedding"), dim, bits, numTables).as("k"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a == b)
    // independence smoke check: tables don't all produce the same partition
    val t0 = a.values.map(_(0) & 0xffL).toSet
    val t1 = a.values.map(_(1) & 0xffL).toSet
    assert(a.values.exists(ks => (ks(0) & 0xffL) != (ks(1) & 0xffL)) && t0.size > 1 && t1.size > 1)
  }
}
