package graft

import org.apache.spark.sql.functions._

import graft.functions.FreqSketch
import graft.operators.HeavyHitters

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def zipfishStream(seed: Int, n: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    // ~40-term head over a long uniform tail: the shape heavy hitters exist for
    (0 until n).map { _ =>
      if (rnd.nextInt(100) < 70) s"head${rnd.nextInt(40)}"
      else s"tail${rnd.nextInt(5000)}"
    }
  }

  test("MG sketch: every term with count > N/(m+1) survives, undercount bounded") {
    val n = 20000
    val m = 64
    val stream = zipfishStream(11, n)
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sketch = stream.toDF("term").repartition(8)
      .agg(FreqSketch.mgSketch($"term", m))
      .head().getMap[String, Long](0)
    val bound = n.toLong / (m + 1)
    truth.foreach { case (t, c) =>
      if (c > bound) {
        assert(sketch.contains(t), s"guaranteed term $t (count $c > $bound) missing")
      }
      sketch.get(t).foreach { w =>
        assert(w <= c, s"sketch overcounts $t: $w > $c")
        assert(c - w <= bound, s"undercount of $t exceeds bound: $c - $w > $bound")
      }
    }
    assert(sketch.size <= m)
  }

  test("frequentTerms: exact counts + threshold vs brute force, any partitioning") {
    val docs = zipfishStream(23, 4000).grouped(20).map(_.mkString(" ")).toSeq
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val brute = docs.select(explode(split($"text", " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    val n = brute.agg(sum($"cnt")).head().getLong(0)
    val expected = brute.where($"cnt" * 200 >= n)
      .orderBy($"cnt".desc, $"term").as[(String, Long)].collect().toSeq
    assert(expected.nonEmpty, "degenerate test: no frequent terms")
    for (parts <- Seq(1, 7)) {
      val got = HeavyHitters.frequentTerms(docs.repartition(parts),
        supportDenom = 200L, m = 256).as[(String, Long)].collect().toSeq
      assert(got == expected, s"mismatch at $parts partitions")
    }
  }

  test("frequentTerms rejects a capacity below the support threshold") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      HeavyHitters.frequentTerms(docs, supportDenom = 500L, m = 16)
    }
  }

  test("MG sketch on fewer distinct terms than m is exact") {
    val stream = Seq.fill(50)("x") ++ Seq.fill(30)("y") ++ Seq.fill(3)("z")
    val sketch = stream.toDF("term").repartition(4)
      .agg(FreqSketch.mgSketch($"term", 64))
      .head().getMap[String, Long](0)
    assert(sketch == Map("x" -> 50L, "y" -> 30L, "z" -> 3L))
  }
}
