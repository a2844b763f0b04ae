package graft

import graft.operators.TextMetrics
import org.apache.spark.sql.functions.{length, sum}

class TextMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("lang id picks the language with most function words; und when none") {
    val docs = Seq(
      (0L, "the cat sat on the mat and it is warm"),
      (1L, "el gato es de la casa y en los arboles"),
      (2L, "le chat est dans la maison et les jardins de paris"),
      (3L, "der hund ist nicht in das haus und die katze"),
      (4L, "zzz qqq xxx")
    ).toDF("doc_id", "text")
    val r = TextMetrics.langId(docs).as[(Long, String)].collect().toMap
    assert(r(0L) == "en"); assert(r(1L) == "es"); assert(r(2L) == "fr")
    assert(r(3L) == "de"); assert(r(4L) == "und")
  }

  test("quality metrics on a known string") {
    val docs = Seq((0L, "the cat, a dog!")).toDF("doc_id", "text")
    val r = TextMetrics.quality(docs).collect()(0)
    assert(r.getAs[Long]("n_chars") == 15)
    assert(r.getAs[Long]("n_words") == 4) // the / cat, / a / dog!
    assert(r.getAs[Double]("punct_ratio") == 2.0 / 15.0) // ',' and '!'
    assert(r.getAs[Double]("stopword_ratio") == 0.5) // the, a
  }

  test("fingerprint is order-sensitive and deterministic") {
    val docs = Seq(
      (0L, "alpha beta gamma"),
      (1L, "gamma beta alpha"),
      (2L, "alpha beta gamma")
    ).toDF("doc_id", "text")
    val r = TextMetrics.fingerprint(docs).as[(Long, Long)].collect().toMap
    assert(r(0L) == r(2L)) // same word sequence → same hash
    assert(r(0L) != r(1L)) // permuted words → different hash (rolling, not bag)
    assert(r.values.forall(h => h >= 0 && h < 2147483647L)) // mod-p range
  }

  test("winnowExploded is the scalar-row view of the array winnow") {
    val docs = Seq(
      (0L, "one two three four five six seven eight nine ten"),
      (1L, "short doc")
    ).toDF("doc_id", "text")
    val packed = TextMetrics.winnow(docs).as[(Long, Seq[Long])].collect()
      .flatMap { case (id, fps) => fps.map(id -> _) }.toSet
    val exploded = TextMetrics.winnowExploded(docs).as[(Long, Long)].collect()
    assert(exploded.toSet == packed) // same content, one scalar row per fp
    assert(exploded.length == packed.size) // array was already distinct
    // scalar schema only — the shape the external comparer requires
    val schema = TextMetrics.winnowExploded(docs).schema
    assert(schema.fields.map(_.dataType.typeName).toSeq == Seq("long", "long"))
  }

  test("native winnow kernel matches the HOF reference formulation bit-for-bit") {
    // real testdata docs (varied lengths) + edge shapes: empty, sub-k, sub-w
    val real = Tables.documents(spark, "/root/testdata/sf0.001").limit(100)
    val edges = Seq((9001L, ""), (9002L, "one"), (9003L, "one two"),
      (9004L, "one two three"), (9005L, "one two three four five"),
      // irregular whitespace: both tokenizers must drop empty tokens
      (9006L, "a  b c"), (9007L, "  leading and trailing  "),
      (9008L, "one  two   three four  five six"))
      .toDF("doc_id", "text")
    Seq(real, edges).foreach { docs =>
      val native = TextMetrics.winnow(docs).as[(Long, Seq[Long])].collect().toMap
      val hof = TextMetrics.winnowHof(docs).as[(Long, Seq[Long])].collect().toMap
      assert(native == hof)
    }
  }

  test("qualityFilter: each rule fires on its shaped doc, first reason wins") {
    val docs = Seq(
      // passes everything: long, many short words, punct-free, has stopwords
      (1L, ("the quick fox " * 30).trim),
      (2L, "tiny"),                                  // too_short (< 100 chars)
      (3L, "x " * 60 + "y" * 30),                    // 151 chars but 61 words of avg len… compute: too_few? 61 words ≥ 20; avg_word_len = (151-61+1)/61 ≈ 1.5 → passes len rules; no stopwords
      (4L, ("supercalifragilistic " * 10).trim),     // 10 words < 20 → too_few_words… 209 chars
      (5L, ("pseudopseudohypoparathyroidism word " * 15).trim) // avg word len > 4.95
    ).toDF("doc_id", "text")
    val r = TextMetrics.qualityFilter(docs, minStopwordRatio = 0.001)
      .as[(Long, Boolean, String)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r(1L) == ((true, "ok")))
    assert(r(2L) == ((false, "too_short")))
    assert(r(3L) == ((false, "low_stopword"))) // stopword rule with raised threshold
    assert(r(4L) == ((false, "too_few_words")))
    assert(r(5L) == ((false, "gibberish_words")))
    // punct rule: short punct words keep avg_word_len low so the punct
    // ratio (100/309 ≈ 0.32 > 0.3) is the first failing rule
    val punct = Seq((9L, ("!! " * 50) + ("the a " * 10) + ("word " * 20).trim))
      .toDF("doc_id", "text")
    val pr = TextMetrics.qualityFilter(punct).as[(Long, Boolean, String)].collect()
    assert(pr.head._3 == "too_much_punct")
  }

  test("BPE training learns the classic merges; counts match hand-encoding") {
    val docs = Seq((1L, "low low low"), (2L, "lower lower"), (3L, "newest"))
      .toDF("doc_id", "text")
    // hand-derived: pair weights (l,o)=5,(o,w)=5 tie→lex; then (lo,w)=5;
    // then (low,e)=2 ties (e,r)=2 → lex picks (e,r); then (low,er)=2;
    // all remaining pairs are singletons → early stop
    val merges = TextMetrics.trainBpe(docs, numMerges = 10)
    assert(merges == Seq(("l", "o"), ("lo", "w"), ("e", "r"), ("low", "er")))
    val counts = TextMetrics.bpeTokenCounts(docs, merges)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> t._3).toMap
    // "low"×3 → 1 token each; "lower"×2 → low+er → lower, 1 each;
    // "newest" has no applicable merge → 6 chars
    assert(counts == Map(1L -> 3L, 2L -> 2L, 3L -> 6L))
    // zero merges degrade to per-word character counts
    val none = TextMetrics.bpeTokenCounts(docs, Nil)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> t._3).toMap
    assert(none == Map(1L -> 9L, 2L -> 10L, 3L -> 6L))
  }

  test("BPE on testdata: trained merges compress between word and char counts") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = TextMetrics.trainBpe(docs, numMerges = 8, samplePermille = 200)
    assert(merges.nonEmpty && merges == merges.distinct)
    // partition-invariance: the hash-gated sample (hence the trained merge
    // sequence) is identical under any partition layout — the property
    // limit()-based sampling cannot give on a cluster
    val reparted = TextMetrics.trainBpe(docs.repartition(7), numMerges = 8, samplePermille = 200)
    assert(reparted == merges)
    val r = TextMetrics.bpeTokenCounts(docs, merges)
      .join(docs.select($"doc_id", length($"text").as("n_chars")), "doc_id")
      .select("ws_tokens", "bpe_tokens", "n_chars")
      .as[(Long, Long, Long)].collect()
    assert(r.nonEmpty)
    r.foreach { case (ws, bpe, ch) =>
      assert(bpe >= ws && bpe <= ch, s"counts out of order: ws=$ws bpe=$bpe chars=$ch")
    }
    // merges genuinely fire: strictly fewer tokens than the unmerged encode
    val unmerged = TextMetrics.bpeTokenCounts(docs, Nil)
      .agg(sum($"bpe_tokens")).as[Long].head()
    val mergedTotal = TextMetrics.bpeTokenCounts(docs, merges)
      .agg(sum($"bpe_tokens")).as[Long].head()
    assert(mergedTotal < unmerged)
  }

  test("token counts: BPE-ish regex splits punctuation and digits") {
    val docs = Seq((0L, "ab12 cd, ef")).toDF("doc_id", "text")
    val r = TextMetrics.tokenCounts(docs).collect()(0)
    assert(r.getAs[Long]("ws_tokens") == 3)
    // ab / 1 / 2 / cd / , / ef
    assert(r.getAs[Long]("re_tokens") == 6)
  }

  test("repetition: hand-computed metrics on shaped docs") {
    val docs = Seq(
      (0L, "a a a b"),          // 4 words, 2 distinct, run 3, bigrams: "a a"x2,"a b" -> top 2/3
      (1L, "x y x y x"),        // 5 words, 2 distinct, run 1, bigrams: "x y"x2,"y x"x2 -> top 2/4
      (2L, "solo"),             // 1 word: no bigrams -> null frac
      (3L, "p q r s")           // all distinct, run 1, top bigram 1/3
    ).toDF("doc_id", "text")
    val r = TextMetrics.repetition(docs).collect().map(x =>
      x.getLong(0) -> ((x.getLong(1), x.getDouble(2), x.getLong(3),
        if (x.isNullAt(4)) Double.NaN else x.getDouble(4)))).toMap
    assert(r(0L) == ((4L, 0.5, 3L, math.rint(2.0 / 3.0 * 1e6) / 1e6)))
    assert(r(1L)._3 == 1L && r(1L)._4 == 0.5)
    assert(r(2L)._1 == 1L && r(2L)._4.isNaN)
    assert(r(3L) == ((4L, 0.0, 1L, math.rint(1.0 / 3.0 * 1e6) / 1e6)))
  }

  test("native repetition kernel matches the HOF reference bit-for-bit on testdata") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val native = TextMetrics.repetition(docs).collect().map(_.toSeq).toSeq
    val hof = TextMetrics.repetitionHof(docs).collect().map(_.toSeq).toSeq
    assert(native == hof)
    // empty-token semantics parity too: double spaces keep empty words
    val shaped = Seq((0L, "a  a b"), (1L, ""), (2L, " ")).toDF("doc_id", "text")
    assert(TextMetrics.repetition(shaped).collect().map(_.toSeq).toSeq ==
      TextMetrics.repetitionHof(shaped).collect().map(_.toSeq).toSeq)
  }

  test("repetitionFilter: each rule fires on its shaped doc, first reason wins") {
    val docs = Seq(
      // clean: 14 distinct words -> top bigram 1/13 = 0.077 < 0.08, dup 0, run 1
      (0L, "alpha beta gamma delta eps zeta eta theta iota kappa lambda mu nu xi"),
      // dup: 20 words, 5 distinct -> dup 0.75 > 0.6 (first rule wins over its runs)
      (1L, "a a b a c a a b a c a a b a c a a b a c"),
      // bigram: "p q" x4 of 19 = 0.21 > 0.08; dup = 1 - 14/20 = 0.3; run 1
      (2L, "p q p q p q p q x y z w u v t s r m n o"),
      // run: "x x x" run 3 > 2; 20 words 17 distinct -> dup 0.15; 19 bigrams,
      // top "x x" x2 = 0.105 -> bigram rule precedes run rule
      (3L, "a b c a b c x x x y z w u v t s r m n o")
    ).toDF("doc_id", "text")
    val r = TextMetrics.repetitionFilter(docs).collect()
      .map(x => x.getLong(0) -> ((x.getBoolean(1), x.getString(2)))).toMap
    assert(r(0L) == ((true, "ok")))
    assert(r(1L) == ((false, "dup_words")))
    assert(r(2L) == ((false, "top_bigram")))
    assert(r(3L) == ((false, "top_bigram"))) // precedence: bigram rule precedes run rule
  }

  test("url domain extraction and suffix-semantics blocklist filter") {
    val docs = Seq(
      (0L, "intro https://a.example.org/x and http://b.ads.net/y end"),
      (1L, "no urls at all"),
      (2L, "exact http://ads.net/z plus https://safe-ads.net/ok")
    ).toDF("doc_id", "text")
    val doms = graft.operators.UrlOps.extractDomains(docs)
      .as[(Long, String)].collect().toSeq
    assert(doms == Seq((0L, "a.example.org"), (0L, "b.ads.net"),
      (2L, "ads.net"), (2L, "safe-ads.net")))
    val f = graft.operators.UrlOps.domainFilter(docs, Seq("ads.net"))
      .collect().map(x => x.getLong(0) -> ((x.getBoolean(1), x.getString(2)))).toMap
    assert(f(0L) == ((false, "b.ads.net"))) // subdomain blocked by suffix
    assert(f(1L) == ((true, "ok")))
    // exact match blocked; 'safe-ads.net' is NOT a subdomain of ads.net
    assert(f(2L) == ((false, "ads.net")))
  }

  test("tfidf: corpus-wide idf, per-doc top-k, deterministic tie order") {
    // N=3. "rare" appears in 1 doc, "both" in 2, "all" in 3.
    val docs = Seq(
      (0L, "all both rare rare"),
      (1L, "all both all"),
      (2L, "all")
    ).toDF("doc_id", "text")
    val r = graft.operators.TextMetrics.tfidfTopTerms(docs, topK = 2)
      .as[(Long, String, Long, Double)].collect().toSeq
    def idf(df: Int) = math.log(4.0 / (df + 1.0)) + 1.0
    def rnd(x: Double) = BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 0: rare tf=2 score=2*idf(1); both=1*idf(2); all=1*idf(3) (cut)
    assert(r.filter(_._1 == 0L) == Seq(
      (0L, "rare", 2L, rnd(2 * idf(1))), (0L, "both", 1L, rnd(idf(2)))))
    // doc 1: all tf=2; both tf=1
    assert(r.filter(_._1 == 1L) == Seq(
      (1L, "all", 2L, rnd(2 * idf(3))), (1L, "both", 1L, rnd(idf(2)))))
    assert(r.filter(_._1 == 2L) == Seq((2L, "all", 1L, rnd(idf(3)))))
  }

  test("bigram surprisal: hand-computed interpolated model; short docs drop") {
    // T=8; uni a:3 b:3 c:1 x:1; c12 (a,b):3 (b,a):1 (b,c):1; c1 a:3 b:2
    val docs = Seq((0L, "a b a b"), (1L, "a b c"), (2L, "x")).toDF("doc_id", "text")
    val r = TextMetrics.bigramLogProb(docs).as[(Long, Double, Long)].collect().toSeq
    def rnd(x: Double) = BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lam = 1.0 - 0.9
    def term(c12: Long, c1: Long, cu: Long) =
      rnd(-math.log(0.9 * c12 / c1 + lam * cu / 8.0))
    val ab = term(3, 3, 3); val ba = term(1, 2, 3); val bc = term(1, 2, 1)
    def mean(ts: Seq[Double]) = rnd(ts.map(BigDecimal(_)).sum.toDouble / ts.size)
    // doc 2 has no bigrams → absent; repeated bigrams count per occurrence
    assert(r == Seq(
      (0L, mean(Seq(ab, ba, ab)), 3L),
      (1L, mean(Seq(ab, bc)), 2L)))
    // unseen-continuation mass: p(c|b) backs off toward the unigram tail,
    // so the doc holding the rare continuation scores strictly higher
    assert(r(1)._2 > r(0)._2)
  }

  test("bm25: hand-computed scores, ranking, unmatched docs absent") {
    // N=4, Σlen=12 → avgdl=3. df(cat)=df(fish)=2 → idf=ln 2 for both.
    val docs = Seq(
      (0L, "cat dog cat"), (1L, "dog bird"),
      (2L, "fish fish fish fish"), (3L, "cat fish dog")
    ).toDF("doc_id", "text")
    val r = TextMetrics.bm25TopK(docs, Seq("cat", "fish"))
      .as[(Long, Double, Long)].collect()
    assert(r.map(_._1).toSeq == Seq(3L, 2L, 0L)) // doc 1 matches nothing
    val idf = math.log(1.0 + (4.0 - 2 + 0.5) / (2 + 0.5))
    def w(tf: Long, dl: Long) =
      idf * (tf * (1.2 + 1.0)) / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / 3.0))
    val byDoc = r.map(x => x._1 -> x._2).toMap
    assert(math.abs(byDoc(3L) - (w(1, 3) + w(1, 3))) < 1e-9) // both terms hit
    assert(math.abs(byDoc(2L) - w(4, 4)) < 1e-9) // tf saturation vs long doc
    assert(math.abs(byDoc(0L) - w(2, 3)) < 1e-9)
    assert(r.map(_._3).toSeq == Seq(2L, 1L, 1L)) // matched_terms
    assert(TextMetrics.bm25TopK(docs, Seq("cat", "fish"), topK = 2)
      .as[(Long, Double, Long)].collect().map(_._1).toSeq == Seq(3L, 2L))
    val r7 = TextMetrics.bm25TopK(docs.repartition(7), Seq("cat", "fish"))
      .as[(Long, Double, Long)].collect()
    assert(r7.toSeq == r.toSeq)
  }

  test("chunking: overlap, short tail, sub-chunk doc passthrough") {
    val docs = Seq(
      (0L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"), // 10 tokens
      (1L, "a b")                             // shorter than one chunk
    ).toDF("doc_id", "text")
    // chunk=4, overlap=1, stride=3 → starts 0,3,6 (ceil((10-1)/3)=3)
    val r = graft.operators.TextMetrics.chunk(docs, chunkTokens = 4, overlap = 1)
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(r == Seq(
      (0L, 0L, "w0 w1 w2 w3", 4L),
      (0L, 1L, "w3 w4 w5 w6", 4L), // overlaps w3
      (0L, 2L, "w6 w7 w8 w9", 4L), // overlaps w6, covers the tail
      (1L, 0L, "a b", 2L)))
    // every token index appears in some chunk; consecutive chunks share
    // exactly `overlap` tokens
    val c0 = r.filter(_._1 == 0L).map(_._3.split(" ").toSeq)
    c0.sliding(2).foreach { case Seq(a, b) => assert(a.takeRight(1) == b.take(1)) }
    assert(c0.flatten.toSet == (0 until 10).map(i => s"w$i").toSet)
  }

  test("unigram surprisal: hand-computed corpus model, rare tokens score high") {
    // corpus: "a a a b" + "b c" → total 6; p(a)=3/6, p(b)=2/6, p(c)=1/6
    val docs = Seq((0L, "a a a b"), (1L, "b c")).toDF("doc_id", "text")
    val r = graft.operators.TextMetrics.unigramLogProb(docs)
      .as[(Long, Double, Long)].collect().map { case (id, s, n) => id -> ((s, n)) }.toMap
    def rnd(x: Double) = BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    // per-token terms are rounded to 12 BEFORE the exact decimal sum
    def sur(cnt: Double) = rnd(math.log(6.0) - math.log(cnt))
    assert(r(0L)._2 == 4L && r(1L)._2 == 2L)
    assert(r(0L)._1 == rnd((3 * sur(3) + sur(2)) / 4))
    assert(r(1L)._1 == rnd((sur(2) + sur(1)) / 2))
    assert(r(1L)._1 > r(0L)._1) // the rare-token doc is more surprising
  }

  test("tfidf TopKAgg selection equals the window row_number formulation") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val got = graft.operators.TextMetrics.tfidfTopTerms(docs, topK = 3)
      .as[(Long, String, Long, Double)].collect().toSet
    val n = docs.count()
    val tf = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    val want = tf.join(dfreq, "term").withColumn("score",
        round(col("tf") * (log((lit(n) + 1.0d) / (col("df") + 1.0d)) + 1.0d), 12))
      .withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
      .select(col("doc_id"), col("term"), col("tf"), col("score"))
      .as[(Long, String, Long, Double)].collect().toSet
    assert(got == want)
  }

  test("pii scan and redact on planted spans") {
    val docs = Seq(
      (0L, "reach me at bob1@mail.com or +1-555-0199 from 10.0.0.1 thanks"),
      (1L, "no pii here at all"),
      (2L, "two mails a@b.co c@d.net and ip 192.168.1.255")
    ).toDF("doc_id", "text")
    val s = graft.operators.Pii.scan(docs).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3), x.getBoolean(4)))).toMap
    assert(s(0L) == ((1L, 1L, 1L, true)))
    assert(s(1L) == ((0L, 0L, 0L, false)))
    assert(s(2L) == ((2L, 0L, 1L, true)))
    val red = graft.operators.Pii.redact(docs).collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(red(0L) == "reach me at <EMAIL> or <PHONE> from <IP> thanks")
    assert(red(1L) == "no pii here at all")
    assert(red(2L) == "two mails <EMAIL> <EMAIL> and ip <IP>")
  }

  test("noveltyScore: df-1 share per doc, short docs null, repartition-stable") {
    val docs = Seq(
      (1L, "a b c d", "s1"),     // grams: "a b c", "b c d"
      (2L, "a b c e", "s2"),     // shares "a b c" with doc 1; "b c e" novel
      (3L, "x y", "s3"),         // under 3 tokens: no grams
      (4L, "p q r p q r", "s1")  // 4 gram positions, 3 DISTINCT (repeat dedups)
    ).toDF("doc_id", "text", "source")
    val r = graft.operators.TextMetrics.noveltyScore(docs).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2),
        if (x.isNullAt(3)) -1.0 else x.getDouble(3)))).toMap
    assert(r(1L) == ((2L, 1L, 0.5)))  // "b c d" novel, "a b c" shared
    assert(r(2L) == ((2L, 1L, 0.5)))
    assert(r(3L) == ((0L, 0L, -1.0)))
    assert(r(4L) == ((3L, 3L, 1.0)))
    val shuffled = graft.operators.TextMetrics.noveltyScore(docs.repartition(5))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(shuffled == r.map { case (k, v) => (k, v._1, v._2) }.toSet)
  }

  test("gramKeys guard: duplicated doc rows fail loudly under the debug flag") {
    // r13 ADVICE: the fused kernel dedups grams PER ROW, so a caller
    // breaking the one-row-per-doc contract would silently inflate every
    // downstream intersection count. The opt-in guard turns that into a
    // loud contract failure; off by default it costs nothing.
    val dup = Seq(
      (1L, "a b c d", "s1"),
      (1L, "a b c d", "s1"), // the same doc twice — contract violation
      (2L, "a b c e", "s2")).toDF("doc_id", "text", "source")
    spark.conf.set("spark.graft.gramKeys.checkUnique", "true")
    try {
      val e = intercept[IllegalStateException] {
        graft.operators.TextMetrics.noveltyScore(dup).collect()
      }
      assert(e.getMessage.contains("one-row-per-doc"))
      assert(e.getMessage.contains("doc_id"))
    } finally spark.conf.unset("spark.graft.gramKeys.checkUnique")
    // flag off: the violation rides through silently (3 output rows — the
    // duplicated doc appears twice), which is exactly why the guard exists
    assert(graft.operators.TextMetrics.noveltyScore(dup).count() === 3L)
  }

  test("sourceNgramOverlap: distinct shared grams per pair, ordered pairs") {
    val docs = Seq(
      (1L, "a b c d", "s1"),
      (2L, "a b c x", "s2"),   // shares "a b c" with s1
      (3L, "b c d y", "s2"),   // shares "b c d" with s1
      (4L, "a b c d", "s3"),   // shares both grams with s1, "a b c" w/ s2...
      (5L, "a b c z", "s2")    // duplicate share within s2 counts once
    ).toDF("doc_id", "text", "source")
    val r = graft.operators.TextMetrics.sourceNgramOverlap(docs).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    assert(r == Map(
      ("s1", "s2") -> 2L,   // "a b c", "b c d" (each once)
      ("s1", "s3") -> 2L,
      ("s2", "s3") -> 2L))  // s3 has "a b c" and "b c d"
    // no cross-source grams -> empty matrix; empty corpus total
    val disjoint = Seq((1L, "a b c", "s1"), (2L, "x y z", "s2"))
      .toDF("doc_id", "text", "source")
    assert(graft.operators.TextMetrics.sourceNgramOverlap(disjoint).count() == 0)
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
    assert(graft.operators.TextMetrics.noveltyScore(empty).count() == 0)
    assert(graft.operators.TextMetrics.sourceNgramOverlap(empty).count() == 0)
  }

  test("compressionRatio: repetitive text compresses far below prose, gibberish barely") {
    val rng = new scala.util.Random(7)
    val docs = Seq(
      (1L, Seq.fill(200)("the same boilerplate block again and").mkString(" ")),
      (2L, "The quick brown fox jumps over the lazy dog near the quiet river " +
        "bank while evening light settles across the valley and distant hills."),
      (3L, (1 to 1400).map(_ => rng.nextPrintableChar()).mkString), // gibberish
      (4L, "")
    ).toDF("doc_id", "text")
    val r = graft.operators.TextMetrics.compressionRatio(docs).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2),
        if (x.isNullAt(3)) Double.NaN else x.getDouble(3))).toMap
    assert(r(1L)._3 < 0.05, s"boilerplate should crush: ${r(1L)}")
    assert(r(2L)._3 > 0.5 && r(2L)._3 < 1.0, s"prose mid-band: ${r(2L)}")
    assert(r(3L)._3 > 0.8, s"gibberish near-incompressible: ${r(3L)}")
    assert(r(4L)._1 == 0L && r(4L)._3.isNaN) // empty text → null ratio
    // deterministic under repartition (same zlib, same input)
    val rep = graft.operators.TextMetrics.compressionRatio(docs.repartition(5))
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(rep == r.view.mapValues(_._2).toMap)
    assert(graft.operators.TextMetrics.compressionRatio(docs.limit(0)).count() == 0)
  }

  test("normalizeText: case/control/whitespace arms; normalized dedup collapses variants") {
    val docs = Seq(
      (1L, "Hello  World"),           // case + double space
      (2L, "hello world"),            // the canonical form, unchanged
      (3L, "hello\tworld\n"),         // control chars strip then trim
      (4L, "  hello   world  "),      // runs + ends
      (5L, "distinct doc")
    ).toDF("doc_id", "text")
    val n = graft.operators.TextMetrics.normalizeText(docs)
      .select("doc_id", "norm_text", "changed")
      .as[(Long, String, Boolean)].collect().map(x => x._1 -> ((x._2, x._3))).toMap
    assert((1L to 4L).forall(i => n(i)._1 == "hello world"))
    assert(!n(2L)._2 && n(1L)._2 && n(3L)._2 && n(4L)._2)
    assert(n(5L) == (("distinct doc", false)))
    // keying exact dedup on norm_text collapses all four variants to the
    // min-id representative — a raw-text dedup keeps them all distinct
    import org.apache.spark.sql.functions.col
    val dedup = graft.operators.Dedup.exact(
        graft.operators.TextMetrics.normalizeText(docs)
          .select(col("doc_id"), col("norm_text").as("text")))
      .as[(Long, Long)].collect().toMap
    assert(dedup == Map(1L -> 4L, 5L -> 1L))
    assert(graft.operators.Dedup.exact(docs).collect()
      .forall(_.getLong(1) == 1L))
    assert(graft.operators.TextMetrics.normalizeText(docs.limit(0)).count() == 0)
  }

  test("entropy: hand cases, uniform = ln k, degenerate = 0, empty-text conventions") {
    def r12(x: Double): Double =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = Seq(
      (0L, "a a b b"),   // word counts {a:2, b:2} -> H = ln 2
      (1L, "a b c d"),   // uniform over 4 -> H = ln 4
      (2L, "x x x"),     // single token -> H = 0
      (3L, "")           // [""] word singleton; zero chars
    ).toDF("doc_id", "text")
    val out = graft.operators.TextMetrics.entropy(docs).collect()
      .map(x => x.getLong(0) -> x).toMap
    // H = round(round(ln n,12) - (Σ round(c ln c,12))/n, 12), mirrored here
    assert(out(0L).getLong(1) == 4L)
    assert(out(0L).getDouble(2) == r12(r12(math.log(4)) - 2 * r12(2 * math.log(2)) / 4))
    assert(out(1L).getDouble(2) == r12(math.log(4))) // all counts 1 -> st = 0
    assert(out(2L).getDouble(2) == 0.0)
    // chars of doc 0: {a:2, b:2, ' ':3}, n = 7
    assert(out(0L).getLong(3) == 7L)
    assert(out(0L).getDouble(4) ==
      r12(r12(math.log(7)) - (2 * r12(2 * math.log(2)) + r12(3 * math.log(3))) / 7))
    // empty text: word side is the [""] singleton (entropy 0); char side null
    assert(out(3L).getLong(1) == 1L && out(3L).getDouble(2) == 0.0)
    assert(out(3L).getLong(3) == 0L && out(3L).isNullAt(4))
    // map-only determinism under repartitioning
    val rep = graft.operators.TextMetrics.entropy(docs.repartition(7)).collect()
      .map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert((0L to 3L).forall(i => rep(i) == out(i).getDouble(2)))
    val none = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.operators.TextMetrics.entropy(none).count() == 0)
  }

  test("dsir importance weights: add-one LMs over the union vocab, hand-checked") {
    def r12(x: Double) = BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val raw = Seq((0L, "a b"), (2L, "c c")).toDF("doc_id", "text")
    val target = Seq((1L, "a a a")).toDF("doc_id", "text")
    // rc: a=1 b=1 c=2 (tr=4); tc: a=3 (tt=3); union vocab v=3
    val lwA = r12(math.log(4.0 / 6.0) - math.log(2.0 / 7.0))
    val lwB = r12(math.log(1.0 / 6.0) - math.log(2.0 / 7.0))
    val lwC = r12(math.log(1.0 / 6.0) - math.log(3.0 / 7.0))
    val out = TextMetrics.importanceWeights(raw, target)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(out.keySet == Set(0L, 2L))
    assert(out(0L)._2 == 2L && out(2L)._2 == 2L)
    // decimal-exact sum of the 12-dp terms, then one double division
    val exp0 = r12(((BigDecimal(lwA) + BigDecimal(lwB)) / 2).toDouble)
    assert(out(0L)._1 == exp0, s"${out(0L)._1} != $exp0")
    assert(out(2L)._1 == r12(lwC))
    // the target-favored token pulls up, the raw-typical token pulls down
    assert(lwA > 0 && lwC < 0)
    assert(out(0L)._1 > out(2L)._1)
    // repartition determinism
    val rep = TextMetrics.importanceWeights(raw.repartition(5), target.repartition(3))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rep(0L) == out(0L)._1 && rep(2L) == out(2L)._1)
    // empty target: weights are pure raw-LM penalties, still total
    val noTgt = TextMetrics.importanceWeights(raw,
      Seq.empty[(Long, String)].toDF("doc_id", "text"))
    assert(noTgt.count() == 2)
  }

  test("curation funnel charges each doc to its first failing stage") {
    // passes every scalar stage: 26 distinct lowercase words, 123 chars,
    // avg_word_len 98/26, 8 en markers, no other language's markers
    val enGood = "the quick brown fox and dogs of farm to barn is fast in " +
      "mist that runs it well with long tail over damp grass near pond"
    val enGood2 = enGood.replace("pond", "lake") // second distinct keeper
    // 25 distinct German words (112 chars, avg 88/25), 7 de markers
    val deGood = "der hund lief und das kind sang ist frei nicht nah ein " +
      "baum zu gross vom berg kam wind mit alte lied im tal raum"
    // 129 chars / 26 words pass quality; dup_word_frac = 1 - 2/26 > 0.6
    val tickTock = Seq.fill(13)("tick tock").mkString(" ")
    val docs = Seq(
      (0L, enGood), // kept (keeper of its text group)
      (1L, "tiny doc"), // 1_quality: too_short
      (2L, tickTock), // 2_repetition: dup_words (lang 'und' never reached)
      (3L, deGood), // 3_language
      (4L, enGood), // 4_exact_dup of doc 0
      (5L, enGood2) // kept
    ).toDF("doc_id", "text")
    val rows = TextMetrics.curationFunnel(docs).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("1_quality", "2_repetition", "3_language", "4_exact_dup"))
    def row(stage: String) = rows.find(_.getString(0) == stage).get
    assert(row("1_quality").getLong(1) == 6L && row("1_quality").getLong(2) == 1L)
    assert(row("2_repetition").getLong(1) == 5L && row("2_repetition").getLong(2) == 1L)
    assert(row("3_language").getLong(1) == 4L && row("3_language").getLong(2) == 1L)
    assert(row("4_exact_dup").getLong(1) == 3L && row("4_exact_dup").getLong(2) == 1L)
    assert(rows.forall(r => r.getLong(3) == r.getLong(1) - r.getLong(2)))
    assert(row("1_quality").getDouble(4) == 0.166667) // round(1/6, 6)
    assert(row("4_exact_dup").getDouble(4) == 0.333333)
    // zero-drop stages still appear, with dropped = 0
    val clean = Seq((0L, enGood), (1L, enGood2)).toDF("doc_id", "text")
    val cleanRows = TextMetrics.curationFunnel(clean).collect()
    assert(cleanRows.length == 4)
    assert(cleanRows.forall(r => r.getLong(2) == 0L && r.getLong(1) == 2L &&
      r.getLong(3) == 2L && r.getDouble(4) == 0.0))
    // empty corpus: all stages report 0/0 with null drop_rate
    val empty = TextMetrics.curationFunnel(
      Seq.empty[(Long, String)].toDF("doc_id", "text")).collect()
    assert(empty.length == 4)
    assert(empty.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L &&
      r.isNullAt(4)))
  }

  // ---- languageMix ----

  test("languageMix: hand-built mono, mixed, and unidentifiable docs") {
    val en = ("the and of to is in that it " * 8).trim          // 64 en tokens
    val de = ("der die und das ist nicht ein zu " * 4).trim     // 32 de tokens
    val noise = ("lorem ipsum dolor sit amet foo bar baz " * 4).trim // 32 und
    val docs = Seq(
      (1L, en),                           // 2 chunks, both en
      (2L, de + " " + en),                // 3 chunks: de, en, en
      (3L, noise),                        // 1 chunk, und
      (4L, de + " " + noise)              // 2 chunks: de, und
    ).toDF("doc_id", "text")
    val r = TextMetrics.languageMix(docs).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getString(3),
        if (x.isNullAt(4)) None else Some(x.getDouble(4))))).toMap
    assert(r(1L) == ((2L, 1L, "en", Some(0.0))))
    assert(r(2L) == ((3L, 2L, "en", Some(1.0 - 2.0 / 3.0 match {
      case v => BigDecimal(v).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    }))))
    assert(r(3L) == ((1L, 0L, "und", None)))
    // identified lang outranks the equally-frequent 'und' chunk
    assert(r(4L) == ((2L, 1L, "de", Some(0.0))))
  }

  test("languageMix: equal-count language tie breaks to the lexicographic min; repartition/empty total") {
    val en = ("the and of to is in that it " * 4).trim   // 32 en tokens
    val de = ("der die und das ist nicht ein zu " * 4).trim
    val docs = Seq((7L, de + " " + en)).toDF("doc_id", "text")
    val r = TextMetrics.languageMix(docs).collect().head
    assert(r.getString(3) == "de" && r.getLong(2) == 2L)
    assert(r.getDouble(4) == 0.5)
    val docs2 = Seq((7L, de + " " + en), (8L, en)).toDF("doc_id", "text")
    val a = TextMetrics.languageMix(docs2).collect().toSeq.map(_.toString)
    val b = TextMetrics.languageMix(docs2.repartition(5)).collect().toSeq.map(_.toString)
    assert(a == b)
    assert(TextMetrics.languageMix(docs2.limit(0)).count() == 0)
  }

  // ---- zipfSlope ----

  test("lexicalDiversity: hand type/token/hapax counts, ratios, empty-token sources drop, empty total") {
    val docs = Seq(
      (1L, "x y x", "a"), (2L, "z", "a"),        // a: 4 tokens, 3 types, hapax {y,z}
      (3L, "w w w w", "b"),                      // b: degenerate repetition
      (4L, "", "c"), (5L, "   ", "c"))           // c: no tokens at all
      .toDF("doc_id", "text", "source")
    val got = TextMetrics.lexicalDiversity(docs)
      .as[(String, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got("a") == ((4L, 3L, 2L, 0.75, BigDecimal(2.0 / 3.0)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(got("b") == ((4L, 1L, 0L, 0.25, 0.0)))
    // a source with no tokens has no vocabulary rows — absent, like the
    // oracle's empty tf group (not a 0/0 row)
    assert(!got.contains("c"))
    // empty totality
    assert(TextMetrics.lexicalDiversity(docs.limit(0)).count() == 0)
  }

  test("zipfSlope: protocol-exact hand OLS, power-law slope ~ -1, degenerate and empty cases") {
    // src A: freqs 8/4/2/1 for terms a/b/c/d; src B: one term only
    val aText = (Seq.fill(8)("a") ++ Seq.fill(4)("b") ++ Seq.fill(2)("c") ++ Seq("d")).mkString(" ")
    val docs = Seq(("A", aText), ("B", "solo solo solo")).toDF("source", "text")
    val got = TextMetrics.zipfSlope(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    // driver-side twin of the exact protocol (round-12 lns recovered as
    // scaled BigDecimals, exact cross-product sums, fixed-order combine)
    def r12(v: Double) = BigDecimal(v).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val pts = Seq((1L, 8L), (2L, 4L), (3L, 2L), (4L, 1L))
      .map { case (rk, c) => (r12(math.log(rk.toDouble)), r12(math.log(c.toDouble))) }
    val n = pts.size.toDouble
    val sx = pts.map(_._1).sum.toDouble; val sy = pts.map(_._2).sum.toDouble
    val sxy = pts.map(p => p._1 * p._2).sum.toDouble
    val sxx = pts.map(p => p._1 * p._1).sum.toDouble
    val slope = BigDecimal((n * sxy - sx * sy) / (n * sxx - sx * sx))
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("A") == ((4L, Some(slope))))
    assert(slope < -0.9 && slope > -1.8, s"power-law-ish slope expected, got $slope")
    // a single distinct term has zero x-variance
    assert(got("B") == ((1L, None)))
    // deterministic under repartition; empty totality
    val got2 = TextMetrics.zipfSlope(docs.repartition(5)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    assert(got2 == got)
    assert(TextMetrics.zipfSlope(docs.limit(0)).count() == 0)
  }
}
