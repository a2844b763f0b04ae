package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._

/** Dev experiment: replicate sf0.1 10x into /tmp and time operator variants
  * head-to-head — evidence for the scale claims in SURVEY §5 (results in
  * BENCH_NOTES.md). Not part of the driver contract.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val big = "/tmp/graft_big"
    if (!new java.io.File(s"$big/events.parquet").exists()) {
      val ev = Tables.events(spark, "/root/testdata/sf0.1")
      val n = ev.count()
      val reps = (0 until 10).map(i => ev.withColumn("event_id", col("event_id") + lit(i * n))
        .withColumn("user_id", col("user_id") + lit(i * 1000L)))
      reps.reduce(_ unionAll _).repartition(32)
        .write.mode("overwrite").parquet(s"$big/events.parquet")
      val docs = Tables.documents(spark, "/root/testdata/sf0.1")
      val dn = docs.count()
      (0 until 10).map(i => docs.withColumn("doc_id", col("doc_id") + lit(i * dn)))
        .reduce(_ unionAll _).repartition(32)
        .write.mode("overwrite").parquet(s"$big/documents.parquet")
      val part = Tables.part(spark, "/root/testdata/sf0.1")
      val pn = part.count()
      (0 until 10).map(i => part.withColumn("p_partkey", col("p_partkey") + lit(i * pn)))
        .reduce(_ unionAll _).repartition(32)
        .write.mode("overwrite").parquet(s"$big/part.parquet")
    }
    def bigEvents = spark.read.parquet(s"$big/events.parquet")
    def bigDocs = spark.read.parquet(s"$big/documents.parquet")
    def bigPart = spark.read.parquet(s"$big/part.parquet")
    // optional substring filters: `runMain graft.ScaleProbe scc trending`
    // runs only probes whose name contains an argument (f is by-name, so
    // skipped probes cost nothing)
    def time(name: String)(f: => Long): Unit =
      if (args.isEmpty || args.exists(name.contains)) {
        val t0 = System.nanoTime()
        val n = f
        println(f"[probe] $name%-36s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n")
      }
    // warmup
    bigEvents.groupBy("event_type").count().count()
    time("latest_event/max_by")(StateOps.latestPerKey(bigEvents).count())
    time("balances/conditional-agg")(StateOps.balances(bigEvents).count())
    time("sessions/two-windows")(StateOps.sessionize(bigEvents).count())
    time("topk/heap-agg")(Analytics.topKPerGroup(bigPart).count())
    time("topk/window")(Analytics.topKPerGroupWindow(bigPart).count())
    time("dedup_exact/text-key")(Dedup.exact(bigDocs).count())
    time("dedup_exact/hash-key")(Dedup.exactByHash(bigDocs).count())
    time("minhash_lsh")(Dedup.minhashLsh(bigDocs).count())
    time("simhash/native")(Dedup.simhashDedup(bigDocs).count())
    time("ngram/balanced-8")(Dedup.ngramJaccardPairsBalanced(bigDocs, 0.1, 8).count())
    time("ngram/naive-1")(Dedup.ngramJaccardPairsBalanced(bigDocs, 0.1, 1).count())
    // round-4 additions: pair clustering, cross-corpus decontamination,
    // deterministic sampling (all over the 10x corpus)
    time("dup_clusters/pairs+cc") {
      Dedup.dupClusters(Dedup.ngramJaccardPairsIndexed(bigDocs, 0.5, blockBySource = false)).count()
    }
    time("decontaminate/half-vs-half") {
      Dedup.decontaminate(bigDocs.where(col("doc_id") % 2 === 0),
        bigDocs.where(col("doc_id") % 2 === 1)).count()
    }
    time("hash_sample/20pct")(Sampling.hashSample(bigDocs, "doc_id", 200).count())
    // round-5 additions: paragraph dedup (3-4 paragraphs/doc, heavy planted
    // boilerplate), tf-idf, pagerank, bloom gate, sketch-table serve
    time("para_dedup/10x-boiler") {
      val d = lit("\n\n")
      val boiler = concat(lit("shared boilerplate block variant "),
        (col("doc_id") % 7).cast("string"))
      val para = bigDocs.select(col("doc_id"), concat(
        lit("intro for doc "), col("doc_id").cast("string"), d, boiler, d,
        when(col("doc_id") % 3 === 0, lit("common promo text"))
          .otherwise(concat(lit("tail words for doc "), col("doc_id").cast("string"))),
        when(col("doc_id") % 5 === 0, concat(d, boiler)).otherwise("")).as("text"))
      Dedup.paragraphDedup(para).count()
    }
    time("tfidf/top5")(TextMetrics.tfidfTopTerms(bigDocs).count())
    time("pagerank/5-iters") {
      val edges = bigEvents.select((col("user_id") % 50000).as("src"),
        ((col("user_id") * 7 + 13) % 50000).as("dst"), lit(1L).as("cap"))
      Graph.pageRank(edges, iters = 5).count()
    }
    time("bloom_gate/10pct-eval") {
      val bloom = Dedup.buildContaminationBloom(bigDocs.where(col("doc_id") % 10 === 0))
      Dedup.bloomGate(bigDocs, bloom).where(col("maybe_contaminated")).count()
    }
    time("sketch_table/build+serve") {
      Analytics.distinctFromSketches(
        Analytics.hllSketchTable(bigEvents.withColumn("day", col("ts").cast("date")),
          "user_id", Seq("event_type", "day")),
        Seq("event_type")).count()
    }
    // round-5c additions: two-pass heavy hitters, the native hashed-vector
    // kernel (vs the interpreted HOF it replaced), generic CC on a bigger
    // graph, SCD build, z-order write+stats
    time("heavy_terms/two-pass-mg")(HeavyHitters.frequentTerms(bigDocs).count())
    time("hashed_vec/native-kernel")(TextVectors.hashedVectors(bigDocs).count())
    time("hashed_vec/hof-1pct-sample") { // full-corpus HOF would run ~minutes
      TextVectors.hashedVectorsHof(bigDocs.where(col("doc_id") % 100 === 0)).count()
    }
    time("connected_components/50k-nodes") {
      val edges = bigEvents.select((col("user_id") % 50000).as("src"),
        ((col("user_id") * 7 + 13) % 50000).as("dst"))
      Graph.connectedComponents(edges).count()
    }
    time("trust_scd/10x-history") {
      val tr = bigEvents.where(col("event_type") === "signup")
        .select(col("event_id").cast("string").as("hash"),
          (col("user_id") % 5000).cast("string").as("user"),
          ((col("user_id") * 7 + 13) % 5000).cast("string").as("can_send_to"),
          (col("event_id") % 101).as("limit"))
      val blocks = bigEvents.select(col("event_id").cast("string").as("hash"),
        col("event_id").as("number"))
      CirclesViews.trustHistoryScd(tr, blocks).count()
    }
    // round-6: the widest-paths dense-graph valve — exact closure vs beam
    // on a deliberately dense 2k-node graph (out-degree ~40, 3 hops →
    // the pair frame densifies toward |V|²; the beam stays N·|V|)
    def denseEdges = bigEvents.select(
      (col("user_id") % 2000).as("src"),
      ((col("user_id") * 7 + col("event_id") % 40) % 2000).as("dst"),
      (col("event_id") % 100 + 1).as("cap"))
    time("widest_paths/exact-2k-dense")(Graph.widestPaths(denseEdges, maxHops = 3).count())
    time("widest_paths/beam16-2k-dense") {
      Graph.widestPaths(denseEdges, maxHops = 3, frontierCap = 16).count()
    }
    time("zorder/write+stats-10x") {
      val base = java.nio.file.Files.createTempDirectory("graft-zprobe").toString
      Layout.zorderWrite(bigEvents.select(col("event_id"), col("user_id")),
        "event_id", "user_id", s"$base/z", 32)
      val (t, r) = Layout.pruningStats(spark, s"$base/z", "event_id", "user_id",
        0L, 100000L, 0L, 1000L)
      t * 1000 + r // encode both in the printed row count
    }
    // round-7: the round-6/7 operators at 10× — formatted views' block
    // join, the collapsed get_capacity probe, a deep-history ImportFeed
    // poll, and epochExpand at its maximum amplification
    def bigReceipts = ReceiptClassifier.demoReceipts(bigEvents)
    time("fmt_hub_transfer/10x-block-join") {
      CirclesViews.formattedView(SparkEntry.Demo.hubStr(bigReceipts),
        ReceiptClassifier.demoBlocks(bigEvents)).count()
    }
    time("get_capacity/2-scans-10x") {
      val owners = ReceiptClassifier.demoSignups(bigEvents)
        .where(col("token").isNotNull)
        .select(col("token"), col("user").as("token_owner"))
      val bal = CirclesViews.balancesBySafeAndToken(SparkEntry.Demo.erc20Num(bigReceipts))
        .join(broadcast(owners), Seq("token"))
      val trust = CirclesViews.currentTrust(ReceiptClassifier.extractTrusts(bigReceipts))
      CirclesViews.getCapacity(bal, trust,
        from = "0x" + "0" * 34 + "1e8481", to = "0x" + "0" * 38 + "14",
        tokenOwner = "0x" + "0" * 39 + "1").count()
    }
    time("capacity_changes_2/10x") {
      val signups = ReceiptClassifier.demoSignups(bigEvents)
      CirclesViews.capacityChangesSince2(
        CirclesViews.balancesBySafeAndToken(SparkEntry.Demo.erc20Num(bigReceipts)),
        CirclesViews.currentTrust(ReceiptClassifier.extractTrusts(bigReceipts)),
        signups,
        signups.where(col("token").isNull).select(col("user").as("organisation")),
        ReceiptClassifier.demoBlocks(bigEvents), sinceBlock = 5000L).count()
    }
    locally {
      // a years-deep feed: 400 b= partitions × 4 chunk files each (1600
      // slivers); the polls that matter are the partition-pruned tail cut
      // and the full sweep, and compaction folds each closed partition 4→1
      val feedDir = "/tmp/graft_big/feed4"
      if (!new java.io.File(feedDir).exists()) {
        val sub = graft.streaming.ImportFeed.subscriber(spark, feedDir)
        for (b <- 0L until 400L; c <- 0 until 4)
          sub(b, Iterator.range(b * 50 + c * 12, b * 50 + (c + 1) * 12).map(_.toLong))
      }
      time("import_feed/poll-tail-of-400") {
        graft.streaming.ImportFeed.recentlyImported(spark, feedDir, sinceBatch = 390L).count()
      }
      time("import_feed/poll-full-400")(
        graft.streaming.ImportFeed.recentlyImported(spark, feedDir).count())
      time("import_feed/compact-400") {
        graft.streaming.ImportFeed.compact(spark, feedDir, beforeBatch = 400L); 0L
      }
      time("import_feed/poll-full-compacted")(
        graft.streaming.ImportFeed.recentlyImported(spark, feedDir).count())
    }
    time("epoch_mix/maxEpochs3-10x") {
      // effectively-infinite budget → every source caps at maxEpochs full
      // passes: the worst-case (maxEpochs×) row expansion
      Sampling.epochMix(bigDocs, "source", "doc_id", "n_chars",
        Map("src0" -> 250, "src1" -> 250, "src2" -> 250, "src3" -> 250),
        budgetTokens = Long.MaxValue / 4, maxEpochs = 3).count()
    }
    // the reliable-checkpoint knob's cost model, measured: local (default)
    // vs a reliable checkpoint every 2nd round to local disk — the upper
    // bound of the knob's overhead at this scale (an object store adds
    // its own write latency, amortized by `every`)
    locally {
      def prEdges = bigEvents.select((col("user_id") % 50000).as("src"),
        ((col("user_id") * 7 + 13) % 50000).as("dst"), lit(1L).as("cap"))
      time("pagerank/local-ckpt")(Graph.pageRank(prEdges, iters = 5).count())
      time("pagerank/reliable-every2") {
        Graph.pageRank(prEdges, iters = 5,
          checkpointDir = Some("/tmp/graft_big/ck"), checkpointEvery = 2).count()
      }
    }
    // seen-hash store at 10×: fold 9/10 of the corpus in as 3 batches,
    // then gate the last tenth — the steady-state ingest shape
    locally {
      val viewDir = java.nio.file.Files.createTempDirectory("graft-seen10x")
        .toString + "/view"
      time("seen_store/merge-3-batches") {
        (0 until 3).foreach { i =>
          graft.streaming.ViewMaintenance.mergeSeenHashesBatch(spark,
            bigDocs.where(col("doc_id") % 10 < 9 && col("doc_id") % 3 === i)
              .select(xxhash64(col("text")).as("h")),
            viewDir, numBuckets = 64, version = i.toLong)
        }
        0L
      }
      time("seen_store/gate-last-tenth") {
        graft.streaming.ViewMaintenance.newDocsAgainstSeen(
          bigDocs.where(col("doc_id") % 10 === 9),
          graft.streaming.ViewMaintenance.readView(spark, viewDir)).count()
      }
    }
    // round-7b: CMS freq sketches, kNN graph (exact baseline at its cap +
    // the LSH twin over the full 20k replicated corpus — every vector now
    // has 10 exact copies, the adversarial hot-bucket shape), SQ8, the
    // per-source cap, and the snapshot diff
    if (!new java.io.File(s"$big/embeddings.parquet").exists()) {
      val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      val en = emb.count()
      (0 until 10).map(i => emb.withColumn("vec_id", col("vec_id") + lit(i * en)))
        .reduce(_ unionAll _).repartition(32)
        .write.mode("overwrite").parquet(s"$big/embeddings.parquet")
    }
    def bigEmb = spark.read.parquet(s"$big/embeddings.parquet")
    time("knn_graph/exact-300-cap")(Ann.knnGraph(bigEmb, k = 5, maxId = 300L).count())
    time("knn_graph_lsh/20k-dup-mass")(Ann.knnGraphLsh(bigEmb).count())
    time("ann_sq8/20k-exhaustive")(Pq.sq8TopK(bigEmb).count())
    // two scans off one checkpoint + a dim-row collect: should track the
    // embedding scan, not the corpus size beyond it
    time("embedding_outliers/20k")(Ann.outlierScores(bigEmb).count())
    time("source_cap/50k-docs") {
      Sampling.groupCap(bigDocs, "source", "doc_id", cap = 20, salt = "cap").count()
    }
    time("corpus_diff/50k") {
      Dedup.snapshotDiff(bigDocs.where(col("doc_id") % 3 > 0),
        bigDocs.where(col("doc_id") % 4 > 0)).count()
    }
    time("freq_sketch/build+serve-10x") {
      val toks = bigDocs.select(col("source"), col("lang"),
        explode(split(col("text"), " ")).as("term"))
      Analytics.freqFromSketches(
        Analytics.freqSketchTable(toks, "term", Seq("source", "lang")),
        Seq("source"), Seq("scan", "filter", "window", "zyzzyva")).count()
    }
    // the inverted index's amortization claim, measured: the build pays
    // ~one ad-hoc query's corpus pass; every served query after that
    // reads |Q| pruned posting partitions instead of re-tokenizing 50k docs
    locally {
      val tDir = "/tmp/graft_big/textindex"
      time("text_index/build-50k") { TextIndex.buildTextIndex(bigDocs, tDir); 0L }
      time("text_index/bm25-oneshot") {
        TextMetrics.bm25TopK(bigDocs, Seq("dup", "spark", "merge")).count()
      }
      time("text_index/bm25-served") {
        TextIndex.bm25FromIndex(spark, tDir, Seq("dup", "spark", "merge")).count()
      }
      time("text_index/phrase-served") {
        TextIndex.phraseDocsFromIndex(spark, tDir, Seq("scan", "filter")).count()
      }
    }
    // round-7c additions: the iterative graph family over a 10x functional
    // graph (10150 nodes, 2 out-edges each -> cycles + merging trees), the
    // windowed/moment analytics over 10x events
    locally {
      def bigTrust = bigEvents.select(col("user_id").as("src"),
          ((col("user_id") * 7 + 13) % 10150).as("dst"))
        .unionAll(bigEvents.select(col("user_id").as("src"),
          ((col("user_id") * 11 + 5) % 10150).as("dst")))
        .distinct()
      time("bfs_hops/10x-4hops") {
        Graph.bfsHops(bigTrust,
          bigEvents.select(col("user_id").as("node")).distinct().limit(600),
          maxHops = 4).count()
      }
      time("k_core/10x-k3")(Graph.kCore(bigTrust, k = 3).count())
      // fixed 5 rounds regardless of graph size: cost = 5 × (join +
      // two partial aggs) over the edge frame, no convergence probes
      time("label_prop_communities/10x-5rounds")(
        Graph.labelPropagation(bigTrust, iters = 5).count())
      // every 8th node gets a long-range chord: the pure 2-affine-map
      // functional graph has cycle circumference ~400 (simulated: min-label
      // propagation needs 421 hops — the fail-loud maxIters valve fires, by
      // design), which no social/trust graph has; chords give the
      // small-world diameter real graphs have (simulated: 34 hops)
      def bigTrustSw = bigTrust.unionAll(
        bigEvents.where(col("user_id") % 8 === 0)
          .select(col("user_id").as("src"),
            ((col("user_id") * 4973 + 29) % 10150).as("dst"))).distinct()
      time("scc/10x-small-world")(
        Graph.stronglyConnectedComponents(bigTrustSw, maxRounds = 100).count())
      // r8: the FW–BW-Trim acid test — a 40-layer DAG fringe (10k nodes)
      // feeding a 10k-node giant SCC. Pre-r8 the fringe cost a full FW–BW
      // round (2 propagation loops × diameter jobs) PER certified layer;
      // with trim it peels in 40 degree-filter iterations and the whole
      // run is 2 peel rounds (one FW–BW pass for the giant SCC, one empty
      // confirm): rounds ≈ trim-depth + #non-trivial SCCs, not |V|
      time("scc/dag40-fringe+giant-10k") {
        val n = 10000L
        val width = 250L
        val layers = 40L
        import spark.implicits._
        val dagE = spark.range(0, width * (layers - 1)).select(
          (lit(n) + $"id").as("src"),
          (lit(n) + $"id" - $"id" % width + width + ($"id" * 13 + 7) % width).as("dst"))
        val bridge = spark.range(0, width).select(
          (lit(n + (layers - 1) * width) + $"id").as("src"),
          ($"id" * 31 % n).as("dst"))
        val sccE = spark.range(0, n).select($"id".as("src"), (($"id" + 1) % n).as("dst"))
          .unionAll(spark.range(0, n).select($"id".as("src"), ($"id" * 7 % n).as("dst")))
        Graph.stronglyConnectedComponents(
          dagE.unionAll(bridge).unionAll(sccE), maxRounds = 10, maxIters = 200).count()
      }
      time("assortativity/10x")(Graph.degreeAssortativity(bigTrust).count())
      // r8c: earliest-arrival propagation on 10x temporal edges (ts =
      // event time): rounds ≈ temporal diameter, each one frontier join
      // + min agg over (node, long) pairs
      time("temporal_reach/10x-events") {
        Graph.temporalReach(
          bigEvents.select(col("user_id").as("src"),
            ((col("user_id") * 11 + 7) % 10150).as("dst"),
            unix_micros(col("ts")).as("ts")),
          bigEvents.select(col("user_id").as("node")).distinct().limit(600),
          startTs = 0L).count()
      }
      // r9: REALISTIC-topology cost envelope — the 10x-events row above is
      // the chord-less worst case (rounds = a long improving chain). Real
      // event graphs route through hubs: 1M spokes each wired spoke→hub
      // (ts = spoke id) and hub→spoke (all later), temporal diameter 2 —
      // the probe pins rounds ≈ diameter (3: two growth + one empty
      // confirming), NOT |E| (2M edges), so per-round frontier cost is the
      // whole bill
      time("temporal_reach/hub-spoke-1m-diam2") {
        import spark.implicits._
        val n = 1000000L
        val hub = lit(n)
        val inE = spark.range(0, n).select($"id".as("src"), hub.as("dst"),
          $"id".as("ts"))
        val outE = spark.range(0, n).select(hub.as("src"), $"id".as("dst"),
          (lit(n) + $"id").as("ts"))
        val (reach, rounds) = Graph.temporalReachWithRounds(
          inE.unionAll(outE),
          spark.range(0, 1).select(lit(0L).as("node")), startTs = 0L)
        val cnt = reach.count()
        println(s"[probe] temporal_reach hub-spoke rounds=$rounds (diameter 2)")
        cnt
      }
      // r8c: 2 walks × 8 steps from every node — 8 pointed (cur, rk)
      // joins; the md5 pick is computed map-side, state is (start, walk,
      // node) triples
      time("random_walks/10x-2x8") {
        Graph.randomWalks(bigTrustSw, walksPerNode = 2, length = 8).count()
      }
      // r8c: SGNS over the 10.5k-node walk corpus — per epoch two
      // embedding joins + one exact-decimal gradient agg + one
      // re-assembly; matrices are (node, array) frames end to end
      time("node2vec/10x-3epochs") {
        val walks = Graph.randomWalks(bigTrustSw, walksPerNode = 2, length = 6)
        Node2Vec.trainSgns(Node2Vec.walkPairs(walks, window = 2),
          dim = 16, epochs = 3, lr = 0.5).count()
      }
      // fixed-vs-marginal split for the SGNS loop: walks+pairs+setup vs
      // the per-epoch cost (epochs3 − epochs1)/2
      if (args.contains("n2v_split")) {
        val walks = Graph.randomWalks(bigTrustSw, walksPerNode = 2, length = 6)
        val pairs = Node2Vec.walkPairs(walks, window = 2).localCheckpoint(true)
        println(s"[probe] n2v pairs=${pairs.count()}")
        time("n2v_split/epochs1")(
          Node2Vec.trainSgns(pairs, dim = 16, epochs = 1, lr = 0.5).count())
        time("n2v_split/epochs3")(
          Node2Vec.trainSgns(pairs, dim = 16, epochs = 3, lr = 0.5).count())
      }
      // r8c: HyperBall NF, 64 rounds on the small-world graph (the pure
      // affine-map fringe keeps some directed paths past 64 hops, so this
      // measures the capped curve, ~0.5 s/round) — each round ONE
      // (join + 16-register max agg) over 64 B/node sketches; the exact
      // reach operator would shuffle ball MEMBERS (the giant component
      // alone makes that ~10k² pair rows)
      time("neighborhood_fn/10x-small-world-64rounds")(
        Graph.neighborhoodFunction(bigTrustSw, maxT = 64).count())
      // r11b: sampled Brandes on the same small-world graph — 12 sources
      // simultaneously, rounds = 2×BFS-depth (capped 6), state (s, node)
      time("betweenness/10x-12src-depth6") {
        val srcs = bigTrustSw.select(col("src").as("node")).distinct()
          .orderBy(xxhash64(col("node"), lit("btw")), col("node")).limit(12)
        Graph.betweenness(bigTrustSw, srcs, maxDepth = 6).count()
      }
      // r12: paired 10k-vs-1M rows for the iterative-graph family (r11
      // verdict item 3) — the 100 TB claim for scc/nf/harmonic/betweenness/
      // temporal_reach rests on "cost = round-count × per-round frontier
      // work"; these rows pin that ROUND COUNTS grow ~log n (the realistic
      // small-world diameter) while per-round work grows linearly — no
      // frontier blowup. Topology: hash-random out-degree-3 (xxhash64
      // targets — directed diameter ≈ log₃ n ≈ 9 at 10k / 13 at 1M; the
      // affine-map bigTrustSw above is DELIBERATELY adversarial for label
      // propagation and its min-label chains grow superlinearly with n, so
      // it measures budget valves, not scaling — both rows on record).
      locally {
        import spark.implicits._
        def rand3(n: Long) = (1 to 3).map(k => spark.range(0, n)
            .select($"id".as("src"),
              pmod(xxhash64($"id", lit(k)), lit(n)).as("dst")))
          .reduce(_ unionAll _).where($"src" =!= $"dst").distinct()
        for (n <- Seq(10150L, 1015000L)) {
          val tag = if (n < 100000L) "10k" else "1m"
          def g = rand3(n)
          time(s"scc/100x-rand3-$tag")(
            Graph.stronglyConnectedComponents(g, maxRounds = 100).count())
          // fused sweep (the q_trust_nf + q_trust_harmonic store build):
          // nf-curve row count − 1 = register-sweep rounds
          time(s"hyperball_both/100x-rand3-$tag") {
            val (nf, harm) = Graph.hyperBallBoth(g, maxT = 64)
            val rounds = nf.count() - 1
            val hn = harm.count()
            println(s"[probe] hyperball_both rand3-$tag rounds=$rounds harmonic_nodes=$hn")
            hn
          }
          time(s"betweenness/100x-rand3-$tag-12src-d6") {
            val srcs = g.select(col("src").as("node")).distinct()
              .orderBy(xxhash64(col("node"), lit("btw")), col("node")).limit(12)
            Graph.betweenness(g, srcs, maxDepth = 6).count()
          }
          time(s"temporal_reach/100x-rand3-$tag") {
            val (reach, rounds) = Graph.temporalReachWithRounds(
              g.select(col("src"), col("dst"), (col("src") % 1000L).as("ts")),
              spark.range(0, n, math.max(1L, n / 600)).select($"id".as("node")),
              startTs = 0L)
            val cnt = reach.count()
            println(s"[probe] temporal_reach rand3-$tag rounds=$rounds")
            cnt
          }
        }
        // r12 item-6 "done" leg: a DEEPER truncation cap on betweenness —
        // with the incremental visited frame the plan stays O(depth);
        // pre-fix the per-round reduce-union grew O(depth²) plan nodes and
        // a d16 run was where the bloat turned visible. Cost should land
        // near ~2.7x the d6 row (16/6 rounds, same per-round shape).
        time("betweenness/deep-rand3-10k-d16") {
          val g = rand3(10150L)
          val srcs = g.select(col("src").as("node")).distinct()
            .orderBy(xxhash64(col("node"), lit("btw")), col("node")).limit(12)
          Graph.betweenness(g, srcs, maxDepth = 16).count()
        }
      }
      time("transition_matrix/10x")(Behavior.transitionMatrix(bigEvents).count())
      time("histogram/10x")(Profiler.histogram(bigEvents, "value", 32).count())
      time("corr_matrix/10x-events") {
        Profiler.correlationMatrix(
          bigEvents.select(col("value"), col("user_id"), col("event_id")),
          Seq("value", "user_id", "event_id")).count()
      }
      time("dataset_checksum/10x-docs")(Integrity.datasetChecksum(bigDocs,
        Seq("doc_id", "text", "lang", "source", "n_chars")).count())
    }
    // r10: q_correlation arm decomposition on the sf0.1 lineitem (the bench
    // key's exact input) — attribute the exact arm's cost: decimal-multiply
    // moments vs min/max zero-variance guards vs the scan itself, and
    // measure the quantized-long alternative (products in primitive long,
    // sums in decimal(38,0)) head-to-head before switching the hot path.
    if (args.contains("corr_arms")) {
      val li = Tables.lineitem(spark, "/root/testdata/sf0.1")
      val cc = Seq("l_discount", "l_extendedprice", "l_quantity")
      li.count() // warm the file index / page cache
      for (i <- 1 to 2) {
        time(s"corr_arms/exact-$i")(Profiler.correlationMatrix(li, cc, exact = true).collect().length.toLong)
        time(s"corr_arms/fast-$i")(Profiler.correlationMatrix(li, cc, exact = false).collect().length.toLong)
      }
      val dd = (c: String) => col(c).cast("double").cast("decimal(18,4)")
      val pr = for { i <- cc.indices; j <- cc.indices if i <= j } yield (cc(i), cc(j))
      time("corr_arms/dec-moments-only")(li.agg(
        pr.map { case (a, b) => sum(dd(a) * dd(b)) }.head,
        pr.map { case (a, b) => sum(dd(a) * dd(b)) }.tail: _*).collect().length.toLong)
      val ql = (c: String) => round(col(c).cast("double") * 1e4).cast("long")
      time("corr_arms/qlong-moments")(li.agg(
        pr.map { case (a, b) => sum((ql(a) * ql(b)).cast("decimal(38,0)")) }.head,
        pr.map { case (a, b) => sum((ql(a) * ql(b)).cast("decimal(38,0)")) }.tail: _*).collect().length.toLong)
      time("corr_arms/minmax-only")(li.agg(
        cc.flatMap(c => Seq(min(col(c)), max(col(c)))).head,
        cc.flatMap(c => Seq(min(col(c)), max(col(c)))).tail: _*).collect().length.toLong)
      // bisect the 30-expression production agg: which ingredient blows
      // the 0.2s moments up to the 4.3s exact arm?
      val prs = for { i <- cc.indices; j <- cc.indices if i < j } yield (cc(i), cc(j))
      def fullAgg(withWhen: Boolean, withMinMax: Boolean, withCount: Boolean) = {
        val aggs = prs.zipWithIndex.flatMap { case ((a, b), p) =>
          val both = col(a).isNotNull && col(b).isNotNull
          def w(c: org.apache.spark.sql.Column) = if (withWhen) when(both, c) else c
          (if (withCount) Seq(count(w(lit(1))).as(s"n_$p")) else Nil) ++
          (if (withMinMax) Seq(
            min(w(col(a))).as(s"mina_$p"), max(w(col(a))).as(s"maxa_$p"),
            min(w(col(b))).as(s"minb_$p"), max(w(col(b))).as(s"maxb_$p")) else Nil) ++
          Seq(sum(w(dd(a))).as(s"sx_$p"), sum(w(dd(b))).as(s"sy_$p"),
            sum(w(dd(a) * dd(b))).as(s"sxy_$p"),
            sum(w(dd(a) * dd(a))).as(s"sxx_$p"),
            sum(w(dd(b) * dd(b))).as(s"syy_$p"))
        }
        li.agg(aggs.head, aggs.tail: _*)
      }
      time("corr_arms/agg30-full")(fullAgg(true, true, true).collect().length.toLong)
      time("corr_arms/agg30-full-2")(fullAgg(true, true, true).collect().length.toLong)
      time("corr_arms/agg-nowhen")(fullAgg(false, true, true).collect().length.toLong)
      time("corr_arms/agg-nominmax")(fullAgg(true, false, true).collect().length.toLong)
      time("corr_arms/agg-nocount")(fullAgg(true, true, false).collect().length.toLong)
      time("corr_arms/agg-momentsonly-when")(fullAgg(true, false, false).collect().length.toLong)
      // candidate fix: pre-PROJECT the when-guarded decimal columns once
      // per pair, then aggregate plain attribute references — the guard
      // and casts evaluate once per row (projection-level CSE) instead of
      // once per aggregate expression, bit-identical sums
      time("corr_arms/agg-projected") {
        val proj = prs.zipWithIndex.flatMap { case ((a, b), p) =>
          val both = col(a).isNotNull && col(b).isNotNull
          Seq(when(both, lit(1)).as(s"ind_$p"),
            when(both, col(a)).as(s"ga_$p"), when(both, col(b)).as(s"gb_$p"),
            when(both, dd(a)).as(s"da_$p"), when(both, dd(b)).as(s"db_$p"))
        }
        val aggs = prs.indices.flatMap { p => Seq(
          count(col(s"ind_$p")).as(s"n_$p"),
          min(col(s"ga_$p")).as(s"mina_$p"), max(col(s"ga_$p")).as(s"maxa_$p"),
          min(col(s"gb_$p")).as(s"minb_$p"), max(col(s"gb_$p")).as(s"maxb_$p"),
          sum(col(s"da_$p")).as(s"sx_$p"), sum(col(s"db_$p")).as(s"sy_$p"),
          sum(col(s"da_$p") * col(s"db_$p")).as(s"sxy_$p"),
          sum(col(s"da_$p") * col(s"da_$p")).as(s"sxx_$p"),
          sum(col(s"db_$p") * col(s"db_$p")).as(s"syy_$p")) }
        li.select(proj: _*).agg(aggs.head, aggs.tail: _*).collect().length.toLong
      }
      // split driver-side Catalyst planning from cluster execution: the
      // full agg is 0.15s, so if the arm is 4s+ the cost must be in
      // analysis/optimization of the post-agg r-combine tree
      locally {
        val df = Profiler.correlationMatrix(li, cc, exact = true)
        time("corr_arms/exact-plan-only") { df.queryExecution.executedPlan; 0L }
        time("corr_arms/exact-exec-after-plan")(df.collect().length.toLong)
      }
      locally {
        val df = Profiler.correlationMatrix(li, cc, exact = false)
        time("corr_arms/fast-plan-only") { df.queryExecution.executedPlan; 0L }
        time("corr_arms/fast-exec-after-plan")(df.collect().length.toLong)
      }
    }
    // round-7d additions: the two-phase ordered-scan family, the gram
    // operators (the heaviest: a full trigram explode), the served trend
    locally {
      def bigWealth = bigEvents.groupBy(col("user_id").as("id"))
        .agg(StateOps.dsum(col("value")).cast("double").as("wealth"))
      time("gini/10x-two-phase")(
        Economics.gini(bigWealth, "wealth", "id").count())
      time("lorenz/10x-deciles")(
        Economics.lorenz(bigWealth, "wealth", "id").count())
      time("budget_select/10x-500k-docs")(
        Sampling.budgetSelect(bigDocs, 30000000L).count())
      time("money_velocity/10x") {
        val erc = SparkEntry.Demo.erc20Num(
            ReceiptClassifier.demoReceipts(bigEvents))
          .join(ReceiptClassifier.demoBlocks(bigEvents).select("hash", "ts"), "hash")
        Economics.moneyVelocity(erc,
          ReceiptClassifier.demoSignups(bigEvents)).count()
      }
      time("trending/10x-raw")(Behavior.trendingEvents(bigEvents).count())
      time("novelty/10x-trigram-df")(
        TextMetrics.noveltyScore(bigDocs).count())
      time("source_overlap/10x")(
        TextMetrics.sourceNgramOverlap(bigDocs).count())
    }
    // round-7e additions: the entropy kernel (map-only corpus scan), the
    // containment inverted-gram join, basket pair expansion, TWAB's
    // opening-fold + one window, CUSUM's per-day collapse, active users,
    // HITS (10 decimal-sum half-iterations), hybrid fusion legs
    locally {
      time("entropy/10x-kernel")(TextMetrics.entropy(bigDocs).count())
      time("containment/10x-grams")(Dedup.containmentPairs(bigDocs).count())
      time("basket_affinity/10x") {
        // synthetic baskets off events: ~8 items per basket
        Analytics.basketAffinity(
          bigEvents.select((col("event_id") % 1000000L).as("bk"),
            (col("user_id") % 5000L).as("item")), "bk", "item").count()
      }
      time("twab/10x")(StateOps.timeWeightedBalance(bigEvents).count())
      time("cusum/10x-events")(Behavior.cusumChangepoints(bigEvents).count())
      time("active_users/10x")(Behavior.activeUsers(bigEvents).count())
      time("hits/10x-50k-nodes") {
        val edges = bigEvents.select((col("user_id") % 50000).as("src"),
          ((col("user_id") * 7 + 13) % 50000).as("dst"), lit(1L).as("cap"))
        Graph.hits(edges, iters = 5).count()
      }
      time("hybrid_search/10x-docs") {
        val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
        Retrieval.hybridSearch(bigDocs, emb,
          Seq("dup", "spark", "merge"), 0L, legK = 20).count()
      }
      time("weighted_pagerank/10x-50k") {
        val edges = bigEvents.select((col("user_id") % 50000).as("src"),
          ((col("user_id") * 7 + 13) % 50000).as("dst"),
          (col("user_id") % 101).as("cap"))
        Graph.pageRankWeighted(edges, iters = 5).count()
      }
      time("top_paths/10x")(Behavior.topPaths(bigEvents).count())
      time("seasonal_anomalies/10x")(
        Behavior.seasonalAnomalies(bigEvents).count())
      time("nearest_event/10x")(
        StateOps.nearestEvent(bigEvents, "click", "purchase").count())
      time("percentile_norm/10x") {
        Analytics.percentileNormalize(
          bigEvents.select(col("event_id"), col("value")), "value", "event_id")
          .count()
      }
      time("text_normalize/10x")(
        TextMetrics.normalizeText(bigDocs).select("doc_id", "changed").count())
      time("weighted_sample/10x")(
        Sampling.weightedSample(bigDocs.select(col("doc_id"),
          length(col("text")).as("w")), "doc_id", "w", k = 1000).count())
      time("entity_pairs/10x-part") {
        Dedup.editDistancePairs(bigPart, "p_partkey", "p_name", "p_brand")
          .count()
      }
      // one corpus pass + a (stage, hash) partial agg: should track the
      // slower of quality-score and repetition-kernel scans, not their sum
      time("curation_funnel/10x-500k-docs")(
        TextMetrics.curationFunnel(bigDocs).count())
      time("leakfree_split/10x-500k-docs")(
        Sampling.leakFreeSplit(bigDocs).count())
      time("dsir_weights/10x-500k-docs")(
        TextMetrics.importanceWeights(
          bigDocs.where(col("doc_id") % 2 === 0),
          bigDocs.where(col("doc_id") % 2 === 1)).count())
      // two column-pruned scans + a grid-sized tail: should track the
      // (source, n_chars) scan cost, not the corpus width
      // chunk explode + fused vote: only (doc_id, lang) pairs shuffle
      time("language_mix/10x-50k-docs")(
        TextMetrics.languageMix(bigDocs).count())
      // WindowGroupLimit bounds the top-100 cut map-side: the shuffle
      // after the (source,term) count carries <=100/source/partition
      time("zipf_slope/10x-50k-docs")(
        TextMetrics.zipfSlope(bigDocs).count())
      // one user-keyed window whose partitioning the groupBy reuses
      time("burstiness/10x-events")(
        Behavior.interEventStats(bigEvents).count())
      time("psi_drift/10x-500k-docs")(
        Profiler.psiDrift(
          bigDocs.where(col("doc_id") % 2 === 0),
          bigDocs.where(col("doc_id") % 2 === 1),
          valueCol = "n_chars", groupCol = "source").count())
      // r8c: one user-keyed window pass + ONE conditional channel agg
      // (the explode doubles conversion rows map-side, nothing else)
      time("attribution/10x-events")(
        Behavior.touchAttribution(bigEvents).count())
      // r8c: per-customer rollup + 3 orderedScan global ranks over a
      // 100k-customer frame synthesized from events (custkey = user,
      // spend = value) — tracks the orders scan + 3 tiny two-phase scans
      time("rfm/10x-100k-customers") {
        Behavior.rfmSegments(bigEvents.select(
          col("event_id").as("o_orderkey"), col("user_id").as("o_custkey"),
          col("value").as("o_totalprice"),
          col("ts").cast("timestamp").as("o_orderdate"))).count()
      }
      // r8c: canonical pick = ONE min_by partial agg over the (bounded)
      // cluster membership + a doc_id-keyed decoration join — candidate
      // generation is deliberately out of frame (probed by minhash/ngram)
      time("canonical_docs/10x-500k-docs-10pct-clustered") {
        val clusters = bigDocs.where(col("doc_id") % 10 === 0)
          .select(col("doc_id"), (col("doc_id") / 100).cast("long").as("cluster_id"))
        Dedup.canonicalDocs(bigDocs, clusters).count()
      }
      // r8c: KS drift — the per-group cumulative window runs over the
      // DOMAIN-COMPRESSED (group, value, count) frame, so cost tracks
      // |distinct values| per group, not row count
      time("ks_drift/10x-600k-events-20grp") {
        Profiler.ksDrift(
          bigEvents.where(col("event_id") % 2 === 0)
            .select((col("user_id") % 20).as("source"),
              col("value").as("n_chars")),
          bigEvents.where(col("event_id") % 2 === 1)
            .select((col("user_id") % 20).as("source"),
              col("value").as("n_chars")),
          "n_chars", "source", scale = 100L).count()
      }
      // r8c: markov attribution — two windows on ONE (user, jid)
      // partitioning + a (from,to) partial agg; the chain solves are
      // driver-side on a |event_type|-bounded matrix
      time("markov_attribution/10x-events")(
        Behavior.markovAttribution(bigEvents).count())
      // r8c: standardize — map-side explode, dim-row stats broadcast back
      time("embedding_standardize/20k-vectors") {
        val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
        val big = (0 until 4).map(i =>
          emb.withColumn("vec_id", col("vec_id") + lit(i * 5000L)))
          .reduce(_ unionAll _)
        graft.operators.Ann.standardizeEmbeddings(big).count()
      }
      // r9: embedding drift — two snapshot scans collapse map-side to
      // (group, dim, n, Σxq) partial aggs; join + rollup on
      // |groups|·|dims| rows, never vectors
      time("embedding_drift/20k-vectors-8grp") {
        val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
        val big = (0 until 4).map(i =>
          emb.withColumn("vec_id", col("vec_id") + lit(i * 5000L)))
          .reduce(_ unionAll _)
          .select(col("vec_id"), col("embedding"), (col("vec_id") % 8).as("src"))
        graft.operators.Ann.embeddingDrift(
          big.where(col("vec_id") % 2 === 0),
          big.where(col("vec_id") % 2 === 1), "src").count()
      }
      // r9: lexical diversity — ONE (source, term) partial-agg count
      // over the 500k-doc corpus + a vocabulary-row rollup
      time("lexical_diversity/500k-docs")(
        TextMetrics.lexicalDiversity(bigDocs).count())
    }
    // JPEG decode throughput through the raster front door (pure-JVM
    // Huffman + IDCT kernel): 2048 distinct 256×256 baseline JPEGs, the
    // x^y checker content keeping the entropy decode honest. Encoding
    // (javax.imageio) is excluded from the timing by the persist.
    if (args.isEmpty || args.contains("jpeg_decode")) {
      import spark.implicits._
      val media = spark.range(2048).as[Long].map { id =>
        val img = new java.awt.image.BufferedImage(256, 256,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < 256) {
          var x = 0
          while (x < 256) {
            val r = (x + id) & 0xff
            val g = (y * 2 + id * 7) & 0xff
            val b = ((x ^ y) + id * 13) & 0xff
            img.setRGB(x, y, ((r << 16) | (g << 8) | b).toInt)
            x += 1
          }
          y += 1
        }
        (id, "image", DevJpeg.encode(img, 0.85f, progressive = false))
      }.toDF("media_id", "modality", "payload").persist()
      val mb = media.agg(sum(length(col("payload")))).head().getLong(0) / 1e6
      time(f"jpeg_decode/2048x-256sq-$mb%.0fMB")(
        graft.multimodal.BinaryPipeline.decodeImages(media)
          .where(col("real_decode")).count())
      media.unpersist()
    }
    // r10: drift-gated IVF maintenance at 10x — the append (quiet) arm vs
    // the retrain+rebuild (alarmed) arm on the 10x embedding corpus, so
    // the rebuild's one-time cost is a labeled number next to the append
    // it replaces only under drift
    if (args.contains("ivf_drift")) {
      def bigEmb = spark.read.parquet(s"$big/embeddings.parquet")
      val dir = java.nio.file.Files.createTempDirectory("graft-ivfdrift").toString + "/idx"
      val n = bigEmb.count()
      time(s"ivf_drift/build-${n}vec") {
        Ann.buildIvfIndex(bigEmb, dir, numCentroids = 16, numQueries = 0)
        graft.sources.ParquetCompactor.read(spark, s"$dir/lists").count()
      }
      // quiet batch: the same corpus distribution under fresh ids
      val quiet = bigEmb.withColumn("vec_id", col("vec_id") + lit(10L * n))
      time("ivf_drift/append-quiet") {
        val act = Ann.maintainIvfIndexWithDrift(quiet, dir, batchId = 1L, tau = 0.5)
        println(s"[probe] ivf_drift quiet action=$act (expect appended)")
        graft.sources.ParquetCompactor.read(spark, s"$dir/lists").count()
      }
      // drifted batch: every component shifted far past tau
      val drifted = bigEmb
        .withColumn("vec_id", col("vec_id") + lit(20L * n))
        .withColumn("embedding",
          transform(col("embedding"), x => x + lit(5.0f)))
      time("ivf_drift/rebuild-drifted") {
        val act = Ann.maintainIvfIndexWithDrift(drifted, dir, batchId = 2L, tau = 0.5)
        println(s"[probe] ivf_drift drifted action=$act (expect rebuilt)")
        graft.sources.ParquetCompactor.read(spark,
          s"${graft.sources.ParquetCompactor.currentDir(spark, dir)}/lists").count()
      }
    }
    // PNG decode throughput through the same front door (Inflater +
    // per-row unfilter kernel): 2048 distinct 256² RGB PNGs, the same
    // checker content — lossless, so real_decode implies exact pixels
    if (args.isEmpty || args.contains("png_decode")) {
      import spark.implicits._
      val media = spark.range(2048).as[Long].map { id =>
        val img = new java.awt.image.BufferedImage(256, 256,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < 256) {
          var x = 0
          while (x < 256) {
            val r = (x + id) & 0xff
            val g = (y * 2 + id * 7) & 0xff
            val b = ((x ^ y) + id * 13) & 0xff
            img.setRGB(x, y, ((r << 16) | (g << 8) | b).toInt)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        (id, "image", bos.toByteArray)
      }.toDF("media_id", "modality", "payload").persist()
      val mb = media.agg(sum(length(col("payload")))).head().getLong(0) / 1e6
      time(f"png_decode/2048x-256sq-$mb%.0fMB")(
        graft.multimodal.BinaryPipeline.decodeImages(media)
          .where(col("real_decode")).count())
      media.unpersist()
    }
    // MJPEG AVI frame decode: 256 videos × 8 frames of 128² through the
    // container walk + the same JPEG kernel; map-only, frames sampled 1:2
    if (args.isEmpty || args.contains("video_frames")) {
      import spark.implicits._
      val media = spark.range(256).as[Long].map { id =>
        def cc(x: String) = x.getBytes("US-ASCII")
        def u32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
          ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
        val movi = new java.io.ByteArrayOutputStream()
        movi.write(cc("movi"))
        (0 until 8).foreach { k =>
          val img = new java.awt.image.BufferedImage(128, 128,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < 128) {
            var x = 0
            while (x < 128) {
              val v = ((x ^ y) + id * 13 + k * 31) & 0xff
              img.setRGB(x, y, ((v << 16) | (v << 8) | v).toInt)
              x += 1
            }
            y += 1
          }
          val f = DevJpeg.encode(img, 0.85f, progressive = false)
          movi.write(cc("00dc")); movi.write(u32(f.length)); movi.write(f)
          if (f.length % 2 == 1) movi.write(0)
        }
        val body = new java.io.ByteArrayOutputStream()
        body.write(cc("AVI "))
        body.write(cc("LIST")); body.write(u32(movi.size())); body.write(movi.toByteArray)
        val out = new java.io.ByteArrayOutputStream()
        out.write(cc("RIFF")); out.write(u32(body.size())); out.write(body.toByteArray)
        (id, "video", out.toByteArray)
      }.toDF("media_id", "modality", "payload").persist()
      media.count() // exclude encoding from the timing
      time("video_frames/256avi-8f-sample2")(
        graft.multimodal.BinaryPipeline.videoFrames(media, every = 2).count())
      // r9: the streaming video corpus path end-to-end — batch 0 folds
      // 192 videos' frame sigs into the seen-sig store; batch 1 offers
      // 128 under NEW ids, 64 of which are byte-copies of stored footage:
      // the near_dup_store gate should drop exactly those 64. Footage is
      // id-keyed NOISE (the gradient set above is dHash-DEGENERATE by
      // design of dHash: videos differing only by a constant brightness
      // offset share every gradient sign — a correct non-match for the
      // brightness-invariant hash, the wrong corpus for a dedup probe)
      if (args.isEmpty || args.contains("video_corpus")) {
        val base = java.nio.file.Files.createTempDirectory("graft-vc-probe").toString
        val noisy = spark.range(256).as[Long].map { id =>
          def cc(x: String) = x.getBytes("US-ASCII")
          def u32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
            ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
          val movi = new java.io.ByteArrayOutputStream()
          movi.write(cc("movi"))
          (0 until 8).foreach { k =>
            val img = new java.awt.image.BufferedImage(64, 64,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < 64) {
              var x = 0
              while (x < 64) {
                // id-keyed hash texture with a FULL avalanche (splitmix64
                // finalizer): a plain multiplicative hash leaves a lattice
                // along the dHash sample grid and every frame collapses to
                // the same alternating sign pattern (measured: 2 distinct
                // sigs over 1536 frames)
                var z = (x.toLong * 0x9E3779B97F4A7C15L) ^
                  (y.toLong * 0xC2B2AE3D27D4EB4FL) ^
                  ((id * 8 + k + 1) * 0x165667B19E3779F9L)
                z ^= (z >>> 29); z *= 0xBF58476D1CE4E5B9L; z ^= (z >>> 32)
                val v = (z & 0xffL).toInt
                img.setRGB(x, y, ((v << 16) | (v << 8) | v))
                x += 1
              }
              y += 1
            }
            val f = DevJpeg.encode(img, 0.85f, progressive = false)
            movi.write(cc("00dc")); movi.write(u32(f.length)); movi.write(f)
            if (f.length % 2 == 1) movi.write(0)
          }
          val body = new java.io.ByteArrayOutputStream()
          body.write(cc("AVI "))
          body.write(cc("LIST")); body.write(u32(movi.size())); body.write(movi.toByteArray)
          val out = new java.io.ByteArrayOutputStream()
          out.write(cc("RIFF")); out.write(u32(body.size())); out.write(body.toByteArray)
          (id, "video", out.toByteArray)
        }.toDF("media_id", "modality", "payload").persist()
        noisy.count() // exclude encoding from the timing
        val withTs = noisy.withColumn("ingest_ts",
          org.apache.spark.sql.functions.to_timestamp(lit("2024-01-01 10:00:00")))
        time("video_corpus/batch0-192avi") {
          graft.streaming.CorpusPipeline.mergeVideoCorpusBatch(spark,
            withTs.where(col("media_id") < 192),
            s"$base/corpus", s"$base/sigs", batchId = 0L)
          val stored = graft.streaming.ViewMaintenance.readView(spark, s"$base/sigs")
          println(s"[probe] video_corpus stored distinct sigs=${stored.count()} " +
            s"(1536 = fully distinct footage)")
          spark.read.parquet(s"$base/corpus").count()
        }
        time("video_corpus/batch1-64dup-64new") {
          graft.streaming.CorpusPipeline.mergeVideoCorpusBatch(spark,
            withTs.where(col("media_id") >= 128)
              .withColumn("media_id", col("media_id") + 1000L),
            s"$base/corpus", s"$base/sigs", batchId = 1L)
          val c = spark.read.parquet(s"$base/corpus")
          val dropped = c.where(col("reason") === "near_dup_store").count()
          println(s"[probe] video_corpus batch1 near_dup_store drops=$dropped (expect 64)")
          c.count()
        }
        noisy.unpersist()
      }
      media.unpersist()
    }
    // r9: audio fingerprint + near-dup envelope — 2048 clips of 2s PCM16
    // @8kHz (~64 MB of samples), 10% planted requantized dups; prints are
    // map-only, the pair join shuffles (media_id, win_idx, 8B print) rows
    if (args.isEmpty || args.contains("audio_neardup")) {
      import spark.implicits._
      val clips = spark.range(2048).as[Long].map { id =>
        val rate = 8000
        val n = rate * 2
        val seed = (id % 1843).toInt // ~10% of ids collide on a take
        val s = new Array[Short](n)
        var i = 0
        while (i < n) {
          val t = i.toDouble / rate
          val env = 0.4 + 0.6 * math.abs(math.sin(2 * math.Pi * (1.0 + (seed % 7) * 0.4) * t))
          val x = env * (0.6 * math.sin(2 * math.Pi * (200 + seed * 3) * t) +
            0.4 * math.sin(2 * math.Pi * (450 + seed * 5) * t))
          s(i) = (0.8 * x * 32767).toShort
          i += 1
        }
        // duplicate ids (seed collisions) re-emit as 8-bit requantized
        val pcm8 = id >= 1843
        val bytesPer = if (pcm8) 1 else 2
        val bb = java.nio.ByteBuffer.allocate(44 + n * bytesPer)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * bytesPer)
          .put("WAVE".getBytes("US-ASCII"))
          .put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1).putShort(1).putInt(rate)
          .putInt(rate * bytesPer).putShort(bytesPer.toShort)
          .putShort((8 * bytesPer).toShort)
          .put("data".getBytes("US-ASCII")).putInt(n * bytesPer)
        s.foreach(v => if (pcm8) bb.put(((v / 256) + 128).toByte) else bb.putShort(v))
        (id, "audio", bb.array())
      }.toDF("media_id", "modality", "payload").persist()
      clips.count() // exclude encoding from the timing
      time("audio_fingerprints/2048x2s")(
        graft.multimodal.BinaryPipeline.audioFingerprints(clips).count())
      time("audio_neardup/2048x2s-10pct-dups")(
        graft.multimodal.BinaryPipeline.audioNearDupPairs(clips).count())
      clips.unpersist()
    }
    // ---- round-11 probes: the round-10 serve surface at 10x ---------------
    // hybrid retrieval SERVED from stored indexes over the 10x corpus:
    // each index build is the labeled ONE-TIME cost; the serve row is the
    // steady-state read a deployment repeats per query
    if (args.contains("hybrid_served")) {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions.row_number
      val base = java.nio.file.Files.createTempDirectory("graft-hs-probe").toString
      time("hybrid_served/build-text-index-10x") {
        TextIndex.buildTextIndex(bigDocs, s"$base/text")
        1L
      }
      time("hybrid_served/build-ivf-10x") {
        Ann.buildIvfIndex(bigEmb, s"$base/ivf", numCentroids = 16, numQueries = 1)
        1L
      }
      time("hybrid_served/serve-rrf") {
        val bmLeg = TextIndex.bm25FromIndex(spark, s"$base/text",
            Seq("dup", "spark", "merge"), topK = 20)
          .withColumn("rk", row_number()
            .over(Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
          .select(col("doc_id"), col("rk"))
        val dLeg = Ann.ivfTopKFromIndex(
            bigEmb.where(col("vec_id") === 0L), s"$base/ivf", nprobe = 16, k = 20)
          .select(col("nid").as("doc_id"), col("rk"))
        Retrieval.rrfFuse(bmLeg, dLeg).count()
      }
      time("retrieval_agreement/10x") {
        Retrieval.rankingAgreement(
          Retrieval.bm25Leg(bigDocs, Seq("dup", "spark", "merge"), 20),
          Retrieval.denseLeg(bigEmb, 0L, 20), k = 20).count()
      }
    }
    // near-dup detector PAIR-SET AGREEMENT at 10x: both exact detectors'
    // pair lists + the agreement fold (the fold itself is pair-count-sized;
    // the legs are the cost being measured — at 100 TB they are MAINTAINED
    // artifacts, the fold reads them)
    if (args.contains("pair_agreement")) {
      time("pair_agreement/legs+fold-10x") {
        val jac = Dedup.ngramJaccardPairs(bigDocs, 0.5)
          .select(col("doc_a"), col("doc_b"))
        val cont = Dedup.containmentPairs(bigDocs)
          .select(col("doc_a"), col("doc_b"))
        Dedup.pairSetMetrics(jac, cont).count()
      }
    }
    // streaming IMAGE corpus store at 10x media volume: 1536 distinct
    // textures fold into the store, then a 512-image batch offers 256
    // byte-fresh RE-ENCODES of stored pixels (JPEG of stored PNG content —
    // zero byte overlap, dHash carries the verdict) + 256 new textures
    if (args.contains("image_corpus")) {
      import spark.implicits._
      val base = java.nio.file.Files.createTempDirectory("graft-ic-probe").toString
      def texture(id: Long, size: Int): java.awt.image.BufferedImage = {
        val img = new java.awt.image.BufferedImage(size, size,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < size) {
          var x = 0
          while (x < size) {
            // splitmix64-avalanched texture (the video_corpus lesson:
            // structured gradients are dHash-degenerate)
            var z = (x.toLong * 0x9E3779B97F4A7C15L) ^
              (y.toLong * 0xC2B2AE3D27D4EB4FL) ^ ((id + 1) * 0x165667B19E3779F9L)
            z ^= (z >>> 29); z *= 0xBF58476D1CE4E5B9L; z ^= (z >>> 32)
            val v = (z & 0xffL).toInt
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        img
      }
      val media = spark.range(2048).as[Long].map { id =>
        val texId = if (id >= 1536 && id < 1792) id - 1536 else id // re-encode band
        val img = texture(texId, 128)
        val bos = new java.io.ByteArrayOutputStream()
        if (id >= 1536 && id < 1792) bos.write(DevJpeg.encode(img, 0.9f, progressive = false))
        else javax.imageio.ImageIO.write(img, "png", bos)
        (id, "image", bos.toByteArray)
      }.toDF("media_id", "modality", "payload")
        .withColumn("ingest_ts", to_timestamp(lit("2024-01-01 10:00:00")))
        .persist()
      media.count() // exclude encoding from the timing
      time("image_corpus/batch0-1536png") {
        graft.streaming.CorpusPipeline.mergeImageCorpusBatch(spark,
          media.where(col("media_id") < 1536), s"$base/corpus", s"$base/sigs",
          batchId = 0L)
        spark.read.parquet(s"$base/corpus").count()
      }
      time("image_corpus/batch1-256reenc-256new") {
        graft.streaming.CorpusPipeline.mergeImageCorpusBatch(spark,
          media.where(col("media_id") >= 1536), s"$base/corpus", s"$base/sigs",
          batchId = 1L)
        val c = spark.read.parquet(s"$base/corpus")
        val drops = c.where(col("reason") === "near_dup_store").count()
        println(s"[probe] image_corpus batch1 near_dup_store drops=$drops (expect ~256)")
        c.count()
      }
      media.unpersist()
    }
    // streaming AUDIO corpus store at 10x: 1536 distinct takes fold in,
    // then a 512-clip batch offers ~205 PCM8 REQUANTIZATIONS of stored
    // PCM16 takes (zero byte overlap; Haitsma-Kalker prints decide)
    if (args.contains("audio_corpus")) {
      import spark.implicits._
      val base = java.nio.file.Files.createTempDirectory("graft-ac-probe").toString
      val clips = spark.range(2048).as[Long].map { id =>
        val rate = 8000
        val n = rate * 2
        val seed = (id % 1843).toInt
        val s = new Array[Short](n)
        var i = 0
        while (i < n) {
          val t = i.toDouble / rate
          val env = 0.4 + 0.6 * math.abs(math.sin(2 * math.Pi * (1.0 + (seed % 7) * 0.4) * t))
          val x = env * (0.6 * math.sin(2 * math.Pi * (200 + seed * 3) * t) +
            0.4 * math.sin(2 * math.Pi * (450 + seed * 5) * t))
          s(i) = (0.8 * x * 32767).toShort
          i += 1
        }
        val pcm8 = id >= 1843
        val bytesPer = if (pcm8) 1 else 2
        val bb = java.nio.ByteBuffer.allocate(44 + n * bytesPer)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * bytesPer)
          .put("WAVE".getBytes("US-ASCII"))
          .put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1).putShort(1).putInt(rate)
          .putInt(rate * bytesPer).putShort(bytesPer.toShort)
          .putShort((8 * bytesPer).toShort)
          .put("data".getBytes("US-ASCII")).putInt(n * bytesPer)
        s.foreach(v => if (pcm8) bb.put(((v / 256) + 128).toByte) else bb.putShort(v))
        (id, "audio", bb.array())
      }.toDF("media_id", "modality", "payload")
        .withColumn("ingest_ts", to_timestamp(lit("2024-01-01 10:00:00")))
        .persist()
      clips.count() // exclude encoding from the timing
      time("audio_corpus/batch0-1536wav") {
        graft.streaming.CorpusPipeline.mergeAudioCorpusBatch(spark,
          clips.where(col("media_id") < 1536), s"$base/corpus", s"$base/sigs",
          batchId = 0L)
        spark.read.parquet(s"$base/corpus").count()
      }
      time("audio_corpus/batch1-205requant") {
        graft.streaming.CorpusPipeline.mergeAudioCorpusBatch(spark,
          clips.where(col("media_id") >= 1536), s"$base/corpus", s"$base/sigs",
          batchId = 1L)
        val c = spark.read.parquet(s"$base/corpus")
        val drops = c.where(col("reason") === "near_dup_store").count()
        println(s"[probe] audio_corpus batch1 near_dup_store drops=$drops (expect ~205)")
        c.count()
      }
      clips.unpersist()
    }
    // ---- round-11b probes: the generic ABI decode surface at 10x ----------
    // decodeEvents explodes every receipt's logs and runs the whole-registry
    // chained-CASE projection (map-only, the orderBy is the only exchange);
    // decodeCalls/callCoverage are pure projections over tx.input
    if (args.contains("abi_decode")) {
      def bigRx = ReceiptClassifier.demoReceipts(bigEvents)
      time("abi_decode/events-10x")(AbiDecode.decodeEvents(bigRx).count())
      time("abi_decode/event-coverage-10x")(AbiDecode.decodeCoverage(bigRx).count())
      time("abi_decode/calls-10x")(AbiDecode.decodeCalls(bigRx).count())
      time("abi_decode/call-coverage-10x")(AbiDecode.callCoverage(bigRx).count())
      // the wide typed decode without the long-format explode/orderBy —
      // the shape a downstream view consumes directly
      time("abi_decode/wide-transfer-10x")(
        AbiDecode.decodeEvent(bigRx, AbiDecode.Erc20Transfer).count())
      // r13/r14 array-family kernels at 10x: static-word arrays
      // (AbiWordArrayExpr), bytes[] offset-table tails (KindDynBytes),
      // static-tuple inline arrays (evalTuple) — each one codegen'd pass
      time("abi_decode/word-array-10x")(
        AbiDecode.decodeEvents(AbiDecode.demoArrayReceipts(bigEvents),
          Seq(AbiDecode.DemoBatchTransfer)).count())
      time("abi_decode/bytes-array-10x")(
        AbiDecode.decodeEvents(AbiDecode.demoDynArrayReceipts(bigEvents),
          Seq(AbiDecode.DemoMulticall)).count())
      time("abi_decode/tuple-array-10x")(
        AbiDecode.decodeEvents(AbiDecode.demoTupleArrayReceipts(bigEvents),
          Seq(AbiDecode.DemoPairBatch)).count())
      time("abi_decode/multicall-10x")(
        AbiDecode.decodeCalls(AbiDecode.demoAggregate3Receipts(bigEvents),
          Seq(AbiDecode.Aggregate3)).count())
      time("abi_decode/nested-array-10x")(
        AbiDecode.decodeEvents(AbiDecode.demoNestedArrayReceipts(bigEvents),
          Seq(AbiDecode.DemoMatrix)).count())
    }
    // the exact cross-engine minhash/simhash editions vs the xxhash64
    // natives at 10x — the measured price of md5-per-gram oracle keys
    // (the natives remain the scale path; the exact twins exist for
    // cross-engine verification)
    if (args.contains("dedup_exact_twins")) {
      time("dedup_exact_twins/minhash-native-10x")(Dedup.minhashLsh(bigDocs).count())
      time("dedup_exact_twins/minhash-md5-10x")(Dedup.minhashLshExact(bigDocs).count())
      time("dedup_exact_twins/simhash-native-10x")(Dedup.simhashDedup(bigDocs).count())
      time("dedup_exact_twins/simhash-md5-10x")(Dedup.simhashDedupExact(bigDocs).count())
    }
    // MMR rerank at its contract ceiling: 256 candidates (the bounded
    // collect = 256 rel rows + 32,640 sim pairs), greedy k=20 — the
    // driver-side loop's worst case, next to a 10x-corpus candidate build
    if (args.contains("mmr_rerank")) {
      time("mmr_rerank/cand-build-10x-200k") {
        Retrieval.denseLegScored(bigEmb, 0L, 256).count()
      }
      time("mmr_rerank/256cand-k20") {
        Retrieval.mmrRerank(Retrieval.denseLegScored(bigEmb, 0L, 256), bigEmb,
          k = 20, lambda = 0.7, maxCandidates = 256).count()
      }
    }
    // capacity_graph v1 beside _2 at 10x (the round-11 catalog port)
    if (args.contains("capacity_v1")) {
      time("capacity_v1/10x") {
        val rx = ReceiptClassifier.demoReceipts(bigEvents)
        val signups = ReceiptClassifier.demoSignups(bigEvents)
        CirclesViews.capacityGraph1(
          CirclesViews.balancesBySafeAndToken(SparkEntry.Demo.erc20Num(rx)),
          CirclesViews.currentTrust(ReceiptClassifier.extractTrusts(rx)),
          signups).count()
      }
    }
    // live push-source throughput: a local feed server pushes 100k event
    // rows across 2k blocks through the graft-live DataSourceV2 into a
    // counting sink — the sub-second-latency ingest path's ceiling on one
    // driver thread (the reference runs its websocket reader exactly there)
    if (args.contains("live_source")) {
      val server = new java.net.ServerSocket(0)
      val rows = 100000L
      val perBlock = 50L
      val feeder = new Thread(() => {
        val s = server.accept()
        val in = new java.io.BufferedReader(
          new java.io.InputStreamReader(s.getInputStream, "UTF-8"))
        in.readLine() // the subscribe request
        val out = new java.io.BufferedWriter(
          new java.io.OutputStreamWriter(s.getOutputStream, "UTF-8"), 1 << 16)
        var id = 0L
        while (id < rows) {
          val b = id / perBlock
          out.write(s"""{"block":$b,"event_id":$id,"ts_us":${id * 1000L},""" +
            s""""user_id":${id % 1000L},"event_type":"click","value":1.5,""" +
            s""""n_in_block":$perBlock}""")
          out.write("\n")
          id += 1
        }
        out.flush(); s.close()
      }, "probe-live-feeder")
      feeder.setDaemon(true); feeder.start()
      time(s"live_source/ingest-${rows}rows") {
        val total = new java.util.concurrent.atomic.AtomicLong()
        val q = spark.readStream.format("graft-live")
          .option("host", "127.0.0.1").option("port", server.getLocalPort)
          .option("idleTimeoutMs", 120000).load()
          .writeStream
          .foreachBatch((b: DataFrame, _: Long) => { total.addAndGet(b.count()); () })
          .option("checkpointLocation",
            java.nio.file.Files.createTempDirectory("graft-live-probe").toString)
          .start()
        val deadline = System.nanoTime() + 120L * 1000000000L
        while (total.get() < rows && System.nanoTime() < deadline) {
          q.processAllAvailable()
        }
        q.stop()
        total.get()
      }
      server.close()
    }
    spark.stop()
  }
}
