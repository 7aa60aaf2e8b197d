package graft

/** Plan-shape regression tests: the scale contract, asserted on the
  * physical plan (SURVEY §4). These fail if a refactor silently loses
  * pushdown, broadcasts, or top-k pushdown — the regressions that stay
  * invisible at test scale and bite at 100 TB.
  */
class PlanSpec extends SparkSuite {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  private def formatted(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  test("q02: all predicates push into the parquet scan") {
    val f = formatted("q02_filter_pushdown")
    assert(f.contains("PushedFilters:"))
    assert(f.contains("GreaterThanOrEqual(l_shipdate"), "shipdate range not pushed")
    assert(f.contains("LessThan(l_quantity,24.0)"), "quantity bound not pushed")
  }

  test("q02: scan reads only referenced columns (pruning)") {
    val f = formatted("q02_filter_pushdown")
    val readSchema = f.linesIterator.find(_.contains("ReadSchema:")).get
    assert(!readSchema.contains("l_orderkey"), "unused column read")
    assert(readSchema.contains("l_discount"))
  }

  test("q03: dimension tables broadcast (no shuffle of customer)") {
    val p = plan("q03_join_broadcast")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"), "dim join degraded to SMJ")
  }

  test("q06: anti-join planned as a join, not a cartesian") {
    val p = plan("q06_anti_join")
    assert(p.contains("LeftAnti"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q08: global top-k planned as TakeOrderedAndProject (no full sort)") {
    val p = plan("q08_sort_limit")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q13: range join broadcasts the tiny segment side") {
    val p = plan("q13_range_join")
    assert(p.contains("BroadcastNestedLoopJoin"))
  }

  test("q01: aggregation is two-phase (partial before shuffle)") {
    val f = formatted("q01_agg")
    assert(f.contains("partial_sum") || f.contains("Partial"),
      "no map-side partial aggregation")
  }

  test("q46: native cosine expression is codegen'd (no fallback marker)") {
    val f = formatted("q46_cosine_topk")
    assert(f.contains("graft.functions.VectorKernels") || !f.contains("CodegenFallback"),
      "cosine kernel fell out of codegen")
  }

  test("bucketed tables join without a shuffle (co-located join)") {
    import graft.sources.Sinks
    // a previous JVM's warehouse dir isn't in this session's catalog —
    // clear both the table entries and any orphaned location
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      Sinks.drop(spark, s"spark-warehouse/$t")
    }
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice")
    val l = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    Sinks.writeBucketed(o, "b_orders", "o_orderkey", 4)
    Sinks.writeBucketed(l, "b_lineitem", "l_orderkey", 4)
    val joined = spark.table("b_orders").join(
      spark.table("b_lineitem"),
      org.apache.spark.sql.functions.col("o_orderkey") ===
        org.apache.spark.sql.functions.col("l_orderkey"))
    joined.collect()
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n${p.take(500)}")
  }

  test("bucketed shingle store: jaccardBetween's history side joins without a shuffle") {
    // the admission-scale claim made in StreamingDedup's scaladoc, proven
    // on a plan: with the history store bucketed by shingle, the per-batch
    // batch×history comparison shuffles ONLY the (small) batch side — the
    // posting-cap window and the join both reuse the bucket distribution,
    // so history is never exchanged no matter how large it grows
    import graft.operators.Dedup
    import graft.sources.Sinks
    spark.sql("DROP TABLE IF EXISTS b_shingle_store")
    Sinks.drop(spark, "spark-warehouse/b_shingle_store")
    val docs = Tables.documents(spark, sfDir).limit(300)
    val c = org.apache.spark.sql.functions.col _
    val shNew = Dedup.shingleIndex(
      docs.filter(c("doc_id") % 7 === 0), "doc_id", "text", 3)
    val shOld = Dedup.shingleIndex(
      docs.filter(c("doc_id") % 7 =!= 0), "doc_id", "text", 3)
    Sinks.writeBucketed(shOld, "b_shingle_store", "shingle", 4)
    def shingleExchanges(shOldSide: org.apache.spark.sql.DataFrame): Int = {
      val q = Dedup.jaccardBetween(shNew, shOldSide, 0.6, maxPostings = 50)
      q.collect()
      "Exchange hashpartitioning\\(shingle".r
        .findAllIn(q.queryExecution.executedPlan.toString).length
    }
    // model the at-scale shape: a batch too large to broadcast (AQE would
    // otherwise broadcast this fixture-sized batch and hide the store-side
    // exchange the claim is about)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plainEx = shingleExchanges(shOld)
      val bucketedEx = shingleExchanges(spark.table("b_shingle_store"))
      assert(plainEx >= 2, s"plain form should shuffle both sides, saw $plainEx")
      // measured: 4 plain vs 2 bucketed — the bucket distribution feeds
      // BOTH store-side shingle stages (posting-cap window, join leg)
      // exchange-free; the remaining exchanges belong to the batch side
      assert(bucketedEx <= plainEx - 2,
        s"bucketed history must drop the store-side exchanges: $bucketedEx vs $plainEx")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("q65: the benchmark n-gram set is broadcast (corpus side never shuffles for the join)") {
    val p = plan("q65_contamination")
    assert(p.contains("BroadcastHashJoin"), "contamination join not broadcast")
    assert(!p.contains("SortMergeJoin"), "contamination degraded to SMJ")
  }

  test("q39: declared-values pivot plans a single scan of events (no distinct-discovery pass)") {
    val f = formatted("q39_pivot")
    // count numbered operator DETAILS ("(n) Scan parquet"), not the tree
    // rendering — FormattedMode prints each operator in both sections
    val scans = f.linesIterator.count(_.matches("""\(\d+\) Scan parquet\s*"""))
    assert(scans == 1, s"pivot scanned events $scans times")
  }

  test("q79: as-of join is one shuffle + one Window (no range-join explosion)") {
    val p = plan("q79_asof_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "as-of degraded to a quadratic join")
    assert(p.contains("Window"), "as-of lost its window formulation")
  }

  test("q54: document frequency is a join, not a term-partitioned window (skew)") {
    // a COUNT() OVER (PARTITION BY term) funnels every row of a hot term
    // through ONE WindowExec task; AQE can split a skewed join but not a
    // window partition — the plan must carry no Window at all
    val p = plan("q54_tfidf")
    assert(!p.contains("Window"), "tfidf df reverted to a term-partitioned window")
  }

  test("q78: tf-idf weights materialize once — consumers read the checkpoint") {
    val p = plan("q78_tfidf_cosine")
    // all three weight consumers (postings, norm_a, norm_b) must read the
    // checkpointed weights, not re-derive them: no source scan survives in
    // the final plan, and the only Generate left is the posting-list pair
    // expansion itself (tokenize's Generate ran before the checkpoint)
    assert(!p.contains("parquet"), "tf-idf lineage re-executing from the source scan")
    assert(p.contains("ExistingRDD"), "expected checkpointed weight scan")
    assert("Generate".r.findAllMatchIn(p).size == 1, "extra Generate: tokenize re-executing")
  }

  test("q91: LSH-blocked pair stage is an equi-join on the bucket, never a cartesian") {
    val p = plan("q91_embed_neardup_lsh")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "embedding near-dup degraded to an all-pairs comparison")
  }

  test("q92: LM estimation + scoring read one checkpointed count relation (no window)") {
    val p = plan("q92_lm_surprisal")
    assert(!p.contains("Window"), "unigram df reverted to a token-partitioned window")
    assert(!p.contains("parquet"), "token counts re-derived from the source scan")
    assert(p.contains("ExistingRDD"), "expected checkpointed count scan")
  }

  test("chunkTokens is pure map-side: no exchange, no window, no generator-inferred re-tokenize") {
    val df = graft.operators.Corpus.chunkTokens(
      Tables.documents(spark, sfDir), "doc_id", "text", window = 50, stride = 40)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), "chunking must not shuffle")
    assert(!p.contains("Window"), "chunking must not use window functions")
    // one Generate whose input is the cheap sequence(), not the token array
    // pipeline duplicated by InferFiltersFromGenerate
    assert(p.linesIterator.count(_.contains("Generate")) == 1, "expected exactly one Generate")
  }

  test("shardShuffle is one hash exchange + per-shard sort, never a global sort") {
    // the operator's own plan (q99 adds an 8-row presentation orderBy on top)
    val df = graft.operators.Corpus.shardShuffle(
      Tables.documents(spark, sfDir), "doc_id", nShards = 8)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("rangepartitioning"),
      "a range exchange means a global sort snuck in — the permutation must " +
        "be hash-sharded")
    assert(p.linesIterator.count(_.contains("Exchange")) == 1,
      "exactly one shard-keyed hash exchange feeds the per-shard sort")
    assert(p.contains("Exchange hashpartitioning(shard"))
  }

  test("q97: semantic dedup's pair stage joins on the centroid cell, never a cartesian") {
    val p = plan("q97_semantic_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "within-cell pairing must stay an equi-join on centroid_id")
    // assignment is snapshotted: consumers read the checkpoint, the scan +
    // 16-kernel argmax never re-executes per branch
    assert(!p.contains("Scan parquet"),
      "pair stage and flag join must read the snapshot, not re-scan")
  }

  test("runtime bloom filter injects on a selective shuffle join (100 TB pruning posture)") {
    // at cluster scale a selective dim-side predicate should prune the fact
    // scan at RUNTIME via an injected bloom filter (InjectRuntimeFilter);
    // the thresholds only exist to make test-sized tables eligible — the
    // assertion is that the optimizer path works on our join shapes
    import org.apache.spark.sql.functions._
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set(keys(0), "0")
    spark.conf.set(keys(1), "100MB")
    spark.conf.set(keys(2), "-1")
    try {
      val fact = Tables.lineitem(spark, sfDir)
      val dim = Tables.orders(spark, sfDir).filter(col("o_orderpriority") === "1-URGENT")
      val j = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(sum("l_quantity"))
      val opt = j.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain") && opt.contains("bloom_filter_agg"),
        s"runtime bloom filter not injected:\n${opt.take(600)}")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("q105/q106: admission comparisons join on the blocking key, never cartesian") {
    // q105: the posting-cap window partitions on the SHINGLE — the same
    // key the inverted-index join shuffles on, so the window's exchange
    // is reused by the join, and slice filters reach both scans
    val p105 = plan("q105_jaccard_between")
    assert(!p105.contains("CartesianProduct"))
    assert(p105.contains("hashpartitioning(shingle"),
      "posting-cap window must shuffle on the join key (exchange reuse)")
    assert("\\(doc_id#\\d+L % 7\\)".r.findFirstIn(p105).isDefined,
      "slice predicate must reach the scans")
    // q106: centroid argmax assignment is map-side (no exchange before the
    // cell join's own), history cap window partitions on centroid_id
    val p106 = plan("q106_semantic_between")
    assert(!p106.contains("CartesianProduct"))
    assert(p106.contains("hashpartitioning(centroid_id"),
      "centrality-cap window must shuffle on the cell key")
  }

  test("q109: PQ-ADC is one scan into TakeOrderedAndProject — codebook stays a literal") {
    val p = plan("q109_pq_adc")
    assert(p.contains("TakeOrderedAndProject"), "top-k must not be a global sort")
    assert(!p.contains("CartesianProduct"))
    // the codebook and ADC lookup table are broadcast literals folded into
    // the projection: joining them in (an Exchange before the top-k) would
    // shuffle the whole corpus at 100 TB
    assert(!p.contains("Exchange hashpartitioning"),
      "PQ scoring must be map-side only (no shuffle before the top-k merge)")
  }

  test("q110: mixing weights broadcast the scalar normalizers (no corpus shuffle)") {
    val p = plan("q110_mixture_weights")
    assert(p.contains("BroadcastExchange"), "scalar aggregates must broadcast")
    assert(p.contains("partial_sum"), "per-source rollup must be two-phase")
  }

  test("q111: audit is one full-outer pass per side, slice pushed to the scan") {
    val p = plan("q111_lsh_recall_audit")
    assert(p.contains("FullOuter"), "audit must be a single full-outer join")
    assert(!p.contains("CartesianProduct"))
    assert("partial_sum".r.findAllIn(p).size >= 1, "flag counts must aggregate partially")
    // both sides read the ONE snapshotted shingle index (lineage truncated
    // at the checkpoint — the slice filter ran before it, once)
    assert(p.contains("Scan ExistingRDD"),
      "pair sets must derive from the shared checkpointed shingle index")
  }

  test("q114: MMR shortlist is a partial TopKAgg; candidate fetch broadcasts the ids") {
    val p = plan("q114_mmr_rerank")
    // top-C per anchor must partial-aggregate map-side (k rows per anchor
    // per partition on the wire), never a per-anchor window over the corpus
    assert(p.contains("ObjectHashAggregate"), "shortlist must be TopKAgg")
    assert(p.contains("partial_graft_topk") || p.contains("partial_topkagg"),
      s"shortlist must have a map-side partial phase")
    assert(!p.contains("Window"), "per-anchor window funnel would melt at 100 TB")
    // the ≤|anchors|·C shortlist rows broadcast back at the vector table —
    // only C vectors per anchor leave the scan
    assert(p.contains("BroadcastHashJoin"), "candidate fetch must broadcast the id list")
    assert(!p.contains("SortMergeJoin"), "vector fetch degraded to a corpus shuffle")
  }

  test("q116: DSIR bucket model broadcasts; doc-bucket counts materialize once") {
    val p = plan("q116_dsir_weights")
    assert(p.contains("BroadcastExchange"), "bucket model + totals must broadcast")
    assert(!p.contains("Window"), "no window funnel in the scoring path")
    assert(p.contains("Scan ExistingRDD"),
      "(doc,bucket) counts must be snapshotted — they feed model AND scoring")
    assert(!p.contains("CartesianProduct"))
  }

  test("q102: the vocab rank window sits DIRECTLY on the 50-row TakeOrdered cut") {
    val p = plan("q102_vocab")
    // the only partition-less window in this plan is bounded by the
    // distributed top-k that feeds it (the PLANS.md global-window
    // contract): Window's child must be TakeOrderedAndProject(limit=50),
    // never the vocab-sized count relation
    val idx = p.indexOf("Window ")
    assert(idx >= 0, "expected the rank window")
    val child = p.substring(idx).linesIterator.drop(1)
      .find(l => l.trim.startsWith("+-")).getOrElse("")
    assert(child.contains("TakeOrderedAndProject(limit=50"),
      s"rank window must consume the 50-row cut, got: $child")
  }

  test("q117: bigram CE tokenizes once (snapshot feeds both explodes), no windows") {
    val p = plan("q117_bigram_ce")
    assert(!p.contains("Window"), "per-doc aggregation must be a groupBy, not a window")
    assert(p.contains("Scan ExistingRDD"),
      "token arrays must be snapshotted — unigram and bigram explodes share one tokenize")
    assert(!p.contains("CartesianProduct"))
    // exactly one parquet scan of documents: both model explodes and the
    // scoring join must read the materialized token arrays, not re-scan
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 0, s"documents re-scanned $scans times past the snapshot")
  }

  test("q123: containment verifies off one materialized shingle index, no cartesian") {
    val p = plan("q123_containment")
    assert(p.contains("Scan ExistingRDD"),
      "shingle index must be snapshotted — it feeds prefix ranking, probe, and verify")
    // past the snapshot nothing re-reads parquet: candidates and verify
    // both consume the materialized index
    assert(!"Scan parquet".r.findAllIn(p).hasNext,
      "documents re-scanned past the shingle-index snapshot")
    assert(!p.contains("CartesianProduct"))
    // the only window is prefixIndex's per-document rank — partitioned,
    // never a global single-partition funnel
    assert(!p.contains("Window [") || p.contains("windowspecdefinition(__id"),
      "window must be per-document (prefix rank), not global")
  }

  test("q124: vocab growth broadcasts the id bounds; gram relation materializes once") {
    val p = plan("q124_vocab_growth")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "id bounds must ride a broadcast, not shuffle the corpus")
    assert(p.contains("Scan ExistingRDD"),
      "gram relation must be snapshotted — occurrence and first-seen rollups share it")
    assert(!p.contains("CartesianProduct"))
  }

  test("q125: silhouette scoring is map-side — no join, no window, one scan") {
    val p = plan("q125_silhouette")
    // centroids are a broadcast literal folded into the projection: the
    // scoring pass must not join or window anything
    assert(!p.contains("Join"), "centroid scoring must not become a join")
    assert(!p.contains("Window"), "no window in the scoring path")
    assert("Scan parquet".r.findAllIn(p).size == 1,
      "embeddings must be scanned exactly once")
  }

  test("q130: guarded containment drops read one snapshotted shingle index, never a cartesian") {
    val p = plan("q130_contain_drops")
    assert(p.contains("Scan ExistingRDD"),
      "shingle index must be snapshotted — estimate, split, and verify all read it")
    assert(!"Scan parquet".r.findAllIn(p).hasNext,
      "documents re-scanned past the shingle-index snapshot")
    assert(!p.contains("CartesianProduct"))
    // hot and cold paths are shingle-keyed joins/aggregations; the only
    // windows are per-document (prefix rank) — never a global funnel
    assert(!p.contains("Window [") || p.contains("windowspecdefinition(__id"),
      "window must be per-document (prefix rank), not global")
  }

  test("q131: span removal is gram-keyed + doc-keyed — windows per-doc, no cartesian") {
    val p = plan("q131_span_removal")
    assert(p.contains("Scan ExistingRDD"),
      "positional windows must be snapshotted — dup-gram set and flag join share them")
    assert(!p.contains("CartesianProduct"))
    // the run detection is a per-document gaps-and-islands window; a
    // gram-partitioned or global window would melt on a hot gram at 100 TB
    assert(!p.contains("windowspecdefinition(gram"),
      "no window may partition by the (hot) gram key")
  }

  test("q132: containment admission joins on the shingle, posting cap windows per-shingle") {
    val p = plan("q132_contain_between")
    assert(!p.contains("CartesianProduct"))
    // the batch×history meeting is an equi-join keyed by the shingle
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), "cross-slice meeting must be an equi-join")
    // the posting cap's row_number partitions by shingle — bounded postings
    // per partition, never a global ordering
    assert(p.contains("windowspecdefinition(shingle"),
      "posting cap must window per shingle")
  }

  test("q133: self-repeat windows are (doc,gram)-local — never gram-global, no cartesian") {
    val p = plan("q133_self_repeat")
    assert(!p.contains("CartesianProduct"))
    // the min-pos window partitions by (doc, gram): partition size =
    // within-doc occurrences. A gram-only partition would funnel the
    // corpus-wide hot gram through one task at 100 TB.
    assert(p.contains("windowspecdefinition(doc_id"),
      "min-pos window must be doc-local")
    assert(!p.contains("windowspecdefinition(gram"),
      "no window may partition by the gram alone")
  }

  test("q134: containment apply reads one snapshotted index; survivor census is two-phase") {
    val p = plan("q134_contain_apply")
    assert(p.contains("Scan ExistingRDD"),
      "shingle index must be snapshotted — prefix, probe, and verify share it")
    assert(p.contains("LeftAnti"), "drop application must be an anti-join")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "per-source census must partial-aggregate map-side")
  }

  test("q126: merge curve is driver-local — every training round ran vocab-sized, none leak into the result plan") {
    val df = SparkEntry.queries("q126_bpe_merges")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    // the curve has ≤ merges rows built during bpeLearn's bounded rounds:
    // each round re-windows the SNAPSHOTTED vocab-sized symbol table and
    // collects exactly one top-pair row. If any round's corpus work leaked
    // into this plan (a parquet scan, a window), the bound is broken.
    assert(p.contains("LocalTableScan"), "curve must be a driver-local relation")
    assert(!p.contains("Scan parquet"), "corpus must not be re-scanned by the curve")
    assert(!p.contains("Window"), "merge rounds must be fully materialized, not deferred")
  }

  test("q129: BPE encode touches the corpus once past the snapshot; top-N is TakeOrdered") {
    val p = plan("q129_bpe_encode")
    // the learn-side tokenize is behind bpeLearn's snapshot (ExistingRDD);
    // THIS plan may tokenize the corpus exactly once for per-doc counts
    assert("Scan parquet".r.findAllIn(p).size == 1,
      "encode must re-read the corpus exactly once (per-doc word counts)")
    assert(p.contains("Scan ExistingRDD"),
      "per-word token counts must come from the snapshotted symbol table")
    assert(p.contains("TakeOrderedAndProject"), "top-N must not be a global sort")
    assert(!p.contains("CartesianProduct"))
  }

  test("q127: RQ scoring is one pass — LUT stays a driver literal, top-k is TakeOrdered") {
    val p = plan("q127_rq_topk")
    assert(p.contains("TakeOrderedAndProject"), "top-k must not be a global sort")
    assert(!p.contains("CartesianProduct"))
    // the coarse×residual LUT folds into the projection as a literal: any
    // Exchange before the top-k merge means the corpus shuffled to score
    assert(!p.contains("Exchange hashpartitioning"),
      "RQ ADC must be map-side lookup only (no shuffle before the top-k merge)")
  }

  test("q128: the UniMax waterfilling window ran once (snapshotted); scalars broadcast") {
    val p = plan("q128_unimax")
    // the closed-form redistribution = ONE cumulative window over the
    // per-source rollup, materialized in the snapshot — the output plan
    // reads it and attaches the k/Σ scalars via broadcast
    assert(p.contains("Scan ExistingRDD"),
      "ranked rollup must be snapshotted (it feeds the scalars AND the output)")
    assert(!p.contains("Scan parquet"),
      "corpus rollup must be behind the snapshot, not re-scanned")
    assert(!p.contains("Window"),
      "the cumulative window must not re-run in the output plan")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "waterline scalars must ride a broadcast")
  }

  test("q141: PageRank iterations run on snapshots — no parquet rescans, no window") {
    val p = plan("q141_pagerank")
    // the corpus-sized edge pipeline and the per-iteration rank tables are
    // all behind eager snapshots: the OUTPUT plan reads ExistingRDDs plus
    // the broadcast nation join only
    assert(p.contains("Scan ExistingRDD"), "iteration inputs must be snapshotted")
    assert(!p.contains("Scan parquet lineitem") && !p.contains("Scan parquet orders"),
      "edge pipeline must not re-run in the output plan")
    assert(!p.contains("Window"), "PageRank has no window — aggregates only")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      "dangling scalar + nation dimension must ride broadcasts")
  }

  test("q142: decay weights are one hash aggregate — no window, no join shuffle") {
    val p = plan("q142_time_decay")
    assert(!p.contains("Window"), "decay against a fixed anchor needs no window")
    assert(!p.contains("SortMergeJoin"), "anchor scalar must broadcast, never SMJ")
    assert(p.contains("HashAggregate"), "per-user rollup should be a hash aggregate")
  }

  test("q143/q146: retrieval and sampling top-k cuts are TakeOrdered, never a global sort") {
    assert(plan("q143_conjunctive_search").contains("TakeOrderedAndProject"))
    val p146 = plan("q146_priority_sample")
    assert(p146.contains("TakeOrderedAndProject"))
    assert(!p146.contains("Exchange rangepartitioning"),
      "priority sampling must not range-shuffle the corpus")
  }

  test("q145: outlier gate is two hash aggregates + a broadcast — no window, no SMJ") {
    val p = plan("q145_zscore_outliers")
    assert(!p.contains("Window"))
    assert(!p.contains("SortMergeJoin"), "moment table must broadcast back")
    assert(p.contains("BroadcastExchange"))
  }

  test("q147: spike baseline is the bounded expansion — no window, daily rollup snapshotted") {
    val p = plan("q147_spike_detection")
    assert(!p.contains("Window"), "trailing baseline must use the x7 expansion, not a window")
    assert(p.contains("Scan ExistingRDD"), "daily rollup feeds obs+baseline via a snapshot")
    assert(!p.contains("Scan parquet"), "events must not re-scan past the snapshot")
  }

  test("q148: keyword ranking windows the aggregated relation, not the corpus") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val lp = SparkEntry.queries("q148_keywords")(spark, sfDir).queryExecution.optimizedPlan
    val w = lp.collectFirst { case n: LWindow => n }
    assert(w.nonEmpty, "expected the per-source ranking window")
    // the window's child must already be the (source, term) aggregate —
    // vocab-sized input, never raw tf rows
    assert(w.get.child.collectFirst {
      case a: Aggregate if a.groupingExpressions.size == 2 => a
    }.nonEmpty, "ranking window must sit on the (source, term) aggregate")
  }

  test("q152: sessionize + path leads coalesce into windows over ONE user-key exchange") {
    val df = SparkEntry.queries("q152_session_paths")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // lag + running sum + 4 leads all share PARTITION BY user ORDER BY
    // (ts, event_id): one hash exchange on the user key feeds every window
    // (the final top-10 adds its own single-partition exchange only)
    val userExchanges = "Exchange hashpartitioning\\(user_id".r.findAllIn(p).size
    assert(userExchanges == 1, s"expected one user-key exchange:\n$p")
  }

  test("q156: SCD2 change-point filter and interval-closing lead share one user-key exchange") {
    val df = SparkEntry.queries("q156_scd2")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // lag/row_number (change points) and the post-filter lead (valid_to)
    // both window over (user_id, (ts, event_id)): the filter preserves the
    // partitioning, so ONE hash exchange on user_id serves both; the only
    // other exchange keys the event_type summary aggregate
    val userExchanges = "Exchange hashpartitioning\\(user_id".r.findAllIn(p).size
    assert(userExchanges == 1, s"expected one user-key exchange:\n$p")
  }

  test("q160: all SNM leads share one block-key exchange and one sort") {
    val df = SparkEntry.queries("q160_sorted_neighborhood")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val blockExchanges = "Exchange hashpartitioning\\(__blk".r.findAllIn(p).size
    assert(blockExchanges == 1, s"expected one block-key exchange:\n$p")
    val windows = "Window \\[".r.findAllIn(p).size
    assert(windows == 1, s"all 6 leads must coalesce into ONE Window operator, saw $windows:\n$p")
  }

  test("q166: events scanned once (obs snapshotted for its two consumers); one LOCF window") {
    val p = plan("q166_gapfill_locf")
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans == 0,
      s"grid bounds + grid join must read the obs SNAPSHOT, saw $scans parquet rescans")
    val windows = "Window \\[".r.findAllIn(p).size
    assert(windows == 1, s"LOCF must be one window pass, saw $windows")
  }

  test("q169: both stacked CUSUM window passes ride ONE key exchange and one sort") {
    val df = SparkEntry.queries("q169_cusum")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val keyExchanges = "Exchange hashpartitioning\\(key".r.findAllIn(p).size
    assert(keyExchanges == 1, s"expected one key exchange:\n$p")
    val sorts = "Sort \\[key".r.findAllIn(p).size
    assert(sorts <= 2, s"window passes must share the (key, ts, id) sort, saw $sorts")
  }

  test("q171: the closeness aggregate runs on BFS snapshots — no parquet rescans") {
    // allPairsHops snapshots each level during construction (q141
    // convention); the final plan must read only snapshots
    val p = plan("q171_closeness")
    assert(!p.contains("FileScan parquet [l_"),
      "final plan rescans lineitem — levels not snapshotted")
  }

  test("q204: the HITS output joins score snapshots — no trade-graph rescans, maxes broadcast") {
    val p = plan("q204_hits")
    assert(!p.contains("FileScan parquet [l_"),
      "final plan rescans lineitem — score layers not snapshotted")
    assert(!p.contains("CartesianProduct"))
  }

  test("q200: the harmonic aggregate runs on BFS snapshots — no parquet rescans") {
    val p = plan("q200_harmonic")
    assert(!p.contains("FileScan parquet [l_"),
      "final plan rescans lineitem — levels not snapshotted")
    assert(!p.contains("CartesianProduct"))
  }

  test("q170: greedy rounds ran eagerly — the final plan is the collected picks, no rescans") {
    val p = plan("q170_max_coverage")
    assert(!p.contains("FileScan parquet"),
      "selection rounds must run on the token-relation snapshot, not rescans")
    // r19 shape: the per-round argmax rows are collected driver literals
    // (bpeLearn's top-pair convention), so the final plan is ONE local
    // relation — no per-round 1-row snapshots, no unions, no joins
    assert(p.contains("LocalTableScan"),
      s"final plan should be the collected per-round picks:\n${p.take(400)}")
    assert(!p.contains("Join"), s"no join may survive into the final plan:\n${p.take(400)}")
  }

  test("q176: golden-record consolidation broadcasts cluster labels; no cartesian anywhere") {
    val p = plan("q176_golden_record")
    assert(!p.contains("CartesianProduct"), "pair stage degraded to a cartesian")
    assert(p.contains("BroadcastHashJoin"),
      s"under-threshold cluster labels must broadcast onto customer:\n${p.take(400)}")
  }

  test("q176: over-threshold labels take a plain equi-join, never a forced broadcast") {
    // force the size gate shut AND disable auto-broadcast so the shape the
    // gate chooses at 100× (labels too big for the driver) is the one
    // planned here: a shuffle join on the label key, no driver collect
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = graft.queries.DedupQueries.goldenRecord(spark, sfDir,
        maxBroadcastLabelRows = 0L)
      val p = { df.collect(); df.queryExecution.executedPlan.toString }
      assert(!p.contains("CartesianProduct"))
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"over-threshold label join must shuffle, not broadcast:\n${p.take(600)}")
      // both gate arms must be result-identical
      val gatedRows = df.collect().map(_.toSeq).toSeq
      val broadcastRows = graft.queries.DedupQueries.goldenRecord(spark, sfDir)
        .collect().map(_.toSeq).toSeq
      assert(gatedRows == broadcastRows, "gate arms diverged")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q177: exactly one window pass computes the deciles; the scan reads only 3 columns") {
    val p = plan("q177_ntile_equidepth")
    assert("Window\\b".r.findAllIn(p).size == 1,
      s"ntile must be ONE window pass, not stacked windows:\n${p.take(600)}")
    assert(!p.contains("CartesianProduct"))
    val f = formatted("q177_ntile_equidepth")
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(f).map(_.group(1)).getOrElse("")
    assert(read.split(",").length == 3 && read.contains("o_totalprice"),
      s"scan must prune to (priority, price, key): $read")
  }

  test("q178: all sketch algebra runs on snapshots — the final plan never rescans the corpus") {
    val p = plan("q178_sketch_overlap")
    assert(!p.contains("FileScan parquet"),
      s"overlap audit must read the token/sketch snapshots, not documents:\n${p.take(600)}")
    assert(!p.contains("CartesianProduct"), "the sources² sketch join must stay an equi/theta join")
  }

  test("q179: guarded basket rules read snapshots only — no corpus rescan, no cartesian") {
    val p = plan("q179_basket_guarded")
    assert(!p.contains("FileScan parquet"),
      s"pair/support stages must read the projection snapshots:\n${p.take(600)}")
    assert(!p.contains("CartesianProduct"))
  }

  test("q196: every dbscan stage reads the bucketed/pair snapshots — no embeddings rescan") {
    val p = plan("q196_dbscan")
    assert(!p.contains("FileScan parquet"),
      s"degree/CC/border/noise stages must read snapshots, not embeddings:\n${p.take(600)}")
    assert(!p.contains("CartesianProduct"), "the ε-pair join degraded to a cartesian")
  }

  test("q197: both overlap-join sides read the winnowed snapshot, never re-tokenize") {
    val p = plan("q197_winnow_overlap")
    assert(!p.contains("FileScan parquet"),
      s"pair stage must read the selected-fingerprint snapshot:\n${p.take(600)}")
    assert(!p.contains("CartesianProduct"), "the fingerprint join degraded to a cartesian")
  }

  test("q180/q183: perceptual band joins run on the hash snapshot, never re-decode") {
    for (q <- Seq("q180_audio_neardup", "q183_video_neardup")) {
      val p = plan(q)
      assert(!p.contains("FileScan parquet"),
        s"$q: both band-join sides must read the decoded-hash snapshot:\n${p.take(600)}")
      assert(!p.contains("CartesianProduct"), s"$q: band join degraded to a cartesian")
    }
  }

  test("q181: HyperBall levels are snapshot-fed — the final plan never rescans lineitem") {
    val p = plan("q181_hll_closeness")
    assert(!p.contains("FileScan parquet [l_"),
      "final plan rescans lineitem — ball levels not snapshotted")
    assert(!p.contains("CartesianProduct"))
  }

  test("q208: the nDCG folds read the ranked snapshot; the relevant-count rides broadcast") {
    val p = plan("q208_ndcg_audit")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the corpus relevant-count scalar must broadcast")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("q182: both audit sides are top-k pushed (TakeOrderedAndProject), no cartesian") {
    val p = plan("q182_mrl_recall_audit")
    assert("TakeOrderedAndProject".r.findAllIn(p).size >= 2,
      s"exact and truncated sides must both push limit into the sort:\n${p.take(600)}")
    assert(!p.contains("CartesianProduct"))
  }

  test("q184: the divergence fold reads the joined-count snapshot, never re-tokenizes") {
    val p = plan("q184_token_drift")
    assert(!p.contains("FileScan parquet"),
      s"totals + JS fold must read the vocab snapshot:\n${p.take(600)}")
    assert(!p.contains("CartesianProduct"))
  }

  test("q185: embedding drift shuffles component sums, no cartesian") {
    val p = plan("q185_embedding_drift")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("Generate"), "posexplode must drive the component relation")
  }

  test("q187: manifest reads ONE physical column per table; aggregates stay partial") {
    // the public operator snapshots eagerly (conf scoping), which hides
    // the scan — inspect the lazy plan it materializes instead. The
    // legacy-decode conf is scoped save/restore (the session is shared
    // getOrCreate(): leaking it would poison every later suite in the
    // JVM with legacy nanos decoding — the session-pollution class
    // ProvenanceSpec guards against)
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      val lazyPlan = graft.operators.Provenance.manifestPlan(spark, sfDir,
        Seq(("orders", "o_orderkey"), ("lineitem", "l_orderkey"),
          ("events", "event_id")))
      val f = lazyPlan.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // _metadata is reader-generated: every ReadSchema must carry only the
      // key column plus the reader's own _tmp_metadata_row_index marker (a
      // second DATA column means the metadata projection started costing I/O)
      val schemas = f.linesIterator.filter(_.contains("ReadSchema:")).toSeq
      assert(schemas.nonEmpty)
      schemas.foreach { rs =>
        val cols = rs.dropWhile(_ != '<').stripPrefix("<").stripSuffix(">")
          .split(",").map(_.takeWhile(_ != ':').trim)
        val dataCols = cols.filterNot(_.startsWith("_tmp_metadata"))
        assert(dataCols.length <= 1, s"more than one DATA column read: $rs")
      }
      assert(lazyPlan.queryExecution.executedPlan.toString.contains("partial"),
        "per-file stats must combine map-side")
      // the public operator's result is the eager snapshot of that plan
      assert(plan("q187_ingest_manifest").contains("Scan ExistingRDD"))
    } finally {
      prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("q188: MaxSim is a map-only scan + TakeOrdered — no shuffle, no UDF") {
    val p = plan("q188_maxsim")
    assert(p.contains("TakeOrderedAndProject"), "top-k must push into TakeOrdered")
    assert(!p.contains("Exchange hashpartitioning"),
      s"MaxSim scoring must not shuffle vectors:\n${p.take(600)}")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"))
  }

  test("q189: EWMA is ONE key-shuffle; the fold is a projection, not a join") {
    val p = plan("q189_ewma")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"exactly one key shuffle expected:\n${p.take(800)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("q201: retriever cuts are TakeOrdered; fusion joins the 20-row snapshots only") {
    // the cuts run eagerly inside snapshots — pin the shape on the
    // retriever expression itself, then the final fused plan
    import org.apache.spark.sql.functions._
    val cut = graft.operators.Corpus.bm25(
        spark.read.parquet(s"$sfDir/documents.parquet"),
        "doc_id", "text", Seq("hash", "customer", "stream"))
      .select(col("doc_id"), round(col("bm25"), 4).as("s"))
      .orderBy(col("s").desc, col("doc_id").asc).limit(20)
    assert(cut.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"),
      "the top-k cut must push the limit into the sort")
    val p = plan("q201_rrf_fusion")
    assert(!p.contains("FileScan parquet"),
      s"fusion must read the ranked snapshots, not documents:\n${p.take(600)}")
  }

  test("q205/q206: the audit algebra runs on count snapshots/aggregates — one corpus pass each") {
    for (q <- Seq("q205_benford", "q206_mutual_info")) {
      val p = plan(q)
      assert(!p.contains("FileScan parquet"),
        s"$q: digit/cell algebra must read the count snapshot, not the corpus:\n${p.take(600)}")
      assert("BroadcastExchange".r.findAllIn(p).size >= 1,
        s"$q: the total-count scalar must ride as a broadcast")
    }
  }

  test("q202: the CDF scan is __pid-partitioned windows + a broadcast offset — no global sort window") {
    val p = plan("q202_ks_drift")
    assert(p.contains("windowspecdefinition(__pid"),
      s"local prefix sums must partition by the range-partition id:\n${p.take(800)}")
    assert("BroadcastExchange".r.findAllIn(p).size >= 2,
      "partition offsets and totals must ride as broadcasts")
  }

  test("q212: pair construction is map-side zips — no window, no join before the count") {
    val p = plan("q212_skipgram_ppmi")
    assert(!p.contains("FileScan parquet"),
      s"marginals must read the pair-count snapshot, not documents:\n${p.take(600)}")
    assert(!p.contains("Window"), "the ±w pairs must come from zip slices, not a window")
  }

  test("q199: PMI scores vocab-sized models off the token snapshot — no corpus rescan") {
    val p = plan("q199_pmi_collocations")
    assert(!p.contains("FileScan parquet"),
      s"unigram/bigram models must read the token snapshot, not documents:\n${p.take(600)}")
    assert("BroadcastExchange".r.findAllIn(p).size >= 2,
      "the N and T scalars must ride as broadcasts")
  }

  test("q207: transitions ride ONE user-key exchange; the row-total join is broadcast") {
    val p = plan("q207_markov_transitions")
    assert(!p.contains("FileScan parquet"),
      s"normalization must read the transition snapshot, not events:\n${p.take(600)}")
    assert(p.contains("BroadcastHashJoin"), "row totals must broadcast")
    assert(!p.contains("SortMergeJoin"))
  }

  test("q203: the OLS window and aggregate share ONE key exchange; no join") {
    val p = plan("q203_linear_fit")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"recentring window + sum aggregate must reuse one exchange:\n${p.take(800)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("q198: Holt is ONE key-shuffle; the two-state fold is a projection, not a join") {
    val p = plan("q198_holt_trend")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"exactly one key shuffle expected:\n${p.take(800)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("q190: CMS estimate probes the counters by broadcast; no corpus rescan") {
    val p = plan("q190_cms_audit")
    assert(p.contains("BroadcastHashJoin"),
      s"1024-row counter relation must broadcast:\n${p.take(600)}")
    assert(!p.contains("FileScan parquet"),
      "both sketch build and probes must read the snapshotted token counts")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("q191: skyline sorts corpus data per shard; only the survivor band goes single-partition") {
    val p = plan("q191_skyline")
    assert(p.contains("hashpartitioning(__shard"),
      s"local pass must window within hash shards:\n${p.take(600)}")
    assert(p.contains("SinglePartition"),
      "global pass runs once over the survivor band")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "skyline must never plan a dominance join")
  }

  test("q221: wedge stage reads the edge snapshot; name joins broadcast; never cartesian") {
    val p = plan("q221_link_prediction")
    assert(p.contains("BroadcastHashJoin"), "nation name joins must broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("q222: lag pairing is a series join, not a window; corpus read once inside the snapshot") {
    val p = plan("q222_acf")
    assert(!p.contains("Window"), "calendar lags must pair by join, not lag windows")
    assert(!p.contains("FileScan parquet"),
      s"both join sides must read the snapshotted daily series:\n${p.take(600)}")
    assert(!p.contains("CartesianProduct"))
  }

  test("q223: contingencies read the doc snapshot; label totals broadcast; top-k is TakeOrdered") {
    val p = plan("q223_chi2_terms")
    assert(p.contains("TakeOrderedAndProject"), "top-25 must not global-sort")
    assert(!p.contains("FileScan parquet"),
      "presence relation and totals must read the snapshotted base")
    assert(p.contains("BroadcastExchange"), "the 1-row label totals must broadcast")
  }

  test("q224: rank iterations run on graph snapshots; the keyword cut is TakeOrdered") {
    val p = plan("q224_textrank")
    assert(!p.contains("FileScan parquet"),
      s"iterations must read the co-occurrence snapshot, not documents:\n${p.take(600)}")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q226: trend windows and span scalar ride the series snapshot — one corpus pass") {
    val p = plan("q226_seasonal")
    assert(!p.contains("FileScan parquet"),
      s"windows + span must read the snapshotted hourly series:\n${p.take(600)}")
    assert(p.contains("windowspecdefinition"), "the 2xm trend is a RANGE window")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the 1-row span bound must broadcast")
  }

  test("q227: the pair stage reads the stride-sample snapshot, never events") {
    val p = plan("q227_theil_sen")
    assert(!p.contains("FileScan parquet"),
      s"pairs + medians must read the sampled snapshot:\n${p.take(600)}")
    assert(!p.contains("CartesianProduct"))
  }

  test("q228: the k-th order statistic is TakeOrdered over the hash snapshot; scalars broadcast") {
    val p = plan("q228_kmv_distinct")
    assert(p.contains("TakeOrderedAndProject"), "k smallest hashes must not global-sort")
    assert("BroadcastExchange".r.findAllIn(p).size >= 2,
      "n_hashes and exact_distinct scalars must ride as broadcasts")
  }

  test("q229: mutual-reachability joins run on closure snapshots; nation broadcast") {
    val p = plan("q229_scc")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q230: inner products read sketch snapshots — no corpus rescan at estimate time") {
    val p = plan("q230_cms_join_size")
    assert(!p.contains("FileScan parquet"),
      s"sketch join + exact audit must read the count/sketch snapshots:\n${p.take(600)}")
    assert(!p.contains("CartesianProduct"))
  }

  test("q232: the vocab rank is __pid-partitioned prefix scan — no global vocab window") {
    val p = plan("q232_zipf")
    // rank = per-range-partition row_number + broadcast offset (the q202
    // convention): the only partition-less window runs over the
    // ≤ rangePartitions offset rows, never the vocabulary
    assert(p.contains("windowspecdefinition(__pid"),
      s"vocab rank must partition by the range-partition id:\n${p.take(800)}")
    assert("BroadcastExchange".r.findAllIn(p).size >= 1,
      "partition offsets must ride as a broadcast")
  }

  test("q258: every keyed-sketch window partitions by the group — no global window") {
    val p = plan("q258_group_quantile_sketch")
    // the per-group shape must hold: cumulative, total, and exact-
    // percentile windows all ride prio-partitioned specs (a million
    // groups would still distribute); no partition-less windowspec
    assert(p.contains("windowspecdefinition(prio"),
      s"windows must partition by prio:\n${p.take(800)}")
    val specs = "windowspecdefinition\\(".r.findAllIn(p).size
    // exactPercentiles' windows carry the group under its internal __k name
    val keyed = "windowspecdefinition\\((prio|__k)".r.findAllIn(p).size
    assert(specs == keyed, s"$specs window specs but only $keyed group-keyed:\n${p.take(1200)}")
  }

  test("q265/q266: every keyed-trailing window is key-partitioned — no global window") {
    // the keyed trailing faces must distribute per tenant: estimate
    // windows ride (event_type, obs_day) specs, partial cuts ride
    // (event_type, day), and the exact audit rides its internal __k /
    // obs-key — a partition-less spec anywhere means one task funnels
    // the fleet
    Seq("q265_keyed_trailing_quantiles", "q266_keyed_trailing_kmv").foreach { q =>
      val p = plan(q)
      val specs = "windowspecdefinition\\(".r.findAllIn(p).size
      assert(specs > 0, s"$q: expected window specs:\n${p.take(400)}")
      val keyed = "windowspecdefinition\\((event_type|__k)".r.findAllIn(p).size
      assert(specs == keyed,
        s"$q: $specs window specs but only $keyed key-partitioned:\n${p.take(1200)}")
    }
  }

  test("q239: token relation snapshot feeds vocab cut AND per-doc counts; stopword join broadcasts") {
    val p = plan("q239_calibration")
    assert(!p.contains("FileScan parquet"),
      s"both consumers must read the token snapshot:\n${p.take(600)}")
    assert(p.contains("BroadcastHashJoin"), "the 20-row stopword set must broadcast")
  }

  test("q240: percentile windows ride ONE group-key exchange over the distinct-value relation") {
    val p = plan("q240_exact_percentiles")
    // every window spec must be __k-partitioned: an unpartitioned
    // cumulative window would global-sort the value relation
    val specs = "windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(p).map(_.group(1)).toList
    assert(specs.nonEmpty && specs.forall(_.startsWith("__k")),
      s"non-group-keyed window spec:\n$specs")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("q241: the round-trip actually reads ORC") {
    val p = plan("q241_orc_roundtrip")
    assert(p.contains("FileScan orc"), s"must read the ORC copy:\n${p.take(400)}")
  }

  test("trailingKmv audit=false: the production plan reads NO base relation") {
    // the audit branch is the only part that rescans df (×W over the
    // full (day,key) relation); with audit=false everything downstream
    // of the eager per-day snapshot must run over partial-sized
    // ExistingRDDs — the posture a 100 TB composition ships
    val p = graft.operators.Kmv.trailingKmv(
      Tables.events(spark, sfDir), "user_id", "ts", k = 64, windowDays = 7,
      audit = false).queryExecution.executedPlan.toString
    assert(!p.contains("FileScan parquet"),
      s"audit=false must not rescan the base relation:\n${p.take(600)}")
  }

  test("trailingByDay: already partials-only — no base rescan past the day sketch") {
    // the QuantileSketch windowed face has no internal audit at all
    // (q261 joins the exact ×W audit on OUTSIDE the operator): the
    // operator's own plan past the eager per-day sketch touches only
    // bucket-count partials
    val ev = Tables.events(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("ts"),
        org.apache.spark.sql.functions.floor(
          org.apache.spark.sql.functions.col("value") * 100 +
            org.apache.spark.sql.functions.lit(0.5)).cast("long").as("v"))
    val p = graft.operators.QuantileSketch.trailingByDay(ev, "v", "ts",
      windowDays = 7).queryExecution.executedPlan.toString
    assert(!p.contains("FileScan parquet"),
      s"trailingByDay must not rescan the base relation:\n${p.take(600)}")
  }

  test("whole-stage codegen spans exist in the flagship pipeline (final AQE plan)") {
    val df = SparkEntry.queries("q30_annotations")(spark, sfDir)
    df.collect() // materialize THIS plan so AQE finalizes it (count() builds a new one)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"))
    // codegen stages print as "*(n) Operator" in the simple plan string
    assert("\\*\\(\\d+\\)".r.findFirstIn(p).isDefined, s"no codegen spans:\n${p.take(400)}")
  }
}
