package graft.queries

import org.apache.spark.sql.functions.{col, xxhash64}

import graft.{SparkEntry, SparkSpec}

/** Plan-regression tests: the scale-critical physical-plan properties
  * (pushdown, pruning, join strategy, no accidental cartesian products)
  * asserted from the formatted explain output, so a future refactor that
  * silently loses them fails here rather than in a 100 TB run.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf0001)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("q1_agg: shipdate filter reaches the parquet scan; columns pruned") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters") && p.contains("LessThan(l_shipdate"),
      "date filter must be pushed to the scan")
    assert(!p.contains("l_orderkey"), "unused columns must be pruned from the read")
  }

  test("q5_region_revenue: all dimension joins broadcast, no cartesian product") {
    val p = plan("q5_region_revenue")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 4, s"expected >=4 broadcast joins, got $broadcasts")
    assert(!p.contains("CartesianProduct"))
  }

  test("dedup_image_phash: banded candidates — chunk-keyed equi-join, no all-pairs") {
    val p = plan("dedup_image_phash")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "fingerprint pairing must come from the pigeonhole chunk join")
    assert(p.contains("SortMergeJoin") || p.contains("HashJoin"),
      "chunk-keyed candidate join must be an equi-join")
  }

  test("dedup_audio_fingerprint: banded candidates — chunk-keyed equi-join, no all-pairs") {
    val p = plan("dedup_audio_fingerprint")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("SortMergeJoin") || p.contains("HashJoin"))
  }

  test("dedup_video_frames: frame-keyed equi-join, no all-pairs") {
    val p = plan("dedup_video_frames")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("SortMergeJoin") || p.contains("HashJoin"))
  }

  test("dedup_ngram_jaccard: candidate join is keyed (no nested-loop all-pairs)") {
    val p = plan("dedup_ngram_jaccard")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      "shingle self-join must be an equi-join")
  }

  test("forecast_events: bounded shuffle count, grouped fit present") {
    val p = plan("forecast_events")
    assert(p.contains("MapGroups"), "per-series fit must be a grouped map")
    // tree lines read "Exchange (25)"; the details section repeats nodes
    // as "(25) Exchange" — count only the tree form
    val exchanges = """Exchange \(\d+\)""".r.findAllIn(p).length
    // bucketize(2: partial agg + countDistinct) + fit keying(1) +
    // pivot(2) + final sort(1) = 6; a regression that re-shuffles the
    // long frame or loses map-side partials pushes this up
    assert(exchanges <= 7, s"shuffle explosion: $exchanges exchanges\n$p")
  }

  test("dedup_ngram_jaccard: index persisted, df-cap is a broadcast anti-join, NO shingle window") {
    val p = plan("dedup_ngram_jaccard")
    assert(p.contains("InMemoryRelation"),
      "the capped inverted index must be persisted — without it the " +
        "tokenize/explode subtree recomputes on both sides of the self-join")
    assert(!p.contains("Window ("),
      "df cap must NOT be a count-over-window partitioned by shingle — " +
        "every occurrence of a stop-shingle lands in one task's window " +
        "buffer (hot-shingle straggler/spill at 100 TB)")
    assert(p.contains("LeftAnti"),
      "over-cap shingles must be removed by a broadcast left_anti probe " +
        "against the (tiny) hot set")
  }

  test("decontaminate: df-cap is a broadcast anti-join, NO shingle window") {
    val p = plan("decontaminate")
    assert(!p.contains("Window ("),
      "df cap must NOT be a count-over-window partitioned by shingle")
    assert(p.contains("LeftAnti"), "hot shingles must anti-join out")
    assert(p.contains("InMemoryRelation"), "exploded index must be persisted")
  }

  test("dedup_embedding_lsh: verify-in-join, distinct sees only surviving pairs") {
    val p = plan("dedup_embedding_lsh")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("InMemoryRelation"),
      "LSH buckets must be persisted across the self-join's renewed attribute ids")
    // the exact-cosine threshold must be applied INSIDE/below the bucket
    // self-join so candidate pairs that fail it are never shuffled — the
    // round-8 rewrite that took the x30 replica from 65 s to 12.5 s
    // (the old shape shuffled the full candidate set three times: pair
    // distinct + two vector re-joins)
    assert(p.contains(">= 0.45"),
      s"cosine threshold must filter the join output before any later shuffle\n$p")
    // the final distinct keys on (vec_a, vec_b, cos) alone — no embedding
    // column may survive into the post-verify exchange
    assert("""Keys \[3\]: \[vec_a#\d+L, vec_b#\d+L, """.r.findAllIn(p).nonEmpty,
      s"distinct must key on (vec_a, vec_b, cos) only\n$p")
    assert("""hashpartitioning\(vec_a#\d+L, vec_b#\d+L, cos#\d+,""".r.findAllIn(p).nonEmpty,
      s"the distinct exchange must carry exactly (vec_a, vec_b, cos)\n$p")
  }

  test("ann_topk_lsh: bucket join keyed, no cartesian, single re-rank window") {
    val p = plan("ann_topk_lsh")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), "candidate generation must be an equi-join")
  }

  test("ann_topk: query side broadcast, single window rank") {
    val p = plan("ann_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "small query side must broadcast")
    assert("Window".r.findAllIn(p).length >= 1)
  }

  test("funnel_steps: keyed equi-joins only, no cartesian, no nested loop") {
    val p = plan("funnel_steps")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "funnel stages must join on user_id, never cross")
  }

  test("merge_upsert: exactly one exchange (the key shuffle), single window") {
    val p = plan("merge_upsert")
    val exchanges = """Exchange \(\d+\)""".r.findAllIn(p).length
    // one hash shuffle on (user_id, event_type) + the output orderBy's
    // range exchange = 2; a join-based MERGE rewrite would add more
    assert(exchanges <= 2, s"upsert must be one keyed shuffle + sort, got $exchanges\n$p")
    assert("Window".r.findAllIn(p).nonEmpty)
  }

  test("pack_batches: one repartition exchange feeds the per-partition scan") {
    val p = plan("pack_batches")
    assert(!p.contains("CartesianProduct"))
    // hash repartition by id + agg partial/final + orderBy range = <= 4
    val exchanges = """Exchange \(\d+\)""".r.findAllIn(p).length
    assert(exchanges <= 4, s"packing pipeline grew extra shuffles: $exchanges\n$p")
  }

  test("fuzzy_match: blocking is an equi-join on both keys, never a nested loop") {
    val p = plan("fuzzy_match")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "candidate generation must equi-join on (bucket, prefix)")
  }

  test("sql_front_door: pushdown survives the temp-view indirection") {
    val p = plan("sql_front_door")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"),
      "the shipdate filter must reach the parquet scan through the view")
    assert(!p.contains("l_orderkey"), "unused columns must be pruned")
  }

  test("native bloom operator: the train probe is a pure scan — NO join anywhere") {
    // the native BloomFilterImpl packing (the production broadcast-bitset
    // demonstration, reached through decontaminate_bloom_gate's bounds)
    val df = graft.operators.Dedup.decontaminateBloom(
      CoreQueries.table(spark, sf0001, "documents"))
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("Join"),
      "the Bloom twin exists to decontaminate WITHOUT a join: the test-set " +
        "filter ships as a broadcast binary literal probed in the train scan")
    assert(p.contains("might_contain") || p.contains("BloomFilterMightContain"),
      s"probe must be the native bloom expression\n$p")
  }

  test("decontaminate_bloom (deterministic): position set broadcasts; train text never shuffles") {
    val p = plan("decontaminate_bloom")
    // the registered engine-independent form: the filter CONTENT (the
    // distinct position set) rides a broadcast LEFT SEMI join — the
    // train side exchanges only (doc_id, hash) pairs downstream of it
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"the position set must broadcast into a semi join\n$p")
    assert(!p.contains("CartesianProduct"))
    assert(!"hashpartitioning\\(text#".r.findFirstIn(p).isDefined &&
      !"hashpartitioning\\(shingle#".r.findFirstIn(p).isDefined,
      s"raw text/shingles must never key an exchange — only 8-byte hashes\n$p")
  }

  test("heavy_hitters_weighted: candidate semi-join broadcasts like the unweighted form") {
    val p = plan("heavy_hitters_weighted")
    assert(p.contains("BroadcastHashJoin"), "bounded candidates must broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("heavy_hitters: candidate semi-join broadcasts, full data stays map-side") {
    val p = plan("heavy_hitters")
    assert(p.contains("BroadcastHashJoin"),
      "the bounded candidate set must broadcast — a shuffled join would " +
        "re-shuffle the full token stream on the item key")
    assert(!p.contains("CartesianProduct"))
  }

  test("window_functions: a single sort-window pass over one key shuffle") {
    val p = plan("window_functions")
    val windows = "Window \\(".r.findAllIn(p).length
    assert(windows <= 1, s"all five analytics must share one Window operator\n$p")
    assert(p.contains("PushedFilters") && p.contains("LessThan(o_custkey"),
      "customer filter must reach the parquet scan")
  }

  test("text_top_bigrams: pair-building is an array transform — no Window, no doc_id shuffle") {
    val p = plan("text_top_bigrams")
    assert(!p.contains("Window ("),
      "bigrams must come from an in-row array transform, not a per-doc window")
    // only shuffles: the bigram partial->final agg; top-k is TakeOrdered
    val exchanges = """Exchange \(\d+\)""".r.findAllIn(p).length
    assert(exchanges <= 1, s"expected <=1 exchange, got $exchanges\n$p")
    assert(p.contains("TakeOrderedAndProject"), "top-k must not be a global sort")
    assert(!p.contains("doc_id"), "doc_id must be pruned — pairs never leave the row")
  }

  test("uniq_counts: both distincts fold into one Expand-based aggregate pass") {
    val p = plan("uniq_counts")
    assert(p.contains("Expand"),
      "multi-distinct must compile to one Expand aggregate, not per-distinct scans")
    // tree form only ("Scan parquet  (1)"); the details section repeats
    // each node as "(1) Scan parquet"
    val scans = """Scan parquet\s+\(\d+\)""".r.findAllIn(p).length
    assert(scans == 1, s"expected a single events scan, got $scans")
  }

  test("quality_deciles_approx: no global-order window; boundary row broadcast") {
    val p = plan("quality_deciles_approx")
    assert(!p.contains("Window ("), "the approx variant must not ntile-sort globally")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the 1-row boundary frame must broadcast, not shuffle")
  }

  test("cluster_kmeans_det: codebook broadcast, assignment is a map-side-combined argmin, no window") {
    val p = plan("cluster_kmeans_det")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the k-row codebook must broadcast against the corpus")
    assert(!p.contains("Window ("),
      "argmin must be min(struct(dist, cid)) — partial-aggregated before " +
        "the shuffle — not a row_number window over k rows per vector")
    assert(p.contains("partial_min") || p.contains("HashAggregate"),
      "assignment must partial-aggregate map-side")
  }

  test("decontaminate_bloom_gate: exact twin broadcasts the test-shingle set; split filters pushed") {
    val p = plan("decontaminate_bloom_gate")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      "the exact semi-join must broadcast the distinct test shingles")
    assert(!p.contains("CartesianProduct"))
  }

  test("sample_split_md5 aggregation: split label is a projection (no pre-agg shuffle)") {
    val p = plan("sample_split_md5")
    val exchanges = """Exchange \(\d+\)""".r.findAllIn(p).length
    // one partial->final agg on split + the orderBy's range exchange
    assert(exchanges <= 2, s"label assignment must not shuffle\n$p")
  }

  test("sliding_reach: dedup -> window explode -> one distinct count, no self-join") {
    val p = plan("sliding_reach")
    assert(!p.contains("Join"), "reach must come from the explode fan-out, not a day x events join")
    assert(p.contains("Generate") || p.contains("Explode"), "7-day fan-out must be an explode")
    assert(!p.contains("event_type"), "unused columns pruned from the read")
  }

  test("sequence_match: one user-keyed shuffle feeds the path aggregation") {
    val p = plan("sequence_match")
    val exchanges = """Exchange \(\d+\)""".r.findAllIn(p).length
    // user_id agg + matched agg + final sort
    assert(exchanges <= 3, s"expected <=3 exchanges, got $exchanges\n$p")
    assert(!p.contains("Window ("), "path ordering lives in array_sort, not a window")
  }

  test("time_decay_agg: one user-keyed shuffle feeds cumsum, lag, rank and the agg") {
    val p = plan("time_decay_agg")
    val exchanges = """Exchange \(\d+\)""".r.findAllIn(p).length
    // user_id hash shuffle (shared by all three window specs + the final
    // agg, which Catalyst recognizes as already-partitioned) + orderBy
    assert(exchanges <= 3, s"EMA must be one keyed pass, got $exchanges\n$p")
    val scans = """Scan parquet\s+\(\d+\)""".r.findAllIn(p).length
    assert(scans == 1, s"closed-form EMA needs a single events scan, got $scans")
  }

  test("lttb_downsample: bucket anchors broadcast, no cartesian, single corpus window pass") {
    val p = plan("lttb_downsample")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin"),
      "the tiny bucket-average frame must broadcast to the points")
    assert(p.contains("InMemoryRelation"),
      "the ranked points feed both the anchor agg and the scoring join — must persist")
  }

  test("funnel_strict_order: one lead-window pass, no joins at all") {
    val p = plan("funnel_strict_order")
    assert(!p.contains("Join"), "strict_order is adjacency in ONE ordered stream — no join")
    val windows = "Window \\(".r.findAllIn(p).length
    assert(windows <= 1, s"all four leads must share one Window operator\n$p")
  }

  test("funnel_strict_dedup: equi-joins on user_id only, never cross") {
    val p = plan("funnel_strict_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "every stage (candidates + interrupt anti-joins) must key on user_id")
  }

  test("q7_nation_volume: fact-fact shuffle join only; nation-reduced dims broadcast") {
    val p = plan("q7_nation_volume")
    assert(!p.contains("CartesianProduct"))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 3,
      s"supplier/customer (pre-joined with nation) must broadcast, got $broadcasts")
  }

  test("text_repetition: pure projection — no shuffle except the output sort") {
    val p = plan("text_repetition")
    assert(!p.contains("Join") && !p.contains("Window ("))
    val exchanges = """Exchange \(\d+\)""".r.findAllIn(p).length
    assert(exchanges <= 1, s"repetition ratios must be in-row, got $exchanges exchanges\n$p")
  }

  test("higher_moments: raw power sums in ONE aggregate pass (no centered re-scan)") {
    val p = plan("higher_moments")
    val scans = """Scan parquet\s+\(\d+\)""".r.findAllIn(p).length
    assert(scans == 1, s"expected a single lineitem scan, got $scans")
    val exchanges = """Exchange \(\d+\)""".r.findAllIn(p).length
    assert(exchanges <= 2, s"one partial->final agg + sort, got $exchanges\n$p")
  }

  test("embedding_centroid: explode stays narrow (vec_id pruned before posexplode)") {
    val p = plan("embedding_centroid")
    assert(!p.contains("vec_id"), "vec_id must be pruned from the read")
    val exchanges = """Exchange \(\d+\)""".r.findAllIn(p).length
    // (label, i) agg + label agg + final sort
    assert(exchanges <= 3, s"expected <=3 exchanges, got $exchanges\n$p")
  }

  test("text_perplexity: bigrams via window (no positional self-join); counts keyed on the bigram") {
    val p = plan("text_perplexity")
    val scans = """Scan parquet\s+\(\d+\)""".r.findAllIn(p).length
    assert(!p.contains("CartesianProduct"))
    // the only nested-loop join allowed is the 1-row vocab broadcast
    // (tree-form match only — the details section repeats each node)
    val bnlj = """BroadcastNestedLoopJoin \w+ \w+ \(\d+\)""".r.findAllIn(p).length
    assert(bnlj <= 1, s"only the vocab crossJoin may nest-loop, got $bnlj\n$p")
    assert(p.contains("Window ("), "bigram pairing must be a lead() window")
    assert(scans <= 6, s"token explode re-scans bounded, got $scans\n$p")
  }

  test("rollup_incremental: merge shuffles partial states on (d, type), never re-scans history twice") {
    val p = plan("rollup_incremental")
    assert(!p.contains("CartesianProduct"))
    val scans = """Scan parquet\s+\(\d+\)""".r.findAllIn(p).length
    // bootstrap + delta + the exact-users check = 3 reads of events
    assert(scans <= 3, s"expected <=3 events scans, got $scans\n$p")
  }

  test("merge_cdc: one keyed window pass, no tombstone join") {
    val p = plan("merge_cdc")
    assert(!p.contains("Join"), "delete handling must be a post-window filter")
    val exchanges = """Exchange \(\d+\)""".r.findAllIn(p).length
    // union of two scans -> one (user, type) exchange + output sort
    assert(exchanges <= 2, s"expected <=2 exchanges, got $exchanges\n$p")
  }

  test("dedup_keep_best: winner selection is a group limit on the norm exchange") {
    val p = plan("dedup_keep_best")
    assert(!p.contains("Join"))
    val exchanges = """Exchange \(\d+\)""".r.findAllIn(p).length
    // one norm-keyed exchange shared by the rank and count windows + sort
    assert(exchanges <= 2, s"expected <=2 exchanges, got $exchanges\n$p")
  }

  test("mode_per_group: map-side combinable count below the rank window") {
    val p = plan("mode_per_group")
    assert(p.contains("WindowGroupLimit"),
      "rk = 1 must plan as a group limit so the exchange after the count " +
        "carries at most |event types| rows per user")
    assert(!p.contains("Join"))
  }

  test("q8_market_share: dimension chains broadcast; only fact-fact joins shuffle") {
    val p = plan("q8_market_share")
    assert(!p.contains("CartesianProduct"))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 5,
      s"part/customer-region/supplier-nation chains must broadcast, got $broadcasts")
    assert(p.contains("PushedFilters") && p.contains("EqualTo(p_type,PROMO)"),
      "the part-type filter must reach the part scan")
  }

  test("quantile_weighted: cumulative and total weight share ONE flag-keyed window pass") {
    val p = plan("quantile_weighted")
    assert(!p.contains("Join"), "weighted quantile must not self-join")
    val sorts = """Sort \(\d+\)""".r.findAllIn(p).length
    assert(sorts <= 2, s"one window sort + output sort, got $sorts\n$p")
  }

  test("sample_stratified: rank filter pushes a partial per-stratum limit below the exchange") {
    val p = plan("sample_stratified")
    assert(p.contains("WindowGroupLimit"),
      "row_number <= k must plan as WindowGroupLimit so each task keeps " +
        "only its local top-k per stratum before the shuffle — without it " +
        "the exchange carries every row of the hottest stratum")
    val limits = """WindowGroupLimit \(\d+\)""".r.findAllIn(p).length
    assert(limits >= 2, s"expected partial AND final group limits, got $limits\n$p")
  }

  test("interval_length_sum: running max/sum windows and both aggs share ONE user exchange") {
    val p = plan("interval_length_sum")
    assert(!p.contains("Join"))
    val exchanges = """Exchange \(\d+\)""".r.findAllIn(p).length
    // user_id exchange (windows + (user, island) agg + user agg all
    // co-partition on it) + final sort
    assert(exchanges <= 2, s"island detection must reuse the user partitioning, got $exchanges\n$p")
  }

  test("sequence_next_node: lead and per-type row_number share the user sort; one agg shuffle") {
    val p = plan("sequence_next_node")
    assert(!p.contains("Join"))
    val exchanges = """Exchange \(\d+\)""".r.findAllIn(p).length
    // user exchange (both windows) + next_type agg + output sort
    assert(exchanges <= 3, s"expected <=3 exchanges, got $exchanges\n$p")
  }

  test("bounding_ratio: single one-pass aggregate (max_by/min_by are streaming aggs)") {
    val p = plan("bounding_ratio")
    val scans = """Scan parquet\s+\(\d+\)""".r.findAllIn(p).length
    assert(scans == 1, s"expected a single events scan, got $scans")
    val exchanges = """Exchange \(\d+\)""".r.findAllIn(p).length
    assert(exchanges <= 2, s"partial->final agg + sort, got $exchanges\n$p")
  }

  test("series_interpolate: prev/next anchor windows share one user exchange each side") {
    val p = plan("series_interpolate")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "spine join must stay an equi-join on (user_id, d)")
    // Catalyst may keep the anchor windows as separate stacked nodes, but
    // they must SHARE one (user_id | d) sort — a second Sort or an
    // Exchange between windows means the ordering was lost and re-derived
    val sorts = """Sort \(\d+\)""".r.findAllIn(p).length
    assert(sorts <= 2, s"window sort + output sort only, got $sorts\n$p")
    val exchanges = """Exchange \(\d+\)""".r.findAllIn(p).length
    // daily agg + spine agg (+ its broadcast) + output sort
    assert(exchanges <= 4, s"expected <=4 exchanges, got $exchanges\n$p")
  }

  test("doc_chunk: shuffle-free generation — only the output sort exchanges") {
    val p = plan("doc_chunk")
    assert(!p.contains("Window") && !p.contains("Join"),
      s"chunking must be a narrow pipeline\n$p")
    assert(p.contains("Generate"), "explode must stay a Generate, not a join")
    val exchanges = """Exchange \(\d+\)""".r.findAllIn(p).length
    assert(exchanges <= 1, s"only the deterministic output sort may exchange, got $exchanges\n$p")
    // only the two consumed source columns are read
    assert(!p.contains("lang") && !p.contains("source"),
      "unused document columns must be pruned from the scan")
  }

  test("linreg_simple: one map-side-combinable aggregate, no window pass") {
    val p = plan("linreg_simple")
    assert(!p.contains("Window"), s"moment fit must not need a window\n$p")
    assert(p.contains("partial_covar_pop") || p.contains("HashAggregate"),
      "moments must partial-aggregate map-side")
    val exchanges = """Exchange \(\d+\)""".r.findAllIn(p).length
    assert(exchanges <= 2, s"agg shuffle + output sort only, got $exchanges\n$p")
  }

  test("rank_corr/theils_u: global windows run on the aggregated frame, not raw events") {
    for (q <- Seq("rank_corr", "theils_u")) {
      val p = plan(q)
      // the heavy pass is the partial-aggregated group-by; every Window
      // node must sit ABOVE the aggregate in the plan (smaller id =
      // later operator in formatted explain numbering)
      val aggIdx = p.indexOf("HashAggregate")
      assert(aggIdx >= 0, s"$q: missing hash aggregate\n$p")
      assert(p.contains("Window"), s"$q: rank/marginal windows expected\n$p")
      // one scan in the tree (the details section repeats the node name)
      val scanCount = """[+:]- Scan parquet""".r.findAllIn(p).length
      assert(scanCount == 1, s"$q: events must be scanned once, got $scanCount\n$p")
      // the raw-events aggregate sits BELOW the first window: its tree
      // line is deeper in the operator listing than every Window line
      val tree = p.linesIterator.takeWhile(l => !l.contains("(1) Scan")).toSeq
      val aggLine = tree.lastIndexWhere(_.contains("HashAggregate"))
      val winLine = tree.indexWhere(_.contains("Window"))
      assert(aggLine > winLine && winLine >= 0,
        s"$q: windows must run above the aggregated frame\n$p")
    }
  }

  test("sample_weighted: distributed top-k, not a global sort") {
    val p = plan("sample_weighted")
    assert(p.contains("TakeOrderedAndProject"),
      "top-100 by key must be per-partition heaps + driver merge — a " +
        s"global Sort+Limit shuffles the whole corpus\n$p")
  }

  test("series_acf: lag alignment joins the tiny daily aggregate broadcast-side") {
    val p = plan("series_acf")
    assert(p.contains("BroadcastHashJoin"),
      s"daily-aggregate self-join must broadcast, not sort-merge\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("mad_per_group: per-group medians join back broadcast-side") {
    val p = plan("mad_per_group")
    assert(p.contains("BroadcastHashJoin"),
      s"the |groups|-row median frame must broadcast\n$p")
  }

  test("multi_linreg: pure aggregation — no window, no join, one shuffle") {
    val p = plan("multi_linreg")
    assert(!p.contains("Window"), s"Gram sums must not need a window\n$p")
    assert(!p.contains("Join"), s"single-scan aggregation only\n$p")
    val exchanges = """Exchange \(\d+\)""".r.findAllIn(p).length
    assert(exchanges <= 1,
      s"ten partial-agg'd doubles to a single partition, got $exchanges\n$p")
  }

  test("er_sorted_neighborhood: window is block-partitioned, candidates equi-join") {
    val p = plan("er_sorted_neighborhood")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("Window ("), s"rank window expected\n$p")
    assert("windowspecdefinition\\(block#".r.findFirstIn(p).nonEmpty,
      s"the SNM rank window must partition by the block key — an " +
        s"empty-partition global sort owns the whole corpus in one task\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"rank-adjacency candidates must come from an equi-join on block\n$p")
    // the x10 scaling run measured a 59x blowup when the join keyed on
    // block alone with the rank distance as a post-filter (|block|^2
    // pairs materialized); the fix explodes the 3 probe ranks so the
    // join key is (block, rn) and only w=3 candidates ever exist
    assert(p.contains("Generate"),
      s"probe ranks must be exploded into the join key\n$p")
    assert("Left keys \\[2\\]".r.findFirstIn(p).nonEmpty ||
      "\\[block#\\d+L?, rn#\\d+".r.findFirstIn(p).nonEmpty,
      s"candidate join must key on BOTH block and rank\n$p")
  }

  test("er_snm_multikey: both passes block-partitioned and (block, rn)-keyed, base persisted once") {
    val p = plan("er_snm_multikey")
    assert(!p.contains("CartesianProduct"))
    // two window passes (one per blocking key), each partitioned by its
    // block — a lost PARTITION BY would serialize the whole corpus
    val windows = "windowspecdefinition\\(block#".r.findAllIn(p).length
    assert(windows >= 2,
      s"expected both passes' rank windows partitioned by block, got $windows\n$p")
    // both candidate joins keyed on (block, rn) via exploded probe ranks
    assert("Generate".r.findAllIn(p).length >= 2,
      s"each pass must explode its probe ranks into the join key\n$p")
    assert(p.contains("InMemoryRelation"),
      s"the normalized key/probe projection must be persisted — without " +
        s"it the regex normalization re-runs once per pass side\n$p")
  }

  test("graph_pagerank: lineage truncated per round; no cartesian anywhere") {
    val p = plan("graph_pagerank")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"),
      s"the final rank vector must read from a localCheckpoint — " +
        s"without per-round truncation the plan is 5 joins deep\n$p")
  }

  test("graph_hits: rounds read checkpointed aggregates; normalizer is a broadcast scalar") {
    val p = plan("graph_hits")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"),
      s"each half-round's edge-join aggregate must be localCheckpointed " +
        s"BEFORE the L2 normalizer — otherwise the |E|-shuffle recomputes " +
        s"inside the broadcast norm subtree, doubling every round's cost\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the 1-row L2 norm must attach as a broadcast cross join\n$p")
    // final plan = union of two lazy normalizer selects over checkpoints;
    // a regression that re-plans an edge join here shows as a parquet scan
    assert(!p.contains("Scan parquet"),
      s"no raw edge scan may survive into the final round's plan\n$p")
  }

  test("dedup_containment: same skew-safe df-cap shape as the jaccard path") {
    val p = plan("dedup_containment")
    assert(p.contains("InMemoryRelation"), s"capped index must be persisted\n$p")
    assert(!p.contains("Window ("),
      s"df cap must stay a broadcast anti-join, not a shingle window\n$p")
    assert(p.contains("LeftAnti"), s"hot-shingle removal must be anti-join\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("zorder_key: the morton key is a pure projection — no agg, one sort exchange") {
    val p = plan("zorder_key")
    assert(!p.contains("HashAggregate"),
      s"key derivation must not aggregate (bounds are a separate tiny query)\n$p")
    assert(!p.contains("Join"), s"projection only\n$p")
    val exchanges = """Exchange \(\d+\)""".r.findAllIn(p).length
    assert(exchanges <= 1, s"only the output sort may exchange, got $exchanges\n$p")
  }

  test("semdedup: codebook broadcast; within-cell self-join is keyed, not all-pairs") {
    val p = plan("semdedup")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"centroid assignment scans corpus x broadcast codebook (the MLlib " +
        s"KMeans shape — the only unconditioned join here)\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"the candidate self-join must be an equi-join on the cell id\n$p")
  }

  test("kendall_tau: per-series Knight pass is a grouped map, one keyed exchange") {
    val p = plan("kendall_tau")
    assert(p.contains("MapGroups"),
      s"the O(n log n) tau pass must be a grouped map over series\n$p")
    val exchanges = """Exchange \(\d+\)""".r.findAllIn(p).length
    assert(exchanges <= 2, s"tau needs only the group keying + output sort, " +
      s"got $exchanges exchanges\n$p")
  }

  test("assoc_rules: item supports broadcast to scored pairs; pair join keyed on order") {
    val p = plan("assoc_rules")
    assert(!p.contains("CartesianProduct"))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 2,
      s"both item-support joins must broadcast the dimension side\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-30 by lift must be a distributed top-k, not a global sort\n$p")
  }

  test("naive_bayes_lang: class constants broadcast; token scoring join is keyed") {
    val p = plan("naive_bayes_lang")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"the (test token x class count) scoring join must be an equi-join on tok\n$p")
    val bnlj = """BroadcastNestedLoopJoin \(\d+\)""".r.findAllIn(p).length
    // the doc x class grid and the 1-row constants are the only
    // unconditioned joins, and every one must be broadcast
    assert(bnlj <= 3, s"grid/constant joins must broadcast, got $bnlj\n$p")
    assert(p.contains("InMemoryRelation"),
      "the tokenized train split feeds vocab + counts + normalizers — persist it")
  }

  test("delta_sum: one keyed window pass, no self-join") {
    val p = plan("delta_sum")
    val exchanges = """Exchange \(\d+\)""".r.findAllIn(p).length
    assert(exchanges <= 2,
      s"lag + agg share the event_type keying; got $exchanges exchanges\n$p")
    assert(!p.contains("Join"), s"deltas come from lag(), not a self-join\n$p")
  }

  test("array_functions: pure projection — no shuffle except the output sort") {
    val p = plan("array_functions")
    val exchanges = """Exchange \(\d+\)""".r.findAllIn(p).length
    assert(exchanges <= 1,
      s"the battery is per-row; only the ORDER BY may exchange, got $exchanges\n$p")
    assert(!p.contains("BatchEvalPython") && !p.contains("SQLAppUDF"),
      "higher-order functions must stay native expressions")
  }

  test("forecast_backtest: grouped-map fit on the melt key, no cartesian, bounded exchanges") {
    val p = plan("forecast_backtest")
    assert(p.contains("MapGroups"),
      "rolling-origin fits must fan out as a per-series grouped map")
    assert(!p.contains("CartesianProduct"))
    // bucketize (date key) + the fit's (table, metric) key + output sort
    val tree = """\n\s*\+?- Exchange \(\d+\)""".r.findAllIn(p).length
    assert(tree <= 4, s"backtest should reuse the melt's keying; got $tree exchanges\n$p")
  }

  test("forecast_events_hourly: sub-daily fit is a grouped map over the hourly bucket agg") {
    val p = plan("forecast_events_hourly")
    assert(p.contains("MapGroups"))
    assert(!p.contains("CartesianProduct"))
  }

  test("sample_split: membership is a pure projection — no shuffle before the rollup") {
    val p = plan("sample_split")
    assert(!p.contains("Join"), "hash-split must not join anything")
    val exchanges = """Exchange \(\d+\)""".r.findAllIn(p).length
    assert(exchanges <= 2,
      s"one rollup exchange + output sort at most, got $exchanges\n$p")
  }

  test("pack_sequences: corpus never single-partitions; bucket offsets broadcast") {
    val p = plan("pack_sequences")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin"),
      s"the <=nBuckets bucket-offset frame must broadcast back to the corpus\n$p")
    // the two-level prefix sum's whole point: the ONLY SinglePartition
    // exchange feeds the window over the <= nBuckets subtotal rows — the
    // corpus itself only ever hash-exchanges on the bucket key
    // formatted explain spells it "Arguments: SinglePartition, ..."
    val singles = "SinglePartition".r.findAllIn(p).length
    assert(singles == 1,
      s"exactly one SinglePartition exchange (the tiny subtotal window) " +
        s"allowed, got $singles\n$p")
    assert("windowspecdefinition\\(_pk_bucket#".r.findFirstIn(p).nonEmpty,
      s"the corpus-side cumsum window must partition by the bucket\n$p")
    assert(p.contains("Generate"), s"segment fan-out must be an explode\n$p")
    // three consumers (bounds probe, subtotals, main) — the token-count
    // projection must be cached so the text column is read once
    assert(p.contains("InMemoryRelation"),
      s"the (doc_id, n) projection must be persisted\n$p")
  }

  test("corpus_shuffle: rank is bucket-local; only the 256-row count frame single-partitions") {
    val p = plan("corpus_shuffle")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin"),
      s"the bucket-offset frame must broadcast\n$p")
    val singles = "SinglePartition".r.findAllIn(p).length
    assert(singles == 1,
      s"only the bucket-count window may single-partition, got $singles\n$p")
    assert("windowspecdefinition\\(_pk_bucket#".r.findFirstIn(p).nonEmpty,
      s"the rank cumsum must partition by the hash bucket — an " +
        s"un-partitioned rank serializes the corpus through one task\n$p")
  }

  test("pack_sequences_shuffled: corpus windows bucket-partitioned; rank/count frames cached") {
    val p = plan("pack_sequences_shuffled")
    assert(!p.contains("CartesianProduct"))
    // both corpus-side windows (the shuffle rank and the packing cumsum)
    // run through withOffsets, so both partition by its bucket column
    assert("windowspecdefinition\\(_pk_bucket#".r.findAllIn(p).length >= 2,
      s"both corpus-side windows must stay bucket-partitioned\n$p")
    // packConcat consumes its input three times; without the cache the
    // shuffle-rank subtree (a corpus sort) re-executes per consumer
    assert(p.contains("InMemoryRelation"),
      s"the (doc_id, n, position) projection must be persisted\n$p")
  }

  test("bpe_merge_pairs: pair explode above the word dict agg; top-k distributed") {
    val p = plan("bpe_merge_pairs")
    assert(!p.contains("Join") && !p.contains("Window ("))
    assert(p.contains("TakeOrderedAndProject"),
      s"top-30 must be per-partition heaps, not a global sort\n$p")
    // the Sennrich trick: the char-pair Generate must consume the
    // AGGREGATED word dictionary, not the raw token stream — in the
    // formatted tree the word-count HashAggregate sits BELOW the pair
    // Generate (higher node id = earlier operator)
    val tree = p.linesIterator.takeWhile(l => !l.startsWith("(1)")).toSeq
    val genLine = tree.indexWhere(_.contains("Generate"))
    val aggLine = tree.lastIndexWhere(_.contains("HashAggregate"))
    assert(genLine >= 0 && aggLine > genLine,
      s"pair fan-out must run over the distinct-word dict\n$p")
  }

  test("pipeline_pretrain: dedup exchanges carry hashes, never text; stages cached") {
    val p = plan("pipeline_pretrain")
    assert(!p.contains("CartesianProduct"))
    assert("hashpartitioning\\(h#".r.findFirstIn(p).nonEmpty,
      s"the dedup aggregate must exchange on the 8-byte xxhash64 key\n$p")
    // the only permissible text-keyed exchange is exactHashKeyed's
    // verified-duplicate subset (bounded by the true dup count); the
    // corpus-wide count aggregate must NOT be among them
    val textExchanges = "hashpartitioning\\(text#".r.findAllIn(p).length
    assert(textExchanges <= 1,
      s"corpus-wide stages must never exchange raw text, got $textExchanges\n$p")
    assert(p.contains("InMemoryRelation"),
      s"the (doc_id, n) projections must be persisted\n$p")
  }

  test("mix_token_budget: per-lang cumsum stays bucket-partitioned; budgets broadcast") {
    val p = plan("mix_token_budget")
    assert(!p.contains("CartesianProduct"))
    // the corpus-side running total must partition by (lang, bucket) —
    // a lang-only window re-creates the er_sorted_neighborhood hot-key
    // serialization on a dominant language
    assert("windowspecdefinition\\(lang#\\d+, _pk_bucket#".r.findFirstIn(p).nonEmpty,
      s"corpus cumsum must partition by (lang, _pk_bucket)\n$p")
    // budgets and bucket subtotals ride broadcast joins, never a shuffle
    // keyed on the doc rows
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2,
      s"budgets + bucket offsets must broadcast\n$p")
  }

  test("pipeline_pretrain_full: stage-boundary lineage truncated; pack tail bucket-partitioned") {
    // building the frame RUNS the upstream stages (the boundaries are
    // eager localCheckpoints) — that is the point: the returned plan must
    // START at the truncated boundary, not carry the dedup → decontam →
    // mix → 8-round-BPE lineage. Without truncation the composed plan's
    // STRING rendering alone (SQLExecutionStart events) OOMed an 8 GB
    // driver on 500 docs, so `Scan ExistingRDD` here is the regression
    // guard for that failure mode.
    val p = plan("pipeline_pretrain_full")
    assert(p.contains("Scan ExistingRDD"),
      s"the curated-corpus boundary must truncate lineage (localCheckpoint)\n$p")
    assert(!p.contains("Scan parquet"),
      s"post-boundary plan must not re-read the corpus parquet\n$p")
    assert(!p.contains("CartesianProduct"))
    // the pack tail is the pipeline_pretrain shape: every corpus-side
    // window partitions by the contiguous-range bucket, never globally
    assert("windowspecdefinition\\(_pk_bucket#".r.findAllIn(p).length >= 2,
      s"shuffle rank + packing cumsum must stay bucket-partitioned\n$p")
    assert(p.contains("InMemoryRelation"),
      s"the (doc_id, n, position) projection feeds packConcat 3x — must be cached\n$p")
  }

  test("pipeline_pretrain_budget: keyed cumsum bucket-partitioned; budgets broadcast; epochs never exchange text") {
    val p = plan("pipeline_pretrain_budget")
    assert(!p.contains("CartesianProduct"))
    // the per-language running total inside the composition must stay
    // the keyed two-level form — partitioned by (lang, bucket), never
    // lang alone (the dominant-language single-task failure mode)
    assert("windowspecdefinition\\(lang#\\d+, _pk_bucket#".r.findFirstIn(p).nonEmpty,
      s"budget cumsum must partition by (lang, _pk_bucket)\n$p")
    // shuffle rank over (doc, copy) + packing cumsum: bucket-local
    assert("windowspecdefinition\\(_pk_bucket#".r.findAllIn(p).length >= 2,
      s"copy-shuffle rank and packing cumsum must stay bucket-partitioned\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2,
      s"budgets + bucket offsets must broadcast\n$p")
    // curation is the pipeline_pretrain contract: dedup exchanges carry
    // the 8-byte hash; past the curation stage only (doc_id, n, copy)
    // rows move, so at most the bounded dup-verify exchange keys on text
    val textExchanges = "hashpartitioning\\(text#".r.findAllIn(p).length
    assert(textExchanges <= 1,
      s"the epochs/packing stages must never exchange raw text, got $textExchanges\n$p")
    assert(p.contains("InMemoryRelation"),
      s"the token projection and the (doc, copy, position) frame feed " +
        s"multiple consumers — must be cached\n$p")
  }

  test("gini_revenue_offsets: rank windows bucket-partitioned, offsets broadcast") {
    val p = plan("gini_revenue_offsets")
    assert(!p.contains("CartesianProduct"))
    assert("windowspecdefinition\\(_pk_bucket#".r.findFirstIn(p).nonEmpty,
      s"the customer rank must run inside range buckets\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"bucket offsets must broadcast back to the customer rows\n$p")
    // the exact sibling's plan shape — one un-partitioned row_number
    // over the full customer grain — must NOT appear here
    assert(!"windowspecdefinition\\(rev_c#".r.findFirstIn(p).nonEmpty ||
      "windowspecdefinition\\(_pk_bucket#".r.findFirstIn(p).nonEmpty,
      s"no global customer-grain window allowed\n$p")
  }

  test("rfm_segments_offsets: three bucketed ranks, no global ntile windows") {
    val p = plan("rfm_segments_offsets")
    assert(!p.contains("CartesianProduct"))
    assert("windowspecdefinition\\(_pk_bucket#".r.findAllIn(p).length >= 3,
      s"all three quintile ranks must stay bucket-partitioned\n$p")
    assert(!p.contains("ntile("),
      s"the twin must not fall back to a global ntile window\n$p")
    assert(p.contains("InMemoryRelation"),
      s"the customer aggregate feeds three rank passes — must be cached\n$p")
  }

  test("quantile offsets twins: no per-group value arrays, keyed prefix bucket-partitioned") {
    for (q <- Seq("percentiles_offsets", "quantiles_exact_offsets",
        "series_outliers_tukey_offsets", "mad_per_group_offsets")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), q)
      assert(!p.contains("sort_array") && !p.contains("collect_list"),
        s"$q: the whole point is NO buffered per-group value array\n$p")
      assert("windowspecdefinition\\(".r.findFirstIn(p).nonEmpty &&
        "_pk_bucket#".r.findFirstIn(p).nonEmpty,
        s"$q: the cumulative rank must be the keyed bucketed prefix sum\n$p")
    }
  }

  test("roc_auc/ks_test/rank_corr offsets twins: no global value-ordered window") {
    for (q <- Seq("roc_auc_offsets", "ks_test_offsets", "rank_corr_offsets")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), q)
      assert("windowspecdefinition\\(_pk_bucket#".r.findFirstIn(p).nonEmpty,
        s"$q: prefix sums must run inside range buckets\n$p")
      assert(!"windowspecdefinition\\(value#\\d+ ASC".r.findFirstIn(p).nonEmpty &&
        !"windowspecdefinition\\(x#\\d+ ASC".r.findFirstIn(p).nonEmpty &&
        !"windowspecdefinition\\(y#\\d+ ASC".r.findFirstIn(p).nonEmpty,
        s"$q: no global value-ordered window allowed\n$p")
    }
  }

  test("mann_whitney_offsets: per-value prefix sum bucket-partitioned") {
    val p = plan("mann_whitney_offsets")
    assert(!p.contains("CartesianProduct"))
    assert("windowspecdefinition\\(_pk_bucket#".r.findFirstIn(p).nonEmpty,
      s"the rank-sum prefix must run inside range buckets\n$p")
    // the exact sibling's un-partitioned RANK over every event row must
    // not appear: the only windows are the bucket-local prefix and the
    // <= nBuckets subtotal window
    assert(!"windowspecdefinition\\(value#\\d+ ASC".r.findFirstIn(p).nonEmpty,
      s"no global value-ordered window allowed\n$p")
  }

  test("bpe_merge_round2: word dict cached (argmax probe + recount); top-k distributed") {
    val p = plan("bpe_merge_round2")
    assert(!p.contains("Window ("))
    assert(p.contains("TakeOrderedAndProject"),
      s"round-2 top-30 must be per-partition heaps\n$p")
    assert(p.contains("InMemoryRelation"),
      s"the word dictionary feeds the argmax probe and the recount — " +
        s"must be persisted or the corpus tokenizes twice\n$p")
  }

  test("pack_stats: one scan, map-side-combined aggregate, no join or window") {
    val p = plan("pack_stats")
    assert(!p.contains("Join") && !p.contains("Window ("))
    val scans = """Scan parquet\s+\(\d+\)""".r.findAllIn(p).length
    assert(scans == 1, s"expected a single documents scan, got $scans\n$p")
    assert(p.contains("HashAggregate"), "token totals must partial-aggregate")
  }

  test("ann_recall: eager 7-row gate releases its slice/truth caches") {
    import org.apache.spark.storage.StorageLevel
    spark.catalog.clearCache()
    val df = DataQueries.annRecall(spark, sf001)
    // the gate is materialized inside the call (bounded: 7 rows), so the
    // returned plan is a local scan and — the leak regression this pins —
    // the slice/truth persists are dropped before returning (the tiny
    // per-variant centroid caches stay session-scoped by design and are
    // cleared by Bench/Verify's clearCache between queries)
    assert(df.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    assert(df.count() == 7)
    // rebuild the identical slice/truth plans: storageLevel consults the
    // cache manager by plan equality, so NONE proves the cache is gone
    val emb = CoreQueries.table(spark, sf001, "embeddings")
    val slice = emb.orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(256)
    assert(slice.storageLevel == StorageLevel.NONE,
      "annRecall must unpersist its corpus slice before returning")
    val truth = graft.operators.Similarity
      .bruteForceTopK(slice, emb.filter(col("vec_id") < 20), 5)
      .select(col("query_id"), col("vec_id"))
    assert(truth.storageLevel == StorageLevel.NONE,
      "annRecall must unpersist its brute-force truth before returning")
  }
}
