package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{RollingHashExpr, TextFunctions}
import graft.operators.Dedup
import graft.operators.CacheScope.Cacheable
import graft.queries.CoreQueries.table

/** Text-analysis query surface over `documents`: token counting, quality
  * scoring, language ID, fingerprinting, and corpus rollups. All scoring
  * queries carry DuckDB oracles (note: DuckDB regexp_replace needs the 'g'
  * flag to match Spark's replace-all); the rolling-hash fingerprint is a
  * custom codegen Expression, so it's rows-only checked + unit-tested.
  */
object TextQueries {

  def textStats(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"),
        TextFunctions.alphaRatio(col("text")).as("alpha_ratio"),
        TextFunctions.avgWordLen(col("text")).as("avg_word_len"),
        TextFunctions.qualityScore(col("text")).as("quality"))
      .orderBy("doc_id")

  def textLangid(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), TextFunctions.langId(col("text")).as("lang_pred"))
      .orderBy("doc_id")

  def textFingerprint(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")

  def textRollingHash(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"), RollingHashExpr.rolling_hash(col("text")).as("rhash"))
      .orderBy("doc_id")

  /** Token budgeting per doc: whitespace tokens vs the BPE-ish subword
    * estimate — the pair a training-data pipeline tracks per corpus slice. */
  def textBpeTokens(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_ws_tokens"),
        TextFunctions.bpeTokenCount(col("text")).as("n_bpe_tokens"))
      .orderBy("doc_id")

  /** Within-document repetition signals (the Gopher repetition rules'
    * n-gram family): duplicate-word fraction and duplicate-3-gram
    * fraction per doc — high values flag boilerplate/spam before
    * training. Pure projection (the shingle set is built in-row by
    * [[graft.operators.Dedup.wordShingles]]), no shuffle beyond the
    * output sort, so the 100 TB plan is a single scan.
    */
  def textRepetition(spark: SparkSession, dir: String): DataFrame = {
    val words = split(col("text"), " ")
    val nWords = size(words)
    val nShTotal = greatest(nWords - 2, lit(0))
    val nShDistinct = size(Dedup.wordShingles(col("text"), 3))
    table(spark, dir, "documents")
      .select(
        col("doc_id"),
        nWords.cast("long").as("n_words"),
        // floor-rounded (see TextFunctions.round6): the ratios divide
        // exact int counts, so only round()'s tie behavior could diverge
        (floor((lit(1.0) - size(array_distinct(words)).cast("double") /
          greatest(nWords, lit(1))) * 1000000.0 + 0.5) / 1000000.0)
          .as("dup_word_ratio"),
        (floor(when(nShTotal > 0,
          lit(1.0) - nShDistinct.cast("double") / nShTotal).otherwise(0.0)
          * 1000000.0 + 0.5) / 1000000.0).as("dup_3gram_ratio"))
      .orderBy("doc_id")
  }

  /** Corpus rollup: doc counts + mean length + token volume per
    * (lang, source) — the curation dashboard staple. */
  def langSourceAgg(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        // integer mean via floor-rounding on the exact quotient
        (floor(sum(col("n_chars")).cast("double") / count(lit(1))
          * 10000.0 + 0.5) / 10000.0).as("avg_chars"),
        sum(TextFunctions.tokenCount(col("text"))).as("total_tokens"))
      .orderBy("lang", "source")

  /** The curation pipeline end to end, every stage oracle-expressible:
    * exact-dedup survivors -> quality gate -> language ID -> per-language
    * rollup. The composite a training-data pipeline runs nightly; each
    * stage is also tested standalone (dedup_exact, text_stats,
    * text_langid).
    */
  def corpusCurate(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    // hash-keyed exact dedup: the corpus-wide exchange carries 8-byte
    // text hashes, not document bodies (same survivors as Dedup.exact —
    // both forms hash-match the same oracle in their standalone queries)
    val survivors = Dedup.exactHashKeyed(docs).select("doc_id")
    docs
      .join(survivors, Seq("doc_id"), "left_semi")
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .filter(col("quality") >= 0.3)
      .withColumn("lang_pred", TextFunctions.langId(col("text")))
      .groupBy(col("lang_pred"))
      // quality is 6-dp grain (TextFunctions.round6), so micro-units
      // floor(q·10^6 + 0.5) are exact longs — the sum is associative and
      // the 4-dp mean floor-rounds a bit-identical quotient
      .agg(count(lit(1)).as("n_docs"),
        (floor(sum(floor(col("quality") * 1000000.0 + 0.5).cast("long"))
          .cast("double") / count(lit(1)) / 1000000.0 * 10000.0 + 0.5)
          / 10000.0).as("avg_quality"))
      .orderBy("lang_pred")
  }

  /** TF-IDF top-3 terms per document (first 50 docs; document frequency
    * computed over the whole corpus). Scale shape: tf is one (doc, term)
    * aggregation, df one term aggregation over it. The join broadcasts the
    * FILTERED tf side (candidate docs' terms — small by construction), so
    * the corpus-wide vocabulary never ships to executors: at 100 TB dfreq
    * is hundreds of millions of terms and must stay shuffled, while the
    * candidate side is bounded by the doc filter. Ranking orders by the
    * raw double score (rounded only on output) with a term tie-break so
    * both engines agree exactly.
    */
  def tfidfTopTerms(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = table(spark, dir, "documents")
    val toks = docs
      .select(col("doc_id"), explode(split(lower(col("text")), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.select(countDistinct(col("doc_id")).as("n_docs"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("sc").desc, col("term"))
    broadcast(tf.filter(col("doc_id") < 50))
      .join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("sc", col("tf") * log(col("n_docs").cast("double") / col("df")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("doc_id"), col("rn"), col("term"), col("tf"),
        round(col("sc"), 6).as("score"))
      .orderBy("doc_id", "rn")
  }

  /** PII scrub over a corpus: emails, IPv4s, and phone numbers replaced by
    * typed placeholder tokens. The fixture text carries no PII, so each doc
    * is deterministically salted with synthetic PII derived from its id
    * BEFORE redaction — the oracle applies the identical salt + the
    * identical RE2-safe patterns, so a drift in either engine's regex
    * semantics fails the hash compare. Pure projection: embarrassingly
    * parallel, no shuffle, scales linearly with corpus bytes.
    */
  def piiRedact(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"),
        concat(
          col("text"),
          lit(" contact user"), col("doc_id"), lit("@mail.example.com from 10."),
          pmod(col("doc_id"), lit(200)), lit(".0."), pmod(col("doc_id"), lit(250)),
          lit(" call +1-555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")).as("salted"))
      .select(col("doc_id"), TextFunctions.redactPii(col("salted")).as("red_text"))
      .orderBy("doc_id")

  /** Gopher/C4-style quality rules [public: Rae et al. 2021 §A1.1; Raffel
    * et al. 2020 §2.2]: word-count bounds, mean-word-length bounds, symbol
    * ratio, stopword presence — each rule a column, plus the conjunction
    * `keep`. Flags are 0/1 ints so both engines stringify identically.
    */
  def qualityGopher(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    docs.select(
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_words"),
        TextFunctions.avgWordLen(col("text")).as("avg_word_len"),
        TextFunctions.symbolRatio(col("text")).as("symbol_ratio"),
        col("text").rlike("\\b(the|and|of|to)\\b").cast("int").as("has_stopword"))
      .withColumn("keep",
        (col("n_words").between(5, 5000) &&
          col("avg_word_len").between(2.0, 15.0) &&
          col("symbol_ratio") < 0.1 &&
          col("has_stopword") === 1).cast("int"))
      .orderBy("doc_id")
  }

  /** Per-source quota: keep the first `10` docs (by id) of each source —
    * the domain-balancing step of corpus curation (cap any one domain's
    * share of the training mix). One hash-partitioned window by source;
    * at 100 TB this is the cheap shape — no global sort, state per group
    * is one counter.
    */
  def domainQuota(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    table(spark, dir, "documents")
      .select(col("doc_id"), col("source"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .orderBy("source", "rn")
  }

  /** Corpus-frequent terms through the two-pass Misra-Gries operator
    * ([[graft.operators.HeavyHitters]]). EXACT output (sketch only prunes
    * the candidate space), so it carries a plain GROUP BY + HAVING oracle —
    * the equivalence IS the test that the pruning pass loses nothing.
    */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val toks = table(spark, dir, "documents")
      .select(explode(split(lower(col("text")), "\\s+")).as("item"))
      .filter(length(col("item")) > 0)
    graft.operators.HeavyHitters.frequentItems(toks, "item", minFraction = 0.005)
      .orderBy("item")
  }

  /** Top revenue contributors through the WEIGHTED Misra-Gries operator
    * ([[graft.operators.HeavyHitters.frequentItemsWeighted]] — the
    * exact topKWeighted shape): users whose summed event value reaches
    * 0.5% of total revenue, weights in integer cents. EXACT like the
    * unweighted form, so the oracle is a plain weighted GROUP BY +
    * HAVING.
    */
  def heavyHittersWeighted(spark: SparkSession, dir: String): DataFrame = {
    val w = table(spark, dir, "events")
      .select(col("user_id").as("item"),
        round(col("value") * 100).cast("long").as("wt"))
    graft.operators.HeavyHitters
      .frequentItemsWeighted(w, "item", "wt", minFraction = 0.005)
      .orderBy("item")
  }

  /** Blocked fuzzy match: candidate pairs must agree on BOTH blocking
    * keys — the 8-char exact prefix AND a text-length bucket (probing
    * bucket ± 1 so no pair escapes a boundary) — then the O(64^2)
    * Levenshtein verify runs only on candidates. Length alone is a
    * catastrophic blocker on a corpus with clustered lengths (measured:
    * 2.3M candidates and 140 s at sf0.1 — O(n^2/buckets)); adding the
    * prefix key cuts that to 5.7k candidates while keeping every
    * dist<=20 match on the fixtures. Blocked matching DEFINES recall by
    * its keys (standard practice layers redundant key sets to cover
    * edits that break one of them); the oracle applies the identical
    * blocking, so both engines compute the same contract.
    */
  def fuzzyMatch(spark: SparkSession, dir: String): DataFrame = {
    val d = table(spark, dir, "documents")
      .select(col("doc_id"), substring(col("text"), 1, 64).as("t"),
        substring(col("text"), 1, 8).as("p8"),
        expr("CAST(length(text) AS BIGINT) DIV 32").as("bucket"))
    val probes = d
      .select(col("doc_id").as("doc_a"), col("t").as("ta"), col("p8"),
        explode(array(col("bucket") - 1, col("bucket"), col("bucket") + 1)).as("probe"))
    val right = d
      .select(col("doc_id").as("doc_b"), col("t").as("tb"),
        col("p8").as("p8_b"), col("bucket"))
    probes
      .join(right, col("probe") === col("bucket") && col("p8") === col("p8_b") &&
        col("doc_a") < col("doc_b"))
      .withColumn("dist", levenshtein(col("ta"), col("tb")))
      .filter(col("dist") <= 20)
      .select(col("doc_a"), col("doc_b"), col("dist"))
      .orderBy("doc_a", "doc_b")
  }

  /** Deterministic per-group sample: 3 docs per (lang, source), chosen by
    * md5-of-id order — the distributed stand-in for per-group reservoir
    * sampling. Hash order is a fixed pseudo-random permutation, so the
    * sample is reproducible across runs, partitionings, and engines
    * (md5 of the decimal id string is engine-independent — which is what
    * lets a "random" sample carry a full DuckDB oracle). One windowed
    * row_number per group, same scale shape as domain_quota.
    */
  def sampleReservoir(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"), col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .orderBy("lang", "source", "rn")
  }

  /** Quality-decile profile: ntile(10) over the quality score, per-decile
    * doc counts and score ranges — the report a curator reads before
    * choosing the "drop the bottom N deciles" threshold. One global-order
    * window; at 100 TB you'd swap ntile for approx quantile boundaries
    * (documented trade: ntile is exact but single-ordering).
    */
  def qualityDeciles(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = table(spark, dir, "documents")
      .select(col("doc_id"), TextFunctions.qualityScore(col("text")).as("q"))
    scored
      .withColumn("decile",
        ntile(10).over(Window.orderBy(col("q"), col("doc_id"))).cast("long"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs"),
        round(min(col("q")), 6).as("q_min"),
        round(max(col("q")), 6).as("q_max"))
      .orderBy("decile")
  }

  /** The 100 TB formulation of [[qualityDeciles]]: decile BOUNDARIES from
    * one percentile aggregate, broadcast back as a single row, then a
    * plain hash agg — no global-order window, so no single-partition sort
    * anywhere (that SHAPE, not the boundary estimator, is what survives
    * the scale-up; at 100 TB swap `percentile` for `percentile_approx`'s
    * map-side-combinable sketch, a one-expression change on the same
    * plan). Rows whose score ties a boundary all land in the same decile
    * (ntile would split them by the tiebreak) — so this is NOT
    * row-identical to [[qualityDeciles]] at ties, deliberately.
    * Oracle-checked: exact interpolated percentiles follow the standard
    * rank rule (p*(n-1), linear interpolation) on both engines, and every
    * boundary is strictly interior to its bracketing sample pair for
    * non-degenerate n (499d/10 is never integral), so the `<` bucketing
    * can't flip on last-ulp interpolation differences. When the two
    * bracketing samples are EQUAL (a tie run spans the rank — duplicate
    * texts make duplicate scores), both engines skip interpolation and
    * return the tied value bit-exactly (Spark's Percentile special-cases
    * lowerKey == higherKey; DuckDB's lo + g*(hi-lo) collapses to lo) —
    * pinned in ApproxSpec's tie-rule test.
    * TextQueriesSpec additionally pins the percentile_approx form's
    * agreement with this one on the fixtures.
    */
  def qualityDecilesApprox(spark: SparkSession, dir: String): DataFrame = {
    val scored = table(spark, dir, "documents")
      .select(col("doc_id"), TextFunctions.qualityScore(col("text")).as("q"))
    val bounds = scored.agg(
      expr(s"percentile(q, array(${(1 to 9).map(_ / 10.0).mkString(",")}))")
        .as("b"))
    scored
      .crossJoin(broadcast(bounds))
      .select(col("q"),
        (size(filter(col("b"), x => x < col("q"))) + 1).cast("long").as("decile"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs"),
        round(min(col("q")), 6).as("q_min"),
        round(max(col("q")), 6).as("q_max"))
      .orderBy("decile")
  }

  /** CCNet-style perplexity filtering [public: Wenzek et al. 2020], with
    * the LM trained ON the corpus itself so the whole query is
    * deterministic and oracle-able: a Laplace-smoothed bigram model
    * (p = (c12 + 1) / (c1 + |V|)) scores each document's mean log2
    * probability; high-ppl outliers are the quality-filter drop set.
    * Plan shape: bigrams come from one doc-keyed lead() window (the
    * oracle's positional self-join, minus a join); the count tables are
    * map-side-combinable aggregates; scoring joins are keyed on the
    * bigram/unigram — at a bounded vocabulary the LM sides broadcast,
    * and an open-domain corpus caps the vocab first (heavy_hitters is
    * that operator). avg(log2) is reassociated under partial
    * aggregation, hence the 4-decimal round shared with the oracle.
    */
  def textPerplexity(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val toks = table(spark, dir, "documents")
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
    val bg = toks
      .withColumn("w2", lead(col("tok"), 1).over(w))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"), col("tok").as("w1"), col("w2"))
    val c12 = bg.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).cast("double").as("c12"))
    val c1 = bg.groupBy(col("w1"))
      .agg(count(lit(1)).cast("double").as("c1"))
    val vocab = toks.agg(countDistinct(col("tok")).cast("double").as("vocab"))
    bg
      .join(c12, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        log2((col("c12") + 1) / (col("c1") + col("vocab"))).as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("lp")), 4).as("avg_log2p"),
        round(pow(lit(2.0), -avg(col("lp"))), 2).as("ppl_proxy"))
      .orderBy("doc_id")
  }

  /** Sliding-window document chunking — the step between curation and
    * tokenization in an LLM data pipeline: split each document into
    * window-of-64-tokens chunks with stride 48 (16-token overlap), the
    * shape context-window packing consumes. Pure narrow pipeline: split +
    * sequence + explode + slice — NO shuffle, no per-doc state beyond the
    * token array, output linear in corpus tokens. At 100 TB this runs
    * embarrassingly parallel per input split; the orderBy exists only for
    * the deterministic oracle hash.
    */
  def docChunk(spark: SparkSession, dir: String): DataFrame = {
    val win = 64
    val stride = 48
    val nChunks = // index of the last window start: ceil(max(n - win, 0) / stride)
      ceil(greatest(col("n") - win, lit(0)).cast("double") / stride).cast("long")
    table(spark, dir, "documents")
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
      .withColumn("n", size(col("t")))
      .withColumn("chunk_idx", explode(sequence(lit(0L), nChunks)))
      .select(col("doc_id"), col("chunk_idx"),
        slice(col("t"), (col("chunk_idx") * stride + 1).cast("int"), lit(win)).as("ct"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("ct")).cast("long").as("chunk_tokens"),
        array_join(col("ct"), " ").as("chunk_text"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** Temperature-based corpus mixture weights [public: the alpha-sampling
    * of multilingual pretraining — Devlin et al. 2019 (mBERT), Conneau
    * et al. 2020 (XLM-R), alpha = 0.7]: per-language sampling probability
    * proportional to p^alpha, which upsamples tail languages relative to
    * their raw share. Output is the mixture plan a curation pipeline
    * executes — raw share, tempered share, and the target doc count at
    * the current corpus size. One tiny hash agg + a 5-row window; the
    * scan dominates at any scale.
    */
  /** Shared mixture front half: per-language counts, totals, raw share,
    * and the alpha=0.7 tempered weight — ONE definition for the plan
    * report ([[mixTemperature]]), the standalone executor
    * ([[mixExecute]]), and the composed pipeline, so the tempering
    * arithmetic cannot drift between them.
    */
  private def mixShares(langDocs: DataFrame): DataFrame = {
    val c = langDocs.select(col("lang"))
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val t = c.agg(sum(col("n")).as("total"))
    c.crossJoin(broadcast(t))
      .select(col("lang"), col("n"), col("total"),
        (col("n") / col("total")).as("p"),
        pow(col("n") / col("total"), lit(0.7)).as("wgt"))
  }

  /** The tempered selection itself: join the broadcast per-language
    * Bernoulli fraction f = min(1, target/n) onto `docs` and keep rows
    * whose md5 unit draw falls under it. Broadcast join + projection
    * filter — `docs`' payload columns (text included) never shuffle, so
    * the mix stage is exchange-free at any corpus size. Emits docs'
    * columns + `target_docs` (callers drop it when unneeded).
    */
  /** The tempered selection PLAN alone — (lang, target_docs, f) from the
    * corpus's language histogram. Package-visible so the streaming gate
    * can compute it batch-side (production computes the plan on a corpus
    * snapshot, then applies it to the stream) with ONE arithmetic
    * definition.
    */
  private[queries] def mixFractions(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    mixShares(docs)
      .select(col("lang"), col("n").as("n_docs"),
        round(col("wgt") / sum(col("wgt")).over(w) * col("total"), 0)
          .cast("long").as("target_docs"))
      .withColumn("f",
        least(lit(1.0), col("target_docs").cast("double") / col("n_docs")))
      .select(col("lang"), col("target_docs"), col("f"))
  }

  private def mixSelect(docs: DataFrame): DataFrame =
    docs.join(broadcast(mixFractions(docs)), "lang")
      .filter(graft.operators.Sampling.unitMd5("doc_id") < col("f"))
      .drop("f")

  def mixTemperature(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    mixShares(table(spark, dir, "documents"))
      .select(col("lang"), col("n").as("n_docs"),
        round(col("p"), 6).as("p_raw"),
        round(col("wgt") / sum(col("wgt")).over(w), 6).as("p_sampled"),
        round(col("wgt") / sum(col("wgt")).over(w) * col("total"), 0)
          .cast("long").as("target_docs"))
      .orderBy("lang")
  }

  /** EXECUTE the temperature-mix plan: per-language deterministic
    * Bernoulli selection at fraction target/n using the md5 unit draw
    * ([[graft.operators.Sampling.unitMd5]] — auditable in any engine
    * with md5). This is the scale-honest executor: membership is a pure
    * projection filter (no per-language rank window, whose hottest
    * language would serialize through one task), so selected counts are
    * target +- sampling noise rather than exact quotas — the standard
    * trade for distributed mixture sampling; exact per-stratum quotas
    * live in sample_stratified's WindowGroupLimit form. `sel_xor` folds
    * the selected id set to one BIGINT so the oracle hash-checks the
    * exact membership, not just counts.
    */
  def mixExecute(spark: SparkSession, dir: String): DataFrame =
    mixSelect(table(spark, dir, "documents").select(col("doc_id"), col("lang")))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_selected"),
        max(col("target_docs")).as("target_docs"),
        bit_xor(col("doc_id")).as("sel_xor"))
      .orderBy("lang")

  /** Token-BUDGET mixture execution: where [[mixExecute]] hits per-
    * language DOC-count targets with a Bernoulli draw (expected-value
    * exact), this hits per-language TOKEN budgets exactly-greedily — the
    * form a training run with a fixed token budget per domain actually
    * needs. Budgets: alpha = 0.7 tempered weights over per-language token
    * MASS, scaled to half the corpus tokens. Selection: docs in
    * deterministic (xxhash64(doc_id), doc_id) order per language, kept
    * while the running token total stays under budget (greedy prefix —
    * engine-independent, so DuckDB replays exact membership).
    *
    * Scale shape: the per-language running total is
    * [[graft.operators.Packing.withKeyedOffsets]] — per-(lang, bucket)
    * local windows plus a per-language window over <= nBuckets SUBTOTAL
    * rows, so a language owning 99% of the corpus still never serializes
    * its data through one task (the naive per-lang cumsum window is
    * exactly the er_sorted_neighborhood failure mode). Budgets join back
    * as a broadcast; output folds membership to one bit_xor per language.
    */
  def mixTokenBudget(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        graft.functions.TextFunctions.tokenCount(col("text")).as("n"))
      .filter(col("n") > 0)
    val mass = docs.groupBy(col("lang")).agg(sum(col("n")).as("t"))
    val w = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val budgets = mass
      .crossJoin(broadcast(mass.agg(sum(col("t")).as("total"))))
      .select(col("lang"),
        pow(col("t") / col("total"), lit(0.7)).as("wgt"),
        expr("total DIV 2").as("tgt"))
      .select(col("lang"),
        round(col("wgt") / sum(col("wgt")).over(w) * col("tgt"), 0)
          .cast("long").as("budget"))
    val ranked = graft.operators.Packing.withKeyedOffsets(
      docs.withColumn("_mx_h", xxhash64(col("doc_id"))),
      Seq("lang"), Seq("_mx_h", "doc_id"), "n",
      shiftright(col("_mx_h"), 56), "off")
    ranked.join(broadcast(budgets), "lang")
      .filter(col("off") + col("n") <= col("budget"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_selected"),
        sum(col("n")).as("tok_selected"),
        max(col("budget")).as("budget"),
        bit_xor(col("doc_id")).as("sel_xor"))
      .orderBy("lang")
  }

  /** Repeat-factor domain UPSAMPLING — the r > 1 side of mixture
    * execution that [[mixExecute]]'s capped Bernoulli fraction cannot
    * express: the alpha = 0.7 tempered target gives minority languages
    * target > n, so each of their docs repeats floor(r) times plus one
    * more with probability frac(r) (the standard non-integer "epochs per
    * domain" scheme); majority languages (r < 1) degrade to exactly the
    * Bernoulli subsample. Emits per language the replicated row count,
    * distinct docs, and an exact multiset-membership fold over
    * (doc_id, copy) — so the oracle hash-checks WHICH copies exist, not
    * just how many. Scale: broadcast per-lang factors + a bounded
    * `sequence` explode over (doc_id, lang) pairs; text never enters the
    * plan.
    */
  def mixUpsample(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = table(spark, dir, "documents").select(col("doc_id"), col("lang"))
    val w = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val plan = mixShares(docs)
      .select(col("lang"), col("n").as("n_docs"),
        round(col("wgt") / sum(col("wgt")).over(w) * col("total"), 0)
          .cast("long").as("target_docs"))
      .select(col("lang"),
        (col("target_docs").cast("double") / col("n_docs")).as("r"))
      .select(col("lang"), floor(col("r")).cast("long").as("base"),
        (col("r") - floor(col("r"))).as("frac"))
    docs.join(broadcast(plan), "lang")
      .withColumn("n_copies",
        col("base") +
          (graft.operators.Sampling.unitMd5("doc_id") < col("frac")).cast("long"))
      // filter BEFORE the explode: sequence(1, 0) DESCENDS in Spark
      // (emits [1, 0]) while DuckDB's generate_series(1, 0) is empty
      .filter(col("n_copies") >= 1)
      .select(col("doc_id"), col("lang"),
        explode(sequence(lit(1L), col("n_copies"))).as("copy"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("doc_id")).as("n_docs"),
        // xxhash64(doc_id, copy) folds the exact (doc, copy) multiset:
        // injective-in-practice for ANY id range, where the earlier
        // doc_id*131071+copy key overflowed Long past doc_id ~ 2^46 (an
        // ANSI-mode runtime error at billion-doc scale); the oracle
        // replays the chained hash via the HUGEINT xxhash64 rendering
        bit_xor(xxhash64(col("doc_id"), col("copy"))).as("rep_xor"))
      .orderBy("lang")
  }

  /** Curriculum training order [public: Bengio et al. 2009]: documents
    * ranked by quality band (highest first), deterministically shuffled
    * WITHIN each band by (xxhash64(doc_id), doc_id) — anneal-from-clean
    * ordering with reproducible intra-band randomness. Bands are fixed
    * quarters of the 6-dp quality score (engine-independent boundaries,
    * same rounding armor as corpus_curate). The dense position is the
    * two-level prefix sum over a bucket contiguous in (band, hash) order
    * — no global window ever sees the corpus, same scale shape as
    * [[graft.operators.Packing.shuffleOrder]].
    */
  def curriculumOrder(spark: SparkSession, dir: String): DataFrame = {
    val banded = table(spark, dir, "documents")
      .select(col("doc_id"),
        graft.functions.TextFunctions.qualityScore(col("text")).as("q"))
      .withColumn("negband",
        lit(3L) - least(lit(3L), floor(col("q") * 4).cast("long")))
      .withColumn("_cu_h", xxhash64(col("doc_id")))
      .withColumn("_cu_one", lit(1L))
    graft.operators.Packing.withOffsets(banded,
      Seq("negband", "_cu_h", "doc_id"), "_cu_one",
      col("negband") * 64 + shiftright(col("_cu_h"), 58) + lit(32),
      "position")
      .select(col("position"), col("doc_id"),
        (lit(3L) - col("negband")).as("quality_band"))
      .orderBy("position")
  }

  /** Multi-pass-ready sorted-neighborhood entity resolution [public:
    * Hernandez & Stolfo 1995]: sort records by a blocking key, compare
    * only rank-adjacent records inside a sliding window — O(n·w) pair
    * candidates instead of O(n^2). The classic method's single global
    * sort is a scale anti-pattern (one task owns the order), so this is
    * the BLOCKED variant: an 8-char normalized prefix partitions the
    * window (distributed, skew bounded by block size), ranks order by a
    * 24-char sort key within each block, and candidates are pairs within
    * rank distance 3, verified by Levenshtein on a 64-char probe.
    * Cross-block neighbors are missed by construction — the published
    * mitigation is multiple passes with different blocking keys (this
    * pairs with [[fuzzyMatch]]'s length-bucket blocking as pass two).
    *
    * STATUS: DEMONSTRATION-ONLY at scale (the textbook single-pass form,
    * kept registered for the method comparison). The x30 replica measured
    * it superlinear — 8.0x under 3x data — because common-prefix blocks
    * GROW with the corpus and each block's rank window serializes through
    * one task; salting can't fix it (the rank that would cap a block is
    * the same serial window). The production operator is
    * [[erSnmMultikey]]: finer independent keys shrink the serial window
    * unit structurally (measured 1.5x under 3x, absolutely faster at
    * x30). QUERIES.md carries the same demotion note.
    */
  def erSortedNeighborhood(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nrm = trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " "))
    val kd = table(spark, dir, "documents")
      .select(col("doc_id"), substring(nrm, 1, 8).as("block"),
        substring(nrm, 1, 24).as("sortkey"), substring(nrm, 1, 64).as("probe"))
    val w = Window.partitionBy(col("block")).orderBy(col("sortkey"), col("doc_id"))
    val rk = kd.withColumn("rn", row_number().over(w))
      .select(col("doc_id"), col("block"), col("probe"), col("rn"))
      .cacheTracked()
    // candidates via EXPLODED probe ranks so the join key is (block, rn)
    // — a join on block alone with the rank distance as a post-filter
    // materializes |block|^2 pairs first, which the x10 scaling run
    // measured as a 59x blowup on 10x data (SCALING.md round 7); this
    // form emits exactly the w=3 rank-adjacent candidates
    val probes = rk.select(col("doc_id").as("doc_a"), col("block"),
      col("probe").as("probe_a"),
      explode(array((1 to 3).map(d => col("rn") + d): _*)).as("rn"))
    probes
      .join(rk, Seq("block", "rn"))
      .withColumn("dist", levenshtein(col("probe_a"), col("probe")))
      .filter(col("dist") <= 20)
      .select(col("doc_a"), col("doc_id").as("doc_b"), col("dist"))
      .orderBy("doc_a", "doc_b")
  }

  /** Multi-pass sorted-neighborhood ER — the production scale form of
    * [[erSortedNeighborhood]] [public: Hernández & Stolfo 1995's
    * multi-pass SNM]. The single-pass 8-char block is the one registered
    * operator whose scaling measured superlinear (SCALING.md: 8.0× under
    * 3× data at x30 — the per-block `row_number` serializes as
    * common-prefix blocks grow with the corpus). The literature's fix is
    * structural, not plan surgery: several passes with FINER independent
    * keys — pass 1 blocks on normalized chars 1–12, pass 2 on chars
    * 13–24. Finer blocks shrink the serial window unit (the skew cap),
    * and pairs a longer prefix splits apart are still caught when they
    * agree on the second key. Candidates from both passes are
    * canonicalized (doc_lo < doc_hi) and set-unioned; the probe distance
    * is pass-independent (same 64-char probes either way), so the union
    * is exact set semantics, hash-checked by the oracle's identical
    * two-window UNION.
    *
    * Each pass blocks only on PRESENT keys: a document whose normalized
    * text is shorter than the pass's key offset has an empty key and is
    * excluded from that pass (never lumped into a shared '' block —
    * on a short-doc-heavy corpus that block would grow with the corpus
    * and re-create exactly the serial-window skew this operator exists
    * to tame). Multi-pass SNM's recall argument is unchanged: such docs
    * still participate in every pass whose key they do have.
    */
  def erSnmMultikey(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nrm = trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " "))
    val base = table(spark, dir, "documents")
      .select(col("doc_id"), substring(nrm, 1, 12).as("k1"),
        substring(nrm, 13, 12).as("k2"),
        substring(nrm, 1, 24).as("sortkey"), substring(nrm, 1, 64).as("probe"))
      .cacheTracked()
    def pass(key: String): DataFrame = {
      val w = Window.partitionBy(col("block"))
        .orderBy(col("sortkey"), col("doc_id"))
      val rk = base
        .select(col("doc_id"), col(key).as("block"), col("sortkey"), col("probe"))
        .filter(length(col("block")) > 0)
        .withColumn("rn", row_number().over(w))
        .select(col("doc_id"), col("block"), col("probe"), col("rn"))
      val probes = rk.select(col("doc_id").as("doc_a"), col("block"),
        col("probe").as("probe_a"),
        explode(array((1 to 3).map(d => col("rn") + d): _*)).as("rn"))
      probes.join(rk, Seq("block", "rn"))
        .select(least(col("doc_a"), col("doc_id")).as("doc_lo"),
          greatest(col("doc_a"), col("doc_id")).as("doc_hi"),
          col("probe_a"), col("probe"))
    }
    pass("k1").unionByName(pass("k2"))
      .withColumn("dist", levenshtein(col("probe_a"), col("probe")))
      .filter(col("dist") <= 20)
      .select(col("doc_lo"), col("doc_hi"), col("dist"))
      .distinct()
      .orderBy("doc_lo", "doc_hi")
  }

  /** Higher-order array-function battery (ClickHouse arrayMap/arrayFilter/
    * arraySort/arrayDistinct family) over tokenized documents: every
    * derived column is a codegen'd Spark collection function —
    * `transform`, `aggregate`, `array_sort`, `array_distinct`, `slice`,
    * `array_join` — with the DuckDB list_* equivalents as the oracle.
    * Pure projection after the scan: no shuffle, no UDF, whole-stage
    * codegen end to end (the lambda functions stay in the plan as
    * expressions, not closures).
    */
  def arrayFunctions(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    table(spark, dir, "documents")
      .select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_uniq"),
        aggregate(toks, lit(0L), (acc, x) => acc + length(x))
          .as("total_chars"),
        array_max(transform(toks, x => length(x))).cast("long")
          .as("longest_token"),
        array_join(slice(array_sort(toks), 1, 3), ",").as("first3_sorted"))
      .orderBy("doc_id")
  }

  /** Multinomial Naive Bayes language classifier, trained and scored
    * entirely relationally [public: the McCallum & Nigam 1998 event
    * model]: fit on the `doc_id % 5 != 0` split, predict the held-out
    * fifth. The log-likelihood decomposes so that zero-count (token,
    * class) pairs contribute log(0+1) = 0 — an INNER join on observed
    * counts plus a per-class normalizer `m_d * ln(N_c + |V|)` is exact
    * Laplace smoothing with no dense (vocab x class) materialization.
    * Out-of-vocabulary test tokens drop at the vocab join (standard NB
    * practice); test docs with zero in-vocab tokens drop with them.
    * Scale shape: token counts are one (class, token) hash agg; scoring
    * shuffles on token (skew bounded — a hot token fans out to at most
    * |classes| count rows); class constants broadcast. The oracle
    * replays the same algebra in SQL — scores rounded to 6 BEFORE the
    * argmax rank on both engines so the winner is identical.
    */
  def naiveBayesLang(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val train = docs.filter(col("doc_id") % 5 =!= 0)
    val tr = train
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("tok"))
      .cacheTracked()
    val te = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val cls = train.groupBy(col("lang").as("c"))
      .agg(count(lit(1)).cast("double").as("n_docs"))
    val tot = train.agg(count(lit(1)).cast("double").as("n_train"))
    val vocabToks = tr.select("tok").distinct()
      .cacheTracked()
    val vocab = vocabToks.agg(count(lit(1)).cast("double").as("v"))
    val nc = tr.groupBy(col("lang").as("c"))
      .agg(count(lit(1)).cast("double").as("n_tok"))
    val cnt = tr.groupBy(col("lang").as("c"), col("tok"))
      .agg(count(lit(1)).as("k"))
    val tev = te.join(vocabToks, "tok").select("doc_id", "tok")
      .cacheTracked()
    val md = tev.groupBy("doc_id").agg(count(lit(1)).cast("double").as("m"))
    val grid = md.crossJoin(broadcast(cls.join(nc, "c")))
      .crossJoin(broadcast(tot)).crossJoin(broadcast(vocab))
    val contrib = tev.join(cnt, "tok")
      .groupBy(col("doc_id"), col("c"))
      .agg(sum(log(col("k") + lit(1.0))).as("s"))
    val score = grid.join(contrib, Seq("doc_id", "c"), "left")
      .select(col("doc_id"), col("c"),
        round(log(col("n_docs") / col("n_train")) +
          coalesce(col("s"), lit(0.0)) -
          col("m") * log(col("n_tok") + col("v")), 6).as("score"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("c"))
    score.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .join(docs.select(col("doc_id"), col("lang").as("actual")), "doc_id")
      .select(col("doc_id"), col("c").as("predicted"), col("actual"),
        when(col("c") === col("actual"), 1L).otherwise(0L).as("correct"))
      .orderBy("doc_id")
  }

  /** Per-doc whitespace token counts with zero-token docs dropped — the
    * shared front half of the packing queries (a blank doc contributes
    * nothing to a token stream; keeping it would emit zero-length
    * segments).
    */
  private def tokensPerDoc(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"), TextFunctions.tokenCount(col("text")).as("n"))
      .filter(col("n") > 0)

  /** Materialized cache of a small projection the packing plan consumes
    * three times (Packing.packConcat's contract) — without it every
    * consumer re-reads the corpus text just to recount tokens. ~16
    * bytes/doc, session-scoped like the other query-local caches
    * (Bench/Verify clear the cache between queries).
    */
  private def materialized(df: DataFrame): DataFrame = {
    val p =
      if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        df.cacheTracked()
      else df
    p.count()
    p
  }

  /** Stage-boundary materialization that also TRUNCATES LINEAGE
    * (`localCheckpoint`): the composed full pipeline stacks the k-round
    * BPE chain (8 nested cached rounds) on top of the dedup → decontam →
    * mix lineage, and without truncation every downstream `count()` posts
    * a SQLExecutionStart event whose plan STRING renders that whole
    * nested tree — measured to OOM an 8 GB driver on 500 docs (the heap
    * died inside `TreeNode.treeString`, not in data). A production run
    * writes the curated corpus to parquet at exactly this boundary (the
    * catalog's writeTable path) and re-reads it, which truncates lineage
    * the same way; `localCheckpoint` is that handoff without the I/O.
    * Blocks are GC-scoped (ContextCleaner frees them with the frame),
    * not session caches — CacheHygieneSpec exempts checkpointed RDDs.
    *
    * CAVEATS of the localCheckpoint form (the LOCAL-MODE stand-in, not
    * the production mechanism): (1) it is NOT fault-tolerant — truncated
    * lineage cannot recompute a block lost to executor failure or
    * dynamic-allocation decommission, so on a real cluster the job fails
    * instead of recovering; (2) blocks linger until the frame is GC'd,
    * so many pipeline runs in one long-lived session hold blocks between
    * GCs. The reliable alternative — `df.checkpoint()` to the context's
    * checkpoint dir — is executor-loss-safe and the closest no-catalog
    * approximation of the real writeTable parquet handoff, but it is an
    * EXPLICIT OPT-IN (`spark.graft.stageBoundary.reliable=true` plus a
    * configured checkpoint dir), NOT keyed off `getCheckpointDir`
    * presence: a checkpoint dir set by unrelated code (the graph
    * operators' reliable mode, a notebook) must not silently flip this
    * path, and Spark's default
    * `spark.cleaner.referenceTracking.cleanCheckpoints=false` NEVER
    * deletes reliable checkpoint files, so repeated pipeline runs in a
    * long-lived session would accumulate unbounded data in that dir.
    * An opt-in caller owns the dir and must either set
    * `cleanCheckpoints=true` or clean it between runs; a production run
    * should prefer the parquet handoff outright.
    */
  private def stageBoundary(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val optIn = df.sparkSession.conf
      .getOption("spark.graft.stageBoundary.reliable").contains("true")
    if (optIn && sc.getCheckpointDir.isDefined) df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)
  }

  /** Context window for the registered packing queries — small enough
    * that sf0.01 docs straddle boundaries (the interesting case), large
    * enough that multi-sequence docs occur.
    */
  private val PackCtx = 128

  /** Concat-and-chunk packing map at ctx=128 over doc_id order — see
    * [[graft.operators.Packing.packConcat]] for semantics and the
    * two-level prefix-sum scale argument. The oracle replays the window
    * arithmetic directly; its naive single-window cumsum and the
    * operator's bucketed one agree because an exclusive prefix sum over a
    * total order is partitioning-independent.
    */
  def packSequences(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Packing
      .packConcat(materialized(tokensPerDoc(spark, dir)), PackCtx,
        nBuckets = 32)
      .orderBy("seq_id", "doc_id")

  /** Padding-waste accounting for the two standard batching strategies:
    * one-doc-per-sequence padding vs concat packing at ctx=128. Pure
    * map-side-combinable aggregate (one row out); the fill ratios divide
    * exact integer token counts, so the half-up floor rounding is
    * engine-independent (ARCHITECTURE.md "Correctness strategy").
    */
  def packStats(spark: SparkSession, dir: String): DataFrame = {
    val ctx = PackCtx
    tokensPerDoc(spark, dir)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n")).as("total_tokens"),
        expr(s"(sum(n) + ${ctx - 1}) DIV $ctx").as("packed_seqs"),
        sum(expr(s"(n + ${ctx - 1}) DIV $ctx")).as("naive_seqs"))
      .select(
        col("n_docs"), col("total_tokens"), col("packed_seqs"),
        col("naive_seqs"),
        (col("packed_seqs") * ctx - col("total_tokens")).as("packed_pad"),
        (col("naive_seqs") * ctx - col("total_tokens")).as("naive_pad"),
        (floor(col("total_tokens").cast("double") /
          (col("packed_seqs") * ctx) * 1000000.0 + 0.5) / 1000000.0)
          .as("packed_fill"),
        (floor(col("total_tokens").cast("double") /
          (col("naive_seqs") * ctx) * 1000000.0 + 0.5) / 1000000.0)
          .as("naive_fill"))
  }

  /** Deterministic training-order shuffle of the corpus — dense position
    * by (xxhash64(doc_id), doc_id); see
    * [[graft.operators.Packing.shuffleOrder]] for the bucketed-rank scale
    * shape. Oracle: the xxhash64-in-HUGEINT replay
    * ([[DataQueries.xxhash64LongSql]]) plus a ROW_NUMBER over the same
    * sort key.
    */
  def corpusShuffle(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Packing
      .shuffleOrder(table(spark, dir, "documents").select(col("doc_id")))
      .orderBy("position")

  /** The production composition: shuffle to training order FIRST, then
    * concat-pack in that order ([[packSequences]] and [[corpusShuffle]]
    * fused end-to-end). Ordered by (seq_id, seq_off) — the physical
    * layout of the emitted token stream — because doc_id order within a
    * sequence is arbitrary after the shuffle.
    */
  def packSequencesShuffled(spark: SparkSession, dir: String): DataFrame = {
    val toks = materialized(tokensPerDoc(spark, dir))
    val ord = graft.operators.Packing.shuffleOrder(toks.select(col("doc_id")))
    graft.operators.Packing
      .packConcat(materialized(toks.join(ord, "doc_id")), PackCtx,
        nBuckets = 32, orderCol = "position")
      .orderBy("seq_id", "seq_off")
  }

  /** Curriculum-then-pack composition: concat-and-chunk packing with the
    * quality-banded [[curriculumOrder]] as the concatenation order, so
    * early training sequences draw from the highest-quality band — the
    * anneal-from-clean schedule actually materialized as packed windows.
    * Same scale shape as [[packSequencesShuffled]]: both the curriculum
    * rank and the packing cumsum are two-level prefix sums; the (id, n,
    * position) projection is cached once for packConcat's three
    * consumers.
    */
  def packSequencesCurriculum(spark: SparkSession, dir: String): DataFrame = {
    val toks = materialized(tokensPerDoc(spark, dir))
    val ord = curriculumOrder(spark, dir).select(col("doc_id"), col("position"))
    graft.operators.Packing
      .packConcat(materialized(toks.join(ord, "doc_id")), PackCtx,
        nBuckets = 32, orderCol = "position")
      .orderBy("seq_id", "seq_off")
  }

  /** BPE vocabulary induction, round 1 [public: Sennrich et al. 2016]:
    * the merge-pair statistics a subword tokenizer trains on — adjacent
    * character-pair counts weighted by word frequency, top 30 with a
    * deterministic tiebreak (the argmax is the first merge rule; rerun
    * with the merge applied to iterate). The Sennrich trick IS the scale
    * story: corpus-size work happens only in the map-side-combinable
    * word-frequency aggregate; the pair explosion runs over the DISTINCT
    * word dictionary (vocabulary-bounded, Heaps-law sublinear in corpus
    * size), and the top-k is a distributed TakeOrdered, not a sort.
    */
  def bpeMergePairs(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("wc"))
      .select(col("wc"), explode(
        expr("transform(sequence(1, length(w) - 1), i -> substr(w, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(sum(col("wc")).as("cnt"))
      .orderBy(desc("cnt"), col("pair")).limit(30)

  /** BPE round 2: apply round 1's argmax merge to the word dictionary
    * and recount — the iterate step that grows the vocabulary. The merge
    * is `replace(w, topPair, \\u0001)`: plain replace-all is
    * left-to-right and non-overlapping in both engines, which is exactly
    * BPE's greedy merge scan, and the sentinel char keeps the fused
    * symbol one char wide so the same substr-bigram pass recounts symbol
    * pairs; output pairs expand the sentinel back. The argmax itself is
    * a 1-row driver scalar (the same bounded-collect class as the
    * catalog probes) baked into the plan as a literal. Words reduced to
    * a single symbol must drop BEFORE the bigram transform —
    * sequence(1, 0) DESCENDS in Spark while generate_series(1, 0) is
    * empty in DuckDB.
    */
  def bpeMergeRound2(spark: SparkSession, dir: String): DataFrame = {
    val words = materialized(bpeDict(spark, dir))
    val topPair = bpeArgmax(words, round = 1).getString(0)
    words
      .select(col("wc"),
        replace(col("w"), lit(topPair), lit("\u0001")).as("w2"))
      .filter(length(col("w2")) >= 2)
      .select(col("wc"), explode(
        expr("transform(sequence(1, length(w2) - 1), i -> substr(w2, i, 2))"))
        .as("q"))
      .groupBy(replace(col("q"), lit("\u0001"), lit(topPair)).as("pair"))
      .agg(sum(col("wc")).as("cnt"))
      .orderBy(desc("cnt"), col("pair")).limit(30)
  }

  /** Full BPE vocabulary learner, k = 8 merges [public: Sennrich et al.
    * 2016, algorithm 1]: repeat (count symbol pairs over the word
    * dictionary -> take the argmax -> fuse it everywhere) and emit the
    * learned merge table (merge_rank, pair, cnt) — the artifact a
    * subword tokenizer ships. Representation: each fused symbol is a
    * sentinel char chr(1)..chr(k) (the fixture corpus is ASCII text, so
    * the sentinels cannot collide with input symbols), which keeps every
    * round the SAME two codegen'd passes — a replace-all (greedy
    * left-to-right, exactly BPE's merge scan, and injective because
    * sentinel expansion inverts it — so no re-aggregation is ever
    * needed) and the substr-bigram recount. Driver state per round is
    * one argmax row; the dictionary stays distributed and shrinks
    * monotonically. Cost: k x (vocabulary-bounded pair agg + TakeOrdered
    * argmax) after ONE corpus-size word count — the corpus is never
    * rescanned. The oracle replays all k rounds as a Scala-folded CTE
    * chain with scalar-subquery argmaxes and nested sentinel expansion.
    */
  /** The shared Sennrich loop behind [[bpeLearn]] and [[bpeCompression]]:
    * k rounds of (argmax pair over the length>=2 slice of the dictionary
    * -> replace-all with the round's sentinel). `keepSingles` decides
    * whether fully-merged single-symbol words stay in the rolling
    * dictionary — the learner drops them (they can never pair again),
    * the compression accountant keeps them (they still carry symbol
    * mass); the argmax is identical either way because one-symbol words
    * contribute no pairs. Returns the merge table (rank, sentinel-free
    * expansion, count) and the FINAL STILL-PERSISTED dictionary — the
    * caller owns its unpersist.
    */
  /** Argmax merge pair of a (w, wc) dictionary, with a clear failure
    * when the dictionary can no longer produce pairs — `.head` on the
    * empty frame would otherwise throw a bare NoSuchElementException
    * (and the fixed-k oracle chain would emit NULL rows, a divergent
    * failure mode). The length filter guards the bigram transform:
    * sequence(1, 0) DESCENDS in Spark rather than returning empty.
    */
  private def bpeArgmax(dict: DataFrame, round: Int)
      : org.apache.spark.sql.Row = {
    val rows = dict.filter(length(col("w")) >= 2)
      .select(col("wc"), explode(
        expr("transform(sequence(1, length(w) - 1), i -> substr(w, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(sum(col("wc")).as("cnt"))
      .orderBy(desc("cnt"), col("pair")).limit(1).collect()
    require(rows.nonEmpty,
      s"BPE dictionary exhausted before merge round $round — " +
        "the corpus cannot support this many merges")
    rows.head
  }

  private[graft] def bpeRounds(dict0: DataFrame, k: Int, keepSingles: Boolean)
      : (Seq[(Long, String, Long)], DataFrame) = {
    var dict = materialized(dict0)
    var expansions = Map.empty[Char, String]
    val merges = Seq.newBuilder[(Long, String, Long)]
    for (i <- 1 to k) {
      val top = bpeArgmax(dict, i)
      val pairS = top.getString(0)
      val expanded = pairS.flatMap(c => expansions.getOrElse(c, c.toString))
      merges += ((i.toLong, expanded, top.getLong(1)))
      expansions += (i.toChar -> expanded)
      // withColumn, not select: the dict may carry extra columns (the
      // encode path threads the ORIGINAL word w0 through the chain)
      val merged = dict.withColumn("w",
        replace(col("w"), lit(pairS), lit(i.toChar.toString)))
      // stageBoundary (lineage-TRUNCATING), not materialized (cache):
      // the rolling dict otherwise accumulates one nested replace
      // projection per round, and at a production vocab (k = 512+
      // measured, k = 32k the target) the plan STRING of round k's
      // count OOMs the driver inside treeString/explainString long
      // before data does — the same failure stageBoundary exists for
      // in the composed pipeline. Blocks are GC-scoped; the caller's
      // unpersist contract is unchanged (a no-op on checkpointed
      // frames, real on the cached entry dict).
      val next = stageBoundary(
        if (keepSingles) merged else merged.filter(length(col("w")) >= 2))
      dict.unpersist()
      dict = next
    }
    (merges.result(), dict)
  }

  private[graft] def bpeDictOf(docs: DataFrame): DataFrame =
    // spreadCompute: tokenization over a single-task fixture scan —
    // identity at production scale (Tuning.applyScanSpread)
    graft.Tuning.spreadCompute(docs)
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("wc"))

  private def bpeDict(spark: SparkSession, dir: String): DataFrame =
    bpeDictOf(table(spark, dir, "documents"))

  def bpeLearn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (merges, dict) =
      bpeRounds(bpeDict(spark, dir), k = 8, keepSingles = false)
    dict.unpersist()
    merges.toDF("merge_rank", "pair", "cnt").orderBy("merge_rank")
  }

  /** Greedy non-conflicting wave selection over a ranked candidate list
    * — the standard parallel-BPE relaxation [public: batching
    * non-interacting merges per iteration, as in SentencePiece's BPE
    * trainer and the BlockBPE/parallel-BPE literature]: walk the
    * (cnt desc, pair asc) rank order and take a pair iff it shares NO
    * symbol with any pair already taken this wave, stopping at m.
    * Symbol-disjointness is what makes the batch exact rather than
    * approximate within the wave: a replace-all for one selected pair
    * can neither create nor destroy occurrences of another (their
    * characters never touch), so each selected pair's count and the
    * fused dictionary are identical whether the m merges run as one
    * chained pass or as m sequential rounds in rank order. (Batched CAN
    * still diverge from fully-sequential BPE when a merge creates a NEW
    * pair that out-counts a later selection — inherent to the
    * relaxation and accepted by every production parallel trainer;
    * TextAssemblySpec proves equality on a fixture without that
    * interaction.)
    */
  private[graft] def bpeSelectWave(ranked: Seq[(String, Long)], m: Int)
      : Seq[(String, Long)] = {
    val sel = Seq.newBuilder[(String, Long)]
    var used = Set.empty[Char]
    var taken = 0
    val it = ranked.iterator
    while (taken < m && it.hasNext) {
      val (p, c) = it.next()
      if (!p.exists(used)) { sel += ((p, c)); used ++= p.toSet; taken += 1 }
    }
    sel.result()
  }

  /** The batched Sennrich loop: k merges in k/m JOB WAVES instead of k.
    * This is the production-vocabulary scale path the sequential
    * learner caps out on — [[bpeRounds]] is k sequential (pair-count →
    * argmax → replace) waves, so a 32k-merge vocab is 32k job launches
    * and scheduler latency, not data, becomes the ceiling; batching the
    * top-m symbol-disjoint pairs per wave divides the wave count by
    * ~m while every wave stays the SAME two codegen'd passes (one
    * bigram recount, one chained replace-all). Per wave the WHOLE
    * ranked pair frame is collected for the greedy selection — it is
    * alphabet-bounded (≤ |Σ|² distinct bigrams over single-character
    * symbols, a few thousand rows however large the corpus), the same
    * bounded driver-scalar class as [[bpeArgmax]]'s single row.
    * Sentinels number merges globally (wave w consumes chr((w−1)·m+1)
    * … chr(w·m)), so a batched run and a sequential run that select
    * the same pairs produce bit-identical dictionaries and merge
    * tables.
    */
  private[graft] def bpeRoundsBatched(dict0: DataFrame, k: Int, m: Int,
      keepSingles: Boolean): (Seq[(Long, String, Long)], DataFrame, Int) = {
    require(m >= 1, s"batched BPE: wave size $m must be >= 1")
    require(k < 0xD800,
      s"batched BPE: k=$k sentinels would reach the UTF-16 surrogate range")
    var dict = materialized(dict0)
    var expansions = Map.empty[Char, String]
    val merges = Seq.newBuilder[(Long, String, Long)]
    var made = 0
    var waves = 0
    while (made < k) {
      val ranked = dict.filter(length(col("w")) >= 2)
        .select(col("wc"), explode(
          expr("transform(sequence(1, length(w) - 1), i -> substr(w, i, 2))"))
          .as("pair"))
        .groupBy("pair").agg(sum(col("wc")).as("cnt"))
        .orderBy(desc("cnt"), col("pair"))
        .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
      require(ranked.nonEmpty,
        s"BPE dictionary exhausted after $made of $k merges — the corpus " +
          "cannot support this many merges")
      // GRACEFUL wave shortfall (round-13 ADVICE): on a symbol-dense
      // pair distribution a wave may find FEWER than m disjoint pairs
      // — the known parallel-BPE starvation mode. Take the short wave
      // and continue: the top-ranked pair is always selectable, so a
      // starved wave degrades toward (and in the limit IS) the
      // sequential algorithm instead of aborting; wave count grows,
      // the learned vocabulary does not change its k-merge contract.
      val sel = bpeSelectWave(ranked, math.min(m, k - made))
      waves += 1
      // merge ranks + sentinel-free expansions use the PRE-wave map:
      // wave selections are counted on the before-dict, so they can
      // only contain earlier waves' sentinels, never this wave's
      sel.zipWithIndex.foreach { case ((p, c), j) =>
        merges += ((made + j + 1L,
          p.flatMap(ch => expansions.getOrElse(ch, ch.toString)), c))
      }
      // ONE chained replace-all fuses the whole wave; disjointness makes
      // the nesting order irrelevant (rank order kept, oracle-mirrored)
      val merged = dict.withColumn("w",
        sel.zipWithIndex.foldLeft(col("w")) { case (acc, ((p, _), j)) =>
          replace(acc, lit(p), lit((made + j + 1).toChar.toString))
        })
      sel.zipWithIndex.foreach { case ((p, _), j) =>
        expansions += ((made + j + 1).toChar ->
          p.flatMap(ch => expansions.getOrElse(ch, ch.toString)))
      }
      made += sel.size
      // lineage-truncating wave boundary — see [[bpeRounds]]'s note (at
      // m = 64 a single wave already nests 64 replaces; 8 cached waves
      // of those OOMed the driver's plan renderer at k = 512)
      val next = stageBoundary(
        if (keepSingles) merged else merged.filter(length(col("w")) >= 2))
      dict.unpersist()
      dict = next
    }
    (merges.result(), dict, waves)
  }

  /** Registered batched learner: the same k = 8 vocabulary as
    * [[bpeLearn]] learned in TWO waves of m = 4 symbol-disjoint merges
    * (vs 8 sequential rounds) — the wave-count ÷m relaxation a 32k-merge
    * production vocab needs. The oracle replays the batched semantics
    * exactly: per wave a ranked pair-count CTE, m nested min-rank
    * disjoint selections, one chained replace, and the shared
    * sentinel-expansion output.
    */
  def bpeLearnBatched(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (merges, dict, _) =
      bpeRoundsBatched(bpeDict(spark, dir), k = 8, m = 4, keepSingles = false)
    dict.unpersist()
    merges.toDF("merge_rank", "pair", "cnt").orderBy("merge_rank")
  }

  /** What the learned vocabulary buys: corpus-weighted symbol counts
    * before and after [[bpeLearn]]'s 8 merges (character tokenization vs
    * the merged segmentation — each word's symbol count is just its
    * sentinel-form length), plus the compression ratio. One extra
    * aggregate over the final dictionary; rounding is the
    * engine-independent half-up floor over a ratio of exact integers.
    */
  def bpeCompression(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def mass(d: DataFrame): Long =
      d.agg(sum(col("wc") * length(col("w"))).as("s")).head.getLong(0)
    val dict0 = materialized(bpeDict(spark, dir))
    val before = mass(dict0)
    val (_, dict) = bpeRounds(dict0, k = 8, keepSingles = true)
    val after = mass(dict)
    dict.unpersist()
    Seq((before, after,
      math.floor(before.toDouble / after * 1000000.0 + 0.5) / 1000000.0))
      .toDF("chars_before", "symbols_after", "compression")
  }

  /** The ENCODE half of the BPE loop, per-doc: learn the k-merge table on
    * `docs`, then count each document's tokens under that learned
    * vocabulary. The Sennrich trick carries over to encoding: the merge
    * replay runs over the DISTINCT word dictionary only (Heaps-law
    * sublinear in corpus bytes) with the ORIGINAL word `w0` threaded
    * through the chain, so a word's learned-vocab token count is just the
    * LENGTH of its final sentinel form. Corpus-size work is one
    * (doc, word) count aggregate plus one word-keyed join against that
    * per-word symbol table; single-character words never merge and are
    * not in the dictionary, so the join is `left` with length(w) as the
    * exact fallback. Emits (doc_id, n_ws_tokens, n_bpe_tokens); docs with
    * zero words emit nothing (consistent with the oracle's join chain).
    */
  private def bpeEncodedCounts(docs: DataFrame, k: Int = 8): DataFrame = {
    val words = docs
      .select(col("doc_id"), explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
    val docWords = words.groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("kc"))
    val dict0 = words
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("wc"))
      .withColumn("w0", col("w"))
    // keepSingles: a word fully merged to one symbol still needs its
    // n_sym = 1 row in the symbol table
    val (_, dict) = bpeRounds(dict0, k, keepSingles = true)
    val syms = dict
      .select(col("w0"), length(col("w")).cast("long").as("n_sym"))
    docWords
      .join(syms, docWords("w") === syms("w0"), "left")
      .withColumn("n_sym",
        coalesce(col("n_sym"), length(col("w")).cast("long")))
      .groupBy(col("doc_id"))
      .agg(sum(col("kc")).as("n_ws_tokens"),
        sum(col("kc") * col("n_sym")).as("n_bpe_tokens"))
  }

  /** Registered encode query over the fixture corpus: whitespace vs
    * LEARNED-vocabulary token counts per document — the artifact pair a
    * tokenizer pipeline ships ([[bpeLearn]] emits the merge table, this
    * applies it). Oracle: the [[bpeCompression]] k-round CTE chain with
    * the original word carried through, then the same left-join + sum.
    */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame =
    bpeEncodedCounts(graft.Tuning.spreadCompute(table(spark, dir, "documents")))
      .orderBy("doc_id")

  /** The whole pretraining data path as ONE hash-checked query: exact
    * dedup (min-id per text) -> quality gate (>= 0.3 on the 6-dp-rounded
    * composite score, so the boundary is engine-independent) -> token
    * counting -> deterministic training-order shuffle -> concat-and-chunk
    * packing at ctx=128 -> 64-sequence shard rollup. Every stage is an
    * oracle-proven fragment; this pins their COMPOSITION end-to-end —
    * the contract a production run actually exercises. Scale shape is
    * the union of the stages': the dedup stage is the HASH-KEYED twin
    * (Dedup.exactHashKeyed — exchanges carry an 8-byte hash, never text
    * bytes; identical survivors, so the plain-SQL oracle still applies),
    * then one cached (doc_id, n) projection, bucket-local rank + cumsum,
    * and map-side-combinable rollups.
    */
  def pipelinePretrain(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val survivors = Dedup.exactHashKeyed(docs)
    val kept = docs.join(survivors.select("doc_id"), "doc_id")
      .filter(TextFunctions.qualityScore(col("text")) >= 0.3)
    val toks = materialized(
      kept.select(col("doc_id"), TextFunctions.tokenCount(col("text")).as("n"))
        .filter(col("n") > 0))
    val ord = graft.operators.Packing.shuffleOrder(toks.select(col("doc_id")))
    shardRollup(graft.operators.Packing
      .packConcat(materialized(toks.join(ord, "doc_id")), PackCtx,
        nBuckets = 32, orderCol = "position"))
  }

  /** The FULL production pretraining path as ONE hash-checked query —
    * [[pipelinePretrain]] plus the two risk-bearing stages it omitted
    * (cross-split decontamination and the temperature mix) and with
    * packing driven by LEARNED-vocabulary token counts instead of
    * whitespace counts:
    *
    *   exact dedup (hash-keyed) -> quality gate (>= 0.3, 6-dp grain)
    *   -> decontamination (doc_id % 5 = 4 is the held-out benchmark
    *      split: its docs leave the training corpus, and any training
    *      doc sharing >= 5 df-capped 3-gram shingles with it is dropped
    *      — the `decontaminate` query's exact machinery)
    *   -> alpha = 0.7 temperature mix over the CLEAN corpus's language
    *      histogram ([[mixSelect]] — broadcast fractions, md5 Bernoulli
    *      draw, no per-language rank window)
    *   -> k = 8 BPE learned ON the mixed corpus ([[bpeEncodedCounts]] —
    *      the tokenizer a run would actually train) -> per-doc learned
    *      token counts -> deterministic shuffle -> ctx=128 concat
    *      packing -> 64-sequence shard rollup.
    *
    * Every stage is an oracle-proven fragment (dedup_exact_hashkeyed,
    * corpus_curate's gate, decontaminate, mix_execute, bpe_encode,
    * corpus_shuffle, pack_sequences_shuffled, pack_shard_manifest); this
    * query pins their COMPOSITION, which is what a production run
    * exercises. Scale shape: text reaches an exchange only inside
    * exactHashKeyed's bounded dup-verify and the shingle explosion
    * (3-word fragments, df-capped); the mix is a broadcast-join filter;
    * the curated corpus is cache-materialized ONCE at the stage boundary
    * (production writes it to parquet there — the catalog's writeTable
    * path — and everything downstream reads the 16-byte (id, n)
    * projection); BPE's driver state is one argmax row per round.
    */
  /** Shared curation front half of the composed pipelines: exact
    * hash-keyed dedup -> quality gate -> df-capped cross-split shingle
    * decontamination of the %5 = 4 held-out split. ONE definition for
    * [[pipelinePretrainFull]] and [[pipelinePretrainBudget]], mirrored
    * by `cleanCtesSql` on the oracle side, so the curation semantics
    * cannot drift between the composed forms. Returns the clean
    * training corpus (doc_id, lang, text) behind a [[stageBoundary]]:
    * this is the parquet handoff point of a production run (the catalog
    * writeTable path), and the boundary both truncates the dedup ->
    * decontam lineage for every downstream plan and stops the curation
    * subtree re-executing once per consumer (the mixture stage and the
    * token projection each read `clean`).
    */
  private def curatedClean(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val survivors = Dedup.exactHashKeyed(docs).select("doc_id")
    val kept = docs.join(survivors, "doc_id")
      .filter(TextFunctions.qualityScore(col("text")) >= 0.3)
      .select(col("doc_id"), col("lang"), col("text"))
    // decontamination over the kept set: df cap computed on ITS index
    val sh = Dedup.dfCappedShingleIndex(
      kept.select(col("doc_id"),
        explode(Dedup.wordShingles(col("text"), 3)).as("shingle")), 1000)
    val te = sh.filter(pmod(col("doc_id"), lit(5)) === 4)
      .select(col("doc_id").as("test_id"), col("shingle"))
    val contaminated = sh.filter(pmod(col("doc_id"), lit(5)) =!= 4)
      .join(te, "shingle")
      .groupBy(col("doc_id"), col("test_id"))
      .agg(count(lit(1)).as("common"))
      .filter(col("common") >= 5)
      .select("doc_id").distinct()
    // NOT spread: a checkpoint is a LogicalRDD, whose partition layout
    // AQE cannot coalesce — a 32-way handoff taxes every CHEAP consumer
    // (pipeline_pretrain A/B: +0.7 s). The one compute-bound consumer
    // (pretrain_full's BPE chain) spreads its own corpus boundary.
    stageBoundary(
      kept.filter(pmod(col("doc_id"), lit(5)) =!= 4)
        .join(contaminated, Seq("doc_id"), "left_anti"))
  }

  def pipelinePretrainFull(spark: SparkSession, dir: String): DataFrame = {
    val clean = curatedClean(spark, dir)
    // temperature mix, then ONE stage-boundary materialization of the
    // curated corpus (the parquet handoff of a production run) — lineage
    // MUST truncate here: the k-round BPE chain stacks on this plan, and
    // without truncation the composed plan's string rendering alone OOMs
    // the driver (see stageBoundary)
    val corpus = stageBoundary(graft.Tuning.spreadCompute(
      mixSelect(clean).select(col("doc_id"), col("text"))))
    val toks = stageBoundary(
      bpeEncodedCounts(corpus)
        .select(col("doc_id"), col("n_bpe_tokens").as("n"))
        .filter(col("n") > 0))
    val ord = graft.operators.Packing.shuffleOrder(toks.select(col("doc_id")))
    shardRollup(graft.operators.Packing
      .packConcat(materialized(toks.join(ord, "doc_id")), PackCtx,
        nBuckets = 32, orderCol = "position"))
  }

  /** The BUDGETED composition (round 12, VERDICT ask #4): the same
    * curated front half as [[pipelinePretrainFull]], but the mixture
    * stage is the form a training run with a FIXED TOKEN BUDGET
    * executes — [[mixTokenBudget]]'s exact-greedy selection fused with
    * [[mixUpsample]]'s repeat-factor epochs:
    *
    *  - budgets are computed on the CLEAN corpus's token mass (alpha =
    *    0.7 tempered shares of the total, so the budget equals the
    *    corpus size re-balanced toward tail languages);
    *  - a language whose budget exceeds its mass takes FLOOR(B/T) full
    *    epochs plus a greedy prefix of the fractional epoch (copies
    *    stream in the same deterministic (xxhash64(doc_id), doc_id)
    *    order every epoch, cut where the running total crosses B mod T)
    *    — on the fixture the four tail languages land at r = 1.12-1.17
    *    (one full epoch + a partial second), en at r = 0.82 (prefix
    *    only), so BOTH sides of the repeat factor are exercised;
    *  - upsampled copies flow into packing as DISTINCT sequence rows:
    *    the training order is a dense rank over the chained
    *    xxhash64(doc_id, copy), so a document's epochs scatter across
    *    the stream instead of packing back-to-back.
    *
    * Scale shape: the per-language running total is the keyed two-level
    * prefix sum ([[graft.operators.Packing.withKeyedOffsets]] — a
    * 99%-dominant language never serializes through one task); budgets
    * join back as a broadcast; the copy fan-out is a bounded `sequence`
    * explode over (doc_id, n) rows (text never enters the plan past the
    * curation stage); the shuffle rank and pack tail are the standard
    * bucket-local machinery. Packing uses whitespace token counts — the
    * learned-vocabulary packing interaction is [[pipelinePretrainFull]]'s
    * pin; this query pins the budget/epoch mixing, keeping the two
    * orthogonal stages separately attributable (and the DuckDB replay
    * free of a second k-round BPE chain).
    */
  def pipelinePretrainBudget(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = materialized(
      curatedClean(spark, dir)
        .select(col("doc_id"), col("lang"),
          TextFunctions.tokenCount(col("text")).as("n"))
        .filter(col("n") > 0))
    val w = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val mass = toks.groupBy(col("lang")).agg(sum(col("n")).as("t"))
    val budgets = mass
      .crossJoin(broadcast(mass.agg(sum(col("t")).as("total"))))
      .select(col("lang"), col("t"),
        pow(col("t") / col("total"), lit(0.7)).as("wgt"), col("total"))
      .select(col("lang"), col("t"),
        round(col("wgt") / sum(col("wgt")).over(w) * col("total"), 0)
          .cast("long").as("budget"))
    val ranked = graft.operators.Packing.withKeyedOffsets(
      toks.withColumn("_pb_h", xxhash64(col("doc_id"))),
      Seq("lang"), Seq("_pb_h", "doc_id"), "n",
      shiftright(col("_pb_h"), 56), "off")
    val copies = ranked.join(broadcast(budgets), "lang")
      .withColumn("n_copies",
        expr("budget DIV t") +
          when(col("off") + col("n") <= col("budget") % col("t"), 1L)
            .otherwise(0L))
      // filter BEFORE the explode: sequence(1, 0) DESCENDS in Spark
      // (emits [1, 0]) while DuckDB's generate_series(1, 0) is empty
      .filter(col("n_copies") >= 1)
      .select(col("doc_id"), col("n"),
        explode(sequence(lit(1L), col("n_copies"))).as("copy"))
    val pos = graft.operators.Packing.withOffsets(
      copies.withColumn("_po_h", xxhash64(col("doc_id"), col("copy")))
        .withColumn("_po_one", lit(1L)),
      Seq("_po_h", "doc_id", "copy"), "_po_one",
      shiftright(col("_po_h"), 56), "position")
      .select(col("doc_id"), col("n"), col("position"))
    shardRollup(graft.operators.Packing
      .packConcat(materialized(pos), PackCtx, nBuckets = 32,
        orderCol = "position"))
  }

  /** ONE definition of the 64-sequence shard rollup, shared by the
    * standalone manifest and the composed pipeline so shard size and
    * rollup columns cannot drift between them.
    */
  private def shardRollup(segs: DataFrame,
      extras: org.apache.spark.sql.Column*): DataFrame = {
    val base = Seq(
      countDistinct(col("seq_id")).as("n_seqs"),
      countDistinct(col("doc_id")).as("n_docs"),
      sum(col("seg_tokens")).as("n_tokens")) ++ extras
    segs.groupBy(expr("seq_id DIV 64").as("shard_id"))
      .agg(base.head, base.tail: _*)
      .orderBy("shard_id")
  }

  /** WebDataset-style shard plan over the packed sequences: assign 64
    * consecutive training sequences per output shard and roll up what a
    * shard writer needs (sequence span, document reach, token payload).
    * Pure arithmetic over [[packSequences]]' output — one extra
    * map-side-combinable aggregate.
    */
  def packShardManifest(spark: SparkSession, dir: String): DataFrame =
    shardRollup(packSequences(spark, dir),
      min(col("seq_id")).as("seq_from"),
      max(col("seq_id")).as("seq_to"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_pretrain" -> (pipelinePretrain _),
    "pipeline_pretrain_full" -> (pipelinePretrainFull _),
    "pipeline_pretrain_budget" -> (pipelinePretrainBudget _),
    "bpe_encode" -> (bpeEncode _),
    "mix_execute" -> (mixExecute _),
    "mix_token_budget" -> (mixTokenBudget _),
    "mix_upsample" -> (mixUpsample _),
    "curriculum_order" -> (curriculumOrder _),
    "bpe_learn" -> (bpeLearn _),
    "bpe_learn_batched" -> (bpeLearnBatched _),
    "bpe_compression" -> (bpeCompression _),
    "bpe_merge_round2" -> (bpeMergeRound2 _),
    "pack_shard_manifest" -> (packShardManifest _),
    "bpe_merge_pairs" -> (bpeMergePairs _),
    "pack_sequences" -> (packSequences _),
    "pack_sequences_shuffled" -> (packSequencesShuffled _),
    "pack_sequences_curriculum" -> (packSequencesCurriculum _),
    "pack_stats" -> (packStats _),
    "corpus_shuffle" -> (corpusShuffle _),
    "naive_bayes_lang" -> (naiveBayesLang _),
    "array_functions" -> (arrayFunctions _),
    "mix_temperature" -> (mixTemperature _),
    "er_sorted_neighborhood" -> (erSortedNeighborhood _),
    "er_snm_multikey" -> (erSnmMultikey _),
    "doc_chunk" -> (docChunk _),
    "text_perplexity" -> (textPerplexity _),
    "quality_deciles" -> (qualityDeciles _),
    "quality_deciles_approx" -> (qualityDecilesApprox _),
    "sample_reservoir" -> (sampleReservoir _),
    "fuzzy_match" -> (fuzzyMatch _),
    "heavy_hitters" -> (heavyHitters _),
    "heavy_hitters_weighted" -> (heavyHittersWeighted _),
    "pii_redact" -> (piiRedact _),
    "quality_gopher" -> (qualityGopher _),
    "domain_quota" -> (domainQuota _),
    "tfidf_top_terms" -> (tfidfTopTerms _),
    "text_stats" -> (textStats _),
    "text_repetition" -> (textRepetition _),
    "text_bpe_tokens" -> (textBpeTokens _),
    "corpus_curate" -> (corpusCurate _),
    "text_langid" -> (textLangid _),
    "text_fingerprint" -> (textFingerprint _),
    "text_rolling_hash" -> (textRollingHash _),
    "lang_source_agg" -> (langSourceAgg _)
  )

  private[queries] val tokCount =
    "CASE WHEN length(trim(text)) = 0 THEN 0 " +
      "ELSE CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) END"

  private def langHits(markers: Seq[String]): String =
    "len(list_filter(string_split_regex(lower(text), '\\s+'), " +
      s"t -> list_contains([${markers.map(m => s"'$m'").mkString(", ")}], t)))"

  private val langCase: String = {
    val hits = TextFunctions.LangMarkers.map { case (l, ms) => l -> langHits(ms) }
    val maxExpr = s"GREATEST(${hits.map(_._2).mkString(", ")})"
    "CASE WHEN " + maxExpr + " = 0 THEN 'und' " +
      hits.map { case (l, h) => s"WHEN $h = $maxExpr THEN '$l'" }.mkString(" ") +
      " END"
  }

  // FLOOR(x*1e6 + 0.5)/1e6 mirrors TextFunctions.round6 — see its
  // scaladoc for why round() cannot be used cross-engine
  private[queries] val qualityExpr =
    "FLOOR(((CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) " +
      "/ GREATEST(length(text), 1)) * " +
      s"LEAST(1.0, CAST($tokCount AS DOUBLE) / 20.0)) * 1000000 + 0.5) / 1000000"

  private val saltedExpr =
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com from 10.' || " +
      "CAST(doc_id % 200 AS VARCHAR) || '.0.' || CAST(doc_id % 250 AS VARCHAR) || " +
      "' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"

  private val symbolRatioExpr =
    "FLOOR(CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) " +
      "/ GREATEST(length(text), 1) * 1000000 + 0.5) / 1000000"

  private val avgWordLenExpr =
    "FLOOR(CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) " +
      s"/ GREATEST($tokCount, 1) * 1000000 + 0.5) / 1000000"

  // shared packing-oracle front half: token counts, zero-token docs
  // dropped, exclusive prefix sum over doc_id order (the oracle can
  // afford DuckDB's single-threaded global window; the operator can't at
  // scale — partition-independence of the prefix sum is what makes the
  // two comparable)
  private val packOffsetsSql =
    s"WITH d AS (SELECT doc_id, $tokCount AS n FROM documents), " +
      "nz AS (SELECT doc_id, n FROM d WHERE n > 0), " +
      "p AS (SELECT doc_id, n, CAST(SUM(n) OVER (ORDER BY doc_id " +
      "ROWS UNBOUNDED PRECEDING) - n AS BIGINT) AS off FROM nz)"

  // shared back half: window-index fan-out + span arithmetic over a CTE
  // `p(doc_id, n, off)`; the final ORDER BY is the only per-query piece
  private def packSegmentsSql(orderBy: String): String =
    ", seg AS (SELECT doc_id, n, off, " +
      s"CAST(unnest(generate_series(off // $PackCtx, " +
      s"(off + n - 1) // $PackCtx)) AS BIGINT) AS seq_id FROM p) " +
      "SELECT seq_id, doc_id, " +
      s"CAST(GREATEST(off, seq_id * $PackCtx) - off AS BIGINT) AS tok_from, " +
      s"CAST(LEAST(off + n, (seq_id + 1) * $PackCtx) - off AS BIGINT) AS tok_to, " +
      s"CAST(GREATEST(off, seq_id * $PackCtx) - seq_id * $PackCtx AS BIGINT) AS seq_off, " +
      s"CAST(LEAST(off + n, (seq_id + 1) * $PackCtx) - " +
      s"GREATEST(off, seq_id * $PackCtx) AS BIGINT) AS seg_tokens " +
      s"FROM seg ORDER BY $orderBy"

  /** ONE rendering of the word-dictionary CTE (the SQL twin of
    * [[bpeDict]]) with the CTE name as a slot — every BPE oracle builds
    * on it, so the tokenization cannot drift between them.
    */
  private def bpeDictCte(name: String): String =
    s"$name AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS wc FROM " +
      "(SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w " +
      "FROM documents) WHERE length(w) >= 2 GROUP BY w)"

  // shared word-dictionary + round-1 pair-count CTEs for the BPE oracles
  private val bpeDictSql =
    bpeDictCte("w") + ", " +
      "p1 AS (SELECT substr(w, CAST(i AS INT), 2) AS pair, " +
      "CAST(SUM(wc) AS BIGINT) AS cnt FROM " +
      "(SELECT w, wc, unnest(generate_series(1, length(w) - 1)) AS i FROM w) " +
      "GROUP BY pair)"

  /** Scala-folded CTE chain replaying all k rounds of [[bpeLearn]]:
    * per round a pair count over the previous dictionary, a
    * scalar-subquery argmax, an expansion CTE (nested replaces of every
    * earlier sentinel — expansions are sentinel-free by induction, so
    * replacement order is irrelevant), and the merged dictionary.
    */
  private val bpeLearnOracle: String = {
    val k = 8
    def pairsSql(src: String, p: String) =
      s"$p AS (SELECT substr(w, CAST(i AS INT), 2) AS pair, " +
        "CAST(SUM(wc) AS BIGINT) AS cnt FROM " +
        s"(SELECT w, wc, unnest(generate_series(1, length(w) - 1)) AS i " +
        s"FROM $src) GROUP BY pair)"
    val ctes = new StringBuilder
    ctes ++= bpeDictCte("w0")
    for (i <- 1 to k) {
      ctes ++= ", " + pairsSql(s"w${i - 1}", s"p$i")
      // AS MATERIALIZED on every multiply-referenced round CTE: DuckDB's
      // inlining heuristic can re-evaluate an inlined CTE once per
      // reference, and with each round referencing the previous one
      // twice that compounds EXPONENTIALLY in k (measured ~4.8x per
      // round on the composed-pipeline variant — k=8 would be hours)
      ctes ++= s", t$i AS MATERIALIZED (SELECT pair, cnt FROM p$i " +
        "ORDER BY cnt DESC, pair LIMIT 1)"
      val expand = (1 until i).foldLeft("pair") { (acc, j) =>
        s"replace($acc, chr($j), (SELECT e FROM e$j))"
      }
      ctes ++= s", e$i AS MATERIALIZED (SELECT $expand AS e FROM t$i)"
      ctes ++= s", w$i AS MATERIALIZED (SELECT w, wc FROM (SELECT " +
        s"replace(w, (SELECT pair FROM t$i), chr($i)) AS w, wc " +
        s"FROM w${i - 1}) WHERE length(w) >= 2)"
    }
    val rows = (1 to k).map { i =>
      s"SELECT CAST($i AS BIGINT) AS merge_rank, " +
        s"(SELECT e FROM e$i) AS pair, (SELECT cnt FROM t$i) AS cnt"
    }.mkString(" UNION ALL ")
    s"WITH $ctes $rows ORDER BY merge_rank"
  }

  /** [[bpeLearnBatched]]'s replay — the batched selection itself, not a
    * sequential stand-in: per wave a ranked pair-count CTE (ROW_NUMBER
    * over (cnt DESC, pair)), then m nested MIN-rank selections each
    * constrained to share no character with any earlier selection in
    * the wave (`contains` on both chars of each already-picked pair —
    * the greedy walk of [[bpeSelectWave]] expressed as rank floors),
    * one chained replace-all merging the whole wave, and the shared
    * sentinel-expansion output rows. MATERIALIZED on every
    * multiply-referenced CTE per the measured exponential-inlining
    * lesson.
    */
  private val bpeLearnBatchedOracle: String = {
    val k = 8; val m = 4
    def disjointFrom(sw: String) =
      s"NOT (contains(pair, substr((SELECT pair FROM $sw), 1, 1)) " +
        s"OR contains(pair, substr((SELECT pair FROM $sw), 2, 1)))"
    val ctes = new StringBuilder
    ctes ++= bpeDictCte("d0")
    for (w <- 1 to k / m) {
      val made = (w - 1) * m
      ctes ++= s", q$w AS (SELECT substr(w, CAST(i AS INT), 2) AS pair, " +
        "CAST(SUM(wc) AS BIGINT) AS cnt FROM " +
        "(SELECT w, wc, unnest(generate_series(1, length(w) - 1)) AS i " +
        s"FROM d${w - 1} WHERE length(w) >= 2) GROUP BY pair)"
      ctes ++= s", c$w AS MATERIALIZED (SELECT pair, cnt, " +
        s"ROW_NUMBER() OVER (ORDER BY cnt DESC, pair) AS r FROM q$w)"
      for (j <- 1 to m) {
        val rFloor = if (j == 1) "0" else s"(SELECT r FROM s${w}_${j - 1})"
        val disj = (1 until j).map(x => " AND " + disjointFrom(s"s${w}_$x"))
          .mkString
        ctes ++= s", s${w}_$j AS MATERIALIZED (SELECT pair, cnt, r " +
          s"FROM c$w WHERE r = " +
          s"(SELECT MIN(r) FROM c$w WHERE r > $rFloor$disj))"
      }
      val mergedW = (1 to m).foldLeft("w") { (acc, j) =>
        s"replace($acc, (SELECT pair FROM s${w}_$j), chr(${made + j}))"
      }
      ctes ++= s", d$w AS MATERIALIZED (SELECT w, wc FROM " +
        s"(SELECT $mergedW AS w, wc FROM d${w - 1}) WHERE length(w) >= 2)"
      for (j <- 1 to m) {
        val i = made + j
        val expand = (1 to made).foldLeft("pair") { (acc, x) =>
          s"replace($acc, chr($x), (SELECT e FROM e$x))"
        }
        ctes ++= s", e$i AS MATERIALIZED " +
          s"(SELECT $expand AS e, cnt FROM s${w}_$j)"
      }
    }
    val rows = (1 to k).map { i =>
      s"SELECT CAST($i AS BIGINT) AS merge_rank, " +
        s"(SELECT e FROM e$i) AS pair, (SELECT cnt FROM e$i) AS cnt"
    }.mkString(" UNION ALL ")
    s"WITH $ctes $rows ORDER BY merge_rank"
  }

  /** [[bpeCompression]]'s replay: the same k-round chain, but the merged
    * dictionaries keep single-symbol words (mass conservation) and only
    * the pair-counting CTEs filter them out.
    */
  private val bpeCompressionOracle: String = {
    val k = 8
    val ctes = new StringBuilder
    ctes ++= bpeDictCte("m0")
    for (i <- 1 to k) {
      ctes ++= s", f$i AS (SELECT w, wc FROM m${i - 1} WHERE length(w) >= 2)"
      ctes ++= s", p$i AS (SELECT substr(w, CAST(i AS INT), 2) AS pair, " +
        "CAST(SUM(wc) AS BIGINT) AS cnt FROM " +
        "(SELECT w, wc, unnest(generate_series(1, length(w) - 1)) AS i " +
        s"FROM f$i) GROUP BY pair)"
      // MATERIALIZED: each m$i is referenced twice (f$(i+1) and m$(i+1));
      // inlined, the re-evaluation compounds exponentially in k
      ctes ++= s", t$i AS MATERIALIZED " +
        s"(SELECT pair FROM p$i ORDER BY cnt DESC, pair LIMIT 1)"
      ctes ++= s", m$i AS MATERIALIZED (SELECT replace(w, " +
        s"(SELECT pair FROM t$i), chr($i)) AS w, wc FROM m${i - 1})"
    }
    val mass = (t: String) => s"(SELECT SUM(wc * length(w)) FROM $t)"
    s"WITH $ctes SELECT " +
      s"CAST(${mass("m0")} AS BIGINT) AS chars_before, " +
      s"CAST(${mass(s"m$k")} AS BIGINT) AS symbols_after, " +
      s"FLOOR(CAST(${mass("m0")} AS DOUBLE) / " +
      s"CAST(${mass(s"m$k")} AS DOUBLE) * 1000000 + 0.5) / 1000000 " +
      "AS compression"
  }

  /** CTE chain replaying [[bpeEncodedCounts]]' learn half over an
    * arbitrary source CTE/table `src`: the [[bpeCompressionOracle]]
    * k-round shape (pair counts over the length>=2 slice, scalar-subquery
    * argmax, replace-all merge) with the ORIGINAL word `w0` carried
    * through, ending in `syms(w0, n_sym)`. One rendering feeds both the
    * standalone bpe_encode oracle and the composed pipeline's.
    */
  private def bpeEncodeChainSql(src: String, k: Int): String = {
    val ctes = new StringBuilder
    ctes ++= "bd AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS wc FROM " +
      "(SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w " +
      s"FROM $src) WHERE length(w) >= 2 GROUP BY w), " +
      "m0 AS MATERIALIZED (SELECT w AS w0, w, wc FROM bd)"
    for (i <- 1 to k) {
      // MATERIALIZED on each round's m$i (referenced by f$(i+1) AND
      // m$(i+1)): DuckDB's CTE-inlining heuristic re-evaluates an inlined
      // CTE per reference, compounding ~4.8x per round when `src` is
      // itself a non-trivial CTE (the composed pipeline's mixed corpus) —
      // measured m5 at 422 s and m8 extrapolates to HOURS, vs seconds
      // materialized
      ctes ++= s", f$i AS (SELECT w, wc FROM m${i - 1} WHERE length(w) >= 2)"
      ctes ++= s", p$i AS (SELECT substr(w, CAST(i AS INT), 2) AS pair, " +
        "CAST(SUM(wc) AS BIGINT) AS cnt FROM " +
        "(SELECT w, wc, unnest(generate_series(1, length(w) - 1)) AS i " +
        s"FROM f$i) GROUP BY pair)"
      ctes ++= s", t$i AS MATERIALIZED " +
        s"(SELECT pair FROM p$i ORDER BY cnt DESC, pair LIMIT 1)"
      ctes ++= s", m$i AS MATERIALIZED (SELECT w0, replace(w, " +
        s"(SELECT pair FROM t$i), chr($i)) AS w, wc FROM m${i - 1})"
    }
    ctes ++= s", syms AS (SELECT w0, CAST(length(w) AS BIGINT) AS n_sym " +
      s"FROM m$k)"
    ctes.result()
  }

  /** [[bpeEncode]]'s replay: the encode chain + the per-(doc, word)
    * count join. COALESCE(n_sym, length(w)) is the single-character-word
    * fallback (never in the dictionary, never merged).
    */
  private val bpeEncodeOracle: String =
    s"WITH ${bpeEncodeChainSql("documents", 8)}, " +
      "dw AS (SELECT doc_id, w, COUNT(*) AS kc FROM " +
      "(SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS w " +
      "FROM documents) WHERE length(w) > 0 GROUP BY doc_id, w) " +
      "SELECT doc_id, CAST(SUM(kc) AS BIGINT) AS n_ws_tokens, " +
      "CAST(SUM(kc * COALESCE(n_sym, length(w))) AS BIGINT) AS n_bpe_tokens " +
      "FROM dw LEFT JOIN syms ON dw.w = syms.w0 " +
      "GROUP BY doc_id ORDER BY doc_id"

  /** [[pipelinePretrainFull]]'s replay, every fragment identical to its
    * standalone oracle: dedup + quality (corpus_curate's CTEs), the
    * df-capped cross-split shingle overlap (decontaminate's), the
    * tempered Bernoulli mix (mix_execute's), the k-round encode chain
    * over the mixed corpus (bpe_encode's), then the xxhash64 shuffle
    * rank, cumsum, and shard rollup (pipeline_pretrain's tail).
    */
  /** Oracle twin of [[curatedClean]]: dedup + quality + df-capped
    * cross-split decontamination CTEs ending in `clean(doc_id, lang,
    * text)` — shared by the full and budgeted composed-pipeline
    * replays. */
  private val cleanCtesSql: String =
    "surv AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text), " +
      "kept AS MATERIALIZED (SELECT d.doc_id, d.lang, d.text FROM documents d JOIN surv " +
      s"USING (doc_id) WHERE $qualityExpr >= 0.3), " +
      // decontaminate's shingle/df-cap shape, over the kept set
      "ktoks AS (SELECT doc_id, string_split(text, ' ') AS w FROM kept), " +
      "ksh AS (SELECT doc_id, unnest(CASE WHEN len(w) < 3 THEN []::VARCHAR[] " +
      "ELSE list_distinct(list_transform(generate_series(1, len(w) - 2), " +
      "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) END) AS shingle FROM ktoks), " +
      "rare AS (SELECT shingle FROM ksh GROUP BY shingle HAVING COUNT(*) <= 1000), " +
      "shf AS MATERIALIZED (SELECT ksh.doc_id, ksh.shingle FROM ksh JOIN rare USING (shingle)), " +
      "cont AS (SELECT DISTINCT doc_id FROM (" +
      "SELECT tr.doc_id, te.doc_id AS test_id, COUNT(*) AS c " +
      "FROM (SELECT doc_id, shingle FROM shf WHERE doc_id % 5 <> 4) tr " +
      "JOIN (SELECT doc_id, shingle FROM shf WHERE doc_id % 5 = 4) te " +
      "USING (shingle) GROUP BY 1, 2 HAVING COUNT(*) >= 5)), " +
      "clean AS MATERIALIZED (SELECT k.doc_id, k.lang, k.text FROM kept k " +
      "WHERE k.doc_id % 5 <> 4 " +
      "AND k.doc_id NOT IN (SELECT doc_id FROM cont))"

  private val pipelinePretrainFullOracle: String =
    s"WITH $cleanCtesSql, " +
      // mix_execute's tempered Bernoulli selection, over clean
      "mixc AS (SELECT lang, COUNT(*) AS n FROM clean GROUP BY 1), " +
      "mixt AS (SELECT SUM(n) AS total FROM mixc), " +
      "mixw AS (SELECT lang, n, POW(n / mixt.total, 0.7) AS wgt " +
      "FROM mixc CROSS JOIN mixt), " +
      "mixp AS (SELECT lang, n, CAST(ROUND(wgt / SUM(wgt) OVER () * " +
      "(SELECT total FROM mixt), 0) AS BIGINT) AS target_docs FROM mixw), " +
      "mixf AS (SELECT lang, " +
      "LEAST(1.0, CAST(target_docs AS DOUBLE) / n) AS f FROM mixp), " +
      "corpus AS MATERIALIZED (SELECT c.doc_id, c.text FROM (SELECT *, " +
      "CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) " +
      "AS INTEGER) AS DOUBLE) / 16777216.0 AS u FROM clean) c " +
      "JOIN mixf USING (lang) WHERE c.u < mixf.f), " +
      // bpe_encode's chain + count join, over the mixed corpus
      bpeEncodeChainSql("corpus", 8) + ", " +
      "dw AS (SELECT doc_id, w, COUNT(*) AS kc FROM " +
      "(SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS w " +
      "FROM corpus) WHERE length(w) > 0 GROUP BY doc_id, w), " +
      "enc AS (SELECT doc_id, " +
      "CAST(SUM(kc * COALESCE(n_sym, length(w))) AS BIGINT) AS n " +
      "FROM dw LEFT JOIN syms ON dw.w = syms.w0 GROUP BY doc_id), " +
      "nz AS (SELECT doc_id, n FROM enc WHERE n > 0), " +
      // pipeline_pretrain's shuffle-rank + cumsum + shard tail
      "pos AS (SELECT doc_id, n, " +
      "CAST(ROW_NUMBER() OVER (ORDER BY xxh, doc_id) - 1 AS BIGINT) " +
      "AS position FROM (" +
      DataQueries.xxhash64LongSql("SELECT doc_id, n FROM nz", "doc_id") +
      ")), " +
      "p AS (SELECT doc_id, n, CAST(SUM(n) OVER (ORDER BY position " +
      "ROWS UNBOUNDED PRECEDING) - n AS BIGINT) AS off FROM pos)" +
      shardRollupSql("")

  /** SQL twin of [[shardRollup]]: window fan-out + 64-sequence rollup
    * over a CTE `p(doc_id, n, off)`; `extra` appends manifest-only
    * columns. One rendering feeds both shard oracles.
    */
  private def shardRollupSql(extra: String): String =
    ", seg AS (SELECT doc_id, off, n, " +
      s"CAST(unnest(generate_series(off // $PackCtx, " +
      s"(off + n - 1) // $PackCtx)) AS BIGINT) AS seq_id FROM p) " +
      "SELECT CAST(seq_id // 64 AS BIGINT) AS shard_id, " +
      "CAST(COUNT(DISTINCT seq_id) AS BIGINT) AS n_seqs, " +
      "CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs, " +
      s"CAST(SUM(LEAST(off + n, (seq_id + 1) * $PackCtx) - " +
      s"GREATEST(off, seq_id * $PackCtx)) AS BIGINT) AS n_tokens$extra " +
      "FROM seg GROUP BY 1 ORDER BY shard_id"

  /** [[pipelinePretrain]]'s replay: dedup + quality CTEs feed the
    * xxhash64 rank layers, the position cumsum, the window fan-out, and
    * the shard rollup — each fragment identical to its standalone
    * oracle.
    */
  private val pipelinePretrainOracle: String =
    "WITH surv AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text), " +
      "kept AS (SELECT d.doc_id, d.text FROM documents d JOIN surv " +
      s"USING (doc_id) WHERE $qualityExpr >= 0.3), " +
      s"nz AS (SELECT doc_id, n FROM (SELECT doc_id, $tokCount AS n " +
      "FROM kept) WHERE n > 0), " +
      "pos AS (SELECT doc_id, n, " +
      "CAST(ROW_NUMBER() OVER (ORDER BY xxh, doc_id) - 1 AS BIGINT) " +
      "AS position FROM (" +
      DataQueries.xxhash64LongSql("SELECT doc_id, n FROM nz", "doc_id") +
      ")), " +
      "p AS (SELECT doc_id, n, CAST(SUM(n) OVER (ORDER BY position " +
      "ROWS UNBOUNDED PRECEDING) - n AS BIGINT) AS off FROM pos)" +
      shardRollupSql("")

  /** [[pipelinePretrainBudget]]'s replay: the shared clean CTEs, the
    * mix_token_budget budget/rank shapes with tgt = total, the
    * repeat-factor copy fan-out (generate_series(1, 0) is empty = the
    * Spark side's n_copies >= 1 filter), the chained two-arg xxhash64
    * shuffle rank over (doc_id, copy), and the cumsum + shard tail.
    */
  private val pipelinePretrainBudgetOracle: String =
    s"WITH $cleanCtesSql, " +
      s"nz AS MATERIALIZED (SELECT * FROM (SELECT doc_id, lang, $tokCount AS n " +
      "FROM clean) WHERE n > 0), " +
      "mass AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS t FROM nz GROUP BY 1), " +
      "tot AS (SELECT CAST(SUM(t) AS BIGINT) AS total FROM mass), " +
      "bud AS (SELECT lang, t, CAST(ROUND(POW(t / total, 0.7) / " +
      "SUM(POW(t / total, 0.7)) OVER () * total, 0) AS BIGINT) AS budget " +
      "FROM mass CROSS JOIN tot), " +
      "r AS (SELECT doc_id, lang, n, SUM(n) OVER (PARTITION BY lang " +
      "ORDER BY xxh, doc_id ROWS UNBOUNDED PRECEDING) - n AS off FROM (" +
      DataQueries.xxhash64LongSql("SELECT doc_id, lang, n FROM nz", "doc_id") +
      ")), " +
      "cp AS (SELECT doc_id, n, (budget // t) + CASE WHEN off + n <= " +
      "budget % t THEN 1 ELSE 0 END AS n_copies FROM r JOIN bud USING (lang)), " +
      "ex AS (SELECT doc_id, n, " +
      "CAST(unnest(generate_series(1, n_copies)) AS BIGINT) AS copy FROM cp), " +
      "h2 AS (" + DataQueries.xxhash64Long2Sql(
        "SELECT doc_id, n, copy FROM ex",
        Seq("doc_id", "n", "copy"), "doc_id", "copy") + "), " +
      "pos AS (SELECT doc_id, n, CAST(ROW_NUMBER() OVER (ORDER BY xxh, " +
      "doc_id, copy) - 1 AS BIGINT) AS position FROM h2), " +
      "p AS (SELECT doc_id, n, CAST(SUM(n) OVER (ORDER BY position " +
      "ROWS UNBOUNDED PRECEDING) - n AS BIGINT) AS off FROM pos)" +
      shardRollupSql("")

  val oracleSql: Map[String, String] = Map(
    "pipeline_pretrain" -> pipelinePretrainOracle,
    "pipeline_pretrain_full" -> pipelinePretrainFullOracle,
    "pipeline_pretrain_budget" -> pipelinePretrainBudgetOracle,
    "bpe_encode" -> bpeEncodeOracle,
    // repeat-factor replay: same tempered targets, FLOOR(r) base copies +
    // one Bernoulli extra on the md5 unit draw; generate_series(1, 0) is
    // empty in DuckDB = the Spark side's n_copies >= 1 filter
    "mix_upsample" ->
      ("WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1), " +
        "t AS (SELECT SUM(n) AS total FROM c), " +
        "w AS (SELECT lang, n, POW(n / t.total, 0.7) AS wgt " +
        "FROM c CROSS JOIN t), " +
        "p AS (SELECT lang, n, CAST(ROUND(wgt / SUM(wgt) OVER () * " +
        "(SELECT total FROM t), 0) AS BIGINT) AS target FROM w), " +
        "f AS (SELECT lang, CAST(target AS DOUBLE) / n AS r FROM p), " +
        "d AS (SELECT doc_id, d0.lang, CAST(FLOOR(r) AS BIGINT) + " +
        "CASE WHEN d0.u < r - FLOOR(r) THEN 1 ELSE 0 END AS n_copies " +
        "FROM (SELECT doc_id, lang, CAST(CAST('0x' || " +
        "substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS INTEGER) AS DOUBLE) " +
        "/ 16777216.0 AS u FROM documents) d0 JOIN f USING (lang)), " +
        "e AS (SELECT doc_id, lang, " +
        "CAST(unnest(generate_series(1, n_copies)) AS BIGINT) AS copy " +
        "FROM d), " +
        // the (doc_id, copy) multiset fold: Spark's chained two-arg
        // xxhash64 through the HUGEINT expansion
        "e2 AS (" + DataQueries.xxhash64Long2Sql(
          "SELECT doc_id, lang, copy FROM e",
          Seq("doc_id", "lang", "copy"), "doc_id", "copy") + ") " +
        "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        "CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs, " +
        "bit_xor(xxh) AS rep_xor FROM e2 " +
        "GROUP BY 1 ORDER BY 1"),
    // curriculum replay: same 6-dp quality bands, same (band, xxhash64,
    // id) order through the HUGEINT xxhash64 rendering, dense 0-based rank
    "curriculum_order" ->
      (s"WITH s AS (SELECT doc_id, $qualityExpr AS q FROM documents), " +
        "b AS (SELECT doc_id, 3 - LEAST(3, CAST(FLOOR(q * 4) AS BIGINT)) " +
        "AS negband FROM s) " +
        "SELECT CAST(ROW_NUMBER() OVER (ORDER BY negband, xxh, doc_id) - 1 " +
        "AS BIGINT) AS position, doc_id, " +
        "CAST(3 - negband AS BIGINT) AS quality_band FROM (" +
        DataQueries.xxhash64LongSql("SELECT doc_id, negband FROM b", "doc_id") +
        ") ORDER BY position"),
    // exact greedy-prefix replay: same tempered budgets (mix_execute's
    // POW/ROUND shape over token MASS), same (xxhash64, id) order via the
    // HUGEINT xxhash64 rendering, same inclusive-cumsum-under-budget keep
    "mix_token_budget" ->
      (s"WITH nz AS (SELECT * FROM (SELECT doc_id, lang, $tokCount AS n " +
        "FROM documents) WHERE n > 0), " +
        "mass AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS t FROM nz " +
        "GROUP BY 1), " +
        "tot AS (SELECT CAST(SUM(t) AS BIGINT) AS total FROM mass), " +
        "b AS (SELECT lang, CAST(ROUND(POW(t / total, 0.7) / " +
        "SUM(POW(t / total, 0.7)) OVER () * (total // 2), 0) AS BIGINT) " +
        "AS budget FROM mass CROSS JOIN tot), " +
        "r AS (SELECT doc_id, lang, n, SUM(n) OVER (PARTITION BY lang " +
        "ORDER BY xxh, doc_id ROWS UNBOUNDED PRECEDING) - n AS off FROM (" +
        DataQueries.xxhash64LongSql(
          "SELECT doc_id, lang, n FROM nz", "doc_id") + ")) " +
        "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_selected, " +
        "CAST(SUM(n) AS BIGINT) AS tok_selected, MAX(budget) AS budget, " +
        "bit_xor(doc_id) AS sel_xor FROM r JOIN b USING (lang) " +
        "WHERE off + n <= budget GROUP BY 1 ORDER BY 1"),
    "mix_execute" ->
      ("WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1), " +
        "t AS (SELECT SUM(n) AS total FROM c), " +
        "w AS (SELECT lang, n, POW(n / t.total, 0.7) AS wgt FROM c CROSS JOIN t), " +
        "p AS (SELECT lang, n, CAST(ROUND(wgt / SUM(wgt) OVER () * " +
        "(SELECT total FROM t), 0) AS BIGINT) AS target_docs FROM w), " +
        "f AS (SELECT lang, target_docs, " +
        "LEAST(1.0, CAST(target_docs AS DOUBLE) / n) AS f FROM p), " +
        "u AS (SELECT doc_id, lang, " +
        "CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) " +
        "AS INTEGER) AS DOUBLE) / 16777216.0 AS u FROM documents) " +
        "SELECT u.lang, CAST(COUNT(*) AS BIGINT) AS n_selected, " +
        "MAX(f.target_docs) AS target_docs, " +
        "CAST(BIT_XOR(doc_id) AS BIGINT) AS sel_xor " +
        "FROM u JOIN f USING (lang) WHERE u.u < f.f " +
        "GROUP BY 1 ORDER BY lang"),
    "bpe_learn" -> bpeLearnOracle,
    "bpe_learn_batched" -> bpeLearnBatchedOracle,
    "bpe_compression" -> bpeCompressionOracle,
    "bpe_merge_round2" ->
      (s"WITH $bpeDictSql, " +
        "top AS (SELECT pair FROM p1 ORDER BY cnt DESC, pair LIMIT 1), " +
        "m AS (SELECT replace(w, (SELECT pair FROM top), chr(1)) AS w2, wc " +
        "FROM w), " +
        "m2 AS (SELECT w2, wc FROM m WHERE length(w2) >= 2), " +
        "p2 AS (SELECT substr(w2, CAST(i AS INT), 2) AS q, wc FROM " +
        "(SELECT w2, wc, unnest(generate_series(1, length(w2) - 1)) AS i " +
        "FROM m2)) " +
        "SELECT replace(q, chr(1), (SELECT pair FROM top)) AS pair, " +
        "CAST(SUM(wc) AS BIGINT) AS cnt FROM p2 GROUP BY 1 " +
        "ORDER BY cnt DESC, pair LIMIT 30"),
    "pack_shard_manifest" ->
      (packOffsetsSql + shardRollupSql(
        ", CAST(MIN(seq_id) AS BIGINT) AS seq_from, " +
          "CAST(MAX(seq_id) AS BIGINT) AS seq_to")),
    "bpe_merge_pairs" ->
      (s"WITH $bpeDictSql SELECT pair, cnt FROM p1 " +
        "ORDER BY cnt DESC, pair LIMIT 30"),
    "pack_sequences" ->
      (packOffsetsSql + packSegmentsSql("seq_id, doc_id")),
    // shuffle-then-pack: the xxhash64 rank replay feeds the same cumsum
    // + span arithmetic, with `position` as the concatenation order
    // curriculum-then-pack: the quality-band rank replay feeds the same
    // cumsum + span arithmetic, with the banded `position` as the order
    "pack_sequences_curriculum" ->
      (s"WITH d AS (SELECT doc_id, $tokCount AS n FROM documents), " +
        "nz AS (SELECT doc_id, n FROM d WHERE n > 0), " +
        s"s AS (SELECT doc_id, $qualityExpr AS q FROM documents), " +
        "b AS (SELECT doc_id, 3 - LEAST(3, CAST(FLOOR(q * 4) AS BIGINT)) " +
        "AS negband FROM s), " +
        "pos AS (SELECT doc_id, " +
        "CAST(ROW_NUMBER() OVER (ORDER BY negband, xxh, doc_id) - 1 " +
        "AS BIGINT) AS position FROM (" +
        DataQueries.xxhash64LongSql("SELECT doc_id, negband FROM b", "doc_id") +
        ")), " +
        "p AS (SELECT nz.doc_id, n, CAST(SUM(n) OVER (ORDER BY position " +
        "ROWS UNBOUNDED PRECEDING) - n AS BIGINT) AS off " +
        "FROM nz JOIN pos USING (doc_id))" +
        packSegmentsSql("seq_id, seq_off")),
    "pack_sequences_shuffled" ->
      (s"WITH d AS (SELECT doc_id, $tokCount AS n FROM documents), " +
        "nz AS (SELECT doc_id, n FROM d WHERE n > 0), " +
        "pos AS (SELECT doc_id, n, " +
        "CAST(ROW_NUMBER() OVER (ORDER BY xxh, doc_id) - 1 AS BIGINT) " +
        "AS position FROM (" +
        DataQueries.xxhash64LongSql("SELECT doc_id, n FROM nz", "doc_id") +
        ")), " +
        "p AS (SELECT doc_id, n, CAST(SUM(n) OVER (ORDER BY position " +
        "ROWS UNBOUNDED PRECEDING) - n AS BIGINT) AS off FROM pos)" +
        packSegmentsSql("seq_id, seq_off")),
    "pack_stats" ->
      (s"WITH d AS (SELECT $tokCount AS n FROM documents), " +
        "nz AS (SELECT n FROM d WHERE n > 0) " +
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, " +
        "CAST(SUM(n) AS BIGINT) AS total_tokens, " +
        s"CAST((SUM(n) + ${PackCtx - 1}) // $PackCtx AS BIGINT) AS packed_seqs, " +
        s"CAST(SUM((n + ${PackCtx - 1}) // $PackCtx) AS BIGINT) AS naive_seqs, " +
        s"CAST(((SUM(n) + ${PackCtx - 1}) // $PackCtx) * $PackCtx - SUM(n) " +
        "AS BIGINT) AS packed_pad, " +
        s"CAST(SUM((n + ${PackCtx - 1}) // $PackCtx) * $PackCtx - SUM(n) " +
        "AS BIGINT) AS naive_pad, " +
        "FLOOR(CAST(SUM(n) AS DOUBLE) / " +
        s"(((SUM(n) + ${PackCtx - 1}) // $PackCtx) * $PackCtx) " +
        "* 1000000 + 0.5) / 1000000 AS packed_fill, " +
        "FLOOR(CAST(SUM(n) AS DOUBLE) / " +
        s"(SUM((n + ${PackCtx - 1}) // $PackCtx) * $PackCtx) " +
        "* 1000000 + 0.5) / 1000000 AS naive_fill FROM nz"),
    "corpus_shuffle" ->
      ("SELECT CAST(ROW_NUMBER() OVER (ORDER BY xxh, doc_id) - 1 AS BIGINT) " +
        "AS position, doc_id FROM (" +
        DataQueries.xxhash64LongSql("SELECT doc_id FROM documents", "doc_id") +
        ") ORDER BY position"),
    // Replays RollingHashExpr's mod-2^64 polynomial (h*1315423911 + byte)
    // in HUGEINT space — DuckDB's BIGINT doesn't wrap, so the fold runs
    // 128-bit with an explicit % 2^64 and a final two's-complement
    // conversion back to signed BIGINT. Byte==codepoint holds because the
    // documents fixture is ASCII (checked) and both engines then agree.
    "text_rolling_hash" ->
      ("SELECT doc_id, CAST(CASE WHEN v >= 9223372036854775808::HUGEINT " +
        "THEN v - 18446744073709551616::HUGEINT ELSE v END AS BIGINT) AS rhash " +
        "FROM (SELECT doc_id, list_reduce(list_prepend(0::HUGEINT, " +
        "list_transform(string_split(text, ''), c -> ord(c)::HUGEINT)), " +
        "(a, b) -> (a * 1315423911 + b) % 18446744073709551616::HUGEINT) AS v " +
        "FROM documents) ORDER BY doc_id"),
    "naive_bayes_lang" ->
      ("WITH tr AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok " +
        "FROM documents WHERE doc_id % 5 <> 0), " +
        "te AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok " +
        "FROM documents WHERE doc_id % 5 = 0), " +
        "cls AS (SELECT lang AS c, CAST(COUNT(*) AS DOUBLE) AS n_docs " +
        "FROM documents WHERE doc_id % 5 <> 0 GROUP BY 1), " +
        "tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_train FROM documents " +
        "WHERE doc_id % 5 <> 0), " +
        "vocab AS (SELECT CAST(COUNT(DISTINCT tok) AS DOUBLE) AS v FROM tr), " +
        "nc AS (SELECT lang AS c, CAST(COUNT(*) AS DOUBLE) AS n_tok FROM tr GROUP BY 1), " +
        "cnt AS (SELECT lang AS c, tok, COUNT(*) AS k FROM tr GROUP BY 1, 2), " +
        "tev AS (SELECT te.doc_id, te.tok FROM te " +
        "JOIN (SELECT DISTINCT tok FROM tr) vt ON vt.tok = te.tok), " +
        "md AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS m FROM tev GROUP BY 1), " +
        "grid AS (SELECT md.doc_id, md.m, cls.c, cls.n_docs, nc.n_tok, " +
        "tot.n_train, vocab.v FROM md CROSS JOIN cls " +
        "JOIN nc ON nc.c = cls.c CROSS JOIN tot CROSS JOIN vocab), " +
        "contrib AS (SELECT tev.doc_id, cnt.c, SUM(LN(cnt.k + 1.0)) AS s " +
        "FROM tev JOIN cnt ON cnt.tok = tev.tok GROUP BY 1, 2), " +
        "score AS (SELECT grid.doc_id, grid.c, " +
        "ROUND(LN(n_docs / n_train) + COALESCE(contrib.s, 0) " +
        "- m * LN(n_tok + v), 6) AS score FROM grid " +
        "LEFT JOIN contrib ON contrib.doc_id = grid.doc_id AND contrib.c = grid.c), " +
        "pred AS (SELECT doc_id, c, " +
        "ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, c) AS rk " +
        "FROM score) " +
        "SELECT p.doc_id, p.c AS predicted, d.lang AS actual, " +
        "CAST(CASE WHEN p.c = d.lang THEN 1 ELSE 0 END AS BIGINT) AS correct " +
        "FROM pred p JOIN documents d ON d.doc_id = p.doc_id " +
        "WHERE rk = 1 ORDER BY p.doc_id"),
    "array_functions" ->
      ("WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) " +
        "SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, " +
        "CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq, " +
        "CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS total_chars, " +
        "CAST(list_max(list_transform(toks, x -> length(x))) AS BIGINT) AS longest_token, " +
        "array_to_string(list_sort(toks)[1:3], ',') AS first3_sorted " +
        "FROM d ORDER BY doc_id"),
    "mix_temperature" ->
      ("WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1), " +
        "t AS (SELECT SUM(n) AS total FROM c), " +
        "w AS (SELECT lang, n, n / t.total AS p, POW(n / t.total, 0.7) AS wgt " +
        "FROM c CROSS JOIN t) " +
        "SELECT lang, n AS n_docs, ROUND(p, 6) AS p_raw, " +
        "ROUND(wgt / SUM(wgt) OVER (), 6) AS p_sampled, " +
        "CAST(ROUND(wgt / SUM(wgt) OVER () * (SELECT total FROM t), 0) AS BIGINT) " +
        "AS target_docs FROM w ORDER BY lang"),
    "er_sorted_neighborhood" ->
      ("WITH nrm AS (SELECT doc_id, TRIM(REGEXP_REPLACE(LOWER(text), " +
        "'[^a-z0-9]+', ' ', 'g')) AS norm FROM documents), " +
        "kd AS (SELECT doc_id, SUBSTRING(norm, 1, 8) AS block, " +
        "SUBSTRING(norm, 1, 24) AS sortkey, SUBSTRING(norm, 1, 64) AS probe FROM nrm), " +
        "rk AS (SELECT doc_id, block, probe, ROW_NUMBER() OVER " +
        "(PARTITION BY block ORDER BY sortkey, doc_id) AS rn FROM kd) " +
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
        "levenshtein(a.probe, b.probe) AS dist " +
        "FROM rk a JOIN rk b ON a.block = b.block AND b.rn - a.rn BETWEEN 1 AND 3 " +
        "WHERE levenshtein(a.probe, b.probe) <= 20 ORDER BY doc_a, doc_b"),
    "er_snm_multikey" ->
      ("WITH nrm AS (SELECT doc_id, TRIM(REGEXP_REPLACE(LOWER(text), " +
        "'[^a-z0-9]+', ' ', 'g')) AS norm FROM documents), " +
        "kd AS (SELECT doc_id, SUBSTRING(norm, 1, 12) AS k1, " +
        "SUBSTRING(norm, 13, 12) AS k2, " +
        "SUBSTRING(norm, 1, 24) AS sortkey, SUBSTRING(norm, 1, 64) AS probe FROM nrm), " +
        "rk1 AS (SELECT doc_id, k1 AS block, probe, ROW_NUMBER() OVER " +
        "(PARTITION BY k1 ORDER BY sortkey, doc_id) AS rn FROM kd " +
        "WHERE LENGTH(k1) > 0), " +
        "rk2 AS (SELECT doc_id, k2 AS block, probe, ROW_NUMBER() OVER " +
        "(PARTITION BY k2 ORDER BY sortkey, doc_id) AS rn FROM kd " +
        "WHERE LENGTH(k2) > 0), " +
        "cand AS (SELECT LEAST(a.doc_id, b.doc_id) AS doc_lo, " +
        "GREATEST(a.doc_id, b.doc_id) AS doc_hi, " +
        "levenshtein(a.probe, b.probe) AS dist " +
        "FROM rk1 a JOIN rk1 b ON a.block = b.block AND b.rn - a.rn BETWEEN 1 AND 3 " +
        "UNION " +
        "SELECT LEAST(a.doc_id, b.doc_id), GREATEST(a.doc_id, b.doc_id), " +
        "levenshtein(a.probe, b.probe) " +
        "FROM rk2 a JOIN rk2 b ON a.block = b.block AND b.rn - a.rn BETWEEN 1 AND 3) " +
        "SELECT doc_lo, doc_hi, dist FROM cand WHERE dist <= 20 " +
        "ORDER BY 1, 2"),
    "doc_chunk" ->
      ("WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t " +
        "FROM documents), " +
        "sized AS (SELECT doc_id, t, len(t) AS n FROM toks), " +
        "chunks AS (SELECT doc_id, g.i AS chunk_idx, " +
        "t[(g.i * 48 + 1):(LEAST(g.i * 48 + 64, n))] AS ct FROM sized, " +
        "LATERAL (SELECT UNNEST(generate_series(0, " +
        "CAST(CEIL(GREATEST(n - 64, 0) / 48.0) AS BIGINT))) AS i) g) " +
        "SELECT doc_id, chunk_idx, CAST(len(ct) AS BIGINT) AS chunk_tokens, " +
        "array_to_string(ct, ' ') AS chunk_text " +
        "FROM chunks ORDER BY 1, 2"),
    "text_perplexity" ->
      ("WITH toks AS (SELECT doc_id, u.tok, u.pos FROM documents, " +
        "(SELECT unnest(string_split(text, ' ')) AS tok, " +
        "generate_subscripts(string_split(text, ' '), 1) AS pos) u), " +
        "bg AS (SELECT a.doc_id, a.tok AS w1, b.tok AS w2 FROM toks a " +
        "JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1), " +
        "c12 AS (SELECT w1, w2, CAST(COUNT(*) AS DOUBLE) AS c " +
        "FROM bg GROUP BY 1, 2), " +
        "c1 AS (SELECT w1, CAST(COUNT(*) AS DOUBLE) AS c FROM bg GROUP BY 1), " +
        "v AS (SELECT CAST(COUNT(DISTINCT tok) AS DOUBLE) AS vocab FROM toks), " +
        "scored AS (SELECT bg.doc_id, " +
        "log2((c12.c + 1) / (c1.c + v.vocab)) AS lp " +
        "FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1), v) " +
        "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams, " +
        "ROUND(AVG(lp), 4) AS avg_log2p, " +
        "ROUND(POW(2.0, -AVG(lp)), 2) AS ppl_proxy " +
        "FROM scored GROUP BY doc_id ORDER BY doc_id"),
    "quality_deciles" ->
      (s"WITH scored AS (SELECT doc_id, $qualityExpr AS q FROM documents) " +
        "SELECT decile, COUNT(*) AS n_docs, ROUND(MIN(q), 6) AS q_min, " +
        "ROUND(MAX(q), 6) AS q_max FROM (" +
        "SELECT q, NTILE(10) OVER (ORDER BY q, doc_id) AS decile FROM scored) " +
        "GROUP BY decile ORDER BY decile"),
    // quantile_cont = Spark's exact `percentile`: rank p*(n-1), linear
    // interpolation; bucketing by count of boundaries strictly below q
    "quality_deciles_approx" ->
      (s"WITH scored AS (SELECT doc_id, $qualityExpr AS q FROM documents), " +
        "b AS (SELECT quantile_cont(q, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) " +
        "AS bs FROM scored) " +
        "SELECT CAST(1 + len(list_filter(bs, x -> x < q)) AS BIGINT) AS decile, " +
        "COUNT(*) AS n_docs, ROUND(MIN(q), 6) AS q_min, " +
        "ROUND(MAX(q), 6) AS q_max FROM scored, b " +
        "GROUP BY 1 ORDER BY 1"),
    "sample_reservoir" ->
      ("SELECT doc_id, lang, source, rn FROM (" +
        "SELECT doc_id, lang, source, ROW_NUMBER() OVER (" +
        "PARTITION BY lang, source " +
        "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn FROM documents) " +
        "WHERE rn <= 3 ORDER BY lang, source, rn"),
    "fuzzy_match" ->
      ("WITH d AS (SELECT doc_id, substr(text, 1, 64) AS t, " +
        "substr(text, 1, 8) AS p8, " +
        "CAST(length(text) // 32 AS BIGINT) AS bucket FROM documents), " +
        "a AS (SELECT doc_id AS doc_a, t AS ta, p8, " +
        "unnest([bucket - 1, bucket, bucket + 1]) AS probe FROM d), " +
        "b AS (SELECT doc_id AS doc_b, t AS tb, p8 AS p8_b, bucket FROM d) " +
        "SELECT doc_a, doc_b, levenshtein(ta, tb) AS dist " +
        "FROM a JOIN b ON probe = bucket AND p8 = p8_b AND doc_a < doc_b " +
        "WHERE levenshtein(ta, tb) <= 20 ORDER BY doc_a, doc_b"),
    "heavy_hitters_weighted" ->
      ("WITH w AS (SELECT CAST(user_id AS VARCHAR) AS item, " +
        "CAST(ROUND(value * 100) AS BIGINT) AS wt FROM events), " +
        "tot AS (SELECT SUM(wt) AS n FROM w) " +
        "SELECT item, CAST(SUM(wt) AS BIGINT) AS weight FROM w, tot " +
        "GROUP BY item, n HAVING SUM(wt) >= CEIL(0.005 * n) ORDER BY item"),
    "heavy_hitters" ->
      ("WITH toks AS (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS item " +
        "FROM documents), " +
        "clean AS (SELECT item FROM toks WHERE length(item) > 0), " +
        "tot AS (SELECT COUNT(*) AS n FROM clean) " +
        "SELECT item, COUNT(*) AS freq FROM clean, tot " +
        "GROUP BY item, n HAVING COUNT(*) >= CEIL(0.005 * n) ORDER BY item"),
    "pii_redact" ->
      (s"WITH salted AS (SELECT doc_id, $saltedExpr AS s FROM documents) " +
        "SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(s, " +
        s"'${TextFunctions.EmailRe}', '<EMAIL>', 'g'), " +
        s"'${TextFunctions.Ipv4Re}', '<IP>', 'g'), " +
        s"'${TextFunctions.PhoneRe}', '<PHONE>', 'g') AS red_text " +
        "FROM salted ORDER BY doc_id"),
    "quality_gopher" ->
      (s"SELECT doc_id, n_words, avg_word_len, symbol_ratio, has_stopword, " +
        "CAST((n_words BETWEEN 5 AND 5000 AND avg_word_len BETWEEN 2.0 AND 15.0 " +
        "AND symbol_ratio < 0.1 AND has_stopword = 1) AS INT) AS keep FROM (" +
        s"SELECT doc_id, $tokCount AS n_words, $avgWordLenExpr AS avg_word_len, " +
        s"$symbolRatioExpr AS symbol_ratio, " +
        "CAST(regexp_matches(text, '\\b(the|and|of|to)\\b') AS INT) AS has_stopword " +
        "FROM documents) ORDER BY doc_id"),
    "domain_quota" ->
      ("SELECT doc_id, source, rn FROM (" +
        "SELECT doc_id, source, ROW_NUMBER() OVER " +
        "(PARTITION BY source ORDER BY doc_id) AS rn FROM documents) " +
        "WHERE rn <= 10 ORDER BY source, rn"),
    "corpus_curate" ->
      ("WITH surv AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text), " +
        s"q AS (SELECT d.doc_id, $qualityExpr AS quality, $langCase AS lang_pred " +
        "FROM documents d JOIN surv USING (doc_id)) " +
        "SELECT lang_pred, COUNT(*) AS n_docs, " +
        "FLOOR(CAST(SUM(CAST(FLOOR(quality * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) " +
        "/ COUNT(*) / 1000000 * 10000 + 0.5) / 10000 AS avg_quality " +
        "FROM q WHERE quality >= 0.3 GROUP BY lang_pred ORDER BY lang_pred"),
    "tfidf_top_terms" ->
      ("WITH toks AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS term " +
        "FROM documents), " +
        "tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks " +
        "WHERE length(term) > 0 GROUP BY 1, 2), " +
        "dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1), " +
        "n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents) " +
        "SELECT doc_id, rn, term, tf, ROUND(sc, 6) AS score FROM (" +
        "SELECT tf.doc_id, tf.term, tf.tf, " +
        "tf.tf * ln(CAST(n_docs AS DOUBLE) / df) AS sc, " +
        "ROW_NUMBER() OVER (PARTITION BY tf.doc_id " +
        "ORDER BY tf.tf * ln(CAST(n_docs AS DOUBLE) / df) DESC, tf.term) AS rn " +
        "FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n " +
        "WHERE tf.doc_id < 50) WHERE rn <= 3 ORDER BY doc_id, rn"),
    "text_repetition" ->
      ("WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), " +
        "s AS (SELECT doc_id, len(w) AS n_words, len(list_distinct(w)) AS n_uniq, " +
        "GREATEST(len(w) - 2, 0) AS n_sh, " +
        "CASE WHEN len(w) < 3 THEN 0 ELSE len(list_distinct(list_transform(" +
        "generate_series(1, len(w) - 2), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) " +
        "END AS n_sh_uniq FROM t) " +
        "SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, " +
        "FLOOR((1 - CAST(n_uniq AS DOUBLE) / GREATEST(n_words, 1)) * 1000000 + 0.5) " +
        "/ 1000000 AS dup_word_ratio, " +
        "FLOOR((CASE WHEN n_sh > 0 THEN 1 - CAST(n_sh_uniq AS DOUBLE) / n_sh " +
        "ELSE 0 END) * 1000000 + 0.5) / 1000000 AS dup_3gram_ratio " +
        "FROM s ORDER BY doc_id"),
    "text_stats" ->
      (s"SELECT doc_id, $tokCount AS n_tokens, " +
        "FLOOR(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) " +
        "/ GREATEST(length(text), 1) * 1000000 + 0.5) / 1000000 AS alpha_ratio, " +
        s"$avgWordLenExpr AS avg_word_len, " +
        s"$qualityExpr AS quality " +
        "FROM documents ORDER BY doc_id"),
    "text_bpe_tokens" ->
      (s"SELECT doc_id, $tokCount AS n_ws_tokens, " +
        "CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+')) AS BIGINT) " +
        "AS n_bpe_tokens FROM documents ORDER BY doc_id"),
    "text_langid" ->
      (s"SELECT doc_id, lang, $langCase AS lang_pred FROM documents ORDER BY doc_id"),
    "text_fingerprint" ->
      ("SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp " +
        "FROM documents ORDER BY doc_id"),
    "lang_source_agg" ->
      ("SELECT lang, source, COUNT(*) AS n_docs, " +
        "FLOOR(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) * 10000 + 0.5) / 10000 AS avg_chars, " +
        s"CAST(SUM($tokCount) AS BIGINT) AS total_tokens " +
        "FROM documents GROUP BY lang, source ORDER BY lang, source")
  )
}
