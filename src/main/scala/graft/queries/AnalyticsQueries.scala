package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Sampling
import graft.queries.CoreQueries.table

/** ClickHouse-flavored analytics surface: the aggregate-combinator family a
  * user of the reference's ClickHouse deployment reaches for daily —
  * argMax/argMin, countIf/sumIf/avgIf, groupArray, runningDifference,
  * histogram, uniqExact over several dimensions, statistical moments,
  * calendar rollups — each re-expressed as codegen'd Spark built-ins with a
  * DuckDB oracle. Scale posture: every query is scan -> (optional window or
  * single hash-agg shuffle on the group key) -> small output; nothing here
  * materializes per-row state on the driver.
  */
object AnalyticsQueries {

  /** argMax/argMin (ClickHouse `argMax(arg, val)`) via Spark's codegen'd
    * max_by/min_by. Keyed on event_id (unique) so the answer is
    * deterministic — argMax on a non-unique key is engine-defined tie
    * order, which no oracle can pin. One hash agg, shuffle on user_id.
    */
  def argMinMax(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(
        min_by(col("event_type"), col("event_id")).as("first_type"),
        max_by(col("event_type"), col("event_id")).as("last_type"),
        max(col("event_id")).as("last_event_id"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id")

  /** countIf/sumIf/avgIf (ClickHouse `-If` combinators) as conditional
    * aggregates: count/sum/avg over `when(cond)` — one pass, one shuffle,
    * no self-join. SQL's FILTER clause compiles to the same plan.
    */
  def conditionalAgg(spark: SparkSession, dir: String): DataFrame = {
    val big = col("value") > 100
    table(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        count(when(big, 1)).as("n_big"),
        round(sum(when(big, col("value"))), 2).as("sum_big"),
        round(avg(when(!big, col("value"))), 4).as("avg_small"),
        round(count(when(big, 1)).cast("double") / count(lit(1)), 4).as("big_ratio"))
      .orderBy("event_type")
  }

  /** Statistical moments per group: corr / covar_samp / stddev_samp /
    * var_samp — single-pass streaming aggregates in both engines (no
    * second centered pass), so they scale as one shuffle regardless of
    * group cardinality.
    */
  def statsMoments(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 5).as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 3).as("covar_qty_price"),
        round(stddev_samp(col("l_quantity")), 5).as("stddev_qty"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** Calendar rollup: month-grain revenue (ClickHouse toStartOfMonth).
    * date_trunc is a codegen'd scalar, so partition pruning on a
    * date-partitioned warehouse layout still applies upstream.
    */
  def monthlyRevenue(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("revenue"),
        round(avg(col("o_totalprice")), 3).as("avg_price"))
      .orderBy("month")

  /** runningDifference (ClickHouse) done right: lag over an EXPLICIT
    * (partition, total order) window — the ClickHouse original depends on
    * block order, which doesn't survive a distributed shuffle. (ts,
    * event_id) makes the order total, so the diff is deterministic.
    */
  def runningDiff(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    table(spark, dir, "events")
      .filter(col("user_id") < 50)
      .select(col("user_id"), col("event_id"), round(col("value"), 2).as("value"),
        round(col("value") - lag(col("value"), 1).over(w), 3).as("diff"))
      .orderBy("user_id", "event_id")
  }

  /** groupArray (ClickHouse) with deterministic content: collect_list is
    * unordered in a distributed engine, so sort the array before joining
    * to a string. Bounded per group (orders per customer), so no single
    * group can blow an executor.
    */
  def groupArray(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .filter(col("o_custkey") < 100)
      .groupBy(col("o_custkey"))
      .agg(
        array_join(array_sort(collect_list(col("o_orderstatus"))), ",").as("statuses"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_custkey")

  /** Fixed-width histogram: floor-bucket then one hash agg. The binning is
    * a projection, so the same plan at 100 TB is scan -> partial agg ->
    * one small shuffle (bucket count ~ range/width, not row count).
    */
  def histogramValues(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .groupBy(floor(col("value") / 50).cast("long").as("bucket"))
      .agg(
        count(lit(1)).as("n"),
        round(avg(col("value")), 4).as("avg_value"),
        round(min(col("value")), 2).as("min_value"),
        round(max(col("value")), 2).as("max_value"))
      .orderBy("bucket")

  /** uniqExact over several dimensions in one pass (ClickHouse uniqExact):
    * two count-distincts + a plain count — Catalyst expands to a single
    * multi-distinct aggregate, not three scans.
    */
  def uniqCounts(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("uniq_users"),
        countDistinct(to_date(col("ts"))).as("active_days"),
        round(count(lit(1)).cast("double") / countDistinct(col("user_id")), 4)
          .as("events_per_user"))
      .orderBy("event_type")

  /** Per-label embedding centroid norm: posexplode -> per-(label, dim)
    * mean -> L2 norm of the mean vector. Explode multiplies rows by the
    * dimension (64x) but stays narrow (3 cols), and both aggs shuffle on
    * small keys — the distributed shape for "how tight is each cluster"
    * over billions of vectors.
    */
  def embeddingCentroid(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy(col("label"), col("i"))
      .agg(avg(col("x").cast("double")).as("m"))
      .groupBy(col("label"))
      .agg(
        round(sqrt(sum(col("m") * col("m"))), 4).as("centroid_norm"),
        count(lit(1)).as("dims"))
      .orderBy("label")

  /** Deterministic train/val/test split via [[Sampling.splitLabelMd5]] —
    * the engine-independent draw, so the EXACT membership (not just the
    * proportions) is pinned by the DuckDB oracle. The xxhash64 production
    * path (`sample_split`) keeps its rows-only check.
    */
  def sampleSplitMd5(spark: SparkSession, dir: String): DataFrame =
    Sampling
      .splitLabelMd5(table(spark, dir, "documents"), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n"), round(avg(col("n_chars")), 2).as("avg_chars"))
      .orderBy("split")

  /** Corpus-level top bigrams. Formulated as an ARRAY transform (adjacent
    * pairs zipped inside the row) + one explode + one hash agg — not the
    * tokenize->explode->per-doc-window shape, which would shuffle every
    * token on doc_id before counting. Here the only shuffle is the final
    * (partial-agg'd) bigram count. Ties broken by bigram text so the
    * top-k is deterministic.
    */
  def textTopBigrams(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .withColumn("t", split(col("text"), " "))
      .select(explode(when(size(col("t")) >= 2,
        expr("transform(sequence(0, size(t) - 2), k -> concat(t[k], ' ', t[k + 1]))"))
        .otherwise(array())).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(10)

  /** sumMap (ClickHouse): per-key map of event_type -> summed value.
    * Serialized as a SORTED "k:v" string (cents, so the value is an exact
    * integer in both engines) because map columns have no cross-engine
    * stable representation. Two hash aggs, both on small keys; the map
    * payload per user is bounded by the event-type cardinality.
    */
  def sumMap(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .filter(col("user_id") < 20)
      .groupBy(col("user_id"), col("event_type"))
      .agg(sum(col("value")).as("v"))
      .select(col("user_id"),
        concat(col("event_type"), lit(":"),
          round(col("v") * 100).cast("long").cast("string")).as("kv"))
      .groupBy(col("user_id"))
      .agg(
        array_join(array_sort(collect_list(col("kv"))), ",").as("type_sums"),
        count(lit(1)).as("n_types"))
      .orderBy("user_id")

  /** sequenceMatch (ClickHouse): per-user ordered event-path string,
    * matched against a regex. The per-group state is the user's own event
    * list (collect_list + array_sort — sequence semantics inherently need
    * the user's full ordered history), so group memory is bounded by
    * per-user activity, never corpus size; one shuffle on user_id, then a
    * tiny agg on the matched flag. The pattern is RE2-safe and shared
    * VERBATIM with the oracle. Event-type names are substring-free of
    * each other, so the unanchored match is unambiguous.
    */
  def sequenceMatch(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("ts"), col("event_id"), col("event_type")))),
          e => e.getField("event_type")), ">").as("path"))
      .select(col("path").rlike("view>click>purchase").cast("int").as("matched"),
        col("path"))
      .groupBy(col("matched"))
      .agg(count(lit(1)).as("n_users"),
        round(avg(length(col("path"))), 2).as("avg_path_len"))
      .orderBy("matched")

  /** windowFunnel with a TIME WINDOW (ClickHouse `windowFunnel(window)`):
    * like funnel_steps, but every later step must land within `3 days` of
    * the user's step-1 time — the semantics product analytics actually
    * wants ("converted within N days"). Same scale shape as the plain
    * funnel: per-step min-ts aggs keyed on user_id, each step's frame
    * shrinking, joined on user_id only.
    */
  def funnelStepsWindowed(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
    val win = expr("INTERVAL 3 DAYS")
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val s2 = ev.filter(col("event_type") === "click").join(s1, "user_id")
      .filter(col("ts") > col("t1") && col("ts") <= col("t1") + win)
      .groupBy("user_id").agg(min(col("ts")).as("t2"), max(col("t1")).as("t1"))
    val s3 = ev.filter(col("event_type") === "purchase").join(s2, "user_id")
      .filter(col("ts") > col("t2") && col("ts") <= col("t1") + win)
      .groupBy("user_id").agg(min(col("ts")).as("t3"))
    def cnt(df: DataFrame, step: Int, label: String) =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(step).cast("long").as("step"), lit(label).as("event_type"),
          col("n_users"))
    cnt(s1, 1, "view").union(cnt(s2, 2, "click")).union(cnt(s3, 3, "purchase"))
      .orderBy("step")
  }

  /** groupBitAnd/Or/Xor (ClickHouse): bitwise aggregates — one hash agg,
    * fully map-side-combinable (each is associative+commutative).
    */
  def bitwiseAgg(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        bit_and(col("event_id")).as("id_bit_and"),
        bit_or(col("event_id")).as("id_bit_or"),
        bit_xor(col("event_id")).as("id_bit_xor"))
      .orderBy("event_type")

  /** Shannon entropy of the per-source language mix (ClickHouse
    * `entropy`) — the label-diversity report a curation pipeline reads
    * before balancing a corpus. Written from raw counts (-sum p log2 p)
    * so both engines compute the IDENTICAL formula rather than relying
    * on builtin entropy definitions. Shape: one (source, lang) count agg,
    * a source-partition window for the totals (source cardinality is the
    * small key), then the final source agg.
    */
  def sourceEntropy(spark: SparkSession, dir: String): DataFrame = {
    val counts = table(spark, dir, "documents")
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).cast("double").as("n"))
    val tot = Window.partitionBy(col("source"))
    val p = col("n") / sum(col("n")).over(tot)
    counts
      .select(col("source"), col("n"), p.as("p"))
      .groupBy(col("source"))
      .agg(
        round(-sum(col("p") * log2(col("p"))), 6).as("lang_entropy"),
        sum(col("n")).cast("long").as("n_docs"))
      .orderBy("source")
  }

  /** Population skewness/kurtosis from RAW power sums (avg x, avg x^2,
    * avg x^3, avg x^4) — engines disagree on builtin skewness/kurtosis
    * definitions (sample-corrected vs population), so both sides compute
    * the same explicit moment arithmetic. Still one streaming pass: four
    * plain avg aggregates, no centered second pass.
    */
  private def momentCols: Seq[org.apache.spark.sql.Column] = {
    val m1 = col("m1"); val m2r = col("m2r"); val m3r = col("m3r"); val m4r = col("m4r")
    val v = m2r - m1 * m1 // population variance
    val m3 = m3r - lit(3) * m1 * m2r + lit(2) * m1 * m1 * m1
    val m4 = m4r - lit(4) * m1 * m3r + lit(6) * m1 * m1 * m2r -
      lit(3) * m1 * m1 * m1 * m1
    Seq(col("l_returnflag"), col("n"),
      round(m3 / pow(v, 1.5), 5).as("skew_pop"),
      round(m4 / (v * v) - lit(3), 5).as("kurt_excess_pop"))
  }

  def higherMoments(spark: SparkSession, dir: String): DataFrame = {
    val x = col("l_quantity")
    table(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        avg(x).as("m1"), avg(x * x).as("m2r"),
        avg(x * x * x).as("m3r"), avg(x * x * x * x).as("m4r"),
        count(lit(1)).as("n"))
      .select(momentCols: _*)
      .orderBy("l_returnflag")
  }

  /** Trailing 7-day distinct-user reach per day, EXACT, without a
    * quadratic day x events self-join: dedup to (user, day) once, then
    * each pair contributes to the 7 trailing windows it belongs to
    * (explode of a 7-element date sequence), then one distinct-count per
    * day. Shuffle volume = 7 x (user, day) pairs — linear, bounded by the
    * window width, the exact-reach shape that holds until reach itself
    * justifies HLL sketches (hll_reach is that path). Overhang days past
    * the corpus end are kept (both engines produce them identically).
    */
  def slidingReach(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
      .select(col("user_id"),
        explode(sequence(col("d"), date_add(col("d"), 6))).as("day"))
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("reach_7d"))
      .orderBy("day")

  /** Multi-aggregate pivot: per month, (count, avg price) per order
    * status as columns — the two-measure crosstab shape. Explicit pivot
    * value list (no distinct pre-scan job); counts for absent
    * (month, status) cells are coalesced to 0 because a pivoted count
    * yields NULL for an empty cell while SQL's `COUNT(*) FILTER` yields 0
    * — averages stay NULL in both engines.
    */
  def pivotMultiAgg(spark: SparkSession, dir: String): DataFrame = {
    val statuses = Seq("F", "O", "P")
    val base = table(spark, dir, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .pivot("o_orderstatus", statuses)
      .agg(count(lit(1)).as("n"), round(avg(col("o_totalprice")), 2).as("avg"))
    val cols = col("month") +: statuses.flatMap(s => Seq(
      coalesce(col(s"${s}_n"), lit(0L)).as(s"${s}_n"),
      col(s"${s}_avg")))
    base.select(cols: _*).orderBy("month")
  }

  /** Second scalar-function batch beyond `scalar_functions`: regex
    * extraction, edit distance, reverse/repeat/position — all codegen'd
    * built-ins, pure projection, no shuffle except the output sort. The
    * regex is RE2-safe and shared verbatim with the oracle.
    */
  def stringFunctionsExt(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "part")
      .select(
        col("p_partkey"),
        regexp_extract(col("p_type"), "^([A-Z]+)", 1).as("type_head"),
        levenshtein(col("p_brand"), lit("Brand#10")).as("brand_dist"),
        reverse(col("p_name")).as("name_rev"),
        repeat(substring(col("p_brand"), 1, 2), 2).as("brand_echo"),
        instr(col("p_name"), "a").cast("int").as("first_a"))
      .orderBy("p_partkey")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "string_functions_ext" -> (stringFunctionsExt _),
    "pivot_multi_agg" -> (pivotMultiAgg _),
    "sliding_reach" -> (slidingReach _),
    "bitwise_agg" -> (bitwiseAgg _),
    "source_entropy" -> (sourceEntropy _),
    "higher_moments" -> (higherMoments _),
    "text_top_bigrams" -> (textTopBigrams _),
    "sum_map" -> (sumMap _),
    "sequence_match" -> (sequenceMatch _),
    "funnel_steps_windowed" -> (funnelStepsWindowed _),
    "arg_minmax" -> (argMinMax _),
    "conditional_agg" -> (conditionalAgg _),
    "stats_moments" -> (statsMoments _),
    "monthly_revenue" -> (monthlyRevenue _),
    "running_diff" -> (runningDiff _),
    "group_array" -> (groupArray _),
    "histogram_values" -> (histogramValues _),
    "uniq_counts" -> (uniqCounts _),
    "embedding_centroid" -> (embeddingCentroid _),
    "sample_split_md5" -> (sampleSplitMd5 _)
  )

  val oracleSql: Map[String, String] = Map(
    "string_functions_ext" ->
      ("SELECT p_partkey, regexp_extract(p_type, '^([A-Z]+)', 1) AS type_head, " +
        "levenshtein(p_brand, 'Brand#10') AS brand_dist, " +
        "reverse(p_name) AS name_rev, " +
        "repeat(left(p_brand, 2), 2) AS brand_echo, " +
        "CAST(strpos(p_name, 'a') AS INT) AS first_a " +
        "FROM part ORDER BY p_partkey"),
    "pivot_multi_agg" ->
      ("SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS month, " +
        "CAST(COUNT(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS \"F_n\", " +
        "ROUND(AVG(o_totalprice) FILTER (o_orderstatus = 'F'), 2) AS \"F_avg\", " +
        "CAST(COUNT(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS \"O_n\", " +
        "ROUND(AVG(o_totalprice) FILTER (o_orderstatus = 'O'), 2) AS \"O_avg\", " +
        "CAST(COUNT(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS \"P_n\", " +
        "ROUND(AVG(o_totalprice) FILTER (o_orderstatus = 'P'), 2) AS \"P_avg\" " +
        "FROM orders GROUP BY 1 ORDER BY 1"),
    "sliding_reach" ->
      ("WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events), " +
        "days AS (SELECT user_id, d + CAST(x AS INTEGER) AS day " +
        "FROM ud, unnest(generate_series(0, 6)) t(x)) " +
        "SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS reach_7d " +
        "FROM days GROUP BY day ORDER BY day"),
    "bitwise_agg" ->
      ("SELECT event_type, bit_and(event_id) AS id_bit_and, " +
        "bit_or(event_id) AS id_bit_or, bit_xor(event_id) AS id_bit_xor " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "source_entropy" ->
      ("WITH c AS (SELECT source, lang, CAST(COUNT(*) AS DOUBLE) AS n " +
        "FROM documents GROUP BY 1, 2), " +
        "t AS (SELECT source, SUM(n) AS tot FROM c GROUP BY 1) " +
        "SELECT c.source, ROUND(-SUM((n / tot) * log2(n / tot)), 6) AS lang_entropy, " +
        "CAST(SUM(n) AS BIGINT) AS n_docs " +
        "FROM c JOIN t ON c.source = t.source GROUP BY c.source ORDER BY c.source"),
    "higher_moments" ->
      ("WITH m AS (SELECT l_returnflag, AVG(l_quantity) AS m1, " +
        "AVG(l_quantity * l_quantity) AS m2r, " +
        "AVG(l_quantity * l_quantity * l_quantity) AS m3r, " +
        "AVG(l_quantity * l_quantity * l_quantity * l_quantity) AS m4r, " +
        "CAST(COUNT(*) AS BIGINT) AS n FROM lineitem GROUP BY 1) " +
        "SELECT l_returnflag, n, " +
        "ROUND((m3r - 3 * m1 * m2r + 2 * m1 * m1 * m1) / " +
        "POW(m2r - m1 * m1, 1.5), 5) AS skew_pop, " +
        "ROUND((m4r - 4 * m1 * m3r + 6 * m1 * m1 * m2r - 3 * m1 * m1 * m1 * m1) / " +
        "POW(m2r - m1 * m1, 2) - 3, 5) AS kurt_excess_pop " +
        "FROM m ORDER BY l_returnflag"),
    "sequence_match" ->
      ("WITH paths AS (SELECT user_id, " +
        "string_agg(event_type, '>' ORDER BY ts, event_id) AS path " +
        "FROM events GROUP BY user_id) " +
        "SELECT CAST(regexp_matches(path, 'view>click>purchase') AS INT) AS matched, " +
        "CAST(COUNT(*) AS BIGINT) AS n_users, " +
        "ROUND(AVG(length(path)), 2) AS avg_path_len " +
        "FROM paths GROUP BY 1 ORDER BY 1"),
    "funnel_steps_windowed" ->
      ("WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events " +
        "WHERE event_type = 'view' GROUP BY user_id), " +
        "s2 AS (SELECT e.user_id, min(e.ts) AS t2, max(s1.t1) AS t1 FROM events e " +
        "JOIN s1 ON e.user_id = s1.user_id WHERE e.event_type = 'click' " +
        "AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL 3 DAY GROUP BY e.user_id), " +
        "s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e " +
        "JOIN s2 ON e.user_id = s2.user_id WHERE e.event_type = 'purchase' " +
        "AND e.ts > s2.t2 AND e.ts <= s2.t1 + INTERVAL 3 DAY GROUP BY e.user_id) " +
        "SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type, " +
        "CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_users " +
        "UNION ALL SELECT 2, 'click', CAST((SELECT COUNT(*) FROM s2) AS BIGINT) " +
        "UNION ALL SELECT 3, 'purchase', CAST((SELECT COUNT(*) FROM s3) AS BIGINT) " +
        "ORDER BY step"),
    "text_top_bigrams" ->
      ("WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w, " +
        "generate_subscripts(string_split(text, ' '), 1) AS i FROM documents), " +
        "bg AS (SELECT w || ' ' || lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS bigram " +
        "FROM toks) " +
        "SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n FROM bg WHERE bigram IS NOT NULL " +
        "GROUP BY bigram ORDER BY n DESC, bigram LIMIT 10"),
    "sum_map" ->
      ("SELECT user_id, string_agg(kv, ',' ORDER BY kv) AS type_sums, " +
        "CAST(COUNT(*) AS BIGINT) AS n_types FROM (" +
        "SELECT user_id, event_type || ':' || " +
        "CAST(CAST(ROUND(SUM(value) * 100) AS BIGINT) AS VARCHAR) AS kv " +
        "FROM events WHERE user_id < 20 GROUP BY user_id, event_type) " +
        "GROUP BY user_id ORDER BY user_id"),
    "arg_minmax" ->
      ("SELECT user_id, arg_min(event_type, event_id) AS first_type, " +
        "arg_max(event_type, event_id) AS last_type, " +
        "max(event_id) AS last_event_id, CAST(COUNT(*) AS BIGINT) AS n_events " +
        "FROM events GROUP BY user_id ORDER BY user_id"),
    "conditional_agg" ->
      ("SELECT event_type, CAST(COUNT(*) FILTER (value > 100) AS BIGINT) AS n_big, " +
        "ROUND(SUM(value) FILTER (value > 100), 2) AS sum_big, " +
        "ROUND(AVG(value) FILTER (NOT value > 100), 4) AS avg_small, " +
        "ROUND(CAST(COUNT(*) FILTER (value > 100) AS DOUBLE) / COUNT(*), 4) AS big_ratio " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "stats_moments" ->
      ("SELECT l_returnflag, ROUND(corr(l_quantity, l_extendedprice), 5) AS corr_qty_price, " +
        "ROUND(covar_samp(l_quantity, l_extendedprice), 3) AS covar_qty_price, " +
        "ROUND(stddev_samp(l_quantity), 5) AS stddev_qty, " +
        "ROUND(var_samp(l_quantity), 4) AS var_qty, " +
        "CAST(COUNT(*) AS BIGINT) AS n " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "monthly_revenue" ->
      ("SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS month, " +
        "CAST(COUNT(*) AS BIGINT) AS n_orders, " +
        "ROUND(SUM(o_totalprice), 2) AS revenue, ROUND(AVG(o_totalprice), 3) AS avg_price " +
        "FROM orders GROUP BY 1 ORDER BY 1"),
    "running_diff" ->
      ("SELECT user_id, event_id, ROUND(value, 2) AS value, " +
        "ROUND(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 3) AS diff " +
        "FROM events WHERE user_id < 50 ORDER BY user_id, event_id"),
    "group_array" ->
      ("SELECT o_custkey, string_agg(o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses, " +
        "CAST(COUNT(*) AS BIGINT) AS n_orders " +
        "FROM orders WHERE o_custkey < 100 GROUP BY o_custkey ORDER BY o_custkey"),
    "histogram_values" ->
      ("SELECT CAST(FLOOR(value / 50) AS BIGINT) AS bucket, CAST(COUNT(*) AS BIGINT) AS n, " +
        "ROUND(AVG(value), 4) AS avg_value, " +
        "ROUND(MIN(value), 2) AS min_value, ROUND(MAX(value), 2) AS max_value " +
        "FROM events GROUP BY 1 ORDER BY 1"),
    "uniq_counts" ->
      ("SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS uniq_users, " +
        "CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS active_days, " +
        "ROUND(CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT user_id), 4) AS events_per_user " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "embedding_centroid" ->
      ("SELECT label, ROUND(sqrt(SUM(m * m)), 4) AS centroid_norm, " +
        "CAST(COUNT(*) AS BIGINT) AS dims FROM (" +
        "SELECT label, i, AVG(CAST(x AS DOUBLE)) AS m FROM (" +
        "SELECT label, unnest(embedding) AS x, " +
        "generate_subscripts(embedding, 1) - 1 AS i FROM embeddings) " +
        "GROUP BY label, i) GROUP BY label ORDER BY label"),
    "sample_split_md5" ->
      ("WITH u AS (SELECT n_chars, " +
        "CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS INTEGER) AS DOUBLE) " +
        "/ 16777216.0 AS u FROM documents) " +
        "SELECT CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split, " +
        "CAST(COUNT(*) AS BIGINT) AS n, ROUND(AVG(n_chars), 2) AS avg_chars " +
        "FROM u GROUP BY 1 ORDER BY 1")
  )
}
