package graft.catalog

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Table-name rewrite for forecast outputs.
  *
  * Mirrors the reference's intent (forecast_script.py:121-124): the output
  * table for source `t` is `bucket_forecast_<t>` with one leading `bucket_`
  * prefix stripped, so `bucket_bounce_rate` -> `bucket_forecast_bounce_rate`
  * and `plain_sales` -> `bucket_forecast_plain_sales`.
  *
  * The reference has a bug here: forecast_script.py:156 *unconditionally*
  * slices `t[7:]` when building the INSERT target, so an unprefixed source
  * table is created as `bucket_forecast_<t>` but inserted into
  * `bucket_forecast_<t-minus-7-chars>` and the run fails. We port the
  * conditional form (fs:121-124) everywhere; see NameRewriteSpec.
  */
object TableNames {
  val ForecastPrefix = "bucket_forecast_"
  val BacktestPrefix = "bucket_backtest_"

  def forecastName(source: String): String = {
    val base = if (source.startsWith("bucket_")) source.substring(7) else source
    ForecastPrefix + base
  }

  /** Output table for [[graft.job.ForecastJob.backtest]] — same
    * prefix-strip rewrite as [[forecastName]].
    */
  def backtestName(source: String): String = {
    val base = if (source.startsWith("bucket_")) source.substring(7) else source
    BacktestPrefix + base
  }

  def isForecastOutput(name: String): Boolean = name.startsWith(ForecastPrefix)

  /** Any table this library's jobs write — excluded from job input scans
    * so reruns never forecast a forecast (or backtest a backtest).
    */
  def isJobOutput(name: String): Boolean =
    isForecastOutput(name) || name.startsWith(BacktestPrefix)
}

/** A "database" rooted at a directory of parquet tables, one table per
  * `<root>/<name>.parquet` path (file or directory — Spark writes dirs).
  *
  * Replaces the reference's ClickHouse catalog surface
  * (forecast_script.py:97-151): SHOW TABLES (fs:98), DESCRIBE (fs:106),
  * EXISTS (fs:128), DROP (fs:131) and CREATE ... ENGINE=MergeTree()
  * ORDER BY date (fs:138-145). Uses the Hadoop FileSystem API throughout so
  * the same code addresses HDFS/S3/ABFS roots on a real cluster, not just
  * local disk.
  */
final class ParquetCatalog(val spark: SparkSession, val root: String) {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private val suffix = ".parquet"

  private def fs: FileSystem = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def tablePath(name: String): String = s"$root/$name$suffix"

  /** SHOW TABLES (fs:97-101): every `*.parquet` child of the root, sorted. */
  def listTables(): Seq[String] = {
    val rootPath = new Path(root)
    if (!fs.exists(rootPath)) Seq.empty
    else
      fs.listStatus(rootPath)
        .map(_.getPath.getName)
        .filter(_.endsWith(suffix))
        .map(_.dropRight(suffix.length))
        .sorted
        .toSeq
  }

  /** EXISTS TABLE (fs:128-129). */
  def tableExists(name: String): Boolean = fs.exists(new Path(tablePath(name)))

  def load(name: String): DataFrame = spark.read.parquet(tablePath(name))

  /** DESCRIBE TABLE (fs:106-111) — Spark-native: the parquet footer schema. */
  def schemaOf(name: String): StructType = load(name).schema

  /** DROP TABLE (fs:131-132). */
  def drop(name: String): Unit = {
    val p = new Path(tablePath(name))
    if (fs.exists(p)) fs.delete(p, true)
    ()
  }

  /** The reference's EXISTS -> DROP -> CREATE -> INSERT dance
    * (fs:127-151, 201-215) collapses into a single overwrite write.
    * `sortWithinPartitions(sortCol)` stands in for MergeTree's
    * `ORDER BY date` clustering (fs:142-143): parquet gets monotone
    * min/max column stats per row group, so later date-range scans prune.
    */
  /** `partitionCol` (optional) adds hive-style directory partitioning for
    * big fact tables (e.g. a derived month column): readers with
    * partition-column predicates prune whole directories before any IO —
    * the 100 TB layout for event/lineitem-scale inputs.
    */
  /** Shared write shaping for [[writeTable]] and [[replaceTable]]:
    * partitioned writes repartition ON the partition column first, so
    * each directory gets `filesPerPartition` files (default ONE) instead
    * of one per upstream task — at warehouse scale an N-task upstream
    * otherwise writes N tiny files into EVERY partition directory and
    * the file count (not the byte count) becomes the scan bottleneck.
    * The flip side of the default: one TASK also writes each directory,
    * so a huge partition value (one day of a 100 TB events table) is a
    * wall-clock straggler — callers with fat partitions pass
    * `filesPerPartition > 1` to salt each value across that many tasks
    * (deterministic row-hash salt, so reruns lay out identically),
    * trading a bounded file count per directory for write parallelism.
    */
  private def shapeForWrite(
      df: DataFrame,
      sortCol: String,
      partitionCol: Option[String],
      filesPerPartition: Int): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    require(filesPerPartition >= 1,
      s"filesPerPartition must be >= 1: $filesPerPartition")
    val clustered = partitionCol match {
      case None => df
      case Some(p) if filesPerPartition == 1 => df.repartition(col(p))
      case Some(p) =>
        df.repartition(col(p),
          pmod(xxhash64(df.columns.toIndexedSeq.map(col): _*),
            lit(filesPerPartition)))
    }
    if (clustered.columns.contains(sortCol)) clustered.sortWithinPartitions(sortCol)
    else clustered
  }

  def writeTable(
      name: String,
      df: DataFrame,
      sortCol: String = "date",
      partitionCol: Option[String] = None,
      filesPerPartition: Int = 1): Unit = {
    val out = shapeForWrite(df, sortCol, partitionCol, filesPerPartition)
    val writer = out.write.mode("overwrite")
    partitionCol.fold(writer)(p => writer.partitionBy(p)).parquet(tablePath(name))
  }

  /** Bucketed write for CO-LOCATED joins: rows are hash-partitioned into
    * `nBuckets` files on `bucketCol` at write time, and the bucket spec is
    * recorded in the session catalog (bucketing metadata cannot live in
    * parquet footers, so this goes through `saveAsTable`; the data itself
    * still lands under this catalog's root as an external table). An
    * equi-join between two tables bucketed identically on the join key
    * plans with NO Exchange on either side — the shuffle for the heaviest
    * recurring fact-to-fact joins (lineitem x orders on the order key at
    * 100 TB) is paid once at ingest instead of per query. `sortBy` within
    * buckets additionally lets sort-merge join skip its per-task sorts
    * when each bucket is a single file. The explicit repartition on the
    * bucket column (same Murmur3 hash as the bucket spec) lands each
    * bucket in EXACTLY ONE task, so the table is nBuckets files total —
    * without it, a bucketed write fans into (upstream tasks × buckets)
    * files and every later bucketed scan pays the small-files tax (the
    * round-17 dedup_incremental_admit audit measured this directly: the
    * x30 admit cycle under data-sized shuffle partitions was ~25% file-
    * listing/open overhead). At a scale where one file per bucket is too
    * big, raise nBuckets — that also raises join parallelism, the right
    * coupling. CatalogSpec pins the no-Exchange plan property.
    */
  def writeBucketed(
      name: String,
      df: DataFrame,
      bucketCol: String,
      nBuckets: Int): Unit =
    df.repartition(nBuckets, col(bucketCol))
      .write
      .mode("overwrite")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .option("path", tablePath(name))
      .format("parquet")
      .saveAsTable(name)

  /** Append into a [[writeBucketed]] table, preserving the bucket spec:
    * the batch is hash-partitioned into the SAME bucket layout, so each
    * bucket id gains one more file and every co-location property
    * (exchange-free joins, bucketed reads) survives. This is the index-
    * maintenance primitive — nightly admissions land as new per-bucket
    * files, never rewriting the stored 100 TB; Spark's bucketed scan
    * unions a bucket's files per task. The spec must match the table's
    * (Spark validates and fails loudly on drift). File-count note: the
    * bucket-column repartition makes each append add exactly ≤
    * `nBuckets` files (one per non-empty bucket); compaction cadence is the same
    * rebuild that bounds df-cap drift ([[graft.operators.Dedup
    * .admitToIncrementalIndex]]).
    */
  def appendBucketed(
      name: String,
      df: DataFrame,
      bucketCol: String,
      nBuckets: Int): Unit =
    df.repartition(nBuckets, col(bucketCol))
      .write
      .mode("append")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .option("path", tablePath(name))
      .format("parquet")
      .saveAsTable(name)

  /** Append into a plain [[writeTable]] parquet table, ONE sorted file
    * per batch: the coalesce is what delivers that — shapeForWrite
    * without a partition column keeps the upstream partitioning, which
    * after a shuffle would scatter each nightly append into
    * shuffle-partition-many tiny files (the small-files tax
    * [[compactTable]] exists to undo). Append batches are
    * bounded-per-night by contract; a batch too big for one task should
    * go through [[writeTable]]/[[replaceTable]] instead.
    */
  def appendTable(name: String, df: DataFrame, sortCol: String): Unit =
    shapeForWrite(df.coalesce(1), sortCol, None, 1)
      .write.mode("append").parquet(tablePath(name))

  /** Read back a bucketed table — must go through the session catalog so
    * the optimizer sees the bucket spec (a plain parquet read of the same
    * files would forget the hash-partitioning and re-shuffle).
    */
  def loadBucketed(name: String): DataFrame = spark.table(name)

  /** Replace a table with a plan that may READ that same table (the
    * rewrite-in-place case, e.g. a streaming MERGE applying a batch onto
    * current state): a direct overwrite would delete the files mid-scan.
    * Writes to a staging directory first (no `.parquet` suffix, so
    * listTables never sees it), then swaps via two FS metadata ops.
    * Fully distributed — nothing funnels through the driver. Plain
    * parquet has no commit log, so the rename pair is not atomic under
    * concurrent readers; a transactional table format supplies that,
    * with this same read-merge-swap operator shape.
    *
    * Durability: the live table is never deleted before its replacement
    * is in place. The swap renames current -> `<name>.old`, staging ->
    * target, then deletes the aside copy; if the second rename fails the
    * original is renamed back, and if the process dies mid-swap both the
    * staging and aside copies survive on disk for manual recovery (a
    * delete-then-rename swap would leave NO live copy on a failed
    * rename — and upsertInto calls this on every micro-batch).
    */
  def replaceTable(name: String, df: DataFrame, sortCol: String = "date",
      partitionCol: Option[String] = None,
      filesPerPartition: Int = 1): Unit = {
    val staging = new Path(s"$root/$name.staging")
    val out = shapeForWrite(df, sortCol, partitionCol, filesPerPartition)
    val writer = out.write.mode("overwrite")
    partitionCol.fold(writer)(p => writer.partitionBy(p)).parquet(staging.toString)
    val target = new Path(tablePath(name))
    val aside = new Path(s"$root/$name.old")
    if (fs.exists(aside)) fs.delete(aside, true) // leftover from a prior crash
    val hadTarget = fs.exists(target)
    if (hadTarget)
      require(fs.rename(target, aside), s"aside rename failed for $name")
    val swapped =
      try fs.rename(staging, target)
      catch { case _: Throwable => false }
    if (!swapped) {
      if (hadTarget) fs.rename(aside, target) // roll the original back in
      throw new IllegalStateException(
        s"staging swap failed for $name; original table restored")
    }
    if (hadTarget) fs.delete(aside, true)
    ()
  }

  /** Small-files compaction: rewrite a table into ~`targetRowsPerFile`
    * chunks through the same crash-safe staging swap as [[replaceTable]].
    * Streaming appends and over-parallel writes leave thousands of tiny
    * parquet files; at warehouse scale that's a name-node/listing tax and
    * a per-file open cost on every scan, and row groups too small for
    * effective column-stats pruning. One distributed job: count, then a
    * round-robin `repartition(ceil(n / target))` (even output sizes
    * regardless of input skew), sorted within partitions on `sortCol` to
    * restore min/max clustering. Hive-partitioned tables MUST pass their
    * `partitionCol`: the layout is re-applied on rewrite (shuffling on
    * the partition column so each directory compacts to whole files) —
    * without it the rewrite would silently flatten the directory layout
    * and lose partition pruning, so a partitioned-looking table with no
    * partitionCol is refused. Returns the new data-file count.
    */
  def compactTable(
      name: String,
      targetRowsPerFile: Long = 1000000L,
      sortCol: String = "date",
      partitionCol: Option[String] = None): Int = {
    require(targetRowsPerFile > 0, "targetRowsPerFile must be positive")
    val looksPartitioned = fs.listStatus(new Path(tablePath(name)))
      .exists(s => s.isDirectory && s.getPath.getName.contains("="))
    require(partitionCol.nonEmpty || !looksPartitioned,
      s"$name has a hive-partitioned layout; pass partitionCol to preserve " +
        "it (compacting without it would flatten the directories and lose " +
        "partition pruning)")
    val df = load(name)
    val n = df.count()
    partitionCol match {
      case Some(p) =>
        // the layout shuffle happens ONCE inside replaceTable's write
        // shaping; compaction's only job is to translate targetRowsPerFile
        // into that shaping's filesPerPartition (avg rows per partition
        // value / target, one cheap distinct-count to estimate). The old
        // form pre-repartitioned here AND re-shuffled in replaceTable —
        // a redundant full exchange whose `parts` never reached the layout.
        val nValues = math.max(1L, df.select(p).distinct().count())
        val fpp = math.max(1, math.ceil(
          n.toDouble / nValues / targetRowsPerFile).toInt)
        replaceTable(name, df, sortCol, partitionCol, filesPerPartition = fpp)
      case None =>
        val parts = math.max(1, math.ceil(n.toDouble / targetRowsPerFile).toInt)
        replaceTable(name, df.repartition(parts), sortCol, partitionCol)
    }
    def dataFiles(p: Path): Int = {
      val st = fs.listStatus(p)
      st.count(s => s.isFile && s.getPath.getName.endsWith(".parquet")) +
        st.filter(_.isDirectory).map(s => dataFiles(s.getPath)).sum
    }
    dataFiles(new Path(tablePath(name)))
  }

  private val interchangeFormats = Set("csv", "json", "orc")

  /** Ingest an external CSV/JSON/ORC dataset as a catalog table (converted
    * to parquet — the interchange format never becomes the storage
    * format). The schema is REQUIRED, not inferred: for text formats
    * inference costs a full extra pass over the input (ruinous at ingest
    * scale) and silently mistypes sparse or all-null columns; for ORC the
    * declared schema acts as a drift guard against whatever the files
    * claim. An explicit schema also makes malformed rows surface as
    * nulls/errors instead of schema drift.
    */
  def importTable(
      name: String,
      sourcePath: String,
      format: String,
      schema: StructType,
      options: Map[String, String] = Map.empty): Unit = {
    require(interchangeFormats.contains(format),
      s"importTable supports ${interchangeFormats.mkString("/")}, got '$format'")
    spark.read.options(options).schema(schema).format(format).load(sourcePath)
      .write.mode("overwrite").parquet(tablePath(name))
  }

  /** Ingest an external JDBC table as a catalog parquet table — the
    * Spark-native transport for what the reference pulls over
    * clickhouse-connect HTTP (forecast_script.py:82-94: one client, one
    * `SELECT *` per source table). Spark-first shape:
    *
    *  - With `partitionColumn`, the scan is split into `numPartitions`
    *    range predicates executed IN PARALLEL — each executor opens its
    *    own connection and reads one slice, so ingest bandwidth scales
    *    with the cluster instead of a single driver-side cursor (the
    *    reference's shape). Bounds default to one bounded min/max probe
    *    query (a single row to the driver).
    *  - Without it, the read is a single partition — correct but serial;
    *    fine for dimension-sized tables, wrong for fact tables.
    *  - `fetchsize` batches rows per round-trip (vendor default is often
    *    1 row — ruinous); forwarded via `options`, defaulted to 10k here.
    *
    * The JDBC source pushes projection and (for the partitioned form)
    * the range predicates down to the remote engine; anything heavier
    * (joins, aggregation) belongs on the Spark side after ingest, against
    * the columnar parquet copy, not the row-store wire format.
    */
  def importJdbc(
      name: String,
      url: String,
      dbTable: String,
      options: Map[String, String] = Map.empty,
      partitionColumn: Option[String] = None,
      bounds: Option[(Long, Long)] = None,
      numPartitions: Int = 8,
      skipTypes: Set[String] = ParquetCatalog.DefaultSkipTypes,
      keepColumns: Set[String] = Set("date")): Unit = {
    val base = Map("url" -> url, "dbtable" -> dbTable, "fetchsize" -> "10000") ++ options
    // SKIP_DATA_TYPES port (forecast_script.py:68,112): probe the remote
    // schema (the JDBC analog of the reference's DESCRIBE TABLE — a
    // zero-row prepared statement, one driver-side round trip) and drop
    // columns whose VENDOR type string contains any skip token,
    // case-insensitively. `date` (fs:112's always-keep) and the partition
    // column survive regardless. Pruning happens as a projection on the
    // Spark JDBC read, so the remote engine never ships the dropped
    // columns over the wire.
    val keptColumns: Option[Seq[String]] =
      if (skipTypes.isEmpty) None
      else {
        val keep = (keepColumns ++ partitionColumn).map(_.toLowerCase)
        val skipLower = skipTypes.map(_.toLowerCase)
        // Spark's JDBC source loads the driver class from the `driver`
        // option itself; the raw DriverManager probe needs the same
        // registration or it fails where the scan would succeed. The
        // probe connection carries every non-Spark option (ssl, role,
        // sessionInitStatement peers...) the scan would also send — a
        // user/password-only probe can fail where the scan succeeds.
        options.get("driver").foreach(Class.forName)
        // Spark 4's full JDBC option-name set (JDBCOptions is private, so
        // enumerated here; keep in sync when bumping Spark — an option
        // missing from this list gets forwarded to the raw probe as a
        // connection property, and drivers that VALIDATE properties then
        // reject the probe where the scan would succeed).
        val sparkOnly = Set("url", "dbtable", "query", "preparequery",
          "driver", "fetchsize",
          "partitioncolumn", "lowerbound", "upperbound", "numpartitions",
          "pushdownpredicate", "pushdownaggregate", "pushdownlimit",
          "pushdownoffset", "pushdowntablesample",
          "sessioninitstatement", "customschema", "querytimeout",
          "batchsize", "isolationlevel", "truncate", "cascadetruncate",
          "createtableoptions", "createtablecolumntypes",
          "keytab", "principal", "refreshkrb5config",
          "connectionprovider", "prefertimestampntz")
        val props = new java.util.Properties()
        options.foreach { case (k, v) =>
          if (!sparkOnly.contains(k.toLowerCase)) props.setProperty(k, v)
        }
        val conn = java.sql.DriverManager.getConnection(url, props)
        try {
          val probe = conn.prepareStatement(s"SELECT * FROM $dbTable WHERE 1=0")
          try {
            val md = probe.getMetaData
            val cols = (1 to md.getColumnCount).map { i =>
              (md.getColumnName(i), md.getColumnTypeName(i))
            }
            val (skipped, kept) = cols.partition { case (c, t) =>
              !keep.contains(c.toLowerCase) &&
                skipLower.exists(t.toLowerCase.contains)
            }
            skipped.foreach { case (c, t) =>
              log.info(s"importJdbc $name: skipping column with excluded data type: $c: $t")
            }
            require(kept.nonEmpty,
              s"importJdbc $name: every column of $dbTable matches a skip type " +
                s"(${skipped.map { case (c, t) => s"$c: $t" }.mkString(", ")}) — " +
                "nothing to import; relax skipTypes or add keepColumns")
            if (skipped.isEmpty) None else Some(kept.map(_._1))
          } finally probe.close()
        } finally conn.close()
      }
    val df0 = partitionColumn match {
      case Some(pc) =>
        val (lo, hi) = bounds.getOrElse {
          val b = spark.read.format("jdbc")
            .options(base + ("dbtable" ->
              s"(SELECT MIN($pc) AS plo, MAX($pc) AS phi FROM $dbTable) pb"))
            .load().collect().head
          require(!b.isNullAt(0) && !b.isNullAt(1),
            s"importJdbc: cannot derive bounds for '$pc' on empty/all-null $dbTable" +
              " — pass bounds explicitly")
          (b.getAs[Number](0).longValue, b.getAs[Number](1).longValue)
        }
        spark.read.format("jdbc")
          .options(base)
          .option("partitionColumn", pc)
          .option("lowerBound", lo.toString)
          .option("upperBound", hi.toString)
          .option("numPartitions", numPartitions.toString)
          .load()
      case None => spark.read.format("jdbc").options(base).load()
    }
    val df = keptColumns match {
      case Some(cols) =>
        // match the probe's names against the scan schema case-insensitively
        // (Derby upper-cases, ClickHouse preserves, Spark keeps the wire name)
        val byLower = df0.columns.map(c => c.toLowerCase -> c).toMap
        df0.select(cols.flatMap(c => byLower.get(c.toLowerCase)).map(df0.col): _*)
      case None => df0
    }
    df.write.mode("overwrite").parquet(tablePath(name))
  }

  /** Export a catalog table to CSV/JSON/ORC for downstream consumers
    * that can't read parquet. Partition count carries over from the
    * table — coalesce upstream if a single file is required.
    */
  def exportTable(
      name: String,
      destPath: String,
      format: String,
      options: Map[String, String] = Map.empty): Unit = {
    require(interchangeFormats.contains(format),
      s"exportTable supports ${interchangeFormats.mkString("/")}, got '$format'")
    load(name).write.mode("overwrite").options(options).format(format).save(destPath)
  }
}

object ParquetCatalog {

  /** SKIP_DATA_TYPES (forecast_script.py:68): type-name tokens whose
    * columns are dropped at JDBC ingest, by substring containment against
    * the vendor type string — so `Nullable(String)` and `Enum8('a'=1)`
    * are caught by `String`/`Enum` exactly as in the reference. The
    * reference's tokens are ClickHouse spellings; the standard-SQL/JDBC
    * spellings of the same families (CHAR/VARCHAR via `Char`, CLOB via
    * `Clob`, BOOL via `Bool`, XML) are appended so the filter bites on
    * any JDBC vendor, matched case-insensitively.
    */
  val DefaultSkipTypes: Set[String] = Set(
    "String", "Text", "Enum", "Boolean", "Blob", "Binary", "Array", "JSON",
    "UUID", // reference set, fs:68
    "Char", "Clob", "Bool", "Xml") // standard-SQL spellings, same families
}
