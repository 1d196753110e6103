package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Fixture-table reader (TESTDATA.md).
  *
  * Spark's parquet reader rejects INT64 TIMESTAMP(NANOS) columns
  * ([PARQUET_TYPE_ILLEGAL]) — the `events.ts` fixture column is
  * timestamp[ns]. The supported path is the `nanosAsLong` legacy conf,
  * which surfaces the raw nanosecond count as LongType; we then decode it
  * to a proper TimestampType column (micros precision, UTC session) so
  * downstream date bucketing matches the DuckDB oracle's native
  * nanosecond-timestamp reads.
  */
object Fixtures {

  private val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"

  /** Columns stored as timestamp[ns] in the fixtures, per table. */
  private val nanoColumns: Map[String, Seq[String]] = Map("events" -> Seq("ts"))

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Dynamic conf: set defensively so driver-owned sessions (Verify/smoke)
    // work without special builder flags.
    spark.conf.set(NanosConf, "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    nanoColumns.getOrElse(name, Seq.empty).foldLeft(df) { (d, c) =>
      if (d.schema.fieldNames.contains(c) && d.schema(c).dataType == LongType)
        d.withColumn(c, timestamp_micros(expr(s"$c DIV 1000")))
      else d
    }
  }

  /** Every fixture table of `dir`. */
  val TableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** SQL front door: register every fixture table as a temp view (through
    * the same nanos-decoding reader), so users can drive the engine with
    * `spark.sql("SELECT ... FROM lineitem JOIN orders ...")` — the
    * interaction model the reference's ClickHouse users already have.
    * Temp views are lazy: registration reads only parquet footers.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    TableNames.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}
