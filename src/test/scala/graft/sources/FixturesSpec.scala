package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

import graft.SparkSpec

class FixturesSpec extends SparkSpec {

  private def withSessionTz[A](tz: String)(f: => A): A = {
    val key = "spark.sql.session.timeZone"
    val old = spark.conf.get(key)
    spark.conf.set(key, tz)
    try f
    finally spark.conf.set(key, old)
  }

  /** One NTZ wall-clock row; values chosen away from any DST boundary. */
  private def ntzFrame() = {
    import spark.implicits._
    Seq("2024-01-02 03:04:05").toDF("s")
      .select(to_timestamp_ntz(col("s")).as("ts"))
  }

  test("NTZ normalization: wall clock becomes the same UTC instant in ANY session tz") {
    val wantMicros =
      java.time.Instant.parse("2024-01-02T03:04:05Z").getEpochSecond * 1000000L
    Seq("UTC", "Asia/Tokyo", "America/New_York").foreach { tz =>
      withSessionTz(tz) {
        val df = ntzFrame()
        assert(df.schema("ts").dataType == TimestampNTZType, "precondition")
        val out = Fixtures.utcNormalizeNtz(df)
        assert(out.schema("ts").dataType == TimestampType)
        val got = out.select(unix_micros(col("ts"))).collect().head.getLong(0)
        // The round-9 advice bug: to_utc_timestamp(cast, "UTC") was an
        // identity shift, so a non-UTC session produced a shifted instant
        // (Tokyo: -9h). The fix undoes the session-tz interpretation the
        // cast introduces, whatever that zone is.
        assert(got == wantMicros,
          s"session tz $tz: got micros $got, want $wantMicros " +
            s"(off by ${(got - wantMicros) / 3600000000.0} hours)")
      }
    }
  }

  test("non-NTZ columns pass through untouched") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "s")
    assert(Fixtures.utcNormalizeNtz(df).schema == df.schema)
  }

  test("fixture events.ts reads as a session-tz-independent instant") {
    val inUtc = withSessionTz("UTC") {
      Fixtures.table(spark, sf0001, "events")
        .select(unix_micros(col("ts"))).orderBy(col("ts")).limit(5)
        .collect().map(_.getLong(0)).toSeq
    }
    val inTokyo = withSessionTz("Asia/Tokyo") {
      Fixtures.table(spark, sf0001, "events")
        .select(unix_micros(col("ts"))).orderBy(col("ts")).limit(5)
        .collect().map(_.getLong(0)).toSeq
    }
    assert(inUtc == inTokyo,
      "the fixture reader must yield identical instants under any session tz")
  }
}
