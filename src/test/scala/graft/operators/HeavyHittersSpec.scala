package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def exact(df: org.apache.spark.sql.DataFrame, frac: Double) = {
    val n = df.count()
    df.groupBy("item").agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= math.ceil(frac * n))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("matches the exact GROUP BY + HAVING result on skewed data") {
    // zipf-ish: item i appears ~1000/i times
    val rows = (1 to 50).flatMap(i => Seq.fill(1000 / i)(s"t$i"))
    val df = rows.toDF("item").repartition(8) // adversarial: heavy items split
    val got = HeavyHitters.frequentItems(df, "item", 0.02)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = exact(df, 0.02)
    assert(want.nonEmpty, "fixture must have heavy hitters")
    assert(got == want)
  }

  test("result is independent of partitioning") {
    val rows = (1 to 30).flatMap(i => Seq.fill(200 / i)(s"x$i"))
    val df = rows.toDF("item")
    val a = HeavyHitters.frequentItems(df.repartition(2), "item", 0.05)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = HeavyHitters.frequentItems(df.repartition(16), "item", 0.05)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a == b && a.nonEmpty)
  }

  test("an item exactly at the ceil threshold is found") {
    // 100 'hot' in a sea of 900 distinct singletons; frac 0.1 -> need 100
    val rows = Seq.fill(100)("hot") ++ (1 to 900).map(i => s"u$i")
    val df = rows.toDF("item").repartition(4)
    val got = HeavyHitters.frequentItems(df, "item", 0.1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("hot" -> 100L))
  }

  test("weighted variant matches the exact weighted GROUP BY + HAVING on skewed data") {
    // item i carries total weight ~ 50000/i spread over 1000/i rows of
    // weight ~50 each — heavy MASS, not heavy count
    val rows = (1 to 50).flatMap(i =>
      (0 until math.max(1, 1000 / i)).map(j => (s"t$i", 40L + (i * 7 + j) % 20)))
    val df = rows.toDF("item", "wt").repartition(8)
    val got = HeavyHitters.frequentItemsWeighted(df, "item", "wt", 0.02)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = rows.map(_._2).sum
    val want = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .filter { case (_, w) => w >= math.ceil(0.02 * total) }.toMap
    assert(want.nonEmpty, "fixture must have weighted heavy hitters")
    assert(got == want)
  }

  test("weighted variant independent of partitioning; zero weights ignored") {
    val rows = (1 to 30).flatMap(i => Seq.fill(60 / i)((s"x$i", (31 - i).toLong))) ++
      Seq(("zero", 0L))
    val df = rows.toDF("item", "wt")
    val a = HeavyHitters.frequentItemsWeighted(df.repartition(2), "item", "wt", 0.05)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = HeavyHitters.frequentItemsWeighted(df.repartition(16), "item", "wt", 0.05)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a == b && a.nonEmpty)
    assert(!a.exists(_._1 == "zero"))
  }

  test("rejects a non-positive or >1 fraction") {
    val df = Seq("a").toDF("item")
    intercept[IllegalArgumentException](HeavyHitters.frequentItems(df, "item", 0.0))
    intercept[IllegalArgumentException](HeavyHitters.frequentItems(df, "item", 1.5))
  }
}
