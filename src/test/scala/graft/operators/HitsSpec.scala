package graft.operators

import graft.SparkSpec

/** Operator-level HITS checks (the oracle hash pins the fixture query;
  * these pin the recurrence itself and the broadcast/shuffle physical
  * equivalence on synthetic graphs).
  */
class HitsSpec extends SparkSpec {
  import spark.implicits._

  private val edges = Seq(
    // bipartite: left {1,2,3}, right {10,20}, uneven weights
    (1L, 10L, 2.0), (1L, 20L, 1.0),
    (2L, 10L, 3.0),
    (3L, 20L, 4.0))

  private def scores(iters: Int, bmax: Long = 4000000L): Map[(String, Long), Double] =
    Hits.run(edges.toDF("c", "s", "w"), iters, broadcastMaxNodes = bmax)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("matches a scalar replay of the normalize-each-half-round recurrence") {
    // driver-side replay with the same op order: auth = E^T.hub / ||.||,
    // hub = E.auth / ||.||, hub_0 = 1
    var hub = Map(1L -> 1.0, 2L -> 1.0, 3L -> 1.0)
    var auth = Map.empty[Long, Double]
    for (_ <- 1 to 3) {
      val ar = edges.groupBy(_._2).map { case (s, es) =>
        s -> es.map { case (c, _, w) => hub(c) * w }.sum
      }
      val az = math.sqrt(ar.values.map(a => a * a).sum)
      auth = ar.map { case (s, a) => s -> a / az }
      val hr = edges.groupBy(_._1).map { case (c, es) =>
        c -> es.map { case (_, s, w) => auth(s) * w }.sum
      }
      val hz = math.sqrt(hr.values.map(h => h * h).sum)
      hub = hr.map { case (c, h) => c -> h / hz }
    }
    val got = scores(3)
    hub.foreach { case (c, want) =>
      assert(math.abs(got(("hub", c)) - want) < 1e-6, s"hub $c")
    }
    auth.foreach { case (s, want) =>
      assert(math.abs(got(("auth", s)) - want) < 1e-6, s"auth $s")
    }
    // L2 normalization holds on both role vectors
    Seq("hub", "auth").foreach { role =>
      val n2 = got.collect { case ((r, _), v) if r == role => v * v }.sum
      assert(math.abs(n2 - 1.0) < 1e-4, s"$role not unit-norm: $n2")
    }
  }

  test("broadcast mode and shuffle mode are row-identical") {
    assert(scores(3).toSeq.sorted == scores(3, bmax = 0L).toSeq.sorted,
      "the agg-key-clustered broadcast plan and the shuffle-on-key plan " +
        "must produce identical scores")
  }
}
