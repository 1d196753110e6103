package graft.operators

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long, Double)], iters: Int): Map[Long, Double] =
    PageRank.run(edges.toDF("src", "dst", "w"), iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("symmetric two-node graph is the fixed point: every rank stays 1.0") {
    val got = ranks(Seq((1L, 2L, 3.0), (2L, 1L, 3.0)), iters = 5)
    assert(got == Map(1L -> 1.0, 2L -> 1.0))
  }

  test("matches a scalar replay of the recurrence on an asymmetric graph") {
    // A(1) -> B,C; B -> A; C -> A,B — weights deliberately uneven
    val edges = Seq(
      (1L, 2L, 2.0), (1L, 3L, 1.0),
      (2L, 1L, 1.0),
      (3L, 1L, 1.0), (3L, 2L, 3.0))
    val outW = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    var r = Map(1L -> 1.0, 2L -> 1.0, 3L -> 1.0)
    for (_ <- 1 to 5) {
      val contrib = edges
        .groupBy(_._2)
        .map { case (d, es) =>
          d -> es.map { case (s, _, w) => r(s) * w / outW(s) }.sum
        }
      r = r.keys.map(n => n -> (0.15 + 0.85 * contrib.getOrElse(n, 0.0))).toMap
    }
    val got = ranks(edges, iters = 5)
    r.foreach { case (n, want) =>
      assert(math.abs(got(n) - want) < 1e-6, s"node $n: got ${got(n)}, want $want")
    }
  }

  test("no-dangling graphs conserve total rank at |V|") {
    // ring of 6 with a chord, all nodes have out-edges
    val edges = (0L until 6L).map(i => (i, (i + 1) % 6, 1.0 + i)) :+ (0L, 3L, 2.0)
    val got = ranks(edges, iters = 5)
    assert(got.size == 6)
    assert(math.abs(got.values.sum - 6.0) < 1e-4, s"sum ${got.values.sum}")
  }

  test("dangling sink keeps (1-d) source rank and stops propagating") {
    // 1 -> 2 only: node 2 has no out-edges; after the first round node 1
    // receives nothing (r=0.15) and node 2 converges to 0.15 + 0.85*0.15
    val got = ranks(Seq((1L, 2L, 1.0)), iters = 5)
    assert(got(1L) == 0.15)
    assert(math.abs(got(2L) - (0.15 + 0.85 * 0.15)) < 1e-9, s"got ${got(2L)}")
  }

  test("redistributeDangling conserves total rank at |V| on a sink graph") {
    // 1 -> 2, 1 -> 3: nodes 2 and 3 are sinks; without redistribution the
    // default variant leaks their mass each round, with it the total stays
    // |V| = 3 (the Page et al. rank-sink fix)
    val edges = Seq((1L, 2L, 1.0), (1L, 3L, 2.0)).toDF("src", "dst", "w")
    val strict = PageRank.run(edges, iters = 8, redistributeDangling = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(strict.values.sum - 3.0) < 1e-4, s"sum ${strict.values.sum}")
    val leaky = PageRank.run(edges, iters = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(leaky.values.sum < 3.0 - 0.1, "default variant must leak sink mass")
    // weight asymmetry must survive redistribution: node 3 gets 2/3 of
    // node 1's propagated mass, node 2 gets 1/3
    assert(strict(3L) > strict(2L))
  }

  test("redistributeDangling on a no-dangling graph equals the default variant") {
    val edges = ((0L until 6L).map(i => (i, (i + 1) % 6, 1.0 + i)) :+ (0L, 3L, 2.0))
      .toDF("src", "dst", "w")
    val a = PageRank.run(edges, iters = 5).collect().toSeq
    val b = PageRank.run(edges, iters = 5, redistributeDangling = true).collect().toSeq
    assert(a == b, "no dangling nodes -> dm = 0 every round -> identical ranks")
  }

  test("broadcast mode and shuffle mode are row-identical (both variants)") {
    // the two physical regimes (score-vector broadcast over an agg-key-
    // clustered edge cache vs shuffle-on-key over the src-sorted cache)
    // must agree exactly — same association order, rounded to 6dp, so
    // any divergence is a restructure bug, not float noise
    val edges = ((0L until 8L).map(i => (i, (i * 3 + 1) % 8, 1.0 + (i % 3))) ++
      Seq((2L, 5L, 4.0), (7L, 0L, 0.5))).toDF("src", "dst", "w")
    def run(bmax: Long, dangling: Boolean) =
      PageRank.run(edges, iters = 6, redistributeDangling = dangling,
        broadcastMaxNodes = bmax).collect().map(_.toString).sorted.toSeq
    assert(run(4000000L, dangling = false) == run(0L, dangling = false))
    assert(run(4000000L, dangling = true) == run(0L, dangling = true))
  }
}
