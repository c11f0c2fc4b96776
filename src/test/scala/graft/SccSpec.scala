package graft

import graft.algos.Scc
import graft.oracle.Oracles

/** Strongly-connected components vs the plain-Scala iterative-Tarjan
  * oracle (a DIFFERENT algorithm from the engine's trim+FW-BW min-label
  * peeling — agreement is evidence, not tautology).
  */
class SccSpec extends GraftSuite {
  import spark.implicits._

  private def run(g: Seq[(Long, Long, Double)]) = Scc.run(edgeDs(g))

  private def got(g: Seq[(Long, Long, Double)]): Map[Long, Long] =
    run(g).comps.as[(Long, Long)].collect().toMap

  test("scc hand fixtures: cycle, chain, bridge, bow-tie") {
    // one 4-cycle → one SCC rooted at its min
    val cycle = Seq((3L, 5L), (5L, 9L), (9L, 4L), (4L, 3L))
      .map { case (a, b) => (a, b, 1.0) }
    assert(got(cycle) == Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 4L -> 3L))

    // directed chain → all singletons (the pure-trim path: FB alone
    // would peel one end per round)
    val chain = (0L until 6L).map(i => (i, i + 1, 1.0))
    val chainRes = run(chain)
    assert(chainRes.comps.as[(Long, Long)].collect().toMap ==
      (0L to 6L).map(v => v -> v).toMap)
    assert(chainRes.peels == 1, s"chain should fully trim in one peel")

    // two cycles joined by a one-way bridge → two SCCs, bridge respected
    val two = Seq(
      (0L, 1L, 1.0), (1L, 0L, 1.0), // SCC {0,1}
      (1L, 7L, 1.0), // bridge, one-way
      (7L, 8L, 1.0), (8L, 7L, 1.0), // SCC {7,8}
    )
    assert(got(two) == Map(0L -> 0L, 1L -> 0L, 7L -> 7L, 8L -> 7L))

    // bow-tie: tendril-in → core 3-cycle → tendril-out
    val bow = Seq(
      (10L, 1L, 1.0), // in-tendril
      (1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 1L, 1.0), // core
      (3L, 20L, 1.0), // out-tendril
    )
    assert(got(bow) ==
      Map(10L -> 10L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 20L -> 20L))
  }

  test("scc ignores self-loops and duplicate edges") {
    val g = Seq(
      (4L, 4L, 1.0), (4L, 6L, 1.0), (4L, 6L, 1.0), (6L, 4L, 1.0),
    )
    assert(got(g) == Map(4L -> 4L, 6L -> 4L))
  }

  test("scc matches the Tarjan oracle on seeded random directed graphs") {
    Seq(17L, 211L, 977L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      // mean out-degree ~2.5: past the giant-SCC threshold, so the
      // fixture has one giant component + tendrils + small cycles
      val g = (0 until 100).flatMap { _ =>
        val a = rnd.nextInt(40).toLong
        val b = rnd.nextInt(40).toLong
        if (a == b) None else Some((a, b, 1.0))
      }.distinct
      val r = run(g)
      val want = Oracles.scc(g)
      assert(r.comps.as[(Long, Long)].collect().toMap == want,
        s"scc mismatch seed=$seed")
      // the random graphs must exercise a real multi-vertex SCC
      assert(want.groupBy(_._2).values.map(_.size).max > 1,
        s"fixture degenerate (all singletons) seed=$seed")
    }
  }

  test("scc on a symmetrized graph equals WCC components") {
    val rnd = new scala.util.Random(31L)
    val und = (0 until 50).flatMap { _ =>
      val a = rnd.nextInt(30).toLong
      val b = rnd.nextInt(30).toLong
      if (a == b) None else Some((a, b, 1.0))
    }.distinct
    // both directions present → strong connectivity == weak connectivity
    val sym = und ++ und.map { case (a, b, w) => (b, a, w) }
    assert(got(sym.distinct) == Oracles.wcc(und))
  }
}
