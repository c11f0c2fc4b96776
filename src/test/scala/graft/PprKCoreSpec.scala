package graft

import graft.algos.{KCore, PageRank, Ppr}
import graft.oracle.Oracles
import org.apache.spark.sql.functions._

/** Personalized PageRank + k-core vs the plain-Scala oracles
  * (SURVEY §5.1 style: fixtures, seeded random graphs, and the
  * cross-loop consistency check PPR(S = V) == global PageRank).
  */
class PprKCoreSpec extends GraftSuite {

  import spark.implicits._

  private def seededRandomGraph(
      seed: Long,
      n: Int,
      m: Int,
  ): Seq[(Long, Long, Double)] = {
    val rnd = new scala.util.Random(seed)
    (0 until m).flatMap { _ =>
      val a = rnd.nextInt(n).toLong
      val b = rnd.nextInt(n).toLong
      if (a == b) None else Some((a, b, 1.0 + rnd.nextInt(3)))
    }.distinct
  }

  private def seedsDf(vids: Seq[Long]) =
    vids.toDF("vid")

  test("ppr matches the dense oracle on a hand fixture") {
    // diamond with a dangling sink: 1->2, 1->3, 2->4, 3->4; seed {1}
    val g = Seq((1L, 2L, 1.0), (1L, 3L, 1.0), (2L, 4L, 1.0), (3L, 4L, 1.0))
    val cfg = PrConfig(tol = 0.0, maxIter = 12)
    val got = Ppr.run(edgeDs(g), seedsDf(Seq(1L)), cfg)
      .ranks.collect().map(r => r.vid -> r.rank).toMap
    allclose(got, Oracles.ppr(g, Set(1L), cfg))
    // all mass stays in the system (teleport + dangling both restart at S)
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
    // unreached-from-seed vertices hold zero
    val g2 = g :+ ((5L, 6L, 1.0))
    val got2 = Ppr.run(edgeDs(g2), seedsDf(Seq(1L)), cfg)
      .ranks.collect().map(r => r.vid -> r.rank).toMap
    assert(got2(5L) == 0.0 && got2(6L) == 0.0)
  }

  test("ppr matches the dense oracle on seeded random graphs") {
    Seq(7L, 19L, 101L).foreach { seed =>
      val g = seededRandomGraph(seed, 30, 90)
      val verts = Oracles.verticesOf(g)
      val seeds = verts.filter(_ % 3 == 0)
      if (seeds.nonEmpty) {
        val cfg = PrConfig(tol = 0.0, maxIter = 8)
        val got = Ppr.run(edgeDs(g), seedsDf(seeds), cfg)
          .ranks.collect().map(r => r.vid -> r.rank).toMap
        allclose(got, Oracles.ppr(g, seeds.toSet, cfg))
      }
    }
  }

  test("ppr with the full vertex set as seeds equals global PageRank") {
    // reset = 1/n everywhere makes the two recurrences identical — a
    // cross-loop consistency check against the certified global loop
    val g = seededRandomGraph(23L, 25, 70)
    val cfg = PrConfig(tol = 0.0, maxIter = 8)
    val pprRanks = Ppr
      .run(edgeDs(g), seedsDf(Oracles.verticesOf(g)), cfg)
      .ranks.collect().map(r => r.vid -> r.rank).toMap
    val prRanks = PageRank.run(edgeDs(g), cfg)
      .ranks.collect().map(r => r.vid -> r.rank).toMap
    allclose(pprRanks, prRanks)
  }

  test("ppr weighted mode matches the dense oracle") {
    val g = seededRandomGraph(55L, 20, 50)
    val seeds = Oracles.verticesOf(g).take(2)
    val cfg = PrConfig(tol = 0.0, maxIter = 8, weighted = true)
    val got = Ppr.run(edgeDs(g), seedsDf(seeds), cfg)
      .ranks.collect().map(r => r.vid -> r.rank).toMap
    allclose(got, Oracles.ppr(g, seeds.toSet, cfg))
  }

  test("kcore matches hand fixtures") {
    // K4 {1,2,3,4} + a pendant path 4-5-6: 3-core = the K4, 2-core = K4,
    // 1-core = everything
    val k4 = Seq(
      (1L, 2L, 1.0), (1L, 3L, 1.0), (1L, 4L, 1.0),
      (2L, 3L, 1.0), (2L, 4L, 1.0), (3L, 4L, 1.0),
    )
    val g = k4 ++ Seq((4L, 5L, 1.0), (5L, 6L, 1.0))
    val r3 = KCore.run(edgeDs(g), 3)
    assert(r3.core.as[Long].collect().toSet == Set(1L, 2L, 3L, 4L))
    assert(KCore.run(edgeDs(g), 2).core.as[Long].collect().toSet ==
      Set(1L, 2L, 3L, 4L))
    assert(KCore.run(edgeDs(g), 1).core.as[Long].collect().toSet ==
      Set(1L, 2L, 3L, 4L, 5L, 6L))
    // everything peels when k exceeds the max degree
    assert(KCore.run(edgeDs(g), 5).core.count() == 0L)
  }

  test("kcore matches the sequential-peel oracle on seeded random graphs") {
    Seq(3L, 77L, 123L).foreach { seed =>
      val g = seededRandomGraph(seed, 30, 80)
      Seq(2, 3).foreach { k =>
        val got = KCore.run(edgeDs(g), k).core.as[Long].collect().toSet
        assert(
          got == Oracles.kcore(g, k),
          s"k-core mismatch seed=$seed k=$k",
        )
      }
    }
  }

  test("kcore peels a long path in rounds, still correct") {
    // worst-case shape for synchronous peeling: a 40-vertex path with
    // k=2 deactivates two endpoints per round — the engine must iterate
    // O(n) rounds and still land on the empty core
    val path = (0L until 39L).map(i => (i, i + 1, 1.0))
    val r = KCore.run(edgeDs(path), 2)
    assert(r.core.count() == 0L)
    assert(r.iterations >= 19)
    // a cycle through the same vertices is its own 2-core
    val cycle = path :+ ((39L, 0L, 1.0))
    assert(KCore.run(edgeDs(cycle), 2).core.count() == 40L)
  }
}
