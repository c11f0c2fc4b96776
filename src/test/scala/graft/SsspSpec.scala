package graft

import graft.algos.{Bfs, Sssp}
import graft.oracle.Oracles
import org.apache.spark.sql.functions._

/** Weighted multi-source shortest path vs the plain-Scala Dijkstra
  * oracle (a DIFFERENT algorithm from the engine's delta Bellman-Ford —
  * agreement is evidence, not tautology).
  */
class SsspSpec extends GraftSuite {
  import spark.implicits._

  private def run(g: Seq[(Long, Long, Double)], seeds: Seq[Long]) =
    Sssp.run(edgeDs(g), seeds.toDF("vid"))

  test("sssp matches hand fixture: weighted detour beats the direct edge") {
    // 0-1 costs 10 direct, but 0-2-1 costs 2+3=5; 3 unreachable island
    val g = Seq(
      (0L, 1L, 10.0), (0L, 2L, 2.0), (2L, 1L, 3.0), (3L, 4L, 1.0),
    )
    val r = run(g, Seq(0L))
    val got = r.dists.as[(Long, Double)].collect().toMap
    assert(got == Map(0L -> 0.0, 2L -> 2.0, 1L -> 5.0))
    // both directions of an asymmetric pair merge (symmetrize sums)
    val g2 = Seq((0L, 1L, 2.0), (1L, 0L, 3.0))
    assert(run(g2, Seq(0L)).dists.as[(Long, Double)].collect().toMap ==
      Map(0L -> 0.0, 1L -> 5.0))
  }

  test("sssp matches the Dijkstra oracle on seeded random weighted graphs") {
    Seq(13L, 89L, 401L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val g = (0 until 80).flatMap { _ =>
        val a = rnd.nextInt(40).toLong
        val b = rnd.nextInt(40).toLong
        if (a == b) None
        else Some((a, b, (1 + rnd.nextInt(9)).toDouble))
      }.distinct
      val seeds = Oracles.verticesOf(g).filter(_ % 5 == 0)
      val got = run(g, seeds).dists.as[(Long, Double)].collect().toMap
      assert(
        got == Oracles.sssp(g, seeds.toSet),
        s"sssp mismatch seed=$seed",
      )
    }
  }

  test("sssp on unit weights equals BFS hop distance") {
    val rnd = new scala.util.Random(7L)
    val g = (0 until 70).flatMap { _ =>
      val a = rnd.nextInt(35).toLong
      val b = rnd.nextInt(35).toLong
      if (a == b) None else Some((a, b, 1.0))
    }.distinct
    // dedup undirected pairs so symmetrize keeps unit weights
    val und = g.filter { case (a, b, _) =>
      !g.exists(e => e._1 == b && e._2 == a) || a < b
    }
    val seeds = Seq(0L, 5L)
    val viaSssp = run(und, seeds).dists
      .select(col("vid"), col("dist").cast("long").as("dist"))
      .as[(Long, Long)].collect().toMap
    val viaBfs = Bfs.run(edgeDs(und), seeds.toDF("vid"))
      .dists.as[(Long, Long)].collect().toMap
    assert(viaSssp == viaBfs)
  }
}
