package graft

import graft.algos.Bfs
import graft.oracle.Oracles
import org.apache.spark.sql.functions._

/** Multi-source BFS vs the plain-Scala BFS oracle. */
class BfsSpec extends GraftSuite {
  import spark.implicits._

  private def run(g: Seq[(Long, Long, Double)], seeds: Seq[Long]) =
    Bfs.run(edgeDs(g), seeds.toDF("vid"))

  test("bfs matches hand fixture: path with seed at one end") {
    val path = (0L until 9L).map(i => (i, i + 1, 1.0))
    val r = run(path, Seq(0L))
    val got = r.dists.as[(Long, Long)].collect().toMap
    assert(got == (0L to 9L).map(v => v -> v).toMap)
    // frontier BFS runs exactly maxHop+1 rounds (last round finds nothing)
    assert(r.iterations == 10)
    // disconnected vertices are absent, multi-seed takes the min
    val g2 = path ++ Seq((20L, 21L, 1.0))
    val got2 = run(g2, Seq(0L, 9L)).dists.as[(Long, Long)].collect().toMap
    assert(!got2.contains(20L) && !got2.contains(21L))
    assert(got2(5L) == 4L && got2(0L) == 0L && got2(9L) == 0L)
  }

  test("bfs matches the oracle on seeded random graphs") {
    Seq(11L, 47L, 203L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val g = (0 until 60).flatMap { _ =>
        val a = rnd.nextInt(40).toLong
        val b = rnd.nextInt(40).toLong
        if (a == b) None else Some((a, b, 1.0))
      }.distinct
      val seeds = Oracles.verticesOf(g).filter(_ % 5 == 0)
      val got = run(g, seeds).dists.as[(Long, Long)].collect().toMap
      assert(
        got == Oracles.bfs(g, seeds.toSet),
        s"bfs mismatch seed=$seed",
      )
    }
  }

  test("bfs with no seed present in the graph returns empty") {
    val g = Seq((1L, 2L, 1.0), (2L, 3L, 1.0))
    assert(run(g, Seq(99L)).dists.count() == 0L)
  }
}
