package graft

import graft.algos.{LabelProp, Louvain, Modularity}
import graft.oracle.Oracles
import org.apache.spark.sql.functions._

/** One-level Louvain vs the plain-Scala oracle, plus the reason the
  * operator exists: it must BEAT 3-round label propagation on Newman
  * modularity (the round-4 verdict's "community optimization" gap).
  */
class LouvainSpec extends GraftSuite {

  import spark.implicits._

  private def engine(
      g: Seq[(Long, Long, Double)],
      rounds: Int = 4,
  ): Map[Long, Long] =
    Louvain.run(edgeDs(g), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("louvain matches the plain-Scala oracle on every fixture") {
    Fixtures.all.foreach { case (name, g) =>
      val got = engine(g)
      val want = Oracles.louvain(g, 4)
      assert(got == want, s"fixture $name")
    }
  }

  test("louvain matches the oracle on seeded random graphs") {
    Seq(7L, 23L, 59L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val g = (0 until 150).flatMap { _ =>
        val a = rnd.nextInt(40).toLong
        val b = rnd.nextInt(40).toLong
        if (a == b) None else Some((a, b, 1.0))
      }.distinct
      assert(engine(g) == Oracles.louvain(g, 4), s"seed $seed")
    }
  }

  test("louvain matches the oracle at odd round counts (parity gate)") {
    Seq(1, 3, 5).foreach { r =>
      assert(
        engine(Fixtures.twoCliquesBridge, r) ==
          Oracles.louvain(Fixtures.twoCliquesBridge, r),
        s"rounds=$r",
      )
    }
  }

  test("louvain resolves two bridged cliques into the two cliques") {
    val comm = engine(Fixtures.twoCliquesBridge)
    assert(comm.values.toSet.size == 2, s"wanted 2 communities: $comm")
    assert((1L to 5L).map(comm).toSet.size == 1, "left K5 split")
    assert((6L to 10L).map(comm).toSet.size == 1, "right K5 split")
  }

  test("louvain modularity beats 3-round label propagation") {
    // twoCliquesBridge: LP-3 already finds the OPTIMAL partition
    // (Q = 20/21 − 1/2), so ≥ is the strongest possible claim there —
    // louvain must reach the same optimum; on the skewed powerlaw graph
    // LP-3 is suboptimal and louvain must be STRICTLY better.
    def q(g: Seq[(Long, Long, Double)]): (Double, Double) = {
      val lv = engine(g)
      val lp = LabelProp.run(edgeDs(g), LpConfig(iterations = 3))
        .collect().map(s => s.vid -> s.label).toMap
      (Oracles.modularity(g, lv), Oracles.modularity(g, lp))
    }
    val (qLvClique, qLpClique) = q(Fixtures.twoCliquesBridge)
    assert(math.abs(qLvClique - (20.0 / 21 - 0.5)) < 1e-12, s"not optimal: $qLvClique")
    assert(qLvClique >= qLpClique)
    val (qLvPl, qLpPl) = q(Fixtures.powerlaw1k)
    assert(qLvPl > qLpPl, s"Q(louvain)=$qLvPl <= Q(lp3)=$qLpPl")
  }

  test("louvain modularity agrees with Modularity.of on the engine labels") {
    val g = Fixtures.twoCliquesBridge
    val labels = Louvain.run(edgeDs(g), 4)
      .select(col("vid"), col("comm").as("label"))
    val row = Modularity.of(edgeDs(g), labels).head()
    val want = Oracles.modularity(g, engine(g))
    assert(math.abs(row.getLong(3) / 1e7 - want) < 1e-6)
  }
}
