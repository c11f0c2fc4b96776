package graft

import graft.algos.{LabelProp, PageRank, Triangles, Wcc}
import graft.oracle.Oracles
import org.scalacheck.{Gen, Prop, Test => ScTest}

/** Property tests (SURVEY §5.3). Pure-oracle properties run at scalacheck
  * volume; engine-vs-oracle properties run on a few seeded random graphs
  * (each engine run is a full Spark job cascade).
  */
class PropertySpec extends GraftSuite {

  private def check(p: Prop): Unit = {
    val res = ScTest.check(
      ScTest.Parameters.default
        .withMinSuccessfulTests(100)
        .withInitialSeed(org.scalacheck.rng.Seed(42L)),
      p,
    )
    assert(res.passed, res.status.toString)
  }

  private val genGraph: Gen[Seq[(Long, Long, Double)]] =
    for {
      n <- Gen.choose(2, 40)
      m <- Gen.choose(1, 120)
      pairs <- Gen.listOfN(
        m,
        for {
          a <- Gen.choose(0L, n.toLong - 1)
          b <- Gen.choose(0L, n.toLong - 1) if a != b
        } yield (a, b),
      )
    } yield pairs.distinct.map { case (a, b) => (a, b, 1.0) }

  test("oracle PR mass: sum(rank) == 1 (dangling mass redistributed)") {
    check(Prop.forAll(genGraph) { g =>
      g.isEmpty || {
        val pr = Oracles.pageRank(g, PrConfig(tol = 1e-12, maxIter = 300))
        math.abs(pr.values.sum - 1.0) < 1e-9
      }
    })
  }

  test("oracle WCC is an equivalence: endpoints share a component") {
    check(Prop.forAll(genGraph) { g =>
      g.isEmpty || {
        val c = Oracles.wcc(g)
        g.forall { case (a, b, _) => c(a) == c(b) } &&
        c.forall { case (v, comp) => comp <= v && c(comp) == comp }
      }
    })
  }

  test("oracle triangles: sum per-vertex == 3 * global; K_n == C(n,3)") {
    check(Prop.forAll(genGraph) { g =>
      g.isEmpty || {
        val (t, per) = Oracles.triangles(g)
        per.values.sum == 3 * t
      }
    })
    val k6 = for { i <- 0L to 5L; j <- (i + 1) to 5L } yield (i, j, 1.0)
    assert(Oracles.triangles(k6.toSeq)._1 == 20) // C(6,3)
  }

  test("oracle PR: relabeling vertices permutes ranks") {
    val g = Fixtures.twoCliquesBridge
    val f = (v: Long) => v * 17 + 3
    val cfg = PrConfig(tol = 0.0, maxIter = 30)
    val a = Oracles.pageRank(g, cfg)
    val b = Oracles.pageRank(
      g.map { case (s, t, w) => (f(s), f(t), w) }, cfg)
    a.foreach { case (v, r) => assert(math.abs(b(f(v)) - r) < 1e-12) }
  }

  test("engine == oracle on seeded random graphs (PR, WCC, LP, triangles)") {
    for (seed <- Seq(1, 7, 23)) {
      val r = new scala.util.Random(seed)
      val n = 30 + r.nextInt(40)
      val g = (1 to 150)
        .map(_ => (r.nextInt(n).toLong, r.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .distinct
        .map { case (a, b) => (a, b, 1.0 + r.nextInt(3).toDouble) }
      val ds = edgeDs(g)
      val cfg = PrConfig(tol = 0.0, maxIter = 15, weighted = true)
      allclose(
        PageRank.run(ds, cfg).ranks.collect().map(x => x.vid -> x.rank).toMap,
        Oracles.pageRank(g, cfg),
      )
      exactMatch(
        Wcc.run(ds).comps.collect().map(c => c.vid -> c.comp).toMap,
        Oracles.wcc(g),
      )
      // LP's argmax + smallest-label tie-break is exactly the kind of
      // semantics a random sweep catches drifting (fixture-only before)
      val lpCfg = LpConfig(iterations = 4)
      exactMatch(
        LabelProp.run(ds, lpCfg).collect()
          .map(l => l.vid -> l.label).toMap,
        Oracles.labelProp(g, lpCfg),
      )
      val tri = Triangles.run(ds)
      val (wantGlobal, wantPer) = Oracles.triangles(g)
      assert(tri.global == wantGlobal)
      // per-vertex counts exact too (global alone can mask compensating
      // double-count/miss errors across vertices)
      exactMatch(
        tri.perVertex.collect()
          .map(x => x.getLong(0) -> x.getLong(1)).toMap,
        wantPer,
      )
    }
  }
}
