package graft

import graft.algos.{Eigen, Hits, LabelProp, LinkPred, Modularity}
import graft.oracle.Oracles
import org.apache.spark.sql.functions._

/** Eigenvector centrality, resource-allocation link prediction, and
  * modularity vs the plain-Scala oracles (SURVEY §5.1 style: hand
  * fixtures with closed-form answers, seeded random graphs, cap/edge
  * semantics pinned).
  */
class GraphExtrasSpec extends GraftSuite {

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

  // ---- eigenvector centrality ----

  test("eigen: cycle is regular, scores stay exactly uniform") {
    val got = Eigen.run(edgeDs(Fixtures.cycle6), EcConfig(iterations = 5))
      .scores.collect().map(s => s.vid -> s.score).toMap
    assert(got.size == 6)
    got.values.foreach(s => assert(math.abs(s - 1.0 / 6) < 1e-15))
  }

  test("eigen matches the dense oracle on fixtures") {
    Seq(Fixtures.path5, Fixtures.star, Fixtures.twoCliquesBridge,
      Fixtures.danglers).foreach { g =>
      val cfg = EcConfig(iterations = 8)
      val got = Eigen.run(edgeDs(g), cfg)
        .scores.collect().map(s => s.vid -> s.score).toMap
      allclose(got, Oracles.eigen(g, cfg))
    }
  }

  test("eigen matches the dense oracle on seeded random graphs") {
    Seq(11L, 37L, 71L).foreach { seed =>
      val g = seededRandomGraph(seed, 30, 90)
      val cfg = EcConfig(iterations = 8)
      val got = Eigen.run(edgeDs(g), cfg)
        .scores.collect().map(s => s.vid -> s.score).toMap
      allclose(got, Oracles.eigen(g, cfg))
    }
  }

  test("eigen weighted mode matches the dense oracle") {
    val g = seededRandomGraph(91L, 25, 70)
    val cfg = EcConfig(iterations = 8, weighted = true)
    val got = Eigen.run(edgeDs(g), cfg)
      .scores.collect().map(s => s.vid -> s.score).toMap
    allclose(got, Oracles.eigen(g, cfg))
  }

  test("eigen: output is L1-normalized and concentrates on the hub") {
    // star (symmetrized) is bipartite: power iteration oscillates between
    // the ±λ phases, so the hub-heavy phase shows at ODD step counts
    // (the fixed-k contract is exactly why — see Eigen's Scaladoc)
    val r = Eigen.run(edgeDs(Fixtures.star), EcConfig(iterations = 7))
    val got = r.scores.collect().map(s => s.vid -> s.score).toMap
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
    assert(got(0L) > got(1L) * 10)
    assert(r.iterations == 7 && r.edgeCount == 100) // 50 edges symmetrized
  }

  // ---- HITS hubs and authorities ----

  /** Plain-Scala mirror of Hits.run: fixed-k mutual reinforcement over the
    * DIRECTED edge multiset (Csr.build does not dedupe — a duplicated
    * (src,dst) pair scatters twice, and the oracle must too), normalizer
    * divided inside each scatter term, a_0 = 1 everywhere.
    */
  private def hitsOracle(
      g: Seq[(Long, Long, Double)],
      iters: Int,
  ): Map[Long, (Double, Double)] = {
    val edges = g.map { case (a, b, _) => (a, b) } // directed multiset
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val out = edges.groupBy(_._1)
    val in = edges.groupBy(_._2)
    var auth = verts.map(_ -> 1.0).toMap
    var aTot = verts.size.toDouble
    var hub = Map.empty[Long, Double]
    var hTot = 0.0
    (1 to iters).foreach { _ =>
      hub = verts.map { v =>
        v -> out.getOrElse(v, Nil).map(e => auth(e._2) / aTot).sum
      }.toMap
      hTot = hub.values.sum
      auth = verts.map { v =>
        v -> in.getOrElse(v, Nil).map(e => hub(e._1) / hTot).sum
      }.toMap
      aTot = auth.values.sum
    }
    verts.map(v => v -> (hub(v) / hTot, auth(v) / aTot)).toMap
  }

  private def runHits(
      g: Seq[(Long, Long, Double)],
      iters: Int,
  ): Map[Long, (Double, Double)] =
    Hits.run(edgeDs(g), iters).scores.collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap

  private def hitsClose(
      got: Map[Long, (Double, Double)],
      want: Map[Long, (Double, Double)],
      tag: String,
  ): Unit = {
    assert(got.keySet == want.keySet, s"$tag vertex sets")
    want.foreach { case (v, (h, a)) =>
      val (gh, ga) = got(v)
      assert(math.abs(gh - h) <= 1e-9 + 1e-6 * math.abs(h),
        s"$tag vid $v hub: got $gh want $h")
      assert(math.abs(ga - a) <= 1e-9 + 1e-6 * math.abs(a),
        s"$tag vid $v auth: got $ga want $a")
    }
  }

  test("hits matches the plain-Scala oracle on fixtures") {
    Seq(Fixtures.path5, Fixtures.star, Fixtures.twoCliquesBridge,
      Fixtures.danglers).foreach { g =>
      hitsClose(runHits(g, 8), hitsOracle(g, 8), s"g=${g.take(2)}")
    }
  }

  test("hits matches the plain-Scala oracle on seeded random graphs") {
    Seq(11L, 37L, 71L).foreach { seed =>
      val g = seededRandomGraph(seed, 30, 90)
      hitsClose(runHits(g, 8), hitsOracle(g, 8), s"seed $seed")
    }
  }

  test("hits: directed star separates hubs from authorities exactly") {
    // star is spoke->hub: every spoke is a pure hub (1/50 each after L1),
    // vertex 0 the sole authority — the roles HITS exists to distinguish
    val got = runHits(Fixtures.star, 8)
    assert(got(0L)._1 == 0.0)
    assert(math.abs(got(0L)._2 - 1.0) < 1e-12)
    (1L to 50L).foreach { i =>
      assert(math.abs(got(i)._1 - 1.0 / 50) < 1e-12, s"spoke $i hub")
      assert(got(i)._2 == 0.0, s"spoke $i auth")
    }
    // both output vectors are L1-normalized
    assert(math.abs(got.values.map(_._1).sum - 1.0) < 1e-12)
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-12)
  }

  test("hits: empty input returns an empty frame") {
    val r = Hits.run(edgeDs(Seq.empty), 8)
    assert(r.scores.count() == 0 && r.edgeCount == 0L)
  }

  // ---- resource-allocation link prediction ----

  private def lpScores(
      g: Seq[(Long, Long, Double)],
      maxDeg: Int,
  ): Map[(Long, Long), (Long, Double)] =
    LinkPred.resourceAllocation(edgeDs(g), maxDeg)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap

  test("linkpred matches the brute-force oracle on a hand fixture") {
    // path 1-2-3-4-5: non-adjacent pairs at distance 2 share one center
    val got = lpScores(Fixtures.path5, maxDeg = 1024)
    val want = Oracles.resourceAllocation(Fixtures.path5, 1024)
    assert(got.keySet == want.keySet)
    // (1,3) through center 2 (deg 2): cn=1, ra=1/2
    assert(got((1L, 3L)) == ((1L, 0.5)))
    want.foreach { case (k, (cn, ra)) =>
      val (gc, gr) = got(k)
      assert(gc == cn && math.abs(gr - ra) < 1e-12, s"pair $k")
    }
  }

  test("linkpred matches the brute-force oracle on seeded random graphs") {
    Seq(13L, 29L).foreach { seed =>
      val g = seededRandomGraph(seed, 25, 60)
      Seq(1024, 6).foreach { cap => // uncapped + a cap that bites
        val got = lpScores(g, cap)
        val want = Oracles.resourceAllocation(g, cap)
        assert(got.keySet == want.keySet, s"seed $seed cap $cap")
        want.foreach { case (k, (cn, ra)) =>
          val (gc, gr) = got(k)
          assert(gc == cn, s"seed $seed cap $cap pair $k cn")
          assert(math.abs(gr - ra) < 1e-12, s"seed $seed cap $cap pair $k ra")
        }
      }
    }
  }

  test("linkpred: hub centers above maxDeg are excluded entirely") {
    // star hub has deg 50 — with maxDeg 10 no wedge survives (spokes have
    // the hub as their ONLY neighbor, so no other center exists)
    assert(lpScores(Fixtures.star, maxDeg = 10).isEmpty)
    // uncapped: every spoke pair is predicted through the hub, 1/50 each
    val full = lpScores(Fixtures.star, maxDeg = 1024)
    assert(full.size == 50 * 49 / 2)
    full.values.foreach { case (cn, ra) =>
      assert(cn == 1L && math.abs(ra - 1.0 / 50) < 1e-15)
    }
  }

  test("linkpred: existing edges are never predicted") {
    val g = Fixtures.twoCliquesBridge
    val got = lpScores(g, maxDeg = 1024)
    val existing = g.map { case (a, b, _) =>
      (math.min(a, b), math.max(a, b))
    }.toSet
    assert(got.keySet.intersect(existing).isEmpty)
    // within a K5 every pair is adjacent; predictions only cross the
    // bridge neighborhood
    assert(got.contains((4L, 6L)) || got.contains((5L, 7L)))
  }

  // ---- modularity ----

  private def modQ(
      g: Seq[(Long, Long, Double)],
      labels: Map[Long, Long],
  ): (Long, Long, Long, Long) = {
    val lab = labels.toSeq.toDF("vid", "label")
    val r = Modularity.of(edgeDs(g), lab).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("modularity: two disjoint triangles, perfect partition = 0.5") {
    val g = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (1L, 3L, 1.0),
      (4L, 5L, 1.0), (5L, 6L, 1.0), (4L, 6L, 1.0))
    val labels = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 2L, 6L -> 2L)
    val (m, a, b, q) = modQ(g, labels)
    assert(m == 6 && a == 6 && b == 72)
    assert(q == 5000000L) // Q = 1 - 72/144 = 0.5
  }

  test("modularity: everything in one community = 0") {
    val g = Fixtures.twoCliquesBridge
    val labels = Oracles.verticesOf(g).map(_ -> 1L).toMap
    val (_, _, _, q) = modQ(g, labels)
    assert(q == 0L) // A = m and B = (2m)² ⇒ Q = 1 - 1 = 0 exactly
  }

  test("modularity matches the plain oracle on LP partitions of random graphs") {
    Seq(17L, 43L).foreach { seed =>
      val g = seededRandomGraph(seed, 30, 80)
      val cfg = LpConfig(iterations = 3)
      val labels = LabelProp.run(edgeDs(g), cfg)
        .collect().map(s => s.vid -> s.label).toMap
      val want = Oracles.modularity(g, labels)
      val lab = labels.toSeq.toDF("vid", "label")
      val got = Modularity.of(edgeDs(g), lab).collect().head.getLong(3)
      assert(math.abs(got - math.round(want * 1e7)) <= 1, s"seed $seed")
    }
  }

  // ---- k-truss ----

  private def trussEdges(
      g: Seq[(Long, Long, Double)],
      k: Int,
  ): Set[(Long, Long)] =
    graft.algos.KTruss.run(edgeDs(g), k)
      .edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("ktruss: two K5s keep their cliques, the bridge peels") {
    val g = Fixtures.twoCliquesBridge
    // k=4: every K5 edge sits in 3 triangles (>= 2); the bridge in 0
    val got4 = trussEdges(g, 4)
    assert(got4.size == 20 && !got4.contains((5L, 6L)))
    assert(got4 == Oracles.ktruss(g, 4))
    // k=5 (minSup 3): K5 edges still qualify exactly
    assert(trussEdges(g, 5) == got4)
    // k=6 (minSup 4 > 3): everything peels
    assert(trussEdges(g, 6).isEmpty)
  }

  test("ktruss matches the peeling oracle on seeded random graphs") {
    Seq(31L, 59L).foreach { seed =>
      val g = seededRandomGraph(seed, 20, 70)
      Seq(3, 4).foreach { k =>
        assert(trussEdges(g, k) == Oracles.ktruss(g, k), s"seed $seed k $k")
      }
    }
  }

  test("ktruss: triangle-free graphs peel to empty, empty input is empty") {
    assert(trussEdges(Fixtures.path5, 3).isEmpty)
    assert(trussEdges(Seq.empty, 3).isEmpty)
  }

  /** Three K7 cliques (stable at k=6) plus a band-4 chain that peels in
    * three cascading rounds (simulated drop sequence 33/57/24 of 177) —
    * the gradual-peel shape the incremental support-maintenance path
    * exists for.
    */
  private def cascadeFixture: Seq[(Long, Long, Double)] = {
    val cliques = for {
      base <- Seq(1000L, 1010L, 1020L)
      i <- 0 until 7
      j <- (i + 1) until 7
    } yield (base + i, base + j, 1.0)
    val chain = for {
      i <- 0L to 30L
      d <- 1L to 4L
      if i + d <= 30L
    } yield (i, i + d, 1.0)
    cliques ++ chain
  }

  test("ktruss: incremental and full support maintenance are result-identical") {
    val g = cascadeFixture
    val want = Oracles.ktruss(g, 6)
    assert(want.size == 63) // exactly the three K7s survive
    // forced-incremental: every drop round must take the incremental path
    val inc = graft.algos.KTruss.run(edgeDs(g), 6, fullRecountFactor = 1L)
    val incEdges =
      inc.edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(incEdges == want)
    assert(inc.rounds.count(_.path == "incremental") == 3,
      s"trace: ${inc.rounds}")
    assert(inc.rounds.last.path == "fixpoint")
    // forced-full and the default gate give the same surviving set
    val full = graft.algos.KTruss
      .run(edgeDs(g), 6, fullRecountFactor = Long.MaxValue)
    assert(full.edges.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == want)
    assert(full.rounds.count(_.path == "full") == 3, s"trace: ${full.rounds}")
    assert(trussEdges(g, 6) == want)
    // drop counts must agree exactly between the two paths
    assert(inc.rounds.map(_.dropped) == full.rounds.map(_.dropped))
  }

  test("ktruss: forced-incremental matches the oracle on seeded random graphs") {
    Seq(17L, 43L).foreach { seed =>
      val g = seededRandomGraph(seed, 20, 70)
      Seq(3, 4).foreach { k =>
        val r = graft.algos.KTruss.run(edgeDs(g), k, fullRecountFactor = 1L)
        val got = r.edges.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
        assert(got == Oracles.ktruss(g, k), s"seed $seed k $k")
      }
    }
  }

  // ---- deterministic random walks ----

  /** Plain-Scala mirror of Hash64.Portable.one over a string: low 60
    * bits of md5 (hex chars 18..32, 1-based) — kept in lockstep with the
    * Spark/DuckDB forms by the cross-engine golden below.
    */
  private def md5PortableHash(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(17, 32), 16)
  }

  private def walksOracle(
      g: Seq[(Long, Long, Double)],
      seeds: Seq[Long],
      steps: Int,
      maxNbrs: Int,
  ): Set[(Long, Int, Long)] = {
    val adj = g
      .flatMap { case (a, b, _) =>
        if (a == b) Nil else Seq(a -> b, b -> a)
      }
      .distinct
      .groupBy(_._1)
      .map { case (v, ns) => v -> ns.map(_._2).sorted.take(maxNbrs).toVector }
    seeds.distinct.filter(adj.contains).flatMap { s0 =>
      var cur = s0
      val rows = Seq.newBuilder[(Long, Int, Long)]
      rows += ((s0, 0, s0))
      (1 to steps).foreach { t =>
        val nbrs = adj(cur)
        val h = md5PortableHash(s"$s0,$t,$cur")
        cur = nbrs((h % nbrs.size).toInt)
        rows += ((s0, t, cur))
      }
      rows.result()
    }.toSet
  }

  private def runWalks(
      g: Seq[(Long, Long, Double)],
      seeds: Seq[Long],
      steps: Int,
      maxNbrs: Int,
      hash: graft.functions.Hash64,
  ): Set[(Long, Int, Long)] =
    graft.algos.Walks
      .run(edgeDs(g), seeds.toDF("vid"), steps, maxNbrs, hash)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .toSet

  test("walks (portable hash) replay the plain-Scala md5 oracle exactly") {
    Seq(23L, 47L).foreach { seed =>
      val g = seededRandomGraph(seed, 25, 70)
      val seeds = Oracles.verticesOf(g).filter(_ % 3 == 0)
      Seq(64, 2).foreach { cap => // uncapped-ish + a cap that bites
        val got = runWalks(g, seeds, steps = 5, cap, graft.functions.Hash64.Portable)
        val want = walksOracle(g, seeds, steps = 5, cap)
        assert(got == want, s"seed $seed cap $cap")
      }
    }
  }

  test("walks (xxhash64) are valid paths, full length, and deterministic") {
    val g = Fixtures.twoCliquesBridge
    val seeds = Seq(1L, 6L, 999L) // 999 absent from the graph
    val got = runWalks(g, seeds, steps = 6, 64, graft.functions.Hash64.Xx)
    val und = g.map { case (a, b, _) =>
      (math.min(a, b), math.max(a, b))
    }.toSet
    val byWalk = got.groupBy(_._1)
    assert(byWalk.keySet == Set(1L, 6L)) // absent seed produces nothing
    byWalk.foreach { case (wid, rows) =>
      val path = rows.toSeq.sortBy(_._2).map(_._3)
      assert(path.length == 7 && path.head == wid)
      path.sliding(2).foreach { case Seq(x, y) =>
        assert(und.contains((math.min(x, y), math.max(x, y))),
          s"walk $wid stepped off an edge: $x -> $y")
      }
    }
    val again = runWalks(g, seeds, steps = 6, 64, graft.functions.Hash64.Xx)
    assert(got == again)
  }

  // ---- GraphSAGE neighbor sampling ----

  private def neighborSampleOracle(
      g: Seq[(Long, Long, Double)],
      seeds: Seq[Long],
      fanouts: Seq[Int],
      maxNbrs: Int,
  ): Set[(Long, Int, Long, Long)] = {
    val adj = g
      .flatMap { case (a, b, _) =>
        if (a == b) Nil else Seq(a -> b, b -> a)
      }
      .distinct
      .groupBy(_._1)
      .map { case (v, ns) => v -> ns.map(_._2).sorted.take(maxNbrs).toVector }
    var frontier: Set[(Long, Long)] =
      seeds.distinct.filter(adj.contains).map(s => (s, s)).toSet
    val rows = Set.newBuilder[(Long, Int, Long, Long)]
    fanouts.zipWithIndex.foreach { case (f, i) =>
      val hop = i + 1
      val samp = frontier.toSeq.flatMap { case (seed, cur) =>
        adj.getOrElse(cur, Vector.empty)
          .sortBy(n => (md5PortableHash(s"$hop,$seed,$cur,$n"), n))
          .take(f)
          .map(n => (seed, hop, cur, n))
      }
      rows ++= samp
      frontier = samp.map { case (seed, _, _, n) => (seed, n) }.toSet
    }
    rows.result()
  }

  private def runSample(
      g: Seq[(Long, Long, Double)],
      seeds: Seq[Long],
      fanouts: Seq[Int],
      maxNbrs: Int,
      hash: graft.functions.Hash64,
  ): Set[(Long, Int, Long, Long)] =
    graft.algos.NeighborSample
      .run(edgeDs(g), seeds.toDF("vid"), fanouts, maxNbrs, hash)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("neighbor sampling (portable hash) replays the plain-Scala oracle") {
    Seq(23L, 47L).foreach { seed =>
      val g = seededRandomGraph(seed, 25, 70)
      val seeds = Oracles.verticesOf(g).filter(_ % 3 == 0)
      Seq(64, 3).foreach { cap => // uncapped-ish + a cap that bites
        val got = runSample(
          g, seeds, Seq(4, 2), cap, graft.functions.Hash64.Portable)
        val want = neighborSampleOracle(g, seeds, Seq(4, 2), cap)
        assert(got == want, s"seed $seed cap $cap")
      }
    }
  }

  test("neighbor sampling (xxhash64): fanout bounds, closure, determinism") {
    val g = Fixtures.twoCliquesBridge
    val seeds = Seq(1L, 6L, 999L) // 999 absent from the graph
    val fanouts = Seq(3, 2)
    val got = runSample(g, seeds, fanouts, 64, graft.functions.Hash64.Xx)
    val und = g.map { case (a, b, _) =>
      (math.min(a, b), math.max(a, b))
    }.toSet
    assert(got.map(_._1) == Set(1L, 6L)) // absent seed produces nothing
    got.foreach { case (_, _, s, d) =>
      assert(und.contains((math.min(s, d), math.max(s, d))),
        s"sampled a non-edge: $s -> $d")
    }
    // per (seed, hop, src) at most the hop's fanout
    got.groupBy(r => (r._1, r._2, r._3)).foreach { case ((sd, hop, src), rs) =>
      assert(rs.size <= fanouts(hop - 1),
        s"seed $sd hop $hop src $src sampled ${rs.size}")
    }
    // hop-1 srcs are exactly the seeds; hop-2 srcs are sampled hop-1 dsts
    got.filter(_._2 == 1).foreach { case (sd, _, src, _) => assert(src == sd) }
    val h1 = got.filter(_._2 == 1).groupBy(_._1)
    got.filter(_._2 == 2).foreach { case (sd, _, src, _) =>
      assert(h1(sd).exists(_._4 == src),
        s"hop-2 src $src of seed $sd was never sampled at hop 1")
    }
    val again = runSample(g, seeds, fanouts, 64, graft.functions.Hash64.Xx)
    assert(got == again)
  }

  // ---- HyperBall neighborhood sketches ----

  /** Plain-Scala HyperBall: same portable hash, same register init
    * (idx = low 4 bits, rho = 1 + trailing zeros), max-merge rounds over
    * N(v) ∪ {v}. Returns vid -> (present, s_scaled).
    */
  /** Register states per round t = 0..rounds. */
  private def hyperballRegsPerRound(
      g: Seq[(Long, Long, Double)],
      rounds: Int,
  ): Vector[Map[Long, Map[Int, Int]]] = {
    val adj = g
      .flatMap { case (a, b, _) =>
        if (a == b) Nil else Seq(a -> b, b -> a)
      }
      .distinct.groupBy(_._1).map { case (v, ns) => v -> ns.map(_._2) }
    val verts = adj.keySet
    var regs: Map[Long, Map[Int, Int]] = verts.map { v =>
      val h = md5PortableHash(v.toString) & ((1L << 60) - 1)
      val idx = (h & 15L).toInt
      val q = h >> 4
      val rho =
        if (q == 0L) 57
        else math.min(java.lang.Long.numberOfTrailingZeros(q) + 1, 57)
      v -> Map(idx -> rho)
    }.toMap
    var out = Vector(regs)
    (1 to rounds).foreach { _ =>
      regs = verts.map { v =>
        val merged = scala.collection.mutable.Map.empty[Int, Int]
        (adj(v) :+ v).foreach { u =>
          regs(u).foreach { case (i, r) =>
            if (merged.getOrElse(i, 0) < r) merged(i) = r
          }
        }
        v -> merged.toMap
      }.toMap
      out :+= regs
    }
    out
  }

  private def sScaled(m: Map[Int, Int]): Long =
    m.values.map(r => 1L << (58 - r)).sum + (16L - m.size) * (1L << 58)

  private def hyperballOracle(
      g: Seq[(Long, Long, Double)],
      rounds: Int,
  ): Map[Long, (Long, Long)] =
    hyperballRegsPerRound(g, rounds).last.map { case (v, m) =>
      v -> (m.size.toLong, sScaled(m))
    }

  test("hyperball (portable hash) registers match the plain-Scala oracle") {
    Seq(67L, 83L).foreach { seed =>
      val g = seededRandomGraph(seed, 30, 80)
      val r = graft.algos.HyperBall
        .run(edgeDs(g), rounds = 3, graft.functions.Hash64.Portable)
      val got = r.estimates.collect()
        .map(row => row.getLong(0) -> (row.getLong(1), row.getLong(2), row.getLong(3)))
        .toMap
      val want = hyperballOracle(g, 3)
      assert(got.keySet == want.keySet, s"seed $seed vertex sets")
      want.foreach { case (v, (present, s)) =>
        val (gp, gs, ge) = got(v)
        assert(gp == present && gs == s, s"seed $seed vid $v registers")
        val est = math.round(
          0.673 * ((1L << 58).toDouble * 256.0) / s.toDouble * 1e7)
        assert(math.abs(ge - est) <= 1, s"seed $seed vid $v est")
      }
    }
  }

  test("harmonic centrality matches the telescoped plain-Scala oracle") {
    def est(s: Long): Long = math.round(
      0.673 * ((1L << 58).toDouble * 256.0) / s.toDouble * 1e7)
    Seq(67L, 101L).foreach { seed =>
      val g = seededRandomGraph(seed, 30, 80)
      val r = graft.algos.HyperBall
        .harmonic(edgeDs(g), rounds = 3, graft.functions.Hash64.Portable)
      assert(r.scale == 6L) // lcm(1,2,3)
      val got = r.centralities.collect()
        .map(row => row.getLong(0) -> (row.getLong(1), row.getLong(2)))
        .toMap
      val perRound = hyperballRegsPerRound(g, 3)
      // telescoped 1/t weights for T=3, L=6: c = (-6, 3, 1, 2)
      val coefs = Seq(-6L, 3L, 1L, 2L)
      val want = perRound.last.keySet.map { v =>
        val ests = perRound.map(m => est(sScaled(m(v))))
        v -> (ests.last, ests.zip(coefs).map { case (e, c) => e * c }.sum)
      }.toMap
      assert(got == want, s"seed $seed")
      // registers only grow => ball estimates are monotone => hc >= 0
      got.values.foreach { case (_, hc) => assert(hc >= 0L) }
    }
  }

  test("closeness sum-of-distances matches the telescoped plain-Scala oracle") {
    def est(s: Long): Long = math.round(
      0.673 * ((1L << 58).toDouble * 256.0) / s.toDouble * 1e7)
    Seq(67L, 101L).foreach { seed =>
      val g = seededRandomGraph(seed, 30, 80)
      val got = graft.algos.HyperBall
        .closeness(edgeDs(g), rounds = 3, graft.functions.Hash64.Portable)
        .collect()
        .map(row => row.getLong(0) -> (row.getLong(1), row.getLong(2)))
        .toMap
      val perRound = hyperballRegsPerRound(g, 3)
      // telescoped t weights for T=3: Σ t·Δest = 3·e3 − e0 − e1 − e2
      val coefs = Seq(-1L, -1L, -1L, 3L)
      val want = perRound.last.keySet.map { v =>
        val ests = perRound.map(m => est(sScaled(m(v))))
        v -> (ests.last, ests.zip(coefs).map { case (e, c) => e * c }.sum)
      }.toMap
      assert(got == want, s"seed $seed")
      // registers only grow => ball estimates are monotone => Σd >= 0
      got.values.foreach { case (_, sd) => assert(sd >= 0L) }
    }
  }

  test("katz walk counts and Horner-scaled scores match the plain-Scala oracle") {
    Seq(41L, 97L).foreach { seed =>
      val g = seededRandomGraph(seed, 30, 80)
      val got = graft.algos.Katz.run(edgeDs(g), rounds = 4)
        .scores.collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      // the engine symmetrizes and ignores weights (WeightMode.One):
      // the oracle's adjacency is the distinct directed pair set
      val dirs = g.flatMap { case (a, b, _) => Seq(a -> b, b -> a) }.distinct
      val adj = dirs.groupMap(_._1)(_._2)
      val verts = adj.keySet
      var walks = verts.map(_ -> 1L).toMap
      var acc = verts.map(_ -> 0L).toMap
      for (_ <- 1 to 4) {
        val next = verts.map(v => v -> adj(v).map(walks).sum).toMap
        acc = verts.map(v => v -> (acc(v) * 8L + next(v))).toMap
        walks = next
      }
      assert(got == verts.map(v => v -> (walks(v), acc(v))).toMap, s"seed $seed")
    }
  }

  test("katz on a star: closed-form walk counts and scaled scores") {
    // center 0 with 5 leaves: walks alternate center<->leaves —
    // walks(c) = 5, 5, 25, 25; walks(leaf) = 1, 5, 5, 25;
    // Horner acc(c) = ((5·8+5)·8+25)·8+25 = 3105, acc(leaf) = 897
    val star = (1L to 5L).map(l => (0L, l, 1.0))
    val got = graft.algos.Katz.run(edgeDs(star), rounds = 4)
      .scores.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(0L) == ((25L, 3105L)))
    (1L to 5L).foreach(l => assert(got(l) == ((25L, 897L))))
  }

  test("stress centrality matches the plain-Scala truncated oracle") {
    import spark.implicits._
    Seq(11L, 53L).foreach { rngSeed =>
      val g = seededRandomGraph(rngSeed, 24, 60)
      val dirs = g.flatMap { case (a, b, _) => Seq(a -> b, b -> a) }.distinct
      val adj = dirs.groupMap(_._1)(_._2)
      val verts = adj.keySet
      val seedSet = verts.filter(_ % 4 == 0)
      val T = 4
      val got = graft.algos.Stress
        .run(edgeDs(g), seedSet.toSeq.toDF("vid"), rounds = T)
        .scores.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val acc = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      val present = scala.collection.mutable.Set[Long]()
      for (s <- seedSet) {
        var dist = Map(s -> 0)
        var sigma = Map(s -> 1L)
        for (t <- 1 to T) {
          val frontier = dist.filter(_._2 == t - 1).keys
          val contrib =
            scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
          for (u <- frontier; v <- adj(u) if !dist.contains(v))
            contrib(v) += sigma(u)
          dist = dist ++ contrib.keys.map(_ -> t)
          sigma = sigma ++ contrib
        }
        var gamma = Map.empty[Long, Long]
        for (t <- T to 0 by -1) {
          val level = dist.collect { case (v, d) if d == t => v }
          gamma =
            if (t == T) gamma ++ level.map(_ -> 0L)
            else gamma ++ level.map { v =>
              v -> adj(v)
                .filter(w => dist.get(w).contains(t + 1))
                .map(w => 1L + gamma(w)).sum
            }
        }
        for ((v, _) <- dist if v != s) {
          acc(v) += sigma(v) * gamma(v)
          present += v
        }
      }
      val want = present.toSeq.map(v => v -> acc(v)).toMap
      assert(got == want, s"rngSeed $rngSeed")
    }
  }

  test("stress on a path: closed-form interior counts") {
    import spark.implicits._
    // path 0-1-2-3-4, seeds {0, 4}, T=4: each seed sees the whole path;
    // interior vertices carry 4 shortest paths each, endpoints 0
    val path = Seq((0L, 1L, 1.0), (1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 4L, 1.0))
    val got = graft.algos.Stress
      .run(edgeDs(path), Seq(0L, 4L).toDF("vid"), rounds = 4)
      .scores.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 4L, 2L -> 4L, 3L -> 4L, 4L -> 0L))
  }

  test("neighborhood function matches the plain-Scala sums and the 90% test") {
    def est(s: Long): Long = math.round(
      0.673 * ((1L << 58).toDouble * 256.0) / s.toDouble * 1e7)
    Seq(67L, 101L).foreach { seed =>
      val g = seededRandomGraph(seed, 30, 80)
      val got = graft.algos.HyperBall
        .neighborhoodFunction(edgeDs(g), rounds = 3,
          graft.functions.Hash64.Portable)
        .collect()
        .map(r => r.getInt(0) -> ((r.getLong(1), r.getBoolean(2))))
        .toMap
      val perRound = hyperballRegsPerRound(g, 3)
      val sums = perRound.map(_.values.map(m => est(sScaled(m))).sum)
      val want = sums.zipWithIndex.map { case (s, t) =>
        t -> ((s, s * 10 >= sums.last * 9))
      }.toMap
      assert(got == want, s"seed $seed")
      // registers only grow => N(t) is monotone; the last round always
      // reaches its own 90%
      (1 to 3).foreach(t => assert(got(t)._1 >= got(t - 1)._1, s"t=$t"))
      assert(got(3)._2)
    }
  }

  test("hyperball estimates grow with radius and land near truth on a clique") {
    // K5+K5+bridge: by round 2 every vertex's ball is the whole graph
    val g = Fixtures.twoCliquesBridge
    def ests(rounds: Int) = graft.algos.HyperBall
      .run(edgeDs(g), rounds, graft.functions.Hash64.Xx)
      .estimates.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val e1 = ests(1)
    val e3 = ests(3)
    e1.foreach { case (v, e) => assert(e3(v) >= e, s"vid $v shrank") }
    // raw HLL with m=16 is coarse (σ ≈ 26%, no small-range correction):
    // assert the 10-vertex truth within a generous band, not precision
    e3.values.foreach { e =>
      assert(e > 10L * 1e7 / 4 && e < 10L * 1e7 * 4, s"est_e7 $e")
    }
  }

  // ---- maximal independent set (Luby, hash priorities) ----

  /** Plain-Scala Luby with the same portable (round, vid) priorities. */
  private def lubyOracle(g: Seq[(Long, Long, Double)]): Set[Long] = {
    val adj = g
      .flatMap { case (a, b, _) =>
        if (a == b) Nil else Seq(a -> b, b -> a)
      }
      .distinct.groupBy(_._1)
      .map { case (v, ns) => v -> ns.map(_._2).toSet }
    var active = adj.keySet
    var mis = Set.empty[Long]
    var r = 0
    while (active.nonEmpty) {
      r += 1
      val h = active.iterator.map { v =>
        v -> (md5PortableHash(s"$r,$v") & ((1L << 60) - 1))
      }.toMap
      val winners = active.filter { v =>
        val mine = (h(v), v)
        adj(v).intersect(active).forall { u =>
          implicitly[Ordering[(Long, Long)]].lt(mine, (h(u), u))
        }
      }
      mis ++= winners
      active = active -- winners -- winners.flatMap(adj)
    }
    mis
  }

  test("mis (portable hash) matches the plain-Scala Luby oracle") {
    Seq(13L, 67L, 101L).foreach { seed =>
      val g = seededRandomGraph(seed, 40, 120)
      val r = graft.algos.Mis
        .run(edgeDs(g), graft.functions.Hash64.Portable)
      val got = r.mis.collect().map(_.getLong(0)).toSet
      assert(got == lubyOracle(g), s"seed $seed")
    }
  }

  test("mis is independent and maximal (production hash)") {
    (Seq(Fixtures.path5, Fixtures.star, Fixtures.twoCliquesBridge) ++
      Seq(31L, 47L).map(seededRandomGraph(_, 35, 100))).foreach { g =>
      val mis = graft.algos.Mis.run(edgeDs(g)).mis
        .collect().map(_.getLong(0)).toSet
      val und = g.flatMap { case (a, b, _) =>
        if (a == b) Nil else Seq(a -> b, b -> a)
      }.distinct
      // independence: no edge inside the set
      und.foreach { case (a, b) =>
        assert(!(mis(a) && mis(b)), s"edge ($a,$b) inside MIS")
      }
      // maximality: every outside vertex has a MIS neighbor
      val adj = und.groupBy(_._1).map { case (v, ns) => v -> ns.map(_._2) }
      adj.keys.filterNot(mis).foreach { v =>
        assert(adj(v).exists(mis), s"vid $v addable — not maximal")
      }
    }
  }

  // ---- Jones-Plassmann coloring ----

  /** Sequential greedy coloring along DECREASING (portable-hash, vid)
    * priority — exactly the fixpoint JP computes: when v is processed,
    * precisely its higher-priority neighbors are colored.
    */
  private def jpOracle(g: Seq[(Long, Long, Double)]): Map[Long, Long] = {
    val adj = g
      .flatMap { case (a, b, _) =>
        if (a == b) Nil else Seq(a -> b, b -> a)
      }
      .distinct.groupBy(_._1).map { case (v, ns) => v -> ns.map(_._2).toSet }
    val pri = adj.keySet.iterator
      .map(v => v -> (md5PortableHash(v.toString) & ((1L << 60) - 1)))
      .toMap
    val order = adj.keySet.toSeq.sortBy(v => (pri(v), v)).reverse
    val color = scala.collection.mutable.Map.empty[Long, Long]
    order.foreach { v =>
      val used = adj(v).flatMap(color.get)
      color(v) = Iterator.iterate(0L)(_ + 1L).find(k => !used.contains(k)).get
    }
    color.toMap
  }

  test("JP coloring matches sequential greedy along priority order") {
    Seq(13L, 67L, 101L).foreach { seed =>
      val g = seededRandomGraph(seed, 40, 120)
      val r = graft.algos.Coloring
        .run(edgeDs(g), graft.functions.Hash64.Portable)
      val got = r.colors.collect()
        .map(row => row.getLong(0) -> row.getLong(1)).toMap
      assert(got == jpOracle(g), s"seed $seed")
    }
  }

  /** Plain-Scala replay of Coloring.speculative: hash-palette init, then
    * synchronous recolor-if-outranked-same-color with mex over distinct
    * current neighbor colors, until conflict-free.
    */
  private def specColoringOracle(
      g: Seq[(Long, Long, Double)],
      palette: Int,
  ): Map[Long, Long] = {
    val adj = g
      .flatMap { case (a, b, _) =>
        if (a == b) Nil else Seq(a -> b, b -> a)
      }
      .distinct.groupBy(_._1).map { case (v, ns) => v -> ns.map(_._2).toSet }
    val pri = adj.keySet.iterator
      .map(v => v -> (md5PortableHash(v.toString) & ((1L << 60) - 1)))
      .toMap
    var color = pri.map { case (v, h) => v -> (h % palette) }
    var changed = true
    while (changed) {
      val conf = adj.keySet.filter(v => adj(v).exists(u =>
        color(u) == color(v) &&
          implicitly[Ordering[(Long, Long)]].gt((pri(u), u), (pri(v), v))))
      changed = conf.nonEmpty
      val snapshot = color
      color = color.map { case (v, c) =>
        if (!conf(v)) v -> c
        else {
          val used = adj(v).map(snapshot)
          v -> Iterator.iterate(0L)(_ + 1L).find(k => !used.contains(k)).get
        }
      }
    }
    color
  }

  test("speculative coloring matches the plain-Scala replay and is proper") {
    Seq(13L, 67L, 101L).foreach { seed =>
      val g = seededRandomGraph(seed, 40, 120)
      // palette 4 on a dense-ish 40-vertex graph: initial conflicts are
      // plentiful, so the recolor cascade is exercised for real
      val r = graft.algos.Coloring
        .speculative(edgeDs(g), palette = 4,
          hash = graft.functions.Hash64.Portable)
      val got = r.colors.collect()
        .map(row => row.getLong(0) -> row.getLong(1)).toMap
      assert(got == specColoringOracle(g, 4), s"seed $seed")
      g.foreach { case (a, b, _) =>
        if (a != b) assert(got(a) != got(b), s"seed $seed edge ($a,$b)")
      }
    }
  }

  test("JP coloring is proper and within Δ+1 (production hash)") {
    (Seq(Fixtures.path5, Fixtures.star, Fixtures.twoCliquesBridge) ++
      Seq(31L, 47L).map(seededRandomGraph(_, 35, 100))).foreach { g =>
      val colors = graft.algos.Coloring.run(edgeDs(g)).colors
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val und = g.flatMap { case (a, b, _) =>
        if (a == b) Nil else Seq(a -> b, b -> a)
      }.distinct
      und.foreach { case (a, b) =>
        assert(colors(a) != colors(b), s"edge ($a,$b) monochrome")
      }
      val maxDeg = und.groupBy(_._1).values.map(_.size).max
      assert(colors.values.max <= maxDeg.toLong,
        s"χ ${colors.values.max + 1} > Δ+1 ${maxDeg + 1}")
      // deterministic under the production hash too
      val again = graft.algos.Coloring.run(edgeDs(g)).colors
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(colors == again)
    }
  }

  // ---- plan pins (PlanShapeSpec style) ----

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("eigen superstep message path = exactly one exchange") {
    withConf(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    ) {
      val edges = edgeDs(Fixtures.powerlaw1k)
      val p = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val adj = Csr.build(edges, p).localCheckpoint(true)
      val state = Superstep.vertices(edges)
        .select(col("vid"), lit(1.0).as("score"))
        .localCheckpoint(true)
      val msgs = Superstep.scatter(adj.as[AdjBlock], state)
        .select(col("vid"), (col("w") * col("score") / lit(20.0)).as("m"))
        .groupBy("vid").agg(sum("m").as("msg"))
      val plan = msgs.queryExecution.executedPlan.toString
      val ex = "Exchange".r.findAllIn(plan).length
      assert(ex == 1, s"eigen msgs: expected 1 exchange, got $ex:\n$plan")
    }
  }

  test("linkpred: wedge self-join is keyed on the center, never nested-loop") {
    withConf(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    ) {
      val plan = LinkPred
        .resourceAllocation(edgeDs(Fixtures.powerlaw1k), maxDeg = 64)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), plan.take(2000))
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    }
  }

  test("modularity: the LP partition beats the trivial one on cliques") {
    val g = Fixtures.twoCliquesBridge
    val labels = LabelProp.run(edgeDs(g), LpConfig(iterations = 5))
      .collect().map(s => s.vid -> s.label).toMap
    val lab = labels.toSeq.toDF("vid", "label")
    val q = Modularity.of(edgeDs(g), lab).collect().head.getLong(3)
    assert(q > 3000000L) // two-clique split scores well above 0.3
  }
}
