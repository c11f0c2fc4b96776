package graft

import org.apache.spark.sql.functions._

class EdgeBuilderSpec extends GraftSuite {
  import spark.implicits._

  private def sf(repo: String, path: String, commit: String) =
    SourceFile(repo, path, commit, "scala", s"$repo:$path@$commit:scala")

  private val tiny = Seq(
    sf("r1", "A", "c1"),
    sf("r1", "B", "c1"),
    sf("r1", "C", "c1"),
    sf("r1", "A", "c2"),
    sf("r1", "B", "c2"),
    sf("r2", "D", "c3"),
    // duplicate row: same file+commit listed twice must not double edges
    sf("r1", "A", "c1"),
  )

  private def vid(key: String): Long =
    spark.range(1).select(xxhash64(lit(key))).head().getLong(0)

  test("co-occurrence edges: dedup, no self-loops, weight = #shared commits") {
    val src = spark.createDataset(tiny)
    val edges = EdgeBuilder.edges(src).collect()
      .map(e => (e.src, e.dst) -> e.weight).toMap
    val (a, b, c) = (vid("r1/A"), vid("r1/B"), vid("r1/C"))
    def k(x: Long, y: Long) = (math.min(x, y), math.max(x, y))
    assert(edges.keySet == Set(k(a, b), k(a, c), k(b, c)))
    assert(edges(k(a, b)) == 2.0) // A,B share c1 and c2
    assert(edges(k(a, c)) == 1.0)
    assert(edges(k(b, c)) == 1.0)
    edges.keys.foreach { case (s, d) => assert(s < d, "orientation src<dst") }
  }

  test("maxGroup cap: huge group becomes a star, connectivity preserved") {
    val big = (1 to 10).map(i => sf("r", s"F$i", "chub")) :+ sf("r", "G", "c9")
    val src = spark.createDataset(big)
    val capped = EdgeBuilder.edges(src, EdgeConfig(maxGroup = 4)).collect()
    // star: 9 edges from min-vid member instead of C(10,2)=45
    assert(capped.length == 9)
    val srcs = capped.map(_.src).distinct
    assert(srcs.length == 1, "star centre is the single min vid")
    assert(srcs.head == capped.map(e => math.min(e.src, e.dst)).min)
    // uncapped emits the full clique
    val full = EdgeBuilder.edges(src, EdgeConfig(maxGroup = 1024)).collect()
    assert(full.length == 45)
  }

  test("byPath links files sharing a path across repos") {
    val cross = Seq(sf("r1", "X", "c1"), sf("r2", "X", "c2"))
    val src = spark.createDataset(cross)
    val none = EdgeBuilder.edges(src).collect()
    assert(none.isEmpty)
    val withPath =
      EdgeBuilder.edges(src, EdgeConfig(byPath = true)).collect()
    assert(withPath.length == 1)
  }

  test("vertex dictionary: distinct keys, collision assert passes") {
    val v = EdgeBuilder.vertices(spark.createDataset(tiny))
    EdgeBuilder.assertNoCollisions(v)
    assert(v.count() == 4) // A,B,C in r1 + D in r2
  }

  test("resolveCollisions repairs planted collisions deterministically") {
    import spark.implicits._
    // real xxhash64 string collisions can't be crafted, so plant
    // duplicate vids directly: the dictionary contract is on (vid, key)
    // rows, which is exactly what resolveCollisions consumes
    val planted = Seq(
      VertexKey(1L, "r/a"), VertexKey(1L, "r/b"), VertexKey(1L, "r/c"),
      VertexKey(2L, "r/d"),
      VertexKey(3L, "r/e"), VertexKey(3L, "r/f"),
    )
    def run() = EdgeBuilder
      .resolveCollisions(spark.createDataset(planted))
      .collect().map(v => v.key -> v.vid).toMap
    val got = run()
    // all keys survive with distinct ids
    assert(got.keySet == planted.map(_.key).toSet)
    assert(got.values.toSet.size == planted.length)
    // the smallest key of each colliding vid KEEPS it; others rehash
    assert(got("r/a") == 1L && got("r/e") == 3L && got("r/d") == 2L)
    assert(got("r/b") != 1L && got("r/c") != 1L && got("r/f") != 3L)
    // pure function of the key set: re-run identical
    assert(run() == got)
    // collision-free dictionaries pass through untouched
    val clean = EdgeBuilder.vertices(spark.createDataset(tiny))
    val resolved = EdgeBuilder.resolveCollisions(clean)
      .collect().map(v => v.key -> v.vid).toMap
    assert(resolved == clean.collect().map(v => v.key -> v.vid).toMap)
  }

  test("symmetrize doubles directed edges and merges weights") {
    val e = edgeDs(Seq((1L, 2L, 2.0), (2L, 1L, 3.0), (2L, 3L, 1.0)))
    val s = EdgeBuilder.symmetrize(e).collect()
      .map(x => (x.src, x.dst) -> x.weight).toMap
    assert(s == Map((1L, 2L) -> 5.0, (2L, 1L) -> 5.0,
      (2L, 3L) -> 1.0, (3L, 2L) -> 1.0))
  }

  test("csr round-trip: unpack(build(edges)) == normalized edges") {
    val g = Fixtures.powerlaw1k
    val e = edgeDs(g)
    val adj = Csr.build(e, 8, Csr.WeightMode.Raw, maxDegPerBlock = 16)
    val back = Csr.unpack(adj).collect()
      .map(x => (x.src, x.dst, x.weight)).sorted
    assert(back.toSeq == g.sorted)
    assert(Csr.edgeCount(adj) == g.length)
  }

  test("csr normalized weights sum to 1 per source") {
    val e = edgeDs(Fixtures.danglers)
    val adj = Csr.build(e, 8, Csr.WeightMode.NormWeighted)
    val sums = Csr.unpack(adj).groupBy("src").agg(sum("weight").as("s"))
      .collect().map(_.getDouble(1))
    sums.foreach(s => assert(math.abs(s - 1.0) < 1e-12))
  }

  test("source scan prunes content column for edge building") {
    val src = spark.createDataset(tiny)
    val plan = EdgeBuilder.edges(src).queryExecution.optimizedPlan.toString
    assert(!plan.contains("content"), "content must be pruned:\n" + plan)
  }
}
