package graft

import org.apache.spark.sql.{Dataset, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for every suite (one JVM, Test/fork := true). */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class GraftSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.spark

  def edgeDs(edges: Seq[(Long, Long, Double)]): Dataset[Edge] = {
    import spark.implicits._
    spark.createDataset(edges.map { case (s, t, w) => Edge(s, t, w) })
  }

  /** numpy-style allclose, stricter than the 1e-6 contract. */
  def allclose(
      got: Map[Long, Double],
      want: Map[Long, Double],
      atol: Double = 1e-9,
      rtol: Double = 1e-6,
  ): Unit = {
    assert(got.keySet == want.keySet, "vertex sets differ")
    want.foreach { case (v, w) =>
      val g = got(v)
      assert(
        math.abs(g - w) <= atol + rtol * math.abs(w),
        s"vertex $v: got $g want $w",
      )
    }
  }

  def exactMatch(got: Map[Long, Long], want: Map[Long, Long]): Unit = {
    assert(got.keySet == want.keySet, "vertex sets differ")
    val bad = want.collect {
      case (v, w) if got(v) != w => s"$v: got ${got(v)} want $w"
    }
    assert(bad.isEmpty, bad.take(10).mkString("; "))
  }
}

/** Golden fixture graphs (FIXTURES.md §2). */
object Fixtures {
  val path5: Seq[(Long, Long, Double)] =
    Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 4L, 1.0), (4L, 5L, 1.0))

  val cycle6: Seq[(Long, Long, Double)] =
    (1L to 6L).map(i => (i, if (i == 6) 1L else i + 1, 1.0))

  /** hub 0 + 50 spokes, all edges spoke -> hub (spokes dangle only via
    * hub's lack of out-edges; hub is the dangler).
    */
  val star: Seq[(Long, Long, Double)] =
    (1L to 50L).map(i => (i, 0L, 1.0))

  /** K5 on 1..5 and 6..10, bridge 5-6. Undirected as canonical pairs. */
  val twoCliquesBridge: Seq[(Long, Long, Double)] = {
    def k5(off: Long) =
      for {
        i <- 1L to 5L; j <- (i + 1) to 5L
      } yield (i + off, j + off, 1.0)
    (k5(0) ++ k5(5) :+ ((5L, 6L, 1.0))).toSeq
  }

  /** graph with zero-outdegree vertices (dangling-mass semantics). */
  val danglers: Seq[(Long, Long, Double)] =
    Seq((1L, 2L, 1.0), (1L, 3L, 2.0), (2L, 3L, 1.0), (4L, 1L, 1.0))

  /** Seeded skewed random graph, ~1k vertices — realistic hub skew. */
  lazy val powerlaw1k: Seq[(Long, Long, Double)] = {
    val r = new scala.util.Random(42)
    def v(): Long = (math.pow(r.nextDouble(), 2.5) * 1000).toLong
    val raw = (1 to 4000).map(_ => (v(), v()))
    raw
      .filter { case (a, b) => a != b }
      .groupBy(identity)
      .map { case ((a, b), xs) => (a, b, xs.size.toDouble) }
      .toSeq
      .sortBy(e => (e._1, e._2))
  }

  val all: Map[String, Seq[(Long, Long, Double)]] = Map(
    "path5" -> path5,
    "cycle6" -> cycle6,
    "star" -> star,
    "twoCliquesBridge" -> twoCliquesBridge,
    "danglers" -> danglers,
    "powerlaw1k" -> powerlaw1k,
  )
}
