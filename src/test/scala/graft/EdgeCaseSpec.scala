package graft

import graft.algos.{LabelProp, PageRank, Triangles, Wcc}
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Degenerate-input behavior: a 100 TB pipeline WILL see empty
  * partitions, empty filters, and single-vertex graphs — none of them
  * may crash or return a malformed frame.
  */
class EdgeCaseSpec extends GraftSuite {
  import spark.implicits._

  test("all four algorithms handle an empty edge set") {
    val empty = edgeDs(Seq.empty)
    assert(PageRank.run(empty, PrConfig(maxIter = 3)).ranks.count() == 0L)
    assert(Wcc.run(empty, maxIter = 3).comps.count() == 0L)
    assert(LabelProp.run(empty, LpConfig(iterations = 2)).count() == 0L)
    val tri = Triangles.run(empty)
    assert(tri.global == 0L && tri.perVertex.count() == 0L)
    val triG = Triangles.run(empty, perVertex = false)
    // the typed empty frame must be selectable (round-2 ADVICE item)
    assert(triG.perVertex.select(col("vid"), col("triangles")).count() == 0L)
  }

  test("single-edge graph: every algorithm returns the hand result") {
    val one = edgeDs(Seq((1L, 2L, 1.0)))
    val pr = PageRank.run(one, PrConfig(maxIter = 5)).ranks.collect()
      .map(r => r.vid -> r.rank).toMap
    assert(pr.keySet == Set(1L, 2L) && pr(2L) > pr(1L))
    val wcc = Wcc.run(one).comps.collect().map(c => c.vid -> c.comp).toMap
    assert(wcc == Map(1L -> 1L, 2L -> 1L))
    val tri = Triangles.run(one)
    assert(tri.global == 0L)
  }

  test("jaccardPairsWithin matches a plain-Scala oracle on random docs") {
    for (seed <- Seq(3, 11)) {
      val r = new scala.util.Random(seed)
      val vocab = ('a' to 'p').map(_.toString)
      val docs = (0 until 40).map { i =>
        val n = 2 + r.nextInt(8)
        val toks = (0 until n).map(_ => vocab(r.nextInt(vocab.size)))
        (i.toLong, s"blk${i % 3}", toks.mkString(" "))
      }
      val df = docs.toDF("doc_id", "source", "text")
      val got = Dedup
        .jaccardPairsWithin(df, "doc_id", "text", "source")
        .collect()
        .map(x => (x.getLong(0), x.getLong(1)) -> (x.getLong(2), x.getLong(3)))
        .toMap
      // oracle: all in-block pairs (every block < maxBlock, so the cap
      // contributes nothing here), distinct-token intersect/union
      val sets = docs.map { case (id, blk, text) =>
        (id, blk, text.split("\\s+").toSet)
      }
      val want = (for {
        a <- sets; b <- sets
        if a._2 == b._2 && a._1 < b._1
      } yield {
        val i = (a._3 & b._3).size.toLong
        (a._1, b._1) -> (i, a._3.size + b._3.size - i)
      }).toMap
      assert(got == want, s"seed $seed: ${got.size} vs ${want.size} pairs")
    }
  }

  test("jaccard block cap: overflow members compare only to the representative") {
    val docs = (0 until 10)
      .map(i => (i.toLong, "one", s"t$i common"))
      .toDF("doc_id", "source", "text")
    val got = Dedup
      .jaccardPairsWithin(docs, "doc_id", "text", "source", maxBlock = 4)
      .collect()
      .map(x => (x.getLong(0), x.getLong(1)))
      .toSet
    val core = (for { a <- 0 until 4; b <- (a + 1) until 4 }
      yield (a.toLong, b.toLong)).toSet
    val tail = (4 until 10).map(i => (0L, i.toLong)).toSet
    assert(got == core ++ tail)
  }

  private def rd6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("qualitySignals matches a plain-Scala oracle on random docs") {
    import graft.operators.Corpus
    for (seed <- Seq(5, 19)) {
      val r = new scala.util.Random(seed)
      val vocab = Seq("aa", "b", "ccc", "dddd", "ee", "f")
      val docs = (0 until 40).map { i =>
        val n = 1 + r.nextInt(12)
        (i.toLong,
          (0 until n).map(_ => vocab(r.nextInt(vocab.size))).mkString(" "))
      }
      val got = Corpus
        .qualitySignals(docs.toDF("doc_id", "text"), "doc_id", "text",
          minWords = 6, meanWordLen = (1.5, 3.0), minDistinctFrac = 0.5,
          maxTopBigramFrac = 0.4)
        .collect()
        .map(row => row.getLong(0) ->
          (row.getLong(1), row.getDouble(2), row.getDouble(3),
            row.getDouble(4), row.getBoolean(5)))
        .toMap
      docs.foreach { case (id, text) =>
        val toks = text.trim.toLowerCase.split("\\s+")
        val nw = toks.length.toLong
        val mwl = rd6(toks.map(_.length).sum.toDouble / nw)
        val dwf = rd6(toks.distinct.length.toDouble / nw)
        val bgs =
          if (toks.length < 2) Seq(toks.mkString(" "))
          else toks.sliding(2).map(_.mkString(" ")).toSeq
        val tbf =
          rd6(bgs.groupBy(identity).map(_._2.size).max.toDouble / bgs.size)
        val keep = nw >= 6 && mwl >= 1.5 && mwl <= 3.0 &&
          dwf >= 0.5 && tbf <= 0.4
        assert(got(id) == ((nw, mwl, dwf, tbf, keep)),
          s"seed $seed doc $id '$text': ${got(id)}")
      }
    }
  }

  test("repetitionSignals matches a plain-Scala oracle on random docs") {
    import graft.operators.Corpus
    for (seed <- Seq(11, 29)) {
      val r = new scala.util.Random(seed)
      val stock = Seq("aa bb", "cc", "dd ee ff", "aa", "bb cc")
      val docs = (0 until 30).map { i =>
        val n = 1 + r.nextInt(6)
        (i.toLong, (0 until n).map(_ => stock(r.nextInt(stock.size)))
          .mkString("\n"))
      }
      val got = Corpus
        .repetitionSignals(docs.toDF("doc_id", "text"), "doc_id", "text")
        .collect()
        .map(row => row.getLong(0) ->
          (row.getLong(1), row.getDouble(2), row.getDouble(3),
            row.getDouble(4), row.getDouble(5), row.getBoolean(6)))
        .toMap
      docs.foreach { case (id, text) =>
        val ls = text.split("\n", -1) // Spark SQL split keeps empties
        val groups = ls.groupBy(identity).map(_._2.length)
        val dup = groups.filter(_ > 1).sum
        val dupCh = ls.groupBy(identity).map { case (l, xs) =>
          if (xs.length > 1) xs.length.toLong * l.length else 0L
        }.sum
        val totCh = ls.map(_.length.toLong).sum
        def topGram(n: Int): Double = {
          val toks = text.trim.toLowerCase.split("\\s+")
          val gs = if (toks.length < n) Seq(toks.mkString(" "))
          else toks.sliding(n).map(_.mkString(" ")).toSeq
          rd6(gs.groupBy(identity).map(_._2.size).max.toDouble / gs.size)
        }
        val dlf = rd6(dup.toDouble / ls.length)
        val dlcf = if (totCh == 0) 0.0 else rd6(dupCh.toDouble / totCh)
        val t3 = topGram(3)
        val t4 = topGram(4)
        val keep = dlf <= 0.30 && dlcf <= 0.20 && t3 <= 0.18 && t4 <= 0.16
        assert(
          got(id) == ((ls.length.toLong, dlf, dlcf, t3, t4, keep)),
          s"seed $seed doc $id '$text': ${got(id)}")
      }
    }
  }

  test("ngramContamination matches a plain-Scala oracle on random docs") {
    for (seed <- Seq(13, 31)) {
      val r = new scala.util.Random(seed)
      val vocab = Seq("aa", "bb", "cc", "dd", "ee")
      def doc() = (0 until (3 + r.nextInt(10)))
        .map(_ => vocab(r.nextInt(vocab.size))).mkString(" ")
      val train = (0 until 25).map(i => (i.toLong, doc()))
      val evalDocs = (100 until 110).map(i => (i.toLong, doc()))
      val n = 3
      val got = graft.operators.Dedup
        .ngramContamination(train.toDF("doc_id", "text"),
          evalDocs.toDF("doc_id", "text"), "doc_id", "text", n = n)
        .collect()
        .map(row => row.getLong(0) ->
          (row.getLong(1), row.getLong(2), row.getDouble(3),
            row.getBoolean(4)))
        .toMap
      def gramsOf(text: String): Set[String] = {
        val toks = text.trim.toLowerCase.split("\\s+")
        if (toks.length < n) Set(toks.mkString(" "))
        else toks.sliding(n).map(_.mkString(" ")).toSet
      }
      val evalSet = evalDocs.flatMap(d => gramsOf(d._2)).toSet
      train.foreach { case (id, text) =>
        val gs = gramsOf(text)
        val hits = gs.count(evalSet)
        val want = (gs.size.toLong, hits.toLong,
          rd6(hits.toDouble / gs.size), hits >= 1)
        assert(got(id) == want, s"seed $seed doc $id '$text': ${got(id)}")
      }
    }
  }

  test("dropBoilerplateLines matches a plain-Scala oracle on random docs") {
    def sha(s: String) =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    for (seed <- Seq(7, 23)) {
      val r = new scala.util.Random(seed)
      val stock = Seq("alpha", "beta", "gamma", "delta", "eps")
      val docs = (0 until 30).map { i =>
        val n = 1 + r.nextInt(5)
        val ls = (0 until n).map { _ =>
          val base = stock(r.nextInt(stock.size))
          if (r.nextBoolean()) s"$base u$i" else base
        }
        (i.toLong, ls.mkString("\n"))
      }
      val got = Dedup
        .dropBoilerplateLines(docs.toDF("doc_id", "text"), "doc_id", "text")
        .collect()
        .map(row => row.getLong(0) ->
          (row.getLong(1), row.getLong(2), row.getString(3)))
        .toMap
      val docCount = docs
        .flatMap { case (id, t) => t.split("\n", -1).distinct.map(_ -> id) }
        .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).distinct.size }
      val boiler = docCount.filter(_._2 >= 2).keySet
      docs.foreach { case (id, text) =>
        val ls = text.split("\n", -1)
        val kept = ls.filterNot(boiler)
        val want = (ls.length.toLong, (ls.length - kept.length).toLong,
          sha(kept.mkString("\n")))
        assert(got(id) == want, s"seed $seed doc $id: ${got(id)} vs $want")
      }
    }
  }
}
