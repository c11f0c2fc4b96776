package graft

import org.apache.spark.sql.functions._
import java.security.MessageDigest

/** Generator invariants (BASELINE.json:15): the Spark-side corpus and the
  * plain-Scala regeneration must agree byte-for-byte, verified through
  * sha2(content, 256) row-equality; and generation is deterministic.
  */
class SynthSpec extends GraftSuite {

  private def hex(b: Array[Byte]): String =
    b.map("%02x".format(_)).mkString

  private def sha256(s: String): String =
    hex(MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")))

  test("spark rows == oracle rows, all columns, n=2000") {
    val n = 2000L
    val got = Synth.sourceTable(spark, n).collect()
    assert(got.length == n)
    // range order is not guaranteed; key rows by content (unique per
    // (repo,path,commit) triple — duplicates allowed, compare as multiset)
    val gotM = got.groupBy(identity).view.mapValues(_.length).toMap
    val wantM = (0L until n).map(Synth.rowAt(_, n))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(gotM == wantM)
  }

  test("sha2(content,256) row-equality vs oracle-side regeneration") {
    val n = 1000L
    val sparkShas = EdgeBuilder.withSha(Synth.sourceTable(spark, n))
      .select("sha").collect().map(_.getString(0)).sorted
    val oracleShas =
      (0L until n).map(i => sha256(Synth.rowAt(i, n).content)).sorted
    assert(sparkShas.toSeq == oracleShas)
  }

  test("same n twice -> identical multiset of shas (determinism)") {
    val a = EdgeBuilder.withSha(Synth.sourceTable(spark, 500))
      .select("sha").collect().map(_.getString(0)).sorted.toSeq
    val b = EdgeBuilder.withSha(Synth.sourceTable(spark, 500))
      .select("sha").collect().map(_.getString(0)).sorted.toSeq
    assert(a == b)
  }

  test("skew exists: top repo owns a large share of files") {
    val byRepo = Synth.sourceTable(spark, 10000)
      .groupBy("repo").count().collect().map(_.getLong(1))
    assert(byRepo.max > 3 * (byRepo.sum / byRepo.length))
  }

  test("docTable: deterministic, with planted near-dups every 10th doc") {
    def texts() = Synth.docTable(spark, 200, tokensPerDoc = 40)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = texts()
    assert(a == texts(), "doc corpus must be run-to-run identical")
    (0L until 200L).foreach { id =>
      val toks = a(id).split(" ")
      assert(toks.length == 40)
      def sharedWithPrev =
        toks.zip(a(id - 1).split(" ")).count { case (x, y) => x == y }
      if (id % 10 == 9) {
        // a planted dup shares >= ~80% of positions with its base;
        // perturbation probability is 1/20 per position, so ~13% of
        // dups perturb NOTHING (exact duplicates — also valid dedup prey)
        assert(sharedWithPrev >= 32,
          s"doc $id shares only $sharedWithPrev/40")
      } else if (id > 0 && (id - 1) % 10 != 9) {
        // non-dup neighbors are unrelated: expect almost no positional
        // overlap (vocab 65536, 40 positions)
        assert(sharedWithPrev <= 3,
          s"unrelated docs $id,${id - 1} share $sharedWithPrev")
      }
    }
  }
}
