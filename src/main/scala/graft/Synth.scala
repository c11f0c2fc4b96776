package graft

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic source-code corpus (SURVEY.md §2.A S2).
  *
  * Every column is a pure function of the row id (seedless closed form), so
  * the corpus is regenerable on the oracle side row by row: the plain-Scala
  * [[Synth.rowAt]] must produce byte-identical strings to the Spark-side
  * [[Synth.sourceTable]], which is what makes the `sha2(content, 256)`
  * row-equality invariant of BASELINE.json:15 checkable (tests in
  * SynthSpec).
  *
  * Skew is built in on purpose (drives the hub-salting machinery,
  * BASELINE.json:6):
  *   - repos: cubic skew — a few repos own most files;
  *   - commits: ^1.5 skew — some commits touch many files (hub commits).
  *
  * No external data, no wall clock, no RNG: `spark.range(n)` + closed-form
  * column expressions only.
  */
object Synth {

  val Langs: Array[String] = Array("scala", "java", "py", "md")
  val Exts: Array[String] = Array("scala", "java", "py", "md")

  final case class Dims(n: Long, nFiles: Long, nRepos: Long, nCommits: Long)

  def dims(n: Long): Dims =
    Dims(
      n = n,
      nFiles = math.max(4L, n / 2),
      nRepos = math.max(3L, n / 1000),
      nCommits = math.max(4L, n / 8),
    )

  /** Spark-side generator: one row per id in [0, n). */
  def sourceTable(spark: SparkSession, n: Long): Dataset[SourceFile] = {
    import spark.implicits._
    val d = dims(n)
    val fileId = col("id") % d.nFiles
    // cubic skew onto [0, nRepos): repo0 owns the most files
    val uf = (fileId % 1009).cast("double") / 1009.0
    val repoIdx = floor(lit(d.nRepos.toDouble) * uf * uf * uf).cast("long")
    val langIdx = (fileId % 4).cast("int")
    val lang = element_at(lit(Langs), langIdx + 1)
    val path = concat(
      lit("src/d"), (fileId % 37).cast("string"),
      lit("/File"), fileId.cast("string"),
      lit("."), element_at(lit(Exts), langIdx + 1),
    )
    // ^1.5 skew onto [0, nCommits): commit0 touches the most files
    val uc = (col("id") % 2003).cast("double") / 2003.0
    val commitIdx =
      floor(lit(d.nCommits.toDouble) * pow(uc, lit(1.5))).cast("long")
    val repo = concat(lit("repo"), repoIdx.cast("string"))
    val commit = concat(lit("c"), commitIdx.cast("string"))
    spark
      .range(n)
      .select(
        repo.as("repo"),
        path.as("path"),
        commit.as("commit"),
        lang.as("lang"),
        concat(repo, lit(":"), path, lit("@"), commit, lit(":"), lang)
          .as("content"),
      )
      .as[SourceFile]
  }

  /** Deterministic synthetic DOCUMENT corpus for the dedup layer's scale
    * runs: doc d carries `tokensPerDoc` vocab words derived from
    * xxhash64(source, position); every 10th doc (id % 10 == 9) is a
    * planted near-duplicate of doc id-1 with ~5% of positions perturbed
    * (≈15% of 3-gram shingles differ → Jaccard ≈ 0.74, comfortably above
    * the 0.5 mining threshold, LSH recall ≈ 0.99 at r=3/b=10). Pure
    * column expressions — codegen, seedless, reproducible at any scale.
    */
  def docTable(
      spark: SparkSession,
      nDocs: Long,
      tokensPerDoc: Int = 40,
      vocab: Long = 1L << 16,
  ): org.apache.spark.sql.DataFrame = {
    val isDup = col("id") % 10 === 9
    val base = when(isDup, col("id") - 1).otherwise(col("id"))
    val toks = transform(
      sequence(lit(0), lit(tokensPerDoc - 1)),
      j => {
        val perturbed =
          isDup && pmod(xxhash64(col("id"), j, lit(1)), lit(20)) === 0
        val src = when(perturbed, col("id") * 2 + 1).otherwise(base)
        concat(lit("w"), pmod(xxhash64(src, j), lit(vocab)).cast("string"))
      },
    )
    spark
      .range(nDocs)
      .select(col("id").as("doc_id"), concat_ws(" ", toks).as("text"))
  }

  /** Oracle-side regeneration of row `id` in plain Scala. Must match
    * [[sourceTable]] byte for byte (sha256 row-equality, BASELINE.json:15).
    */
  def rowAt(id: Long, n: Long): SourceFile = {
    val d = dims(n)
    val fileId = id % d.nFiles
    val uf = (fileId % 1009).toDouble / 1009.0
    val repoIdx = math.floor(d.nRepos.toDouble * uf * uf * uf).toLong
    val langIdx = (fileId % 4).toInt
    val lang = Langs(langIdx)
    val path = s"src/d${fileId % 37}/File$fileId.${Exts(langIdx)}"
    val uc = (id % 2003).toDouble / 2003.0
    val commitIdx =
      math.floor(d.nCommits.toDouble * math.pow(uc, 1.5)).toLong
    val repo = s"repo$repoIdx"
    val commit = s"c$commitIdx"
    SourceFile(repo, path, commit, lang, s"$repo:$path@$commit:$lang")
  }
}
