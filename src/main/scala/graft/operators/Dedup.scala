package graft.operators

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline layer.
  *
  * Four families (exact, MinHash+LSH, SimHash, token-set Jaccard), all
  * built-in-expression only, all deterministic. The LSH variants are the
  * 100 TB designs: no stage is all-pairs over the corpus — candidates
  * come from equality joins on band/chunk keys, so cost scales with the
  * duplicate density, not |C|².
  */
object Dedup {

  /** Exact dedup by content hash: one row per distinct sha with the
    * multiplicity and the deterministic survivor (min id).
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    docs
      .groupBy(sha2(col(textCol), 256).as("sha"))
      .agg(
        count(lit(1)).as("cnt"),
        min(col(idCol)).as("keep_id"),
      )

  /** MinHash+LSH near-duplicate candidate pairs.
    *
    * shingle(n-gram) → minhash signature (numHashes) → band keys →
    * explode → self-join on band key → distinct pairs → exact Jaccard
    * verify on the shingle sets. Returns (id_a, id_b, jaccard) for pairs
    * with jaccard >= threshold; id_a < id_b.
    */
  def minhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      numHashes: Int = 32,
      rowsPerBand: Int = 4,
      threshold: Double = 0.5,
  ): DataFrame = {
    val withSig = docs.select(
      col(idCol).as("id"),
      array_distinct(Text.shingles(col(textCol), shingleLen)).as("sh"),
    )
    val banded = withSig
      .select(
        col("id"),
        col("sh"),
        explode(
          Text.bandKeys(
            Text.minhashSignature(col("sh"), numHashes),
            numHashes,
            rowsPerBand,
          )
        ).as("band"),
      )
    val cand = banded.as("a")
      .join(
        banded.as("b"),
        col("a.band") === col("b.band") && col("a.id") < col("b.id"),
      )
      .select(
        col("a.id").as("id_a"),
        col("b.id").as("id_b"),
        col("a.sh").as("sh_a"),
        col("b.sh").as("sh_b"),
      )
      .dropDuplicates("id_a", "id_b")
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    val union = size(col("sh_a")) + size(col("sh_b")) - inter
    cand
      .select(
        col("id_a"),
        col("id_b"),
        (inter.cast("double") / union.cast("double")).as("jaccard"),
      )
      .where(col("jaccard") >= threshold)
  }

  /** SimHash near-duplicate pairs within a hamming radius. Complete for
    * radius < chunks by the pigeonhole principle (see
    * [[Text.simhashChunks]]); candidates join on (chunkIndex, chunkValue).
    */
  def simhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      chunks: Int = 4,
  ): DataFrame = {
    require(maxHamming < chunks, "completeness needs maxHamming < chunks")
    val sigs = docs.select(
      col(idCol).as("id"),
      Text.simhash64(col(textCol)).as("sim"),
    )
    val chunked = sigs.select(
      col("id"),
      col("sim"),
      posexplode(Text.simhashChunks(col("sim"), chunks)),
    ) // -> pos, col
    chunked.as("a")
      .join(
        chunked.as("b"),
        col("a.pos") === col("b.pos") && col("a.col") === col("b.col") &&
          col("a.id") < col("b.id"),
      )
      .select(
        col("a.id").as("id_a"),
        col("b.id").as("id_b"),
        Text.hamming64(col("a.sim"), col("b.sim")).as("hamming"),
      )
      .dropDuplicates("id_a", "id_b")
      .where(col("hamming") <= maxHamming)
  }

  /** Exact token-set Jaccard for every doc pair within a blocking key
    * (e.g. same source) — integer intersect/union counts only, so the
    * result is exactly reproducible in any engine.
    */
  def jaccardPairsWithin(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
  ): DataFrame = {
    val t = docs.select(
      col(blockCol).as("blk"),
      col(idCol).as("id"),
      array_distinct(Text.tokens(lower(col(textCol)))).as("toks"),
    )
    val inter = size(array_intersect(col("a.toks"), col("b.toks")))
    t.as("a")
      .join(t.as("b"), col("a.blk") === col("b.blk") &&
        col("a.id") < col("b.id"))
      .select(
        col("a.id").as("doc_a"),
        col("b.id").as("doc_b"),
        inter.cast("long").as("inter_cnt"),
        (size(col("a.toks")) + size(col("b.toks")) - inter)
          .cast("long")
          .as("union_cnt"),
      )
  }
}
