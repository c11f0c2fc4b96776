package graft.operators

import graft.functions.Hash64
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>), entirely in built-in Catalyst expressions.
  *
  * Two paths:
  *   - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *     Query set is broadcast (small); the corpus streams once; cost
  *     O(|Q|·|C|·dim). Fine for |Q| small at any corpus size, and the
  *     oracle for recall tests.
  *   - [[lshTopK]]: the scale path — sign-random-projection LSH buckets
  *     the corpus ONCE by a band of hyperplane signs; each query probes
  *     only its own bucket(s). The hyperplanes are pseudo-random ±1
  *     Rademacher vectors derived from xxhash64(bit, dim) — deterministic
  *     across runs and engines, no RNG state to ship.
  *
  * All arithmetic is float64 (cast up from the float32 storage) so
  * results are reproducible and comparable against a float64 oracle.
  */
object Similarity {

  /** dot(a, b) over array<double> columns, left-to-right accumulation. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))


  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact top-k cosine neighbors of each query vector.
    *
    * Similarities are rounded to `simDecimals` before ranking: the raw
    * float64 cosine is reduction-order sensitive at the last ulp, so two
    * engines can disagree on ranks near a tie. Rounding + the neighbor-id
    * tie-break makes the rank deterministic across engines.
    *
    * @param corpus  (idCol, vecCol: array<float>)
    * @param queries (idCol, vecCol) — small, broadcast
    * @return (query_id, neighbor_id, rnk) with rnk 1..k, ties broken by
    *         neighbor id (deterministic)
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      simDecimals: Int = 6,
  ): DataFrame = {
    val c = corpus.select(
      col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("cvec"),
    )
    val q = queries.select(
      col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qvec"),
    )
    val scored = c
      .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("neighbor_id"),
        round(cosine(col("qvec"), col("cvec")), simDecimals).as("sim"),
      )
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .select(col("*"), row_number().over(w).as("rnk"))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk").cast("long"))
  }

  /** Sign-random-projection bits: bit i = [dot(v, h_i) > 0] where h_i is a
    * deterministic ±1 hyperplane (sign of hash(i, dim) — xxhash64 by
    * default, the md5-derived portable hash in oracle mode).
    *
    * The projection is ROUNDED to 6 decimals before the sign test (same
    * convention as the sim/margin columns): the raw float64 sum is
    * reduction-order sensitive in the last ulp, so two engines summing in
    * different orders could flip a bit for a projection within an ulp of
    * zero and route the vector to a different bucket nondeterministically.
    */
  def srpBits(vec: Column, numBits: Int, hash: Hash64 = Hash64.Xx): Column =
    transform(
      sequence(lit(0), lit(numBits - 1)),
      i =>
        when(
          round(
            aggregate(
              zip_with(
                vec,
                sequence(lit(0), size(vec) - 1),
                (x, d) =>
                  when(hash.pair(i, d).bitwiseAND(lit(1L)) === 1L, x)
                    .otherwise(-x),
              ),
              lit(0.0),
              (acc, x) => acc + x,
            ),
            6,
          ) > 0,
          lit(1L),
        ).otherwise(lit(0L)),
    )

  /** Bucket key from the first `bandBits` SRP bits. */
  def srpBucket(vec: Column, bandBits: Int, hash: Hash64 = Hash64.Xx)
      : Column =
    aggregate(
      zip_with(
        srpBits(vec, bandBits, hash),
        lit((0 until bandBits).map(i => 1L << i).toArray),
        (b, p) => b * p,
      ),
      lit(0L),
      (acc, x) => acc + x,
    )

  /** Raw SRP projections dot(v, h_i) for i < numBits — the signs give
    * [[srpBits]]; the MAGNITUDES give the multi-probe perturbation order
    * (a bit with a small |projection| sits near its hyperplane and is the
    * likeliest to differ for a true near neighbor — Lv et al.,
    * "Multi-Probe LSH", VLDB 2007).
    */
  def srpDots(vec: Column, numBits: Int, hash: Hash64 = Hash64.Xx): Column =
    transform(
      sequence(lit(0), lit(numBits - 1)),
      i =>
        aggregate(
          zip_with(
            vec,
            sequence(lit(0), size(vec) - 1),
            (x, d) =>
              when(hash.pair(i, d).bitwiseAND(lit(1L)) === 1L, x)
                .otherwise(-x),
          ),
          lit(0.0),
          (acc, x) => acc + x,
        ),
    )

  /** Multi-probe bucket keys for a query vector: the exact SRP bucket
    * plus `numProbes` single-bit perturbations, flipping the bits with
    * the SMALLEST |projection| first (margin-ranked — those are the bits
    * a true neighbor most likely disagrees on). Returns an array of
    * 1 + numProbes distinct bucket keys; element 0 is the exact bucket.
    */
  def srpProbeBuckets(
      vec: Column,
      bandBits: Int,
      numProbes: Int,
      hash: Hash64 = Hash64.Xx,
  ): Column = {
    val dots = srpDots(vec, bandBits, hash)
    // sign decision rounded to 6 decimals — must match [[srpBits]] (and
    // the oracle SQL) exactly, or the exact-bucket probe would diverge
    // from the corpus-side bucketing near a zero projection
    val bucket = aggregate(
      zip_with(
        dots,
        lit((0 until bandBits).map(i => 1L << i).toArray),
        (d, p) => when(round(d, 6) > 0, p).otherwise(lit(0L)),
      ),
      lit(0L),
      (acc, x) => acc + x,
    )
    // rank bit indices by |dot| ascending (deterministic: struct compare
    // falls back to the index for equal magnitudes), keep the numProbes
    // nearest-margin bits, flip each one individually. The margin is
    // ROUNDED to 6 decimals before ranking — same convention as the sim
    // scores: raw float64 projections differ across engines in the last
    // ulp (reduction order), which near a margin tie would flip the
    // probe choice and break the cross-engine oracle compare.
    val ranked = array_sort(
      zip_with(
        dots,
        sequence(lit(0), lit(bandBits - 1)),
        (d, i) => struct(round(abs(d), 6).as("m"), i.as("i")),
      )
    )
    val flips = transform(
      slice(ranked, 1, numProbes),
      s =>
        bucket.bitwiseXOR(
          call_function("shiftleft", lit(1L), s.getField("i"))),
    )
    concat(array(bucket), flips)
  }

  /** LSH-bucketed ANN: candidates = corpus vectors in the query's SRP
    * bucket; exact cosine re-rank within the bucket. Trades recall for a
    * |C|/2^bandBits candidate set — the 100 TB path (the bucket join is a
    * plain equi-join that shuffles by bucket key; no all-pairs anywhere).
    *
    * `numProbes` > 0 adds margin-ranked multi-probe ([[srpProbeBuckets]]):
    * each query also probes the buckets reached by flipping its
    * `numProbes` nearest-margin SRP bits — recall recovers toward
    * brute force at (1 + numProbes)x the candidate cost, and the
    * multiplier rides the SMALL query side only (the corpus is still
    * bucketed exactly once; the 100 TB shape is unchanged).
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      bandBits: Int = 8,
      simDecimals: Int = 6,
      hash: Hash64 = Hash64.Xx,
      numProbes: Int = 0,
  ): DataFrame = {
    require(numProbes >= 0 && numProbes <= bandBits,
      "0 <= numProbes <= bandBits")
    val c = corpus.select(
      col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("cvec"),
      srpBucket(asDouble(col(vecCol)), bandBits, hash).as("bucket"),
    )
    val q =
      if (numProbes == 0)
        queries.select(
          col(idCol).as("query_id"),
          asDouble(col(vecCol)).as("qvec"),
          srpBucket(asDouble(col(vecCol)), bandBits, hash).as("bucket"),
        )
      else
        // probe keys are pairwise distinct and each corpus row lives in
        // exactly ONE bucket, so a (query, neighbor) pair can match at
        // most once — no candidate dedup step needed
        queries.select(
          col(idCol).as("query_id"),
          asDouble(col(vecCol)).as("qvec"),
          explode(
            srpProbeBuckets(asDouble(col(vecCol)), bandBits, numProbes,
              hash)).as("bucket"),
        )
    val scored = c
      .join(broadcast(q), Seq("bucket"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("neighbor_id"),
        round(cosine(col("qvec"), col("cvec")), simDecimals).as("sim"),
      )
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .select(col("*"), row_number().over(w).as("rnk"))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk").cast("long"))
  }

  /** IVF (inverted-file) ANN: the second scale path beside [[lshTopK]].
    *
    * Build: `nlist` centroids are picked DETERMINISTICALLY — the corpus
    * vectors with the smallest hash(id) (a reproducible pseudo-random
    * sample; no RNG state, no MLlib dependency) — and every corpus vector
    * is assigned to its nearest centroid (one broadcast-join + argmin
    * pass, the classic IVF coarse quantizer with 0 Lloyd refinements).
    * Query: each query probes its `nprobe` nearest centroid buckets and
    * exact-cosine re-ranks only those buckets' vectors — candidate cost
    * |C|·nprobe/nlist per query instead of |C|, and every join is a plain
    * equi-join on the centroid id (no all-pairs anywhere).
    *
    * Returns (query_id, neighbor_id, rnk), rnk 1..k, deterministic
    * (rounded sims + id tie-breaks, like the other topK paths).
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      simDecimals: Int = 6,
      hash: Hash64 = Hash64.Xx,
      refineIters: Int = 0,
      maxList: Int = Int.MaxValue,
  ): DataFrame = {
    require(nprobe >= 1 && nprobe <= nlist, "1 <= nprobe <= nlist")
    require(refineIters >= 0, "refineIters >= 0")
    require(maxList >= 1, "maxList >= 1")
    val c = corpus.select(
      col(idCol).as("cid_"),
      asDouble(col(vecCol)).as("cvec"),
    )
    val cents0 = c
      .orderBy(hash.one(col("cid_")), col("cid_"))
      .limit(nlist)
      .select(col("cid_").as("cent"), col("cvec").as("centvec"))
    // bounded deterministic Lloyd refinement (round-3 verdict: the
    // hash-sampled centroids can leave one list absorbing a large
    // fraction of a clustered corpus; 1-2 refinements rebalance the
    // lists toward the data's actual modes). Each round is one argmin
    // assignment pass + one |C|·dim mean shuffle — bounded, and the
    // assignment keeps the plan-pinned map-side min(struct) shape.
    val cents = (1 to refineIters).foldLeft(cents0)((cs, _) =>
      refineCentroids(c, cs, simDecimals))
    // oversized-list cap (round-4 verdict "What's missing" #3): Lloyd
    // refinement BALANCES lists but nothing BOUNDS one — an all-identical
    // (or single-mode) corpus lands in one centroid regardless of rounds,
    // and every probe of that list scans the whole mode: the unbounded
    // quadratic key the jaccard/cosine maxBucket policy exists for. Lists
    // larger than `maxList` keep their `maxList` smallest ids
    // (deterministic, oracle-mirrorable); overflow members are simply not
    // scan candidates — the documented recall trade every capped ANN path
    // here makes. The row_number()<=cap filter triggers Spark's
    // WindowGroupLimit (plan-pinned): map tasks pre-trim per cent BEFORE
    // the shuffle, so a degenerate list ships O(tasks·maxList) rows, never
    // its full membership.
    val capLists: DataFrame => DataFrame = df =>
      if (maxList == Int.MaxValue) df
      else {
        val lw = Window.partitionBy("cent").orderBy("neighbor_id")
        df.select(col("*"), row_number().over(lw).as("lrnk"))
          .where(col("lrnk") <= maxList)
          .drop("lrnk")
      }
    val bucketed = capLists(
      assignToNearestCentroid(c, "cid_", "cvec", cents, simDecimals)
        .select(col("cid_").as("neighbor_id"), col("cvec"), col("cent")))
    // query-side probes: top-nprobe centroids per query. The window is
    // fine HERE — the expansion is |Q|·nlist and |Q| is the small side.
    val probes = {
      val scored = queries
        .select(
          col(idCol).as("query_id"),
          asDouble(col(vecCol)).as("qvec"),
        )
        .join(broadcast(cents))
        .select(
          col("query_id"),
          col("qvec"),
          col("cent"),
          round(-cosine(col("qvec"), col("centvec")), simDecimals).as("cd"),
        )
      val w = Window.partitionBy("query_id").orderBy(col("cd"), col("cent"))
      scored
        .select(col("*"), row_number().over(w).as("crnk"))
        .where(col("crnk") <= nprobe)
        .drop("cd", "crnk")
    }
    val scored = bucketed
      .join(broadcast(probes), Seq("cent"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("neighbor_id"),
        round(cosine(col("qvec"), col("cvec")), simDecimals).as("sim"),
      )
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .select(col("*"), row_number().over(w).as("rnk"))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk").cast("long"))
  }

  /** One Lloyd round: assign every corpus vector to its nearest centroid
    * (the plan-pinned map-side argmin), then replace each centroid with
    * the elementwise MEAN of its assigned vectors. The mean is exact and
    * order-independent: each element is quantized to a 1e-6-resolution
    * BIGINT (`round(x*1e6)` — numeric round on DOUBLE is half-away-from-
    * zero in both engines, the established rank_e7 convention), summed as
    * integers (commutative-exact), and divided back in one float64
    * division — so the refined centroids are bit-identical across engines
    * and run-to-run, where a raw float64 sum would drift in the last ulp
    * with reduction order and could flip downstream rounded-distance
    * ties. Centroids whose list comes up empty drop out (standard Lloyd;
    * deterministic because the assignment is).
    */
  private[graft] def refineCentroids(
      c: DataFrame,
      cents: DataFrame,
      simDecimals: Int,
  ): DataFrame = {
    val asg = assignToNearestCentroid(c, "cid_", "cvec", cents, simDecimals)
    asg
      .select(col("cent"), posexplode(col("cvec")).as(Seq("pos", "x")))
      .groupBy(col("cent"), col("pos"))
      .agg(
        (sum(round(col("x") * 1e6).cast("long")).cast("double") /
          (lit(1e6) * count(lit(1)))).as("m"))
      .groupBy(col("cent"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(
        col("cent"),
        transform(col("pm"), s => s.getField("m")).as("centvec"),
      )
  }

  /** Nearest-centroid assignment for the CORPUS side of IVF: broadcast
    * the tiny centroid table against every corpus vector, then argmin via
    * `min(struct(cd, cent, vec))` — struct ordering is lexicographic and
    * (cd, cent) is unique per candidate, so this picks exactly the
    * (smallest distance, smallest centroid id) row, identical to a
    * row_number()-over-window keep=1. Unlike the window, min() partial-
    * aggregates MAP-SIDE: the one exchange carries |C| combined rows, not
    * the |C|·nlist broadcast-join expansion a window's sort-exchange
    * would (thousands× the corpus at design-scale nlist — the 100 TB
    * killer). Plan shape pinned in PlanShapeSpec.
    */
  private[graft] def assignToNearestCentroid(
      side: DataFrame,
      id: String,
      vec: String,
      cents: DataFrame,
      simDecimals: Int,
  ): DataFrame =
    side
      .join(broadcast(cents))
      .select(
        col(id),
        col(vec),
        col("cent"),
        round(-cosine(col(vec), col("centvec")), simDecimals).as("cd"),
      )
      .groupBy(col(id))
      .agg(min(struct(col("cd"), col("cent"), col(vec))).as("m"))
      .select(col(id), col("m.cent").as("cent"), col(s"m.$vec").as(vec))

  /** Exact-verified cosine near-duplicate pairs: corpus pairs with
    * cosine >= threshold, found through `numBands` INDEPENDENT SRP bands
    * (multi-band OR-amplification, the same recall device as
    * [[graft.operators.Dedup.minhashPairs]]' banding): band r buckets
    * every vector by bits [r*bandBits, (r+1)*bandBits); a pair is a
    * candidate if it collides in ANY band, then the exact cosine verify
    * makes precision exact. Single-band miss probability for a pair at
    * angle θ is 1-(1-θ/π)^bandBits per band; OR-ing b bands raises
    * recall to 1-(miss)^b.
    *
    * Per-bucket block cap (the [[graft.operators.Dedup.jaccardPairsWithin]]
    * `maxBlock` policy): all-pairs inside one bucket is quadratic in
    * bucket size, so a degenerate corpus (many near-identical vectors —
    * exactly the near-dup use case!) would melt one key at 100 TB.
    * Buckets larger than `maxBucket` contribute (a) all-pairs over their
    * `maxBucket` smallest ids and (b) one comparison per overflow member
    * against the bucket representative (min id) — O(bucket) tail, every
    * vector still compared at least once, fully deterministic. (Identical
    * vectors all land in the same bucket in EVERY band, so the cap
    * binds the same pairs per band and the result stays deterministic.)
    *
    * Candidates ride ids-only (vectors re-joined per side for the
    * verify — the wide arrays never ride the candidate shuffle).
    * Returns (id_a, id_b, sim) with id_a < id_b, sim >= threshold.
    */
  def cosineNearDupCandidates(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      bandBits: Int = 8,
      numBands: Int = 4,
      maxBucket: Int = 4096,
      hash: Hash64 = Hash64.Xx,
      simDecimals: Int = 6,
  ): DataFrame = {
    require(numBands >= 1 && bandBits >= 1, "numBands, bandBits >= 1")
    // NOT materialized: this is a cast-only projection — re-scanning the
    // source for the verify joins is cheaper than pinning |C|·dim doubles
    val c = corpus.select(
      col(idCol).as("id"),
      asDouble(col(vecCol)).as("vec"),
    )
    // SRP projections on the CODEGEN path: posexplode the vector, then
    // numBands·bandBits conditional ±x sums — the same explode+agg trick
    // as [[graft.operators.Dedup.simhashSignatures]] ([[srpBits]]'s
    // nested array lambdas are CodegenFallback; measured ~3x slower on
    // this operator). Identical semantics: bit i = [round(Σ_d ±vec[d],
    // 6) > 0] with the same hash.pair(i, d) hyperplane signs and the
    // same rounded sign test. Docs with NULL/empty vectors drop out of
    // the explode — they could never pass the cosine verify anyway
    // (cosine with a zero-norm vector is NaN).
    val nb = numBands * bandBits
    val dotCols = (0 until nb).map(i =>
      sum(
        when(hash.pair(lit(i), col("d")).bitwiseAND(lit(1L)) === 1L,
          col("x")).otherwise(-col("x"))
      ).as(s"dot$i"))
    val dots = c
      .select(col("id"), posexplode(col("vec")).as(Seq("d", "x")))
      .groupBy("id")
      .agg(dotCols.head, dotCols.tail: _*)
    val bandKeyCols = (0 until numBands).map { r =>
      (0 until bandBits)
        .map(j =>
          when(round(col(s"dot${r * bandBits + j}"), 6) > 0,
            lit(1L << j)).otherwise(lit(0L)))
        .reduce(_ + _)
    }
    // one (band, bucket, rn) row per (vector, band); materialized ONCE —
    // the SRP computation is the expensive part and feeds both sides
    // of the candidate self-join plus the overflow branch
    val banded = graft.Superstep.cut(
      dots
        .select(col("id"),
          posexplode(array(bandKeyCols: _*)).as(Seq("band", "bucket")))
        .select(
          col("id"),
          col("band"),
          col("bucket"),
          row_number()
            .over(Window.partitionBy("band", "bucket").orderBy("id"))
            .as("rn"),
        )
    )
    def pairsOf(a: DataFrame, b: DataFrame) =
      a.as("a")
        .join(
          b.as("b"),
          col("a.band") === col("b.band") &&
            col("a.bucket") === col("b.bucket") &&
            col("a.id") < col("b.id"),
        )
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    val core = banded.where(col("rn") <= maxBucket)
    val reps = banded.where(col("rn") === 1)
    val overflow = banded.where(col("rn") > maxBucket)
    val cand = pairsOf(core, core)
      .unionByName(pairsOf(reps, overflow))
      .dropDuplicates("id_a", "id_b")
    // verify-stage execution rework (r6) — semantics and every IEEE
    // operation unchanged, only WHERE and HOW WIDE they run:
    //   - norms are computed once per VECTOR (|C| rows) instead of once
    //     per candidate pair: the norm per id is the identical float
    //     either way, and na·nb is the same product the fused cosine()
    //     performed — this removes 2 of the 3 interpreted ArrayAggregate
    //     evaluations per pair (the HOF dot is CodegenFallback);
    //   - the candidate set is explicitly re-spread to the session's
    //     shuffle parallelism before the verify: the pairs are ids-only
    //     (a few MB for 10^5-10^6 candidates), so AQE's byte-based
    //     coalescing shrank the verify stage to a couple of tasks
    //     (event-log measured: one 9.8 s / 3-task stage) while the
    //     per-pair dot is CPU-bound — bytes are the wrong proxy for this
    //     stage's cost, so the operator states its own width (guide
    //     §2.5: partition by the work, not the bytes).
    val p = corpus.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val withNorm = c.select(
      col("id"), col("vec"), sqrt(dot(col("vec"), col("vec"))).as("nrm"))
    cand
      .repartition(p)
      .join(
        withNorm.select(
          col("id").as("id_a"), col("vec").as("va"), col("nrm").as("na")),
        "id_a")
      .join(
        withNorm.select(
          col("id").as("id_b"), col("vec").as("vb"), col("nrm").as("nb")),
        "id_b")
      .select(
        col("id_a"),
        col("id_b"),
        // rounded BEFORE the threshold test (house convention): a raw
        // float64 cosine within an ulp of the threshold would pass in
        // one engine and fail in the other
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")),
          simDecimals).as("sim"),
      )
      .where(col("sim") >= threshold)
  }

  /** Embedding-level near-duplicate CLUSTERS with survivor selection —
    * the semantic-dedup production op (SemDeDup, Abbas et al. 2023,
    * reduced to its deterministic core): [[cosineNearDupCandidates]]
    * mines verified cosine-near pairs, then the shared
    * [[graft.operators.Dedup.clustersFromPairs]] core runs the engine's
    * WCC over the dup graph and keeps the min-id doc per component.
    * Same output contract as text-level [[graft.operators.Dedup.nearDupClusters]]
    * — one row per input vector: (id, cluster, is_survivor) — so a
    * pipeline can swap the mining strategy without touching the
    * downstream keep/drop logic.
    */
  def cosineDupClusters(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      bandBits: Int = 8,
      numBands: Int = 4,
      maxBucket: Int = 4096,
      hash: Hash64 = Hash64.Xx,
      store: Option[graft.SnapshotStore] = None,
  ): DataFrame = {
    val pairs = cosineNearDupCandidates(
      corpus, idCol, vecCol, threshold, bandBits, numBands, maxBucket, hash)
    graft.operators.Dedup.clustersFromPairs(
      corpus.select(col(idCol).cast("long").as("id")),
      pairs.select("id_a", "id_b"),
      store,
    )
  }
}
