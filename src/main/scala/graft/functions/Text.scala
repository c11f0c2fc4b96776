package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for the training-data pipeline layer.
  *
  * Everything here is pure built-in Catalyst expressions (no UDFs) so the
  * hot path stays inside codegen and the same computation is expressible
  * as ANSI SQL for the DuckDB oracle. All outputs are deterministic.
  */
object Text {

  /** Whitespace tokenization (mirrors
    * `string_split_regex(trim(s), '\s+')`). The trim matters for the
    * cross-engine oracles: leading/trailing whitespace would otherwise
    * produce empty-string fields whose count and position differ between
    * Java's split and DuckDB's string_split_regex — trimming first makes
    * both dialects agree for every input (a whitespace-only or empty
    * string still yields the single token "" in both).
    */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  def distinctTokenCount(text: Column): Column =
    size(array_distinct(tokens(text)))

  /** BPE-style pre-tokenizer count: letter runs, digit runs, and single
    * punctuation marks each count as one token (the GPT-2 pre-tokenizer
    * shape, ASCII classes only so the Java and RE2 dialects agree —
    * tested identical against DuckDB on the corpus). A closer proxy for
    * LLM token budgets than whitespace splitting.
    */
  val BpeishPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishPattern), lit(0)))

  /** Count of tokens belonging to a stopword list. */
  def stopwordCount(text: Column, stopwords: Seq[String]): Column = {
    val set = stopwords.map(lit(_))
    size(filter(tokens(lower(text)), t => array_contains(array(set: _*), t)))
  }

  /** Tiny per-language stopword lists for the heuristic language guesser.
    * (The driver testdata has synthetic vocab, so the oracle checks the
    * HEURISTIC's computation, not linguistic truth.)
    */
  val StopEn: Seq[String] = Seq("the", "a", "of", "and", "to")
  val StopDe: Seq[String] = Seq("der", "die", "das", "und", "ein")
  val StopFr: Seq[String] = Seq("le", "la", "les", "et", "un")
  val StopEs: Seq[String] = Seq("el", "los", "las", "y", "una")

  /** Argmax language guess with fixed priority tie-break
    * (en > de > fr > es > unknown) — deterministic by construction.
    */
  def langGuess(text: Column): Column = {
    val en = stopwordCount(text, StopEn)
    val de = stopwordCount(text, StopDe)
    val fr = stopwordCount(text, StopFr)
    val es = stopwordCount(text, StopEs)
    when(en + de + fr + es === 0, lit("unknown"))
      .when(en >= de && en >= fr && en >= es, lit("en"))
      .when(de >= fr && de >= es, lit("de"))
      .when(fr >= es, lit("fr"))
      .otherwise(lit("es"))
  }

  /** Quality features: ratio-free integer counts (exact cross-engine). */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[\\.,;:!\\?]", ""))

  /** Order-insensitive document fingerprint: sha256 of the sorted distinct
    * lowercase token set. Two docs with the same bag-of-words (ignoring
    * multiplicity and order) collide — a cheap shuffle-robust near-dup key.
    */
  def fingerprint(text: Column): Column =
    sha2(
      concat_ws(" ", array_sort(array_distinct(tokens(lower(text))))),
      256,
    )

  /** Word n-gram shingles: ["a b c", "b c d", ...]. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(lower(text))
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(
        transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))),
        )
      )
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * the minimum xxhash64 over the shingle set. Distinct seeds come from
    * hashing (shingle, hashIndex) pairs — one pass, all built-ins.
    *
    * NOTE: nested array lambdas are CodegenFallback (interpreted) —
    * measured 8x slower than the equivalent explode + per-index
    * min-aggregates that [[graft.operators.Dedup.minhashPairs]] uses on
    * its hot path. Keep this form for per-row signature columns on small
    * inputs; use the explode+agg form in pipelines.
    */
  def minhashSignature(
      shingleCol: Column,
      numHashes: Int,
      hash: Hash64 = Hash64.Xx,
  ): Column =
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      h => array_min(transform(shingleCol, s => hash.seeded(s, h))),
    )

  /** LSH band keys from a minhash signature: hash of each band of
    * `rowsPerBand` consecutive signature entries. Docs sharing ANY band
    * key are near-duplicate candidates. The band is hashed through its
    * canonical comma-joined decimal string so the SAME form serves both
    * hash modes (band keys are internal — only their equality matters).
    */
  def bandKeys(
      sig: Column,
      numHashes: Int,
      rowsPerBand: Int,
      hash: Hash64 = Hash64.Xx,
  ): Column =
    transform(
      sequence(lit(0), lit(numHashes / rowsPerBand - 1)),
      b =>
        hash.seeded(
          concat_ws(
            ",",
            transform(
              slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)),
              v => v.cast("string"),
            ),
          ),
          b,
        ),
    )

  /** Bit b (as 0/1 Long) of a Long column; shift amount may be a Column
    * (the Scala `shiftright` helper only takes a literal Int).
    */
  private def bitAt(x: Column, b: Column): Column =
    call_function("shiftright", x, b).bitwiseAND(lit(1L))

  /** 64-bit SimHash over the token multiset: bit b is set iff the sum of
    * ±1 votes (bit b of each token's xxhash64) is positive.
    */
  def simhash64(text: Column, hash: Hash64 = Hash64.Xx): Column = {
    val toks = tokens(lower(text))
    val powers = lit((0 until 64).map(i => 1L << i).toArray)
    val bits = transform(
      sequence(lit(0), lit(63)),
      b =>
        when(
          aggregate(
            toks,
            lit(0L),
            (acc, t) =>
              acc + when(bitAt(hash.one(t), b) === 1L, lit(1L))
                .otherwise(lit(-1L)),
          ) > 0,
          lit(1L),
        ).otherwise(lit(0L)),
    )
    aggregate(
      zip_with(bits, powers, (bit, p) => bit * p),
      lit(0L),
      (acc, x) => acc.bitwiseOR(x),
    )
  }

  /** Split a 64-bit simhash into `chunks` equal bit-chunks; two docs within
    * hamming distance < chunks must share at least one chunk (pigeonhole),
    * so chunk equality is a complete candidate filter for that radius.
    */
  def simhashChunks(sim: Column, chunks: Int): Column = {
    val width = 64 / chunks
    val mask = (1L << width) - 1
    transform(
      sequence(lit(0), lit(chunks - 1)),
      c => call_function("shiftright", sim, c * width).bitwiseAND(lit(mask)),
    )
  }

  /** Hamming distance between two 64-bit hashes. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("int")

  /** PII patterns, written to the common subset of Java regex and RE2
    * (DuckDB): explicit ASCII classes, no backreferences, no lookaround —
    * both engines find the same matches. The email host must end in an
    * alphabetic TLD, so `a@1.2.3.4` is NOT an email (its host is counted
    * by the IPv4 rule instead).
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern =
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Count of non-overlapping matches of `pattern` (a regex literal). */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Redact emails, then IPv4s. Email first: once addresses are gone,
    * the IPv4 pass cannot fire inside what used to be an email's host,
    * and the `<EMAIL>` placeholder contains no digits to re-match.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      Ipv4Pattern,
      "<IP>",
    )
}
