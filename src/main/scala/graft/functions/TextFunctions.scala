package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the training-data pipeline operators.
  *
  * Everything here is composed from codegen'd built-ins (no UDFs) so the
  * hot path stays inside whole-stage codegen, and every hash is derived
  * from md5 — the one hash both Spark and the DuckDB oracle implement
  * bit-identically. At 100 TB scale you'd swap md5 for xxhash64 (also a
  * built-in Expression, ~5× faster); the operators only depend on
  * "deterministic 32-bit int from a string", which is why the hash is
  * factored here once.
  */
object TextFunctions {

  /** Normalized token array: lowercase, trim, split on whitespace runs. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Curation text normalization — the cleanup stage every corpus runs
    * before fingerprinting/tokenizing: lowercase, control characters
    * (C0 block) to spaces, whitespace runs collapsed, trimmed. Pure map
    * of codegen'd built-ins; patterns kept in the Java∩RE2 subset so
    * the oracle reproduces them byte-for-byte.
    */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[\\x00-\\x1f]", " "), "\\s+", " "))

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword tokenization: letter runs, digit runs, and single
    * non-alphanumeric marks — the class-based approximation of a GPT-2
    * pretokenizer that both engines' regex dialects evaluate
    * identically. The unit a token-budget estimator counts.
    */
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  def bpeishTokenCount(text: Column): Column = size(bpeishTokens(text)).cast("long")

  /** Distinct word n-gram shingles (the unit of minhash/simhash/jaccard
    * document similarity) over an existing token-array column named
    * `colName`; empty array when the doc is shorter than n. Uses the
    * native single-pass [[WordShingles]] kernel (r15): the composed
    * sliding window ran one interpreted lambda per window (n element
    * gets + a concat) plus an index-array materialization and an
    * array_distinct re-walk — per document of EVERY signature pass.
    * Asserted element- and order-exact against [[composedShingles]] in
    * SignatureExpressionsSpec.
    */
  def shingles(colName: String, n: Int = 3): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      WordShingles(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(col(colName)), n))

  /** The portable composed form of [[shingles]] — the semantics
    * reference the DuckDB oracle mirrors.
    */
  private[functions] def composedShingles(colName: String, n: Int = 3): Column = {
    val parts = (0 until n).map(j => s"$colName[i+$j]").mkString(", ' ', ")
    when(size(col(colName)) >= n,
      expr(s"array_distinct(transform(sequence(0, size($colName) - $n), i -> concat($parts)))"))
      .otherwise(array().cast("array<string>"))
  }

  /** Deterministic 32-bit non-negative int from a string: first 8 hex chars
    * of md5. DuckDB equivalent: CAST('0x' || substr(md5(s),1,8) AS BIGINT).
    */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Full-document fingerprint (exact-dedup key): md5 of the
    * whitespace-normalized lowercased text.
    */
  def fingerprintMd5(text: Column): Column =
    md5(concat_ws(" ", tokens(text)))

  /** Rolling polynomial fingerprint over tokens:
    * acc = (acc*31 + hash32(tok)) mod 1e9+7. Order-sensitive (unlike the
    * md5 of the joined text it detects transpositions differently) and
    * exactly reproducible in DuckDB via list_reduce.
    */
  def fingerprintRolling(text: Column): Column = {
    val toks = tokens(text)
    // aggregate(tokens, 0L, (acc, t) -> (acc*31 + hash32(t)) % p)
    aggregate(
      toks,
      lit(0L),
      (acc, t) => (acc * lit(31L) + hash32(t)) % lit(1000000007L))
  }

  /** Number of tokens of `toks` that appear in the marker list. */
  def markerHits(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(markers))).cast("long")

  /** Marker vocabularies for the n-gram-heuristic language ID. With real
    * multilingual corpora these would be per-language character n-gram
    * profiles; marker stopwords are the degenerate-but-deterministic
    * variant that the oracle can replicate.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein"),
    "es" -> Seq("el", "la", "de", "que", "y", "es"))

  /** Predicted language: argmax of marker hits with fixed priority order
    * (en > de > es) on ties, 'unknown' when nothing matches.
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = langMarkers.map { case (l, ms) => l -> markerHits(toks, ms) }
    val Seq(en, de, es) = scores.map(_._2)
    when(en + de + es === 0, lit("unknown"))
      .when(en >= de && en >= es, lit("en"))
      .when(de >= es, lit("de"))
      .otherwise(lit("es"))
  }

  /** Quality-scoring signals (length, punctuation density, stopword ratio)
    * and a composite score — nominally in [0,1], but degenerate
    * all-punctuation text can dip to −0.25 (the punctuation penalty is
    * subtractive and the other terms bottom at ~0); kept UNCLAMPED
    * because the oracle-gated filters (q18/q60/q82) mirror this exact
    * arithmetic, and a threshold/cut consumer is ordering-invariant to
    * the clamp anyway. Normalizing consumers must clamp themselves
    * (r10 review corrected the stale [0,1] claim). All ratios are
    * single IEEE divisions of exact ints so the oracle agrees
    * bit-for-bit.
    */
  def qualitySignals(text: Column): Seq[(String, Column)] = {
    val nChars = length(text).cast("long")
    val nToks = tokenCount(text)
    val punct = (nChars - length(regexp_replace(text, "[.,!?;:]", ""))).cast("long")
    val stop = markerHits(tokens(text), langMarkers.flatMap(_._2).distinct)
    Seq(
      "n_chars" -> nChars,
      "n_tokens" -> nToks,
      "punct_ratio" -> (punct.cast("double") / nChars),
      "stopword_ratio" -> (stop.cast("double") / nToks))
  }

  /** MinHash parameters: the k hash functions are the affine family
    * h_k(x) = ((2k+1)·x + k·B) mod M over one md5-derived base hash per
    * shingle — one expensive hash per shingle, k cheap integer maps
    * (the standard minhash construction, and 12× fewer md5 calls than
    * seed-prefixing; all values < 2^38 so BIGINT arithmetic is exact and
    * identical in DuckDB).
    */
  val MinhashMod = 4294967311L // smallest prime > 2^32
  val MinhashB = 12582917L

  /** MinHash signature of a distinct-shingle array: element k is
    * min over shingles of h_k(hash32(shingle)). NULL when the doc has no
    * shingles. Map-only (no shuffle); at 100 TB the signature replaces
    * the full shingle set in every downstream comparison.
    *
    * PERF: prefer [[minhashFromHashes]] over a MATERIALIZED hash column
    * — Catalyst's projection collapse inlines a non-attribute `shingles`
    * expression into all k branches (higher-order lambdas defeat CSE),
    * re-running the tokenizer/md5 k times.
    */
  def minhashSignature(shingles: Column, k: Int): Column =
    minhashFromHashes(transform(shingles, s => hash32(s)), k)

  /** Signature from an already-computed shingle-hash array column: k
    * cheap affine maps, no md5 at all. Uses the native single-pass
    * [[MinHashAffine]] kernel (the composed `array(array_min(transform…))`
    * walks the hash array k times through interpreted lambdas); the
    * arithmetic is identical all-integer math, asserted element-exact
    * against [[composedMinhashFromHashes]] in `SignatureExpressionsSpec`.
    */
  def minhashFromHashes(hashes: Column, k: Int): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      MinHashAffine(org.apache.spark.sql.graftshim.ColumnBridge.expression(hashes), k))

  /** The portable composed form of [[minhashFromHashes]] — kept as the
    * semantics reference (it is what the DuckDB oracle mirrors).
    */
  private[functions] def composedMinhashFromHashes(hashes: Column, k: Int): Column =
    array((0 until k).map { seed =>
      array_min(transform(hashes,
        h => (lit(2L * seed + 1) * h + lit(seed * MinhashB)) % lit(MinhashMod)))
    }: _*)

  /** LSH band key b (0-based) over a signature of `rows`-sized bands:
    * md5 of the comma-joined band slice. Equal band key ⇒ candidate pair.
    */
  def bandKey(sig: Column, b: Int, rows: Int): Column =
    md5(concat_ws(",", transform(slice(sig, b * rows + 1, rows), _.cast("string"))))

  /** 64-bit numeric twin of [[bandKey]] (r15) — the PERSISTED band-table
    * key: a LONG the stats manifest can envelope (md5 strings cannot be
    * range-manifested), so an incremental admission's band probe can be
    * planned through [[graft.catalog.Warehouse.statsPrunedScanKeys]].
    * Same band-slice string, hashed with xxhash64 seeded by the band
    * index. A 64-bit collision across DIFFERENT slices only adds a
    * candidate pair, which the exact shingle-Jaccard confirm rejects —
    * the Bloom "the probe never decides the final answer" argument.
    */
  def bandKey64(sig: Column, b: Int, rows: Int): Column =
    xxhash64(lit(b),
      concat_ws(",", transform(slice(sig, b * rows + 1, rows), _.cast("string"))))

  /** Per-doc bigram repetition statistics struct (n_bg, c, g): bigram
    * count, top sorted-run length, its gram — the q80 Gopher-filter
    * fold. Uses the native single-pass [[BigramRunTop]] kernel (r15);
    * the composed form ran an interpreted lambda per bigram plus a
    * 4-field named_struct allocation per fold step, on a full-corpus
    * map pass. Asserted struct-exact against [[composedBigramRunTop]]
    * in SignatureExpressionsSpec.
    */
  def bigramRunTop(toks: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      BigramRunTop(org.apache.spark.sql.graftshim.ColumnBridge.expression(toks)))

  /** The portable composed form of [[bigramRunTop]] — the semantics
    * reference the DuckDB oracle mirrors. `colName` must name the token
    * array column.
    */
  private[graft] def composedBigramRunTop(colName: String): Column = {
    val bg = s"CASE WHEN size($colName) >= 2 THEN transform(sequence(0, size($colName)-2), " +
      s"i -> concat($colName[i], ' ', $colName[i+1])) ELSE array() END"
    expr(
      s"""named_struct(
            'n_bg', CAST(size($bg) AS BIGINT),
            'c', aggregate(
              sort_array($bg),
              named_struct('prev', '', 'run', CAST(0 AS BIGINT),
                           'c', CAST(0 AS BIGINT), 'g', ''),
              (s, x) -> named_struct(
                'prev', x,
                'run', CASE WHEN x = s.prev THEN s.run + 1 ELSE CAST(1 AS BIGINT) END,
                'c', CASE WHEN (CASE WHEN x = s.prev THEN s.run + 1 ELSE CAST(1 AS BIGINT) END) > s.c
                     THEN (CASE WHEN x = s.prev THEN s.run + 1 ELSE CAST(1 AS BIGINT) END)
                     ELSE s.c END,
                'g', CASE WHEN (CASE WHEN x = s.prev THEN s.run + 1 ELSE CAST(1 AS BIGINT) END) > s.c
                     THEN x ELSE s.g END)).c,
            'g', aggregate(
              sort_array($bg),
              named_struct('prev', '', 'run', CAST(0 AS BIGINT),
                           'c', CAST(0 AS BIGINT), 'g', ''),
              (s, x) -> named_struct(
                'prev', x,
                'run', CASE WHEN x = s.prev THEN s.run + 1 ELSE CAST(1 AS BIGINT) END,
                'c', CASE WHEN (CASE WHEN x = s.prev THEN s.run + 1 ELSE CAST(1 AS BIGINT) END) > s.c
                     THEN (CASE WHEN x = s.prev THEN s.run + 1 ELSE CAST(1 AS BIGINT) END)
                     ELSE s.c END,
                'g', CASE WHEN (CASE WHEN x = s.prev THEN s.run + 1 ELSE CAST(1 AS BIGINT) END) > s.c
                     THEN x ELSE s.g END)).g)""")
  }

  /** Estimated Jaccard from two equal-length minhash signatures: fraction
    * of agreeing components.
    */
  def estJaccard(sigA: Column, sigB: Column, k: Int): Column =
    aggregate(
      zip_with(sigA, sigB, (x, y) => when(x === y, 1L).otherwise(0L)),
      lit(0L), (acc, x) => acc + x).cast("double") / lit(k.toDouble)

  /** Exact Jaccard of two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** 32-bit SimHash over a distinct-shingle array: bit i is set iff the
    * majority of shingle hashes have bit i set (ties → 0, the sum>0 rule
    * with ±1 weights). Single map-side pass over the hashes. Same PERF
    * note as [[minhashSignature]]: pass a materialized hash column via
    * [[simhashFromHashes]] in real pipelines.
    */
  def simhash(shingles: Column): Column =
    simhashFromHashes(transform(shingles, s => hash32(s)))

  /** SimHash from an already-computed shingle-hash array column. Uses
    * the native single-pass [[SimHash32]] kernel (the composed fold
    * filters the hash array once per bit — 32 interpreted passes);
    * asserted bit-exact against [[composedSimhashFromHashes]] in
    * `SignatureExpressionsSpec`.
    */
  def simhashFromHashes(hashes: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      SimHash32(org.apache.spark.sql.graftshim.ColumnBridge.expression(hashes)))

  /** The portable composed form of [[simhashFromHashes]] — the semantics
    * reference the DuckDB oracle mirrors.
    */
  private[functions] def composedSimhashFromHashes(hashes: Column): Column = {
    val n = size(hashes)
    aggregate(
      sequence(lit(0), lit(31)),
      lit(0L),
      (acc, i) => {
        val bit = pow(lit(2.0), i).cast("long")
        // h / bit is exact (both < 2^53, bit a power of two); cast
        // truncates → integer division, matching DuckDB's `//`.
        val ones = size(filter(hashes, h => (h / bit).cast("long") % 2 === 1))
        acc + when(ones * 2 > n, bit).otherwise(lit(0L))
      })
  }

  /** PII patterns for the redaction/scrub stage of a training-data
    * pipeline. Written in the regex subset Java (`regexp_replace` here)
    * and RE2 (the DuckDB oracle) interpret identically — character
    * classes, bounded repetition, non-capturing groups, `\b`.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  val PhoneRe = "\\+\\d{1,3}-\\d{3}-\\d{3,10}"

  /** Redact emails, IPv4 addresses and international phone numbers with
    * typed placeholders. Order matters: emails first (they contain
    * digits and dots an IP/phone pattern could partially claim). Pure
    * map over codegen'd `regexp_replace` — no shuffle, safe at any
    * scale.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  def qualityScore(text: Column): Column = {
    val sig = qualitySignals(text).toMap
    val lenScore = least(sig("n_tokens").cast("double") / lit(100.0), lit(1.0))
    val stopScore = least(sig("stopword_ratio") * 4.0, lit(1.0))
    val punctPenalty = least(sig("punct_ratio") * 5.0, lit(1.0))
    lenScore * 0.5 + stopScore * 0.5 - punctPenalty * 0.25
  }
}
