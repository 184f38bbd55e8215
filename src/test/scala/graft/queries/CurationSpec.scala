package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSupport

/** Semantics of the corpus-curation gates on controlled fixtures (the
  * oracle gates pin them against DuckDB on the synthetic corpus; these
  * pin the DECISIONS — who is contaminated / kept and why — on inputs
  * where the right answer is readable by hand).
  */
class CurationSpec extends AnyFunSuite with SparkSupport with BeforeAndAfterEach {

  // registry gates run under the Verify/Bench contract (cleared per
  // query): q83 persists its span stage, so mirror PlanAuditSpec's
  // per-test clear or SparkSupport's afterAll cache gate aborts
  override protected def afterEach(): Unit = {
    spark.catalog.clearCache()
    super.afterEach()
  }

  /** Writes a minimal `documents` table (testdata schema) and returns
    * the dir the registry queries load from.
    */
  private def docsDir(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = tmpDir("curation")
    rows.toDF("doc_id", "text")
      .select($"doc_id", $"text", lit("en").as("lang"), lit("fix").as("source"),
        length($"text").cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q79: a corpus doc sharing a 4-gram with the eval tenth is flagged, others are clean, eval docs stay out") {
    val dir = docsDir(Seq(
      // doc_id % 10 == 7 -> eval set
      7L -> "alpha beta gamma delta epsilon zeta",
      17L -> "one two three four",
      // corpus: doc 1 contains eval 4-grams ("alpha beta gamma delta",
      // "beta gamma delta epsilon"), doc 2 shares only a 3-gram tail
      // (no 4-gram), doc 3 is disjoint
      1L -> "prefix alpha beta gamma delta epsilon suffix",
      2L -> "noise words beta gamma delta",
      3L -> "entirely different token stream here"))
    val byId = Registry.byName("q79_decontaminate").run(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(byId.keySet == Set(1L, 2L, 3L), "output = corpus docs only (eval tenth excluded)")
    // doc 1 shares exactly "alpha beta gamma delta" and "beta gamma
    // delta epsilon" with eval doc 7 (its other two 4-grams touch
    // prefix/suffix tokens the eval doc lacks)
    assert(byId(1L) == ((2L, 1)), s"doc 1 must be contaminated with exactly 2 shared grams, got ${byId(1L)}")
    assert(byId(2L) == ((0L, 0)), "a shared 3-gram must NOT contaminate at n=4")
    assert(byId(3L) == ((0L, 0)))
  }

  test("q80: repetition stats — exact fractions, lexicographic tie-break, and the empty-bigram edge") {
    val dir = docsDir(Seq(
      // 8 tokens, 4 distinct -> dup 0.5; bigram counts: "a b"=2, "c d"=2
      // (tie -> "a b" lexicographically), 7 slots -> frac 2/7
      1L -> "a b a b c d c d",
      // all-distinct long doc: dup 0, top count 1 of 19 slots -> keep
      2L -> (1 to 20).map(i => s"tok$i").mkString(" "),
      // single token: no bigrams -> top_bigram '' / frac 0.0, dup 0 -> keep
      3L -> "solo"))
    val rows = Registry.byName("q80_repetition_filter").run(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getString(3), r.getDouble(4), r.getInt(5)))).toMap
    assert(rows(1L) == ((8L, 0.5, "a b", 2.0 / 7.0, 0)),
      s"tie must break to the lexicographically smallest bigram, got ${rows(1L)}")
    val (n2, dup2, top2, frac2, keep2) = rows(2L)
    assert(n2 == 20L && dup2 == 0.0 && frac2 == 1.0 / 19.0 && keep2 == 1)
    assert(top2 == "tok1 tok2",
      s"distinct doc's top bigram is the lexicographically smallest of the count-1 tie, got $top2")
    assert(rows(3L) == ((1L, 0.0, "", 0.0, 1)), "no bigrams -> empty top, frac 0, kept")
  }

  /** Like docsDir but with caller-controlled lang/source per row. */
  private def docsDirTyped(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val dir = tmpDir("curation")
    rows.toDF("doc_id", "text", "lang", "source")
      .select($"doc_id", $"text", $"lang", $"source",
        length($"text").cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q81: temperature mixing upsamples the rare language; repeat counts hit the exact fixed-point rates") {
    // en: 9 docs, de: 1 doc; alpha=0.5 at epochDocs=1000:
    //   qv_en = floor(3*2^20) = 3145728, qv_de = 2^20 = 1048576,
    //   mass  = 4194304
    //   de: num = 1048576000, den = 4194304  -> rate EXACTLY 250 (frac 0)
    //   en: num = 3145728000, den = 37748736 -> base 83, frac 1/3
    val dir = docsDirTyped(
      (1L to 9L).map(i => (i, s"english doc $i", "en", "s")) :+
        ((100L, "german doc", "de", "s")))
    val got = Registry.byName("q81_mixture_weights").run(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got.size == 10)
    assert(got(100L) == (("de", 250L)),
      s"integral rate must yield exactly floor repeats for every doc, got ${got(100L)}")
    val en = got.collect { case (_, ("en", n)) => n }
    assert(en.forall(n => n == 83L || n == 84L),
      s"en docs must get floor or floor+1 repeats, got ${en.toSet}")
    val total = got.values.map(_._2).sum
    assert(total >= 9L * 83L + 250L && total <= 250L + 9L * 84L,
      s"per-lang mass must stay within the floor/ceil envelope, got $total")
    // upsampling direction: the rare language's per-doc rate exceeds the
    // common language's (250 vs 83-84)
    assert(got(100L)._2 > en.max)
  }

  test("q82: budget take is a prefix — a later doc that would fit cannot re-enter past an overflow") {
    // one source, quality strictly ordered A > B > C > D via stopword
    // ratio and length (no punctuation anywhere):
    //   A: 500 tokens, 125 'the' -> score 1.0,  cum 500  (keep)
    //   B: 250 tokens,  32 'the' -> 0.756,      cum 750  (keep)
    //   C: 200 tokens,  12 'the' -> 0.62,       cum 950  (drop: > 800)
    //   D:  50 tokens,   0 'the' -> 0.25,       cum 1000 (drop: prefix
    //      semantics — D alone would fit the remaining 50, but budget
    //      take admits a prefix of the quality order, not a knapsack)
    def doc(n: Int, stop: Int): String =
      (List.fill(stop)("the") ++ (1 to (n - stop)).map(i => s"w$i")).mkString(" ")
    val dir = docsDirTyped(Seq(
      (1L, doc(500, 125), "en", "src"),
      (2L, doc(250, 32), "en", "src"),
      (3L, doc(200, 12), "en", "src"),
      (4L, doc(50, 0), "en", "src")))
    val got = Registry.byName("q82_token_budget_take").run(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == Map(1L -> 500L, 2L -> 750L),
      s"expected exactly the quality-prefix within budget, got $got")
  }

  test("q83: only the exactly-shared 8-token span counts; short docs are absent") {
    val dir = docsDir(Seq(
      // docs 1+2 share exactly the 8-token run "a b c d e f g h"; their
      // other spans differ in the tail token
      1L -> "a b c d e f g h x y",
      2L -> "a b c d e f g h z w",
      // disjoint 11-token doc: 4 spans, none shared
      3L -> "p q r s t u v w x y z",
      // 2 tokens -> no 8-gram, absent from the profile
      4L -> "short doc"))
    val got = Registry.byName("q83_repeated_spans").run(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L), "short doc must be absent")
    assert(got(1L) == ((3L, 1L, 2L)), s"doc 1: 3 spans, 1 shared, hottest df 2 — got ${got(1L)}")
    assert(got(2L) == ((3L, 1L, 2L)))
    assert(got(3L) == ((4L, 0L, 1L)), "disjoint doc shares nothing")
  }

  test("q84: cut semantics — overlap merges, adjacency merges, a one-token gap splits, short docs pass through") {
    // the hot 8-token spans are "a1 … a8" (docs 1,2,3,4 share it) and
    // "b1 … b8" (docs 3,4,5 share it); filler tokens are unique per doc
    // so no other span goes hot
    val A = (1 to 8).map(i => s"a$i").mkString(" ")
    val B = (1 to 8).map(i => s"b$i").mkString(" ")
    val dir = docsDir(Seq(
      // doc 1: A at position 3, fillers around -> one cut [3,10]
      1L -> s"f11 f12 $A f13 f14",
      // doc 2: A twice, overlapping occurrences impossible (distinct
      // tokens), so A at 1 and again at 10 with ONE filler between ->
      // cuts [1,8] and [10,17], token 9 survives
      2L -> s"$A f21 $A",
      // doc 3: A at 1 immediately followed by B at 9 (adjacent, zero
      // kept tokens between) -> ONE merged cut [1,16]
      3L -> s"$A $B",
      // doc 4: A at 1, B at 10 after one filler -> two cuts, f41 kept
      4L -> s"$A f41 $B",
      // doc 5: B at 2 -> one cut [2,9]
      5L -> s"f51 $B",
      // doc 6: 3 tokens, no spans -> passes through whole
      6L -> "tiny doc six"))
    val got = Registry.byName("q84_span_removal").run(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L), "every doc appears, even span-free ones")
    assert(got(1L) == ((1L, 8L, 4L, "3-10", "f11 f12 f13 f14")), s"got ${got(1L)}")
    assert(got(2L) == ((2L, 16L, 1L, "1-8;10-17", "f21")),
      s"a one-token gap must SPLIT cuts, got ${got(2L)}")
    assert(got(3L) == ((1L, 16L, 0L, "1-16", "")),
      s"adjacent hot spans must MERGE into one cut, got ${got(3L)}")
    assert(got(4L) == ((2L, 16L, 1L, "1-8;10-17", "f41")), s"got ${got(4L)}")
    assert(got(5L) == ((1L, 8L, 1L, "2-9", "f51")), s"got ${got(5L)}")
    assert(got(6L) == ((0L, 0L, 3L, "", "tiny doc six")),
      s"a doc shorter than the span length passes through whole, got ${got(6L)}")
  }

  test("q84: one fully-duplicated doc far longer than average costs O(cuts), not a len-sized cover array (r15)") {
    // the monster doc is one 8-token span repeated 2000 times — every
    // position is covered but the merged cut list is a SINGLE interval,
    // so the per-row state the kept-filter probes is 1 struct, not a
    // 16000-element position array (the r14 cov shape)
    val A = (1 to 8).map(i => s"a$i").mkString(" ")
    val monster = Seq.fill(2000)(A).mkString(" ")
    val dir = docsDir(Seq(
      1L -> monster,
      2L -> s"f21 $A f22",   // shares the span so it goes hot
      3L -> "just some filler here"))
    val got = Registry.byName("q84_span_removal").run(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))).toMap
    assert(got(1L) == ((1L, 16000L, 0L, "1-16000", "")),
      s"the monster doc must merge to ONE cut and empty out, got ${got(1L)}")
    assert(got(2L) == ((1L, 8L, 2L, "2-9", "f21 f22")), s"got ${got(2L)}")
    assert(got(3L)._1 == 0L && got(3L)._5 == "just some filler here")
  }

  test("q131: winnowing — shared-run guarantee, short-doc rule, selection sparser than the gram set") {
    // k=5, w=4: any shared run of >= k+w-1 = 8 tokens guarantees a
    // shared fingerprint (the winnowing theorem); fillers are unique
    // per doc so nothing else collides
    val run = (1 to 8).map(i => s"s$i").mkString(" ")
    val dir = docsDir(Seq(
      1L -> s"a1 a2 a3 $run a4 a5",
      2L -> s"b1 $run b2 b3 b4",
      // doc 3: 6 tokens (>= k, < k+w-1): winnows the min of its 2 grams
      3L -> "c1 c2 c3 c4 c5 c6",
      // doc 4: 4 tokens < k: no grams, absent from the profile
      4L -> "d1 d2 d3 d4"))
    val got = Registry.byName("q131_winnow_profile").run(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L), "sub-k docs carry no fingerprints")
    // the guarantee: docs 1 and 2 share >= 1 fingerprint from the run
    assert(got(1L)._2 >= 1 && got(2L)._2 >= 1,
      s"a shared 8-token run must yield a shared fingerprint: ${got(1L)}, ${got(2L)}")
    assert(got(1L)._3 == 2L && got(2L)._3 == 2L, "the hot fingerprint has df 2")
    // doc 3 fingerprints alone (one window over its 2 grams -> 1 fp)
    assert(got(3L) == ((1L, 0L, 1L)), s"short-doc rule: ${got(3L)}")
    // sparsity: the selection is a strict subset of the grams for a
    // long-enough doc (doc 1 has 13 tokens -> 9 grams; w=4 selects ~2/5)
    assert(got(1L)._1 < 9L, s"winnowing must select fewer fps than grams: ${got(1L)}")
  }

  test("q131: winnowing matches a plain-Scala reference on random small-vocab corpora") {
    val rnd = new scala.util.Random(37)
    def hash32Ref(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(4).map("%02x".format(_)).mkString, 16)
    }
    for (trial <- 1 to 3) {
      val docs = (0L until 12L).map { id =>
        id -> Seq.fill(3 + rnd.nextInt(18))(s"w${rnd.nextInt(6)}").mkString(" ")
      }
      val (k, w) = (3, 2)
      // reference winnowing per doc
      val ref = docs.flatMap { case (id, text) =>
        val t = text.trim.toLowerCase.split("\\s+").toSeq
        if (t.size < k) None
        else {
          val gh = (0 to t.size - k).map(i => hash32Ref(t.slice(i, i + k).mkString(" ")))
          val wins = (0 until math.max(1, gh.size - w + 1)).map(i =>
            gh.slice(i, math.min(i + w, gh.size)).min)
          Some(id -> wins.distinct.toSet)
        }
      }.toMap
      val dfreq = ref.values.flatten.groupBy(identity).map { case (fp, xs) => fp -> xs.size }
      val want = ref.map { case (id, fps) =>
        id -> ((fps.size.toLong,
          fps.count(fp => dfreq(fp) >= 2).toLong,
          fps.map(dfreq(_)).max.toLong))
      }
      val dir = docsDir(docs)
      val got = graft.operators.Winnow.profileWithRelease(
        spark.read.parquet(s"$dir/documents.parquet"), k = k, w = w)
      val gotMap = got.frame.collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      got.release()
      assert(gotMap == want, s"trial $trial")
    }
  }

  test("q132: winnow pairs — shared count scores the pair, a hot fingerprint pairs nobody (max_df cap)") {
    val runA = (1 to 8).map(i => s"a$i").mkString(" ")   // shared by docs 1,2
    val runB = (1 to 8).map(i => s"b$i").mkString(" ")   // shared by docs 1,2 too
    val hot = (1 to 8).map(i => s"h$i").mkString(" ")    // in EVERY doc: boilerplate
    val dir = docsDir(Seq(
      1L -> s"$hot f11 $runA f12 $runB",
      2L -> s"$hot f21 $runA f22 $runB",
      3L -> s"$hot f31 f32 f33 f34 f35 f36 f37 f38",
      4L -> s"$hot f41 f42 f43 f44 f45 f46 f47 f48",
      5L -> s"$hot f51 f52 f53 f54 f55 f56 f57 f58"))
    // max_df=2: the boilerplate run (df 5) may not pair; the two shared
    // runs give (1,2) a multi-fingerprint score
    val got = graft.operators.Winnow.pairsWithRelease(
      spark.read.parquet(s"$dir/documents.parquet"), maxDf = 2L)
    val pairs = got.frame.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    got.release()
    assert(pairs.keySet == Set((1L, 2L)),
      s"only the genuinely-overlapping pair may survive the cap: $pairs")
    assert(pairs((1L, 2L)) >= 2L,
      s"two shared 8-token runs must score >= 2 shared fingerprints: $pairs")
  }

  test("q80: the sorted-runs top-bigram fold matches a naive reference on random corpora") {
    // the fold tracks runs over sort_array(bg) in one pass (the gate's
    // O(len log len) rewrite of the naive count-max); random tiny-vocab
    // docs force dense repeats and lexicographic ties, where a run-reset
    // or tie-direction bug would diverge from the naive groupBy count
    val rnd = new scala.util.Random(29)
    val vocab = Array("aa", "bb", "cc")
    for (trial <- 1 to 3) {
      val corpus = (1L to 15L).map { id =>
        id -> Array.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.length)))
      }
      val expected = corpus.map { case (id, t) =>
        val n = t.length.toLong
        val dup = if (n > 0) 1.0 - t.distinct.length.toDouble / n else 0.0
        val bg = if (t.length >= 2) t.sliding(2).map(_.mkString(" ")).toSeq else Seq.empty
        val (topG, topC) =
          if (bg.isEmpty) ("", 0L)
          else {
            val counts = bg.groupBy(identity).map { case (g, xs) => g -> xs.size.toLong }
            val best = counts.toSeq.minBy { case (g, c) => (-c, g) }
            (best._1, best._2)
          }
        val frac = if (bg.nonEmpty) topC.toDouble / bg.size else 0.0
        id -> ((n, dup, topG, frac, if (dup <= 0.65 && frac <= 0.08) 1 else 0))
      }.toMap
      val dir = docsDir(corpus.map { case (id, t) => id -> t.mkString(" ") })
      val got = Registry.byName("q80_repetition_filter").run(spark, dir)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getDouble(2), r.getString(3), r.getDouble(4), r.getInt(5)))).toMap
      assert(got == expected, s"trial $trial diverged from the naive reference")
    }
  }

  test("q84: removal matches a plain-Scala reference on random small-vocab corpora") {
    import spark.implicits._
    // the fixture above pins each rule once; this pins the COMPOSITION
    // (df over distinct-per-doc spans, hot filter, overlap+adjacency
    // merge, excision) on seeded random corpora whose tiny vocabulary
    // forces dense, unplanned span collisions
    val n = 3
    val minDf = 2
    val rnd = new scala.util.Random(7)
    val vocab = Array("pa", "qo", "ru", "se", "tu")
    for (trial <- 1 to 3) {
      val corpus: Map[Long, Array[String]] =
        (1L to 12L).map { id =>
          val len = 1 + rnd.nextInt(20)
          id -> Array.fill(len)(vocab(rnd.nextInt(vocab.length)))
        }.toMap
      val spansPerDoc = corpus.map { case (id, t) =>
        id -> (if (t.length >= n)
          (0 to t.length - n).map(i => (i + 1, t.slice(i, i + n).mkString(" ")))
        else Seq.empty[(Int, String)])
      }
      val df = spansPerDoc.toSeq
        .flatMap { case (id, sp) => sp.map(_._2).distinct.map(g => (g, id)) }
        .groupBy(_._1).map { case (g, xs) => g -> xs.size }
      val hot = df.filter(_._2 >= minDf).keySet
      val expected = corpus.map { case (id, t) =>
        val starts = spansPerDoc(id).collect { case (s, g) if hot(g) => s }.sorted
        val cuts = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
        starts.foreach { s =>
          val e = s + n - 1
          if (cuts.nonEmpty && s <= cuts.last._2 + 1)
            cuts(cuts.length - 1) = (cuts.last._1, math.max(cuts.last._2, e))
          else cuts += ((s, e))
        }
        val covered = cuts.flatMap { case (a, b) => a to b }.toSet
        val kept = t.zipWithIndex.collect { case (w, i) if !covered(i + 1) => w }
        id -> ((cuts.length.toLong, covered.size.toLong, kept.length.toLong,
          cuts.map { case (a, b) => s"$a-$b" }.mkString(";"), kept.mkString(" ")))
      }
      val docs = corpus.toSeq.map { case (id, t) => (id, t.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = graft.operators.ExactSubstr.removalManaged(docs, n = n, minDf = minDf.toLong) {
        _.collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))).toMap
      }
      assert(got == expected, s"trial $trial diverged from the reference")
    }
  }

  test("q87: paragraph dedup matches a plain-Scala reference on random small-vocab corpora") {
    import spark.implicits._
    // same rationale as the q84 twin above: the fixture pins each rule
    // once, this pins the composition (chunking with ragged tail, global
    // (doc_id, idx) argmin winner, reassembly) under dense unplanned
    // collisions, including within-doc duplicates
    val chunk = 3
    val rnd = new scala.util.Random(11)
    val vocab = Array("ab", "cd", "ef")
    for (trial <- 1 to 3) {
      val corpus: Map[Long, Array[String]] =
        (1L to 10L).map { id =>
          id -> Array.fill(1 + rnd.nextInt(18))(vocab(rnd.nextInt(vocab.length)))
        }.toMap
      val occ = corpus.toSeq.flatMap { case (id, t) =>
        val nChunks = math.ceil(t.length / chunk.toDouble).toInt
        (1 to nChunks).map { j =>
          val p = t.slice((j - 1) * chunk, math.min(j * chunk, t.length))
          (id, j, p.mkString(" "), p.length.toLong)
        }
      }
      val winners = occ.groupBy(_._3).map { case (g, xs) =>
        g -> xs.map(x => (x._1, x._2)).min
      }
      val expected = corpus.keys.map { id =>
        val mine = occ.filter(_._1 == id)
        val kept = mine.filter(o => winners(o._3) == ((o._1, o._2))).sortBy(_._2)
        id -> ((mine.size.toLong, kept.size.toLong, (mine.size - kept.size).toLong,
          kept.map(_._4).sum, kept.map(_._3).mkString(" ")))
      }.toMap
      val docs = corpus.toSeq.map { case (id, t) => (id, t.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = graft.operators.ParagraphDedup.dedupManaged(docs, chunk = chunk) {
        _.collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))).toMap
      }
      assert(got == expected, s"trial $trial diverged from the reference")
    }
  }

  test("NULL text: removal passes it through as empty (not NULL); paragraph dedup yields ONE empty chunk, no phantoms") {
    import spark.implicits._
    // tokens(NULL) is NULL: un-coalesced, removal's array_join(NULL)
    // emitted a NULL cleaned_text and ParagraphDedup's ceil(-1/chunk)=0
    // made sequence(1,0) DESCEND into two phantom paragraphs (r11 review)
    val docs = Seq((1L, "alpha beta gamma"), (2L, null: String), (3L, null: String))
      .toDF("doc_id", "text")
    graft.operators.ExactSubstr.removalManaged(docs, n = 2, minDf = 2L) { f =>
      val r = f.collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getString(4), x.getString(5)))).toMap
      assert(r(2L) == ((0L, "", "")), s"null doc must pass through empty, got ${r(2L)}")
      assert(r(1L)._3 == "alpha beta gamma")
    }
    graft.operators.ParagraphDedup.dedupManaged(docs, chunk = 2) { f =>
      val r = f.collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getString(5)))).toMap
      assert(r(2L)._1 == 1L && r(3L)._1 == 1L,
        s"a null doc is ONE empty chunk, not phantom rows: ${r(2L)} ${r(3L)}")
      // the empty paragraph is still deduped globally: first null doc wins
      assert(r(2L)._2 == 1L && r(3L)._2 == 0L,
        s"global first-occurrence must apply to the empty chunk too: ${r(2L)} ${r(3L)}")
      assert(r(1L)._3 == "alpha beta gamma")
    }
  }

  test("q86: stage order is load-bearing — span df is computed over SURVIVORS, and dropped docs can't make a span hot") {
    val A = (1 to 8).map(i => s"a$i").mkString(" ")
    val B = (1 to 8).map(i => s"b$i").mkString(" ")
    val dir = docsDir(Seq(
      // eval tenth (doc_id % 10 == 7): donates the 4-gram "e1 e2 e3 e4"
      7L -> "e1 e2 e3 e4",
      // doc 1: CONTAMINATED (shares the eval 4-gram) and carries span A
      1L -> s"e1 e2 e3 e4 $A",
      // doc 2: clean, 14 distinct tokens (top-bigram frac 1/13 <= 0.08),
      // carries span A — hot in the RAW corpus (with doc 1), NOT hot
      // among survivors
      2L -> s"x1 x2 x3 x4 x5 x6 $A",
      // docs 3+4: clean survivors sharing span B — hot either way
      3L -> s"f1 f2 f3 f4 f5 f6 $B",
      4L -> s"g1 g2 g3 g4 g5 g6 $B"))
    // standalone q84 sees the RAW corpus: doc 1 makes A hot, doc 2 is cut
    val raw = Registry.byName("q84_span_removal").run(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(raw(2L) == 6L, s"raw-corpus removal must cut doc 2's span A, got ${raw(2L)}")
    spark.catalog.clearCache()
    // the composite drops doc 1 FIRST, so A's survivor-df is 1 and doc 2
    // passes through whole; B (docs 3+4 both survive) is still cut
    val got = Registry.byName("q86_curation_e2e").run(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet == Set(2L, 3L, 4L),
      s"eval doc excluded, contaminated doc dropped — got ${got.keySet}")
    assert(got(2L)._1 == 14L,
      s"span A must NOT be hot among survivors (df=1), got toks_clean ${got(2L)._1}")
    assert(got(3L)._1 == 6L && got(4L)._1 == 6L,
      s"span B (both carriers survive) must still be cut, got ${got(3L)._1}/${got(4L)._1}")
    // budget take orders by cleaned-text quality (doc 2's 14 tokens
    // outscore the 6-token survivors; tie between 3 and 4 breaks on id)
    assert(got(2L)._3 == 14L && got(3L)._3 == 20L && got(4L)._3 == 26L,
      s"cum_tokens must walk the quality order 2,3,4 — got $got")
    // single-lang mixture over the 3 cleaned docs: rate 1000/3 -> base
    // 333, fractional thresh 333/1000
    assert(got.values.forall(v => v._2 == 333L || v._2 == 334L),
      s"single-lang repeats must be floor/ceil of 1000/3, got ${got.values.map(_._2)}")
  }

  test("q84/q85: hashed span keying produces the identical frame as string keying; release() drops the staged persists") {
    val dir = docsDir(Seq(
      1L -> "a b c d e f g h x y",
      2L -> "a b c d e f g h z w",
      3L -> "p q r s t u v w x y z",
      4L -> "short doc"))
    val docsDf = graft.catalog.Tables.load(spark, dir, "documents")
    spark.catalog.clearCache()
    // earlier suites in the shared JVM leave localCheckpoint RDDs in
    // sc.persistentRdds (clearCache only empties the CacheManager), so
    // the release contract is asserted on the DELTA this test creates,
    // not on a global zero — full-suite order must not fail the gate
    val baseline: Set[Int] = spark.sparkContext.getPersistentRDDs.keySet.toSet
    def newRdds: Set[Int] =
      spark.sparkContext.getPersistentRDDs.keySet.toSet -- baseline
    // removal: hashed (operator default) vs string-keyed (the oracle gate)
    val hashed = graft.operators.ExactSubstr.removalWithRelease(docsDf)
    val stringy = graft.operators.ExactSubstr.removalWithRelease(docsDf, stringKeys = true)
    val h = hashed.frame.collect().map(_.toSeq).toSet
    val sStr = stringy.frame.collect().map(_.toSeq).toSet
    assert(h == sStr, "the span keying must change the shuffle byte width, not one output row")
    // profile too (q85's claim, checked here at fixture scale)
    val ph = graft.operators.ExactSubstr.profileWithRelease(docsDf)
    val ps = graft.operators.ExactSubstr.profileWithRelease(docsDf, stringKeys = true)
    assert(ph.frame.collect().map(_.toSeq).toSet == ps.frame.collect().map(_.toSeq).toSet)
    // the Staged contract: release() empties the cache this operator
    // filled (VERDICT r10: a long-lived service must not rely on
    // Bench/Verify's clearCache)
    assert(newRdds.nonEmpty, "the staged spans must be cached while in use")
    hashed.release(); stringy.release(); ph.release(); ps.release()
    assert(newRdds.isEmpty, "release() must unpersist every staged frame")
    // and the loan form releases even on failure
    intercept[RuntimeException] {
      graft.operators.ExactSubstr.removalManaged(docsDf) { f =>
        f.queryExecution.toRdd.count()
        throw new RuntimeException("boom")
      }
    }
    assert(newRdds.isEmpty, "the Managed form must release in finally, even on failure")
  }

  test("q87: paragraph dedup — global first occurrence wins (within-doc too), docs reassemble, keying is width-only") {
    val dir = docsDir(Seq(
      // chunk=3 for hand-readability: doc 1 = [a b c][a b c][d e]
      // (its own 2nd chunk is a duplicate of its 1st), doc 2 repeats
      // doc 1's chunk then adds a fresh one, doc 3 is entirely a dup
      1L -> "a b c a b c d e",
      2L -> "a b c x y z",
      3L -> "a b c"))
    val docsDf = graft.catalog.Tables.load(spark, dir, "documents")
    def run(stringKeys: Boolean) =
      graft.operators.ParagraphDedup.dedupManaged(docsDf, chunk = 3,
        stringKeys = stringKeys) { f =>
        f.collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))).toMap
      }
    val got = run(stringKeys = true)
    assert(got(1L) == ((3L, 2L, 1L, 5L, "a b c d e")),
      s"doc 1 keeps its first [a b c] and [d e], loses its own repeat: ${got(1L)}")
    assert(got(2L) == ((2L, 1L, 1L, 3L, "x y z")),
      s"doc 2's [a b c] lost to doc 1 (corpus order), [x y z] survives: ${got(2L)}")
    assert(got(3L) == ((1L, 0L, 1L, 0L, "")),
      s"doc 3 is cut to nothing but still present in the output: ${got(3L)}")
    // default 128-bit hashed paragraph key: byte width only, same rows
    assert(run(stringKeys = false) == got,
      "the paragraph keying must change the shuffle byte width, not one output row")
  }

  test("q90: surprisal is exact fixed-point inverse corpus frequency; rare tokens dominate") {
    val dir = docsDir(Seq(
      1L -> "a a a",
      2L -> "a b"))
    // corpus LM: c(a) = 4, c(b) = 1; SCALE = 1e12
    val got = Registry.byName("q90_unigram_surprisal").run(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((3L, 750000000000L, 250000000000L)),
      s"doc 1: 3 * (1e12 div 4), got ${got(1L)}")
    assert(got(2L) == ((2L, 1250000000000L, 625000000000L)),
      s"doc 2: (1e12 div 4) + (1e12 div 1), got ${got(2L)}")
  }
}
