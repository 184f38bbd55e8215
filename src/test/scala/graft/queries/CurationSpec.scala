package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSupport

/** Semantics of the corpus-curation gates on controlled fixtures (the
  * oracle gates pin them against DuckDB on the synthetic corpus; these
  * pin the DECISIONS — who is contaminated / kept and why — on inputs
  * where the right answer is readable by hand).
  */
class CurationSpec extends AnyFunSuite with SparkSupport {

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
}
