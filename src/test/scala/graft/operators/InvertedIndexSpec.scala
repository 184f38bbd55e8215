package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSupport

/** Decision semantics of the df-capped inverted index on a
  * hand-readable fixture: who pairs with whom, the exact fixed-point
  * score, and the pruning guarantees (a stop term shared by everyone
  * contributes neither candidates nor score).
  */
class InvertedIndexSpec extends AnyFunSuite with SparkSupport {

  // (doc, term) occurrences: "the" is a stop term in all four docs;
  // "rare" links docs 1+2 (twice in doc 1); "mid" links docs 2+3+4
  private def occ = {
    import spark.implicits._
    Seq(
      (1L, "the"), (1L, "rare"), (1L, "rare"),
      (2L, "the"), (2L, "rare"), (2L, "mid"),
      (3L, "the"), (3L, "mid"),
      (4L, "the"), (4L, "mid")
    ).toDF("doc_id", "tok")
  }

  test("postings: df cap drops the stop term before pairing; tf and df are exact") {
    val p = InvertedIndex.postings(occ, "doc_id", "tok", dfCap = 3L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(p == Set(
      ("rare", 1L, 2L, 2L), ("rare", 2L, 1L, 2L),
      ("mid", 2L, 1L, 3L), ("mid", 3L, 1L, 3L), ("mid", 4L, 1L, 3L)),
      s"unexpected postings: $p")
  }

  test("pairScores: exact fixed-point idf products; stop term scores nothing") {
    val p = InvertedIndex.postings(occ, "doc_id", "tok", dfCap = 3L)
    val scores = InvertedIndex.pairScores(p, "doc_id", "tok", scale = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // rare: df=2 -> w=500; (1,2): tf 2*1*500 = 1000
    // mid:  df=3 -> w=333; (2,3),(2,4),(3,4): 1*1*333
    assert(scores == Map(
      (1L, 2L) -> 1000L,
      (2L, 3L) -> 333L, (2L, 4L) -> 333L, (3L, 4L) -> 333L),
      s"unexpected scores: $scores")
  }

  test("pairs match a plain-Scala reference on random small-vocab corpora") {
    import spark.implicits._
    // fixture pins each rule once; this pins the composition (tf, df,
    // cap, integer-div weight, pair sum) under unplanned term sharing
    val rnd = new scala.util.Random(23)
    val vocab = Array("t0", "t1", "t2", "t3", "t4", "t5")
    for ((dfCap, trial) <- Seq((3L, 1), (5L, 2), (8L, 3))) {
      val occs = (1L to 10L).flatMap { id =>
        Seq.fill(1 + rnd.nextInt(8))((id, vocab(rnd.nextInt(vocab.length))))
      }
      val tf = occs.groupBy(identity).map { case ((id, t), xs) => (id, t) -> xs.size.toLong }
      val df = tf.keys.groupBy(_._2).map { case (t, xs) => t -> xs.size.toLong }
        .filter(_._2 <= dfCap)
      val scale = 1000L
      val expected = (for {
        (t, d) <- df.toSeq
        docs = tf.keys.filter(_._2 == t).map(_._1).toSeq.sorted
        a <- docs; b <- docs if a < b
      } yield (a, b) -> tf((a, t)) * tf((b, t)) * (scale / d))
        .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
      val got = InvertedIndex.pairsManaged(
        occs.toDF("doc_id", "tok"), "doc_id", "tok", dfCap, scale) {
        _.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      }
      assert(got == expected, s"trial $trial (dfCap=$dfCap) diverged from the reference")
    }
  }

  test("Staged contract: release() drops the postings persist; Managed releases on failure") {
    val baseline: Set[Int] = spark.sparkContext.getPersistentRDDs.keySet.toSet
    def newRdds: Set[Int] =
      spark.sparkContext.getPersistentRDDs.keySet.toSet -- baseline
    val staged = InvertedIndex.pairsWithRelease(occ, "doc_id", "tok", dfCap = 3L, scale = 1000L)
    assert(staged.frame.count() == 4L)
    assert(newRdds.nonEmpty, "the postings stage must be cached while in use")
    staged.release()
    assert(newRdds.isEmpty, "release() must unpersist the staged postings")
    intercept[RuntimeException] {
      InvertedIndex.pairsManaged(occ, "doc_id", "tok", dfCap = 3L, scale = 1000L) { f =>
        f.count(); throw new RuntimeException("boom")
      }
    }
    assert(newRdds.isEmpty, "the Managed form must release in finally, even on failure")
  }

  test("candidate mass equals the posting-list bound: sum of df*(df-1)/2 over surviving terms") {
    val p = InvertedIndex.postings(occ, "doc_id", "tok", dfCap = 3L)
    val joined = {
      val a = p.select(col("tok"), col("doc_id").as("doc_a"))
      val b = p.select(col("tok"), col("doc_id").as("doc_b"))
      a.join(b, Seq("tok")).filter(col("doc_a") < col("doc_b")).count()
    }
    // rare: 2*1/2 = 1; mid: 3*2/2 = 3 — the stop term's 4*3/2 = 6 gone
    assert(joined == 4L)
  }
}
