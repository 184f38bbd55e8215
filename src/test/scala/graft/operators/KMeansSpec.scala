package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSupport

class KMeansSpec extends AnyFunSuite with SparkSupport {

  // deterministic pseudo-random corpus: 3 well-separated blobs
  private def corpus(n: Int = 120): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).select($"id".as("vec_id"),
      transform(sequence(lit(0), lit(7)), d =>
        pmod(xxhash64($"id", d), lit(1000)).cast("double") / 1000.0 +
          (pmod($"id", lit(3)) * 10).cast("double")).as("e"))
  }

  private def collectBook(b: DataFrame): Map[Long, Seq[Double]] =
    b.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap

  test("initLowestIds: dense cids over the k lowest-id vectors") {
    val book = collectBook(
      KMeansCodebook.initLowestIds(corpus(), embCol = "e", idCol = "vec_id", k = 3))
    assert(book.keySet == Set(0L, 1L, 2L))
    val expect = corpus().filter(col("vec_id") < 3).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(book(0L) == expect(0L) && book(1L) == expect(1L) && book(2L) == expect(2L))
  }

  test("lloydStep matches a driver-side fixed-point reference exactly") {
    val vecs = corpus(60)
    val init = KMeansCodebook.initLowestIds(vecs, "e", "vec_id", k = 3)
    val got = collectBook(KMeansCodebook.lloydStep(vecs, init, "e", "vec_id"))
    // reference: same assign semantics (min sqdist, ties lowest cid),
    // same fixed-point mean
    val vArr = vecs.collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val bArr = init.collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1)
    def d2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }
    val expect = vArr
      .map { case (_, e) => (bArr.minBy { case (c, ce) => (d2(e, ce), c) }._1, e) }
      .groupBy(_._1)
      .map { case (cell, rows) =>
        val n = rows.length
        val dims = rows.head._2.length
        cell -> (0 until dims).map { d =>
          val s = rows.map(r => math.floor(r._2(d) * KMeansCodebook.Scale).toLong).sum
          (s.toDouble / KMeansCodebook.Scale) / n
        }
      }
    assert(got.keySet == expect.keySet)
    expect.foreach { case (cell, ce) =>
      assert(got(cell) == ce, s"cell $cell centroid mismatch")
    }
  }

  test("train reduces quantization cost and is bit-deterministic across runs") {
    val vecs = corpus()
    val init = KMeansCodebook.initLowestIds(vecs, "e", "vec_id", k = 3)
    def cost(book: DataFrame): Double = {
      val bArr = book.collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
      vecs.collect().map { r =>
        val e = r.getSeq[Double](1)
        bArr.map { case (_, ce) =>
          e.zip(ce).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }
        }.min
      }.sum
    }
    val t1 = KMeansCodebook.train(vecs, init, "e", "vec_id", iters = 2)
    val t2 = KMeansCodebook.train(vecs, init, "e", "vec_id", iters = 2)
    assert(collectBook(t1) == collectBook(t2), "training must be bit-deterministic")
    assert(cost(t1) <= cost(init) + 1e-6,
      "two Lloyd iterations must not increase the quantization cost")
    spark.catalog.clearCache()
  }

  test("initKMeansParallel: k dense-cid centers, deterministic, separates the blobs") {
    val vecs = corpus()
    val b1 = collectBook(KMeansCodebook.initKMeansParallel(vecs, "e", "vec_id", k = 3))
    val b2 = collectBook(KMeansCodebook.initKMeansParallel(vecs, "e", "vec_id", k = 3))
    assert(b1 == b2, "k-means|| init must be deterministic")
    assert(b1.keySet == Set(0L, 1L, 2L), s"dense cids expected, got ${b1.keySet}")
    // the corpus has 3 blobs offset by pmod(id, 3) * 10: a useful init
    // puts its 3 centers in 3 DIFFERENT blobs (first coordinate ranges
    // [0,1), [10,11), [20,21))
    val blobs = b1.values.map(ce => math.round(ce.head / 10).toInt).toSet
    assert(blobs.size == 3, s"centers must cover all 3 blobs, got offsets $blobs")
    // and feeds train directly
    val refined = KMeansCodebook.train(vecs,
      KMeansCodebook.initKMeansParallel(vecs, "e", "vec_id", k = 3),
      "e", "vec_id", iters = 1)
    assert(refined.count() == 3)
    spark.catalog.clearCache()
  }

  test("initKMeansParallel: a dry round (phi == 0) preserves candidate state") {
    import spark.implicits._
    // 3 distinct values; oversample is high enough that round 1 samples
    // EVERY id into the candidate set, so round 2 folds them, phi drops
    // to exactly 0 and round 3 is dry. Before the ADVICE r8 guard the
    // dry round folded an EMPTY book, the inner join wiped the persisted
    // (dmin, near) state, every weight collapsed to 0 and the reduction
    // degenerated to the first k candidates — (0,0) and (10,0). With
    // state intact the weighted farthest-point sweep starts at the heavy
    // (10.5, 0) leader (weight 50) and then picks the origin.
    val rows = Seq((0L, Seq(0.0, 0.0))) ++
      (1L to 10L).map(i => (i, Seq(10.0, 0.0))) ++
      (11L to 60L).map(i => (i, Seq(10.5, 0.0)))
    val vecs = rows.toDF("vec_id", "e")
    val book = KMeansCodebook.initKMeansParallel(vecs, "e", "vec_id", k = 2,
      rounds = 3, oversample = 50.0)
      .collect().map(_.getSeq[Double](1)).toSet
    assert(book == Set(Seq(0.0, 0.0), Seq(10.5, 0.0)),
      s"expected the heavy-blob leader + origin, got $book")
  }

  test("initKMeansParallel: an over-cap draw refuses loudly instead of flooding the driver") {
    // oversample=100 makes the round-1 thresholds >= 1 for the two far
    // blobs (~80 points), far over the cap of 5 — the bounded-collect
    // contract must throw, not OOM the driver
    val e = intercept[IllegalArgumentException] {
      KMeansCodebook.initKMeansParallel(corpus(), "e", "vec_id", k = 3,
        rounds = 2, oversample = 100.0, maxSampledPerRound = 5)
    }
    assert(e.getMessage.contains("candidates"), e.getMessage)
  }
}
