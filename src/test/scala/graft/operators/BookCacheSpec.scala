package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSupport

/** BookCache contract: hit = value-identical to a rebuild, keyed per
  * session, cleared on demand. The q69-vs-q77 sharing case is pinned
  * directly: the same training reached through differently-shaped input
  * plans (with/without an extra derived column) must produce the
  * bit-identical book a shared cache entry stands in for.
  */
class BookCacheSpec extends AnyFunSuite with SparkSupport {

  private def corpus(extraCol: Boolean): DataFrame = {
    import spark.implicits._
    val base = spark.range(60L).select($"id".as("vec_id"),
      transform(sequence(lit(0), lit(7)), d =>
        pmod(xxhash64($"id", d), lit(1000)).cast("double") / 1000.0).as("e"))
    if (extraCol) base.withColumn("nrm", aggregate($"e", lit(0.0), (a, x) => a + x * x))
    else base
  }

  private def train(v: DataFrame): DataFrame =
    KMeansCodebook.train(v.select(col("vec_id"), col("e")),
      KMeansCodebook.initLowestIds(v, "e", "vec_id", k = 3),
      "e", "vec_id", iters = 1).localCheckpoint(true)

  private def rows(b: DataFrame): Map[Long, Seq[Double]] =
    b.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap

  test("hit skips the build and returns the same materialized book") {
    BookCache.clear()
    var builds = 0
    def build(): DataFrame = { builds += 1; train(corpus(extraCol = false)) }
    val v = corpus(extraCol = false)
    val first = BookCache(v, "spec#hit") { build() }
    val second = BookCache(v, "spec#hit") { build() }
    assert(builds == 1, "second call must be a cache hit")
    assert(second eq first, "hit returns the cached DataFrame instance")
    BookCache.clear()
  }

  test("shared-key discipline holds: differently-shaped input plans train the identical book") {
    // q69 trains from (vec_id, e); q76/q77 from (vec_id, e, nrm) — the
    // extra column never enters training, so the shared key is sound
    val a = rows(train(corpus(extraCol = false)))
    val b = rows(train(corpus(extraCol = true)))
    assert(a == b, "book values must be bit-identical for the shared cache key to be sound")
  }

  test("hit is value-identical to a fresh rebuild") {
    BookCache.clear()
    val v = corpus(extraCol = false)
    val cached = BookCache(v, "spec#value") { train(v) }
    val fresh = train(corpus(extraCol = false))
    assert(rows(cached) == rows(fresh))
    BookCache.clear()
  }

  test("clear forces a rebuild; a different session does not serve the entry") {
    BookCache.clear()
    var builds = 0
    val v = corpus(extraCol = false)
    BookCache(v, "spec#clear") { builds += 1; train(v) }
    BookCache.clear()
    assert(BookCache.size == 0)
    BookCache(v, "spec#clear") { builds += 1; train(v) }
    assert(builds == 2, "clear must drop the entry")
    // newSession(): same context, different SparkSession — must rebuild,
    // not cross-wire a plan owned by the sibling session
    val s2 = spark.newSession()
    val v2 = s2.range(1).toDF("vec_id")
    BookCache(v2, "spec#clear") { builds += 1; train(v) }
    assert(builds == 3, "a different session must not be served another session's book")
    BookCache.clear()
  }
}
