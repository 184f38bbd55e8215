package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSupport

class PqIndexSpec extends AnyFunSuite with SparkSupport {

  private val Dims = 32
  private val M = 4
  private val W = Dims / M

  private def corpus(n: Int = 80): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).select($"id".as("vec_id"),
      transform(sequence(lit(0), lit(Dims - 1)), d =>
        pmod(xxhash64($"id", d), lit(1000)).cast("double") / 1000.0).as("e"))
  }

  private def seedBooks(v: DataFrame, k: Int = 4): DataFrame = {
    import spark.implicits._
    v.filter($"vec_id" < k)
      .select($"vec_id", explode(sequence(lit(0L), lit(M - 1L))).as("sub"), $"e")
      .select($"sub", $"vec_id".as("cid"), expr(s"slice(e, sub * $W + 1, $W)").as("ce"))
  }

  test("encode matches a driver-side per-subspace argmin exactly") {
    val v = corpus()
    val got = PqIndex.encode(v, seedBooks(v), Dims, M, "e", "vec_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val vArr = v.collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val books = vArr.filter(_._1 < 4)
    def d2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }
    val expect = vArr.map { case (id, e) =>
      id -> (0 until M).map { s =>
        books.map { case (cid, be) =>
          (cid, d2(e.slice(s * W, (s + 1) * W), be.slice(s * W, (s + 1) * W)))
        }.minBy { case (cid, d) => (d, cid) }._1
      }.toSeq
    }.toMap
    assert(got.size == expect.size)
    expect.foreach { case (id, codes) => assert(got(id) == codes, s"vec $id") }
  }

  test("adcScore(table, codes) equals the sum of assigned-centroid subspace distances") {
    import spark.implicits._
    val v = corpus(40)
    val books = seedBooks(v)
    val codes = PqIndex.encode(v, books, Dims, M, "e", "vec_id")
    val queries = v.filter($"vec_id" >= 10 && $"vec_id" < 13)
      .select($"vec_id".as("query_id"), $"e")
    val tables = PqIndex.adcTables(queries, books, Dims, M, "e", "query_id")
    // driver reference: adc(q, x) = sum over s of d2(q_sub, book[s][code_x(s)])
    val tArr = tables.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    val cArr = codes.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val got = codes.withColumn("__k", lit(0))
      .join(broadcast(tables.groupBy($"query_id", $"sub")
        .agg(transform(array_sort(collect_list(struct($"cid", $"d"))),
          x => x.getField("d")).as("t"))
        .groupBy($"query_id")
        .agg(transform(array_sort(collect_list(struct($"sub", $"t"))),
          x => x.getField("t")).as("table"))
        .withColumn("__k", lit(0))), "__k")
      .select($"query_id", $"vec_id", PqIndex.adcScore($"table", $"codes").as("adc"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    got.foreach { case ((q, x), adc) =>
      val expect = (0 until M).map(s => tArr((q, s.toLong, cArr(x)(s)))).sum
      assert(adc == expect, s"adc(q=$q, x=$x)")
    }
  }

  test("ADC shortlist quality: trained books beat seed books at recalling the exact top-3") {
    import spark.implicits._
    val v = corpus()
    def shortlistRecall(books: DataFrame): Double = {
      val codes = PqIndex.encode(v, books, Dims, M, "e", "vec_id")
      val queries = v.filter($"vec_id" >= 20 && $"vec_id" < 40)
        .select($"vec_id".as("query_id"), $"e".as("qe"))
      val tables = PqIndex.adcTables(
        queries.select($"query_id", $"qe".as("e")), books, Dims, M, "e", "query_id")
        .groupBy($"query_id", $"sub")
        .agg(transform(array_sort(collect_list(struct($"cid", $"d"))),
          x => x.getField("d")).as("t"))
        .groupBy($"query_id")
        .agg(transform(array_sort(collect_list(struct($"sub", $"t"))),
          x => x.getField("t")).as("table"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"query_id").orderBy($"adc", $"vec_id")
      val shortlist = codes.withColumn("__k", lit(0))
        .join(broadcast(tables.withColumn("__k", lit(0))), "__k")
        .filter($"vec_id" =!= $"query_id")
        .select($"query_id", $"vec_id", PqIndex.adcScore($"table", $"codes").as("adc"))
        .withColumn("rn", row_number().over(w)).filter($"rn" <= 8)
        .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val vArr = v.collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
      def d2(a: Seq[Double], b: Seq[Double]): Double =
        a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }
      (20L until 40L).map { q =>
        val qe = vArr.find(_._1 == q).get._2
        val top3 = vArr.filter(_._1 != q).map { case (id, e) => (id, d2(qe, e)) }
          .sortBy { case (id, d) => (d, id) }.take(3).map(_._1).toSet
        top3.count(shortlist(q).contains) / 3.0
      }.sum / 20
    }
    // seed books (4 raw subvectors per subspace) on a UNIFORM fixture are
    // a floor, not a target — near-neighbors are barely closer than
    // random here; the operative claim is that TRAINED books recover
    // real shortlist quality from the same corpus, mirroring the
    // reconstruction-error assertion below
    val seed = shortlistRecall(seedBooks(v))
    val trained = shortlistRecall(
      PqIndex.trainBooks(v, Dims, M, k = 8, "e", "vec_id", iters = 2).localCheckpoint(true))
    info(f"ADC@8 shortlist recall of exact top-3: seed $seed%.2f, trained(k=8) $trained%.2f")
    assert(trained >= seed,
      f"training must not LOWER shortlist recall (seed $seed%.2f > trained $trained%.2f)")
    assert(trained >= 0.4,
      f"trained ADC shortlist recall $trained%.2f implausibly low — code/table arithmetic broken?")
    spark.catalog.clearCache()
  }

  test("trainBooks: m dense-cid books whose encode beats seed books on quantization error") {
    import spark.implicits._
    val v = corpus()
    val trained = PqIndex.trainBooks(v, Dims, M, k = 4, "e", "vec_id", iters = 2)
    val shape = trained.groupBy($"sub")
      .agg(count(lit(1)).as("n"), min($"cid").as("lo"), max($"cid").as("hi"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(shape.length == M)
    shape.foreach { case (_, n, lo, hi) => assert(n == 4 && lo == 0 && hi == 3) }
    // reconstruction error through trained books <= through seed books
    def recon(books: DataFrame): Double = {
      val b = books.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getSeq[Double](2)).toMap
      val c = PqIndex.encode(v, books, Dims, M, "e", "vec_id")
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      v.collect().map { r =>
        val id = r.getLong(0); val e = r.getSeq[Double](1)
        (0 until M).map { s =>
          e.slice(s * W, (s + 1) * W).zip(b((s.toLong, c(id)(s))))
            .map { case (x, y) => (x - y) * (x - y) }.sum
        }.sum
      }.sum
    }
    val rTrained = recon(trained)
    val rSeed = recon(seedBooks(v))
    info(f"reconstruction error: trained $rTrained%.3f vs seed $rSeed%.3f")
    assert(rTrained <= rSeed + 1e-9,
      "Lloyd-trained subspace books must not reconstruct worse than raw seeds")
    spark.catalog.clearCache()
  }

  test("trainBooks re-keys dropped cells to dense cids per subspace") {
    import spark.implicits._
    // vec 1 duplicates vec 0, so every subspace seeds two IDENTICAL
    // centroids (cid 0 and 1); all assignment ties break to the lowest
    // cid, cell 1 loses every vector and DROPS in the Lloyd step
    // (ADVICE r8). adcScore indexes books positionally, so the output
    // must still be dense 0…count−1 per subspace.
    val v = spark.range(40).select($"id".as("vec_id"),
      transform(sequence(lit(0), lit(Dims - 1)), d =>
        pmod(xxhash64(when($"id" === 1, lit(0L)).otherwise($"id"), d), lit(1000))
          .cast("double") / 1000.0).as("e"))
    val books = PqIndex.trainBooks(v, Dims, M, k = 4, "e", "vec_id", iters = 1)
    val shape = books.groupBy($"sub")
      .agg(count(lit(1)).as("n"), min($"cid").as("lo"), max($"cid").as("hi"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(shape.length == M)
    shape.foreach { case (sub, n, lo, hi) =>
      assert(n < 4, s"sub $sub: fixture must actually drop a cell (got $n of 4)")
      assert(lo == 0 && hi == n - 1, s"sub $sub cids not dense: n=$n lo=$lo hi=$hi")
    }
    spark.catalog.clearCache()
  }
}
