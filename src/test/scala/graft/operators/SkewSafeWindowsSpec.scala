package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSupport

/** The skew-safe window family (r13, VERDICT wrong #1) against the
  * naive single-partition-per-key windows they replace: on seeded
  * random corpora with a Zipf-hot key, duplicate order values (tie
  * paths), zero values and singleton keys, the two-stage top-k and the
  * two-pass bucketed prefix sum must agree with the global window
  * ROW-FOR-ROW — the gates keep their DuckDB oracles only because this
  * equivalence is exact, not approximate.
  */
class SkewSafeWindowsSpec extends AnyFunSuite with SparkSupport {

  /** Random corpus: hot key "h" takes ~70% of rows, the rest spread
    * over `cold` keys; values in [0, 50]; order keys collide often
    * (small range) so tie-breaking is exercised everywhere.
    */
  private def corpus(seed: Int, n: Int, cold: Int): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val k = if (rnd.nextInt(10) < 7) "h" else s"c${rnd.nextInt(cold)}"
      (i.toLong, k, rnd.nextInt(20).toDouble / 4.0, rnd.nextInt(51).toLong)
    }.toDF("id", "k", "o", "v")
  }

  test("TopK.perKey equals the global rank window on random skewed corpora (asc and desc)") {
    for (seed <- Seq(7, 21); desc <- Seq(true, false)) {
      val df = corpus(seed, 400, 5)
      val order = if (desc) Seq(col("o").desc, col("id")) else Seq(col("o"), col("id"))
      val naive = df
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("k")).orderBy(order: _*)).cast("long"))
        .filter(col("rnk") <= 3)
      val fast = TopK.perKey(df, Seq("k"), order, k = 3, rankName = "rnk",
        saltExpr = xxhash64(col("id")), salts = 8)
      assert(fast.collect().toSet == naive.collect().toSet,
        s"top-k diverged from the global window (seed=$seed desc=$desc)")
    }
  }

  test("TopK.perKey: k larger than every group passes all rows through with exact ranks") {
    val df = corpus(3, 60, 4)
    val order = Seq(col("o"), col("id"))
    val naive = df.withColumn("rnk", row_number().over(
      Window.partitionBy(col("k")).orderBy(order: _*)).cast("long"))
    val fast = TopK.perKey(df, Seq("k"), order, k = 1000, rankName = "rnk",
      saltExpr = xxhash64(col("id")), salts = 4)
    assert(fast.collect().toSet == naive.collect().toSet)
  }

  test("PrefixSum.perKey equals the global unbounded window, asc and desc, any bucket count") {
    for (seed <- Seq(11, 29); desc <- Seq(true, false); buckets <- Seq(1, 7, 64)) {
      val df = corpus(seed, 400, 5)
      val order = if (desc) Seq(col("o").desc, col("id")) else Seq(col("o"), col("id"))
      val naive = df.withColumn("cum", sum(col("v")).over(
        Window.partitionBy(col("k")).orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val staged = PrefixSum.perKeyWithRelease(df, Seq("k"), order,
        orderHead = col("o"), descending = desc, value = col("v"),
        cumName = "cum", numBuckets = buckets)
      try assert(staged.frame.collect().toSet == naive.collect().toSet,
        s"prefix sum diverged (seed=$seed desc=$desc buckets=$buckets)")
      finally staged.release()
    }
  }

  test("PrefixSum.perKey offsetCap prunes only rows the cum filter would drop anyway") {
    val df = corpus(17, 300, 4)
    val order = Seq(col("o").desc, col("id"))
    val cap = 200L
    val naive = df.withColumn("cum", sum(col("v")).over(
      Window.partitionBy(col("k")).orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum") <= cap)
    val staged = PrefixSum.perKeyWithRelease(df, Seq("k"), order,
      orderHead = col("o"), descending = true, value = col("v"),
      cumName = "cum", numBuckets = 7, offsetCap = Some(cap))
    try assert(staged.frame.filter(col("cum") <= cap).collect().toSet ==
      naive.collect().toSet)
    finally staged.release()
  }

  test("PrefixSum.perKey: negative values fail loudly when offsetCap is set, pass without") {
    import spark.implicits._
    val df = Seq(("a", 1L, -5L), ("a", 2L, 3L)).toDF("k", "o", "v")
    val staged = PrefixSum.perKeyWithRelease(df, Seq("k"), Seq(col("o")),
      orderHead = col("o"), descending = false, value = col("v"),
      cumName = "cum", numBuckets = 2, offsetCap = Some(10L))
    try {
      val e = intercept[Exception](staged.frame.collect())
      assert(e.getMessage != null || e.getCause != null) // raise_error surfaces
    } finally staged.release()
    // without a cap the negative value is legal — plain running sum
    val ok = PrefixSum.perKeyWithRelease(df, Seq("k"), Seq(col("o")),
      orderHead = col("o"), descending = false, value = col("v"), cumName = "cum")
    try assert(ok.frame.orderBy("o").select("cum").as[Long].collect().toSeq ==
      Seq(-5L, -2L))
    finally ok.release()
  }

  test("PrefixSum.perKey rejects non-integral values and clashing column names") {
    import spark.implicits._
    val df = Seq(("a", 1L, 1.5)).toDF("k", "o", "v")
    assertThrows[IllegalArgumentException] {
      PrefixSum.perKeyWithRelease(df, Seq("k"), Seq(col("o")),
        orderHead = col("o"), descending = false, value = col("v"), cumName = "cum")
    }
    val clash = Seq(("a", 1L, 1L)).toDF("k", "__pb", "v")
    assertThrows[IllegalArgumentException] {
      PrefixSum.perKeyWithRelease(clash, Seq("k"), Seq(col("v")),
        orderHead = col("v"), descending = false, value = col("v"), cumName = "cum")
    }
    assertThrows[IllegalArgumentException] {
      TopK.perKey(clash.withColumnRenamed("__pb", "__tks"), Seq("k"),
        Seq(col("v")), 1, "rnk", xxhash64(col("v")))
    }
  }

  test("PrefixSum.perKey: a null leading order key fails loudly (bucket/window order would disagree)") {
    import spark.implicits._
    val df = Seq(("a", Some(1.0), 1L), ("a", None, 2L)).toDF("k", "o", "v")
    val staged = PrefixSum.perKeyWithRelease(df, Seq("k"),
      Seq(col("o").desc, col("v")), orderHead = col("o"), descending = true,
      value = col("v"), cumName = "cum", numBuckets = 4)
    try {
      val e = intercept[Exception](staged.frame.collect())
      assert((e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
        .contains("null in the leading order expression"))
    } finally staged.release()
  }

  test("RankBuckets: bucket ids are monotone along the sort order and equal values share buckets") {
    import spark.implicits._
    val df = (0 until 500).map(i => math.pow(1.3, i % 40)).toDF("x")
    val bnds = graft.functions.RankBuckets.boundaries(df, col("x"), 16)
    for (desc <- Seq(true, false)) {
      val rows = df
        .withColumn("b", graft.functions.RankBuckets.bucketOf(bnds, col("x"), desc))
        .orderBy(if (desc) col("x").desc else col("x").asc)
        .select($"x", $"b").as[(Double, Long)].collect()
      rows.sliding(2).foreach {
        case Array((x1, b1), (x2, b2)) =>
          assert(b2 >= b1, s"bucket decreased along sort order (desc=$desc): " +
            s"($x1,$b1) then ($x2,$b2)")
          if (x1 == x2) assert(b1 == b2, "equal values in different buckets")
        case _ => ()
      }
    }
  }

  test("RankBuckets: a non-numeric bucketing axis fails loudly (all-bucket-0 collapse)") {
    // a string axis casts to all-null doubles — every row would land in
    // bucket 0 and PrefixSum would silently re-serialize each stratum
    // into the one hot task the bucketing exists to kill (r13 review)
    import spark.implicits._
    val df = Seq(("doc_a", 1L), ("doc_b", 2L)).toDF("doc_id", "v")
    val e = intercept[IllegalArgumentException] {
      graft.functions.RankBuckets.boundaries(df, col("doc_id"), 16)
    }
    assert(e.getMessage.contains("bucketing axis"))
    val e2 = intercept[IllegalArgumentException] {
      PrefixSum.perKey(df, Seq("doc_id"), Seq(col("doc_id")), col("doc_id"),
        descending = false, value = col("v"), cumName = "cum")
    }
    assert(e2.getMessage.contains("bucketing axis"))
  }
}
