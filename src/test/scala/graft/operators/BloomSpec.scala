package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSupport

/** Bloom pre-filter semantics — the properties q89's oracle gate can't
  * isolate: no false negatives, real candidate pruning, and exactness of
  * the composed dedup even when the filter is deliberately saturated.
  */
class BloomSpec extends AnyFunSuite with SparkSupport {

  private val M = 1L << 14
  private val K = 4

  test("no false negatives: every built key is maybe-seen") {
    import spark.implicits._
    val seen = (0 until 200).map(i => s"seen-$i").toDF("key")
    val bloom = Bloom.build(seen, "key", M, K)
    val hits = Bloom.maybeSeen(seen, "key", bloom, M, K)
    assert(hits.count() == 200L, "a bloom filter must never miss a key it holds")
  }

  test("definitely-new keys are pruned; candidate set stays near the true-dup count") {
    import spark.implicits._
    val seen = (0 until 200).map(i => s"seen-$i").toDF("key")
    val bloom = Bloom.build(seen, "key", M, K)
    // 40 true dups + 160 fresh keys; with n=200, m=2^14, k=4 the fp
    // rate is ~4e-5, and the xxhash positions are deterministic, so the
    // candidate count is a fixed number — assert the bound, not luck
    val incoming = ((0 until 40).map(i => s"seen-$i") ++
      (0 until 160).map(i => s"fresh-$i")).toDF("key")
    val candidates = Bloom.maybeSeen(incoming, "key", bloom, M, K).collect().map(_.getString(0)).toSet
    assert((0 until 40).map(i => s"seen-$i").toSet.subsetOf(candidates),
      "all true duplicates must survive the pre-filter")
    assert(candidates.size <= 45,
      s"the pre-filter must prune fresh keys (got ${candidates.size} candidates for 40 true dups)")
  }

  test("newKeys is exact even under a saturated 64-bit filter (every probe a false positive)") {
    import spark.implicits._
    val seen = (0 until 100).map(i => s"seen-$i").toDF("key")
    val incoming = ((0 until 30).map(i => s"seen-$i") ++
      (0 until 70).map(i => s"fresh-$i")).map(k => (k, k.length)).toDF("key", "len")
    // mBits=64: one word, saturated by 100 keys -> the bloom passes
    // everything, the exact confirm must still produce the right answer
    val got = Bloom.newKeys(incoming, seen, "key", mBits = 64L, k = 2)
      .collect().map(_.getString(0)).toSet
    assert(got == (0 until 70).map(i => s"fresh-$i").toSet,
      "the composed dedup must be exact regardless of the fp rate")
  }

  test("newKeys equals the plain anti-join on random keysets across filter sizes") {
    import spark.implicits._
    // the q89 oracle checks one corpus; this pins the exactness claim on
    // seeded random key populations with controlled overlap, at a roomy
    // filter (fp ~ 0) AND a cramped one (128 bits for ~120 keys — dense
    // false positives), where only the exact confirm keeps the answer right
    val rnd = new scala.util.Random(17)
    for (mBits <- Seq(1L << 14, 128L); trial <- 1 to 2) {
      val pool = (0 until 400).map(i => s"k${rnd.nextInt(180)}")
      val (seenKeys, incomingKeys) = (pool.take(120).distinct, pool.drop(250))
      val seen = seenKeys.toDF("key")
      val incoming = incomingKeys.zipWithIndex.toDF("key", "ord")
      // reference computed in plain Scala (ADVICE r11): an independent
      // driver-side implementation, not Spark's own anti-join — the
      // sweep must not certify one Spark plan with another
      val seenSet = seenKeys.toSet
      val expected = incomingKeys.zipWithIndex
        .filterNot { case (k, _) => seenSet.contains(k) }.toSet
      val got = Bloom.newKeys(incoming, seen, "key", mBits = mBits, k = 3)
        .collect().map(r => (r.getString(0), r.getInt(1))).toSet
      assert(got == expected, s"mBits=$mBits trial $trial diverged from the anti-join")
    }
  }

  test("merge(build(A), build(B)) is word-for-word identical to build(A ++ B)") {
    import spark.implicits._
    val a = (0 until 150).map(i => s"a-$i").toDF("key")
    val b = (0 until 150).map(i => s"b-$i").toDF("key")
    val merged = Bloom.merge(Bloom.build(a, "key", M, K), Bloom.build(b, "key", M, K))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = Bloom.build(a.union(b), "key", M, K)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(merged == direct,
      "incremental maintenance must produce the exact bitmap a full rebuild would")
  }

  test("incremental lifecycle: build-once + merge-per-batch equals the plain Scala reference across batches") {
    import spark.implicits._
    // the q101 shape on seeded random keys: a persisted historic bitmap,
    // three successive batches probed via newKeysAgainst, each batch's
    // admissions folded in with merge — checked against an independent
    // driver-side running set, including the cross-batch case where
    // batch N re-offers a key batch N-1 already admitted
    val rnd = new scala.util.Random(29)
    val historicKeys = (0 until 80).map(_ => s"k${rnd.nextInt(150)}").distinct
    var seenSet = historicKeys.toSet
    var seen = historicKeys.toDF("key")
    var bloom = Bloom.build(seen, "key", M, K)
    for (batchNo <- 1 to 3) {
      val batchKeys = (0 until 60).map(_ => s"k${rnd.nextInt(150)}")
      val expected = batchKeys.zipWithIndex.filterNot { case (k, _) => seenSet.contains(k) }.toSet
      val batch = batchKeys.zipWithIndex.toDF("key", "ord")
      val admitted = Bloom.newKeysAgainst(batch, seen, "key", bloom, M, K)
      val got = admitted.collect().map(r => (r.getString(0), r.getInt(1))).toSet
      assert(got == expected, s"batch $batchNo diverged from the running reference")
      bloom = Bloom.merge(bloom, Bloom.build(admitted.select("key"), "key", M, K))
      seen = seen.union(admitted.select("key"))
      seenSet ++= got.map(_._1)
    }
  }

  test("payload columns of incoming rows pass through untouched") {
    import spark.implicits._
    val seen = Seq("a", "b").toDF("key")
    val incoming = Seq(("a", 1L), ("c", 3L)).toDF("key", "payload")
    val got = Bloom.newKeys(incoming, seen, "key", mBits = 1L << 10, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("c", 3L)))
  }
}
