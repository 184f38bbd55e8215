package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSupport

/** Direct unit tests for the text/vector primitives — edge cases the
  * oracle queries don't isolate.
  */
class FunctionsSpec extends AnyFunSuite with SparkSupport {

  import TextFunctions._

  test("tokens: empty and whitespace-only text yields a single empty token (documented edge)") {
    import spark.implicits._
    val out = Seq("", "   ", "a b", " A  B ").toDF("t")
      .select(tokenCount($"t").as("n"), tokens($"t").as("toks"))
      .collect()
    assert(out(0).getLong(0) == 1) // "" -> [""]
    assert(out(1).getLong(0) == 1)
    assert(out(2).getLong(0) == 2)
    assert(out(3).getSeq[String](1) == Seq("a", "b")) // trim + lower + split
  }

  test("shingles: docs shorter than n yield an empty array, duplicates collapse") {
    import spark.implicits._
    val out = Seq("a b", "a b c", "x y x y x y x y").toDF("text")
      .withColumn("t", tokens($"text"))
      .select(shingles("t").as("sh"))
      .collect().map(_.getSeq[String](0))
    assert(out(0).isEmpty)
    assert(out(1) == Seq("a b c"))
    // "x y x ..." has only 2 distinct 3-shingles: "x y x" and "y x y"
    assert(out(2).toSet == Set("x y x", "y x y"))
  }

  test("minhash signature: identical shingle sets give identical signatures; jaccard bounds hold") {
    import spark.implicits._
    val df = Seq(
      ("a", "the quick brown fox jumps over the lazy dog"),
      ("b", "the quick brown fox jumps over the lazy dog"),
      ("c", "entirely different words appear here today friends"))
      .toDF("id", "text")
      .withColumn("t", tokens($"text"))
      .withColumn("sh", shingles("t"))
      .withColumn("sig", minhashSignature($"sh", 12))
    val rows = df.select($"id", $"sig").collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(rows("a") == rows("b"))
    assert(rows("a") != rows("c"))
    val est = df.filter($"id" === "a").select(
      estJaccard($"sig", minhashSignature(shingles("t"), 12), 12)).head.getDouble(0)
    assert(est == 1.0)
  }

  test("vector primitives: dot/norm/cosine on known values") {
    import spark.implicits._
    import VectorFunctions._
    val df = Seq((Seq(3.0, 4.0), Seq(4.0, 3.0))).toDF("a", "b")
      .select(
        dot($"a", $"b").as("d"),
        norm($"a").as("na"),
        cosine($"a", $"b", norm($"a"), norm($"b")).as("c"))
    val r = df.head()
    assert(r.getDouble(0) == 24.0)
    assert(r.getDouble(1) == 5.0)
    assert(r.getDouble(2) == 24.0 / 25.0)
  }

  test("hyperplane buckets are stable and within range") {
    import spark.implicits._
    import VectorFunctions._
    val vecs = Seq(Seq.tabulate(64)(i => math.sin(i.toDouble)),
      Seq.tabulate(64)(i => math.cos(i.toDouble))).toDF("e")
    val buckets = vecs.select(hyperplaneBucket($"e", 4, 64).as("b")).collect().map(_.getLong(0))
    assert(buckets.forall(b => b >= 0 && b < 16))
    // determinism across evaluations
    val again = vecs.select(hyperplaneBucket($"e", 4, 64).as("b")).collect().map(_.getLong(0))
    assert(buckets.toSeq == again.toSeq)
  }

  test("capBuckets splits hot buckets, leaves cold ones whole, loses no rows") {
    import spark.implicits._
    // bucket 7 is hot (4000 rows), buckets 0-6 cold (50 each)
    val df = ((1 to 4000).map(i => (7L, i.toLong)) ++
      (0 until 7).flatMap(b => (1 to 50).map(i => (b.toLong, 10000L + b * 100 + i))))
      .toDF("bucket", "vec_id")
    val capped = Skew.capBuckets(df, "bucket", "vec_id", maxBucket = 500)
    assert(capped.count() == df.count(), "no rows lost")
    val sub = capped.groupBy($"bucket", $"__sub").count()
    // hot bucket split into ceil(4000/500)=8 subs, hash-balanced within 2x
    assert(sub.filter($"bucket" === 7).count() == 8)
    assert(sub.filter($"bucket" === 7).agg(max($"count")).head.getLong(0) <= 1000)
    // cold buckets keep a single sub-bucket
    assert(sub.filter($"bucket" =!= 7).select($"__sub").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(0L))
  }

  test("redactPii scrubs emails, IPv4s and phones; leaves clean text alone") {
    import spark.implicits._
    val df = Seq(
      "reach me at jane.doe+spam@mail-host.co.uk today",
      "server 192.168.0.17 and 10.255.255.1 rebooted",
      "call +49-030-1234567 or +1-555-0100",
      "version 1.2.3 of lib (not an IP), cost $4.50",
      "plain text with no pii at all").toDF("t")
    val out = df.select(TextFunctions.redactPii($"t").as("r")).collect().map(_.getString(0))
    assert(out(0) == "reach me at <EMAIL> today")
    assert(out(1) == "server <IP> and <IP> rebooted")
    assert(out(2) == "call <PHONE> or <PHONE>")
    assert(out(3) == "version 1.2.3 of lib (not an IP), cost $4.50") // dotted triple is not an IPv4
    assert(out(4) == "plain text with no pii at all")
  }

  test("histogram quantile sketch: estimates within one bin width; bins merge by addition") {
    import spark.implicits._
    val n = 10000
    val df = (1 to n).map(_.toDouble).toDF("v") // uniform 1..10000 → p50 ≈ 5000
    val bins = Sketches.histogramBins(df, $"v", lo = 0.0, hi = 10000.0, buckets = 100)
    val q = Sketches.histogramQuantiles(bins, 0.0, 10000.0, 100, Seq(0.5, 0.95)).head()
    assert(math.abs(q.getDouble(0) - 5000.0) <= 100.0, s"p50 ${q.getDouble(0)}")
    assert(math.abs(q.getDouble(1) - 9500.0) <= 100.0, s"p95 ${q.getDouble(1)}")
    // mergeability: sketch(A) + sketch(B) == sketch(A ∪ B), bin by bin
    val (a, b) = ((1 to n / 2).map(_.toDouble), (n / 2 + 1 to n).map(_.toDouble))
    val merged = Sketches.histogramBins(a.toDF("v"), $"v", 0.0, 10000.0, 100)
      .unionByName(Sketches.histogramBins(b.toDF("v"), $"v", 0.0, 10000.0, 100))
      .groupBy($"bin").agg(sum($"c").as("c"))
    val direct = Sketches.histogramBins(df, $"v", 0.0, 10000.0, 100)
    assert(merged.join(direct.withColumnRenamed("c", "c2"), Seq("bin"))
      .filter($"c" =!= $"c2").count() == 0)
  }

  test("KMV sketch: estimate within theoretical error bound on a known cardinality") {
    import spark.implicits._
    val n = 20000
    val df = (1 to n).toDF("k")
    val est = Sketches.kmvDistinct(df, $"k", 256).head.getDouble(1)
    // k=256 → relative standard error ~1/sqrt(254) ≈ 6.3%; allow 5 sigma
    assert(math.abs(est - n) / n < 0.32, s"estimate $est too far from $n")
  }

  test("histogram bins ignore NULL values; quantile labels refuse truncation collisions (r10 review)") {
    import spark.implicits._
    val withNulls = (Seq.fill(50)(Option.empty[Double]) ++
      (1 to 100).map(i => Some(i * 100.0))).toDF("v")
    val bins = Sketches.histogramBins(withNulls, $"v", 0.0, 10000.0, 100)
    assert(bins.agg(org.apache.spark.sql.functions.sum($"c")).head.getLong(0) == 100,
      "NULLs must not land in bin 0 as phantom counts")
    // p50 over 1..100 hundreds: cumulative reaches 50 at bin 50, upper
    // edge 5100 — and unaffected by the 50 nulls (pre-fix, the phantom
    // bin-0 rows pushed the threshold row earlier and answered 2600)
    val p50 = Sketches.histogramQuantiles(bins, 0.0, 10000.0, 100, Seq(0.5))
      .head.getDouble(0)
    assert(p50 == 5100.0, s"nulls dragged the median: $p50")
    intercept[IllegalArgumentException] {
      Sketches.histogramQuantiles(bins, 0.0, 10000.0, 100, Seq(0.99, 0.999))
    }
  }

  test("KMV below k distinct values returns the exact count, not an inflated estimate (r10 review)") {
    import spark.implicits._
    val df = (1 to 5).toDF("k")
    val est = Sketches.kmvDistinct(df, $"k", 256).head.getDouble(1)
    assert(est == 5.0, s"partial sketch must answer exactly, got $est")
  }

  test("sessionizeBucketed: session ids identical to the global per-user window, incl. boundary merges") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val gap = 1800L
    val span = 1800L
    // hot user 1 with pseudo-random gaps crossing many bucket edges
    // (some inside the gap → merge, some outside → new session), plus a
    // user whose events sit EXACTLY on a bucket boundary at exactly the
    // gap distance (<= gap must merge), plus a single-event user
    val hot = (0 until 500).scanLeft(0L) { (acc, i) =>
      acc + (math.abs(math.sin(i.toDouble)) * 2500).toLong + 1
    }.map(ts => (1L, ts))
    val edge = Seq((2L, 1799L), (2L, 3599L), (2L, 5400L), (2L, 7201L))
    val single = Seq((3L, 42L))
    val df = (hot ++ edge ++ single).zipWithIndex
      .map { case ((u, ts), i) => (u, i.toLong, ts) }
      .toDF("user_id", "event_id", "epoch")
      .withColumn("ts", timestamp_seconds($"epoch")).drop("epoch")
      .repartition(7) // arbitrary layout; result must not depend on it
    // reference: the single global-window numbering (q12's shape)
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val expect = df
      .withColumn("prev", lag($"ts", 1).over(w))
      .withColumn("nw", when($"prev".isNull ||
        unix_timestamp($"ts") - unix_timestamp($"prev") > gap, 1L).otherwise(0L))
      .withColumn("sid", sum($"nw").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"user_id", $"event_id", $"sid")
    val got = Skew.sessionizeBucketed(df, "user_id", "ts", "event_id", gap, span)
      .select($"user_id", $"event_id", $"session_id")
    assert(got.columns.length == 3)
    val diff = expect.join(got, Seq("user_id", "event_id"))
      .filter($"sid" =!= $"session_id").count()
    assert(diff == 0, s"$diff events numbered differently from the global window")
    assert(got.count() == df.count())
    // sanity on the mitigation itself: the hot user's heavy window is
    // partitioned by (user, bucket), never by user alone. The operator
    // persists its heavy-window frame, so once the first invocation
    // materialized the cache, later plans show an InMemoryTableScan
    // where the 2-key WindowExec lives — the collection must descend
    // into cached plans or the assertion tests the CacheManager, not
    // the operator (the r5 red test).
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.window.WindowExec
    // cachedPlan is an AdaptiveSparkPlanExec and its stages are
    // QueryStageExec wrappers — all LEAVES for collect — so unwrap each
    // before descending
    def windows(p: SparkPlan): Seq[WindowExec] =
      p.collect { case w: WindowExec => w } ++
        p.collect { case a: AdaptiveSparkPlanExec => a }
          .flatMap(a => windows(a.executedPlan)) ++
        p.collect { case q: QueryStageExec => q }
          .flatMap(q => windows(q.plan)) ++
        p.collect { case s: InMemoryTableScanExec => s }
          .flatMap(s => windows(s.relation.cachedPlan))
    val heavyWins = windows(
      Skew.sessionizeBucketed(df, "user_id", "ts", "event_id", gap, span)
        .queryExecution.sparkPlan)
    assert(heavyWins.forall(_.partitionSpec.nonEmpty))
    assert(heavyWins.exists(_.partitionSpec.size == 2), "heavy window must key on (user, bucket)")
    // release the operator's internal persists (documented contract) so
    // this suite leaves no cached blocks behind for later plan tests
    spark.catalog.clearCache()
    // span < gap is rejected (sessions could span non-adjacent buckets)
    intercept[IllegalArgumentException] {
      Skew.sessionizeBucketed(df, "user_id", "ts", "event_id", gapSec = 1800, bucketSpanSec = 600)
    }
    // the managed (loan) variant: same numbering inside `use`, and the
    // internal persist is RELEASED afterwards — the whole point of the
    // wrapper, so it must be pinned by a test or it can silently rot
    assert(spark.sharedState.cacheManager.isEmpty, "precondition: cache cleared above")
    val managedDiff = Skew.sessionizeBucketedManaged(
      df, "user_id", "ts", "event_id", gap, span) { sessions =>
      expect.join(sessions, Seq("user_id", "event_id"))
        .filter($"sid" =!= $"session_id").count()
    }
    assert(managedDiff == 0)
    assert(spark.sharedState.cacheManager.isEmpty,
      "sessionizeBucketedManaged must unpersist its heavy-window frame")
  }
}
