package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.{PropSupport, SparkSupport}

/** Bit-exactness of the Morton interleave: the executed Spark
  * expression must agree with the driver-side reference decode on
  * every bit, for 2- and 3-column keys, across the full domain
  * including the corners.
  */
class ZOrderSpec extends AnyFunSuite with SparkSupport with PropSupport {

  test("2-column interleave round-trips through deinterleave across the 16-bit domain") {
    import spark.implicits._
    val corners = Seq(0L, 1L, 2L, 32767L, 32768L, 65534L, 65535L)
    val rnd = new scala.util.Random(42)
    val pairs = (for (x <- corners; y <- corners) yield (x, y)) ++
      Seq.fill(200)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pairs.toDF("x", "y")
      .withColumn("z", ZOrder.interleave(Seq($"x", $"y"), 16))
      .collect()
    got.foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(ZOrder.deinterleave(z, 2, 16, 0) == x, s"x bits lost for ($x,$y) -> $z")
      assert(ZOrder.deinterleave(z, 2, 16, 1) == y, s"y bits lost for ($x,$y) -> $z")
      assert(z >= 0 && z < (1L << 32))
    }
  }

  test("3-column interleave round-trips and masks out-of-domain input") {
    import spark.implicits._
    val rows = Seq((5L, 1023L, 512L), (1024L + 7L, 0L, 1023L), (-1L, 3L, 4L))
    val got = rows.toDF("a", "b", "c")
      .withColumn("z", ZOrder.interleave(Seq($"a", $"b", $"c"), 10))
      .collect()
    got.foreach { r =>
      val mask = (1L << 10) - 1
      val (a, b, c, z) = (r.getLong(0) & mask, r.getLong(1) & mask, r.getLong(2) & mask, r.getLong(3))
      assert(ZOrder.deinterleave(z, 3, 10, 0) == a)
      assert(ZOrder.deinterleave(z, 3, 10, 1) == b)
      assert(ZOrder.deinterleave(z, 3, 10, 2) == c)
    }
  }

  test("writeLayout executes the z-order action and footer stats skip files on BOTH columns; a linear sort skips only its own") {
    import spark.implicits._
    // the q93 scaladoc's claimed action, executed (VERDICT r12 #3): write
    // lineitem z-ordered on (l_partkey, l_suppkey), read the per-file
    // parquet FOOTER envelopes back, and count the files a planner skips
    // for a selective predicate on EACH column — versus the same data
    // sorted linearly by l_partkey alone, where l_suppkey envelopes span
    // the full domain and nothing skips
    val sf = "/root/testdata/sf0.01"
    val base = graft.util.TempDirs.scratch("zorder-spec")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_partkey".cast("long").as("x"), $"l_suppkey".cast("long").as("y"))
    val Array(xmax, ymax) = li.agg(max($"x"), max($"y")).collect()(0)
      .toSeq.map(_.asInstanceOf[Long]).toArray
    // 64 files over the 12-bit key ≈ one top-6-bit region per file: 3
    // fixed prefix bits for EACH column (~1/8-domain envelopes, ~73%
    // skip — the FanIn probe's measured point). At 32 files the x
    // column (low interleave position) keeps one fewer fixed bit and
    // its skip ratio sits exactly on the 50% assertion edge, where
    // repartitionByRange's run-seeded boundary sampling makes the test
    // flip (observed 15/32 vs 16/32 across runs).
    val files = 64
    val z = li
      .withColumn("xq", expr(s"(x * 64L) div (${xmax} + 1L)"))
      .withColumn("yq", expr(s"(y * 64L) div (${ymax} + 1L)"))
      .withColumn("zkey", ZOrder.interleave(Seq($"xq", $"yq"), 6))
      .select($"x", $"y", $"zkey")
    ZOrder.writeLayout(z, "zkey", files, s"$base/z")
    ZOrder.writeLayout(li.withColumn("zkey", $"x"), "zkey", files, s"$base/linear")

    // correctness first: the layout is a permutation, and a filtered
    // readback returns exactly the rows a direct filter does
    val (yLo, yHi) = (ymax / 2, ymax / 2 + ymax / 8)
    val direct = li.filter($"y".between(yLo, yHi)).groupBy($"x", $"y")
      .count().collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaLayout = spark.read.parquet(s"$base/z")
      .filter($"y".between(yLo, yHi)).groupBy($"x", $"y")
      .count().collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaLayout == direct, "the z-ordered copy must hold exactly the source rows")

    val nRows = li.count()
    def ratio(dir: String, column: String, lo: Long, hi: Long): (Int, Int) = {
      val env = ZOrder.fileEnvelopes(spark, dir, column)
      assert(env.map(_.rows).sum == nRows, "envelopes must cover every written row")
      (ZOrder.skippable(env, lo, hi), env.size)
    }
    val (xLo, xHi) = (xmax / 4, xmax / 4 + xmax / 8)
    val (zSkipY, zTotal) = ratio(s"$base/z", "y", yLo, yHi)
    val (zSkipX, _) = ratio(s"$base/z", "x", xLo, xHi)
    val (linSkipY, linTotal) = ratio(s"$base/linear", "y", yLo, yHi)
    val (linSkipX, _) = ratio(s"$base/linear", "x", xLo, xHi)
    // one z layout prunes BOTH dimensions: a 1/8-domain predicate on
    // either column must skip at least half the files
    assert(zSkipY * 2 >= zTotal,
      s"z-order must skip >=half the files on the NON-leading column: $zSkipY/$zTotal")
    assert(zSkipX * 2 >= zTotal,
      s"z-order must skip >=half the files on the leading column too: $zSkipX/$zTotal")
    // the linear layout is the control: perfect on its own sort column,
    // blind on the other (every file spans the whole y domain)
    assert(linSkipY == 0,
      s"an x-sorted layout cannot skip on y — got $linSkipY/$linTotal, is the fixture still uniform?")
    assert(linSkipX * 2 >= linTotal)
  }

  test("prunedRead returns exactly the filtered rows while scheduling only envelope-intersecting files") {
    import spark.implicits._
    // the read-side consumer of the layout (r13): file-level pruning
    // happens at PLAN time — the pruned frame's inputFiles really
    // shrink, and the result is row-identical to the full-scan filter
    // (values pinned cross-engine by q111's oracle; this test owns the
    // scheduling claim SQL can't see)
    val sf = "/root/testdata/sf0.01"
    val base = graft.util.TempDirs.scratch("zpruned-spec")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_partkey".cast("long").as("x"), $"l_suppkey".cast("long").as("y"))
    ZOrder.writeLayout(ZOrder.zkeyed(li, Seq("x", "y"), bits = 6), "zkey", 64, s"$base/z")
    val Array(xmax, ymax) = li.agg(max($"x"), max($"y")).collect()(0)
      .toSeq.map(_.asInstanceOf[Long]).toArray
    val totalFiles = spark.read.parquet(s"$base/z").inputFiles.length
    def check(c: String, lo: Long, hi: Long): Unit = {
      val pruned = ZOrder.prunedRead(spark, s"$base/z", c, lo, hi)
      def rows(df: org.apache.spark.sql.DataFrame) = df.select($"x", $"y")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(rows(pruned) ==
        rows(spark.read.parquet(s"$base/z").filter(col(c).between(lo, hi))),
        s"pruned read on $c must equal the full-scan filter row-for-row")
      assert(pruned.inputFiles.length * 2 <= totalFiles,
        s"a 1/8-domain predicate on $c must schedule <=half the files " +
          s"(got ${pruned.inputFiles.length}/$totalFiles)")
    }
    check("x", xmax / 4, xmax / 4 + xmax / 8)
    check("y", ymax / 2, ymax / 2 + ymax / 8)
    // a range beyond the domain prunes everything and scans nothing
    assert(ZOrder.prunedRead(spark, s"$base/z", "x", xmax + 10, xmax + 20).isEmpty)
    // the rectangle (r13 round tail): a conjunctive read schedules
    // exactly the INTERSECTION of the per-dimension file sets — the
    // multiplicative skip a 2-column layout exists for — and stays
    // row-identical to the full-scan conjunction
    val rx = ("x", xmax / 4, xmax / 4 + xmax / 8)
    val ry = ("y", ymax / 2, ymax / 2 + ymax / 8)
    val rect = ZOrder.prunedRead(spark, s"$base/z", Seq(rx, ry))
    val oneDx = ZOrder.prunedRead(spark, s"$base/z", rx._1, rx._2, rx._3)
    val oneDy = ZOrder.prunedRead(spark, s"$base/z", ry._1, ry._2, ry._3)
    assert(rect.inputFiles.toSet == oneDx.inputFiles.toSet.intersect(oneDy.inputFiles.toSet),
      "rectangle must schedule exactly the intersection of the per-dimension file sets")
    assert(rect.inputFiles.length < math.min(oneDx.inputFiles.length, oneDy.inputFiles.length),
      s"the 1/8x1/8 rectangle must beat both single-dimension prunes " +
        s"(${rect.inputFiles.length} vs ${oneDx.inputFiles.length}/${oneDy.inputFiles.length})")
    val rectRows = rect.select($"x", $"y")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val fullRows = spark.read.parquet(s"$base/z")
      .filter(col("x").between(rx._2, rx._3) && col("y").between(ry._2, ry._3))
      .select($"x", $"y").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(rectRows == fullRows, "rectangle read must equal the full-scan conjunction")
    val dup = intercept[IllegalArgumentException] {
      ZOrder.prunedRead(spark, s"$base/z", Seq(rx, rx))
    }
    assert(dup.getMessage.contains("duplicate"))
    // the executor-side envelope path (fanoutThreshold exceeded — the
    // 100k-file planning shape, r16) must schedule the SAME file set and
    // rows as the serial driver path
    val fanned = ZOrder.prunedRead(spark, s"$base/z", Seq(rx, ry), fanoutThreshold = 0)
    assert(fanned.inputFiles.toSet == rect.inputFiles.toSet,
      "fan-out and serial planners must agree on the scheduled file set")
    assert(fanned.select($"x", $"y")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq == rectRows)
  }

  test("prunedRead survives all-null column chunks: value-less files skip, mixed files keep exact envelopes") {
    import spark.implicits._
    // r13 review fix: the old `forall(hasNonNullValue)` require made ONE
    // all-null row group in an otherwise-populated file fail the whole
    // pruned read. Null rows can never match a range predicate, so the
    // exact behavior is: a file whose column carries NO values at all is
    // skippable, and a file mixing valued and all-null chunks keeps the
    // envelope of its valued chunks.
    val base = graft.util.TempDirs.scratch("znulls-spec")
    // file 1: y fully populated; file 2: y entirely null
    Seq((1L, Option(10L)), (2L, Option(20L))).toDF("x", "y")
      .coalesce(1).write.parquet(s"$base/t")
    Seq((3L, Option.empty[Long]), (4L, Option.empty[Long])).toDF("x", "y")
      .coalesce(1).write.mode("append").parquet(s"$base/t")
    val pruned = ZOrder.prunedRead(spark, s"$base/t", "y", 0L, 100L)
    assert(pruned.select($"x").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L),
      "rows with null y can never match; the all-null file is skippable")
    assert(pruned.inputFiles.length == 1,
      "the all-null file must be pruned at plan time, not scanned")
    // the all-null file still participates on its POPULATED column
    val onX = ZOrder.prunedRead(spark, s"$base/t", "x", 3L, 4L)
    assert(onX.select($"x").collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 4L))
    // and the envelope collector reports only value-carrying files
    val envs = ZOrder.fileEnvelopes(spark, s"$base/t", "y")
    assert(envs.length == 1 && envs.head.min == 10L && envs.head.max == 20L)
  }

  test("Warehouse.optimizeZOrder: contents unchanged, files compacted, envelopes prune on every keyed column") {
    import spark.implicits._
    // append-heavy table (8 small appends -> many files), then the
    // OPTIMIZE ZORDER maintenance pass: same rows, fewer files, and the
    // rewritten files' footer stats prune on BOTH keyed columns
    val wh = new graft.catalog.Warehouse(graft.util.TempDirs.scratch("zorder-wh"))
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .select($"l_orderkey", $"l_partkey".cast("long").as("x"), $"l_suppkey".cast("long").as("y"))
    (0 until 8).foreach(i =>
      wh.append(li.filter($"l_orderkey" % 8 === i).repartition(16), "fact"))
    val beforeRows = wh.read(spark, "fact").groupBy($"x", $"y").count()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // file count must resolve the z-grid: ~60 files over the 12-bit key
    // keeps each file inside ~1 top-prefix region (the same granularity
    // the writeLayout test measures); far fewer files would widen each
    // envelope past its prefix slice and dilute the skip ratio
    val (before, after) = wh.optimizeZOrder(spark, "fact", Seq("x", "y"),
      bits = 6, targetRowsPerFile = 1000L)
    assert(before > after, s"optimize must compact the append fragments: $before -> $after")
    val afterRows = wh.read(spark, "fact").groupBy($"x", $"y").count()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(afterRows == beforeRows, "OPTIMIZE must not change table contents")
    val Array(xmax, ymax) = wh.read(spark, "fact").agg(max($"x"), max($"y"))
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    def skipRatio(column: String, dom: Long): (Int, Int) = {
      val env = ZOrder.fileEnvelopes(spark, s"${wh.dir}/fact", column)
      (ZOrder.skippable(env, dom / 2, dom / 2 + dom / 8), env.size)
    }
    val (sx, nx) = skipRatio("x", xmax)
    val (sy, ny) = skipRatio("y", ymax)
    assert(nx >= 8, s"expected a multi-file layout, got $nx files")
    assert(sx * 2 >= nx, s"x predicate must skip >=half the files: $sx/$nx")
    assert(sy * 2 >= ny, s"y predicate must skip >=half the files: $sy/$ny")
  }

  test("Warehouse.optimizeZOrder(quantile=true): Zipf key keeps pruning after maintenance") {
    import spark.implicits._
    // r13: the maintenance path's quantile mode — a Zipf-skewed layout
    // key (log-uniform magnitudes) plus a uniform one; after OPTIMIZE
    // the dense low region of the skewed column must still prune,
    // which the linear min-max quantizer cannot deliver (its position
    // 0 holds ~2/3 of all rows — the ZOrderSpec collapse measurement)
    val wh = new graft.catalog.Warehouse(graft.util.TempDirs.scratch("zorder-wh-q"))
    val df = spark.range(30000).select(
      expr("cast(shiftleft(1L, cast(pmod(xxhash64(id, 'ox'), 20) as int)) as long)").as("x"),
      pmod(xxhash64($"id", lit("oy")), lit(4096)).as("y"))
    wh.append(df.repartition(64), "zfact") // fragmented, as an append-heavy table would be
    val beforeRows = wh.read(spark, "zfact").groupBy($"x", $"y").count()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val (before, after) = wh.optimizeZOrder(spark, "zfact", Seq("x", "y"),
      bits = 5, targetRowsPerFile = 1000L, quantile = true)
    assert(before > after, s"optimize must compact: $before -> $after")
    val afterRows = wh.read(spark, "zfact").groupBy($"x", $"y").count()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(afterRows == beforeRows, "OPTIMIZE must not change table contents")
    val env = ZOrder.fileEnvelopes(spark, s"${wh.dir}/zfact", "x").filterNot(_.rows == 0)
    val skipped = ZOrder.skippable(env, 1L, 8L)
    assert(env.size >= 8, s"expected a multi-file layout, got ${env.size}")
    assert(skipped * 2 >= env.size,
      s"dense-region predicate must skip >=half the files on the Zipf key: $skipped/${env.size}")
  }

  test("zkeyed matches a driver-side quantize+interleave reference on random rows, including negatives and degenerate domains") {
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    // negatives exercise the min-shift; the constant column exercises
    // the degenerate min==max domain (quantizes to 0 everywhere)
    val rows = Seq.fill(300)((rnd.nextInt(2000) - 1000L, rnd.nextInt(500).toLong, 7L))
    val got = ZOrder.zkeyed(rows.toDF("a", "b", "c"), Seq("a", "b", "c"), bits = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    val (amin, amax) = (rows.map(_._1).min, rows.map(_._1).max)
    val (bmin, bmax) = (rows.map(_._2).min, rows.map(_._2).max)
    def q(v: Long, lo: Long, hi: Long): Long = ((v - lo) * 32L) / (hi - lo + 1L)
    rows.foreach { case (a, b, c) =>
      val z = got((a, b, c))
      assert(ZOrder.deinterleave(z, 3, 5, 0) == q(a, amin, amax), s"a quantile wrong for $a")
      assert(ZOrder.deinterleave(z, 3, 5, 1) == q(b, bmin, bmax), s"b quantile wrong for $b")
      assert(ZOrder.deinterleave(z, 3, 5, 2) == 0L, "degenerate domain must quantize to 0")
    }
  }

  test("domain-width overflow fails loudly in both quantizer paths instead of writing a random layout") {
    import spark.implicits._
    // hash-like extremes: (v-min)*2^bits wraps Long, and max-min itself
    // wraps negative — pre-guard, interleave's masking made that a
    // silently useless layout (r12 review)
    val wide = Seq(Long.MinValue + 5L, 0L, Long.MaxValue - 5L).toDF("h")
    val err = intercept[Exception](
      ZOrder.zkeyed(wide, Seq("h"), bits = 6).collect())
    assert(err.getMessage.contains("wider than 2^57"), err.getMessage)
    val err2 = intercept[IllegalArgumentException](
      ZOrder.zkeyedWithBounds(wide, Seq("h"),
        Seq((Long.MinValue + 5L, Long.MaxValue - 5L)), bits = 6))
    assert(err2.getMessage.contains("wider than 2^57"))
    // bounds within the width limit pass and agree with the in-plan path
    val ok = Seq(10L, 500L, 1000L).toDF("v")
    val a = ZOrder.zkeyed(ok, Seq("v"), bits = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = ZOrder.zkeyedWithBounds(ok, Seq("v"), Seq((10L, 1000L)), bits = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "literal-bounds and in-plan quantizers must agree")
  }

  test("single-column interleave is the masked identity; width guard rejects sign-bit keys") {
    import spark.implicits._
    val got = Seq(300L, 65535L, 70000L).toDF("x")
      .withColumn("z", ZOrder.interleave(Seq($"x"), 16))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    got.foreach { case (x, z) => assert(z == (x & 65535L)) }
    assertThrows[IllegalArgumentException](ZOrder.interleave(Seq(lit(1L)), 64))
    assertThrows[IllegalArgumentException](ZOrder.interleave(Seq(lit(1L), lit(2L)), 32))
    assertThrows[IllegalArgumentException](ZOrder.interleave(Nil, 8))
  }

  test("zkeyedQuantile survives Zipf skew where the linear min-max quantizer collapses") {
    import spark.implicits._
    // r13 (VERDICT missing #4): x is log-uniform over 20 magnitudes
    // (1 .. 2^19) — the Zipf shape of sizes/counts/frequencies. The
    // linear quantizer maps ~2/3 of all rows (every x < domain/2^bits
    // ≈ 16384, i.e. exponents 0..13) into POSITION 0, so a predicate
    // on the dense low region cannot prune; rank-quantile positions
    // hold equal mass, so the same predicate skips most files.
    val n = 40000
    val df = spark.range(n).select(
      expr("cast(shiftleft(1L, cast(pmod(xxhash64(id, 'zx'), 20) as int)) as long)").as("x"),
      pmod(xxhash64($"id", lit("zy")), lit(4096)).as("y"))
      .persist()
    val base = graft.util.TempDirs.scratch("zorder-quantile")
    val files = 32
    ZOrder.writeLayout(ZOrder.zkeyed(df, Seq("x", "y"), bits = 5), "zkey",
      files, s"$base/linear")
    ZOrder.writeLayout(ZOrder.zkeyedQuantile(df, Seq("x", "y"), bits = 5), "zkey",
      files, s"$base/quantile")
    // correctness: the quantile layout is a permutation of the source
    val direct = df.groupBy($"x", $"y").count().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaLayout = spark.read.parquet(s"$base/quantile")
      .groupBy($"x", $"y").count().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaLayout == direct, "the quantile layout must hold exactly the source rows")
    // pruning on the dense low-x region (x <= 8: the bottom ~20% mass)
    def skip(dir: String): (Int, Int) = {
      val env = ZOrder.fileEnvelopes(spark, dir, "x").filterNot(_.rows == 0)
      (ZOrder.skippable(env, 1L, 8L), env.size)
    }
    val (qSkip, qTotal) = skip(s"$base/quantile")
    val (linSkip, linTotal) = skip(s"$base/linear")
    assert(qSkip * 2 >= qTotal,
      s"quantile layout must skip >=half the files on the dense region: $qSkip/$qTotal")
    assert(qSkip > linSkip,
      s"quantile must out-prune the collapsed linear layout: $qSkip vs $linSkip/$linTotal")
    df.unpersist()
  }

  test("multi-column quantile sketch: one job, boundaries bit-identical to per-column sketches") {
    import spark.implicits._
    // r14 (VERDICT r13 wrong #3): zkeyedQuantile paid one full
    // approxQuantile scan PER layout column; boundariesMulti sketches
    // every axis in a single Greenwald–Khanna traversal. Two pins:
    // (1) the multi-column pass returns exactly what k single-column
    // passes return (Spark's single-column form delegates to the same
    // multi-column aggregation, so equality is bitwise, not approximate);
    // (2) the k-column sketch launches exactly as many jobs as ONE
    // single-column sketch (Spark 4's approxQuantile runs a fixed
    // 2-job treeAggregate shape regardless of column count) — the
    // scan-count drop is the fix, so a regression to per-column jobs
    // must fail here.
    val df = spark.range(30000).select(
      expr("cast(shiftleft(1L, cast(pmod(xxhash64(id, 'mx'), 18) as int)) as long)").as("x"),
      pmod(xxhash64($"id", lit("my")), lit(4096)).as("y"),
      ($"id" % 977).cast("double").as("z"))
    val es = Seq(col("x"), col("y"), col("z"))
    val sc = spark.sparkContext
    sc.setJobGroup("rb-single-pin", "single-column sketch job count", false)
    val single = es.map(e => graft.functions.RankBuckets.boundaries(df, e, 32))
    val perColJobs = sc.statusTracker.getJobIdsForGroup("rb-single-pin").length
    sc.setJobGroup("rb-multi-pin", "multi-column sketch job count", false)
    val multi = graft.functions.RankBuckets.boundariesMulti(df, es, 32)
    val multiJobs = sc.statusTracker.getJobIdsForGroup("rb-multi-pin").length
    sc.clearJobGroup()
    assert(multiJobs * es.size == perColJobs,
      s"the $multiJobs-job k-column sketch must replace ${es.size} per-column " +
        s"sketches of the same shape (per-column total: $perColJobs jobs)")
    assert(multi == single,
      "multi-column boundaries must be bit-identical to per-column sketches")
  }

  test("zkeyedQuantile: DATE/TIMESTAMP layout keys map through epoch units; strings fail loudly") {
    import spark.implicits._
    val df = spark.range(200).select(
      date_add(lit(java.sql.Date.valueOf("1996-01-01")), pmod($"id", lit(400)).cast("int")).as("d"),
      timestamp_seconds(lit(820454400L) + $"id" * 86400).as("ts"),
      $"id".as("v"))
    val keyed = ZOrder.zkeyedQuantile(df, Seq("d", "ts"), bits = 4).collect()
    keyed.foreach(r => assert(r.getAs[Long]("zkey") >= 0 &&
      r.getAs[Long]("zkey") < (1L << 8)))
    // order preservation on the date axis: later dates never interleave
    // from a smaller date-position (check via single-column key)
    val dk = ZOrder.zkeyedQuantile(df.select($"d"), Seq("d"), bits = 4)
      .orderBy($"d").select($"zkey").collect().map(_.getLong(0))
    assert(dk.sliding(2).forall { case Array(a, b) => a <= b; case _ => true },
      "date quantile positions must be monotone in the date")
    assertThrows[IllegalArgumentException](
      ZOrder.zkeyedQuantile(df.select($"d".cast("string").as("s")), Seq("s"), 4))
  }

  test("zkeyedWithBounds clamps out-of-bounds rows to the domain edge (concurrent-append window)") {
    import spark.implicits._
    // ADVICE r12: a row appended between optimizeZOrder's stats job and
    // its rewrite may lie outside the collected bounds; it must land on
    // the edge position, not mask through overflow into a random key
    val df = Seq(0L, 50L, 100L, 1000L, -999L, Long.MaxValue, Long.MinValue).toDF("x")
      .withColumn("y", lit(5L))
    val keys = ZOrder.zkeyedWithBounds(df, Seq("x", "y"), Seq((0L, 100L), (0L, 10L)), bits = 5)
      .select($"x", $"zkey").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(keys(1000L) == keys(100L), "above-domain rows clamp to the upper edge")
    assert(keys(Long.MaxValue) == keys(100L), "no overflow wrap for extreme values")
    assert(keys(-999L) == keys(0L), "below-domain rows clamp to the lower edge")
    assert(keys(Long.MinValue) == keys(0L))
    keys.values.foreach(z => assert(z >= 0 && z < (1L << 10)))
  }
}
