package graft.operators

import java.time.LocalDateTime

import org.scalatest.funsuite.AnyFunSuite

import graft.ledger.RunLedger
import graft.model.RunLevel
import graft.report.Reports
import graft.sources.Connections
import graft.testkit.SparkSupport

class OperatorsSpec extends AnyFunSuite with SparkSupport {

  test("AsOfJoin.backward: latest right at-or-before each left, equal ts matches, no match -> null") {
    import spark.implicits._
    val left = Seq((1L, 10L, "e1"), (1L, 5L, "e2"), (2L, 3L, "e3"))
      .toDF("k", "ts", "name")
    val right = Seq((1L, 4L, 40.0), (1L, 10L, 100.0), (2L, 7L, 70.0))
      .toDF("k", "ts", "v")
    val out = AsOfJoin.backward(left, right, "ts", Seq("k"), Seq("v"))
      .orderBy($"k", $"ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, 5L, "e2", 40.0),    // right@4 precedes
      (1L, 10L, "e1", 100.0),  // equal ts matches
      (2L, 3L, "e3", null)))   // nothing precedes
  }

  test("AsOfJoin backward AND forward match a plain-Scala reference on random series") {
    import spark.implicits._
    // the fixtures pin each rule once; this pins both directions on
    // seeded random series where equal-ts matches, no-match edges and
    // dense key collisions occur unplanned. Right side is unique per
    // (k, ts) — the operator's documented caller contract
    val rnd = new scala.util.Random(19)
    for (trial <- 1 to 3) {
      val leftRows = Seq.fill(60)((rnd.nextInt(4).toLong, rnd.nextInt(30).toLong))
        .zipWithIndex.map { case ((k, ts), i) => (k, ts, i.toLong) }
      val rightRows = Seq.fill(40)((rnd.nextInt(4).toLong, rnd.nextInt(30).toLong))
        .distinct.map { case (k, ts) => (k, ts, k * 1000 + ts) }
      val byKey = rightRows.groupBy(_._1)
      def expect(forward: Boolean) = leftRows.map { case (k, ts, id) =>
        val cands = byKey.getOrElse(k, Seq.empty)
          .filter(r => if (forward) r._2 >= ts else r._2 <= ts)
        val m = if (cands.isEmpty) None
          else Some(if (forward) cands.minBy(_._2) else cands.maxBy(_._2))
        (k, ts, id, m.map(_._3))
      }.toSet
      val left = leftRows.toDF("k", "ts", "id")
      val right = rightRows.toDF("k", "ts", "v")
      def got(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
        (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))
      }.toSet
      assert(got(AsOfJoin.backward(left, right, "ts", Seq("k"), Seq("v"))) ==
        expect(forward = false), s"trial $trial: backward diverged")
      assert(got(AsOfJoin.forward(left, right, "ts", Seq("k"), Seq("v"))) ==
        expect(forward = true), s"trial $trial: forward diverged")
    }
  }

  test("AsOfJoin.backward: composite keys partition independently") {
    import spark.implicits._
    val left = Seq((1L, "x", 10L), (1L, "y", 10L)).toDF("k1", "k2", "ts")
    val right = Seq((1L, "x", 5L, 1.0), (1L, "y", 7L, 2.0)).toDF("k1", "k2", "ts", "v")
    val out = AsOfJoin.backward(left, right, "ts", Seq("k1", "k2"), Seq("v"))
      .orderBy($"k2").collect().map(r => (r.getString(1), r.getDouble(3)))
    assert(out.toSeq == Seq(("x", 1.0), ("y", 2.0)))
  }

  test("AsOfJoin.backward: matched right row with NULL value yields NULL, not the previous non-null (ADVICE r2)") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq((1L, 4L, Option(40.0)), (1L, 8L, Option.empty[Double]))
      .toDF("k", "ts", "v")
    val out = AsOfJoin.backward(left, right, "ts", Seq("k"), Seq("v")).collect()
    // the match is right@8 (v = NULL) — 40.0 from right@4 must NOT leak through
    assert(out.length == 1 && out(0).isNullAt(2))
  }

  test("AsOfJoin.backward: ties at the same (key, ts) resolve deterministically to the last right row") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq((1L, 10L, 1.0), (1L, 10L, 2.0), (1L, 10L, 3.0)).toDF("k", "ts", "v")
    val results = (1 to 5).map { _ =>
      AsOfJoin.backward(left, right, "ts", Seq("k"), Seq("v")).collect()(0).getDouble(2)
    }
    assert(results.distinct == Seq(3.0), s"nondeterministic tie-break: $results")
  }

  test("AsOfJoin.forward: earliest right at-or-after, equal ts matches, ties take the first right row") {
    import spark.implicits._
    val left = Seq((1L, 5L, "e1"), (1L, 11L, "e2"), (2L, 3L, "e3")).toDF("k", "ts", "name")
    val right = Seq((1L, 5L, 50.0), (1L, 10L, 100.0), (2L, 1L, 10.0)).toDF("k", "ts", "v")
    val out = AsOfJoin.forward(left, right, "ts", Seq("k"), Seq("v"))
      .orderBy($"k", $"ts").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(3)) null else r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, 5L, 50.0),   // equal ts matches
      (1L, 11L, null),  // nothing follows
      (2L, 3L, null)))  // right@1 precedes, not follows
    // ties at the same (key, ts): first right row in right-side order wins
    val l2 = Seq((1L, 10L)).toDF("k", "ts")
    val r2 = Seq((1L, 10L, 1.0), (1L, 10L, 2.0), (1L, 10L, 3.0)).toDF("k", "ts", "v")
    val ties = (1 to 5).map(_ =>
      AsOfJoin.forward(l2, r2, "ts", Seq("k"), Seq("v")).collect()(0).getDouble(2))
    assert(ties.distinct == Seq(1.0), s"nondeterministic forward tie-break: $ties")
  }

  test("AsOfJoin.rangeJoin: zero/negative window is rejected, not silently empty (ADVICE r2)") {
    import spark.implicits._
    val df = Seq((1L, "2026-01-01 10:00:00")).toDF("k", "ts")
    assertThrows[IllegalArgumentException] {
      AsOfJoin.rangeJoin(df, df, "ts", Seq("k"), beforeSeconds = 0)
    }
  }

  test("AsOfJoin.rangeJoin: bounded window, no cartesian") {
    import spark.implicits._
    val left = Seq((1L, "2026-01-01 10:00:00"), (1L, "2026-01-01 12:00:00"))
      .toDF("k", "ts_s").withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")
    val right = Seq((1L, "2026-01-01 09:30:00", 1.0), (1L, "2026-01-01 11:59:00", 2.0),
      (1L, "2026-01-01 07:00:00", 3.0))
      .toDF("k", "ts_s", "v").withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")
    val out = AsOfJoin.rangeJoin(left, right, "ts", Seq("k"), beforeSeconds = 3600)
    assert(out.count() == 2) // (10:00,09:30) and (12:00,11:59); 07:00 out of range
  }

  test("BucketedWindow.rangePreceding: values identical to the global RANGE frame") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // sparse keys WITH duplicates (RANGE peers) — the two cases a
    // boundary-overlap bug would corrupt
    val df = spark.range(0, 1000).select(
      pmod(xxhash64($"id"), lit(500)).as("k"),
      pmod(xxhash64($"id", lit("v")), lit(100)).cast("double").as("v"))
    val global = Window.orderBy($"k").rangeBetween(-7, Window.currentRow)
    val expected = df.select($"k", sum($"v").over(global).as("s"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val got = BucketedWindow.rangePreceding(df, "k", preceding = 7, bucketWidth = 64)(Seq(
      "s" -> (w => sum(col("v")).over(w))))
      .select($"k", $"s")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == expected)
  }

  test("BucketedWindow.rangePreceding: exact bucketing for 2^53+ and negative keys") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // keys above 2^53: double division of k/width rounds by ~4 ulps here,
    // so a float-based floor would mis-bucket boundary rows
    val base = 1770000000000000000L
    def check(df: org.apache.spark.sql.DataFrame): Unit = {
      val global = Window.orderBy($"k").rangeBetween(-9, Window.currentRow)
      val expected = df.select($"k", sum($"v").over(global).as("s"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      val got = BucketedWindow.rangePreceding(df, "k", preceding = 9, bucketWidth = 64)(Seq(
        "s" -> (w => sum(col("v")).over(w))))
        .select($"k", $"s")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(got == expected)
    }
    check(spark.range(0, 300).select(($"id" + base).as("k"), lit(1.0).as("v")))
    check(spark.range(0, 300).select(($"id" - 150).as("k"), lit(1.0).as("v")))
  }

  test("BucketedWindow.rangePreceding: fractional ordering keys still work (floor in key arithmetic)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = spark.range(0, 200).select(($"id".cast("double") / 3.0).as("k"), lit(1.0).as("v"))
    val global = Window.orderBy($"k").rangeBetween(-5, Window.currentRow)
    val expected = df.select($"k", sum($"v").over(global).as("s"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    val got = BucketedWindow.rangePreceding(df, "k", preceding = 5, bucketWidth = 16)(Seq(
      "s" -> (w => sum(col("v")).over(w))))
      .select($"k", $"s").collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(got == expected)
  }

  test("BucketedWindow.rangePreceding: a bucket narrower than the frame is rejected") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = spark.range(10).select($"id".as("k"))
    intercept[IllegalArgumentException] {
      BucketedWindow.rangePreceding(df, "k", preceding = 10, bucketWidth = 10)(Seq(
        "c" -> (w => count(lit(1)).over(w))))
    }
  }

  test("CosineNearDup.scaledPlanes: grows ~log2(n), floored at the fixture config") {
    assert(CosineNearDup.scaledPlanes(1L) == 4)
    assert(CosineNearDup.scaledPlanes(1000L) == 4)
    assert(CosineNearDup.scaledPlanes(200000L) == 12)
    assert(CosineNearDup.scaledPlanes(1000000000L) == 24)
  }

  test("CosineNearDup: capping is a no-op under the cap, a bounded subset above it") {
    val embs = graft.FanIn.genEmbeddings(spark, 300)
    def pairsAt(cap: Int): Set[(Long, Long)] =
      CosineNearDup.pairs(embs, "vec_id", "embedding", 64, 0.3, planes = 4, maxBucket = cap)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairsAt(1000000)
    // 300 vectors over 16 buckets: every bucket is under the default 500
    // cap, so the default path is bit-identical (the q24 gate invariant)
    assert(pairsAt(500) == uncapped)
    // a tiny cap drops cross-sub pairs but never invents any
    val tight = pairsAt(20)
    assert(tight.nonEmpty && tight.subsetOf(uncapped) && tight.size < uncapped.size)
    // the operator's documented caller obligation: release its blocking
    // frame (SparkSupport's afterAll cache gate enforces this)
    spark.catalog.clearCache()
  }

  test("Media.resizeNearest: known 4x4 grid downsamples to the expected 2x2 corners") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // row-major 4x4 grid 0..15; nearest-neighbor 2x2 takes (0,0),(0,2),(2,0),(2,2)
    val grid: Array[Byte] = (0 until 16).map(_.toByte).toArray
    val media = Seq((1L, grid)).toDF("media_id", "payload")
    val out = Media.resizeNearest(media, srcW = 4, srcH = 4, dstW = 2, dstH = 2)
      .select($"media_id", $"resized").head()
    assert(out.getAs[Array[Byte]](1).toSeq == Seq[Byte](0, 2, 8, 10))
  }

  test("Media.imageMeta: PNG/JPEG/GIF/BMP headers parse without codecs") {
    // minimal PNG: signature + IHDR with width=640 height=480
    val png = Array[Int](0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 2, 0x80, /*640*/ 0, 0, 1, 0xe0 /*480*/).map(_.toByte)
    assert(Media.imageMeta(png) == Some(("png", 640, 480)))
    // GIF89a 320x200 (little-endian)
    val gif = "GIF89a".getBytes("US-ASCII") ++ Array[Int](0x40, 0x01, 0xc8, 0x00).map(_.toByte)
    assert(Media.imageMeta(gif) == Some(("gif", 320, 200)))
    // BMP header: "BM", dims at 18/22 LE
    val bmp = new Array[Byte](26)
    bmp(0) = 'B'; bmp(1) = 'M'; bmp(18) = 0x20; bmp(19) = 0x03 // 800
    bmp(22) = 0x58; bmp(23) = 0x02 // 600
    assert(Media.imageMeta(bmp) == Some(("bmp", 800, 600)))
    // JPEG: SOI, APP0 (skipped by the marker walk), SOF0 with h=1080 w=1920
    val jpeg = Array[Int](0xff, 0xd8,
      0xff, 0xe0, 0x00, 0x04, 0x00, 0x00, // APP0, len 4
      0xff, 0xc0, 0x00, 0x0b, 0x08, 0x04, 0x38, 0x07, 0x80, 0x01, 0x00).map(_.toByte)
    assert(Media.imageMeta(jpeg) == Some(("jpeg", 1920, 1080)))
    // garbage → None; probeHeaders maps it to "unknown"
    assert(Media.imageMeta("not an image".getBytes).isEmpty)
    // top-down BMP: negative biHeight is a VALID image; height normalized
    // (r10 review)
    val topDown = bmp.clone()
    topDown(22) = 0xa8.toByte; topDown(23) = 0xfd.toByte
    topDown(24) = 0xff.toByte; topDown(25) = 0xff.toByte // -600 LE
    assert(Media.imageMeta(topDown) == Some(("bmp", 800, 600)))
    // 0xFF fill bytes before a marker are spec-legal; the walk must skip
    // them instead of derailing (r10 review)
    val padded = Array[Int](0xff, 0xd8,
      0xff, 0xff, 0xff, 0xe0, 0x00, 0x04, 0x00, 0x00, // fill, fill, APP0
      0xff, 0xc0, 0x00, 0x0b, 0x08, 0x04, 0x38, 0x07, 0x80, 0x01, 0x00).map(_.toByte)
    assert(Media.imageMeta(padded) == Some(("jpeg", 1920, 1080)))
    // WAV: RIFF/WAVE + fmt chunk (2ch, 44100 Hz), preceded by a JUNK chunk
    val wav = ("RIFF".getBytes("US-ASCII") :+ 0.toByte :+ 0.toByte :+ 0.toByte :+ 0.toByte) ++
      "WAVE".getBytes("US-ASCII") ++
      ("JUNK".getBytes("US-ASCII") ++ Array[Byte](2, 0, 0, 0, 0, 0)) ++ // len 2 + pad data
      ("fmt ".getBytes("US-ASCII") ++ Array[Byte](16, 0, 0, 0,
        1, 0, /* PCM */ 2, 0, /* channels */ 0x44.toByte, 0xac.toByte, 0, 0 /* 44100 */) ++
        new Array[Byte](8))
    assert(Media.audioMeta(wav) == Some(("wav", 44100, 2)))
    assert(Media.audioMeta("RIFFxxxxNOPE".getBytes).isEmpty)
    import spark.implicits._
    val metas = Media.probeHeaders(Seq(
      Media.MediaRecord(1L, "image/png", png),
      Media.MediaRecord(2L, "text/plain", "hello".getBytes)).toDS())
      .collect().sortBy(_.media_id)
    assert(metas(0) == Media.MediaMeta(1L, "png", 640, 480))
    assert(metas(1) == Media.MediaMeta(2L, "unknown", -1, -1))
  }

  test("Media.process: per-partition batch decode with byte-accurate features") {
    import spark.implicits._
    val media = Seq(
      Media.MediaRecord(1L, "text/plain", "hello world".getBytes("UTF-8")),
      Media.MediaRecord(2L, "text/plain", Array[Byte]())).toDS().repartition(2)
    val out = Media.process(media).collect().sortBy(_.media_id)
    assert(out(0).n_bytes == 11L)
    assert(out(0).checksum == "5eb63bbbe01eeed093cb22bb8f5acdc3") // md5("hello world")
    assert(out(0).head == "hello world")
    assert(out(1).n_bytes == 0L)
    // the codec slot is a clearly-marked stub
    assertThrows[NotImplementedError] {
      Media.codecDecoder(Media.MediaRecord(3L, "image/jpeg", Array[Byte](1)))
    }
  }

  test("Media.sampleSegments: stride sampling over binary payloads") {
    val media = Media.documentsAsMedia(
      spark.createDataFrame(Seq((1L, "abcdefghijklmnopqrstuvwxyz")))
        .toDF("doc_id", "text"))
    val segs = Media.sampleSegments(media, width = 4, stride = 10, maxSamples = 3)
      .collect().sortBy(_.getInt(1))
    assert(segs.length == 2) // 26 bytes / 10 = 2 samples
    assert(new String(segs(0).getAs[Array[Byte]]("segment"), "UTF-8") == "abcd")
    assert(new String(segs(1).getAs[Array[Byte]]("segment"), "UTF-8") == "klmn")
  }

  test("Connections: JDBC option mapping carries pushdown, batching and partitioning") {
    val j = Connections.Jdbc("jdbc:postgresql://h/db", "u", "p",
      driver = Some("org.postgresql.Driver"), fetchSize = 5000, numPartitions = 16)
    val opts = Connections.jdbcOptions(j, "SELECT * FROM t WHERE x > 0")
    assert(opts("dbtable") == "(SELECT * FROM t WHERE x > 0) q") // full-query pushdown
    assert(opts("fetchsize") == "5000")
    // numPartitions is NOT a read option: without partitionColumn/bounds
    // or predicates Spark ignores it, and advertising it implied a
    // parallel read that never existed (r10 review) — the parallel read
    // path is `read(..., predicates)`; writes carry it (below)
    assert(!opts.contains("numPartitions"))
    assert(opts("driver") == "org.postgresql.Driver")
    val w = Connections.jdbcWriteOptions(j, "dst", batchSize = 50000)
    assert(w("batchsize") == "50000")
    assert(w("numPartitions") == "16")
    // parquet + csv paths resolve through the same interface
    val df = Connections.read(spark, Connections.ParquetDir("/root/testdata/sf0.001"), "region")
    assert(df.count() == 5)
    val csvDir = tmpDir("conn-csv")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$csvDir/drop"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$csvDir/drop/part1.csv"), "id,v\n1,a\n2,b\n")
    val csv = Connections.read(spark, Connections.CsvDir(csvDir), "drop")
    assert(csv.count() == 2 && csv.columns.toSeq == Seq("id", "v"))
  }

  test("run-DAG DOT rendering from ledger rows") {
    val ledger = new RunLedger(() => LocalDateTime.of(2026, 2, 1, 12, 0))
    val wf = ledger.start(RunLevel.Workflow, 1)
    val pk = ledger.start(RunLevel.Paket, 10, workflowRunId = Some(wf))
    val um = ledger.start(RunLevel.Umsetzung, 100, workflowRunId = Some(wf), paketRunId = Some(pk))
    val st = ledger.start(RunLevel.Schritt, 1000, workflowRunId = Some(wf),
      paketRunId = Some(pk), umsetzungRunId = Some(um))
    ledger.markFinished(wf, success = true)
    ledger.markFinished(st, success = false)
    val dot = Reports.runDagDot(ledger.current)
    assert(dot.startsWith("digraph run {"))
    assert(dot.contains(s"workflow_$wf -> paket_$pk;"))
    assert(dot.contains(s"paket_$pk -> paketumsetzung_$um;"))
    assert(dot.contains(s"paketumsetzung_$um -> paketschritt_$st;"))
    assert(dot.contains("color=red")) // the failed step
  }

  test("IvfIndex.assign: argmin of exact squared L2, ties to lowest cid, input columns carried") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val vecs = spark.range(50).select($"id".as("vec_id"),
      transform(sequence(lit(0), lit(7)),
        d => pmod(xxhash64($"id", d), lit(100)).cast("double")).as("e"))
    val cents = vecs.filter($"vec_id" < 4).select($"vec_id".as("cid"), $"e".as("ce"))
    val out = IvfIndex.assign(vecs, cents, embCol = "e", idCol = "vec_id")
    assert(out.columns.toSeq == Seq("vec_id", "cell", "e"))
    val cArr = cents.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).sortBy(_._1)
    val expect = vecs.collect().map { r =>
      val e = r.getSeq[Double](1)
      val best = cArr.map { case (cid, ce) =>
        (cid, e.zip(ce).map { case (x, y) => (x - y) * (x - y) }.sum)
      }.minBy { case (cid, d) => (d, cid) }
      r.getLong(0) -> best._1
    }.toMap
    val got = out.select($"vec_id", $"cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }

  test("IvfIndex.probeCells: the nprobe nearest cells per query, query columns carried") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val vecs = spark.range(20).select($"id".as("vec_id"),
      transform(sequence(lit(0), lit(7)),
        d => pmod(xxhash64($"id", d), lit(100)).cast("double")).as("e"))
    val cents = vecs.filter($"vec_id" < 5).select($"vec_id".as("cid"), $"e".as("ce"))
    val queries = vecs.filter($"vec_id" >= 17)
    val out = IvfIndex.probeCells(queries, cents, embCol = "e", idCol = "vec_id", nprobe = 2)
    assert(out.columns.toSeq == Seq("vec_id", "e", "cell"))
    val cArr = cents.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).sortBy(_._1)
    val expect = queries.collect().map { r =>
      val e = r.getSeq[Double](1)
      val near2 = cArr.map { case (cid, ce) =>
        (cid, e.zip(ce).map { case (x, y) => (x - y) * (x - y) }.sum)
      }.sortBy { case (cid, d) => (d, cid) }.take(2).map(_._1).toSet
      r.getLong(0) -> near2
    }.toMap
    val got = out.select($"vec_id", $"cell").collect()
      .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
    assert(got == expect)
  }

  test("IvfIndex: corrupt vectors (dim mismatch / null element) drop out of assign and probeCells instead of winning cid 0 (ADVICE r5)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val good = spark.range(10).select($"id".as("vec_id"),
      transform(sequence(lit(0), lit(7)),
        d => pmod(xxhash64($"id", d), lit(100)).cast("double")).as("e"))
    val cents = good.filter($"vec_id" < 3).select($"vec_id".as("cid"), $"e".as("ce"))
    // vec 100: wrong length (3 elems); vec 101: a null element
    val corrupt = Seq(
      (100L, Seq[java.lang.Double](1.0, 2.0, 3.0)),
      (101L, Seq[java.lang.Double](1.0, null, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0))
    ).toDF("vec_id", "e").select($"vec_id", $"e".cast("array<double>").as("e"))
    val all = good.unionByName(corrupt)
    val out = IvfIndex.assign(all, cents, embCol = "e", idCol = "vec_id")
    val ids = out.select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(ids == (0L until 10L).toSet, s"corrupt vectors must drop out, got $ids")
    // a corrupt vector must never claim the lowest cid
    assert(!out.filter($"vec_id" >= 100).collect().exists(_.getLong(1) == 0L))
    val probed = IvfIndex.probeCells(corrupt, cents, embCol = "e", idCol = "vec_id", nprobe = 2)
    assert(probed.count() == 0, "corrupt queries must probe no cells")
  }

  test("IvfIndex refuses a codebook over the broadcast bound with actionable guidance (VERDICT r5 item 7)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // C=65536 × 1024 dims ≈ 537 MiB estimated — a real embedding-model
    // codebook that must NOT be hard-broadcast (the constant-key join
    // has no shuffle fallback; the scale path is hierarchical)
    val dims = 1024
    val bigBook = spark.range(65536).select($"id".as("cid"),
      transform(sequence(lit(0), lit(dims - 1)),
        d => pmod(xxhash64($"id", d), lit(100)).cast("double")).as("ce"))
    val vecs = spark.range(4).select($"id".as("vec_id"),
      transform(sequence(lit(0), lit(dims - 1)), d => d.cast("double")).as("e"))
    val e = intercept[IllegalArgumentException] {
      IvfIndex.assign(vecs, bigBook, embCol = "e", idCol = "vec_id")
    }
    assert(e.getMessage.contains("too large to broadcast"))
    assert(e.getMessage.contains("hierarchical"))
    assert(IvfIndex.codebookBytes(65536L, dims) > IvfIndex.DefaultMaxCodebookBytes)
    // the SAME over-default codebook passes when the caller raises the
    // bound — construction only (the guard is the construction-time
    // check; actually broadcasting 516 MiB is not a unit test's job)
    val accepted = IvfIndex.assign(vecs, bigBook,
      embCol = "e", idCol = "vec_id", maxCodebookBytes = 1L << 30)
    assert(accepted.columns.contains("cell"))
    // and a small codebook still executes end-to-end under a raised bound
    val out = IvfIndex.assign(vecs.limit(1), bigBook.limit(8),
      embCol = "e", idCol = "vec_id", maxCodebookBytes = 1L << 30)
    assert(out.count() == 1)
    // and the 64-dim production case (C=65536) stays comfortably inside
    assert(IvfIndex.codebookBytes(65536L, 64) < IvfIndex.DefaultMaxCodebookBytes)
  }

  test("IvfIndex.assignHierarchical: two-level argmin matches the driver-side reference, flat cell = cell1*C2 + cell2") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val vecs = spark.range(60).select($"id".as("vec_id"),
      transform(sequence(lit(0), lit(7)),
        d => pmod(xxhash64($"id", d), lit(100)).cast("double")).as("e"))
    val coarse = vecs.filter($"vec_id" < 3).select($"vec_id".as("cid"), $"e".as("ce"))
    // fine book: 4 arbitrary residual-space centroids (deterministic)
    val fine = spark.range(4).select($"id".as("cid"),
      transform(sequence(lit(0), lit(7)),
        d => (pmod(xxhash64($"id" + 7, d), lit(41)).cast("double") - 20.0)).as("ce"))
    val out = IvfIndex.assignHierarchical(vecs, coarse, fine, embCol = "e", idCol = "vec_id")
    assert(out.columns.toSeq == Seq("vec_id", "cell1", "cell2", "cell", "e"))
    val cArr = coarse.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).sortBy(_._1)
    val fArr = fine.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).sortBy(_._1)
    def argmin(e: Seq[Double], book: Array[(Long, Seq[Double])]): (Long, Seq[Double]) = {
      val (cid, _, ce) = book.map { case (cid, ce) =>
        (cid, e.zip(ce).map { case (x, y) => (x - y) * (x - y) }.sum, ce)
      }.minBy { case (cid, d, _) => (d, cid) }
      (cid, ce)
    }
    val expect = vecs.collect().map { r =>
      val e = r.getSeq[Double](1)
      val (c1, ce1) = argmin(e, cArr)
      val res = e.zip(ce1).map { case (x, y) => x - y }
      val (c2, _) = argmin(res, fArr)
      r.getLong(0) -> ((c1, c2, c1 * 4 + c2))
    }.toMap
    val got = out.select($"vec_id", $"cell1", $"cell2", $"cell").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expect)
  }

  test("IvfIndex.assignHierarchical: the embedding-model codebook the flat guard refuses (C=65536 x 1024 dims) WORKS through the hierarchy") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dims = 1024
    // effective C = 256 x 256 = 65536 cells — the exact shape the flat
    // 512 MiB guard refuses; each level's book is ~2 MiB and broadcasts
    val coarse = spark.range(256).select($"id".as("cid"),
      transform(sequence(lit(0), lit(dims - 1)),
        d => pmod(xxhash64($"id", d), lit(100)).cast("double")).as("ce"))
    val fine = spark.range(256).select($"id".as("cid"),
      transform(sequence(lit(0), lit(dims - 1)),
        d => (pmod(xxhash64($"id" + 13, d), lit(21)).cast("double") - 10.0)).as("ce"))
    assert(IvfIndex.codebookBytes(65536L, dims) > IvfIndex.DefaultMaxCodebookBytes,
      "the flat equivalent must be over-bound for this test to mean anything")
    assert(IvfIndex.codebookBytes(256L, dims) * 2 < IvfIndex.DefaultMaxCodebookBytes)
    val vecs = spark.range(4).select($"id".as("vec_id"),
      transform(sequence(lit(0), lit(dims - 1)),
        d => pmod(xxhash64($"id" + 99, d), lit(100)).cast("double")).as("e"))
    val out = IvfIndex.assignHierarchical(vecs, coarse, fine,
      embCol = "e", idCol = "vec_id").select($"vec_id", $"cell").collect()
    assert(out.length == 4)
    assert(out.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 65536L),
      "flat cell ids must live in [0, C1*C2)")
    // and the probe side holds at the same shape
    val probes = IvfIndex.probeCellsHierarchical(vecs.limit(1), coarse, fine,
      embCol = "e", idCol = "vec_id", nprobeCoarse = 2, nprobeFine = 3)
    assert(probes.count() == 6, "nprobeCoarse x nprobeFine candidate cells per query")
  }

  test("IvfIndex.probeCellsHierarchical: nprobe1 x nprobe2 cells, residual taken against each PROBED coarse centroid") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val vecs = spark.range(30).select($"id".as("vec_id"),
      transform(sequence(lit(0), lit(7)),
        d => pmod(xxhash64($"id", d), lit(100)).cast("double")).as("e"))
    val coarse = vecs.filter($"vec_id" < 4).select($"vec_id".as("cid"), $"e".as("ce"))
    val fine = spark.range(3).select($"id".as("cid"),
      transform(sequence(lit(0), lit(7)),
        d => (pmod(xxhash64($"id" + 5, d), lit(31)).cast("double") - 15.0)).as("ce"))
    val queries = vecs.filter($"vec_id" >= 28)
    val out = IvfIndex.probeCellsHierarchical(queries, coarse, fine,
      embCol = "e", idCol = "vec_id", nprobeCoarse = 2, nprobeFine = 2)
    val cArr = coarse.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).sortBy(_._1)
    val fArr = fine.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).sortBy(_._1)
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val expect = queries.collect().flatMap { r =>
      val e = r.getSeq[Double](1)
      cArr.map { case (c1, ce1) => (c1, d2(e, ce1), ce1) }
        .sortBy { case (c1, d, _) => (d, c1) }.take(2)
        .flatMap { case (c1, _, ce1) =>
          val res = e.zip(ce1).map { case (x, y) => x - y }
          fArr.map { case (c2, ce2) => (c2, d2(res, ce2)) }
            .sortBy { case (c2, d) => (d, c2) }.take(2)
            .map { case (c2, _) => (r.getLong(0), c1, c2, c1 * 3 + c2) }
        }
    }.toSet
    val got = out.select($"vec_id", $"cell1", $"cell2", $"cell").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expect)
  }

  test("IvfIndex.codebookMeta memoizes per canonicalized plan: an independently-built identical pipeline hits the cache (VERDICT r6 #1)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    IvfIndex.clearCodebookMetaCache()
    val dir = tmpDir("ivf-meta")
    spark.range(16).select($"id".as("cid"),
      transform(sequence(lit(0), lit(7)), d => d.cast("double")).as("ce"))
      .write.mode("overwrite").parquet(s"$dir/book")
    def book() = spark.read.parquet(s"$dir/book").filter($"cid" < 8)
    val m1 = IvfIndex.codebookMeta(book())
    val m2 = IvfIndex.codebookMeta(book()) // fresh read, same canonical plan
    assert(m1 == IvfIndex.CodebookMeta(8, 8, 0, 7))
    assert(m1 eq m2, "cache hit must return the memoized instance (no second metadata job)")
    // a semantically different plan misses (and measures correctly)
    val m3 = IvfIndex.codebookMeta(spark.read.parquet(s"$dir/book").filter($"cid" < 4))
    assert(m3.rows == 4 && !(m3 eq m1))
    IvfIndex.clearCodebookMetaCache()
  }

  test("codebookMeta fingerprint digests LocalRelation rows (ADVICE r9): same-shape literal codebooks with different centroids separate beyond the 32-bit semanticHash") {
    import spark.implicits._
    // Spark 4.x LogicalPlan.toJSON renders LocalRelation rows as "data":null,
    // so before the explicit row digest two same-schema in-memory codebooks
    // with different centroids shared the MD5 and were separated only by the
    // 32-bit semanticHash — a collision there would serve stale CodebookMeta
    // (fineC), silently corrupting the hierarchical flat cell id.
    def fp(df: org.apache.spark.sql.DataFrame): String =
      IvfIndex.planFingerprint(df.queryExecution.analyzed.canonicalized)
    val f1 = fp(Seq((0L, Seq(0.0, 0.0)), (1L, Seq(1.0, 1.0))).toDF("cid", "ce"))
    val f2 = fp(Seq((0L, Seq(0.0, 0.0)), (1L, Seq(2.0, 1.0))).toDF("cid", "ce"))
    assert(f1 != f2)
    assert(f1.split(":")(1) != f2.split(":")(1),
      "the MD5 part itself must separate different centroid data, not just the semanticHash")
    // deterministic: an independently-built identical literal book fingerprints the same
    val f1b = fp(Seq((0L, Seq(0.0, 0.0)), (1L, Seq(1.0, 1.0))).toDF("cid", "ce"))
    assert(f1b == f1)
  }

  test("hierarchical IVF refuses a sparse-cid fine codebook (flat cell id not injective, ADVICE r7)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    IvfIndex.clearCodebookMetaCache()
    val vecs = spark.range(20).select($"id".as("vec_id"),
      transform(sequence(lit(0), lit(3)),
        d => pmod(xxhash64($"id", d), lit(100)).cast("double")).as("e"))
    val coarse = vecs.filter($"vec_id" < 2).select($"vec_id".as("cid"), $"e".as("ce"))
    // cids {0, 2, 3}: max(cid)=3 != rows-1=2 — (cell1=0,cell2=3) would
    // collide with (cell1=1,cell2=0) in cell1*3+cell2 arithmetic
    val sparseFine = vecs.filter($"vec_id".isin(2, 4, 5))
      .select(when($"vec_id" === 2, 0L).when($"vec_id" === 4, 2L).otherwise(3L).as("cid"),
        $"e".as("ce"))
    val e = intercept[IllegalArgumentException] {
      IvfIndex.assignHierarchical(vecs, coarse, sparseFine, embCol = "e", idCol = "vec_id")
    }
    assert(e.getMessage.contains("DENSE fine cids"))
    // dense books pass (and probe side enforces the same contract)
    val denseFine = vecs.filter($"vec_id" >= 2 && $"vec_id" < 5)
      .select(($"vec_id" - 2).as("cid"), $"e".as("ce"))
    assert(IvfIndex.assignHierarchical(vecs, coarse, denseFine,
      embCol = "e", idCol = "vec_id").count() == 20)
    val e2 = intercept[IllegalArgumentException] {
      IvfIndex.probeCellsHierarchical(vecs.limit(3), coarse, sparseFine,
        embCol = "e", idCol = "vec_id", nprobeCoarse = 1, nprobeFine = 1)
    }
    assert(e2.getMessage.contains("DENSE fine cids"))
    IvfIndex.clearCodebookMetaCache()
  }

  test("IvfIndex.assign plans a broadcast hash join + partial aggregation (codebook as data)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // spark.range (not Seq.toDF) so ConvertToLocalRelation can't fold the plan away
    val vecs = spark.range(200).select($"id".as("vec_id"),
      transform(sequence(lit(0), lit(7)),
        d => pmod(xxhash64($"id", d), lit(100)).cast("double")).as("e"))
    val cents = vecs.filter($"vec_id" < 8).select($"vec_id".as("cid"), $"e".as("ce"))
    val out = IvfIndex.assign(vecs, cents, embCol = "e", idCol = "vec_id")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"),
      s"codebook must be a broadcast build side:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"constant-key equi-join must not degrade to a nested loop:\n$plan")
    // the C-way expansion must reduce map-side (one shuffled row per
    // vector, not C): the min_by aggregate plans a partial step
    val aggs = plan.linesIterator.filter(_.contains("Aggregate")).toSeq
    assert(aggs.exists(_.contains("partial")),
      s"expected partial (map-side) min_by aggregation in:\n${aggs.mkString("\n")}")
  }

  test("safe exit closes every open ledger row unsuccessfully (Helper.cs:2964-3140)") {
    val ledger = new RunLedger(() => LocalDateTime.of(2026, 2, 1, 12, 0))
    val a = ledger.start(RunLevel.Workflow, 1)
    val b = ledger.start(RunLevel.Paket, 10, workflowRunId = Some(a))
    ledger.markFinished(b, success = true)
    val closed = ledger.closeAllOpen()
    assert(closed == 1)
    val row = ledger.currentOf(a).get
    assert(row.istAbgeschlossen && !row.erfolgreich && row.endzeitpunkt.isDefined)
    // already-closed rows untouched
    assert(ledger.currentOf(b).get.erfolgreich)
  }
}
