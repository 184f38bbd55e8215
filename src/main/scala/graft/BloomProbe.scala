package graft

import org.apache.spark.sql.functions._

/** Bloom incremental-ingest confirm-join probe (r14 — VERDICT r13
  * wrong #1's done-criteria): measures the per-batch cost of
  * [[graft.operators.Bloom.newKeysAgainst]]'s exact confirm at ×MULT
  * incremental-ingest scale, at TWO historic-keyset sizes, for both
  * join directions:
  *
  *   - shipped (r14): `seen semi-join broadcast(candidates)` — seen is
  *     STREAMED once, shuffle-free; per-batch shuffle bytes must be
  *     flat in |seen|;
  *   - pre-r14 baseline (inlined here for the comparison): `candidates
  *     semi-join seen` with auto-broadcast off at these sizes — the
  *     full historic keyset is shuffled + sorted EVERY batch, so its
  *     shuffle bytes grow linearly with |seen|.
  *
  * Run: `BLOOM_MULT=100 java … graft.BloomProbe` (table lands in
  * FANIN.md). Auto-broadcast stays ON for the shipped path (it is the
  * production config — the candidates aggregate is what AQE would
  * broadcast anyway given the explicit hint) and the baseline disables
  * nothing either: at 4M+ keys the seen side exceeds the 10 MB
  * threshold naturally, which is exactly the 100 TB regime the r13
  * verdict flagged.
  */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val mult = sys.env.getOrElse("BLOOM_MULT", "100").toInt
    val mBits = 1L << 24 // 16 Mi bits ≈ 2% fp at 4M keys, k=5
    val k = 5
    val batchDups = 10000L
    val batchNew = 10000L

    val bytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) { bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten); () }
      }
    })
    def measure(f: => Long): (Long, Double, Long) = {
      Thread.sleep(1500); bytes.set(0L)
      val t0 = System.nanoTime()
      val rows = f
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500) // async listener bus drain (probe tolerance)
      (rows, secs, bytes.get())
    }

    println("| |seen| | direction | admitted | wall_s | shuffle_MiB |")
    println("|---|---|---|---|---|")
    for (seenN <- Seq(10000L * mult, 40000L * mult)) {
      val seen = spark.range(seenN).select(concat(lit("k"), $"id").as("key")).persist()
      seen.count()
      val bloom = graft.operators.Bloom.build(seen, "key", mBits, k).persist()
      bloom.count()
      // one micro-batch: half true duplicates, half fresh keys
      val batch = spark.range(batchDups)
        .select(concat(lit("k"), $"id").as("key"))
        .unionByName(spark.range(batchNew)
          .select(concat(lit("new"), $"id").as("key")))
        .withColumn("payload", lit(1L))
        .persist()
      batch.count()
      val (a, aS, aB) = measure {
        graft.operators.Bloom.newKeysAgainst(batch, seen, "key", bloom, mBits, k)
          .queryExecution.toRdd.count()
      }
      println(f"| ${seenN}%,d | shipped (seen streams, candidates broadcast) " +
        f"| $a%,d | $aS%.2f | ${aB / 1048576.0}%,.1f |")
      val (b, bS, bB) = measure {
        // the pre-r14 direction, verbatim from Bloom.scala@r13:108
        val candidates = graft.operators.Bloom.maybeSeen(batch, "key", bloom, mBits, k)
        val confirmed = candidates.join(seen.select($"key"), Seq("key"), "left_semi")
        batch.join(confirmed, Seq("key"), "left_anti")
          .queryExecution.toRdd.count()
      }
      println(f"| ${seenN}%,d | pre-r14 (seen on the build side) " +
        f"| $b%,d | $bS%.2f | ${bB / 1048576.0}%,.1f |")
      assert(a == b, s"both directions must admit the same keys: $a vs $b")
      seen.unpersist(); bloom.unpersist(); batch.unpersist()
    }

    // ---- the rewind-scrub probe at a many-file out table (r14,
    // VERDICT r13 stretch #7): the bloom stream's phase-0 no-match
    // probe, footer-planned (deleteWhere: a scan job over every file
    // with executor-side row-group skip) vs manifest-planned
    // (deleteWhereRange over a refreshed stats manifest: zero scheduled
    // files = one small manifest read, no scan job). ----
    locally {
      val files = 10 * mult // 1000 part files at x100
      val wh = new graft.catalog.Warehouse(graft.util.TempDirs.scratch("bloom-scrub"))
      spark.range(40000L * mult)
        .select($"id".as("doc_id"), pmod($"id", lit(200L)).as("batch"))
        .repartition(files)
        .write.mode("overwrite").parquet(s"${wh.dir}/out")
      wh.refreshStats(spark, "out", Seq("batch"))
      def med(f: => Boolean): Double = {
        val runs = (1 to 5).map { _ =>
          val t0 = System.nanoTime()
          val r = f
          assert(!r, "the probe predicate must match nothing")
          (System.nanoTime() - t0) / 1e9
        }
        runs.sorted.apply(2)
      }
      val viaFooters = med(wh.deleteWhere(spark, "out", "batch = 9999"))
      val viaManifest = med(wh.deleteWhereRange(spark, "out", "batch", 9999L, 9999L))
      println(f"rewind-scrub no-match probe over $files%,d files: " +
        f"footer-planned $viaFooters%.3f s vs manifest-planned $viaManifest%.3f s " +
        f"(${viaFooters / viaManifest}%.1fx)")
    }
    spark.stop()
  }
}
