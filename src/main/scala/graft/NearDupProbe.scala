package graft

import org.apache.spark.sql.functions._

/** Incremental near-dup admission probe (r14 — the q123/q124 scale
  * claim measured): a FIXED batch admitted against a GROWING historic
  * signature table, wall + shuffle bytes per admission, vs the
  * non-incremental alternative (relabel the whole corpus with
  * [[graft.operators.NearDup.componentLabelsWithRelease]]).
  *
  * History grows by replicating the sf0.01 historic split with every
  * token PREFIXED per replica (`rN_<token>`) — replicas share no
  * shingles with the batch or each other, so the candidate set stays
  * the true cross-split one at every size and the measurement isolates
  * history-size cost from candidate-mass cost (candidate mass is the
  * operator's workload, not its overhead; FANIN's fan-in tables price
  * that separately).
  *
  * Expected shape: the admission's SHUFFLE bytes are flat in |hist|
  * (the band probe and the confirm both stream the historic table past
  * broadcasts of batch-sized frames — the only shuffles are
  * candidate-scale distinct/groupBy), wall grows with the historic
  * SCAN alone (linear IO, no sort); the full relabel pays a
  * corpus-scale band shuffle plus components rounds that BOTH grow
  * with |hist|. Run: `NEARDUP_MULT=16 java … graft.NearDupProbe`
  * (table lands in FANIN.md).
  */
object NearDupProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val mult = sys.env.getOrElse("NEARDUP_MULT", "16").toInt
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    val bytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) { bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten); () }
      }
    })
    def measure[A](f: => A): (A, Double, Double) = {
      Thread.sleep(1500); bytes.set(0L)
      val t0 = System.nanoTime()
      val r = f
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500) // async listener bus drain (probe tolerance)
      (r, secs, bytes.get() / 1048576.0)
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text").persist()
    val n = docs.count()
    val batch = docs.filter($"doc_id" % 4 === 0).persist()
    batch.count()

    println("| n_hist docs | admit wall_s | admit shuffle_MiB | pruned wall_s | pruned shuffle_MiB | bands sched/total | sig sched/total | admitted | relabel wall_s | relabel shuffle_MiB |")
    println("|---|---|---|---|---|---|---|---|---|---|")
    for (m <- Seq(mult / 4, mult)) {
      // replica 0 = the real historic split; replicas 1..m-1 = token-
      // prefixed (disjoint shingles), id-shifted
      val hist = (0 until m).map { i =>
        val base = docs.filter($"doc_id" % 4 =!= 0)
        if (i == 0) base
        else base.select(($"doc_id" + lit(i * 10L * n)).as("doc_id"),
          regexp_replace($"text", "(\\S+)", s"r${i}_$$1").as("text"))
      }.reduce(_ unionByName _)
      // the historic SIGNATURE table is persisted state in production —
      // materialize it outside the measured admission
      val sigStage = graft.operators.NearDup.signaturesWithRelease(hist)
      val histSig = sigStage.frame.persist()
      val histN = histSig.count()
      val adm = graft.operators.NearDup.admitAgainstWithRelease(batch, histSig)
      val (admitted, aSecs, aMiB) = measure(adm.frame.count())
      adm.release()
      // MANIFEST-PRUNED path (r15): the history as a laid-out warehouse
      // table — band table z-ordered on key64, signatures on doc_id,
      // both manifested. Setup (the maintenance pass) is OUTSIDE the
      // measured admission, exactly as in production where OPTIMIZE
      // runs on its own schedule. rows_per_file fixed, so file count
      // GROWS with history while the point-probe schedules ~|batch
      // bands| files — wall and scheduled files go sublinear.
      val wh = new graft.catalog.Warehouse(graft.util.TempDirs.scratch("ndprobe-wh"))
      wh.overwrite(histSig, "hist")
      wh.overwrite(graft.operators.NearDup.bandTable(histSig), "bands")
      // bits=14: a single-column quantile layout has 2^bits distinct
      // range positions, which CAPS the file count — at bits=6 every
      // history size collapses to ≤64 files and the point probe cannot
      // show its shape (observed here before the raise)
      wh.optimizeZOrder(spark, "bands", Seq("key64"), bits = 14,
        targetRowsPerFile = 64L, quantile = true)
      wh.refreshStats(spark, "bands", Seq("key64"))
      wh.optimizeZOrder(spark, "hist", Seq("doc_id"), bits = 14,
        targetRowsPerFile = 64L, quantile = true)
      wh.refreshStats(spark, "hist", Seq("doc_id"))
      val sched = scala.collection.mutable.Map[String, (Int, Int)]()
      val padm = graft.operators.NearDup.admitAgainstPrunedWithRelease(
        spark, wh, batch, "hist", "bands",
        onPrune = (scan, s, t) => { sched(scan) = (s, t); () })
      val (pAdmitted, pSecs, pMiB) = measure(padm.frame.count())
      padm.release()
      require(pAdmitted == admitted,
        s"pruned admission must match: $pAdmitted vs $admitted")
      val (bS, bT) = sched.getOrElse("bands", (-1, -1))
      val (sS, sT) = sched.getOrElse("signatures", (-1, -1))
      // the non-incremental alternative: relabel history ∪ batch
      val cc = graft.operators.NearDup.componentLabelsWithRelease(
        hist.unionByName(batch))
      val (_, rSecs, rMiB) = measure(cc.frame.queryExecution.toRdd.count())
      cc.release()
      histSig.unpersist(); sigStage.release()
      println(f"| $histN | $aSecs%.2f | $aMiB%.1f | $pSecs%.2f | $pMiB%.1f | $bS/$bT | $sS/$sT | $admitted | $rSecs%.2f | $rMiB%.1f |")
    }
    spark.stop()
  }
}
