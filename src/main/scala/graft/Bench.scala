package graft

/** Benchmark main — runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...,"queries":{...}}. A failed query
  * reports -1 seconds (instead of silently reporting its time-to-throw).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    // Warm the JVM/codegen once so per-query numbers measure the plan, not
    // first-call classloading. Must never abort the bench (ADVICE r1).
    // toRdd, not count(): count() prunes the aggregate expressions, so the
    // flagship's decimal-fold codegen would otherwise compile INSIDE the
    // first measured run (~10 s of JIT booked to q01). One representative
    // per plan family (agg, broadcast join, window). The warmup scale is
    // the sibling sf0.001 dir when the measured dir follows the
    // /…/sfX.Y layout, else the measured dir itself (ADVICE r3: a
    // hardcoded path warms NOTHING on other layouts and the error is
    // swallowed by design).
    val warmDir = {
      val sibling = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
      if (sibling.isDirectory) sibling.toString else sfDir
    }
    Seq("q01_pricing_summary", "q05_revenue_by_region", "q07_last_event_per_user")
      .foreach { w =>
        try SparkEntry.queries(w)(spark, warmDir).queryExecution.toRdd.count()
        catch { case e: Throwable =>
          System.err.println(s"[bench] warmup $w failed: ${e.getMessage}")
        }
      }
    // Two timings per query:
    //  - old methodology (r1/r2 anchor): df.count() — Catalyst prunes the
    //    projection, so map-only queries measured scan+count only;
    //  - new methodology (r3 anchor onward): execute the FULL physical plan
    //    via queryExecution.toRdd.count() — unprunable, every projected
    //    column is actually computed.
    // "value"/"queries" report the new numbers. The old count() pass is
    // OPT-IN since r10 (SPARK_GRAFT_BENCH_COUNT_ACTION=1): its anchor
    // rounds (r1/r2) are long obsolete and at 77 queries it cost ~88 s of
    // driver bench wall — pure contention-window growth for a continuity
    // total nobody compares anymore (VERDICT r9 item 3). When disabled,
    // "total_count_action" is emitted as -1 so the driver's tail parser
    // sees an unchanged field set. Methodology note (r10 review): the
    // count() pass doubled as a same-query warm-up before rep 1, so with
    // it off, "total_run1" includes each query's true first-touch
    // JIT/page-cache cost that r3-r9 records absorbed into the count()
    // pass — total_run1 is only comparable within a methodology era
    // (total_count_action == -1 is the era marker); the median "value"
    // is insulated by reps 2-3. When enabled, the two totals are NOT
    // independent samples: the full-plan run follows the count() run of
    // the same query in the same JVM, so it inherits its JIT and page
    // cache (ADVICE r3) — compare either total across rounds, not the
    // two against each other.
    val countAction = sys.env.get("SPARK_GRAFT_BENCH_COUNT_ACTION")
      .exists(v => v == "1" || v.equalsIgnoreCase("true"))
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // Median of REPS full-plan runs per query (VERDICT r5 item 3: r5's
    // single-run bench showed a ±30% noise band across untouched queries
    // — one local[32] sample cannot distinguish noise from regression).
    // The cache is cleared between runs so every sample executes the
    // query's own persists from cold, and so no query inherits another's
    // cached subtrees ("already cached" warnings, r5 item 2).
    val reps = math.max(1,
      sys.env.get("SPARK_GRAFT_BENCH_REPS").flatMap(_.toIntOption).getOrElse(3))
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    // Forensic subset runs (VERDICT r9 item 2: reproduce one query's
    // JVM-to-JVM swing without paying the full 78-query wall): a
    // comma-separated name list restricts the measured set. Totals over a
    // subset are NOT comparable across rounds — the sidecar still records
    // the filter via n_queries and the per-query keys, so a partial record
    // cannot masquerade as a full one.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = selected.map { case (name, fn) =>
      try {
        val old = if (countAction) time(fn(spark, sfDir).count()) else -1.0
        spark.catalog.clearCache()
        // BookCache too: a measured rep must run its query's full
        // train+build+search pipeline, or per-query times stop being
        // comparable across rounds (the cache is a Verify/production
        // optimization, not a bench one)
        graft.operators.BookCache.clear()
        val runs = (1 to reps).map { _ =>
          val t = time(fn(spark, sfDir).queryExecution.toRdd.count())
          spark.catalog.clearCache()
          graft.operators.BookCache.clear()
          t
        }
        // per-gate scratch hygiene (r14, VERDICT r13 wrong #2): the
        // footer/rewrite/checkpoint-heavy lifecycle gates accrete
        // checkpoint + sink + warehouse trees in /tmp that churn page
        // cache under every gate measured AFTER them — the r13
        // sidecar's in-suite interference class (q96 read 8.05 s
        // in-suite vs 5.44 s standalone with zero code change). Each
        // gate's scratch is swept as soon as its reps are consumed
        // (toRdd.count materialized every plan, so nothing lazy still
        // reads these dirs; the one cross-gate memo — q20's warehouse,
        // re-read by nothing after its own reps — is sweep-safe).
        graft.util.TempDirs.sweep()
        streamingResidueSweep(spark)
        (name, old, median(runs), runs)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          spark.catalog.clearCache()
          graft.operators.BookCache.clear()
          graft.util.TempDirs.sweep()
          streamingResidueSweep(spark)
          (name, -1.0, -1.0, Seq.empty[Double])
      }
    }
    val totalOld =
      if (countAction) results.collect { case (_, v, _, _) if v >= 0 => v }.sum else -1.0
    val total = results.collect { case (_, _, v, _) if v >= 0 => v }.sum
    // Sum of per-query MINIMUM across reps (VERDICT r9 item 1): under
    // driver-machine contention the min-of-3 is the least-contended
    // sample per query, while the median inflates whenever 2 of 3 reps
    // are hit — r8 and r9 both produced official records unreadable at
    // load_avg 7+. The median stays the headline "value" for cross-round
    // continuity; total_min_plan makes the record interpretable without
    // a re-run.
    val totalMin = results.collect { case (_, _, m, r) if m >= 0 => r.min }.sum
    // Streaming gates execute a full StreamingQuery lifecycle (checkpoint
    // dir, AvailableNow drain, parquet sink commit protocol, readback) —
    // ~2-3 s each of fixed overhead that measures Structured Streaming's
    // bookkeeping, not operator cost, and at 5 queries dominates noise in
    // the cross-round total (VERDICT r6 item 6). Split it out so the
    // batch total tracks operator work; per-query medians stay untouched.
    // Membership is derived from the name, not a hardcoded set, so a
    // future streaming gate cannot silently land in total_batch and skew
    // the cross-round batch total (ADVICE r7).
    val totalStreaming =
      results.collect { case (n, _, v, _) if v >= 0 && isStreaming(n) => v }.sum
    val totalBatch = total - totalStreaming
    // first-run total: the closest analogue of the r3-r5 single-run
    // methodology (cold cache, first full-plan execution) for
    // cross-round continuity.
    val totalFirst = results.collect { case (_, _, m, r) if m >= 0 => r.head }.sum
    def line(fmt: Double => String, detail: Boolean): String = {
      val qs = results.map { case (k, _, v, _) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      val runsField =
        if (!detail) ""
        else {
          // per-query min-of-reps as a first-class field (VERDICT r9
          // item 1) — derivable from query_runs, but explicit so forensic
          // tooling (bench_guard, the judge's per-query diff) need not
          // re-derive it.
          val mins = results.map { case (k, _, m, r) =>
            "\"" + k + "\":" + fmt(if (m >= 0) r.min else -1.0)
          }.mkString(""""query_min":{""", ",", "},")
          results.map { case (k, _, _, r) =>
            "\"" + k + "\":[" + r.map(fmt).mkString(",") + "]"
          }.mkString(""""query_runs":{""", ",", "},") + mins
        }
      s"""{"metric":"queries","queries":$qs,""" + runsField +
        s""""reps":$reps,$machineContext,"sf":"$sfDir"}"""
    }
    // Per-query seconds go on their OWN line — at 66 queries the combined
    // line outgrew the driver's 2000-char tail capture and the official
    // perf record for r7 lost structure ("parsed": null, VERDICT r7
    // item 1; same failure as r4's full-precision line). The VERY LAST
    // stdout line is the totals-only JSON below, whose length does not
    // grow with the registry (BenchLineSpec proves it fits at 1000
    // queries), so the driver's tail parser always sees one complete
    // object.
    println(line(v => (math.rint(v * 1000) / 1000).toString, detail = false))
    // full-precision detail (incl. per-query run arrays) goes to the
    // sidecar file; stdout stays compact for the driver's tail capture.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      line(_.toString, detail = true) + "\n")
    catch { case _: Throwable => () }
    println(totalsLine(total, totalOld, totalFirst, totalStreaming, totalBatch,
      totalMin, reps, results.size, sfDir))
    graft.util.TempDirs.sweep()
    spark.stop()
  }

  /** A query is a streaming-lifecycle gate iff its registry name says so.
    * Naming contract: every gate that runs a StreamingQuery lifecycle
    * carries "streaming" in its name (q48/q49/q54/q55/q66 today). */
  def isStreaming(name: String): Boolean = name.contains("streaming")

  /** Per-gate IN-JVM streaming residue sweep (r14, the second half of
    * VERDICT r13 wrong #2 — TempDirs.sweep covers only the on-disk
    * half): a drained streaming gate leaves its state-store providers
    * LOADED in the shared bench JVM, and the per-JVM maintenance task
    * then snapshots/cleans every accumulated provider (HDFS-backed and
    * RocksDB alike, RocksDB also pinning native memory) once a minute
    * UNDER all later gates' reps — background work that grows with how
    * many stateful gates already ran, exactly the in-suite interference
    * class the r13 verdict flagged. `StateStore.stop()` unloads the
    * providers and parks the maintenance pool; the next streaming gate
    * restarts both on demand. Reflection because the object is
    * private[sql] — bench tooling only, and a failed sweep must never
    * fail a measurement (stderr-logged once, not swallowed silently).
    */
  private var residueSweepFailed = false
  private def streamingResidueSweep(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.streams.resetTerminated()
    try {
      val cls = Class.forName(
        "org.apache.spark.sql.execution.streaming.state.StateStore$")
      cls.getMethod("stop").invoke(cls.getField("MODULE$").get(null))
      ()
    } catch {
      case e: Throwable if !residueSweepFailed =>
        residueSweepFailed = true
        System.err.println(
          s"[bench] state-store residue sweep unavailable (${e.getClass.getSimpleName}: " +
            s"${e.getMessage}) — in-suite interference from accumulated providers " +
            "will not be cleaned this run")
      case _: Throwable => ()
    }
  }

  /** Machine-context marker embedded in every bench JSON line: the 1-min
    * system load average at measurement time plus the JVM's CPU count.
    * r8 committed a sidecar measured under heavy contention (per-rep
    * swings of 10× on untouched queries) with nothing in the record to
    * show it — a future reader must be able to tell a regression from a
    * busy machine WITHOUT re-running (VERDICT r8 item 3). -1 when the
    * platform exposes no load average.
    */
  private def loadNow: Double =
    try java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    catch { case _: Throwable => -1.0 }

  /** 1-min load at JVM start (object init = first reference from main):
    * `load_avg` at line-emission time is dominated by the bench's OWN
    * work, so PRE-EXISTING contention — the r10 finding that a 17×
    * q65 reading came from tooling sharing the box — is only readable
    * from the load before the bench added its own. Both are recorded.
    */
  private val startLoad: Double = loadNow

  /** Boot identity (r14): two quiet-box sidecars from DIFFERENT boots
    * of the same guest are not comparable — this round's forensics
    * found untouched many-small-jobs gates drifting 1.16–2.2× across a
    * reboot with load_avg_start ≈ 0 on both sides (FANIN "reboot
    * boundary"; r11 saw the same class intra-boot). Recording the boot
    * id makes the drift class mechanically attributable: same boot_id
    * ⇒ a shared-set swing is contention or code; different ⇒ read the
    * r11/r14 host-drift playbook before reading any gate as a
    * regression. "-" where the platform has no boot id.
    */
  private val bootId: String =
    try java.nio.file.Files.readString(
      java.nio.file.Paths.get("/proc/sys/kernel/random/boot_id")).trim.take(8)
    catch { case _: Throwable => "-" }

  def machineContext: String =
    s""""load_avg":${math.rint(loadNow * 100) / 100},""" +
      s""""load_avg_start":${math.rint(startLoad * 100) / 100},""" +
      s""""cpus":${Runtime.getRuntime.availableProcessors},""" +
      s""""boot_id":"$bootId""""

  /** The driver-parseable record: the last stdout line. Totals only — its
    * length is independent of how many queries the registry holds, so it
    * can never again outgrow the driver's 2000-char tail capture the way
    * the per-query line did in r4 and r7. */
  def totalsLine(total: Double, totalOld: Double, totalFirst: Double,
      totalStreaming: Double, totalBatch: Double, totalMin: Double,
      reps: Int, nQueries: Int, sfDir: String): String = {
    def f(v: Double): String = (math.rint(v * 1000) / 1000).toString
    s"""{"metric":"total","value":${f(total)},"unit":"sec","reps":$reps,""" +
      s""""n_queries":$nQueries,"total_count_action":${f(totalOld)},""" +
      s""""total_full_plan":${f(total)},"total_run1":${f(totalFirst)},""" +
      s""""total_min_plan":${f(totalMin)},""" +
      s""""total_streaming_lifecycle":${f(totalStreaming)},""" +
      s""""total_batch":${f(totalBatch)},$machineContext,"sf":"$sfDir"}"""
  }
}
