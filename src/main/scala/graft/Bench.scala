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
    // "value"/"queries" report the new numbers; the old total is kept as
    // "total_count_action" for cross-round continuity. The two totals are
    // NOT independent samples: the full-plan run follows the count() run
    // of the same query in the same JVM, so it inherits its JIT and page
    // cache (ADVICE r3) — compare either total across rounds, not the
    // two against each other.
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        val old = time(fn(spark, sfDir).count())
        val full = time(fn(spark, sfDir).queryExecution.toRdd.count())
        (name, old, full)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          (name, -1.0, -1.0)
      }
    }
    val totalOld = results.collect { case (_, v, _) if v >= 0 => v }.sum
    val total = results.collect { case (_, _, v) if v >= 0 => v }.sum
    def line(fmt: Double => String): String = {
      val qs = results.map { case (k, _, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""total_count_action":$totalOld,"total_full_plan":$total,"sf":"$sfDir"}"""
    }
    // stdout gets ONE COMPACT line (per-query seconds at ms precision) as
    // the very last output — r4's full-precision line outgrew the
    // driver's tail capture and the official record lost structure
    // ("parsed": null, VERDICT r4 item 7); totals keep full precision.
    println(line(v => (math.rint(v * 1000) / 1000).toString))
    // full-precision detail goes to the sidecar file.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line(_.toString) + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
