package graft

import org.apache.spark.sql.functions._

import graft.catalog.Warehouse

/** Phase-timed q53 (`Warehouse.upsert`) probe — pinning the one
  * quiet-box swing left open by r11 (q53 read 0.74 s on the committed
  * sidecar but 1.5–2.6 s on two other same-code runs, VERDICT wrong
  * #3): which phase of the gate carries the variance, and is it
  * I/O-state (page cache, ext4 allocation) rather than plan shape?
  *
  * The gate's body decomposes into four phases per rep, each a fresh
  * scratch warehouse (exactly the gate's lifecycle):
  *
  *   1. append  — write the initial even-key table (parquet create),
  *   2. check   — the batch duplicate-key guard (one groupBy job),
  *   3. upsert  — read-back + broadcast anti-join + union + the
  *                crash-safe swap rewrite (read + full-table write),
  *   4. read    — final readback count.
  *
  * A `UPSERT_PROBE_COLD=1` run additionally syncs and drops the kernel
  * page cache before phases 3 and 4 of each rep (root-only;
  * /proc/sys/vm/drop_caches), making the cold-I/O contribution
  * measurable directly instead of inferred from box drift. Findings are
  * recorded in FANIN.md ("q53 upsert variance").
  */
object UpsertProbe {

  private def dropCaches(): Boolean =
    try {
      new ProcessBuilder("sync").start().waitFor()
      val p = java.nio.file.Paths.get("/proc/sys/vm/drop_caches")
      java.nio.file.Files.writeString(p, "3\n")
      true
    } catch { case _: Throwable => false }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    import spark.implicits._
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cold = sys.env.get("UPSERT_PROBE_COLD").contains("1")
    // fail up front rather than printing warm numbers labeled cold=true
    // (r12 review: dropCaches needs root; a silent false would mislabel
    // the exact measurement the probe exists to pin)
    require(!cold || dropCaches(),
      "UPSERT_PROBE_COLD=1 requires root (writes /proc/sys/vm/drop_caches)")
    val reps = sys.env.getOrElse("UPSERT_PROBE_REPS", "5").toInt

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    println(s"# q53 upsert phase probe: $sfDir, $reps reps, cold=$cold")
    println("| rep | append_s | check_s | upsert_s | read_s | total_s |")
    println("|---|---|---|---|---|---|")
    (1 to reps).foreach { rep =>
      val wh = new Warehouse(graft.util.TempDirs.scratch(s"upsert-probe-$rep"))
      val orders = spark.read.parquet(s"$sfDir/orders.parquet")
        .select($"o_orderkey", $"o_orderstatus",
          $"o_totalprice".cast("decimal(12,2)").as("price"))
      val (_, tAppend) = timed(wh.append(orders.filter($"o_orderkey" % 2 === 0), "tgt"))
      val batch = orders.filter($"o_orderkey" <= 1000)
        .withColumn("price", ($"price" * 2).cast("decimal(12,2)"))
      // phase 2 in isolation (upsert runs it again; keysKnownUnique
      // skips it there so the split is clean)
      val (_, tCheck) = timed {
        batch.groupBy($"o_orderkey").count().filter($"count" > 1).limit(1).count()
      }
      if (cold) dropCaches()
      val (_, tUpsert) = timed(
        wh.upsert(spark, "tgt", batch, Seq("o_orderkey"), keysKnownUnique = true))
      if (cold) dropCaches()
      val ((rows), tRead) = timed(wh.read(spark, "tgt").count())
      println(f"| $rep | $tAppend%.2f | $tCheck%.2f | $tUpsert%.2f | $tRead%.2f " +
        f"| ${tAppend + tCheck + tUpsert + tRead}%.2f |  ($rows%,d rows)")
    }
    spark.stop()
  }
}
