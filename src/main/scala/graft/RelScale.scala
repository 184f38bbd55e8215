package graft

import org.apache.spark.sql.functions._

/** Relational 10× scaling probe (VERDICT r3 item 7): deterministically
  * inflates the sf0.1 FACT tables — lineitem, orders (key-shifted
  * order-key replicas, so the orders↔lineitem join keeps its exact
  * semantics and both sides scale together) and events (user-shifted
  * replicas, so the per-user session shape is preserved while the user
  * count scales) — then times the headline relational queries at 1× and
  * at the inflated scale with the unprunable full-plan action,
  * printing per-query scaling factors for FANIN.md. Dimensions stay at
  * 1× (10× orders per customer), matching how a real corpus grows.
  *
  * A near-linear factor (≈ the multiplier) means the plan's cost is in
  * its scans/shuffles, not in any fixed-size assumption that only fits
  * sf0.1; a super-linear factor flags a shape that would not survive
  * the next 100×.
  */
object RelScale {

  private val Queries = Seq(
    "q01_pricing_summary", "q05_revenue_by_region",
    "q12_sessionize", "q36_timeslice_e2e")

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val mult = sys.env.getOrElse("REL_MULT", "10").toInt
    val src = sys.env.getOrElse("REL_SF_DIR", "/root/testdata/sf0.1")
    val out = graft.util.TempDirs.scratch("relscale")
    println(s"# relational x$mult corpus from $src -> $out")

    def inflate(table: String, keyCols: Seq[String]): Unit = {
      val df = spark.read.parquet(s"$src/$table.parquet")
      val inflated = df.withColumn("__rep", explode(sequence(lit(0L), lit(mult.toLong - 1))))
      val shifted = keyCols.foldLeft(inflated)((d, k) =>
        d.withColumn(k, col(k) * mult + col("__rep"))).drop("__rep")
      shifted.write.mode("overwrite").parquet(s"$out/$table.parquet")
    }
    Tables.allNames.foreach {
      case "lineitem" => inflate("lineitem", Seq("l_orderkey"))
      case "orders"   => inflate("orders", Seq("o_orderkey"))
      case "events"   => inflate("events", Seq("user_id"))
      case other =>
        spark.read.parquet(s"$src/$other.parquet")
          .write.mode("overwrite").parquet(s"$out/$other.parquet")
    }
    val liRows = spark.read.parquet(s"$out/lineitem.parquet").count()
    println(f"# inflated lineitem rows: $liRows%,d")

    // JIT warmup per plan family (same rationale and dir derivation as
    // Bench: sibling sf0.001 when the layout has one, else the measured
    // dir itself — a hardcoded path would silently warm nothing on other
    // layouts and every 1x number would carry the JIT cost)
    val warmDir = {
      val sibling = new java.io.File(new java.io.File(src).getParentFile, "sf0.001")
      if (sibling.isDirectory) sibling.toString else src
    }
    Queries.foreach { q =>
      try queries.Registry.byName(q).run(spark, warmDir)
        .queryExecution.toRdd.count()
      catch { case e: Throwable => System.err.println(s"warmup $q: ${e.getMessage}") }
    }

    def time(q: String, dir: String): Double = {
      val t0 = System.nanoTime()
      queries.Registry.byName(q).run(spark, dir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    println(s"| query | t(1x) | t(${mult}x) | factor |")
    println("|---|---|---|---|")
    Queries.foreach { q =>
      val t1 = time(q, src)
      val tN = time(q, out)
      println(f"| $q | $t1%.2f s | $tN%.2f s | ${tN / t1}%.1f |")
    }
    spark.stop()
  }

  // Tables.all is in graft.catalog; alias locally to keep the match simple
  private object Tables { val allNames: Seq[String] = graft.catalog.Tables.all }
}
