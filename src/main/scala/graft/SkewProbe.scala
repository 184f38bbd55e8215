package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hot-key measurement for the WINDOW/AS-OF family (VERDICT r5 item 8;
  * FANIN.md covers the pairwise operators): generates an events corpus
  * with one user holding ~10% of all events (the hot-account shape real
  * clickstreams have) plus a uniform control, and measures:
  *
  *   - q12's sessionize as a plain per-user window (the hot user's whole
  *     history serializes into one task),
  *   - `Skew.sessionizeBucketed` (heavy window keyed by (user,
  *     time-bucket) + tiny boundary-merge window) on the same corpus,
  *   - q22's as-of join shape (union + per-user window),
  *   - q30's BucketedWindow under key-density skew (10% of keys in a
  *     1%-wide range), at two bucket widths.
  *
  * Everything is generated inside Spark from hash expressions
  * (deterministic, driver-free). Results recorded in FANIN.md.
  */
object SkewProbe {

  /** Events with a hot user: ~`hotShare` of rows get user 0, the rest
    * spread over `users` users; timestamps spread over 30 days.
    */
  def genEvents(spark: SparkSession, n: Long, users: Long, hotShare: Int): DataFrame = {
    import spark.implicits._
    spark.range(n).select(
      $"id".as("event_id"),
      when(pmod(xxhash64($"id", lit("hot")), lit(100)) < hotShare, lit(0L))
        .otherwise(pmod(xxhash64($"id", lit("u")), lit(users)) + 1).as("user_id"),
      timestamp_seconds(lit(1700000000L) +
        pmod(xxhash64($"id", lit("t")), lit(30L * 86400))).as("ts"),
      when(pmod(xxhash64($"id", lit("k")), lit(10)) === 0, "error")
        .otherwise("click").as("event_type"),
      (pmod(xxhash64($"id", lit("v")), lit(1000)) / lit(10.0)).as("value"))
  }

  /** Orders-like keyed rows with key-density skew: `hotShare`% of rows
    * in a range 1% wide (their RANGE-frame bucket is hot), rest uniform.
    */
  def genKeyed(spark: SparkSession, n: Long, hotShare: Int): DataFrame = {
    import spark.implicits._
    spark.range(n).select(
      when(pmod(xxhash64($"id", lit("h")), lit(100)) < hotShare,
        pmod(xxhash64($"id", lit("k1")), lit(n / 100)))
        .otherwise(pmod(xxhash64($"id", lit("k2")), lit(n * 10)) + n / 100)
        .as("k"),
      (pmod(xxhash64($"id", lit("v")), lit(10000)) / lit(100.0)).as("v"))
  }

  private def time(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val rows = f
    println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1f s, $rows%,d rows")
  }

  /** [[time]] plus the LONGEST single task the action ran — the number
    * that exposes stratum serialization: a skew-safe plan's wall and
    * max-task track each other; a one-task-per-hot-key plan shows a
    * max task approaching the whole wall (r13, the per-source window
    * family). Listener delivery is async — a short drain sleep keeps
    * this a probe-tolerance reading, like FanIn's task-metric probes.
    */
  private def timeMaxTask(spark: SparkSession, name: String)(f: => Long): Unit = {
    val maxMs = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val d = t.taskInfo.duration
        maxMs.getAndUpdate(m => math.max(m, d)); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try time(name)(f)
    finally {
      Thread.sleep(500)
      spark.sparkContext.removeSparkListener(listener)
    }
    println(f"$name: max task ${maxMs.get / 1000.0}%.1f s")
  }

  private def sessionizeGlobal(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev.withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("nw", when(col("prev").isNull ||
        unix_timestamp(col("ts")) - unix_timestamp(col("prev")) > 1800, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("nw")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("prev", "nw")
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    import spark.implicits._
    val n = sys.env.getOrElse("SKEW_EVENTS", "10000000").toLong
    val outDir = graft.util.TempDirs.scratch("skewprobe")
    println(s"# $n events, hot user = 10%, dir $outDir")

    genEvents(spark, n, users = 100000L, hotShare = 10)
      .write.mode("overwrite").parquet(s"$outDir/hot.parquet")
    genEvents(spark, n, users = 100000L, hotShare = 0)
      .write.mode("overwrite").parquet(s"$outDir/uniform.parquet")
    val hot = spark.read.parquet(s"$outDir/hot.parquet")
    val uniform = spark.read.parquet(s"$outDir/uniform.parquet")

    // ---- q12 shape: per-user sessionize window ----
    time("sessionize global window, uniform") {
      sessionizeGlobal(uniform).queryExecution.toRdd.count()
    }
    time("sessionize global window, hot user") {
      sessionizeGlobal(hot).queryExecution.toRdd.count()
    }
    time("Skew.sessionizeBucketed(span=1800), hot user") {
      graft.functions.Skew.sessionizeBucketed(
        hot, "user_id", "ts", "event_id", gapSec = 1800, bucketSpanSec = 1800)
        .queryExecution.toRdd.count()
    }
    // equality of the two numberings on the hot corpus (spot assertion,
    // the exhaustive fixture check lives in FunctionsSpec)
    val a = sessionizeGlobal(hot).groupBy($"user_id")
      .agg(max($"session_id").as("s")).agg(sum($"s")).head.getLong(0)
    val b = graft.functions.Skew.sessionizeBucketed(
      hot, "user_id", "ts", "event_id", 1800, 1800)
      .groupBy($"user_id").agg(max($"session_id").as("s")).agg(sum($"s")).head.getLong(0)
    assert(a == b, s"bucketed sessionize diverged: $a vs $b total sessions")
    println(f"session totals match: $a%,d sessions both paths")

    // ---- q22 shape: as-of join (union + per-user window) ----
    def asof(ev: DataFrame): Long = {
      val errors = ev.filter($"event_type" === "error")
        .select($"user_id", $"event_id", $"ts")
      val clicks = ev.filter($"event_type" === "click")
        .groupBy($"user_id", $"ts").agg(max($"value").as("click_value"))
      graft.operators.AsOfJoin.backward(errors, clicks,
        tsCol = "ts", keys = Seq("user_id"), valueCols = Seq("click_value"))
        .queryExecution.toRdd.count()
    }
    time("as-of join, uniform")(asof(uniform))
    time("as-of join, hot user")(asof(hot))

    // ---- q30 shape: RANGE window under key-density skew ----
    genKeyed(spark, n / 10, hotShare = 10)
      .write.mode("overwrite").parquet(s"$outDir/keyed.parquet")
    val keyed = spark.read.parquet(s"$outDir/keyed.parquet")
    Seq(8192L, 65536L).foreach { width =>
      time(s"BucketedWindow rangePreceding(1000), dense keys, width=$width") {
        graft.operators.BucketedWindow.rangePreceding(
          keyed, orderCol = "k", preceding = 1000L, bucketWidth = width)(
          Seq("mv" -> (w => avg(col("v")).over(w))))
          .queryExecution.toRdd.count()
      }
    }

    // ---- q60/q61/q82 shape: per-source windows on a Zipf corpus ----
    // (r13, VERDICT wrong #1) One source holds 80% of the corpus — the
    // realistic crawl-dominated 100 TB stratum mix. The naive
    // PARTITION BY source rank/prefix windows sort the hot stratum in
    // ONE task; TopK.perKey / PrefixSum.perKey spread it over
    // salts/buckets tasks. Equality of results is asserted (aggregate
    // fingerprint here; row-for-row in SkewSafeWindowsSpec).
    val zn = sys.env.getOrElse("ZIPF_DOCS", n.toString).toLong
    spark.range(zn).select(
      $"id".as("doc_id"),
      when(pmod(xxhash64($"id", lit("zs")), lit(100)) < 80, lit("hot"))
        .otherwise(concat(lit("s"), pmod(xxhash64($"id", lit("zt")), lit(1000))))
        .as("source"),
      (pmod(xxhash64($"id", lit("zq")), lit(100000)) / lit(1000.0)).as("q"),
      (pmod(xxhash64($"id", lit("zv")), lit(900)) + 100).as("toks"))
      .write.mode("overwrite").parquet(s"$outDir/zipf.parquet")
    val zipf = spark.read.parquet(s"$outDir/zipf.parquet")
    println(s"# zipf corpus: $zn docs, hot source = 80%")

    import org.apache.spark.sql.expressions.Window
    val rankOrder = Seq($"q".desc, $"doc_id")
    timeMaxTask(spark, "top-5 per source, naive rank window, zipf") {
      zipf.withColumn("rnk", row_number().over(
        Window.partitionBy($"source").orderBy(rankOrder: _*)).cast("long"))
        .filter($"rnk" <= 5).queryExecution.toRdd.count()
    }
    timeMaxTask(spark, "top-5 per source, TopK.perKey(salts=32), zipf") {
      graft.operators.TopK.perKey(zipf, Seq("source"), rankOrder,
        k = 5, rankName = "rnk", saltExpr = xxhash64($"doc_id"), salts = 32)
        .queryExecution.toRdd.count()
    }
    val tk1 = zipf.withColumn("rnk", row_number().over(
      Window.partitionBy($"source").orderBy(rankOrder: _*)).cast("long"))
      .filter($"rnk" <= 5).agg(expr("bit_xor(xxhash64(doc_id, rnk))")).head.getLong(0)
    val tk2 = graft.operators.TopK.perKey(zipf, Seq("source"), rankOrder,
      5, "rnk", xxhash64($"doc_id"), 32)
      .agg(expr("bit_xor(xxhash64(doc_id, rnk))")).head.getLong(0)
    assert(tk1 == tk2, s"top-k fingerprints diverged: $tk1 vs $tk2")
    println("top-k fingerprints match both paths")

    timeMaxTask(spark, "prefix sum per source, naive unbounded window, zipf") {
      zipf.withColumn("cum", sum($"toks").over(
        Window.partitionBy($"source").orderBy(rankOrder: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .queryExecution.toRdd.count()
    }
    timeMaxTask(spark, "prefix sum per source, PrefixSum.perKey(buckets=64), zipf") {
      val st = graft.operators.PrefixSum.perKeyWithRelease(zipf, Seq("source"),
        rankOrder, orderHead = $"q", descending = true, value = $"toks",
        cumName = "cum", numBuckets = 64)
      try st.frame.queryExecution.toRdd.count() finally st.release()
    }
    val ps1 = zipf.withColumn("cum", sum($"toks").over(
      Window.partitionBy($"source").orderBy(rankOrder: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .agg(expr("bit_xor(xxhash64(doc_id, cum))")).head.getLong(0)
    val st2 = graft.operators.PrefixSum.perKeyWithRelease(zipf, Seq("source"),
      rankOrder, orderHead = $"q", descending = true, value = $"toks",
      cumName = "cum", numBuckets = 64)
    val ps2 = try st2.frame.agg(expr("bit_xor(xxhash64(doc_id, cum))")).head.getLong(0)
      finally st2.release()
    assert(ps1 == ps2, s"prefix-sum fingerprints diverged: $ps1 vs $ps2")
    println("prefix-sum fingerprints match both paths")

    spark.stop()
  }
}
