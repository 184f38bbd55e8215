package graft.catalog

import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSupport

/** Bucketing — the co-located-join tool from the 100 TB brief: two
  * fact tables bucketed on the join key join WITHOUT any shuffle
  * exchange (each bucket pair is node-local). The brief's partitioning
  * ladder is broadcast (small dims, q05) → bucketing (repeated
  * fact-fact joins, here) → salting (hot keys, q27).
  */
class BucketingSpec extends AnyFunSuite with SparkSupport {

  test("bucketed fact-fact join plans without a shuffle exchange") {
    val sf = "/root/testdata/sf0.001"
    // managed tables land in ./spark-warehouse (gitignored); the
    // warehouse dir is a static conf, so no per-test override. Clear
    // both catalog entries and any orphaned locations from prior runs.
    Seq("orders_b", "lineitem_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(); ()
        }
        rm(loc)
      }
    }

    spark.read.parquet(s"$sf/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .format("parquet").saveAsTable("orders_b")
    spark.read.parquet(s"$sf/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .format("parquet").saveAsTable("lineitem_b")

    // disable broadcast so the sf0.001 tables exercise the bucketed SMJ
    // (at fact scale both sides are far over any broadcast threshold)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (plan, joined) = try {
      val j = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          spark.table("lineitem_b")("l_orderkey") === spark.table("orders_b")("o_orderkey"))
        .groupBy("o_orderstatus").count()
      j.collect()
      (j.queryExecution.executedPlan.toString(), j)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)

    // the join itself must not re-shuffle either bucketed side: no
    // Exchange below the SortMergeJoin (the aggregation above it may
    // still exchange on its own key)
    val joinSection = plan.split("SortMergeJoin").last
    assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey") &&
      !joinSection.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join must not shuffle its inputs:\n$joinSection")

    // correctness: equals the unbucketed join
    val expected = spark.read.parquet(s"$sf/lineitem.parquet")
      .join(spark.read.parquet(s"$sf/orders.parquet"),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      .groupBy("o_orderstatus").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == expected)
  }
}
