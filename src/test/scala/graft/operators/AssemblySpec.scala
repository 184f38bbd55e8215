package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSupport

/** The shard-shuffle assembly stage (r13 round tail): placement must be
  * a pure function of the data — the driver-side md5 reference
  * recomputes every pack's shard and within-shard position
  * independently of Spark, so any dependence on partitioning, task
  * order or `rand()` shows up as a mismatch. The write action's claims
  * (one directory per shard, per-file rows in shuffled order) are
  * pinned here too; q113/q115 own the DuckDB-side value parity.
  */
class AssemblySpec extends AnyFunSuite with SparkSupport {

  /** Driver-side reference of TextFunctions.hash32: first 8 hex chars
    * of md5 as a long. */
  private def refHash32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
  }

  /** Synthetic packed frame: skewed sources (one holds most packs),
    * several docs per pack — the tokenPack output shape. */
  private def packed(seed: Int, n: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val source = if (rnd.nextInt(10) < 8) "hot" else s"s${rnd.nextInt(5)}"
      (i.toLong, source, (rnd.nextInt(900) + 100).toLong, rnd.nextInt(40).toLong)
    }.toDF("doc_id", "source", "n_tokens", "pack_id")
  }

  test("shardShuffle matches the driver-side md5 reference placement exactly") {
    val in = packed(seed = 7, n = 500)
    val out = Assembly.shardShuffle(in, nShards = 8).collect()

    // reference: every distinct pack's hash → shard; rank by (h, source, pack_id)
    val packs = in.select("source", "pack_id").distinct()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val placedRef = packs.toSeq
      .map { case (s, p) => (s, p, refHash32(s"$s:$p")) }
      .groupBy { case (_, _, h) => h % 8 }
      .toSeq
      .flatMap { case (shard, grp) =>
        grp.sortBy { case (s, p, h) => (h, s, p) }.zipWithIndex.map {
          case ((s, p, _), pos) => (s, p) -> ((shard, pos.toLong))
        }
      }.toMap

    assert(out.nonEmpty)
    out.foreach { r =>
      val key = (r.getAs[String]("source"), r.getAs[Long]("pack_id"))
      assert((r.getAs[Long]("shard"), r.getAs[Long]("shard_pos")) == placedRef(key),
        s"pack $key placed off-reference")
    }
    // rerun-stable (no rand(), no partitioning dependence)
    val again = Assembly.shardShuffle(in.repartition(13), nShards = 8)
      .collect().map(_.toSeq).toSet
    assert(again == out.map(_.toSeq).toSet)
  }

  test("shard_pos is dense per shard and all docs of a pack share a placement") {
    val out = Assembly.shardShuffle(packed(seed = 11, n = 800), nShards = 4)
    out.cache()
    try {
      // one placement per pack
      val perPack = out.groupBy("source", "pack_id")
        .agg(countDistinct(struct(col("shard"), col("shard_pos"))).as("n"))
        .agg(max("n")).collect()(0).getLong(0)
      assert(perPack == 1L)
      // dense positions 0..n-1 over distinct packs within each shard
      val dense = out.select("shard", "shard_pos").distinct()
        .groupBy("shard")
        .agg(count(lit(1)).as("n"), min("shard_pos").as("lo"), max("shard_pos").as("hi"))
        .collect()
      assert(dense.nonEmpty)
      dense.foreach { r =>
        assert(r.getAs[Long]("lo") == 0L && r.getAs[Long]("hi") == r.getAs[Long]("n") - 1,
          s"shard ${r.get(0)} positions are not dense")
      }
    } finally { out.unpersist(); () }
  }

  test("writeShards: one directory per shard, file rows already in shuffled order") {
    val sharded = Assembly.shardShuffle(packed(seed = 3, n = 400), nShards = 4)
    val dir = tmpDir("graft-shards")
    Assembly.writeShards(sharded, dir)

    val root = new java.io.File(dir)
    val shardDirs = root.listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard=")).sorted
    val expectShards = sharded.select("shard").distinct()
      .collect().map(r => s"shard=${r.getLong(0)}").sorted
    assert(shardDirs.toSeq == expectShards.toSeq)

    shardDirs.foreach { sd =>
      // within one shard directory: parquet preserves within-file order,
      // so reading its (single hash-partitioned) file back yields rows
      // already sorted by (shard_pos, doc_id) — the trainer's read order
      val rows = spark.read.parquet(s"$dir/$sd")
        .select("shard_pos", "doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.sameElements(rows.sorted), s"$sd rows not in shuffled order")
    }
    // nothing lost or duplicated across the layout (the partition-dir
    // column reads back as its inferred type — cast to compare)
    val back = spark.read.parquet(dir)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("pack_id"),
        col("shard").cast("long").as("shard"), col("shard_pos"))
      .collect().map(_.toSeq)
    val want = sharded
      .select("doc_id", "source", "n_tokens", "pack_id", "shard", "shard_pos")
      .collect().map(_.toSeq)
    assert(back.sorted(Ordering.by((s: Seq[Any]) => s.mkString("|"))).toSeq ==
      want.sorted(Ordering.by((s: Seq[Any]) => s.mkString("|"))).toSeq)
  }
}
