package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSupport

/** Exact bucket-graph connected components — the cases q88's oracle gate
  * can't isolate: chain graphs deeper than a fixed round count, the
  * convergence guard, and multi-column bucket keys.
  */
class ConnectedComponentsSpec extends AnyFunSuite with SparkSupport {

  test("chain deeper than two hops converges to the true component minimum") {
    import spark.implicits._
    // 1-[A]-2-[B]-3-[C]-4-[D]-5: a 4-hop chain (q43's fixed two rounds
    // would leave nodes 4 and 5 mislabeled), plus an isolated pair and
    // a singleton bucket
    val m = Seq(
      (1L, "A"), (2L, "A"), (2L, "B"), (3L, "B"), (3L, "C"), (4L, "C"),
      (4L, "D"), (5L, "D"),
      (8L, "X"), (9L, "X"),
      (7L, "S")).toDF("n", "bucket")
    val got = ConnectedComponents.viaBuckets(m, "n", Seq("bucket"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      8L -> 8L, 9L -> 8L, 7L -> 7L))
  }

  test("maxIters below the chain diameter throws instead of returning a partial clustering") {
    import spark.implicits._
    val m = Seq((1L, "A"), (2L, "A"), (2L, "B"), (3L, "B"), (3L, "C"),
      (4L, "C"), (4L, "D"), (5L, "D")).toDF("n", "bucket")
    val e = intercept[IllegalStateException] {
      ConnectedComponents.viaBuckets(m, "n", Seq("bucket"), maxIters = 2).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("multi-column bucket keys and duplicate memberships") {
    import spark.implicits._
    // duplicate membership rows must not affect the result; the bucket
    // key is (b, key) like an LSH band frame
    val m = Seq(
      (10L, 0, "k1"), (11L, 0, "k1"), (11L, 0, "k1"),
      (11L, 1, "k1"), (12L, 1, "k1"),
      (20L, 0, "k2")).toDF("n", "b", "key")
    val got = ConnectedComponents.viaBuckets(m, "n", Seq("b", "key"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L))
  }

  test("random bipartite graphs match a union-find reference at three densities") {
    import spark.implicits._
    // the fixtures above pin specific shapes; this pins the operator's
    // CLAIM — min reachable node id through shared buckets — on graphs
    // with no designed structure. Reference = driver-side union-find
    // over the same memberships (path-compressed, union by id so the
    // root IS the min), seeded so the case is reproducible.
    val rnd = new scala.util.Random(42)
    for ((nNodes, nBuckets, nMemb) <- Seq((40, 60, 45), (40, 12, 80), (30, 5, 120))) {
      val memb = Seq.fill(nMemb)((rnd.nextInt(nNodes).toLong, rnd.nextInt(nBuckets)))
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      def union(a: Long, b: Long): Unit = {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      memb.groupBy(_._2).values.foreach { rows =>
        val ns = rows.map(_._1)
        ns.tail.foreach(union(ns.head, _))
      }
      val expected = memb.map(_._1).distinct.map(n => n -> find(n)).toMap
      val got = ConnectedComponents.viaBuckets(
        memb.toDF("n", "bucket"), "n", Seq("bucket"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected,
        s"random graph (nodes=$nNodes buckets=$nBuckets memb=$nMemb) diverged from union-find")
    }
  }

  test("converged input costs exactly one verification round") {
    import spark.implicits._
    // singleton buckets: labels never move, the loop must stop after
    // the first no-movement round (convergence detection, not maxIters)
    val m = Seq((1L, "A"), (2L, "B")).toDF("n", "bucket")
    val got = ConnectedComponents.viaBuckets(m, "n", Seq("bucket"), maxIters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L))
  }
}
