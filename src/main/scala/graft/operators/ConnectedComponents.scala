package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact connected components over a node–BUCKET bipartite frame, by
  * min-label propagation iterated to convergence — the scalable form of
  * the alternating large-star/small-star recipe (public: Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SOCC'14) specialized
  * to bucket-induced graphs (LSH bands, shared shingles, co-occurrence
  * keys), where it is strictly cheaper: the doc–doc edge list of a
  * bucket with m members is m², but the bucket FRAME is m rows, and each
  * propagation round is one groupBy(bucket) + one groupBy(node) — edges
  * never materialize, so a hot bucket costs its membership, not its
  * square.
  *
  * Per round: bucketMin(bucket) = min label over members (shuffle on the
  * bucket key); label(node) = min(label, min over the node's buckets of
  * bucketMin) (shuffle on node). One round moves every label at least
  * one bucket-hop toward the component minimum, so rounds needed =
  * bipartite diameter of the largest component — small for LSH collision
  * graphs (near-clique inside a duplicate cluster; q43's fixed two
  * rounds exploit exactly that), unbounded for chain-shaped graphs,
  * which is why this operator detects convergence instead of fixing the
  * round count. Each round's labels are eagerly localCheckpoint'ed: the
  * lineage is cut (no exponential re-execution across iterations) and
  * the convergence count rides the same materialization. At 100 TB the
  * checkpoint is a per-round table and the loop is a driver while —
  * identical shape.
  *
  * Convergence is REQUIRED: if `maxIters` rounds still move labels the
  * operator throws rather than returning a silently-partial clustering
  * (the failure mode a fixed-round propagation bakes in).
  */
object ConnectedComponents {

  /** (node, component) for every distinct node in `memberships`, where
    * component = min node id reachable through shared buckets.
    *
    * @param memberships one row per (node, bucket) membership; node ids
    *                    must be orderable (component = MIN over the
    *                    component's node ids — deterministic canonical
    *                    representative)
    * @param nodeCol     node id column name
    * @param bucketCols  bucket key column(s)
    * @param maxIters    convergence bound; exceeded → IllegalStateException
    */
  def viaBuckets(memberships: DataFrame, nodeCol: String,
      bucketCols: Seq[String], maxIters: Int = 50): DataFrame = {
    require(bucketCols.nonEmpty, "bucketCols must be non-empty")
    require(maxIters >= 1, s"maxIters must be >= 1, got $maxIters")
    val bCols = bucketCols.map(col)
    val m = memberships
      .select(col(nodeCol).as("n") +: bCols: _*)
      .distinct()
      .persist()
    try {
      var labels = m.select(col("n")).distinct()
        .withColumn("lbl", col("n"))
        .localCheckpoint(true)
      var round = 0
      var moved = 1L
      while (moved > 0) {
        round += 1
        if (round > maxIters)
          throw new IllegalStateException(
            s"connected components did not converge in $maxIters rounds — " +
              "component diameter exceeds the bound; raise maxIters")
        val bucketMin = m.join(labels, "n")
          .groupBy(bCols: _*).agg(min(col("lbl")).as("bm"))
        val stepped = m.join(bucketMin, bucketCols)
          .groupBy(col("n")).agg(min(col("bm")).as("cand"))
          .join(labels, "n")
          .select(col("n"), col("lbl"), least(col("cand"), col("lbl")).as("nxt"))
          .localCheckpoint(true)
        moved = stepped.filter(col("nxt") < col("lbl")).count()
        labels = stepped.select(col("n"), col("nxt").as("lbl"))
      }
      labels.select(col("n").as(nodeCol), col("lbl").as("component"))
    } finally {
      m.unpersist()
      ()
    }
  }
}
