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
    * @param onRound     observer called after each round with (round,
    *                    labels moved) — free instrumentation for the
    *                    rounds-vs-diameter probe (FANIN.md) and for a
    *                    production run's progress logging; the default
    *                    does nothing
    */
  def viaBuckets(memberships: DataFrame, nodeCol: String,
      bucketCols: Seq[String], maxIters: Int = 50,
      onRound: (Int, Long) => Unit = (_, _) => ()): DataFrame =
    propagate(memberships, nodeCol, bucketCols, maxIters, onRound).getOrElse(
      throw new IllegalStateException(
        s"connected components did not converge in $maxIters rounds — " +
          "component diameter exceeds the bound; raise maxIters (or use " +
          "viaStars/auto: star contraction converges in O(log n) rounds)"))

  /** The propagation loop shared by [[viaBuckets]] (throws at the
    * bound) and [[auto]] (dispatches at the bound): Some(labels) on
    * convergence within `maxRounds`, None if labels still moved.
    */
  private def propagate(memberships: DataFrame, nodeCol: String,
      bucketCols: Seq[String], maxRounds: Int,
      onRound: (Int, Long) => Unit): Option[DataFrame] = {
    require(bucketCols.nonEmpty, "bucketCols must be non-empty")
    require(maxRounds >= 1, s"maxIters must be >= 1, got $maxRounds")
    val spark = memberships.sparkSession
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
        if (round > maxRounds) return None
        val bucketMin = m.join(labels, "n")
          .groupBy(bCols: _*).agg(min(col("lbl")).as("bm"))
        // `__moved` rides the round's plan (codegen'd, type-agnostic on
        // the node id) so the convergence count can be FUSED into the
        // lineage cut: one action materializes the localCheckpoint AND
        // folds the accumulator (r16, VERDICT r15 next #7 — previously
        // checkpoint + count were two jobs per round). Accumulator
        // semantics under task retry are at-least-once, which is SOUND
        // here: a retry can only re-add rows that truly moved, so
        // `moved == 0` still means exactly "converged" (the reported
        // VALUE may over-count under retries — onRound telemetry only).
        val stepped = m.join(bucketMin, bucketCols)
          .groupBy(col("n")).agg(min(col("bm")).as("cand"))
          .join(labels, "n")
          .select(col("n"), least(col("cand"), col("lbl")).as("nxt"),
            when(col("cand") < col("lbl"), 1L).otherwise(0L).as("__moved"))
        val acc = spark.sparkContext.longAccumulator(s"cc-propagate-moved-r$round")
        val schema = stepped.schema
        val movedIdx = schema.fieldIndex("__moved")
        val rdd = stepped.queryExecution.toRdd.mapPartitions(_.map { r =>
          acc.add(r.getLong(movedIdx))
          r.copy() // unsafe-row buffer reuse: copy before the checkpoint stores it
        })
        rdd.localCheckpoint()
        rdd.count() // ONE job: checkpoint materialization + accumulator fold
        moved = acc.value
        onRound(round, moved)
        labels = org.apache.spark.sql.graftshim.FrameBridge
          .ofInternal(spark, rdd, schema)
          .select(col("n"), col("nxt").as("lbl"))
      }
      Some(labels.select(col("n").as(nodeCol), col("lbl").as("component")))
    } finally {
      m.unpersist()
      ()
    }
  }

  /** Algorithm dispatch from ROUND-1..k movement statistics (r13,
    * VERDICT stretch #7) instead of caller choice: probe with min-label
    * propagation — the measured winner on near-clique LSH collision
    * graphs (2–3 rounds, no symmetrize, FANIN.md crossover table) —
    * and if labels still move after `probeRounds`, the component
    * diameter is propagation-hostile (each round advances one
    * bucket-hop), so restart as [[viaStars]], whose alternation halves
    * remaining depth per round. The probe pays ≤ `probeRounds` cheap
    * rounds on the losing side of the dispatch — bounded, and small
    * against the 65-vs-7-round gap it avoids (FANIN.md chain probe);
    * on the winning side it IS the computation.
    *
    * `onDispatch` observes the decision ("propagation" after
    * convergence in the probe, or "stars" with the restart) — the
    * ConnectedComponentsSpec pin and a production run's logging hook.
    */
  def auto(memberships: DataFrame, nodeCol: String, bucketCols: Seq[String],
      probeRounds: Int = 4, maxIters: Int = 40,
      onRound: (Int, Long) => Unit = (_, _) => (),
      onDispatch: String => Unit = _ => ()): DataFrame = {
    require(probeRounds >= 1 && probeRounds <= maxIters,
      s"probeRounds must be in [1, maxIters], got $probeRounds")
    propagate(memberships, nodeCol, bucketCols, probeRounds, onRound) match {
      case Some(labels) => onDispatch("propagation"); labels
      case None =>
        onDispatch("stars")
        viaStars(memberships, nodeCol, bucketCols, maxIters, onRound)
    }
  }

  /** Exact connected components in O(log n) ROUNDS — the alternating
    * large-star/small-star contraction (public: Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SOCC'14, Alg. 2),
    * the scale path [[viaBuckets]]'s own convergence analysis prescribes
    * for graphs whose diameter defeats per-hop propagation: the FANIN.md
    * chain probe measures 65 rounds at diameter 64 for min-label
    * propagation, where star contraction halves the remaining depth
    * every alternation (measured 6 rounds on the same graph).
    *
    * The bucket frame contracts to STAR EDGES first — one (member,
    * bucket-min) edge per membership row, which preserves connectivity
    * and keeps the edge list LINEAR in the input (never the m² pairs of
    * a bucket explosion; the same never-materialize-edges discipline as
    * [[viaBuckets]], one extra groupBy). Then per round:
    *
    *   - large-star: symmetrize; every node points its LARGER neighbors
    *     at the minimum of its closed neighborhood — edges come out
    *     oriented large→small;
    *   - small-star: every node folds itself and its smaller neighbors
    *     onto their minimum.
    *
    * Fixpoint (edge set unchanged) ⇒ each component is a star around
    * its minimum node; labels read off the final edges. Convergence is
    * REQUIRED like [[viaBuckets]] (throw, never a silent partial
    * answer); each round's edges are localCheckpoint'ed to cut lineage.
    * Prefer [[viaBuckets]] for near-clique collision graphs (2–3 cheap
    * rounds, no symmetrize); prefer this form when the component
    * diameter is unknown or adversarial.
    */
  def viaStars(memberships: DataFrame, nodeCol: String,
      bucketCols: Seq[String], maxIters: Int = 40,
      onRound: (Int, Long) => Unit = (_, _) => ()): DataFrame = {
    require(bucketCols.nonEmpty, "bucketCols must be non-empty")
    require(maxIters >= 1, s"maxIters must be >= 1, got $maxIters")
    val spark = memberships.sparkSession
    val bCols = bucketCols.map(col)
    // lineage cut + row count in ONE action (r16 — see propagate): the
    // count() that materializes the localCheckpoint IS the edge count
    def checkpointCounted(df: DataFrame): (DataFrame, Long) = {
      val schema = df.schema
      val rdd = df.queryExecution.toRdd.mapPartitions(_.map(_.copy()))
      rdd.localCheckpoint()
      val n = rdd.count()
      (org.apache.spark.sql.graftshim.FrameBridge.ofInternal(spark, rdd, schema), n)
    }
    val m = memberships
      .select(col(nodeCol).as("n") +: bCols: _*)
      .distinct()
      .persist()
    try {
      val allNodes = m.select(col("n")).distinct().localCheckpoint(true)
      val hubs = m.groupBy(bCols: _*).agg(min(col("n")).as("hub"))
      var (edges, edgeCount) = checkpointCounted(m.join(hubs, bucketCols)
        .filter(col("n") =!= col("hub"))
        .select(greatest(col("n"), col("hub")).as("u"),
          least(col("n"), col("hub")).as("v"))
        .distinct())
      var round = 0
      var changed = if (edgeCount == 0) 0L else 1L
      while (changed > 0) {
        round += 1
        if (round > maxIters)
          throw new IllegalStateException(
            s"star contraction did not converge in $maxIters rounds; raise maxIters")
        // large-star: m(u) = min(closed neighborhood); larger neighbors
        // re-point at it. Output orientation is large→small because
        // v > u ≥ m(u).
        val sym = edges.unionByName(
          edges.select(col("v").as("u"), col("u").as("v")))
        val mins = sym.groupBy(col("u")).agg(min(col("v")).as("mn"))
          .select(col("u"), least(col("mn"), col("u")).as("mu"))
        val large = sym.join(mins, "u")
          .filter(col("v") > col("u"))
          .select(col("v").as("u"), col("mu").as("v"))
          .distinct()
        // small-star on the large→small orientation: fold u and its
        // smaller neighbors onto their common minimum.
        val mins2 = large.groupBy(col("u")).agg(min(col("v")).as("mu"))
        val (next, nextCount) = checkpointCounted(large.join(mins2, "u")
          .filter(col("v") =!= col("mu"))
          .select(col("v").as("u"), col("mu").as("v"))
          .unionByName(mins2.select(col("u"), col("mu").as("v")))
          .distinct())
        // fixpoint = edge-set equality; a COUNT mismatch already proves
        // inequality (both sets are distinct), so the anti-join pass
        // only runs on the candidate-converged round — and ONE direction
        // suffices there: |A| = |B| with A∖B = ∅ implies A = B for sets
        changed =
          if (nextCount != edgeCount) 1L
          else next.exceptAll(edges).count()
        onRound(round, changed)
        edgeCount = nextCount
        edges = next
      }
      allNodes
        .join(edges.groupBy(col("u")).agg(min(col("v")).as("comp"))
          .select(col("u").as("n"), col("comp")), Seq("n"), "left")
        .select(col("n").as(nodeCol),
          coalesce(col("comp"), col("n")).as("component"))
    } finally {
      m.unpersist()
      ()
    }
  }
}
