package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => V}

/** Semantic deduplication in embedding space — the SemDeDup recipe
  * (public: Abbas et al. 2023, "SemDeDup: Data-efficient learning at
  * web-scale through semantic deduplication"): cluster the corpus
  * embeddings, then inside each cluster drop near-duplicates by exact
  * cosine. The cluster cell is the blocking key: the quadratic lives
  * inside a cell, never across the corpus — the paper's own scale
  * argument (the cluster count grows with the corpus so cell size
  * stays bounded; q68's trained k-means codebook drops into the same
  * `centroids` slot).
  *
  * Keep rule (pinned by the q91 oracle and SelectionSpec): a vector is
  * dropped iff SOME lower-id vector in its cell has cosine ≥ τ with it
  * — chain semantics (the witness may itself be dropped), which is the
  * paper's "keep one representative per near-dup neighborhood" made
  * deterministic by id order.
  *
  * Persist lifecycle: the assignment stage feeds both sides of the
  * cell-blocked self-join AND the final anti-join, so it is persisted;
  * the public surface is [[Staged]] / the loan-pattern managed form
  * (the ExactSubstr contract — a long-lived service must not rely on
  * Bench/Verify's `clearCache()`).
  */
object SemDeDup {

  /** Result frame + explicit release of the operator's staged persists
    * (idempotent; call after the terminal action on `frame`). */
  final case class Staged(frame: DataFrame, release: () => Unit)

  /** Survivors (`idCol`, `cell`) of within-cell cosine dedup.
    *
    * @param vectors   (`idCol`, `embCol`: array&lt;double&gt;, `normCol`)
    * @param centroids (cid, ce) codebook — seed or trained (q68); ships
    *                  broadcast via [[IvfIndex.assign]]'s guard
    * @param threshold drop a vector when some lower-id cell-mate's
    *                  cosine reaches it
    */
  def survivorsWithRelease(vectors: DataFrame, centroids: DataFrame, idCol: String,
      embCol: String, normCol: String, threshold: Double): Staged = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val assigned = IvfIndex.assign(vectors, centroids, embCol, idCol).persist()
    val a = assigned.select(col("cell"), col(idCol).as("id_a"),
      col(embCol).as("ea"), col(normCol).as("na"))
    val b = assigned.select(col("cell"), col(idCol).as("id_b"),
      col(embCol).as("eb"), col(normCol).as("nb"))
    val dropped = a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .filter(V.cosine(col("ea"), col("eb"), col("na"), col("nb")) >= threshold)
      .select(col("id_b").as(idCol))
      .distinct()
    val out = assigned.join(dropped, Seq(idCol), "left_anti")
      .select(col(idCol), col("cell"))
    Staged(out, () => { assigned.unpersist(); () })
  }

  /** Loan-pattern [[survivorsWithRelease]] for lexically-scoped use. */
  def survivorsManaged[U](vectors: DataFrame, centroids: DataFrame, idCol: String,
      embCol: String, normCol: String, threshold: Double)(use: DataFrame => U): U = {
    val staged = survivorsWithRelease(vectors, centroids, idCol, embCol, normCol, threshold)
    try use(staged.frame) finally staged.release()
  }

  /** Raw gate form — persists are released by the registry runner's
    * `clearCache()`; services use the Staged/Managed surface. */
  private[graft] def survivors(vectors: DataFrame, centroids: DataFrame, idCol: String,
      embCol: String, normCol: String, threshold: Double): DataFrame =
    survivorsWithRelease(vectors, centroids, idCol, embCol, normCol, threshold).frame

  /** Map-side cell assignment against a DRIVER-LITERAL codebook — the
    * streaming-friendly twin of [[IvfIndex.assign]]: no join, no
    * shuffle, no per-vector expansion, just one expression per
    * centroid. Arithmetic is bit-identical to the join path (the same
    * strict-left-fold `sqDist`; ties resolve to the LOWER cid via
    * strict `<` over centroids iterated in ascending cid order — the
    * `ORDER BY d, cid` rule both oracles pin). Use when the codebook is
    * small enough to inline in the plan (the streaming gates' seed
    * books); the join path stays the production route for trained
    * books, where the broadcast guard and null-distance drop-out
    * semantics matter.
    */
  def assignCellLit(emb: Column, cents: Seq[(Long, Array[Double])]): Column = {
    require(cents.nonEmpty, "assignCellLit needs at least one centroid")
    val ordered = cents.sortBy(_._1)
    val scored = ordered.map { case (cid, ce) =>
      struct(IvfIndex.sqDist(emb, lit(ce)).as("d"), lit(cid).as("cid"))
    }
    // argmin as ONE lexicographic array_min over (d, cid) structs — the
    // `ORDER BY d, cid` rule both oracles pin, with each distance
    // evaluated exactly once. The previous `reduceLeft(when(_ < _, x)
    // .otherwise(acc))` duplicated the accumulator per level (condition
    // + else branch), doubling the expression TREE per centroid — 2^C
    // interpreted evaluations wherever the plan falls back from codegen
    // (r15 GateProbe: the q96 stream's warm drain carried ~1.3 s of
    // pure assignment overhead vs the closure twin q102 at C = 8).
    // Tie semantics unchanged: struct comparison is lexicographic, so
    // equal distances resolve to the LOWER cid, exactly like the strict
    // `<` fold over ascending cids.
    array_min(array(scored: _*)).getField("cid")
  }

  /** Map-side cell assignment for codebooks too LARGE to inline —
    * [[assignCellLit]]'s plan is O(C·dim) expressions (the q40 audit
    * forbids that shape past toy C), and the join path's argmin groupBy
    * cannot precede a stateful streaming operator. This returns a plain
    * Scala function for `Dataset.map`: the codebook rides the task
    * closure (serialized once per executor, like a broadcast), the scan
    * is a strict-left-fold over primitive arrays — the same IEEE
    * association as `sqDist`, with strict `<` over ascending cids
    * reproducing the `ORDER BY d, cid` tie rule — so all three
    * assignment paths agree bit-for-bit (SelectionSpec pins it).
    */
  def assignCellFunc(cents: Seq[(Long, Array[Double])]): Seq[Double] => Long = {
    require(cents.nonEmpty, "assignCellFunc needs at least one centroid")
    val ordered = cents.sortBy(_._1).toArray
    (e: Seq[Double]) => {
      val v = e.toArray
      var bestCid = ordered(0)._1
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < ordered.length) {
        val ce = ordered(c)._2
        var d = 0.0
        var i = 0
        while (i < ce.length) { val x = v(i) - ce(i); d += x * x; i += 1 }
        if (d < bestD) { bestD = d; bestCid = ordered(c)._1 }
        c += 1
      }
      bestCid
    }
  }
}
