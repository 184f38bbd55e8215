package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization — the compression story for vector corpora at
  * 100 TB: a dim-D float vector (4·D bytes) becomes `m` small codes
  * (one byte each at k≤256 centroids per subspace), a 32× reduction at
  * D=64/m=4, while asymmetric-distance search (ADC) stays a table
  * lookup per subspace. Composes with the IVF family: the corpus keeps
  * (cell, codes) and a probed-cell candidate set is re-ranked by ADC
  * instead of exact folds over raw vectors.
  *
  * Spark shape (everything narrow, nothing all-pairs):
  *   - [[encode]]: one `posexplode` of the m subvector slices per
  *     vector, ONE broadcast equi-join on the REAL key `(sub)` against
  *     the per-subspace books (a plain BroadcastHashJoin — no constant
  *     key needed: subspace ids are genuine join keys), the same strict
  *     left-fold distance as [[IvfIndex]], argmin per (vector, sub)
  *     grouped NARROW (the FANIN r8 finding: wide composite group keys
  *     over expanded joins are 12× slower — group (id, sub), carry
  *     nothing, join payloads back only if needed), then codes
  *     reassembled in subspace order. Shuffle: one row per (vector,
  *     sub), map-side combined.
  *   - [[adcTables]]: the per-query lookup tables — queries × (m·k)
  *     book rows, query-side only, the probed-IVF re-rank companion.
  *   - [[adcScore]]: the fold `Σ_s table[s][code_s]` as a zip_with over
  *     the code array and the query's table array — codegen-friendly,
  *     no UDF.
  *
  * Books are `(sub, cid, ce)` with dense cids 0…k−1 per subspace and
  * subvector centroids of length D/m; [[trainBooks]] builds them from
  * the corpus with [[KMeansCodebook]] per subspace (seeded, exact
  * fixed-point means — bit-reproducible like everything else here).
  * All arithmetic is strict left folds and exact double ops, so DuckDB
  * reproduces codes and ADC scores digit-for-digit (q70).
  */
object PqIndex {

  /** Split `e` into `m` equal subvectors; row per (sub, sube). */
  private def subvectors(e: Column, dims: Int, m: Int): Column = {
    require(dims % m == 0, s"dims $dims not divisible by m=$m")
    val w = dims / m
    array((0 until m).map(s =>
      struct(lit(s.toLong).as("sub"), slice(e, s * w + 1, w).as("sube"))): _*)
  }

  /** PQ-encode every vector: output = `idCol`, `codes` (array of the m
    * winning cids in subspace order). Corrupt subvectors (null distance
    * against every centroid of their subspace) drop that VECTOR — a
    * partial code is useless — mirroring [[IvfIndex.assign]]'s
    * drop-don't-misassign contract.
    */
  def encode(vectors: DataFrame, books: DataFrame, dims: Int, m: Int,
             embCol: String, idCol: String): DataFrame = {
    val sub = vectors.select(col(idCol), posexplode(subvectors(col(embCol), dims, m)))
      .select(col(idCol), col("col.sub").as("sub"), col("col.sube").as("sube"))
    sub.join(broadcast(books), "sub")
      .withColumn("__d", IvfIndex.sqDist(col("sube"), col("ce")))
      .filter(col("__d").isNotNull)
      .select(col(idCol), col("sub"), col("__d"), col("cid"))
      .groupBy(col(idCol), col("sub"))
      .agg(min_by(col("cid"), struct(col("__d"), col("cid"))).as("code"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__n"),
        transform(array_sort(collect_list(struct(col("sub"), col("code")))),
          s => s.getField("code")).as("codes"))
      .filter(col("__n") === m) // all m subspaces survived
      .drop("__n")
  }

  /** Per-subspace codebooks trained on the corpus itself: subspace `s`'s
    * book = the k lowest-id subvector seeds refined by `iters` Lloyd
    * iterations with [[KMeansCodebook]]'s exact fixed-point means.
    * Output `(sub, cid, ce)`, each book's cids GUARANTEED dense
    * 0…count−1: a Lloyd step DROPS cells that lose every vector
    * (duplicate seeds make this real), and [[adcScore]] indexes the
    * per-sub table POSITIONALLY via `element_at(t, code + 1)` — a
    * sparse cid would yield null (or wrong-entry) ADC scores that sort
    * NULLS FIRST into the shortlist (ADVICE r8). The final re-key is
    * order-preserving per subspace and costs one window over the m·k
    * book rows.
    *
    * All m subspaces train in ONE fused pipeline (r9 — the round-9
    * sidecar showed the per-subspace form as the slowest batch gate):
    * the corpus is exploded to (vector, sub) rows ONCE, every iteration
    * is a single broadcast join against all m books on the real `(sub)`
    * key + one argmin + one fixed-point mean keyed by (sub, cell, pos)
    * — `iters` corpus passes TOTAL instead of `m · iters` sequential
    * per-subspace pipelines. Arithmetic is identical per subspace
    * (same seeds, same strict-fold distances, same lowest-cid
    * tie-break, same exact DECIMAL(38,0) means), so the books are
    * bit-identical to the per-subspace form — q74's oracle pins that.
    * The subvector payload rides the argmin as a `first` aggregate
    * (constant within its (id, sub) group): one shuffle carries both
    * code and payload, instead of a narrow argmin plus a second
    * corpus-wide join (the FANIN group-narrow rule applies to group
    * KEYS; a map-side-combined payload is one row per group either
    * way).
    */
  def trainBooks(vectors: DataFrame, dims: Int, m: Int, k: Int,
                 embCol: String, idCol: String, iters: Int = 1): DataFrame = {
    val w = dims / m
    require(iters >= 1,
      s"trainBooks needs at least one Lloyd iteration (got $iters): iters=0 would " +
        "return the re-keyed raw seed subvectors, which callers would mistake for " +
        "a trained book (ADVICE r9; KMeansCodebook.train enforces the same)")
    require(IvfIndex.codebookBytes(m.toLong * k, w) <= IvfIndex.DefaultMaxCodebookBytes,
      s"combined PQ books (m=$m, k=$k, dims/m=$w) exceed the broadcast bound")
    val sv = vectors.select(col(idCol), posexplode(subvectors(col(embCol), dims, m)))
      .select(col(idCol), col("col.sub").as("sub"), col("col.sube").as("sube"))
    // seeds: the k lowest-id subvectors per subspace, dense cids — one
    // window instead of m orderBy().limit(k) scans
    val seedWin = org.apache.spark.sql.expressions.Window
      .partitionBy(col("sub")).orderBy(col(idCol))
    var books = sv.withColumn("__rn", row_number().over(seedWin))
      .filter(col("__rn") <= k)
      .select(col("sub"), (col("__rn") - 1).cast("long").as("cid"),
        col("sube").as("ce"))
    for (i <- 1 to iters) {
      // bound lineage across iterations: iteration i's book plan embeds
      // i−1's; checkpointing keeps each iteration exactly one corpus
      // pass (the seed window itself executes once inside iteration 1's
      // broadcast, so it needs no checkpoint)
      val cp = if (i == 1) books else books.localCheckpoint(true)
      // mean arithmetic SHARED with Lloyd (KMeansCodebook.fixedPointMeans)
      // — the q68/q74 bit-parity contract rides on one definition
      books = KMeansCodebook.fixedPointMeans(
        sv.join(broadcast(cp), "sub")
          .withColumn("__d", IvfIndex.sqDist(col("sube"), col("ce")))
          .filter(col("__d").isNotNull)
          .select(col(idCol), col("sub"), col("__d"), col("cid"), col("sube"))
          .groupBy(col(idCol), col("sub"))
          .agg(min_by(col("cid"), struct(col("__d"), col("cid"))).as("cell"),
            first(col("sube")).as("sube")),
        "sube", Seq("sub", "cell"))
        .select(col("sub"), col("cell").as("cid"), col("ce"))
    }
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("sub")).orderBy(col("cid"))
    books.select(col("sub"),
      (row_number().over(win) - 1).cast("long").as("cid"), col("ce"))
  }

  /** Per-query ADC lookup tables: one row per (query, sub, cid) with the
    * exact squared L2 between the query's subvector and that centroid —
    * `queries × m × k` rows, query-side only. Downstream search joins a
    * candidate's exploded codes on (sub, cid) or uses [[adcScore]] on a
    * collected table array.
    */
  def adcTables(queries: DataFrame, books: DataFrame, dims: Int, m: Int,
                embCol: String, idCol: String): DataFrame = {
    queries.select(col(idCol), posexplode(subvectors(col(embCol), dims, m)))
      .select(col(idCol), col("col.sub").as("sub"), col("col.sube").as("sube"))
      .join(broadcast(books), "sub")
      .select(col(idCol), col("sub"), col("cid"),
        IvfIndex.sqDist(col("sube"), col("ce")).as("d"))
  }

  /** ADC distance `Σ_s table[s][codes_s]` where `table` is the query's
    * lookup tables as an array-of-arrays (sub-major, cid-minor — the
    * shape `collect_list` + `array_sort` over [[adcTables]] yields) and
    * `codes` a corpus row's PQ codes. Uses the native single-pass
    * [[graft.functions.AdcFold]] kernel (r15): the composed
    * `aggregate(zip_with(…, element_at))` lambda is none of the fusable
    * fold shapes, so the ADC inner loop — once per (query, candidate)
    * pair, the hot multiply of PQ search — ran interpreted per element.
    * Asserted value/NULL-exact against [[composedAdcScore]] in
    * VectorExpressionsSpec.
    */
  def adcScore(table: Column, codes: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.functions.AdcFold(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(table),
        org.apache.spark.sql.graftshim.ColumnBridge.expression(codes)))

  /** The portable composed form of [[adcScore]] — the semantics
    * reference (what the DuckDB oracles mirror as list_reduce).
    */
  private[graft] def composedAdcScore(table: Column, codes: Column): Column =
    aggregate(
      zip_with(table, codes, (t, c) => element_at(t, (c + 1).cast("int"))),
      lit(0.0), (acc, x) => acc + x)
}
