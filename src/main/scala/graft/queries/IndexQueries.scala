package graft.queries

import org.apache.spark.sql.functions._
import graft.catalog.Tables

/** The vector-index gate family (SURVEY §2.5 / LLM-pipeline ANN story),
  * split out of [[Extended]] in r10 (VERDICT r9 item 5 — Extended had
  * grown to 2,013 lines): hierarchical IVF (q65/q67), distributed
  * k-means training (q68) and the trained index it feeds (q69/q77),
  * product quantization seed + trained (q70/q74), composed and residual
  * IVF-PQ up to the fully-trained production build (q71/q73/q76), and
  * scalar int8 quantization at rest (q72/q75). Registry membership and
  * gate bodies are byte-identical to their pre-split form — zero
  * behavior change.
  */
object IndexQueries {
  /** Two-level (hierarchical) IVF assignment, oracle-gated — the scale
    * path the flat codebook's 512 MiB broadcast guard points to
    * ([[graft.operators.IvfIndex.assignHierarchical]]): an
    * embedding-model codebook (C=65536 × 1024 dims) cannot broadcast,
    * but C1 × C2 coarse/residual books of √C rows each give the same
    * effective cells from two broadcastable tables. The gate exercises
    * the full production build: coarse book = first 4 vectors, fine
    * book = the residuals of the NEXT 4 vectors against their nearest
    * coarse centroid (the seed step of a residual k-means), then every
    * vector two-level-assigned. All arithmetic is strict left folds and
    * exact double subtraction, so DuckDB reproduces every (cell1,
    * cell2, flat cell) bit-for-bit; ties break on the lowest cid at
    * both levels in both engines.
    */
  val q65 = QueryDef(
    "q65_ann_ivf_hierarchical",
    (s, dir) => {
      import s.implicits._
      import graft.functions.{VectorFunctions => V}
      import graft.operators.IvfIndex
      val v = Tables.load(s, dir, "embeddings")
        .withColumn("e", V.asDouble($"embedding"))
        .select($"vec_id", $"e")
      val coarse = v.filter($"vec_id" < 4)
        .select($"vec_id".cast("long").as("cid"), $"e".as("ce"))
      // fine book: residuals of seed vectors [4, 8) vs their nearest
      // coarse centroid — the deterministic stand-in for residual
      // k-means output (the plan is identical with learned centroids)
      val seeds = IvfIndex.assign(
        v.filter($"vec_id" >= 4 && $"vec_id" < 8), coarse,
        embCol = "e", idCol = "vec_id")
      val fine = seeds.join(broadcast(coarse), seeds("cell") === coarse("cid"))
        .select(($"vec_id" - 4).cast("long").as("cid"),
          zip_with($"e", $"ce", (x, y) => x - y).as("ce"))
      IvfIndex.assignHierarchical(v, coarse, fine, embCol = "e", idCol = "vec_id")
        .select($"vec_id", $"cell1", $"cell2", $"cell")
    },
    Some("""
      WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings
      ), coarse AS (
        SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < 4
      ), d1 AS (
        SELECT v.vec_id, c.cid,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,64), i -> (v.e[i]-c.ce[i])*(v.e[i]-c.ce[i]))),
            (a,b) -> a+b) AS d
        FROM v CROSS JOIN coarse c
      ), a1 AS (
        SELECT vec_id, cid AS cell1 FROM (
          SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
          FROM d1) WHERE rn = 1
      ), res AS (
        SELECT v.vec_id, a1.cell1,
          list_transform(generate_series(1,64), i -> v.e[i] - c.ce[i]) AS r
        FROM v JOIN a1 USING (vec_id) JOIN coarse c ON c.cid = a1.cell1
      ), fine AS (
        SELECT vec_id - 4 AS cid, r AS ce FROM res WHERE vec_id >= 4 AND vec_id < 8
      ), d2 AS (
        SELECT res.vec_id, f.cid,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,64), i -> (res.r[i]-f.ce[i])*(res.r[i]-f.ce[i]))),
            (a,b) -> a+b) AS d
        FROM res CROSS JOIN fine f
      ), a2 AS (
        SELECT vec_id, cid AS cell2 FROM (
          SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
          FROM d2) WHERE rn = 1
      )
      SELECT r.vec_id, r.cell1, a2.cell2, r.cell1 * 4 + a2.cell2 AS cell
      FROM res r JOIN a2 USING (vec_id)"""))

  /** End-to-end ANN search through the two-level index — the q50
    * analogue for [[graft.operators.IvfIndex.probeCellsHierarchical]]
    * (VERDICT r7 missing #3: q65 gates the assignment, this gates the
    * SEARCH): the corpus is two-level-assigned (same books as q65), each
    * query probes its 2 nearest coarse cells × 2 nearest residual cells
    * within each (4 of the 16 effective cells — the two recall knobs a
    * production IVF-residual index turns), candidates meet the corpus on
    * the flat cell id, and the probed set is exact-cosine re-ranked to
    * top-3. Cost shape at 100 TB: probing is query-side only, the corpus
    * keeps its single-cell assignment, and the candidate join is an
    * equi-join on `cell` — never all-pairs. RecallSpec grades this plan
    * against the q16 brute-force ground truth. This gate deliberately
    * uses SEED books to pin the search kernels in isolation; q77 runs
    * the same search through q69's TRAINED books — the trained path.
    */
  val q67 = QueryDef(
    "q67_ann_ivf_hier_search",
    (s, dir) => {
      import s.implicits._
      import graft.functions.{VectorFunctions => V}
      import graft.operators.IvfIndex
      val v = Tables.load(s, dir, "embeddings")
        .withColumn("e", V.asDouble($"embedding"))
        .withColumn("nrm", V.norm($"e"))
        .select($"vec_id", $"e", $"nrm")
      val coarse = v.filter($"vec_id" < 4)
        .select($"vec_id".cast("long").as("cid"), $"e".as("ce"))
      // same deterministic book build as q65: fine = residuals of seed
      // vectors [4, 8) against their nearest coarse centroid
      val seeds = IvfIndex.assign(
        v.filter($"vec_id" >= 4 && $"vec_id" < 8).select($"vec_id", $"e"),
        coarse, embCol = "e", idCol = "vec_id")
      val fine = seeds.join(broadcast(coarse), seeds("cell") === coarse("cid"))
        .select(($"vec_id" - 4).cast("long").as("cid"),
          zip_with($"e", $"ce", (x, y) => x - y).as("ce"))
      val assigned = IvfIndex
        .assignHierarchical(v, coarse, fine, embCol = "e", idCol = "vec_id")
        .select($"vec_id", $"cell", $"e", $"nrm")
        .persist()
      val probes = IvfIndex.probeCellsHierarchical(
        v.filter($"vec_id" < 30)
          .select($"vec_id".as("query_id"), $"e".as("qe"), $"nrm".as("qn")),
        coarse, fine, embCol = "qe", idCol = "query_id",
        nprobeCoarse = 2, nprobeFine = 2)
        .select($"query_id", $"cell", $"qe", $"qn")
      val scored = assigned.join(probes, Seq("cell"))
        .filter($"vec_id" =!= $"query_id")
        .select($"query_id", $"vec_id".as("neighbor_id"),
          V.cosine($"qe", $"e", $"qn", $"nrm").as("cosine"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"query_id").orderBy($"cosine".desc, $"neighbor_id")
      scored.withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 3)
        .select($"query_id", $"rnk", $"neighbor_id", $"cosine")
    },
    Some("""
      WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings
      ), n AS (
        SELECT vec_id, e, sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list_transform(e, x -> x*x)), (a,b) -> a+b)) AS nrm FROM v
      ), coarse AS (
        SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < 4
      ), d1 AS (
        SELECT v.vec_id, c.cid,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,64), i -> (v.e[i]-c.ce[i])*(v.e[i]-c.ce[i]))),
            (a,b) -> a+b) AS d
        FROM v CROSS JOIN coarse c
      ), a1 AS (
        SELECT vec_id, cid AS cell1 FROM (
          SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
          FROM d1) WHERE rn = 1
      ), res AS (
        SELECT v.vec_id, a1.cell1,
          list_transform(generate_series(1,64), i -> v.e[i] - c.ce[i]) AS r
        FROM v JOIN a1 USING (vec_id) JOIN coarse c ON c.cid = a1.cell1
      ), fine AS (
        SELECT vec_id - 4 AS cid, r AS ce FROM res WHERE vec_id >= 4 AND vec_id < 8
      ), d2 AS (
        SELECT res.vec_id, f.cid,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,64), i -> (res.r[i]-f.ce[i])*(res.r[i]-f.ce[i]))),
            (a,b) -> a+b) AS d
        FROM res CROSS JOIN fine f
      ), a2 AS (
        SELECT vec_id, cid AS cell2 FROM (
          SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
          FROM d2) WHERE rn = 1
      ), corpus AS (
        SELECT r.vec_id, r.cell1 * 4 + a2.cell2 AS cell, n.e, n.nrm
        FROM res r JOIN a2 USING (vec_id) JOIN n USING (vec_id)
      ), p1 AS (
        SELECT vec_id AS query_id, cid AS cell1 FROM (
          SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
          FROM d1 WHERE vec_id < 30) WHERE rn <= 2
      ), qres AS (
        SELECT p1.query_id, p1.cell1,
          list_transform(generate_series(1,64), i -> v.e[i] - c.ce[i]) AS r
        FROM p1 JOIN v ON v.vec_id = p1.query_id JOIN coarse c ON c.cid = p1.cell1
      ), qd2 AS (
        SELECT qres.query_id, qres.cell1, f.cid,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,64), i -> (qres.r[i]-f.ce[i])*(qres.r[i]-f.ce[i]))),
            (a,b) -> a+b) AS d
        FROM qres CROSS JOIN fine f
      ), p2 AS (
        SELECT query_id, cell1 * 4 + cell2 AS cell FROM (
          SELECT query_id, cell1, cid AS cell2,
            row_number() OVER (PARTITION BY query_id, cell1 ORDER BY d, cid) AS rn
          FROM qd2) WHERE rn <= 2
      ), qv AS (
        SELECT p.query_id, p.cell, n.e, n.nrm
        FROM p2 p JOIN n ON n.vec_id = p.query_id
      ), scored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,64), i -> q.e[i]*c.e[i])), (a,b) -> a+b)
            / (q.nrm * c.nrm) AS cosine
        FROM qv q JOIN corpus c ON c.cell = q.cell AND c.vec_id <> q.query_id
      ), ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
        FROM scored
      )
      SELECT query_id, rnk, neighbor_id, cosine FROM ranked WHERE rnk <= 3"""))

  /** Distributed codebook TRAINING, oracle-gated (VERDICT r7 item 4):
    * [[graft.operators.KMeansCodebook.train]] — deterministic seeds (the
    * k lowest-id vectors) + two full Lloyd iterations over the corpus.
    * The centroid mean is the operator's bit-reproducibility story:
    * coordinates are quantized to fixed point (`floor(x·2^30)`), summed
    * as exact integers (DECIMAL(38,0) / HUGEINT — commutative, so the
    * result is identical under ANY partitioning or merge order), and
    * divided back out — which is why DuckDB can hash-match a FLOAT
    * training run at all. Assignment reuses the q40/q65 broadcast-argmin
    * kernel (strict left folds, ties to the lowest cid). The oracle
    * unrolls the two iterations as CTEs.
    *
    * The gate projects the book to exploded `(cid, pos, val)` rows — one
    * row per centroid coordinate — because the driver's comparator sorts
    * result rows by every column and cannot sort array cells (VERDICT
    * r8: q68/q72 were `err` in CORRECTNESS_r08 for exactly this; q14's
    * `getItem` projection set the scalar-output convention, and
    * PlanAuditSpec now enforces it registry-wide). Same hash coverage:
    * every coordinate of every centroid is still compared.
    */
  val q68 = QueryDef(
    "q68_kmeans_train",
    (s, dir) => {
      import s.implicits._
      import graft.functions.{VectorFunctions => V}
      import graft.operators.KMeansCodebook
      val v = Tables.load(s, dir, "embeddings")
        .select($"vec_id", V.asDouble($"embedding").as("e"))
      val init = KMeansCodebook.initLowestIds(v, embCol = "e", idCol = "vec_id", k = 4)
      KMeansCodebook.train(v, init, embCol = "e", idCol = "vec_id", iters = 2)
        .select($"cid", posexplode($"ce").as(Seq("pos", "val")))
    },
    Some("""
      WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings
      ), seeds AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, e AS ce
        FROM v ORDER BY vec_id LIMIT 4
      ), d1 AS (
        SELECT v.vec_id, s.cid,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,64), i -> (v.e[i]-s.ce[i])*(v.e[i]-s.ce[i]))),
            (a,b) -> a+b) AS d
        FROM v CROSS JOIN seeds s
      ), a1 AS (
        SELECT vec_id, cid AS cell FROM (
          SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
          FROM d1) WHERE rn = 1
      ), px1 AS (
        SELECT a1.cell, i.i AS pos,
          CAST(floor(v.e[i.i] * 1073741824.0) AS HUGEINT) AS q
        FROM a1 JOIN v USING (vec_id)
        CROSS JOIN (SELECT unnest(generate_series(1,64)) AS i) i
      ), c1 AS (
        SELECT cell, pos, (CAST(SUM(q) AS DOUBLE) / 1073741824.0) / COUNT(*) AS val
        FROM px1 GROUP BY 1, 2
      ), b1 AS (
        SELECT cell AS cid, list(val ORDER BY pos) AS ce FROM c1 GROUP BY cell
      ), d2 AS (
        SELECT v.vec_id, b.cid,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,64), i -> (v.e[i]-b.ce[i])*(v.e[i]-b.ce[i]))),
            (a,b) -> a+b) AS d
        FROM v CROSS JOIN b1 b
      ), a2 AS (
        SELECT vec_id, cid AS cell FROM (
          SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
          FROM d2) WHERE rn = 1
      ), px2 AS (
        SELECT a2.cell, i.i AS pos,
          CAST(floor(v.e[i.i] * 1073741824.0) AS HUGEINT) AS q
        FROM a2 JOIN v USING (vec_id)
        CROSS JOIN (SELECT unnest(generate_series(1,64)) AS i) i
      ), c2 AS (
        SELECT cell, pos, (CAST(SUM(q) AS DOUBLE) / 1073741824.0) / COUNT(*) AS val
        FROM px2 GROUP BY 1, 2
      )
      SELECT cell AS cid, pos - 1 AS pos, val FROM c2"""))

  /** The TRAINED hierarchical index, end to end (composition of q68 +
    * q65): coarse book = one Lloyd iteration of k-means over the corpus,
    * fine book = one Lloyd iteration over the RESIDUALS against the
    * trained coarse book (actual residual k-means — q65 used seed-vector
    * residuals as a deterministic stand-in; this gate retires that
    * caveat), then every vector two-level-assigned through
    * [[graft.operators.IvfIndex.assignHierarchical]]. Both books are
    * localCheckpoint'ed before indexing — the caller-side contract the
    * IvfIndex scaladoc asks for (a codebook that is itself a training
    * pipeline must not re-execute per guard/broadcast). Training means
    * are fixed-point (q68), distances strict left folds (q65), so DuckDB
    * reproduces the whole build digit-for-digit.
    */
  val q69 = QueryDef(
    "q69_kmeans_hier_index",
    (s, dir) => {
      import s.implicits._
      import graft.functions.{VectorFunctions => V}
      import graft.operators.{BookCache, IvfIndex, KMeansCodebook}
      val v = Tables.load(s, dir, "embeddings")
        .select($"vec_id", V.asDouble($"embedding").as("e"))
      // BookCache: q76/q77 train these exact books too — one training per
      // (dir, params) per session; training is bit-deterministic, so a hit
      // is value-identical to a rebuild (BookCacheSpec pins it)
      val coarse = BookCache(v, s"$dir#coarse:init=lowestIds,k=4,iters=1") {
        KMeansCodebook.train(v,
          KMeansCodebook.initLowestIds(v, "e", "vec_id", k = 4),
          "e", "vec_id", iters = 1).localCheckpoint(true)
      }
      val fine = BookCache(v,
        s"$dir#fineResidual(coarse=lowestIds,k=4,iters=1):init=lowestIds,k=4,iters=1") {
        val resid = IvfIndex.assign(v, coarse, embCol = "e", idCol = "vec_id")
          .join(broadcast(coarse), $"cell" === $"cid")
          .select($"vec_id", zip_with($"e", $"ce", (x, y) => x - y).as("r"))
        KMeansCodebook.train(resid,
          KMeansCodebook.initLowestIds(resid, "r", "vec_id", k = 4),
          "r", "vec_id", iters = 1).localCheckpoint(true)
      }
      IvfIndex.assignHierarchical(v, coarse, fine, embCol = "e", idCol = "vec_id")
        .select($"vec_id", $"cell1", $"cell2", $"cell")
    },
    Some("""
      WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings
      ), seeds AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, e AS ce
        FROM v ORDER BY vec_id LIMIT 4
      ), d1 AS (
        SELECT v.vec_id, s.cid,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,64), i -> (v.e[i]-s.ce[i])*(v.e[i]-s.ce[i]))),
            (a,b) -> a+b) AS d
        FROM v CROSS JOIN seeds s
      ), a1 AS (
        SELECT vec_id, cid AS cell FROM (
          SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
          FROM d1) WHERE rn = 1
      ), px1 AS (
        SELECT a1.cell, i.i AS pos,
          CAST(floor(v.e[i.i] * 1073741824.0) AS HUGEINT) AS q
        FROM a1 JOIN v USING (vec_id)
        CROSS JOIN (SELECT unnest(generate_series(1,64)) AS i) i
      ), c1 AS (
        SELECT cell, pos, (CAST(SUM(q) AS DOUBLE) / 1073741824.0) / COUNT(*) AS val
        FROM px1 GROUP BY 1, 2
      ), coarse AS (
        SELECT cell AS cid, list(val ORDER BY pos) AS ce FROM c1 GROUP BY cell
      ), dc AS (
        SELECT v.vec_id, c.cid,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,64), i -> (v.e[i]-c.ce[i])*(v.e[i]-c.ce[i]))),
            (a,b) -> a+b) AS d
        FROM v CROSS JOIN coarse c
      ), ac AS (
        SELECT vec_id, cid AS cell1 FROM (
          SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
          FROM dc) WHERE rn = 1
      ), res AS (
        SELECT v.vec_id, ac.cell1,
          list_transform(generate_series(1,64), i -> v.e[i] - c.ce[i]) AS r
        FROM v JOIN ac USING (vec_id) JOIN coarse c ON c.cid = ac.cell1
      ), fseeds AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, r AS ce
        FROM res ORDER BY vec_id LIMIT 4
      ), fd1 AS (
        SELECT res.vec_id, f.cid,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,64), i -> (res.r[i]-f.ce[i])*(res.r[i]-f.ce[i]))),
            (a,b) -> a+b) AS d
        FROM res CROSS JOIN fseeds f
      ), fa1 AS (
        SELECT vec_id, cid AS cell FROM (
          SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
          FROM fd1) WHERE rn = 1
      ), fpx AS (
        SELECT fa1.cell, i.i AS pos,
          CAST(floor(res.r[i.i] * 1073741824.0) AS HUGEINT) AS q
        FROM fa1 JOIN res USING (vec_id)
        CROSS JOIN (SELECT unnest(generate_series(1,64)) AS i) i
      ), fc1 AS (
        SELECT cell, pos, (CAST(SUM(q) AS DOUBLE) / 1073741824.0) / COUNT(*) AS val
        FROM fpx GROUP BY 1, 2
      ), fine AS (
        SELECT cell AS cid, list(val ORDER BY pos) AS ce FROM fc1 GROUP BY cell
      ), fd2 AS (
        SELECT res.vec_id, res.cell1, f.cid,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,64), i -> (res.r[i]-f.ce[i])*(res.r[i]-f.ce[i]))),
            (a,b) -> a+b) AS d
        FROM res CROSS JOIN fine f
      ), fa2 AS (
        SELECT vec_id, cell1, cid AS cell2 FROM (
          SELECT vec_id, cell1, cid,
            row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
          FROM fd2) WHERE rn = 1
      )
      SELECT vec_id, cell1, cell2, cell1 * 4 + cell2 AS cell FROM fa2"""))

  /** Product quantization end to end, oracle-gated: the corpus is
    * PQ-encoded ([[graft.operators.PqIndex.encode]] — m=4 subspaces ×
    * k=4 centroids, books = the subvector slices of the 4 lowest-id
    * vectors), each query builds its ADC lookup tables, and every
    * corpus vector is scored by the table-lookup distance
    * `Σ_s table[s][code_s]` ([[graft.operators.PqIndex.adcScore]]) —
    * top-3 per query. This is the COMPRESSION story at 100 TB: a
    * 64-dim float vector (256 B) becomes 4 codes (4 B at k≤256), and
    * candidate re-ranking reads codes + a per-query table instead of
    * raw vectors (in production the candidate set comes from IVF cell
    * probing, q67 — the gate scores the full corpus only because it is
    * gate-sized). The ADC sum is an ORDERED fold over subspaces in both
    * engines, so scores are bit-identical and the oracle hashes them.
    * This gate deliberately uses SEED books to pin the encode/ADC
    * kernels in isolation; q74 runs the same pipeline with TRAINED
    * books ([[graft.operators.PqIndex.trainBooks]]) — the trained path.
    */
  val q70 = QueryDef(
    "q70_pq_adc_topk",
    (s, dir) => {
      import s.implicits._
      import graft.functions.{VectorFunctions => V}
      import graft.operators.PqIndex
      val m = 4; val dims = 64; val w = dims / m
      val v = Tables.load(s, dir, "embeddings")
        .select($"vec_id", V.asDouble($"embedding").as("e"))
      val books = v.filter($"vec_id" < 4)
        .select($"vec_id", explode(sequence(lit(0L), lit(m - 1L))).as("sub"), $"e")
        .select($"sub", $"vec_id".as("cid"),
          expr(s"slice(e, sub * $w + 1, $w)").as("ce"))
      val codes = PqIndex.encode(v, books, dims, m, embCol = "e", idCol = "vec_id")
      val tables = PqIndex.adcTables(
        v.filter($"vec_id" < 30).select($"vec_id".as("query_id"), $"e"),
        books, dims, m, embCol = "e", idCol = "query_id")
        .groupBy($"query_id", $"sub")
        .agg(transform(array_sort(collect_list(struct($"cid", $"d"))),
          x => x.getField("d")).as("t"))
        .groupBy($"query_id")
        .agg(transform(array_sort(collect_list(struct($"sub", $"t"))),
          x => x.getField("t")).as("table"))
      val scored = codes.withColumn("__k", pmod(xxhash64($"vec_id"), lit(1L)))
        .join(broadcast(tables.withColumn("__k", pmod(xxhash64($"query_id"), lit(1L)))), "__k")
        .filter($"vec_id" =!= $"query_id")
        .select($"query_id", $"vec_id".as("neighbor_id"),
          PqIndex.adcScore($"table", $"codes").as("adc"))
      val rw = org.apache.spark.sql.expressions.Window
        // asc_nulls_last: a null ADC score (possible only if a book
        // violates the dense-cid contract — element_at past the table
        // end) must never SORT INTO the shortlist ahead of real scores
        // (ADVICE r8); trainBooks re-keys densely, this is defense in
        // depth for caller-supplied books
        .partitionBy($"query_id").orderBy($"adc".asc_nulls_last, $"neighbor_id")
      scored.withColumn("rnk", row_number().over(rw))
        .filter($"rnk" <= 3)
        .select($"query_id", $"rnk", $"neighbor_id", $"adc")
    },
    Some("""
      WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings
      ), subs AS (
        SELECT unnest(generate_series(0, 3)) AS sub
      ), d1 AS (
        SELECT v.vec_id, s.sub, b.vec_id AS cid,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,16),
              i -> (v.e[s.sub*16+i] - b.e[s.sub*16+i]) * (v.e[s.sub*16+i] - b.e[s.sub*16+i]))),
            (a,b) -> a+b) AS d
        FROM v CROSS JOIN subs s CROSS JOIN v b
        WHERE b.vec_id < 4
      ), codes AS (
        SELECT vec_id, sub, cid AS code FROM (
          SELECT vec_id, sub, cid,
            row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, cid) AS rn
          FROM d1) WHERE rn = 1
      ), qd AS (
        SELECT c.vec_id AS neighbor_id, q.vec_id AS query_id, c.sub,
          d1.d
        FROM codes c
        CROSS JOIN (SELECT vec_id FROM v WHERE vec_id < 30) q
        JOIN d1 ON d1.vec_id = q.vec_id AND d1.sub = c.sub AND d1.cid = c.code
        WHERE c.vec_id <> q.vec_id
      ), adc AS (
        SELECT query_id, neighbor_id,
          list_reduce(list_prepend(CAST(0 AS DOUBLE), list(d ORDER BY sub)),
            (a,b) -> a+b) AS adc
        FROM qd GROUP BY 1, 2
      ), ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc, neighbor_id) AS rnk
        FROM adc
      )
      SELECT query_id, rnk, neighbor_id, adc FROM ranked WHERE rnk <= 3"""))

  /** The full production ANN pipeline in one gate — IVF-PQ: the corpus
    * is two-level-assigned (q65's books) AND PQ-encoded (q70's books);
    * each query probes 2×2 hierarchical cells (q67), candidates meet the
    * corpus on the flat cell id, ADC pre-ranks them to the top-8 from
    * codes + the query's lookup tables (never touching raw candidate
    * vectors), and only those 8 get the exact-cosine re-rank to top-3.
    * At 100 TB this is the read-path story: the probed-cell scan reads
    * (cell, codes) — m bytes a vector — and raw embeddings are fetched
    * for the final handful only. Every stage is a gated operator; this
    * gate pins the COMPOSITION. Both ADC and cosine are ordered folds,
    * so DuckDB reproduces the two-stage cut bit-for-bit.
    */
  val q71 = QueryDef(
    "q71_ivf_pq_search",
    (s, dir) => {
      import s.implicits._
      import graft.functions.{VectorFunctions => V}
      import graft.operators.{IvfIndex, PqIndex}
      val m = 4; val dims = 64; val w = dims / m
      val v = Tables.load(s, dir, "embeddings")
        .withColumn("e", V.asDouble($"embedding"))
        .withColumn("nrm", V.norm($"e"))
        .select($"vec_id", $"e", $"nrm")
      val coarse = v.filter($"vec_id" < 4)
        .select($"vec_id".cast("long").as("cid"), $"e".as("ce"))
      val seeds = IvfIndex.assign(
        v.filter($"vec_id" >= 4 && $"vec_id" < 8).select($"vec_id", $"e"),
        coarse, embCol = "e", idCol = "vec_id")
      val fine = seeds.join(broadcast(coarse), seeds("cell") === coarse("cid"))
        .select(($"vec_id" - 4).cast("long").as("cid"),
          zip_with($"e", $"ce", (x, y) => x - y).as("ce"))
      val pqBooks = v.filter($"vec_id" < 4)
        .select($"vec_id", explode(sequence(lit(0L), lit(m - 1L))).as("sub"), $"e")
        .select($"sub", $"vec_id".as("cid"),
          expr(s"slice(e, sub * $w + 1, $w)").as("ce"))
      val corpus = IvfIndex
        .assignHierarchical(v, coarse, fine, embCol = "e", idCol = "vec_id")
        .select($"vec_id", $"cell", $"e", $"nrm")
        .join(PqIndex.encode(v, pqBooks, dims, m, "e", "vec_id"), Seq("vec_id"))
      val queries = v.filter($"vec_id" < 30)
        .select($"vec_id".as("query_id"), $"e".as("qe"), $"nrm".as("qn"))
      val probes = IvfIndex.probeCellsHierarchical(
        queries, coarse, fine, embCol = "qe", idCol = "query_id",
        nprobeCoarse = 2, nprobeFine = 2)
        .select($"query_id", $"cell")
      val tables = PqIndex.adcTables(
        queries.select($"query_id", $"qe".as("e")), pqBooks, dims, m, "e", "query_id")
        .groupBy($"query_id", $"sub")
        .agg(transform(array_sort(collect_list(struct($"cid", $"d"))),
          x => x.getField("d")).as("t"))
        .groupBy($"query_id")
        .agg(transform(array_sort(collect_list(struct($"sub", $"t"))),
          x => x.getField("t")).as("table"))
      val wAdc = org.apache.spark.sql.expressions.Window
        // asc_nulls_last: a null ADC score (possible only if a book
        // violates the dense-cid contract — element_at past the table
        // end) must never SORT INTO the shortlist ahead of real scores
        // (ADVICE r8); trainBooks re-keys densely, this is defense in
        // depth for caller-supplied books
        .partitionBy($"query_id").orderBy($"adc".asc_nulls_last, $"neighbor_id")
      val shortlist = corpus.join(probes, Seq("cell"))
        .filter($"vec_id" =!= $"query_id")
        .join(broadcast(tables), Seq("query_id"))
        .select($"query_id", $"vec_id".as("neighbor_id"), $"e", $"nrm",
          PqIndex.adcScore($"table", $"codes").as("adc"))
        .withColumn("__r", row_number().over(wAdc))
        .filter($"__r" <= 8)
      val wCos = org.apache.spark.sql.expressions.Window
        .partitionBy($"query_id").orderBy($"cosine".desc, $"neighbor_id")
      shortlist
        .join(queries, Seq("query_id"))
        .select($"query_id", $"neighbor_id",
          V.cosine($"qe", $"e", $"qn", $"nrm").as("cosine"))
        .withColumn("rnk", row_number().over(wCos))
        .filter($"rnk" <= 3)
        .select($"query_id", $"rnk", $"neighbor_id", $"cosine")
    },
    Some("""
      WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings
      ), n AS (
        SELECT vec_id, e, sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list_transform(e, x -> x*x)), (a,b) -> a+b)) AS nrm FROM v
      ), coarse AS (
        SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < 4
      ), d1 AS (
        SELECT v.vec_id, c.cid,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,64), i -> (v.e[i]-c.ce[i])*(v.e[i]-c.ce[i]))),
            (a,b) -> a+b) AS d
        FROM v CROSS JOIN coarse c
      ), a1 AS (
        SELECT vec_id, cid AS cell1 FROM (
          SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
          FROM d1) WHERE rn = 1
      ), res AS (
        SELECT v.vec_id, a1.cell1,
          list_transform(generate_series(1,64), i -> v.e[i] - c.ce[i]) AS r
        FROM v JOIN a1 USING (vec_id) JOIN coarse c ON c.cid = a1.cell1
      ), fine AS (
        SELECT vec_id - 4 AS cid, r AS ce FROM res WHERE vec_id >= 4 AND vec_id < 8
      ), d2 AS (
        SELECT res.vec_id, f.cid,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,64), i -> (res.r[i]-f.ce[i])*(res.r[i]-f.ce[i]))),
            (a,b) -> a+b) AS d
        FROM res CROSS JOIN fine f
      ), a2 AS (
        SELECT vec_id, cid AS cell2 FROM (
          SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
          FROM d2) WHERE rn = 1
      ), subs AS (
        SELECT unnest(generate_series(0, 3)) AS sub
      ), pqd AS (
        SELECT v.vec_id, s.sub, b.vec_id AS cid,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,16),
              i -> (v.e[s.sub*16+i] - b.e[s.sub*16+i]) * (v.e[s.sub*16+i] - b.e[s.sub*16+i]))),
            (a,b) -> a+b) AS d
        FROM v CROSS JOIN subs s CROSS JOIN v b
        WHERE b.vec_id < 4
      ), codes AS (
        SELECT vec_id, sub, cid AS code FROM (
          SELECT vec_id, sub, cid,
            row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, cid) AS rn
          FROM pqd) WHERE rn = 1
      ), corpus AS (
        SELECT r.vec_id, r.cell1 * 4 + a2.cell2 AS cell, n.e, n.nrm
        FROM res r JOIN a2 USING (vec_id) JOIN n USING (vec_id)
      ), p1 AS (
        SELECT vec_id AS query_id, cid AS cell1 FROM (
          SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
          FROM d1 WHERE vec_id < 30) WHERE rn <= 2
      ), qres AS (
        SELECT p1.query_id, p1.cell1,
          list_transform(generate_series(1,64), i -> v.e[i] - c.ce[i]) AS r
        FROM p1 JOIN v ON v.vec_id = p1.query_id JOIN coarse c ON c.cid = p1.cell1
      ), qd2 AS (
        SELECT qres.query_id, qres.cell1, f.cid,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,64), i -> (qres.r[i]-f.ce[i])*(qres.r[i]-f.ce[i]))),
            (a,b) -> a+b) AS d
        FROM qres CROSS JOIN fine f
      ), p2 AS (
        SELECT query_id, cell1 * 4 + cell2 AS cell FROM (
          SELECT query_id, cell1, cid AS cell2,
            row_number() OVER (PARTITION BY query_id, cell1 ORDER BY d, cid) AS rn
          FROM qd2) WHERE rn <= 2
      ), cand AS (
        SELECT p.query_id, c.vec_id AS neighbor_id, c.e, c.nrm
        FROM p2 p JOIN corpus c ON c.cell = p.cell AND c.vec_id <> p.query_id
      ), adc AS (
        SELECT ca.query_id, ca.neighbor_id,
          list_reduce(list_prepend(CAST(0 AS DOUBLE), list(pqd.d ORDER BY cd.sub)),
            (a,b) -> a+b) AS adc
        FROM cand ca
        JOIN codes cd ON cd.vec_id = ca.neighbor_id
        JOIN pqd ON pqd.vec_id = ca.query_id AND pqd.sub = cd.sub AND pqd.cid = cd.code
        GROUP BY 1, 2
      ), shortlist AS (
        SELECT query_id, neighbor_id FROM (
          SELECT query_id, neighbor_id,
            row_number() OVER (PARTITION BY query_id ORDER BY adc, neighbor_id) AS rn
          FROM adc) WHERE rn <= 8
      ), exact AS (
        SELECT s.query_id, s.neighbor_id,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,64), i -> q.e[i]*c.e[i])), (a,b) -> a+b)
            / (q.nrm * c.nrm) AS cosine
        FROM shortlist s
        JOIN n q ON q.vec_id = s.query_id
        JOIN n c ON c.vec_id = s.neighbor_id
      ), ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
        FROM exact
      )
      SELECT query_id, rnk, neighbor_id, cosine FROM ranked WHERE rnk <= 3"""))

  /** Scalar (int8-range) quantization, oracle-gated: per-dimension
    * min/max over the corpus, step = range/256 (an exact double op),
    * every vector coded 0…255 per dimension
    * ([[graft.operators.ScalarQuant]]). The 4×-smaller at-rest format a
    * vector store keeps below the PQ index — training-free and
    * distance-kernel-preserving. Encode is a pure map against two
    * dims-length literal arrays (no join, no shuffle); the gate hashes
    * every code of every vector, so a one-ulp divergence in any
    * dimension's step arithmetic breaks it. Output is exploded
    * `(vec_id, pos, code)` rows — the driver's comparator sorts rows by
    * every column and cannot sort an `array<long>` cell (VERDICT r8);
    * the scalar-output convention is enforced registry-wide by
    * PlanAuditSpec.
    */
  val q72 = QueryDef(
    "q72_scalar_quant",
    (s, dir) => {
      import s.implicits._
      import graft.functions.{VectorFunctions => V}
      import graft.operators.ScalarQuant
      val v = Tables.load(s, dir, "embeddings")
        .select($"vec_id", V.asDouble($"embedding").as("e"))
      ScalarQuant.encode(v, embCol = "e", idCol = "vec_id")
        .select($"vec_id", posexplode($"codes").as(Seq("pos", "code")))
    },
    Some("""
      WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings
      ), px AS (
        SELECT i.i AS pos, v.e[i.i] AS x
        FROM v CROSS JOIN (SELECT unnest(generate_series(1,64)) AS i) i
      ), st AS (
        SELECT pos, min(x) AS lo, (max(x) - min(x)) / 256.0 AS step
        FROM px GROUP BY pos
      ), arrs AS (
        SELECT list(lo ORDER BY pos) AS lo, list(step ORDER BY pos) AS step FROM st
      )
      SELECT v.vec_id, i.i - 1 AS pos,
        CASE WHEN a.step[i.i] = 0 THEN 0
             ELSE LEAST(255, CAST(floor((v.e[i.i] - a.lo[i.i]) / a.step[i.i]) AS BIGINT))
        END AS code
      FROM v CROSS JOIN arrs a
      CROSS JOIN (SELECT unnest(generate_series(1,64)) AS i) i"""))

  /** Canonical IVF-PQ (residual encoding), oracle-gated: unlike q71
    * (which PQ-codes RAW vectors), the corpus codes its RESIDUAL
    * `v − centroid(cell)` — the FAISS-style design where the PQ book
    * models what the coarse quantizer leaves behind — and each query
    * builds a SEPARATE ADC table per probed cell from its residual
    * against that cell's centroid. Candidates meet the probed cells on
    * `cell`, ADC pre-ranks the top-8 from codes alone, exact cosine
    * re-ranks to top-3. The per-(query, cell) table key is the flat
    * `query_id × C + cell` (C=4 here — dense cells, same injectivity
    * contract as the hierarchical cell id). All folds ordered; DuckDB
    * hashes the full two-stage result.
    */
  val q73 = QueryDef(
    "q73_ivfpq_residual",
    (s, dir) => {
      import s.implicits._
      import graft.functions.{VectorFunctions => V}
      import graft.operators.{IvfIndex, PqIndex}
      val m = 4; val dims = 64; val w = dims / m
      val v = Tables.load(s, dir, "embeddings")
        .withColumn("e", V.asDouble($"embedding"))
        .withColumn("nrm", V.norm($"e"))
        .select($"vec_id", $"e", $"nrm")
      val coarse = v.filter($"vec_id" < 4)
        .select($"vec_id".cast("long").as("cid"), $"e".as("ce"))
      val res = IvfIndex.assign(v, coarse, embCol = "e", idCol = "vec_id")
        .join(broadcast(coarse), $"cell" === $"cid")
        .select($"vec_id", $"cell", $"e", $"nrm",
          zip_with($"e", $"ce", (x, y) => x - y).as("r"))
      // PQ books over residual space: seed subvectors from vectors [4, 8)
      val pqBooks = res.filter($"vec_id" >= 4 && $"vec_id" < 8)
        .select($"vec_id", explode(sequence(lit(0L), lit(m - 1L))).as("sub"), $"r")
        .select($"sub", ($"vec_id" - 4).as("cid"),
          expr(s"slice(r, sub * $w + 1, $w)").as("ce"))
      val corpus = res
        .join(PqIndex.encode(res.select($"vec_id", $"r"), pqBooks, dims, m, "r", "vec_id"),
          Seq("vec_id"))
        .select($"vec_id", $"cell", $"e", $"nrm", $"codes")
      val q2 = v.filter($"vec_id" < 30)
        .select($"vec_id".as("query_id"), $"e".as("qe"), $"nrm".as("qn"))
      val probes = IvfIndex.probeCells(q2, coarse, embCol = "qe", idCol = "query_id",
        nprobe = 2)
        .join(broadcast(coarse), $"cell" === $"cid")
        .select($"query_id", $"cell",
          zip_with($"qe", $"ce", (x, y) => x - y).as("qr"))
      val tables = PqIndex.adcTables(
        probes.select(($"query_id" * 4 + $"cell").as("qk"), $"qr".as("e")),
        pqBooks, dims, m, embCol = "e", idCol = "qk")
        .groupBy($"qk", $"sub")
        .agg(transform(array_sort(collect_list(struct($"cid", $"d"))),
          x => x.getField("d")).as("t"))
        .groupBy($"qk")
        .agg(transform(array_sort(collect_list(struct($"sub", $"t"))),
          x => x.getField("t")).as("table"))
      val wAdc = org.apache.spark.sql.expressions.Window
        // asc_nulls_last: a null ADC score (possible only if a book
        // violates the dense-cid contract — element_at past the table
        // end) must never SORT INTO the shortlist ahead of real scores
        // (ADVICE r8); trainBooks re-keys densely, this is defense in
        // depth for caller-supplied books
        .partitionBy($"query_id").orderBy($"adc".asc_nulls_last, $"neighbor_id")
      val shortlist = corpus.join(probes.select($"query_id", $"cell"), Seq("cell"))
        .filter($"vec_id" =!= $"query_id")
        .withColumn("qk", $"query_id" * 4 + $"cell")
        .join(broadcast(tables), Seq("qk"))
        .select($"query_id", $"vec_id".as("neighbor_id"), $"e", $"nrm",
          PqIndex.adcScore($"table", $"codes").as("adc"))
        .withColumn("__r", row_number().over(wAdc))
        .filter($"__r" <= 8)
      val wCos = org.apache.spark.sql.expressions.Window
        .partitionBy($"query_id").orderBy($"cosine".desc, $"neighbor_id")
      shortlist
        .join(q2, Seq("query_id"))
        .select($"query_id", $"neighbor_id",
          V.cosine($"qe", $"e", $"qn", $"nrm").as("cosine"))
        .withColumn("rnk", row_number().over(wCos))
        .filter($"rnk" <= 3)
        .select($"query_id", $"rnk", $"neighbor_id", $"cosine")
    },
    Some("""
      WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings
      ), n AS (
        SELECT vec_id, e, sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list_transform(e, x -> x*x)), (a,b) -> a+b)) AS nrm FROM v
      ), coarse AS (
        SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < 4
      ), d1 AS (
        SELECT v.vec_id, c.cid,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,64), i -> (v.e[i]-c.ce[i])*(v.e[i]-c.ce[i]))),
            (a,b) -> a+b) AS d
        FROM v CROSS JOIN coarse c
      ), a1 AS (
        SELECT vec_id, cid AS cell FROM (
          SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
          FROM d1) WHERE rn = 1
      ), res AS (
        SELECT v.vec_id, a1.cell,
          list_transform(generate_series(1,64), i -> v.e[i] - c.ce[i]) AS r
        FROM v JOIN a1 USING (vec_id) JOIN coarse c ON c.cid = a1.cell
      ), subs AS (
        SELECT unnest(generate_series(0, 3)) AS sub
      ), pqbooks AS (
        SELECT s.sub, res.vec_id - 4 AS cid, res.r
        FROM res CROSS JOIN subs s
        WHERE res.vec_id >= 4 AND res.vec_id < 8
      ), pqd AS (
        SELECT res.vec_id, b.sub, b.cid,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,16),
              i -> (res.r[b.sub*16+i] - b.r[b.sub*16+i]) * (res.r[b.sub*16+i] - b.r[b.sub*16+i]))),
            (a,b) -> a+b) AS d
        FROM res CROSS JOIN pqbooks b
      ), codes AS (
        SELECT vec_id, sub, cid AS code FROM (
          SELECT vec_id, sub, cid,
            row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, cid) AS rn
          FROM pqd) WHERE rn = 1
      ), p1 AS (
        SELECT vec_id AS query_id, cid AS cell FROM (
          SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
          FROM d1 WHERE vec_id < 30) WHERE rn <= 2
      ), qres AS (
        SELECT p1.query_id, p1.cell,
          list_transform(generate_series(1,64), i -> v.e[i] - c.ce[i]) AS qr
        FROM p1 JOIN v ON v.vec_id = p1.query_id JOIN coarse c ON c.cid = p1.cell
      ), qtab AS (
        SELECT q.query_id, q.cell, b.sub, b.cid,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,16),
              i -> (q.qr[b.sub*16+i] - b.r[b.sub*16+i]) * (q.qr[b.sub*16+i] - b.r[b.sub*16+i]))),
            (a,b) -> a+b) AS d
        FROM qres q CROSS JOIN pqbooks b
      ), cand AS (
        SELECT p.query_id, p.cell, r.vec_id AS neighbor_id
        FROM p1 p JOIN res r ON r.cell = p.cell AND r.vec_id <> p.query_id
      ), adc AS (
        SELECT ca.query_id, ca.neighbor_id,
          list_reduce(list_prepend(CAST(0 AS DOUBLE), list(qt.d ORDER BY cd.sub)),
            (a,b) -> a+b) AS adc
        FROM cand ca
        JOIN codes cd ON cd.vec_id = ca.neighbor_id
        JOIN qtab qt ON qt.query_id = ca.query_id AND qt.cell = ca.cell
                    AND qt.sub = cd.sub AND qt.cid = cd.code
        GROUP BY 1, 2
      ), shortlist AS (
        SELECT query_id, neighbor_id FROM (
          SELECT query_id, neighbor_id,
            row_number() OVER (PARTITION BY query_id ORDER BY adc, neighbor_id) AS rn
          FROM adc) WHERE rn <= 8
      ), exact AS (
        SELECT s.query_id, s.neighbor_id,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,64), i -> q.e[i]*c.e[i])), (a,b) -> a+b)
            / (q.nrm * c.nrm) AS cosine
        FROM shortlist s
        JOIN n q ON q.vec_id = s.query_id
        JOIN n c ON c.vec_id = s.neighbor_id
      ), ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
        FROM exact
      )
      SELECT query_id, rnk, neighbor_id, cosine FROM ranked WHERE rnk <= 3"""))

  /** TRAINED-book PQ, end to end (VERDICT r8 missing #2 — the q69 move
    * applied to PQ): books come from [[graft.operators.PqIndex.trainBooks]]
    * (per-subspace k-means — 4 lowest-id subvector seeds + one
    * fixed-point Lloyd iteration over the corpus, q68's exact-mean
    * arithmetic), the corpus is encoded against them, and every corpus
    * vector is ADC-scored per query to a top-3 — retiring q70's
    * seed-book caveat the way q69 retired q65's. Books are
    * localCheckpoint'ed before indexing (a book plan that is itself a
    * training pipeline must not re-execute per guard/broadcast). The
    * oracle unrolls the per-subspace training as CTEs; because the means
    * are fixed point and every fold is ordered, DuckDB reproduces codes
    * and ADC scores digit-for-digit.
    */
  val q74 = QueryDef(
    "q74_pq_trained_adc",
    (s, dir) => {
      import s.implicits._
      import graft.functions.{VectorFunctions => V}
      import graft.operators.{BookCache, PqIndex}
      val m = 4; val dims = 64
      val v = Tables.load(s, dir, "embeddings")
        .select($"vec_id", V.asDouble($"embedding").as("e"))
      val books = BookCache(v, s"$dir#pqRaw:dims=64,m=4,k=4,iters=1") {
        PqIndex.trainBooks(v, dims, m, k = 4, "e", "vec_id", iters = 1)
          .localCheckpoint(true)
      }
      val codes = PqIndex.encode(v, books, dims, m, embCol = "e", idCol = "vec_id")
      val tables = PqIndex.adcTables(
        v.filter($"vec_id" < 30).select($"vec_id".as("query_id"), $"e"),
        books, dims, m, embCol = "e", idCol = "query_id")
        .groupBy($"query_id", $"sub")
        .agg(transform(array_sort(collect_list(struct($"cid", $"d"))),
          x => x.getField("d")).as("t"))
        .groupBy($"query_id")
        .agg(transform(array_sort(collect_list(struct($"sub", $"t"))),
          x => x.getField("t")).as("table"))
      val scored = codes.withColumn("__k", pmod(xxhash64($"vec_id"), lit(1L)))
        .join(broadcast(tables.withColumn("__k", pmod(xxhash64($"query_id"), lit(1L)))), "__k")
        .filter($"vec_id" =!= $"query_id")
        .select($"query_id", $"vec_id".as("neighbor_id"),
          PqIndex.adcScore($"table", $"codes").as("adc"))
      val rw = org.apache.spark.sql.expressions.Window
        .partitionBy($"query_id").orderBy($"adc".asc_nulls_last, $"neighbor_id")
      scored.withColumn("rnk", row_number().over(rw))
        .filter($"rnk" <= 3)
        .select($"query_id", $"rnk", $"neighbor_id", $"adc")
    },
    Some("""
      WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings
      ), subs AS (
        SELECT unnest(generate_series(0, 3)) AS sub
      ), sv AS (
        SELECT v.vec_id, s.sub,
          list_transform(generate_series(1,16), i -> v.e[s.sub*16+i]) AS se
        FROM v CROSS JOIN subs s
      ), seeds AS (
        SELECT sub, rn - 1 AS cid, se AS ce FROM (
          SELECT sub, se, row_number() OVER (PARTITION BY sub ORDER BY vec_id) AS rn
          FROM sv) WHERE rn <= 4
      ), d0 AS (
        SELECT sv.vec_id, sv.sub, s.cid,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,16), i -> (sv.se[i]-s.ce[i])*(sv.se[i]-s.ce[i]))),
            (a,b) -> a+b) AS d
        FROM sv JOIN seeds s USING (sub)
      ), a0 AS (
        SELECT vec_id, sub, cid AS cell FROM (
          SELECT vec_id, sub, cid,
            row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, cid) AS rn
          FROM d0) WHERE rn = 1
      ), px AS (
        SELECT a0.sub, a0.cell, i.i AS pos,
          CAST(floor(sv.se[i.i] * 1073741824.0) AS HUGEINT) AS q
        FROM a0 JOIN sv USING (vec_id, sub)
        CROSS JOIN (SELECT unnest(generate_series(1,16)) AS i) i
      ), c1 AS (
        SELECT sub, cell, pos, (CAST(SUM(q) AS DOUBLE) / 1073741824.0) / COUNT(*) AS val
        FROM px GROUP BY 1, 2, 3
      ), books AS (
        SELECT sub, cell AS cid, list(val ORDER BY pos) AS ce FROM c1 GROUP BY sub, cell
      ), d1 AS (
        SELECT sv.vec_id, sv.sub, b.cid,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,16), i -> (sv.se[i]-b.ce[i])*(sv.se[i]-b.ce[i]))),
            (a,b) -> a+b) AS d
        FROM sv JOIN books b USING (sub)
      ), codes AS (
        SELECT vec_id, sub, cid AS code FROM (
          SELECT vec_id, sub, cid,
            row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, cid) AS rn
          FROM d1) WHERE rn = 1
      ), qd AS (
        SELECT c.vec_id AS neighbor_id, q.vec_id AS query_id, c.sub, d1.d
        FROM codes c
        CROSS JOIN (SELECT vec_id FROM v WHERE vec_id < 30) q
        JOIN d1 ON d1.vec_id = q.vec_id AND d1.sub = c.sub AND d1.cid = c.code
        WHERE c.vec_id <> q.vec_id
      ), adc AS (
        SELECT query_id, neighbor_id,
          list_reduce(list_prepend(CAST(0 AS DOUBLE), list(d ORDER BY sub)),
            (a,b) -> a+b) AS adc
        FROM qd GROUP BY 1, 2
      ), ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc, neighbor_id) AS rnk
        FROM adc
      )
      SELECT query_id, rnk, neighbor_id, adc FROM ranked WHERE rnk <= 3"""))

  /** SQ8-at-rest search, end to end (VERDICT r8 stretch #7): the corpus
    * is stored as int8 codes ([[graft.operators.ScalarQuant.encodeExpr]]
    * — 4× smaller at rest), the scan DECODES midpoints back
    * ([[graft.operators.ScalarQuant.decodeExpr]], spec-only until this
    * gate), the decoded vectors drive an approximate-cosine shortlist of
    * 8, and only those 8 get the exact-cosine re-rank to top-3 over raw
    * vectors — the storage-hierarchy read path (SQ8 at rest below the
    * PQ index, q70/q74) where raw floats are fetched for the final
    * handful only. Encode/decode are exact IEEE affine maps against two
    * dims-length literal arrays (q72's arithmetic), both cosines ordered
    * folds, so DuckDB reproduces the two-stage cut bit-for-bit. At
    * 100 TB the brute shortlist stage would sit behind IVF probing
    * (q67); the gate scores the full corpus only because it is
    * gate-sized.
    */
  val q75 = QueryDef(
    "q75_sq8_decoded_search",
    (s, dir) => {
      import s.implicits._
      import graft.functions.{VectorFunctions => V}
      import graft.operators.ScalarQuant
      val v = Tables.load(s, dir, "embeddings")
        .select($"vec_id", V.asDouble($"embedding").as("e"))
      val (lo, step) = ScalarQuant.ranges(v, "e")
      // at-rest form: codes only; the scan decodes midpoints back
      val dec = v.select($"vec_id", $"e",
        ScalarQuant.decodeExpr(
          ScalarQuant.encodeExpr($"e", lo, step), lo, step).as("de"))
        .withColumn("nrm", V.norm($"e"))
        .withColumn("dn", V.norm($"de"))
      val queries = v.filter($"vec_id" < 30)
        .select($"vec_id".as("query_id"), $"e".as("qe"))
        .withColumn("qn", V.norm($"qe"))
      val scored = dec.withColumn("__k", pmod(xxhash64($"vec_id"), lit(1L)))
        .join(broadcast(queries.withColumn("__k", pmod(xxhash64($"query_id"), lit(1L)))), "__k")
        .filter($"vec_id" =!= $"query_id")
        .select($"query_id", $"vec_id".as("neighbor_id"), $"e", $"nrm", $"qe", $"qn",
          V.cosine($"qe", $"de", $"qn", $"dn").as("acos"))
      val w8 = org.apache.spark.sql.expressions.Window
        .partitionBy($"query_id").orderBy($"acos".desc, $"neighbor_id")
      val w3 = org.apache.spark.sql.expressions.Window
        .partitionBy($"query_id").orderBy($"cosine".desc, $"neighbor_id")
      scored.withColumn("__r", row_number().over(w8)).filter($"__r" <= 8)
        .select($"query_id", $"neighbor_id",
          V.cosine($"qe", $"e", $"qn", $"nrm").as("cosine"))
        .withColumn("rnk", row_number().over(w3))
        .filter($"rnk" <= 3)
        .select($"query_id", $"rnk", $"neighbor_id", $"cosine")
    },
    Some("""
      WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings
      ), px AS (
        SELECT i.i AS pos, v.e[i.i] AS x
        FROM v CROSS JOIN (SELECT unnest(generate_series(1,64)) AS i) i
      ), st AS (
        SELECT pos, min(x) AS lo, (max(x) - min(x)) / 256.0 AS step
        FROM px GROUP BY pos
      ), arrs AS (
        SELECT list(lo ORDER BY pos) AS lo, list(step ORDER BY pos) AS step FROM st
      ), dec AS (
        SELECT v.vec_id, v.e,
          list_transform(generate_series(1,64), i ->
            a.lo[i] + (CAST(
              CASE WHEN a.step[i] = 0 THEN 0
                   ELSE LEAST(255, CAST(floor((v.e[i] - a.lo[i]) / a.step[i]) AS BIGINT))
              END AS DOUBLE) + 0.5) * a.step[i]) AS de
        FROM v CROSS JOIN arrs a
      ), n AS (
        SELECT vec_id, e, de,
          sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(e, x -> x*x)), (a,b) -> a+b)) AS nrm,
          sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(de, x -> x*x)), (a,b) -> a+b)) AS dn
        FROM dec
      ), scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,64), i -> q.e[i]*c.de[i])), (a,b) -> a+b)
            / (q.nrm * c.dn) AS acos
        FROM n q JOIN n c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < 30
      ), shortlist AS (
        SELECT query_id, neighbor_id FROM (
          SELECT query_id, neighbor_id,
            row_number() OVER (PARTITION BY query_id ORDER BY acos DESC, neighbor_id) AS rn
          FROM scored) WHERE rn <= 8
      ), exact AS (
        SELECT s.query_id, s.neighbor_id,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,64), i -> q.e[i]*c.e[i])), (a,b) -> a+b)
            / (q.nrm * c.nrm) AS cosine
        FROM shortlist s
        JOIN n q ON q.vec_id = s.query_id
        JOIN n c ON c.vec_id = s.neighbor_id
      ), ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
        FROM exact
      )
      SELECT query_id, rnk, neighbor_id, cosine FROM ranked WHERE rnk <= 3"""))

  /** The FULLY-TRAINED residual IVF-PQ build — the round-9 capstone
    * composition: q73's canonical FAISS-style search with every trained
    * component substituted in. Coarse quantizer = one Lloyd iteration of
    * k-means over the corpus (q69's book, fixed-point means); PQ books =
    * [[graft.operators.PqIndex.trainBooks]] over the RESIDUALS
    * `v − centroid(cell)` (q74's move applied where the FAISS design
    * wants it — the PQ book models what the coarse quantizer leaves
    * behind); search = probe 2 trained cells, per-(query, cell) residual
    * ADC tables, top-8 pre-rank from codes alone, exact-cosine re-rank
    * to top-3. Seed-book gates (q70/q71/q73) pin the kernels in
    * isolation; this gate pins the production BUILD: train coarse →
    * residuals → train PQ on residuals → encode → probe → ADC → re-rank,
    * all bit-reproduced by DuckDB because every mean is fixed-point and
    * every fold ordered. Both books are localCheckpoint'ed; the residual
    * frame is persisted (the q67 managed-persist convention — it feeds
    * training, encode, and the candidate join).
    */
  /** The q76 pipeline with its cost/quality knobs exposed: `nprobe`
    * trained coarse cells probed (capped at the book's 4 cells),
    * ADC pre-rank shortlist of `shortlistK`, exact re-rank to `topK`.
    * The gate pins (2, 8, 3); RecallSpec sweeps nprobe to pin the
    * knob's recall-vs-cost curve the way FANIN pins candidate mass.
    */
  private[graft] def trainedIvfPq(s: org.apache.spark.sql.SparkSession, dir: String,
      nprobe: Int, shortlistK: Int, topK: Int): org.apache.spark.sql.DataFrame = {
      import s.implicits._
      import graft.functions.{VectorFunctions => V}
      import graft.operators.{BookCache, IvfIndex, KMeansCodebook, PqIndex}
      val m = 4; val dims = 64
      val v = Tables.load(s, dir, "embeddings")
        .withColumn("e", V.asDouble($"embedding"))
        .withColumn("nrm", V.norm($"e"))
        .select($"vec_id", $"e", $"nrm")
      // same coarse book (and key) as q69/q77 — the extra nrm column does
      // not enter training, so the trained values are identical
      val coarse = BookCache(v, s"$dir#coarse:init=lowestIds,k=4,iters=1") {
        KMeansCodebook.train(v.select($"vec_id", $"e"),
          KMeansCodebook.initLowestIds(v, "e", "vec_id", k = 4),
          "e", "vec_id", iters = 1).localCheckpoint(true)
      }
      val res = IvfIndex.assign(v, coarse, embCol = "e", idCol = "vec_id")
        .join(broadcast(coarse), $"cell" === $"cid")
        .select($"vec_id", $"cell", $"e", $"nrm",
          zip_with($"e", $"ce", (x, y) => x - y).as("r"))
        .persist()
      val pqBooks = BookCache(v,
        s"$dir#pqResidual(coarse=lowestIds,k=4,iters=1):dims=64,m=4,k=4,iters=1") {
        PqIndex.trainBooks(res.select($"vec_id", $"r"),
          dims, m, k = 4, "r", "vec_id", iters = 1).localCheckpoint(true)
      }
      val corpus = res
        .join(PqIndex.encode(res.select($"vec_id", $"r"), pqBooks, dims, m, "r", "vec_id"),
          Seq("vec_id"))
        .select($"vec_id", $"cell", $"e", $"nrm", $"codes")
      val q2 = v.filter($"vec_id" < 30)
        .select($"vec_id".as("query_id"), $"e".as("qe"), $"nrm".as("qn"))
      val probes = IvfIndex.probeCells(q2, coarse, embCol = "qe", idCol = "query_id",
        nprobe = nprobe)
        .join(broadcast(coarse), $"cell" === $"cid")
        .select($"query_id", $"cell",
          zip_with($"qe", $"ce", (x, y) => x - y).as("qr"))
      val tables = PqIndex.adcTables(
        probes.select(($"query_id" * 4 + $"cell").as("qk"), $"qr".as("e")),
        pqBooks, dims, m, embCol = "e", idCol = "qk")
        .groupBy($"qk", $"sub")
        .agg(transform(array_sort(collect_list(struct($"cid", $"d"))),
          x => x.getField("d")).as("t"))
        .groupBy($"qk")
        .agg(transform(array_sort(collect_list(struct($"sub", $"t"))),
          x => x.getField("t")).as("table"))
      val wAdc = org.apache.spark.sql.expressions.Window
        .partitionBy($"query_id").orderBy($"adc".asc_nulls_last, $"neighbor_id")
      val shortlist = corpus.join(probes.select($"query_id", $"cell"), Seq("cell"))
        .filter($"vec_id" =!= $"query_id")
        .withColumn("qk", $"query_id" * 4 + $"cell")
        .join(broadcast(tables), Seq("qk"))
        .select($"query_id", $"vec_id".as("neighbor_id"), $"e", $"nrm",
          PqIndex.adcScore($"table", $"codes").as("adc"))
        .withColumn("__r", row_number().over(wAdc))
        .filter($"__r" <= shortlistK)
      val wCos = org.apache.spark.sql.expressions.Window
        .partitionBy($"query_id").orderBy($"cosine".desc, $"neighbor_id")
      shortlist
        .join(q2, Seq("query_id"))
        .select($"query_id", $"neighbor_id",
          V.cosine($"qe", $"e", $"qn", $"nrm").as("cosine"))
        .withColumn("rnk", row_number().over(wCos))
        .filter($"rnk" <= topK)
        .select($"query_id", $"rnk", $"neighbor_id", $"cosine")
  }

  val q76 = QueryDef(
    "q76_ivfpq_trained_full",
    (s, dir) => trainedIvfPq(s, dir, nprobe = 2, shortlistK = 8, topK = 3),
    Some("""
      WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings
      ), n AS (
        SELECT vec_id, e, sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list_transform(e, x -> x*x)), (a,b) -> a+b)) AS nrm FROM v
      ), seeds AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, e AS ce
        FROM v ORDER BY vec_id LIMIT 4
      ), d1 AS (
        SELECT v.vec_id, s.cid,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,64), i -> (v.e[i]-s.ce[i])*(v.e[i]-s.ce[i]))),
            (a,b) -> a+b) AS d
        FROM v CROSS JOIN seeds s
      ), a1 AS (
        SELECT vec_id, cid AS cell FROM (
          SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
          FROM d1) WHERE rn = 1
      ), px1 AS (
        SELECT a1.cell, i.i AS pos,
          CAST(floor(v.e[i.i] * 1073741824.0) AS HUGEINT) AS q
        FROM a1 JOIN v USING (vec_id)
        CROSS JOIN (SELECT unnest(generate_series(1,64)) AS i) i
      ), c1 AS (
        SELECT cell, pos, (CAST(SUM(q) AS DOUBLE) / 1073741824.0) / COUNT(*) AS val
        FROM px1 GROUP BY 1, 2
      ), coarse AS (
        SELECT cell AS cid, list(val ORDER BY pos) AS ce FROM c1 GROUP BY cell
      ), dc AS (
        SELECT v.vec_id, c.cid,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,64), i -> (v.e[i]-c.ce[i])*(v.e[i]-c.ce[i]))),
            (a,b) -> a+b) AS d
        FROM v CROSS JOIN coarse c
      ), ac AS (
        SELECT vec_id, cid AS cell FROM (
          SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
          FROM dc) WHERE rn = 1
      ), res AS (
        SELECT v.vec_id, ac.cell,
          list_transform(generate_series(1,64), i -> v.e[i] - c.ce[i]) AS r
        FROM v JOIN ac USING (vec_id) JOIN coarse c ON c.cid = ac.cell
      ), subs AS (
        SELECT unnest(generate_series(0, 3)) AS sub
      ), sv AS (
        SELECT res.vec_id, s.sub,
          list_transform(generate_series(1,16), i -> res.r[s.sub*16+i]) AS se
        FROM res CROSS JOIN subs s
      ), pseeds AS (
        SELECT sub, rn - 1 AS cid, se AS ce FROM (
          SELECT sub, se, row_number() OVER (PARTITION BY sub ORDER BY vec_id) AS rn
          FROM sv) WHERE rn <= 4
      ), pd0 AS (
        SELECT sv.vec_id, sv.sub, p.cid,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,16), i -> (sv.se[i]-p.ce[i])*(sv.se[i]-p.ce[i]))),
            (a,b) -> a+b) AS d
        FROM sv JOIN pseeds p USING (sub)
      ), pa0 AS (
        SELECT vec_id, sub, cid AS cell FROM (
          SELECT vec_id, sub, cid,
            row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, cid) AS rn
          FROM pd0) WHERE rn = 1
      ), ppx AS (
        SELECT pa0.sub, pa0.cell, i.i AS pos,
          CAST(floor(sv.se[i.i] * 1073741824.0) AS HUGEINT) AS q
        FROM pa0 JOIN sv USING (vec_id, sub)
        CROSS JOIN (SELECT unnest(generate_series(1,16)) AS i) i
      ), pc1 AS (
        SELECT sub, cell, pos, (CAST(SUM(q) AS DOUBLE) / 1073741824.0) / COUNT(*) AS val
        FROM ppx GROUP BY 1, 2, 3
      ), pbooks AS (
        SELECT sub, cell AS cid, list(val ORDER BY pos) AS ce FROM pc1 GROUP BY sub, cell
      ), pd1 AS (
        SELECT sv.vec_id, sv.sub, b.cid,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,16), i -> (sv.se[i]-b.ce[i])*(sv.se[i]-b.ce[i]))),
            (a,b) -> a+b) AS d
        FROM sv JOIN pbooks b USING (sub)
      ), codes AS (
        SELECT vec_id, sub, cid AS code FROM (
          SELECT vec_id, sub, cid,
            row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, cid) AS rn
          FROM pd1) WHERE rn = 1
      ), p1 AS (
        SELECT vec_id AS query_id, cid AS cell FROM (
          SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
          FROM dc WHERE vec_id < 30) WHERE rn <= 2
      ), qres AS (
        SELECT p1.query_id, p1.cell,
          list_transform(generate_series(1,64), i -> v.e[i] - c.ce[i]) AS qr
        FROM p1 JOIN v ON v.vec_id = p1.query_id JOIN coarse c ON c.cid = p1.cell
      ), qsv AS (
        SELECT q.query_id, q.cell, s.sub,
          list_transform(generate_series(1,16), i -> q.qr[s.sub*16+i]) AS se
        FROM qres q CROSS JOIN subs s
      ), qtab AS (
        SELECT q.query_id, q.cell, b.sub, b.cid,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,16), i -> (q.se[i]-b.ce[i])*(q.se[i]-b.ce[i]))),
            (a,b) -> a+b) AS d
        FROM qsv q JOIN pbooks b USING (sub)
      ), cand AS (
        SELECT p.query_id, p.cell, r.vec_id AS neighbor_id
        FROM p1 p JOIN res r ON r.cell = p.cell AND r.vec_id <> p.query_id
      ), adc AS (
        SELECT ca.query_id, ca.neighbor_id,
          list_reduce(list_prepend(CAST(0 AS DOUBLE), list(qt.d ORDER BY cd.sub)),
            (a,b) -> a+b) AS adc
        FROM cand ca
        JOIN codes cd ON cd.vec_id = ca.neighbor_id
        JOIN qtab qt ON qt.query_id = ca.query_id AND qt.cell = ca.cell
                    AND qt.sub = cd.sub AND qt.cid = cd.code
        GROUP BY 1, 2
      ), shortlist AS (
        SELECT query_id, neighbor_id FROM (
          SELECT query_id, neighbor_id,
            row_number() OVER (PARTITION BY query_id ORDER BY adc, neighbor_id) AS rn
          FROM adc) WHERE rn <= 8
      ), exact AS (
        SELECT s.query_id, s.neighbor_id,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,64), i -> q.e[i]*c.e[i])), (a,b) -> a+b)
            / (q.nrm * c.nrm) AS cosine
        FROM shortlist s
        JOIN n q ON q.vec_id = s.query_id
        JOIN n c ON c.vec_id = s.neighbor_id
      ), ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
        FROM exact
      )
      SELECT query_id, rnk, neighbor_id, cosine FROM ranked WHERE rnk <= 3"""))

  /** End-to-end ANN search through the TRAINED two-level index — q67's
    * search with q69's books substituted in (the q74/q76 move applied to
    * the residual-IVF path, closing the last seed-book search gate):
    * coarse = one Lloyd iteration over the corpus, fine = one Lloyd
    * iteration over the residuals against the trained coarse book, the
    * corpus two-level-assigned, each query probing 2×2 trained cells,
    * candidates meeting the corpus on the flat cell id, exact-cosine
    * re-rank to top-3. Both books localCheckpoint'ed (training pipelines
    * must not re-execute per guard/broadcast); the assigned corpus is
    * persisted (q67's managed-persist convention). Fixed-point means +
    * ordered folds → DuckDB reproduces build AND search bit-for-bit.
    */
  val q77 = QueryDef(
    "q77_ann_trained_hier_search",
    (s, dir) => {
      import s.implicits._
      import graft.functions.{VectorFunctions => V}
      import graft.operators.{BookCache, IvfIndex, KMeansCodebook}
      val v = Tables.load(s, dir, "embeddings")
        .withColumn("e", V.asDouble($"embedding"))
        .withColumn("nrm", V.norm($"e"))
        .select($"vec_id", $"e", $"nrm")
      // identical training to q69's two books — shared via BookCache
      val coarse = BookCache(v, s"$dir#coarse:init=lowestIds,k=4,iters=1") {
        KMeansCodebook.train(v.select($"vec_id", $"e"),
          KMeansCodebook.initLowestIds(v, "e", "vec_id", k = 4),
          "e", "vec_id", iters = 1).localCheckpoint(true)
      }
      val fine = BookCache(v,
        s"$dir#fineResidual(coarse=lowestIds,k=4,iters=1):init=lowestIds,k=4,iters=1") {
        val resid = IvfIndex.assign(v.select($"vec_id", $"e"), coarse,
            embCol = "e", idCol = "vec_id")
          .join(broadcast(coarse), $"cell" === $"cid")
          .select($"vec_id", zip_with($"e", $"ce", (x, y) => x - y).as("r"))
        KMeansCodebook.train(resid,
          KMeansCodebook.initLowestIds(resid, "r", "vec_id", k = 4),
          "r", "vec_id", iters = 1).localCheckpoint(true)
      }
      val assigned = IvfIndex
        .assignHierarchical(v, coarse, fine, embCol = "e", idCol = "vec_id")
        .select($"vec_id", $"cell", $"e", $"nrm")
        .persist()
      val probes = IvfIndex.probeCellsHierarchical(
        v.filter($"vec_id" < 30)
          .select($"vec_id".as("query_id"), $"e".as("qe"), $"nrm".as("qn")),
        coarse, fine, embCol = "qe", idCol = "query_id",
        nprobeCoarse = 2, nprobeFine = 2)
        .select($"query_id", $"cell", $"qe", $"qn")
      val scored = assigned.join(probes, Seq("cell"))
        .filter($"vec_id" =!= $"query_id")
        .select($"query_id", $"vec_id".as("neighbor_id"),
          V.cosine($"qe", $"e", $"qn", $"nrm").as("cosine"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"query_id").orderBy($"cosine".desc, $"neighbor_id")
      scored.withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 3)
        .select($"query_id", $"rnk", $"neighbor_id", $"cosine")
    },
    Some("""
      WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings
      ), n AS (
        SELECT vec_id, e, sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list_transform(e, x -> x*x)), (a,b) -> a+b)) AS nrm FROM v
      ), seeds AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, e AS ce
        FROM v ORDER BY vec_id LIMIT 4
      ), d1 AS (
        SELECT v.vec_id, s.cid,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,64), i -> (v.e[i]-s.ce[i])*(v.e[i]-s.ce[i]))),
            (a,b) -> a+b) AS d
        FROM v CROSS JOIN seeds s
      ), a1 AS (
        SELECT vec_id, cid AS cell FROM (
          SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
          FROM d1) WHERE rn = 1
      ), px1 AS (
        SELECT a1.cell, i.i AS pos,
          CAST(floor(v.e[i.i] * 1073741824.0) AS HUGEINT) AS q
        FROM a1 JOIN v USING (vec_id)
        CROSS JOIN (SELECT unnest(generate_series(1,64)) AS i) i
      ), c1 AS (
        SELECT cell, pos, (CAST(SUM(q) AS DOUBLE) / 1073741824.0) / COUNT(*) AS val
        FROM px1 GROUP BY 1, 2
      ), coarse AS (
        SELECT cell AS cid, list(val ORDER BY pos) AS ce FROM c1 GROUP BY cell
      ), dc AS (
        SELECT v.vec_id, c.cid,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,64), i -> (v.e[i]-c.ce[i])*(v.e[i]-c.ce[i]))),
            (a,b) -> a+b) AS d
        FROM v CROSS JOIN coarse c
      ), ac AS (
        SELECT vec_id, cid AS cell1 FROM (
          SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
          FROM dc) WHERE rn = 1
      ), res AS (
        SELECT v.vec_id, ac.cell1,
          list_transform(generate_series(1,64), i -> v.e[i] - c.ce[i]) AS r
        FROM v JOIN ac USING (vec_id) JOIN coarse c ON c.cid = ac.cell1
      ), fseeds AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, r AS ce
        FROM res ORDER BY vec_id LIMIT 4
      ), fd1 AS (
        SELECT res.vec_id, f.cid,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,64), i -> (res.r[i]-f.ce[i])*(res.r[i]-f.ce[i]))),
            (a,b) -> a+b) AS d
        FROM res CROSS JOIN fseeds f
      ), fa1 AS (
        SELECT vec_id, cid AS cell FROM (
          SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
          FROM fd1) WHERE rn = 1
      ), fpx AS (
        SELECT fa1.cell, i.i AS pos,
          CAST(floor(res.r[i.i] * 1073741824.0) AS HUGEINT) AS q
        FROM fa1 JOIN res USING (vec_id)
        CROSS JOIN (SELECT unnest(generate_series(1,64)) AS i) i
      ), fc1 AS (
        SELECT cell, pos, (CAST(SUM(q) AS DOUBLE) / 1073741824.0) / COUNT(*) AS val
        FROM fpx GROUP BY 1, 2
      ), fine AS (
        SELECT cell AS cid, list(val ORDER BY pos) AS ce FROM fc1 GROUP BY cell
      ), fd2 AS (
        SELECT res.vec_id, res.cell1, f.cid,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,64), i -> (res.r[i]-f.ce[i])*(res.r[i]-f.ce[i]))),
            (a,b) -> a+b) AS d
        FROM res CROSS JOIN fine f
      ), fa2 AS (
        SELECT vec_id, cell1, cid AS cell2 FROM (
          SELECT vec_id, cell1, cid,
            row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
          FROM fd2) WHERE rn = 1
      ), corpus AS (
        SELECT fa2.vec_id, fa2.cell1 * 4 + fa2.cell2 AS cell, n.e, n.nrm
        FROM fa2 JOIN n USING (vec_id)
      ), p1 AS (
        SELECT vec_id AS query_id, cid AS cell1 FROM (
          SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
          FROM dc WHERE vec_id < 30) WHERE rn <= 2
      ), qres AS (
        SELECT p1.query_id, p1.cell1,
          list_transform(generate_series(1,64), i -> v.e[i] - c.ce[i]) AS r
        FROM p1 JOIN v ON v.vec_id = p1.query_id JOIN coarse c ON c.cid = p1.cell1
      ), qd2 AS (
        SELECT qres.query_id, qres.cell1, f.cid,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,64), i -> (qres.r[i]-f.ce[i])*(qres.r[i]-f.ce[i]))),
            (a,b) -> a+b) AS d
        FROM qres CROSS JOIN fine f
      ), p2 AS (
        SELECT query_id, cell1 * 4 + cell2 AS cell FROM (
          SELECT query_id, cell1, cid AS cell2,
            row_number() OVER (PARTITION BY query_id, cell1 ORDER BY d, cid) AS rn
          FROM qd2) WHERE rn <= 2
      ), qv AS (
        SELECT p.query_id, p.cell, n.e, n.nrm
        FROM p2 p JOIN n ON n.vec_id = p.query_id
      ), scored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,64), i -> q.e[i]*c.e[i])), (a,b) -> a+b)
            / (q.nrm * c.nrm) AS cosine
        FROM qv q JOIN corpus c ON c.cell = q.cell AND c.vec_id <> q.query_id
      ), ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
        FROM scored
      )
      SELECT query_id, rnk, neighbor_id, cosine FROM ranked WHERE rnk <= 3"""))

  val all: Seq[QueryDef] =
    Seq(q65, q67, q68, q69, q70, q71, q72, q73, q74, q75, q76, q77)
}
