package graft.queries

import org.apache.spark.sql.functions._
import graft.catalog.Tables
import graft.operators.{AsOfJoin, Media}

/** Operators beyond the reference's own surface (SURVEY §2.5 — the
  * reference delegates these to backend SQL; DuckDB's native support is
  * the oracle): as-of join and multimodal binary processing.
  */
object Extended {

  /** Backward as-of join: every error event matched with the user's
    * most recent click at-or-before it. One shuffle (union+window, see
    * AsOfJoin scaladoc) — DuckDB's native ASOF JOIN verifies the
    * semantics. Right side deduped per (user, ts) so ties are
    * deterministic in both engines.
    */
  val q22 = QueryDef(
    "q22_asof_join",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
      val errors = ev.filter($"event_type" === "error")
        .select($"user_id", $"event_id", $"ts")
      val clicks = ev.filter($"event_type" === "click")
        .groupBy($"user_id", $"ts")
        .agg(max($"value").as("click_value"))
      AsOfJoin.backward(errors, clicks,
        tsCol = "ts", keys = Seq("user_id"), valueCols = Seq("click_value"))
        .select($"user_id", $"event_id",
          QueryDef.ntz($"ts").as("ts"),
          $"click_value".cast("double").as("click_value"))
    },
    Some("""
      WITH errors AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
        FROM events WHERE event_type = 'error'
      ), clicks AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MAX(value) AS click_value
        FROM events WHERE event_type = 'click' GROUP BY 1, 2
      )
      SELECT e.user_id, e.event_id, e.ts, c.click_value
      FROM errors e ASOF LEFT JOIN clicks c
        ON e.user_id = c.user_id AND e.ts >= c.ts"""))

  /** Forward as-of join: every error matched with the user's NEXT click
    * at-or-after it — the "what did the user do after the error" shape.
    * Same one-shuffle union+window plan as q22, mirrored; DuckDB's ASOF
    * with the `<=` inequality is the oracle.
    */
  val q47 = QueryDef(
    "q47_asof_forward",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
      val errors = ev.filter($"event_type" === "error")
        .select($"user_id", $"event_id", $"ts")
      val clicks = ev.filter($"event_type" === "click")
        .groupBy($"user_id", $"ts")
        .agg(max($"value").as("next_click_value"))
      AsOfJoin.forward(errors, clicks,
        tsCol = "ts", keys = Seq("user_id"), valueCols = Seq("next_click_value"))
        .select($"user_id", $"event_id",
          QueryDef.ntz($"ts").as("ts"),
          $"next_click_value".cast("double").as("next_click_value"))
    },
    Some("""
      WITH errors AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
        FROM events WHERE event_type = 'error'
      ), clicks AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MAX(value) AS next_click_value
        FROM events WHERE event_type = 'click' GROUP BY 1, 2
      )
      SELECT e.user_id, e.event_id, e.ts, c.next_click_value
      FROM errors e ASOF LEFT JOIN clicks c
        ON e.user_id = c.user_id AND e.ts <= c.ts"""))

  /** Bounded range join: every (error, click) pair with the click in
    * the hour before the error, per user. `AsOfJoin.rangeJoin` blocks by
    * a coarse time bucket (equi-join on (user, bucket) with a 2-bucket
    * explode on the left) + exact range filter — ONE shuffle with
    * bounded fan-out instead of a cartesian range condition. DuckDB's
    * plain inequality join is the oracle.
    */
  val q45 = QueryDef(
    "q45_range_join",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
      val errors = ev.filter($"event_type" === "error")
        .select($"user_id", $"event_id", $"ts")
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts", $"value")
      AsOfJoin.rangeJoin(errors, clicks,
        tsCol = "ts", keys = Seq("user_id"), beforeSeconds = 3600)
        .select($"user_id", $"event_id",
          QueryDef.ntz($"ts").as("ts"),
          QueryDef.ntz($"ts_r").as("click_ts"),
          $"value".cast("double").as("click_value"))
    },
    Some("""
      WITH errors AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
        FROM events WHERE event_type = 'error'
      ), clicks AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
        FROM events WHERE event_type = 'click'
      )
      SELECT e.user_id, e.event_id, e.ts, c.ts AS click_ts,
             CAST(c.value AS DOUBLE) AS click_value
      FROM errors e JOIN clicks c
        ON e.user_id = c.user_id
       AND c.ts <= e.ts AND c.ts >= e.ts - INTERVAL 1 HOUR"""))

  /** Multimodal batch feature extraction: documents wrapped as binary
    * payloads, decoded per partition through the pluggable decoder
    * (byte-stats stand-in here — real codecs drop into the same
    * mapPartitions slot). Checks the full plumbing: binary encode,
    * Dataset round-trip, per-partition batch decode, byte-accurate
    * checksums.
    */
  val q23 = QueryDef(
    "q23_multimodal_features",
    (s, dir) => {
      import s.implicits._
      val media = Media.documentsAsMedia(Tables.load(s, dir, "documents"))
        .as[Media.MediaRecord]
      Media.process(media)
        .toDF()
        .select($"media_id", $"media_type", $"n_bytes", $"checksum", $"head")
    },
    Some("""
      SELECT doc_id AS media_id, 'text/plain' AS media_type,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             md5(text) AS checksum,
             substr(text, 1, 16) AS head
      FROM documents"""))

  /** Embedding-cosine near-dup pairs — the vector-space sibling of q15,
    * via [[graft.operators.CosineNearDup]]: sign-LSH buckets + hot-bucket
    * capping block the candidate set (same-(bucket, sub) only, never
    * all-pairs), then the exact cosine filters at the threshold. The gate
    * pins `planes = 4` — the oracle's fixture config, at which every
    * bucket is under the 500-row cap so the capped path is bit-identical
    * to the uncapped one; production passes
    * `CosineNearDup.scaledPlanes(n)` so the plane count grows with the
    * corpus (FANIN.md findings 2/5: planes=4 at 100× ⇒ 1.76B candidate
    * pairs; scaled planes + cap ⇒ tens of millions). The 0.3 threshold
    * matches this synthetic corpus's similarity scale (real near-dup
    * corpora use ~0.9 with the identical plan).
    */
  val q24 = QueryDef(
    "q24_embedding_neardup",
    (s, dir) => {
      import s.implicits._
      graft.operators.CosineNearDup.pairs(
        Tables.load(s, dir, "embeddings"),
        idCol = "vec_id", embCol = "embedding", dim = 64,
        threshold = 0.3, planes = 4)
        .select($"id_a".as("vec_a"), $"id_b".as("vec_b"), $"cosine")
    },
    Some("""
      WITH planes AS (
        SELECT j, list_transform(generate_series(0,63),
          d -> (CAST('0x' || substr(md5(j || ',' || d),1,8) AS BIGINT) % 2001 - 1000)/1000.0) AS w
        FROM (SELECT unnest(generate_series(0,3)) AS j)
      ), v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings
      ), n AS (
        SELECT vec_id, e, sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list_transform(e, x -> x*x)), (a,b) -> a+b)) AS nrm FROM v
      ), dots AS (
        SELECT n.vec_id, p.j, list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list_transform(generate_series(1,64), i -> p.w[i]*n.e[i])), (a,b) -> a+b) AS dot
        FROM n CROSS JOIN planes p
      ), buck AS (
        SELECT vec_id, CAST(SUM(CASE WHEN dot > 0
          THEN CAST(round(2**j) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
        FROM dots GROUP BY 1
      ), bn AS (SELECT n.*, b.bucket FROM n JOIN buck b USING (vec_id)),
      pairs AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,64), i -> a.e[i]*b.e[i])), (x,y) -> x+y)
            / (a.nrm * b.nrm) AS cosine
        FROM bn a JOIN bn b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      )
      SELECT vec_a, vec_b, cosine FROM pairs WHERE cosine >= 0.3"""))

  /** IVF-style ANN — the coarse-quantizer sibling of q17's sign-LSH:
    * vectors are assigned to the nearest of C centroids (deterministic
    * "codebook": the first C vectors; production swaps in k-means
    * centroids, the plan is identical), and search touches only the
    * query's cell. The codebook is DATA — a broadcast centroid table
    * joined per vector ([[graft.operators.IvfIndex]]), so the plan is
    * O(1) in C and survives production codebooks (C=4096–65536) where
    * inlined literal expressions would blow the codegen limits. Cell
    * assignment is argmin of exact squared-L2 (strict left folds), so
    * DuckDB reproduces every assignment.
    */
  val q40 = QueryDef(
    "q40_ann_ivf",
    (s, dir) => {
      import s.implicits._
      import graft.functions.{VectorFunctions => V}
      val v = Tables.load(s, dir, "embeddings")
        .withColumn("e", V.asDouble($"embedding"))
        .withColumn("nrm", V.norm($"e"))
        .select($"vec_id", $"e", $"nrm")
      val cents = v.filter($"vec_id" < 8)
        .select($"vec_id".cast("long").as("cid"), $"e".as("ce"))
      val assigned = graft.operators.IvfIndex
        .assign(v, cents, embCol = "e", idCol = "vec_id")
        .persist()
      val queries = assigned.filter($"vec_id" < 30)
        .select($"vec_id".as("query_id"), $"e".as("qe"), $"nrm".as("qn"), $"cell")
      val scored = assigned.join(queries, Seq("cell"))
        .filter($"vec_id" =!= $"query_id")
        .select($"query_id", $"cell", $"vec_id".as("neighbor_id"),
          V.cosine($"qe", $"e", $"qn", $"nrm").as("cosine"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"query_id").orderBy($"cosine".desc, $"neighbor_id")
      scored.withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 3)
        .select($"query_id", $"cell", $"rnk", $"neighbor_id", $"cosine")
    },
    Some("""
      WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings
      ), n AS (
        SELECT vec_id, e, sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list_transform(e, x -> x*x)), (a,b) -> a+b)) AS nrm FROM v
      ), cents AS (
        SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < 8
      ), dists AS (
        SELECT n.vec_id, c.cid,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,64), i -> (n.e[i]-c.ce[i])*(n.e[i]-c.ce[i]))),
            (a,b) -> a+b) AS d
        FROM n CROSS JOIN cents c
      ), assigned AS (
        SELECT vec_id, cid AS cell FROM (
          SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
          FROM dists) WHERE rn = 1
      ), an AS (
        SELECT n.*, a.cell FROM n JOIN assigned a USING (vec_id)
      ), scored AS (
        SELECT q.vec_id AS query_id, q.cell, c.vec_id AS neighbor_id,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,64), i -> q.e[i]*c.e[i])), (a,b) -> a+b)
            / (q.nrm * c.nrm) AS cosine
        FROM an q JOIN an c ON q.cell = c.cell AND c.vec_id <> q.vec_id
        WHERE q.vec_id < 30
      ), ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
        FROM scored
      )
      SELECT query_id, cell, rnk, neighbor_id, cosine FROM ranked WHERE rnk <= 3"""))

  /** IVF multi-probe ANN — q40 with the recall knob production IVF
    * actually turns: each query searches its NPROBE (here 2) nearest
    * cells instead of only the argmin cell, recovering neighbors that
    * landed just across a Voronoi boundary. Cost scales on the QUERY
    * side only (nprobe × query-cell fan-in — FANIN.md finding 3: the
    * query side is insensitive to hot buckets), while the corpus keeps
    * its single-cell assignment, so the same plan runs at 100 TB with
    * nprobe tuned against recall on a held-out set. The codebook is a
    * broadcast table ([[graft.operators.IvfIndex]], plan O(1) in C) and
    * cell ranking is a per-query window (partitioned — never global).
    */
  val q50 = QueryDef(
    "q50_ann_ivf_nprobe",
    (s, dir) => {
      import s.implicits._
      import graft.functions.{VectorFunctions => V}
      import graft.operators.IvfIndex
      val v = Tables.load(s, dir, "embeddings")
        .withColumn("e", V.asDouble($"embedding"))
        .withColumn("nrm", V.norm($"e"))
        .select($"vec_id", $"e", $"nrm")
      val cents = v.filter($"vec_id" < 8)
        .select($"vec_id".cast("long").as("cid"), $"e".as("ce"))
      val assigned = IvfIndex.assign(v, cents, embCol = "e", idCol = "vec_id")
        .persist()
      // queries probe their 2 nearest cells (per-query ranking window)
      val probes = IvfIndex.probeCells(
        v.filter($"vec_id" < 30)
          .select($"vec_id".as("query_id"), $"e".as("qe"), $"nrm".as("qn")),
        cents, embCol = "qe", idCol = "query_id", nprobe = 2)
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
      ), cents AS (
        SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < 8
      ), dists AS (
        SELECT n.vec_id, c.cid,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,64), i -> (n.e[i]-c.ce[i])*(n.e[i]-c.ce[i]))),
            (a,b) -> a+b) AS d
        FROM n CROSS JOIN cents c
      ), assigned AS (
        SELECT vec_id, cid AS cell FROM (
          SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
          FROM dists) WHERE rn = 1
      ), an AS (
        SELECT n.*, a.cell FROM n JOIN assigned a USING (vec_id)
      ), probes AS (
        SELECT vec_id AS query_id, cid AS cell FROM (
          SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
          FROM dists WHERE vec_id < 30) WHERE rn <= 2
      ), qv AS (
        SELECT p.query_id, p.cell, n.e, n.nrm
        FROM probes p JOIN n ON n.vec_id = p.query_id
      ), scored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,64), i -> q.e[i]*c.e[i])), (a,b) -> a+b)
            / (q.nrm * c.nrm) AS cosine
        FROM qv q JOIN an c ON c.cell = q.cell AND c.vec_id <> q.query_id
      ), ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
        FROM scored
      )
      SELECT query_id, rnk, neighbor_id, cosine FROM ranked WHERE rnk <= 3"""))

  /** Multimodal segment sampling, oracle-gated — q23's sibling for the
    * byte-level frame-sampling plumbing ([[Media.sampleSegments]]):
    * every `stride` bytes of the payload yields a `width`-byte sample,
    * capped at `maxSamples` per item — the partition shape of video
    * frame extraction with the decode swapped for raw slicing (the
    * sandbox has no codecs; the slicing, offsets, and batch shape are
    * the real thing). Segments compare as hex so the gate hashes
    * deterministically across engines.
    */
  val q51 = QueryDef(
    "q51_media_segments",
    (s, dir) => {
      import s.implicits._
      val media = Media.documentsAsMedia(Tables.load(s, dir, "documents"))
      Media.sampleSegments(media, width = 16, stride = 64, maxSamples = 4)
        .select($"media_id", $"offset".cast("long").as("seg_no"),
          upper(hex($"segment")).as("seg_hex"))
    },
    Some("""
      WITH m AS (
        SELECT doc_id AS media_id, encode(text) AS payload FROM documents
      ), o AS (
        SELECT media_id, payload,
          unnest(generate_series(1,
            LEAST(GREATEST(CAST(octet_length(payload) // 64 AS INT), 1), 4))) AS seg_no
        FROM m
      )
      SELECT media_id, CAST(seg_no AS BIGINT) AS seg_no,
             -- this DuckDB has no BLOB substring; slice the hex image
             -- instead (2 hex chars per byte, same trailing semantics)
             upper(substring(hex(payload), CAST((seg_no-1)*64*2 + 1 AS INT), 32)) AS seg_hex
      FROM o"""))

  /** Vector near-dup collapse by leader clustering — the embedding-side
    * answer to FANIN.md finding 4 (the pair LIST is quadratic when real
    * dup clusters are giant; q43 is the text-side answer): each sign-LSH
    * bucket elects a leader (min vec_id), and every vector joins the
    * leader's cluster iff its cosine to the LEADER clears the
    * threshold — exactly ONE cosine per vector, one aggregation + one
    * equi-join on the bucket, zero pair enumeration. The leader table
    * has one row per bucket, but under production plane counts
    * (`CosineNearDup.scaledPlanes`: buckets ≈ n/1000) that is ~0.1% of
    * the corpus WITH full embeddings attached — tens of GB at 100 TB —
    * so no broadcast hint: AQE broadcasts when the build side is
    * actually small and shuffles the equi-join otherwise (the same fix
    * as `Skew.capBuckets`' over-cap-only broadcast). The recall trade vs
    * full connected components (members similar to each other but not to
    * the leader split off) is the standard leader-clustering contract.
    */
  val q52 = QueryDef(
    "q52_vector_leader_clusters",
    (s, dir) => {
      import s.implicits._
      import graft.functions.{VectorFunctions => V}
      val v = Tables.load(s, dir, "embeddings")
        .withColumn("e", V.asDouble($"embedding"))
        .withColumn("nrm", V.norm($"e"))
        .withColumn("bucket", V.hyperplaneBucket($"e", 4, 64))
        .select($"vec_id", $"e", $"nrm", $"bucket")
        .persist()
      val leaders = v.groupBy($"bucket").agg(min($"vec_id").as("leader_id"))
        .join(v.select($"vec_id".as("leader_id"), $"e".as("le"), $"nrm".as("lnrm")),
          Seq("leader_id"))
      v.join(leaders, Seq("bucket"))
        .select($"vec_id",
          when(V.cosine($"e", $"le", $"nrm", $"lnrm") >= 0.3, $"leader_id")
            .otherwise($"vec_id").as("cluster_id"))
    },
    Some("""
      WITH planes AS (
        SELECT j, list_transform(generate_series(0,63),
          d -> (CAST('0x' || substr(md5(j || ',' || d),1,8) AS BIGINT) % 2001 - 1000)/1000.0) AS w
        FROM (SELECT unnest(generate_series(0,3)) AS j)
      ), v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings
      ), n AS (
        SELECT vec_id, e, sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list_transform(e, x -> x*x)), (a,b) -> a+b)) AS nrm FROM v
      ), dots AS (
        SELECT n.vec_id, p.j, list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list_transform(generate_series(1,64), i -> p.w[i]*n.e[i])), (a,b) -> a+b) AS dot
        FROM n CROSS JOIN planes p
      ), buck AS (
        SELECT vec_id, CAST(SUM(CASE WHEN dot > 0
          THEN CAST(round(2**j) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
        FROM dots GROUP BY 1
      ), bn AS (SELECT n.*, b.bucket FROM n JOIN buck b USING (vec_id)),
      leaders AS (
        SELECT bucket, MIN(vec_id) AS leader_id FROM bn GROUP BY 1
      ), lw AS (
        SELECT l.bucket, l.leader_id, n.e AS le, n.nrm AS lnrm
        FROM leaders l JOIN n ON n.vec_id = l.leader_id
      )
      SELECT m.vec_id,
        CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1,64), i -> m.e[i]*lw.le[i])), (a,b) -> a+b)
            / (m.nrm * lw.lnrm) >= 0.3
          THEN lw.leader_id ELSE m.vec_id END AS cluster_id
      FROM bn m JOIN lw USING (bucket)"""))

  /** Snapshot diff — the CDC/table-reconciliation operator: two corpus
    * snapshots (here: deterministic key-range views of orders, with a
    * seeded modification band) compared BY KEY into added / removed /
    * changed rows. One full-outer equi-join on the key, change
    * detection by md5 over the canonicalized row payload — never a
    * row-by-row driver loop, and at 100 TB both sides shuffle once on
    * the key (or not at all when bucketed on it).
    */
  val q62 = QueryDef(
    "q62_snapshot_diff",
    (s, dir) => {
      import s.implicits._
      val orders = Tables.load(s, dir, "orders")
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice".cast("decimal(12,2)").as("p"))
      // snapshot A: keys < 6000; snapshot B: keys >= 2000, with the
      // 3000-3999 band "modified" (price doubled)
      val snapA = orders.filter($"o_orderkey" < 6000)
      val snapB = orders.filter($"o_orderkey" >= 2000)
        .withColumn("p", when($"o_orderkey".between(3000, 3999), ($"p" * 2).cast("decimal(12,2)"))
          .otherwise($"p"))
      def fp(c1: org.apache.spark.sql.Column, c2: org.apache.spark.sql.Column) =
        md5(concat_ws("|", c1, c2.cast("string")))
      val a = snapA.select($"o_orderkey", fp($"o_orderstatus", $"p").as("fp_a"))
      val b = snapB.select($"o_orderkey", fp($"o_orderstatus", $"p").as("fp_b"))
      a.join(b, Seq("o_orderkey"), "full_outer")
        .select($"o_orderkey",
          when($"fp_a".isNull, "added")
            .when($"fp_b".isNull, "removed")
            .when($"fp_a" =!= $"fp_b", "changed")
            .otherwise("unchanged").as("status"))
        .filter($"status" =!= "unchanged")
    },
    Some("""
      WITH o AS (
        SELECT o_orderkey, o_orderstatus, CAST(o_totalprice AS DECIMAL(12,2)) AS p
        FROM orders
      ), a AS (
        SELECT o_orderkey, md5(o_orderstatus || '|' || CAST(p AS VARCHAR)) AS fp_a
        FROM o WHERE o_orderkey < 6000
      ), b AS (
        SELECT o_orderkey,
          md5(o_orderstatus || '|' || CAST(
            CASE WHEN o_orderkey BETWEEN 3000 AND 3999
                 THEN CAST(p * 2 AS DECIMAL(12,2)) ELSE p END AS VARCHAR)) AS fp_b
        FROM o WHERE o_orderkey >= 2000
      )
      SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
        CASE WHEN a.fp_a IS NULL THEN 'added'
             WHEN b.fp_b IS NULL THEN 'removed'
             WHEN a.fp_a <> b.fp_b THEN 'changed'
             ELSE 'unchanged' END AS status
      FROM a FULL OUTER JOIN b USING (o_orderkey)
      WHERE (CASE WHEN a.fp_a IS NULL THEN 'added'
                  WHEN b.fp_b IS NULL THEN 'removed'
                  WHEN a.fp_a <> b.fp_b THEN 'changed'
                  ELSE 'unchanged' END) <> 'unchanged'"""))

  /** Media resize, oracle-gated — [[Media.resizeNearest]] over the
    * documents-as-media corpus: payloads with at least a full 16×16
    * byte frame are downsampled to 4×4 by nearest-neighbor sampling of
    * the raw grid. The oracle samples the identical positions from the
    * hex image of the payload (this DuckDB has no BLOB substring — 2
    * hex chars per byte). The decode that would hand a real pixel plane
    * to this operator is the disclosed codec slot; the sampling math,
    * byte plumbing, and distribution are the real thing.
    */
  val q63 = QueryDef(
    "q63_media_resize",
    (s, dir) => {
      import s.implicits._
      val media = Media.documentsAsMedia(Tables.load(s, dir, "documents"))
        .filter(length($"payload") >= 256)
      Media.resizeNearest(media, srcW = 16, srcH = 16, dstW = 4, dstH = 4)
        .select($"media_id", upper(hex($"resized")).as("resized_hex"))
    },
    Some("""
      WITH m AS (
        SELECT doc_id AS media_id, hex(encode(text)) AS hexp
        FROM documents WHERE octet_length(encode(text)) >= 256
      )
      SELECT media_id,
        upper(array_to_string(list_transform(generate_series(0, 15),
          i -> substring(hexp, 2*(((i // 4) * 4) * 16 + (i % 4) * 4) + 1, 2)), '')) AS resized_hex
      FROM m"""))

  /** q12's session numbering through the HOT-KEY bucketed path
    * ([[graft.functions.Skew.sessionizeBucketed]]) — the escape hatch
    * for the one-hot-user case where a plain per-user window serializes
    * a user's whole history into one task (VERDICT r5 item 6). The gate
    * emits the PER-EVENT numbering (not a per-user rollup), so the
    * DuckDB oracle — the plain global-window numbering — hash-proves
    * the bucketed plan's ids event for event. `bucketSpanSec` (3600) ≠
    * `gapSec` (1800) on purpose: the two knobs must not be conflated
    * for the boundary-merge algebra to be exercised.
    */
  val q64 = QueryDef(
    "q64_sessionize_bucketed",
    (s, dir) => {
      import s.implicits._
      graft.functions.Skew.sessionizeBucketed(
        Tables.load(s, dir, "events"), "user_id", "ts", "event_id",
        gapSec = 1800, bucketSpanSec = 3600)
        .select($"user_id", $"event_id", $"session_id")
    },
    Some("""
      WITH flagged AS (
        SELECT user_id, event_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                    OR date_diff('second', lag(ts) OVER w, ts) > 1800
                    THEN 1 ELSE 0 END AS new_session
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      )
      SELECT user_id, event_id,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM flagged"""))

  val all: Seq[QueryDef] =
    Seq(q22, q23, q24, q40, q45, q47, q50, q51, q52, q62, q63, q64)
}
