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

  val all: Seq[QueryDef] = Seq(q22, q23)
}
