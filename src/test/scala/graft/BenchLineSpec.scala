package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver captures only the LAST 2000 characters of Bench stdout and
  * parses the final JSON line. r4 and r7 both lost the round's perf record
  * because the per-query line outgrew that window. This spec pins the
  * contract: the totals line Bench prints LAST is short, parseable, and its
  * length does not depend on the number of registered queries.
  */
class BenchLineSpec extends AnyFunSuite {

  test("totals line stays far under the 2000-char tail window at any registry size") {
    // nQueries only appears as a printed integer — render at an absurd
    // registry size to prove growth is O(digits), not O(queries).
    val line = Bench.totalsLine(
      total = 12345.678, totalOld = 9999.999, totalFirst = 23456.789,
      totalStreaming = 1111.111, totalBatch = 11234.567, totalMin = 10987.654,
      reps = 3, nQueries = 1000, sfDir = "/root/testdata/sf0.1")
    assert(!line.contains("\n"))
    assert(line.length < 400, s"totals line is ${line.length} chars: $line")
  }

  test("totals line is one complete JSON object with the driver-gate fields") {
    val line = Bench.totalsLine(33.303, 20.0, 35.0, 9.733, 23.57, 31.5, 3, 68,
      "/root/testdata/sf0.1")
    assert(line.startsWith("{") && line.endsWith("}"))
    for (field <- Seq("\"metric\":\"total\"", "\"value\":", "\"unit\":\"sec\"",
        "\"total_full_plan\":", "\"total_batch\":",
        "\"total_streaming_lifecycle\":", "\"total_run1\":",
        // min-of-reps headline (VERDICT r9 item 1): under contention the
        // minimum is the least-contended sample; the record stays
        // readable even when the driver machine runs at load 7+
        "\"total_min_plan\":31.5",
        "\"total_count_action\":", "\"n_queries\":68", "\"sf\":",
        // machine-context marker (VERDICT r8 item 3): a contended
        // measurement must be self-evident from the record alone
        "\"load_avg\":", "\"cpus\":"))
      assert(line.contains(field), s"missing $field in $line")
    // Minimal structural parse: balanced braces, no stray newline, values
    // rendered at ms precision (no 15-digit double tails).
    assert(line.count(_ == '{') == 1 && line.count(_ == '}') == 1)
    assert(line.contains("\"total_streaming_lifecycle\":9.733"))
  }

  test("streaming split membership is derived from the name") {
    for (n <- Seq("q48_streaming_dedup", "q49_streaming_signatures",
        "q54_streaming_windowed_counts", "q55_streaming_sessions",
        "q66_streaming_sessions_v2"))
      assert(Bench.isStreaming(n), n)
    for (n <- Seq("q01_pricing_summary", "q64_sessionize_hotkey",
        "q55_sessions"))
      assert(!Bench.isStreaming(n), n)
    // Every registered gate whose name mentions streaming must be counted
    // in the lifecycle split — this catches a future gate named e.g.
    // "q70_streamingX" only if the derivation stays name-based; pin the
    // current registry here so a rename is a deliberate act.
    val streamingInRegistry = SparkEntry.queries.keys.filter(Bench.isStreaming)
    assert(streamingInRegistry.toSet.forall(_.contains("streaming")))
    // the r12 near-miss, as a lint: a gate named "…_stream_…" reads as a
    // streaming-lifecycle gate to a human but NOT to the name-based
    // classifier, and would silently land in the batch subtotal
    // (q102_semdedup_stream_bigc did exactly that before its rename) —
    // any abbreviation of the token is a classification bug
    SparkEntry.queries.keys.filter(_.contains("stream")).foreach(n =>
      assert(n.contains("streaming"),
        s"$n abbreviates 'streaming' — the bench guard would bucket it as batch"))
  }
}
