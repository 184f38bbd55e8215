#!/usr/bin/env python3
"""Bench sidecar sanity guard (VERDICT r8 item 3, hardened r10).

Round 8 committed a contention-poisoned sidecar (116 s vs the 33 s of the
round before, per-rep swings of 10x on untouched queries) with nothing in
the record to show it. This guard makes that impossible to do silently:

check <sidecar>
    Compares the shared-passing-query total against the bench_out.json of
    the last 3 distinct COMMIT DAYS that touched it (not just HEAD's: a
    slow creep of <1.5x/round could ratchet past a single-anchor check --
    VERDICT r9 item 4; and not the last 3 COMMITS: one round refreshes
    the sidecar several times, which would collapse the window back to a
    single round -- r10 review. Day granularity approximates rounds on
    this one-round-per-machine-day driver without round markers in the
    file). Each comparison is restricted to queries that PASSED in both
    readings so a -1 failure can't shrink a total. Exits 1 when the ratio
    against the cleanest (fastest) anchor falls outside [1/1.5, 1.5] --
    machine contention suspected in one of the readings; the caller
    should re-run once.

pick <keep_path> <a> <b>
    Keeps the preferable of two sidecars: fewer failed queries wins
    outright (a run where a query died is not "cleaner" just because the
    -1 made its sum smaller -- ADVICE r9); on a tie the smaller total
    over the queries that passed in BOTH wins (local[32] contention only
    ever inflates timings). The kept file is annotated under
    "bench_guard" so the record itself shows the guard fired.

selftest
    Runs the synthetic-creep and failure-preference assertions inline
    (no pytest dependency); exits 0 when all hold.
"""
import json
import subprocess
import sys

HISTORY_DEPTH = 3


def load(path):
    with open(path) as f:
        return json.loads(f.read())


def first_per_day(lines, depth):
    """["sha day"] newest-first -> [(sha, day)]: the newest sha of each
    distinct day, up to `depth` days (pure, selftested)."""
    out, seen = [], set()
    for line in lines:
        parts = line.split()
        if len(parts) != 2:
            continue
        sha, day = parts
        if day in seen:
            continue
        seen.add(day)
        out.append((sha, day))
        if len(out) >= depth:
            break
    return out


def load_history(depth=HISTORY_DEPTH):
    """The newest committed bench_out.json of each of the last `depth`
    distinct commit days, newest first."""
    out = []
    try:
        log_lines = subprocess.run(
            ["git", "log", "-n", "50", "--format=%h %ad", "--date=short",
             "--", "bench_out.json"],
            capture_output=True, text=True, check=True).stdout.splitlines()
        for sha, day in first_per_day(log_lines, depth):
            try:
                blob = subprocess.run(["git", "show", f"{sha}:bench_out.json"],
                                      capture_output=True, text=True,
                                      check=True).stdout
                out.append((f"{sha}@{day}", json.loads(blob)))
            except Exception:
                pass
    except Exception:
        pass
    return out


def passing(side):
    return {k: v for k, v in side.get("queries", {}).items() if v >= 0}


def fail_count(side):
    return sum(1 for v in side.get("queries", {}).values() if v < 0)


def is_streaming(name):
    """Mirror of graft.Bench.isStreaming: the registry naming contract
    (every StreamingQuery-lifecycle gate carries "streaming" in its
    name), so membership here can never drift from the Scala side."""
    return "streaming" in name


def shared_totals(a, b, pred=None):
    """(total_a, total_b, n) over the queries that PASSED in both,
    optionally restricted to names matching `pred`."""
    pa, pb = passing(a), passing(b)
    shared = pa.keys() & pb.keys()
    if pred is not None:
        shared = {k for k in shared if pred(k)}
    return (sum(pa[k] for k in shared), sum(pb[k] for k in shared), len(shared))


def check(cur, history, log=lambda *a: None):
    """Return (ok, {"batch": ratio, "streaming": ratio}). ok=False ->
    contention suspected in one reading, re-run.

    Batch and streaming subtotals are compared SEPARATELY (VERDICT r10
    item 5): the streaming-lifecycle gates are the ones that swing 4-6x
    on a loaded box, and in a combined total a contended streaming
    reading could mask a batch regression -- or a clean streaming run
    could dilute one -- in either direction.
    """
    def subset_ratios(label, pred):
        ratios = []
        for tag, prev in history:
            c, p, n = shared_totals(cur, prev, pred)
            if n == 0 or p <= 0:
                continue
            ratios.append(c / p)
            log(f"[bench-guard] {label} vs {tag}: shared-passing total "
                f"{c:.1f}s / {p:.1f}s over {n} queries (ratio {c / p:.2f})")
        return ratios
    subsets = [("batch", subset_ratios("batch", lambda k: not is_streaming(k))),
               ("streaming", subset_ratios("streaming", is_streaming))]
    if not any(r for _, r in subsets):
        log("[bench-guard] no comparable committed sidecar; skipping")
        return True, None
    # contention only ever INFLATES a committed anchor, so the cleanest
    # (fastest) anchor is the one yielding the LARGEST current/previous
    # ratio -- that is the honest comparison, and the one a slow creep
    # cannot hide from
    ok, best = True, {}
    for label, ratios in subsets:
        if not ratios:
            continue
        best[label] = max(ratios)
        log(f"[bench-guard] cleanest-anchor {label} ratio {best[label]:.2f} "
            f"over {len(ratios)} committed sidecars "
            f"(load_avg now {cur.get('load_avg')})")
        ok = ok and 1 / 1.5 <= best[label] <= 1.5
    # boot-boundary advisory (r14): quiet-box readings from DIFFERENT
    # boots drift 1.16-2.2x on many-small-jobs gates with no code change
    # (FANIN "reboot boundary"; r11 saw the intra-boot variant). Not a
    # gate -- a cross-boot inflation still trips the ratio and re-runs --
    # but the explanation belongs IN the log the re-run decision reads.
    cur_boot = cur.get("boot_id")
    anchor_boots = {prev.get("boot_id") for _, prev in history} - {None}
    if cur_boot and anchor_boots and cur_boot not in anchor_boots:
        log(f"[bench-guard] NOTE: this reading is from boot {cur_boot}; every "
            f"committed anchor is from {sorted(anchor_boots)} -- a uniform "
            "many-small-jobs drift here is likely the host, not code "
            "(see FANIN host-drift playbook before reading per-gate regressions)")
    return ok, best


def pick(a, b):
    """Return (chosen, annotation) -- fewer failures wins, then smaller
    shared-passing total."""
    fa, fb = fail_count(a), fail_count(b)
    ta, tb, n = shared_totals(a, b)
    if fa != fb:
        chosen, tc, to = (a, ta, tb) if fa < fb else (b, tb, ta)
        why = f"fewer failed queries ({min(fa, fb)} vs {max(fa, fb)})"
    else:
        chosen, tc, to = (a, ta, tb) if ta <= tb else (b, tb, ta)
        why = f"smaller total over {n} shared-passing queries"
    return chosen, {"fired": True, "kept_total": round(tc, 3),
                    "discarded_total": round(to, 3), "reason": why}


def selftest():
    def side(qs):
        return {"queries": qs}
    # 1) creep: +40%/round for 3 rounds -- each step is under the old
    #    single-anchor 1.5x gate, but vs the cleanest of the last 3 the
    #    compounded 1.4^3 = 2.74x must trip.
    rounds = [side({"q1": 1.0, "q2": 2.0}), side({"q1": 1.4, "q2": 2.8}),
              side({"q1": 1.96, "q2": 3.92})]
    cur = side({"q1": 2.744, "q2": 5.488})
    ok_single, _ = check(cur, [("r3", rounds[2])])
    ok_multi, r = check(cur, [(f"r{i}", s) for i, s in enumerate(rounds)])
    assert ok_single, "one 1.4x step must pass a single-anchor check"
    assert not ok_multi and abs(r["batch"] - 2.744) < 1e-6, \
        "the compounded creep must trip against the cleanest anchor"
    # 2) a clean current run vs clean history passes
    ok, _ = check(side({"q1": 1.05, "q2": 2.1}), [("h", rounds[0])])
    assert ok
    # 3) failures don't shrink totals: a run where q2 died (-1) reads as
    #    1.0s raw but must NOT be kept over a clean 3.1s run
    bad = side({"q1": 1.0, "q2": -1.0})
    good = side({"q1": 1.05, "q2": 2.05})
    chosen, note = pick(bad, good)
    assert chosen is good and "fewer failed" in note["reason"]
    # and check() must compare over the intersection of PASSING queries
    ok, r = check(bad, [("h", good)])
    assert ok and abs(r["batch"] - 1.0 / 1.05) < 1e-9, \
        "check must restrict to shared-passing queries, not let -1 shrink a total"
    # 4) tie on failures -> smaller shared total wins (contention inflates)
    slow = side({"q1": 2.0, "q2": 9.0})
    fast = side({"q1": 1.0, "q2": 2.0})
    chosen, note = pick(slow, fast)
    assert chosen is fast and note["kept_total"] == 3.0
    # 5) the anchor window spans distinct DAYS, not commits: three
    #    same-day refreshes must collapse to one anchor and still leave
    #    room for the two prior rounds (r10 review)
    days = first_per_day(["aaa 2026-08-13", "bbb 2026-08-13",
                          "ccc 2026-08-13", "ddd 2026-08-12",
                          "eee 2026-08-11", "fff 2026-08-10"], 3)
    assert days == [("aaa", "2026-08-13"), ("ddd", "2026-08-12"),
                    ("eee", "2026-08-11")], days
    # 6) batch and streaming subtotals are guarded SEPARATELY (VERDICT
    #    r10 item 5). History: 10s batch + 3s streaming.
    hist = [("h", side({"q1": 8.0, "q2": 2.0, "q54_streaming_counts": 3.0}))]
    #    a) 5x contended streaming, clean batch: combined total 10.2+15
    #       vs 13 would read 1.94 either way, but the point is the
    #       DIRECTION -- a batch regression must trip even when dwarfed:
    ok, r = check(side({"q1": 8.1, "q2": 2.1, "q54_streaming_counts": 15.0}), hist)
    assert not ok and abs(r["streaming"] - 5.0) < 1e-9 \
        and 1 / 1.5 <= r["batch"] <= 1.5, \
        "a contended streaming reading must trip on its own ratio"
    #    b) 2x batch regression hidden inside a combined total by a
    #       much FASTER streaming reading (20+0.1 vs 13 = 1.55 would
    #       trip, but 20+2.9 vs 13 = 1.76... make it exact): batch 2x
    #       (20s) + streaming at 0.5x (1.5s) -> combined 21.5/13 = 1.65
    #       trips too, so pin the subset attribution instead: batch
    #       ratio must be exactly 2.0 and streaming 0.5 -- BOTH out of
    #       band, and neither masked by the other.
    ok, r = check(side({"q1": 16.0, "q2": 4.0, "q54_streaming_counts": 1.5}), hist)
    assert not ok and abs(r["batch"] - 2.0) < 1e-9 \
        and abs(r["streaming"] - 0.5) < 1e-9, \
        "subset ratios must attribute regressions to the right family"
    #    c) the true masking case the combined total got wrong: 1.44x
    #       batch creep (in-band alone: 14.4/10) washed out by a clean
    #       streaming read would have passed combined ((14.4+3)/13 =
    #       1.34) -- and DOES pass per-subset since 1.44 < 1.5; but at
    #       1.6x batch with clean streaming the combined total reads
    #       (16+3)/13 = 1.46 (PASSES -- masked!) while the split guard
    #       trips on batch alone:
    ok, r = check(side({"q1": 12.8, "q2": 3.2, "q54_streaming_counts": 3.0}), hist)
    assert not ok and abs(r["batch"] - 1.6) < 1e-9, \
        "a clean streaming reading must not mask a batch regression"
    #    d) both subsets clean still passes, and both ratios are reported
    ok, r = check(side({"q1": 8.4, "q2": 2.1, "q54_streaming_counts": 3.3}), hist)
    assert ok and set(r) == {"batch", "streaming"}
    print("[bench-guard] selftest OK", file=sys.stderr)
    return 0


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else ""
    if mode == "check":
        cur = load(sys.argv[2])
        ok, _ = check(cur, load_history(),
                      log=lambda m: print(m, file=sys.stderr))
        if not ok:
            print("[bench-guard] ratio outside [0.67, 1.5] -- contention "
                  "suspected in one reading; re-run once", file=sys.stderr)
            return 1
        return 0
    if mode == "pick":
        keep, pa, pb = sys.argv[2:5]
        chosen, note = pick(load(pa), load(pb))
        chosen["bench_guard"] = note
        with open(keep, "w") as f:
            f.write(json.dumps(chosen) + "\n")
        print(f"[bench-guard] kept the {note['kept_total']:.1f}s reading "
              f"({note['reason']}), discarded {note['discarded_total']:.1f}s",
              file=sys.stderr)
        return 0
    if mode == "selftest":
        return selftest()
    print(__doc__, file=sys.stderr)
    return 2


if __name__ == "__main__":
    sys.exit(main())
