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


def shared_totals(a, b):
    """(total_a, total_b, n) over the queries that PASSED in both."""
    pa, pb = passing(a), passing(b)
    shared = pa.keys() & pb.keys()
    return (sum(pa[k] for k in shared), sum(pb[k] for k in shared), len(shared))


def check(cur, history, log=lambda *a: None):
    """Return (ok, best_ratio). ok=False -> contention suspected, re-run."""
    ratios = []
    for tag, prev in history:
        c, p, n = shared_totals(cur, prev)
        if n == 0 or p <= 0:
            continue
        ratios.append(c / p)
        log(f"[bench-guard] vs {tag}: shared-passing total {c:.1f}s / {p:.1f}s "
            f"over {n} queries (ratio {c / p:.2f})")
    if not ratios:
        log("[bench-guard] no comparable committed sidecar; skipping")
        return True, None
    # contention only ever INFLATES a committed anchor, so the cleanest
    # (fastest) anchor is the one yielding the LARGEST current/previous
    # ratio -- that is the honest comparison, and the one a slow creep
    # cannot hide from
    best = max(ratios)
    log(f"[bench-guard] cleanest-anchor ratio {best:.2f} over "
        f"{len(ratios)} committed sidecars (load_avg now {cur.get('load_avg')})")
    return 1 / 1.5 <= best <= 1.5, best


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
    assert not ok_multi and abs(r - 2.744) < 1e-6, \
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
    assert ok and abs(r - 1.0 / 1.05) < 1e-9, \
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
