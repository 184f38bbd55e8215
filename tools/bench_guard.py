#!/usr/bin/env python3
"""Bench sidecar sanity guard (VERDICT r8 item 3).

Round 8 committed a contention-poisoned sidecar (116 s vs the 33 s of the
round before, per-rep swings of 10x on untouched queries) with nothing in
the record to show it. This guard makes that impossible to do silently:

check <sidecar>
    Compares the shared-query total against the bench_out.json committed
    at HEAD (the previous round's record). Exits 1 when the ratio falls
    outside [1/1.5, 1.5] -- machine contention suspected in one of the
    two readings; the caller should re-run once.

pick <keep_path> <a> <b>
    Keeps whichever of the two sidecars has the SMALLER total (local[32]
    contention only ever inflates timings), annotated with both totals
    under "bench_guard" so the record itself shows the guard fired.
"""
import json
import subprocess
import sys


def load(path):
    with open(path) as f:
        return json.loads(f.read())


def load_prev():
    try:
        out = subprocess.run(["git", "show", "HEAD:bench_out.json"],
                             capture_output=True, text=True, check=True).stdout
        return json.loads(out)
    except Exception:
        return None


def total(side, keys=None):
    qs = side.get("queries", {})
    return sum(v for k, v in qs.items()
               if v >= 0 and (keys is None or k in keys))


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else ""
    if mode == "check":
        cur = load(sys.argv[2])
        prev = load_prev()
        if not prev:
            print("[bench-guard] no previous sidecar at HEAD; skipping",
                  file=sys.stderr)
            return 0
        shared = [k for k, v in cur.get("queries", {}).items()
                  if v >= 0 and prev.get("queries", {}).get(k, -1) >= 0]
        c, p = total(cur, shared), total(prev, shared)
        if not shared or p <= 0:
            print("[bench-guard] no shared queries; skipping", file=sys.stderr)
            return 0
        r = c / p
        print(f"[bench-guard] shared-query total {c:.1f}s vs previous "
              f"{p:.1f}s over {len(shared)} queries (ratio {r:.2f}, "
              f"load_avg now {cur.get('load_avg')})", file=sys.stderr)
        if r > 1.5 or r < 1 / 1.5:
            print("[bench-guard] ratio outside [0.67, 1.5] -- contention "
                  "suspected in one reading; re-run once", file=sys.stderr)
            return 1
        return 0
    if mode == "pick":
        keep, pa, pb = sys.argv[2:5]
        a, b = load(pa), load(pb)
        ta, tb = total(a), total(b)
        chosen, tc, to = (a, ta, tb) if ta <= tb else (b, tb, ta)
        chosen["bench_guard"] = {
            "fired": True,
            "kept_total": round(tc, 3),
            "discarded_total": round(to, 3),
        }
        with open(keep, "w") as f:
            f.write(json.dumps(chosen) + "\n")
        print(f"[bench-guard] kept the {tc:.1f}s reading, discarded "
              f"{to:.1f}s", file=sys.stderr)
        return 0
    print(__doc__, file=sys.stderr)
    return 2


if __name__ == "__main__":
    sys.exit(main())
