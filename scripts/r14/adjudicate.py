"""r14 re-record arithmetic: tpcds_report_run 20 -> 24 widening.

For each full-bench reading: drift = median ratio-to-baseline across
baselined phases EXCLUDING the phase under adjudication (its baseline
is the pre-widening number, so its ratio is expected to move —
including it would bias the drift estimator); a reading qualifies when
the phase's own steal_pct < 10. Recorded value = median over qualified
readings of (raw phase seconds / reading drift).

Usage: python adjudicate.py [phase] [tag ...]
  phase  defaults to tpcds_report_run
  tags   default to every recorded reading in this directory
         (rec, rec2, rec3, confirm, final)
"""
import glob
import json
import os
import statistics
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
PHASE = sys.argv[1] if len(sys.argv) > 1 else "tpcds_report_run"
TAGS = sys.argv[2:] or ["rec", "rec2", "rec3", "confirm", "final"]

BL = json.load(open("/root/repo/bench_baseline.json"))["queries"]
rows = []
for tag in TAGS:
    for p in sorted(glob.glob(os.path.join(HERE, f"bench_{tag}_run*.json"))):
        rec = json.load(open(p))
        q = rec["queries"]
        m = json.load(open(p.replace(f"bench_{tag}_run", f"metrics_{tag}_run")))
        phase_steal = m["metrics"][PHASE]["steal_pct"]
        ratios = [v / BL[k] for k, v in q.items()
                  if BL.get(k) and k != PHASE]
        drift = statistics.median(ratios)
        raw = q[PHASE]
        rows.append({
            "file": p.split("/")[-1], "raw": raw, "drift": round(drift, 3),
            "norm_sec": round(raw / drift, 2), "phase_steal": phase_steal,
            "run_steal": rec.get("steal_pct"), "qualified": phase_steal < 10,
        })
for r in rows:
    print(r)
qual = [r["norm_sec"] for r in rows if r["qualified"]]
print("qualified:", len(qual), "median normalized sec:",
      round(statistics.median(qual), 2) if qual else None)
