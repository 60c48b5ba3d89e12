"""r14 re-record arithmetic: tpcds_report_run 20 -> 24 widening.

For each full-bench reading: drift = median ratio-to-baseline across
baselined phases EXCLUDING tpcds_report_run (its baseline is the
20-shape number, so its ratio is expected to move — including it
would bias the drift estimator); a reading qualifies when the phase's
own steal_pct < 10. Recorded value = median over qualified readings
of (raw phase seconds / reading drift).
"""
import glob
import json
import statistics

BL = json.load(open("/root/repo/bench_baseline.json"))["queries"]
rows = []
for p in sorted(glob.glob("/root/repo/scripts/r14/bench_rec_run*.json")):
    rec = json.load(open(p))
    q = rec["queries"]
    m = json.load(open(p.replace("bench_", "metrics_").replace("bench_rec", "metrics_rec") if False else p.replace("bench_rec_run", "metrics_rec_run")))
    phase_steal = m["metrics"]["tpcds_report_run"]["steal_pct"]
    ratios = [v / BL[k] for k, v in q.items()
              if BL.get(k) and k != "tpcds_report_run"]
    drift = statistics.median(ratios)
    raw = q["tpcds_report_run"]
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
