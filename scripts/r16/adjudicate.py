"""Round-16 re-record adjudication (the r13 protocol, unchanged):
for each re-recorded phase, per reading drift = median
ratio-to-baseline across baselined phases EXCLUDING the re-recorded
set; a reading qualifies for a phase when that phase's own steal_pct
< 10%; recorded value = median of qualified normalized readings
(raw / drift). New phases (no prior baseline) record the same
normalized median.
"""
import glob
import json
import statistics
import sys

RE_RECORD = ["tpch_power_run", "tpcds_report_run", "dedup_minhash_lsh"]
NEW = ["dedup_substring_spans", "dedup_substring_cut",
       "corpus_ngram_novelty"]


def main():
    baseline = json.load(open("/root/repo/bench_baseline.json"))["queries"]
    out = {}
    rows = []
    for rec in sorted(glob.glob(
            "/root/repo/scripts/r16/bench_records/rec*.json")):
        if "metrics" in rec:
            continue
        d = json.loads(open(rec).read())
        met = json.load(open(rec.replace(".json", "_metrics.json")))
        q = d["queries"]
        ratios = [v / baseline[k] for k, v in q.items()
                  if baseline.get(k) and k not in RE_RECORD + NEW]
        drift = statistics.median(ratios)
        row = {"rec": rec.split("/")[-1], "drift": round(drift, 3),
               "run_steal": d.get("steal_pct")}
        for k in RE_RECORD + NEW:
            if k not in q:
                continue
            steal = met["metrics"].get(k, {}).get("steal_pct", 0)
            norm = q[k] / drift
            row[k] = {"raw": q[k], "steal": steal,
                      "norm": round(norm, 3),
                      "qualified": steal < 10}
            out.setdefault(k, []).append((norm, steal < 10))
        rows.append(row)
    for r in rows:
        print(json.dumps(r))
    print("--- recorded values (median of qualified normalized) ---")
    rec = {}
    for k, vals in out.items():
        ok = [n for n, q in vals if q]
        if ok:
            rec[k] = round(statistics.median(ok), 3)
        else:
            print(f"{k}: NO qualified reading")
    print(json.dumps(rec, indent=1))
    if "--write" in sys.argv:
        bl = json.load(open("/root/repo/bench_baseline.json"))
        bl["queries"].update(rec)
        json.dump(bl, open("/root/repo/bench_baseline.json", "w"),
                  indent=1, sort_keys=True)
        print("bench_baseline.json updated")


if __name__ == "__main__":
    main()
