"""Summarize an experiments/<ds>/metrics.jsonl run history.

Usage: python scripts/summarize_metrics.py experiments/WN18RR/metrics.jsonl

The file appends across runs in the same model dir; runs are split on the
``run_start`` marker lines the trainer writes (train/loop.py).  For each run:
epochs completed, final/best val MRR (and the epoch it happened), last loss,
and sustained steps/s.
"""

import json
import sys


def summarize(path: str):
    runs, cur = [], None
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("run_start"):
                cur = {"meta": rec, "epochs": []}
                runs.append(cur)
            elif cur is not None:
                cur["epochs"].append(rec)
            else:                      # pre-marker legacy lines
                cur = {"meta": {}, "epochs": [rec]}
                runs.append(cur)
    out = []
    for i, run in enumerate(runs):
        ep = run["epochs"]
        if not ep:
            continue
        vals = [(e["val"]["mrr"], e["epoch"]) for e in ep if "val" in e]
        best, best_ep = max(vals) if vals else (None, None)
        rates = [e["steps_per_s"] for e in ep if "steps_per_s" in e]
        out.append({
            "run": i,
            "dataset": run["meta"].get("dataset"),
            "epochs": ep[-1]["epoch"],
            "last_loss": ep[-1].get("loss"),
            "best_val_mrr": best,
            "best_epoch": best_ep,
            "steps_per_s_median": (sorted(rates)[len(rates) // 2]
                                   if rates else None),
        })
    return out


def main(argv):
    if len(argv) != 1:
        raise SystemExit(__doc__)
    for row in summarize(argv[0]):
        print(json.dumps(row))


if __name__ == "__main__":
    main(sys.argv[1:])
