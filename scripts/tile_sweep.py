"""Sweep Pallas SpMM tile sizes on the real TPU (sequential subprocesses —
one TPU process at a time; see BENCH_NOTES.md measurement rules).

The default config is re-run at the end to measure session drift, so results
are comparable within one invocation only.

Usage: python scripts/tile_sweep.py
"""

import json
import os
import subprocess
import sys

CONFIGS = [
    (256, 256),   # default
    (256, 512),
    (512, 256),
    (512, 512),
    (128, 512),
    (256, 1024),
    (256, 256),   # default again: drift control
]


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = []
    for tn, te in CONFIGS:
        env = dict(os.environ, KGC_TILE_N=str(tn), KGC_TILE_E=str(te))
        try:
            out = subprocess.run(
                [sys.executable, "bench.py", "pallas"], cwd=root, env=env,
                capture_output=True, text=True, timeout=900)
        except subprocess.TimeoutExpired:
            print(f"TILE_N={tn} TILE_E={te}: TIMEOUT (900s)", flush=True)
            continue
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"TILE_N={tn} TILE_E={te}: FAILED\n{out.stderr[-2000:]}")
            continue
        d = json.loads(line[-1])
        sps = d["detail"]["steps_per_s"]
        results.append((tn, te, sps))
        print(f"TILE_N={tn:4d} TILE_E={te:4d}: {sps:7.2f} steps/s "
              f"({d['value']/1e6:.1f} Medges/s)", flush=True)
    if results:
        best = max(results, key=lambda r: r[2])
        print(f"best: TILE_N={best[0]} TILE_E={best[1]} {best[2]:.2f} steps/s")


if __name__ == "__main__":
    main()
