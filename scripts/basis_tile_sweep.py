"""Sweep the basis backward band kernel's (tile_n, tile_e) on the real TPU.

Each config runs `rgcn_profile.py band` in its OWN subprocess (one TPU
process at a time; module tile globals are env-pinned per run), timing ONLY
the band kernel in an isolated scan — minutes per config instead of a full
bench.  The control is re-run last as a drift check.

Usage: python scripts/basis_tile_sweep.py
"""

import json
import os
import subprocess
import sys

CONFIGS = [
    (64, 256),    # control (the round-4 defaults)
    (128, 256),   # full MXU contraction dim
    (128, 512),   # + fewer, larger chunks (VMEM-tight: sel is 7.9 MiB)
    (256, 256),   # even fuller rows (VMEM-tight: g scratch 7.9 MiB)
    (64, 512),
    (32, 256),
    (64, 256),    # drift control
]


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = []
    for tn, te in CONFIGS:
        env = dict(os.environ, KGC_BASIS_TILE_N=str(tn),
                   KGC_BASIS_TILE_E=str(te))
        env.setdefault("KGC_COMPILE_CACHE_DIR", "/tmp/kgc_xla_cache")
        try:
            out = subprocess.run(
                [sys.executable, "scripts/rgcn_profile.py", "band"],
                cwd=root, env=env, capture_output=True, text=True,
                timeout=1800)
        except subprocess.TimeoutExpired:
            print(f"tile_n={tn} tile_e={te}: TIMEOUT", flush=True)
            continue
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not lines or out.returncode != 0:
            tail = (out.stderr or out.stdout)[-600:]
            print(f"tile_n={tn} tile_e={te}: FAILED\n{tail}", flush=True)
            continue
        d = json.loads(lines[-1])
        ms = d["ms_per_step"]["bwd_band"]
        results.append((tn, te, ms))
        print(f"tile_n={tn:4d} tile_e={te:4d}: bwd_band {ms:7.3f} ms/step "
              f"(plan {d['plan_meta']['inb']})", flush=True)
    if results:
        best = min(results, key=lambda r: r[2])
        print(f"best: tile_n={best[0]} tile_e={best[1]} {best[2]:.3f} ms")


if __name__ == "__main__":
    main()
