"""XLA-flag A/B around the Pallas custom calls (round-3 verdict item 5).

BENCH_NOTES round 2 left one single-chip lever open: the backward's
``contrib[sperm]`` permutation gather runs at ~40 GB/s in context (0.82 ms
isolated) and the hypothesis was scheduling/memory-space pressure around the
custom calls — "donating/aliasing or XLA flag work", never run.  The kernels
have no aliasable (same-shape) input/output pair, so the flag axis is what
remains; this script A/Bs XLA scheduling flags on the FB15k f32 bench.

Flags are process-global, so unlike ab_variants this MUST use subprocesses —
and cross-session variance is ±15% (BENCH_NOTES), so every candidate is
SANDWICHED between control runs and judged against the bracketing controls,
not an absolute number.  Two builtin probes:

  * canary — a deliberately destructive flag (scoped VMEM squeezed to
    256 KiB).  If the canary measures == control, XLA_FLAGS do not reach the
    axon REMOTE compiler at all and every flag result here is meaningless —
    the lever closes as environment-blocked, which is itself the answer.
  * lhs_off — latency-hiding scheduler off: tests whether the in-context
    gather slowdown is scheduler-induced overlap pressure.

Usage: python scripts/ab_flags.py [name=flags ...]   (defaults below)
Each run rides the shared compile cache keyed per flag set.
"""

import json
import os
import subprocess
import sys

BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "bench.py")

DEFAULT = [
    ("control_a", ""),
    ("canary_vmem256", "--xla_tpu_scoped_vmem_limit_kib=256"),
    ("lhs_off", "--xla_tpu_enable_latency_hiding_scheduler=false"),
    ("control_b", ""),
]


def run_one(name, flags, mode="fb15k"):
    env = dict(os.environ)
    if flags:
        # --xla_tpu_* flags CANNOT go through XLA_FLAGS here: the local CPU
        # jaxlib parses XLA_FLAGS at startup and ABORTS on TPU-only flags
        # ("Unknown flag in XLA_FLAGS", measured round 4).  LIBTPU_INIT_ARGS
        # is the TPU-flag vehicle; whether it reaches the axon REMOTE
        # compiler is exactly what the canary determines.
        env["LIBTPU_INIT_ARGS"] = (
            env.get("LIBTPU_INIT_ARGS", "") + " " + flags).strip()
        # flag sets are NOT part of the compile-cache key — use a separate
        # cache dir per flag set so a stale cache hit can't fake "no effect"
        env["KGC_COMPILE_CACHE_DIR"] = "/tmp/kgc_xla_cache_" + name
    env.setdefault("KGC_COMPILE_CACHE_DIR", "/tmp/kgc_xla_cache")
    out = subprocess.run([sys.executable, BENCH, mode],
                         capture_output=True, text=True, env=env)
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        print(f"{name:>16s}: FAILED rc={out.returncode} "
              f"{out.stderr.strip().splitlines()[-1][:200] if out.stderr else ''}",
              flush=True)
        return None
    rec = json.loads(lines[-1])
    v = rec.get("detail", {}).get("steps_per_s")
    print(f"{name:>16s}: {v} steps/s   [{flags or 'no extra flags'}]",
          flush=True)
    return v


def main(argv):
    variants = DEFAULT
    if argv:
        variants = []
        for spec in argv:
            name, _, flags = spec.partition("=")
            variants.append((name, flags))
    results = {}
    for name, flags in variants:
        results[name] = run_one(name, flags)
    ctrl = [v for k, v in results.items()
            if k.startswith("control") and v is not None]
    if ctrl:
        lo, hi = min(ctrl), max(ctrl)
        print(f"# control band: {lo:.1f}-{hi:.1f} steps/s "
              f"({(hi - lo) / hi * 100:.1f}% drift) — only deltas OUTSIDE "
              "this band are signal", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
