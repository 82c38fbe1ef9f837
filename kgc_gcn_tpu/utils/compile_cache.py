"""Persistent XLA compilation cache.

Remote TPU compiles through the axon tunnel cost 1-5 minutes per program
shape (BENCH_NOTES.md); the jax persistent compilation cache turns a re-run
with identical program shapes into a disk load.  Exposed two ways:

  * ``--compile_cache_dir`` on the CLI (kgc_gcn_tpu/cli.py), recorded in the
    run's params.json;
  * the ``KGC_COMPILE_CACHE_DIR`` env var, honored by the perf tooling
    (bench.py, scripts/trace_step.py, scripts/ab_variants.py) so repeated
    measurement sessions skip recompilation.

Must be called before the first compilation; calling repeatedly with the
same directory is a no-op.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str) -> None:
    """Point jax's persistent compilation cache at ``path`` (created if
    missing) and cache every program — the default 1 s compile-time floor
    would skip small jitted helpers whose remote round-trip still costs
    seconds here."""
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def enable_compile_cache_from_env() -> None:
    """Enable the cache iff ``KGC_COMPILE_CACHE_DIR`` is set (perf tooling)."""
    path = os.environ.get("KGC_COMPILE_CACHE_DIR")
    if path:
        enable_compile_cache(path)
