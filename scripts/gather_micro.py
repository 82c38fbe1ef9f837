"""Microbench: single random permutation gather vs two-phase (block-bucketed
then block-local) factorized gather at FB15k edge scale.

sperm = p1[p2] with p1 = stable argsort by src-block (ascending strided
reads) and p2 block-local (small working set per block).  If the two passes
beat the one random pass, wire the factorization into GraphHalf.
Measured inside lax.scan (dispatch amortized), host-synced.
"""

import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def bench(fn, *args, iters=30, reps=3):
    def body(c, _):
        return c, jnp.sum(fn(*args))
    scan = jax.jit(lambda: jax.lax.scan(body, 0, None, length=iters)[1])
    float(scan()[-1])   # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(scan()[-1])
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) / iters * 1e3   # ms per gather


def main():
    e, d, n = 272384, 100, 14541
    rng = np.random.default_rng(0)
    src = rng.integers(n, size=e).astype(np.int32)
    sperm = np.argsort(src, kind="stable").astype(np.int32)
    a = jnp.asarray(rng.normal(size=(e, d)), jnp.float32)

    for n_blocks in (16, 64, 256):
        bs = -(-n // n_blocks)
        blk = src // bs
        p1 = np.argsort(blk, kind="stable").astype(np.int32)
        # p2: within the p1 ordering, stable sort by src; p1[p2] == sperm
        p2 = np.argsort(src[p1], kind="stable").astype(np.int32)
        assert np.array_equal(p1[p2], sperm)
        t2 = bench(lambda x: x[jnp.asarray(p1)][jnp.asarray(p2)], a)
        print(f"two-phase B={n_blocks:4d}: {t2:7.3f} ms", flush=True)

    t1 = bench(lambda x: x[jnp.asarray(sperm)], a)
    print(f"single random     : {t1:7.3f} ms", flush=True)
    t0 = bench(lambda x: x[jnp.asarray(np.arange(e, dtype=np.int32))], a)
    print(f"identity (roofline): {t0:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
