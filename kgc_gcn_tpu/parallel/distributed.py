"""Multi-process (multi-host) runtime setup.

The reference's parallelism is single-process DataParallel (reference
main.py:213-214).  A TPU pod runs one process per host: JAX needs
``jax.distributed.initialize()`` before first backend use so every process
sees the global device set, and host arrays must be placed with
process-local shards (``jax.make_array_from_callback``) rather than plain
``device_put`` (which requires every addressable device locally).

Single-process behavior is unchanged: ``maybe_initialize`` is a no-op unless
a coordinator is configured, and ``put_global`` degrades to ``device_put``.
"""

from __future__ import annotations

import logging
import os

import jax
import numpy as np

_INITIALIZED = False


def maybe_initialize() -> bool:
    """Initialize jax.distributed when a multi-process run is configured.

    Triggers on the standard coordination env vars (set by the launcher):
    ``JAX_COORDINATOR_ADDRESS``/``COORDINATOR_ADDRESS`` + ``JAX_NUM_PROCESSES``
    /``NUM_PROCESSES`` + ``JAX_PROCESS_ID``/``PROCESS_ID``.  On Cloud TPU
    pods ``jax.distributed.initialize()`` autodetects everything, so setting
    just ``JAX_COORDINATOR_ADDRESS=auto`` works there too.  Idempotent.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS") \
        or os.environ.get("COORDINATOR_ADDRESS")
    if not addr:
        return False
    kw = {}
    if addr != "auto":
        kw["coordinator_address"] = addr
        n = os.environ.get("JAX_NUM_PROCESSES") or os.environ.get("NUM_PROCESSES")
        pid = os.environ.get("JAX_PROCESS_ID") or os.environ.get("PROCESS_ID")
        if n is not None:
            kw["num_processes"] = int(n)
        if pid is not None:
            kw["process_id"] = int(pid)
    jax.distributed.initialize(**kw)
    _INITIALIZED = True
    logging.info("jax.distributed initialized: process %d/%d, %d/%d devices "
                 "local", jax.process_index(), jax.process_count(),
                 jax.local_device_count(), jax.device_count())
    return True


def host_array(x) -> np.ndarray:
    """Fetch a (possibly multi-host-sharded) array to EVERY process's host.

    ``np.asarray`` on an array spanning non-addressable devices raises; the
    host-side metadata builders (ring blocks, per-shard CSR) need the full
    edge arrays on every process.  Replicating via a jitted identity is a
    collective — every process must call this at the same program point
    (the prepare_* hooks run in lockstep on all processes, so they do).
    """
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    from jax.sharding import NamedSharding, PartitionSpec as P
    rep = NamedSharding(x.sharding.mesh, P())
    return np.asarray(jax.jit(lambda a: a, out_shardings=rep)(x))


def put_global(x, sharding):
    """Place a host array on a (possibly multi-host) sharding.

    Every process passes the SAME global array (our batch plans, graph
    arrays, and parameters are deterministic replicas by construction);
    each process materializes only its addressable shards.  Single-process:
    plain ``device_put`` (fewer callbacks, batched transfer).
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])
