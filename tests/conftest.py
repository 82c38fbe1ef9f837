"""Test harness: force JAX onto 8 virtual CPU devices (SURVEY.md §4), so
sharding and edge-partitioning tests exercise a real 8-device mesh without TPU
hardware.

This environment pre-imports jax at interpreter startup, so env vars set here
are too late — but the backend is not yet initialized, so ``jax.config``
updates still take effect.
"""

import jax

jax.config.update("jax_platform_name", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def toy():
    """Small in-memory dataset + graph + banks, shared across the session."""
    from kgc_gcn_tpu.data.toy import toy_triples
    from kgc_gcn_tpu.data.dataset import build_dataset
    from kgc_gcn_tpu.data.graph import build_graph
    from kgc_gcn_tpu.data.batching import make_banks

    train, valid, test = toy_triples(n_ent=12, n_rel=4, n_train=40)
    ds = build_dataset("toy", train, valid, test)
    graph = build_graph(ds.train_triples, ds.num_entity, ds.num_relation, pad_to=8)
    banks = make_banks(ds)
    return ds, graph, banks


@pytest.fixture(scope="session")
def toy_cfg():
    from kgc_gcn_tpu.config import dataset_preset
    # tiny dims keep CPU compiles fast; k_w*k_h must equal gcn_out_dim
    return dataset_preset(
        "Toy", gcn_in_dim=8, gcn_out_dim=32, k_w=4, k_h=8, num_filter=4,
        kernel_size=3, batch_size=4)
