"""Reference (PyTorch) checkpoint import/export (utils/torch_import.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kgc_gcn_tpu.data.graph import edge_table_to_reference_order
from kgc_gcn_tpu.models import build_model
from kgc_gcn_tpu.utils.torch_import import (
    load_reference_checkpoint,
    params_from_reference_state_dict,
    reference_state_dict_from_params,
    save_reference_checkpoint,
)


@pytest.fixture()
def model_and_params(toy, toy_cfg):
    ds, g, _ = toy
    model = build_model(toy_cfg, ds.num_entity, ds.num_relation, ds.num_edge,
                        e_pad=g.e_pad)
    params, state = model.init(jax.random.PRNGKey(3))
    return model, params, state, g


def test_state_dict_roundtrip_preserves_forward(model_and_params):
    model, params, state, g = model_and_params
    sd = reference_state_dict_from_params(params, state, g)
    assert "conv1.ent_bn.num_batches_tracked" in sd     # strict-load compat
    p2, s2 = params_from_reference_state_dict(sd, g)

    # every real tensor round-trips; the edge table compares in reference
    # order (import zeroes the padding rows, which never affect compute)
    np.testing.assert_array_equal(
        edge_table_to_reference_order(p2.edge_embeddings, g),
        edge_table_to_reference_order(params.edge_embeddings, g))

    src = jnp.asarray([0, 1], jnp.int32)
    rel = jnp.asarray([0, 2], jnp.int32)
    l1, _ = model.apply(params, state, g, src, rel, train=False)
    l2, _ = model.apply(p2, s2, g, src, rel, train=False)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=1e-6, atol=1e-6)


def test_dataparallel_module_prefix_stripped(model_and_params):
    _, params, state, g = model_and_params
    sd = reference_state_dict_from_params(params, state, g)
    wrapped = {f"module.{k}": v for k, v in sd.items()}
    p2, _ = params_from_reference_state_dict(wrapped, g)
    np.testing.assert_array_equal(np.asarray(p2.entity_embedding),
                                  np.asarray(params.entity_embedding))


def test_missing_key_raises(model_and_params):
    _, params, state, g = model_and_params
    sd = reference_state_dict_from_params(params, state, g)
    del sd["conv1.in_weight"]
    with pytest.raises(KeyError, match="conv1.in_weight"):
        params_from_reference_state_dict(sd, g)


def test_torch_ckpt_file_roundtrip(model_and_params, tmp_path):
    pytest.importorskip("torch")
    model, params, state, g = model_and_params
    path = str(tmp_path / "last.ckpt")
    save_reference_checkpoint(path, params, state, g, measure=0.4321)
    p2, s2, measure = load_reference_checkpoint(path, g)
    assert measure == pytest.approx(0.4321)

    src = jnp.asarray([2, 3], jnp.int32)
    rel = jnp.asarray([1, 0], jnp.int32)
    l1, _ = model.apply(params, state, g, src, rel, train=False)
    l2, _ = model.apply(p2, s2, g, src, rel, train=False)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=1e-6, atol=1e-6)
