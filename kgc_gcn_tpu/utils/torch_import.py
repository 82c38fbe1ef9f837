"""Import / export reference (PyTorch) checkpoints.

Migration path for users of the reference implementation: its checkpoints are
``torch.save({'state_dict', 'optim_dict', 'measure'})`` files named
``last.ckpt`` (reference utils.py:121-135), with parameter names defined by
``MGCN``/``MGCNConv``/``ConvE`` (reference model.py:16-21, 56-68, 137-157).
Every tensor maps 1:1 onto our MGCN pytree except the per-edge embedding
table, which also changes LAYOUT: the reference stores row i for edge id i
(model.py:18, data_loader.py:148) while we store the table positionally in
graph edge order (models/mgcn.py) — ``data.graph.edge_table_from_reference_
order`` performs the permutation.

Optimizer state is intentionally not imported: torch Adam moments have no
meaningful mapping onto optax's pytree (and the reference restarts
best-tracking from the stored measure anyway, main.py:222-225). Training
resumed from an imported checkpoint starts with fresh moments.

``torch`` is only required inside the two file-level functions; the pure
state-dict converters work on any mapping of numpy-convertible arrays.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import jax.numpy as jnp
import numpy as np

from kgc_gcn_tpu.data.graph import (
    Graph,
    edge_table_from_reference_order,
    edge_table_to_reference_order,
)
from kgc_gcn_tpu.models.common import BNParams, BNState
from kgc_gcn_tpu.models.decoders import ConvEParams, ConvEState
from kgc_gcn_tpu.models.mgcn import MGCNConvParams, MGCNParams, MGCNState


def _strip_module_prefix(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Drop the ``module.`` prefix DataParallel adds (reference main.py:213)."""
    return {(k[len("module."):] if k.startswith("module.") else k): v
            for k, v in sd.items()}


def _arr(sd: Mapping[str, Any], key: str) -> jnp.ndarray:
    if key not in sd:
        raise KeyError(
            f"reference state_dict is missing '{key}' — is this an MGCN/ConvE "
            f"checkpoint? (got keys: {sorted(sd)[:8]}...)")
    return jnp.asarray(np.asarray(sd[key], dtype=np.float32))


def _bn(sd: Mapping[str, Any], prefix: str) -> Tuple[BNParams, BNState]:
    return (BNParams(scale=_arr(sd, f"{prefix}.weight"),
                     bias=_arr(sd, f"{prefix}.bias")),
            BNState(mean=_arr(sd, f"{prefix}.running_mean"),
                    var=_arr(sd, f"{prefix}.running_var")))


def params_from_reference_state_dict(
    sd: Mapping[str, Any], graph: Graph,
) -> Tuple[MGCNParams, MGCNState]:
    """Reference ``model.state_dict()`` (tensors or arrays) → our pytrees.

    Only the reference architecture (model='mgcn', decoder='conve') has a
    reference counterpart to import from.
    """
    sd = _strip_module_prefix(sd)
    conv_bn_p, conv_bn_s = _bn(sd, "conv1.ent_bn")
    bn0_p, bn0_s = _bn(sd, "conv2.bn0")
    bn1_p, bn1_s = _bn(sd, "conv2.bn1")
    bn2_p, bn2_s = _bn(sd, "conv2.bn2")

    conv = MGCNConvParams(
        in_weight=_arr(sd, "conv1.in_weight"),
        out_weight=_arr(sd, "conv1.out_weight"),
        loop_weight=_arr(sd, "conv1.loop_weight"),
        rels_weight=_arr(sd, "conv1.rels_weight"),
        loop_rel=_arr(sd, "conv1.loop_rel"),
        loop_edge=_arr(sd, "conv1.loop_edge"),
        bn=conv_bn_p,
        bias=_arr(sd, "conv1.bias") if "conv1.bias" in sd else None,
    )
    decoder = ConvEParams(
        bn0=bn0_p,
        conv_w=_arr(sd, "conv2.conv_e.weight"),
        conv_b=(_arr(sd, "conv2.conv_e.bias")
                if "conv2.conv_e.bias" in sd else None),
        bn1=bn1_p,
        fc_w=_arr(sd, "conv2.fc.weight"),
        fc_b=_arr(sd, "conv2.fc.bias"),
        bn2=bn2_p,
        ent_bias=_arr(sd, "conv2.bias"),
    )
    params = MGCNParams(
        entity_embedding=_arr(sd, "entity_embedding"),
        relation_embedding=_arr(sd, "relation_embedding"),
        edge_embeddings=jnp.asarray(edge_table_from_reference_order(
            np.asarray(_arr(sd, "edge_embeddings")), graph)),
        conv=conv,
        decoder=decoder,
    )
    state = MGCNState(conv_bn=conv_bn_s,
                      decoder=ConvEState(bn0=bn0_s, bn1=bn1_s, bn2=bn2_s))
    return params, state


def reference_state_dict_from_params(
    params: MGCNParams, state: MGCNState, graph: Graph,
) -> Dict[str, np.ndarray]:
    """Our pytrees → a reference-compatible ``state_dict`` of numpy arrays.

    Includes the ``num_batches_tracked`` buffers torch BatchNorm layers carry
    so the dict loads with ``strict=True`` into the reference model.
    """
    dec = params.decoder
    if not isinstance(dec, ConvEParams):
        raise ValueError("only the ConvE decoder exists in the reference; "
                         f"cannot export {type(dec).__name__}")
    out: Dict[str, np.ndarray] = {
        "entity_embedding": np.asarray(params.entity_embedding),
        "relation_embedding": np.asarray(params.relation_embedding),
        "edge_embeddings": edge_table_to_reference_order(
            params.edge_embeddings, graph),
        "conv1.in_weight": np.asarray(params.conv.in_weight),
        "conv1.out_weight": np.asarray(params.conv.out_weight),
        "conv1.loop_weight": np.asarray(params.conv.loop_weight),
        "conv1.rels_weight": np.asarray(params.conv.rels_weight),
        "conv1.loop_rel": np.asarray(params.conv.loop_rel),
        "conv1.loop_edge": np.asarray(params.conv.loop_edge),
        "conv2.conv_e.weight": np.asarray(dec.conv_w),
        "conv2.fc.weight": np.asarray(dec.fc_w),
        "conv2.fc.bias": np.asarray(dec.fc_b),
        "conv2.bias": np.asarray(dec.ent_bias),
    }
    if params.conv.bias is not None:
        out["conv1.bias"] = np.asarray(params.conv.bias)
    if dec.conv_b is not None:
        out["conv2.conv_e.bias"] = np.asarray(dec.conv_b)
    for prefix, p, s in (
            ("conv1.ent_bn", params.conv.bn, state.conv_bn),
            ("conv2.bn0", dec.bn0, state.decoder.bn0),
            ("conv2.bn1", dec.bn1, state.decoder.bn1),
            ("conv2.bn2", dec.bn2, state.decoder.bn2)):
        out[f"{prefix}.weight"] = np.asarray(p.scale)
        out[f"{prefix}.bias"] = np.asarray(p.bias)
        out[f"{prefix}.running_mean"] = np.asarray(s.mean)
        out[f"{prefix}.running_var"] = np.asarray(s.var)
        out[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)
    return out


def load_reference_checkpoint(
    path: str, graph: Graph,
) -> Tuple[MGCNParams, MGCNState, float]:
    """Load a reference ``last.ckpt`` (torch.save file) → (params, state,
    measure). Accepts both the full ``{'state_dict', ...}`` wrapper and a bare
    state_dict."""
    import torch
    blob = torch.load(path, map_location="cpu", weights_only=True)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    measure = float(blob.get("measure", 0.0)) if isinstance(blob, dict) else 0.0
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    params, state = params_from_reference_state_dict(sd, graph)
    return params, state, measure


def save_reference_checkpoint(
    path: str, params: MGCNParams, state: MGCNState, graph: Graph,
    measure: float = 0.0,
) -> None:
    """Write a reference-format ``last.ckpt`` so weights trained here can be
    loaded back into the reference implementation (utils.py:138-155)."""
    import torch
    sd = {k: torch.tensor(v)
          for k, v in reference_state_dict_from_params(params, state,
                                                       graph).items()}
    torch.save({"state_dict": sd, "optim_dict": {}, "measure": measure}, path)
