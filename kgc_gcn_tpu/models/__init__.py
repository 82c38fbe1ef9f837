from kgc_gcn_tpu.models.mgcn import MGCN
from kgc_gcn_tpu.models.rgat import RGAT
from kgc_gcn_tpu.models.rgcn import RGCN

__all__ = ["MGCN", "RGAT", "RGCN", "build_model"]


def build_model(cfg, n_ent: int, n_rel: int, n_edge: int, e_pad: int = None,
                mesh=None):
    """Model-family factory (``cfg.model``: mgcn | rgcn | rgat).

    ``e_pad`` must equal the Graph's padded per-half edge count when the graph
    was built with a non-default ``pad_to`` (the MGCN edge-embedding table is
    stored in the graph's positional edge order; see models/mgcn.py).
    ``mesh`` (a jax.sharding.Mesh with (data, graph) axes) is required when
    ``cfg.entity_sharded != 'none'`` — the encoder then shards the entity
    activations over the graph axis (parallel/entity_sharded.py).
    """
    if cfg.model == "mgcn":
        return MGCN(cfg, n_ent, n_rel, n_edge, e_pad, mesh=mesh)
    if cfg.model == "rgcn":
        return RGCN(cfg, n_ent, n_rel, n_edge, mesh=mesh)
    if cfg.model == "rgat":
        if getattr(cfg, "entity_sharded", "none") != "none":
            # deliberate fail-fast, not a gap to paper over: RGAT's segment
            # softmax needs a TWO-PASS distributed reduction over dst rows
            # (max, then the exp-sum denominator) BEFORE the weighted
            # aggregation — with entity rows sharded, dst segments straddle
            # shard boundaries, so the softmax itself requires two extra
            # compressed row exchanges per half (or a dst-aligned partition).
            # That exchange pattern is designed but not built; shipping the
            # plain schedules here would silently renormalize per shard and
            # produce WRONG attention weights.
            raise ValueError(
                "entity_sharded is not supported with model=rgat: the "
                "segment softmax needs a two-pass distributed reduction "
                "(see models/__init__.py for the design note); use "
                "model=mgcn/rgcn for entity-sharded graphs")
        return RGAT(cfg, n_ent, n_rel, n_edge, mesh=mesh)
    raise ValueError(f"unknown model family: {cfg.model!r}")
