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
        # entity_sharded='gather' is supported since round 5: the two-pass
        # distributed segment softmax (pmax of the per-dst max, psum of the
        # exp-sum denominator) rides the gather schedule's collectives
        # (models/rgat._make_entity_sharded_attend).  ring/boundary remain
        # a fail-fast inside RGAT.__init__ (their compressed row exchanges
        # would need dedicated max/denom exchanges — designed, not built).
        return RGAT(cfg, n_ent, n_rel, n_edge, mesh=mesh)
    raise ValueError(f"unknown model family: {cfg.model!r}")
