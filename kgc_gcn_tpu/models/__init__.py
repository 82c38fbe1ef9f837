from kgc_gcn_tpu.models.mgcn import MGCN
from kgc_gcn_tpu.models.rgcn import RGCN

__all__ = ["MGCN", "RGCN", "build_model"]


def build_model(cfg, n_ent: int, n_rel: int, n_edge: int):
    """Model-family factory (``cfg.model``: mgcn | rgcn)."""
    if cfg.model == "mgcn":
        return MGCN(cfg, n_ent, n_rel, n_edge)
    if cfg.model == "rgcn":
        return RGCN(cfg, n_ent, n_rel, n_edge)
    raise ValueError(f"unknown model family: {cfg.model!r}")
