from kgc_gcn_tpu.ops.scatter import aggregate_half, loop_messages
from kgc_gcn_tpu.ops.losses import bce_with_logits
from kgc_gcn_tpu.ops.fused_loss import fused_score_bce, sparse_bce_with_logits
from kgc_gcn_tpu.ops.ranking import filtered_ranks, rank_metrics

__all__ = [
    "aggregate_half", "loop_messages",
    "bce_with_logits", "fused_score_bce", "sparse_bce_with_logits",
    "filtered_ranks", "rank_metrics",
]
