"""kgc_gcn_tpu — a TPU-native relational-GNN framework for knowledge-graph completion.

A from-scratch JAX/XLA/Pallas/pjit framework with the capabilities of the
weilonghu/KGC-GCN ("M-GCN") reference: relational message passing with
direction-typed weights, relation-composed messages and learned per-edge
embeddings (reference model.py:47-127); a ConvE convolutional decoder scoring
queries against all entities (model.py:130-181); 1-vs-all BCE training with
label smoothing (data_loader.py:41-43, main.py:49-77); and filtered
MR/MRR/Hits@K evaluation (main.py:80-135).

Design is TPU-first, not a port:
  * the whole train/eval step is one jit-compiled XLA program (static shapes,
    graph resident on device),
  * relational aggregation runs as sorted segment-sum / fused Pallas SpMM,
  * ranking is a comparison-count, not a double argsort,
  * multi-chip scaling uses `jax.sharding.Mesh` (data x graph axes) with XLA
    collectives instead of torch DataParallel.
"""

from kgc_gcn_tpu.config import Config, dataset_preset
from kgc_gcn_tpu.data.dataset import KGDataset
from kgc_gcn_tpu.data.graph import Graph

__version__ = "0.2.0"

__all__ = ["Config", "dataset_preset", "KGDataset", "Graph", "__version__"]
