from kgc_gcn_tpu.parallel.edge_parallel import (
    build_ring_blocks,
    make_entity_sharded_aggregate,
    make_ring_aggregate,
    make_sharded_aggregate,
)
from kgc_gcn_tpu.parallel.mesh import make_mesh, shard_graph, shard_params

__all__ = [
    "build_ring_blocks", "make_entity_sharded_aggregate",
    "make_ring_aggregate", "make_sharded_aggregate",
    "make_mesh", "shard_graph", "shard_params",
]
