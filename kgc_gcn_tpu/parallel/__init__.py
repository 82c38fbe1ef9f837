from kgc_gcn_tpu.parallel.boundary import (
    build_boundary_plan,
    make_boundary_aggregate,
)
from kgc_gcn_tpu.parallel.distributed import maybe_initialize, put_global
from kgc_gcn_tpu.parallel.edge_parallel import (
    build_local_csr,
    build_ring_blocks,
    make_entity_sharded_aggregate,
    make_pallas_sharded_aggregate,
    make_ring_aggregate,
    make_sharded_aggregate,
)
from kgc_gcn_tpu.parallel.mesh import make_mesh, shard_graph, shard_params

__all__ = [
    "build_boundary_plan", "build_local_csr", "build_ring_blocks",
    "make_boundary_aggregate", "make_entity_sharded_aggregate",
    "make_pallas_sharded_aggregate", "make_ring_aggregate",
    "make_sharded_aggregate", "make_mesh", "maybe_initialize", "put_global",
    "shard_graph", "shard_params",
]
