from kgc_gcn_tpu.parallel.mesh import make_mesh, shard_graph, shard_params

__all__ = ["make_mesh", "shard_graph", "shard_params"]
