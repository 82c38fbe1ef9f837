"""Device mesh and sharding layout.

The reference's only parallelism is single-process ``torch.nn.DataParallel``
(reference main.py:213-214) — model replicated per GPU, batch scattered,
loss averaged.  TPU-native replacement: a ``jax.sharding.Mesh`` with two
logical axes,

  * ``data``  — batch (query) sharding; gradients all-reduce over ICI, which
    subsumes DataParallel,
  * ``graph`` — edge partitioning: the CSR halves (and with them the per-edge
    message work) are sharded along the edge dimension, each shard scatter-adds
    into the shared entity accumulator and XLA inserts the cross-shard psum.
    This is the graph-world analog of sequence/context parallelism
    (SURVEY.md §5.7) — the axis that lets graphs larger than one chip's HBM
    train.

Everything goes through GSPMD: we annotate placements with NamedSharding and
let XLA insert the collectives; no hand-written transport.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kgc_gcn_tpu.data.graph import Graph, GraphHalf, GraphStacked

DATA_AXIS = "data"
GRAPH_AXIS = "graph"


def make_mesh(data: int = 1, graph: int = 1, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    if data * graph > devices.size:
        raise ValueError(
            f"mesh {data}x{graph} needs {data * graph} devices, "
            f"have {devices.size}")
    devices = devices[: data * graph].reshape(data, graph)
    return Mesh(devices, (DATA_AXIS, GRAPH_AXIS))


def _half_sharding(mesh: Mesh, half: GraphHalf) -> GraphHalf:
    edge = NamedSharding(mesh, P(GRAPH_AXIS))
    rep = NamedSharding(mesh, P())
    return GraphHalf(src=edge, dst=edge, rel=edge, eid=edge, norm=edge,
                     indptr=rep, sperm=edge, s_indptr=rep, s_src=edge,
                     s_dst=edge, s_norm=edge, s_rel=edge,
                     rperm=edge, r_indptr=rep, r_rel=edge,
                     e_real=half.e_real)


def _stacked_sharding(mesh: Mesh, st: GraphStacked) -> GraphStacked:
    edge = NamedSharding(mesh, P(GRAPH_AXIS))
    rep = NamedSharding(mesh, P())
    return GraphStacked(src=edge, dst2=edge, rel=edge, norm=edge,
                        indptr=rep, sperm=edge, s_indptr=rep, s_src=edge,
                        rperm=edge, r_indptr=rep, r_rel=edge)


def shard_graph(graph: Graph, mesh: Mesh) -> Graph:
    """Edge-partition both halves along the ``graph`` axis.

    ``e_pad`` is built as a multiple of 256 (data/graph.py), so any graph-axis
    size dividing 256 shards evenly; padding edges are zero-norm no-ops on
    whichever shard they land.
    """
    from kgc_gcn_tpu.parallel.distributed import put_global
    sh = Graph(inb=_half_sharding(mesh, graph.inb),
               outb=_half_sharding(mesh, graph.outb),
               stacked=_stacked_sharding(mesh, graph.stacked),
               n_ent=graph.n_ent, n_rel=graph.n_rel,
               n_edge=graph.n_edge, e_pad=graph.e_pad)
    return jax.tree.map(
        put_global, graph, sh,
        is_leaf=lambda x: isinstance(x, (jax.Array, NamedSharding)))


def shard_params(tree, mesh: Mesh):
    """Place a parameter/state/opt pytree on the mesh.

    Everything is replicated EXCEPT the per-edge embedding tables (the largest
    parameter — 2E x d, e.g. 2x272k x 100 for FB15k-237): their (2, E_pad, d)
    positional layout (models/mgcn.py) shards along E_pad on the ``graph``
    axis, row-aligned with the edge partition (shard_graph), so each edge's
    embedding row is resident on the device that owns the edge.  Optimizer
    moments mirror the params pytree, so Adam state for the table shards the
    same way for free.
    """
    import dataclasses

    from kgc_gcn_tpu.models.mgcn import MGCNParams
    from kgc_gcn_tpu.parallel.distributed import put_global

    rep = NamedSharding(mesh, P())
    etab = NamedSharding(mesh, P(None, GRAPH_AXIS, None))

    def place(node):
        if isinstance(node, MGCNParams):
            # leafwise placement with a sharding pytree — a replicate-then-
            # reshard two-step would transfer the large tables everywhere
            sh = jax.tree.map(lambda _: rep, node)
            sh = dataclasses.replace(
                sh, edge_embeddings=etab,
                extra_edge_embeddings=(etab,) * len(node.extra_edge_embeddings))
            return jax.tree.map(put_global, node, sh)
        return jax.tree.map(lambda a: put_global(a, rep), node)

    return jax.tree.map(place, tree,
                        is_leaf=lambda n: isinstance(n, MGCNParams))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the trailing batch dimension of (steps, B, ...) plans over data."""
    spec = [None] * ndim
    if ndim >= 2:
        spec[1] = DATA_AXIS
    else:
        spec[0] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def shard_batches(mesh: Optional[Mesh], idx, mask):
    if mesh is None:
        return idx, mask
    from kgc_gcn_tpu.parallel.distributed import put_global
    sh = batch_sharding(mesh, idx.ndim)
    return put_global(idx, sh), put_global(mask, sh)
