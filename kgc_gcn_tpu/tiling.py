"""Pallas kernel tile sizes — a leaf module so both the kernels
(ops/spmm_pallas.py) and the graph builder (data/graph.py) can import them
without a cycle.

The graph's per-half edge padding MUST be a multiple of ``TILE_E``: the
kernels' DMA offsets are ``TILE_E``-aligned and ``segment_sum_pallas``
otherwise inserts a runtime re-pad copy of the (E, 128) message array on the
hottest path.  ``padded_edge_count`` (data/graph.py) therefore pads to
``TILE_E``.

Defaults chosen by sweep on TPU v5 lite (scripts/tile_sweep.py; BENCH_NOTES.md):
TILE_N=256 / TILE_E=512 beat 256/256 by ~4% — fewer, bigger DMAs.  The env
overrides exist for the sweep script only.
"""

import os

TILE_N = int(os.environ.get("KGC_TILE_N", 256))   # destination rows per program
TILE_E = int(os.environ.get("KGC_TILE_E", 512))   # edges per DMA chunk
