"""Boundary-exchange comm-volume report (host-side, no devices needed).

For a synthetic graph at the requested scale, prints the per-device rows
shipped per layer per half by each --entity_sharded schedule, under both
entity numberings (--partition contiguous | locality):

    python scripts/boundary_report.py [wn18rr|fb15k|clustered|clustered_dense]

`clustered` / `clustered_dense` are planted-partition graphs (90% of edges
inside 8 blocks) at WN18RR / FB15k scale, the regime real KGs with
community structure approach; the uniform random wn18rr/fb15k shapes are
the worst case for locality (no clusters to find).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

G = 8


def make(mode):
    rng = np.random.default_rng(0)
    if mode in ("fb15k", "clustered_dense"):
        n_ent, n_rel, n_edge = 14541, 237, 272115
    else:
        n_ent, n_rel, n_edge = 40943, 11, 86835
    if mode.startswith("clustered"):
        rows = n_ent // G
        base = rng.integers(G, size=n_edge) * rows
        local = rng.random(n_edge) < 0.9
        src = np.where(local, base + rng.integers(rows, size=n_edge),
                       rng.integers(n_ent, size=n_edge))
        dst = np.where(local, base + rng.integers(rows, size=n_edge),
                       rng.integers(n_ent, size=n_edge))
        scramble = rng.permutation(n_ent)
        src, dst = scramble[src], scramble[dst]
    else:
        src = rng.integers(n_ent, size=n_edge)
        dst = rng.integers(n_ent, size=n_edge)
    tri = np.stack([src, rng.integers(n_rel, size=n_edge), dst],
                   axis=1).astype(np.int64)
    return tri, n_ent, n_rel


def report(tri, n_ent, n_rel, label):
    from kgc_gcn_tpu.data.graph import build_graph
    from kgc_gcn_tpu.parallel.boundary import build_boundary_plan
    g = build_graph(tri, n_ent, n_rel)
    n_pad = -(-n_ent // G) * G
    for name in ("inb", "outb"):
        _, st = build_boundary_plan(getattr(g, name), G, n_pad)
        ship = st["in_rows_padded"] + st["out_rows_padded"]
        print(f"  {label:10s} {name:4s}: boundary ships {ship:7d} rows/dev "
              f"(in {st['in_rows_padded']}, out {st['out_rows_padded']}; "
              f"real max {st['in_rows_real_max']}+{st['out_rows_real_max']}) "
              f"vs gather {st['gather_rows']} — "
              f"{st['gather_rows'] / max(1, ship):.1f}x less")


def main(mode="wn18rr"):
    from kgc_gcn_tpu.data.partition import locality_order
    tri, n_ent, n_rel = make(mode)
    print(f"{mode}: N={n_ent} E={len(tri)} G={G}")
    report(tri, n_ent, n_rel, "contiguous")
    order = locality_order(tri, n_ent)
    new_of_old = np.empty(n_ent, np.int64)
    new_of_old[order] = np.arange(n_ent)
    tri2 = tri.copy()
    tri2[:, 0] = new_of_old[tri[:, 0]]
    tri2[:, 2] = new_of_old[tri[:, 2]]
    report(tri2, n_ent, n_rel, "locality")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "wn18rr")
