"""Synthetic toy KG generator — the test/smoke fixture.

The reference ships a 6-entity/4-relation ``data/Toy`` fixture for CPU smoke
runs (reference data/Toy, SURVEY.md §4).  We generate ours: a small random KG
written in the same three-file TSV format, plus an in-memory variant for unit
tests.  A fixed seed makes it reproducible.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np

Triple = Tuple[str, str, str]


def toy_triples(
    n_ent: int = 12,
    n_rel: int = 4,
    n_train: int = 40,
    n_valid: int = 8,
    n_test: int = 8,
    seed: int = 7,
) -> Tuple[List[Triple], List[Triple], List[Triple]]:
    """Random triples; every valid/test entity+relation also appears in train
    so filtered eval never meets an unseen id."""
    rng = np.random.default_rng(seed)

    def sample(n, seen=None):
        out, used = [], set()
        while len(out) < n:
            s, r, o = rng.integers(n_ent), rng.integers(n_rel), rng.integers(n_ent)
            if s == o or (s, r, o) in used or (seen and (s, r, o) in seen):
                continue
            used.add((s, r, o))
            out.append((f"e{s}", f"r{r}", f"e{o}"))
        return out, used

    # train must touch every entity/relation at least once
    train, used = sample(n_train)
    for i in range(n_ent):
        train.append((f"e{i}", f"r{rng.integers(n_rel)}",
                      f"e{(i + 1) % n_ent}"))
    for j in range(n_rel):
        train.append((f"e{rng.integers(n_ent)}", f"r{j}",
                      f"e{rng.integers(n_ent)}"))
    train = list(dict.fromkeys(train))
    used = set((int(s[1:]), int(r[1:]), int(o[1:])) for s, r, o in train)
    valid, vused = sample(n_valid, used)
    test, _ = sample(n_test, used | vused)
    return train, valid, test


def write_toy(data_dir: str, name: str = "Toy", **kw) -> str:
    root = os.path.join(data_dir, name)
    os.makedirs(root, exist_ok=True)
    train, valid, test = toy_triples(**kw)
    for split, triples in (("train", train), ("valid", valid), ("test", test)):
        with open(os.path.join(root, split + ".txt"), "w") as f:
            for s, r, o in triples:
                f.write(f"{s}\t{r}\t{o}\n")
    return root
