"""Generate a shape-faithful synthetic KG corpus on disk for CLI soak tests.

The real WN18RR/FB15k-237 text corpora are not distributable with this repo
(zero egress — CLAUDE.md); this writes TSV triple files with the same shape
statistics so the FULL user surface (dataset loader, vocab, CLI training,
eval, checkpointing) can be driven end-to-end at production scale:

    python scripts/make_synth_corpus.py SYN            # WN18RR-scale
    python scripts/make_synth_corpus.py SYNFB fb15k    # FB15k-237-scale
    python -m kgc_gcn_tpu.cli --dataset SYN --do_train --use_pallas ...

Random triples carry no generalizable signal — validation metrics stay ~0 by
construction; the soak validates throughput and pipeline stability, not
accuracy (see tests/test_train.py for the learnability check).
"""

import os
import sys

import numpy as np


def main(name: str = "SYN", scale: str = "wn18rr", data_dir: str = "data"):
    if scale == "fb15k":
        n_ent, n_rel, n_train = 14541, 237, 272115
    else:
        n_ent, n_rel, n_train = 40943, 11, 86835
    rng = np.random.default_rng(0)
    out = os.path.join(data_dir, name)
    os.makedirs(out, exist_ok=True)
    for split, n in (("train", n_train), ("valid", 3000), ("test", 3000)):
        s = rng.integers(n_ent, size=n)
        r = rng.integers(n_rel, size=n)
        o = rng.integers(n_ent, size=n)
        with open(os.path.join(out, f"{split}.txt"), "w") as f:
            for a, b, c in zip(s, r, o):
                f.write(f"e{a}\tr{b}\te{c}\n")
    print(f"wrote {out}: {n_train}/3000/3000 triples, "
          f"{n_ent} entities, {n_rel} relations")


if __name__ == "__main__":
    main(*(sys.argv[1:3] or ["SYN"]))
