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
accuracy.  For an accuracy signal use the COMPOSITIONAL corpus instead:

    python scripts/make_synth_corpus.py SYNC comp
    python -m kgc_gcn_tpu.cli --dataset SYNC --do_train --decoder complex \
        --learning_rate 0.01 --gcn_in_dim 16 --gcn_out_dim 32 \
        --max_epoch 400 --eval_every 25

whose held-out triples are implied by the train structure (ring rotations;
kgc_gcn_tpu/data/toy.py compositional_triples) — val MRR >> chance is a real
generalization gate (tests/test_generalization.py runs it in CI: the complex
decoder reaches MRR 1.0 vs 0.042 chance).
"""

import os
import sys

import numpy as np


def main(name: str = "SYN", scale: str = "wn18rr", data_dir: str = "data"):
    if scale == "comp":
        sys.path.insert(0, os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        from kgc_gcn_tpu.data.toy import write_compositional
        out = write_compositional(data_dir, name, n_ent=96, offsets=(1, 3, 7))
        print(f"wrote {out}: compositional ring corpus "
              f"(96 entities, 3 rotation relations, 30% of derived "
              f"relations held out)")
        return
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
