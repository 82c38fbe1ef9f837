"""In-environment GENERALIZATION gate (SURVEY.md §6 stand-in).

The real WN18RR corpus (reference accuracy target MRR >= 0.46, README.md:9)
is not on this machine, and random synthetic triples carry no signal (val MRR
~0 by construction).  This gate uses the compositional ring corpus
(data/toy.py compositional_triples): relations are rotations of a ring of
entities, train keeps all of the generator relation plus 70% of each derived
relation, and the HELD-OUT derived triples are exactly implied by the train
structure.  Chance MRR is ~2/N; a model that generalizes must rank the single
true object near the top on queries it has never seen.
"""

import numpy as np
import jax
import pytest

from kgc_gcn_tpu.config import dataset_preset
from kgc_gcn_tpu.data.batching import make_banks
from kgc_gcn_tpu.data.dataset import build_dataset
from kgc_gcn_tpu.data.graph import build_graph
from kgc_gcn_tpu.data.toy import compositional_triples
from kgc_gcn_tpu.models import build_model
from kgc_gcn_tpu.train.loop import Trainer
from kgc_gcn_tpu.train.optim import make_optimizer

N_ENT = 48
CHANCE_MRR = 2.0 / N_ENT   # ~0.042 for uniform ranking of one true object


@pytest.fixture(scope="module")
def sync_corpus():
    train, valid, test = compositional_triples(
        n_ent=N_ENT, offsets=(1, 3), held_frac=0.3)
    ds = build_dataset("sync", train, valid, test)
    g = build_graph(ds.train_triples, ds.num_entity, ds.num_relation, pad_to=8)
    return ds, g, make_banks(ds)


def _train_best_val(ds, g, banks, cfg, max_epoch, eval_every=25,
                    stop_at=None):
    model = build_model(cfg, ds.num_entity, ds.num_relation, ds.num_edge,
                        e_pad=g.e_pad)
    params, state = model.init(jax.random.PRNGKey(0))
    opt = make_optimizer(cfg).init(params)
    trainer = Trainer(cfg, model, g, banks)
    rng = np.random.default_rng(0)
    best = 0.0
    for epoch in range(1, max_epoch + 1):
        params, state, opt, _ = trainer.train_epoch(
            params, state, opt, epoch, rng, jax.random.PRNGKey(epoch))
        if epoch % eval_every == 0:
            best = max(best, trainer.evaluate(params, state, "valid")["mrr"])
            if stop_at is not None and best >= stop_at:
                break
    return best


def test_generalization_gate_complex_decoder(sync_corpus):
    """Held-out MRR >> chance with the complex decoder: ring rotations are
    exactly representable by the complex-bilinear family, so a model that
    LEARNS the structure (not the training set) reaches near-perfect ranking
    — measured 1.000 best-val MRR vs 0.042 chance.  The gate requires > 0.5
    (the strong form of VERDICT item 6)."""
    ds, g, banks = sync_corpus
    cfg = dataset_preset("Toy", gcn_in_dim=16, gcn_out_dim=32,
                         decoder="complex", batch_size=32,
                         learning_rate=0.01, lbl_smooth=0.1,
                         gcn_drop=0.1, conv_drop=0.0)
    best = _train_best_val(ds, g, banks, cfg, max_epoch=400, stop_at=0.6)
    assert best > 0.5, f"held-out MRR {best:.3f} (chance {CHANCE_MRR:.3f})"


def test_generalization_gate_survives_bf16_contrib(sync_corpus,
                                                   monkeypatch):
    """KGC_MGCN_CONTRIB=bf16 (only the backward's permuted contrib stream
    in bf16, everything else f32 — round 5: +33% at FB15k scale) must not
    break learning.  Numerically a SUBSET of the compute_dtype=bfloat16
    casting the next gate already covers; gated separately because it is
    its own knob."""
    import kgc_gcn_tpu.ops.spmm_pallas as sp
    monkeypatch.setattr(sp, "MGCN_CONTRIB", "bf16")
    ds, g, banks = sync_corpus
    cfg = dataset_preset("Toy", gcn_in_dim=16, gcn_out_dim=32,
                         decoder="complex", batch_size=32,
                         learning_rate=0.01, lbl_smooth=0.1,
                         gcn_drop=0.1, conv_drop=0.0, use_pallas=True)
    best = _train_best_val(ds, g, banks, cfg, max_epoch=150, stop_at=0.6)
    assert best > 0.5, f"bf16-contrib held-out MRR {best:.3f}"


def test_generalization_gate_survives_bf16_modes(sync_corpus):
    """The bf16 throughput modes (Adam moments stored in bf16; bf16 matmul
    operands with f32 accumulation) must not break LEARNING: the same
    complex-decoder gate stays >> chance with both enabled.  This is the
    in-environment accuracy validation the bench notes flagged as missing
    for moment_dtype/compute_dtype (BENCH_NOTES.md)."""
    ds, g, banks = sync_corpus
    cfg = dataset_preset("Toy", gcn_in_dim=16, gcn_out_dim=32,
                         decoder="complex", batch_size=32,
                         learning_rate=0.01, lbl_smooth=0.1,
                         gcn_drop=0.1, conv_drop=0.0,
                         moment_dtype="bfloat16", compute_dtype="bfloat16")
    best = _train_best_val(ds, g, banks, cfg, max_epoch=400, stop_at=0.6)
    assert best > 0.5, f"bf16 modes held-out MRR {best:.3f}"


def test_generalization_flagship_conve_beats_chance(sync_corpus):
    """The flagship MGCN+ConvE config must also generalize well above chance
    on the same corpus (measured best-val MRR ~0.3 = 7x chance before the
    small decoder starts memorizing the 82-triple train set; the gate is 3x
    chance with margin)."""
    ds, g, banks = sync_corpus
    cfg = dataset_preset("Toy", gcn_in_dim=16, gcn_out_dim=32, k_w=4, k_h=8,
                         num_filter=8, kernel_size=3, batch_size=32,
                         learning_rate=0.01, lbl_smooth=0.1,
                         gcn_drop=0.1, conv_drop=0.0,
                         hidden_drop=0.1, feat_drop=0.1)
    best = _train_best_val(ds, g, banks, cfg, max_epoch=400, stop_at=0.25)
    assert best > 3 * CHANCE_MRR, \
        f"held-out MRR {best:.3f} vs chance {CHANCE_MRR:.3f}"


def test_generalization_gate_rotate_decoder(sync_corpus):
    """The RotatE decoder's inductive bias IS this corpus's structure (ring
    relations are rotations): held-out MRR reaches 1.000 by ~epoch 75
    (vs 0.042 chance).  Gate > 0.5 like the complex gate."""
    ds, g, banks = sync_corpus
    cfg = dataset_preset("Toy", gcn_in_dim=16, gcn_out_dim=32,
                         decoder="rotate", batch_size=32,
                         learning_rate=0.01, lbl_smooth=0.1,
                         gcn_drop=0.1, conv_drop=0.0)
    best = _train_best_val(ds, g, banks, cfg, max_epoch=400, stop_at=0.85)
    assert best > 0.5, f"held-out MRR {best:.3f} (chance {CHANCE_MRR:.3f})"


@pytest.mark.parametrize("use_pallas,readback",
                         [(False, "wide"), (True, "wide"), (True, "bf16")])
def test_generalization_gate_rgcn_basis(sync_corpus, use_pallas, readback,
                                        monkeypatch):
    """RGCN-basis learns the compositional structure on BOTH the XLA and
    kernel paths (round-4 verdict: the family whose perf the repo advertises
    had no learning gate).  The kernel path exercises the fused basis
    forward kernel AND the dst-tile band backward (prepare_kernels builds
    the plan; interpret mode off-TPU).  Gate is 6x chance with early stop,
    like the RGAT gate."""
    import kgc_gcn_tpu.ops.spmm_pallas as sp
    monkeypatch.setattr(sp, "BASIS_READBACK", readback)
    ds, g, banks = sync_corpus
    cfg = dataset_preset("Toy", gcn_in_dim=16, gcn_out_dim=32,
                         decoder="complex", batch_size=32,
                         learning_rate=0.01, lbl_smooth=0.1, gcn_drop=0.1,
                         model="rgcn", num_bases=4, use_pallas=use_pallas)
    # kernel path: fewer epochs (interpret-mode kernels are slow on CPU);
    # it follows the same trajectory as XLA (equality-pinned in test_pallas)
    max_epoch = 150 if use_pallas else 400
    best = _train_best_val(ds, g, banks, cfg, max_epoch=max_epoch,
                           stop_at=0.3)
    assert best > 0.25, f"held-out MRR {best:.3f} (chance {CHANCE_MRR:.3f})"
