"""Shared decoder plumbing for the single-decoder-state model families
(RGCN, RGAT).

Both families keep ALL mutable state in the decoder (their encoders are
stateless), so the decode / trunk / candidate-scoring / rng-naming surface is
identical; this mixin is the single copy.  MGCN keeps its own versions — its
state also carries encoder BatchNorm and its trunk path threads extra aux.

Contract for classes mixing this in: ``self.cfg``, ``self._dec_apply``,
``self.encode(...)`` and a ``_state_cls`` dataclass with a single ``decoder``
field.
"""

from __future__ import annotations

import jax


class DecoderFamilyMixin:
    _state_cls = None   # set by the family

    def decode(self, params, state, all_ent, all_rel, src, rel, *,
               train=False, rngs=None):
        return self._dec_apply(
            params.decoder, state.decoder, self.cfg,
            all_ent[src], all_rel[rel], all_ent, train=train, rngs=rngs)

    def query_and_bias(self, params, state, all_ent, all_rel, src, rel, *,
                       train=False, rngs=None):
        """Decoder trunk for the fused scoring+BCE loss (see models/mgcn.py)."""
        from kgc_gcn_tpu.models.decoders import QUERY_TRUNKS
        trunk = QUERY_TRUNKS[self.cfg.decoder]
        h, dec_state = trunk(
            params.decoder, state.decoder, self.cfg, all_ent[src],
            all_rel[rel], train=train, rngs=rngs)
        return h, params.decoder.ent_bias, dec_state

    def rebuild_state(self, state, enc_aux, dec_state):
        del enc_aux
        return self._state_cls(decoder=dec_state)

    def score_candidates(self, params, state, all_ent, all_rel, src, rel,
                         cand, *, train=False, rngs=None):
        from kgc_gcn_tpu.models.decoders import CANDIDATE_SCORERS
        scorer = CANDIDATE_SCORERS[self.cfg.decoder]
        return scorer(
            params.decoder, state.decoder, self.cfg,
            all_ent[src], all_rel[rel], all_ent[cand], cand,
            train=train, rngs=rngs)

    def make_rngs(self, rng):
        """Named dropout keys for one step — the single source of the names
        (a missed name silently disables that dropout site)."""
        names = tuple(f"layer{i}" for i in range(max(1, self.cfg.num_layers))
                      ) + ("feat", "hidden")
        return dict(zip(names, jax.random.split(rng, len(names))))

    def apply(self, params, state, graph, src, rel, *, train=False, rng=None):
        rngs = self.make_rngs(rng) if rng is not None else {}
        all_ent, all_rel, _ = self.encode(
            params, state, graph, train=train, rngs=rngs)
        logits, dec_state = self.decode(
            params, state, all_ent, all_rel, src, rel, train=train, rngs=rngs)
        return logits, self._state_cls(decoder=dec_state)
