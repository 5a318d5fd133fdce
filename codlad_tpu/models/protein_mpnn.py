"""Autoregressive ProteinMPNN: graph-conditioned sequence design.

TPU-first port of the vendored ProteinMPNN stack the reference carries
alongside its diffusion variants (reference: models/protein_mpnn_utils.py:
119-205 `EncLayer`/`DecLayer`, :624-988 `ProteinMPNN` with
`sample`/`tied_sample`/`conditional_probs`/`unconditional_probs`).  The
CODLAD pipeline itself never calls this model (SURVEY quirk 4), but it is
part of the reference's component surface, so it ships here complete.

Design vs the reference:

  * The O(B L^3) decoding-order einsum (`'ij,biq,bjp->bqp'` over one-hot
    permutation matrices, reference :766-768) is replaced by a rank
    comparison: `rank = argsort(decoding_order)` is the inverse
    permutation, and `order_mask_backward[b, q, p] = rank[p] < rank[q]`
    — O(B L^2), no [L, L] triangular matmul.
  * `sample` is a single `lax.scan` over decode steps instead of a Python
    loop of L kernel launches: the per-position state writes
    (h_S, S, h_V_stack, probs) become one-hot blends, which XLA fuses;
    the whole L-step decode is one device dispatch.
  * `tied_sample`'s group construction needs the host (tied_pos is a
    ragged Python structure and the grouped order depends on concrete
    randn values, reference :815-824), so groups are built in numpy and
    padded to a static [G, Gmax] slot matrix; the decode is then again a
    single scan over groups with an unrolled, validity-masked slot loop.
  * `conditional_probs` scans over target positions, running the dense
    (teacher-forced) decoder once per position like the reference's
    Python loop (:928-956); probabilities are computed for EVERY
    position and zeroed where chain_M*mask == 0, rather than looping
    only over batch-element-0's chain_M support (:923-925) — a
    per-sample-correct superset of the reference's behavior.

Sampling entry points are top-level functions taking (model, variables)
because their scan bodies re-enter the network via `model.apply` — the
same pattern as the diffusion samplers in gen/diffusion.py.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from codlad_tpu.nn.layers import torch_linear_init
from codlad_tpu.nn.mpnn import (CAProteinFeatures, PositionWiseFeedForward,
                                ProteinFeatures, cat_neighbors_nodes,
                                gather_nodes)


class EncLayer(nn.Module):
    """Plain (non-adaLN) ProteinMPNN encoder layer (reference :119-165):
    node message chain + PFF, then the edge update chain."""

    num_hidden: int
    num_in: int
    dropout: float = 0.1
    scale: float = 30.0

    @nn.compact
    def __call__(self, h_V, h_E, E_idx, mask_V=None, mask_attend=None,
                 deterministic=True):
        h = self.num_hidden
        li = torch_linear_init

        h_EV = cat_neighbors_nodes(h_V, h_E, E_idx)
        h_EV = jnp.concatenate(
            [jnp.broadcast_to(h_V[:, :, None, :], h_EV.shape[:3] + (h,)), h_EV], -1)
        m = nn.Dense(h, **li(h + self.num_in), name="W1")(h_EV)
        m = nn.Dense(h, **li(h), name="W2")(jax.nn.gelu(m, approximate=False))
        m = nn.Dense(h, **li(h), name="W3")(jax.nn.gelu(m, approximate=False))
        if mask_attend is not None:
            m = mask_attend[..., None] * m
        dh = jnp.sum(m, -2) / self.scale
        dh = nn.Dropout(self.dropout, deterministic=deterministic)(dh)
        h_V = nn.LayerNorm(name="norm1")(h_V + dh)

        dh = PositionWiseFeedForward(h, h * 4, name="dense")(h_V)
        dh = nn.Dropout(self.dropout, deterministic=deterministic)(dh)
        h_V = nn.LayerNorm(name="norm2")(h_V + dh)
        if mask_V is not None:
            h_V = mask_V[..., None] * h_V

        h_EV = cat_neighbors_nodes(h_V, h_E, E_idx)
        h_EV = jnp.concatenate(
            [jnp.broadcast_to(h_V[:, :, None, :], h_EV.shape[:3] + (h,)), h_EV], -1)
        m = nn.Dense(h, **li(h + self.num_in), name="W11")(h_EV)
        m = nn.Dense(h, **li(h), name="W12")(jax.nn.gelu(m, approximate=False))
        m = nn.Dense(h, **li(h), name="W13")(jax.nn.gelu(m, approximate=False))
        m = nn.Dropout(self.dropout, deterministic=deterministic)(m)
        h_E = nn.LayerNorm(name="norm3")(h_E + m)
        return h_V, h_E


class DecLayer(nn.Module):
    """Plain ProteinMPNN decoder layer (reference :168-205); the caller
    supplies the already-concatenated per-edge context h_ESV."""

    num_hidden: int
    num_in: int
    dropout: float = 0.1
    scale: float = 30.0

    @nn.compact
    def __call__(self, h_V, h_ESV, mask_V=None, mask_attend=None,
                 deterministic=True):
        h = self.num_hidden
        li = torch_linear_init

        h_EV = jnp.concatenate(
            [jnp.broadcast_to(h_V[:, :, None, :], h_ESV.shape[:3] + (h,)), h_ESV], -1)
        m = nn.Dense(h, **li(h + self.num_in), name="W1")(h_EV)
        m = nn.Dense(h, **li(h), name="W2")(jax.nn.gelu(m, approximate=False))
        m = nn.Dense(h, **li(h), name="W3")(jax.nn.gelu(m, approximate=False))
        if mask_attend is not None:
            m = mask_attend[..., None] * m
        dh = jnp.sum(m, -2) / self.scale
        dh = nn.Dropout(self.dropout, deterministic=deterministic)(dh)
        h_V = nn.LayerNorm(name="norm1")(h_V + dh)

        dh = PositionWiseFeedForward(h, h * 4, name="dense")(h_V)
        dh = nn.Dropout(self.dropout, deterministic=deterministic)(dh)
        h_V = nn.LayerNorm(name="norm2")(h_V + dh)
        if mask_V is not None:
            h_V = mask_V[..., None] * h_V
        return h_V


def decoding_order_from_noise(noise_priority, randn):
    """Random decoding order, low-priority (masked/fixed) positions first
    (reference :724-725): argsort((priority + 1e-4) * |randn|)."""
    return jnp.argsort((noise_priority + 0.0001) * jnp.abs(randn), axis=-1)


def order_attend_masks(decoding_order, E_idx, mask):
    """(mask_bw, mask_fw) for an autoregressive decode order.

    mask_bw[b, q, k] = 1 iff neighbor E_idx[b,q,k] is decoded strictly
    before q — computed via the inverse permutation instead of the
    reference's one-hot triangular einsum (:766-768)."""
    rank = jnp.argsort(decoding_order, axis=-1)          # step at which node n decodes
    before = (rank[:, None, :] < rank[:, :, None]).astype(jnp.float32)
    mask_attend = jnp.take_along_axis(before, E_idx, axis=2)[..., None]
    mask_1d = mask[:, :, None, None]
    return mask_1d * mask_attend, mask_1d * (1.0 - mask_attend)


class ProteinMPNN(nn.Module):
    """Graph-conditioned autoregressive sequence model
    (reference :624-706)."""

    num_letters: int = 21
    node_features: int = 128
    edge_features: int = 128
    hidden_dim: int = 128
    num_encoder_layers: int = 3
    num_decoder_layers: int = 3
    vocab: int = 21
    k_neighbors: int = 64
    augment_eps: float = 0.0
    dropout: float = 0.1
    ca_only: bool = True

    def setup(self):
        h = self.hidden_dim
        feat = CAProteinFeatures if self.ca_only else ProteinFeatures
        self.features = feat(self.edge_features, top_k=self.k_neighbors,
                             augment_eps=self.augment_eps)
        self.W_e = nn.Dense(h, **torch_linear_init(self.edge_features))
        # torch nn.Embedding default init: N(0, 1)
        self.W_s = nn.Embed(self.vocab, h,
                            embedding_init=nn.initializers.normal(1.0))
        self.encoder_layers = [
            EncLayer(h, h * 2, dropout=self.dropout, name=f"enc_{i}")
            for i in range(self.num_encoder_layers)]
        self.decoder_layers = [
            DecLayer(h, h * 3, dropout=self.dropout, name=f"dec_{i}")
            for i in range(self.num_decoder_layers)]
        self.W_out = nn.Dense(self.num_letters,
                              **torch_linear_init(h))

    def encode(self, X, mask, residue_idx, chain_encoding_all, rng=None,
               deterministic=True):
        """Featurize + encoder stack -> (h_V, h_E, E_idx)
        (reference :664-674)."""
        E, E_idx = self.features(X, mask, residue_idx, chain_encoding_all,
                                 rng=rng)
        h_V = jnp.zeros(E.shape[:2] + (self.hidden_dim,), E.dtype)
        h_E = self.W_e(E)
        mask_attend = mask[:, :, None] * gather_nodes(
            mask[..., None], E_idx)[..., 0]
        for layer in self.encoder_layers:
            h_V, h_E = layer(h_V, h_E, E_idx, mask, mask_attend,
                             deterministic=deterministic)
        return h_V, h_E, E_idx

    def embed_seq(self, S):
        return self.W_s(S)

    def logits(self, h_V):
        return self.W_out(h_V)

    def decode_layer(self, layer_idx, h_V_t, h_ESV_t, mask_t):
        """One decoder layer on a single decoded position (used by the
        sampling scans; layer_idx is static)."""
        return self.decoder_layers[layer_idx](h_V_t, h_ESV_t, mask_V=mask_t)

    def decode_parallel(self, h_V, h_E, E_idx, h_S, mask, mask_bw, mask_fw,
                        deterministic=True):
        """Teacher-forced decoder pass -> log-probs (reference :686-705).

        Positions attend to already-decoded neighbors' running state
        (mask_bw) and to frozen encoder state elsewhere (mask_fw)."""
        h_ES = cat_neighbors_nodes(h_S, h_E, E_idx)
        h_EX_encoder = cat_neighbors_nodes(jnp.zeros_like(h_S), h_E, E_idx)
        h_EXV_encoder = cat_neighbors_nodes(h_V, h_EX_encoder, E_idx)
        h_EXV_encoder_fw = mask_fw * h_EXV_encoder
        for layer in self.decoder_layers:
            h_ESV = cat_neighbors_nodes(h_V, h_ES, E_idx)
            h_ESV = mask_bw * h_ESV + h_EXV_encoder_fw
            h_V = layer(h_V, h_ESV, mask_V=mask,
                        deterministic=deterministic)
        return jax.nn.log_softmax(self.W_out(h_V), axis=-1)

    def __call__(self, X, S, mask, chain_M, residue_idx, chain_encoding_all,
                 randn, use_input_decoding_order=False, decoding_order=None,
                 rng=None, deterministic=True):
        """Teacher-forced forward -> per-position log-probs
        (reference `forward`, :662-705)."""
        h_V, h_E, E_idx = self.encode(X, mask, residue_idx,
                                      chain_encoding_all, rng=rng,
                                      deterministic=deterministic)
        h_S = self.W_s(S)
        chain_M = chain_M * mask
        if not use_input_decoding_order:
            decoding_order = decoding_order_from_noise(chain_M, randn)
        mask_bw, mask_fw = order_attend_masks(decoding_order, E_idx, mask)
        return self.decode_parallel(h_V, h_E, E_idx, h_S, mask, mask_bw,
                                    mask_fw, deterministic=deterministic)

    def unconditional_probs(self, X, mask, residue_idx, chain_encoding_all):
        """Log-probs with NO sequence context anywhere: every position sees
        only frozen encoder state (reference :959-988, order_mask_backward
        identically zero => mask_bw = 0, mask_fw = mask)."""
        h_V, h_E, E_idx = self.encode(X, mask, residue_idx,
                                      chain_encoding_all)
        h_EX_encoder = cat_neighbors_nodes(jnp.zeros_like(h_V), h_E, E_idx)
        h_EXV_encoder = cat_neighbors_nodes(h_V, h_EX_encoder, E_idx)
        h_EXV_encoder_fw = mask[:, :, None, None] * h_EXV_encoder
        for layer in self.decoder_layers:
            h_V = layer(h_V, h_EXV_encoder_fw, mask_V=mask)
        return jax.nn.log_softmax(self.W_out(h_V), axis=-1)


def _adjusted_probs(logits, temperature, omit_AAs, bias_AAs, bias_by_res_t,
                    pssm=None, omit_AA_mask_t=None):
    """Sampling-time probability adjustments (reference :771-786):
    hard omits, global/per-residue biases, PSSM mixing, per-position
    omit renormalization."""
    logits = logits / temperature
    probs = jax.nn.softmax(
        logits - omit_AAs[None, :] * 1e8 + bias_AAs[None, :] / temperature
        + bias_by_res_t / temperature, axis=-1)
    if pssm is not None:
        coef, bias, multi, log_odds_mask = pssm
        if coef is not None:   # pssm_bias_flag
            w = multi * coef[:, None]
            probs = (1.0 - w) * probs + w * bias
        if log_odds_mask is not None:   # pssm_log_odds_flag
            pm = probs * log_odds_mask + probs * 0.001
            probs = pm / jnp.sum(pm, axis=-1, keepdims=True)
    if omit_AA_mask_t is not None:
        pm = probs * (1.0 - omit_AA_mask_t)
        probs = pm / jnp.sum(pm, axis=-1, keepdims=True)
    return probs


def _row(x, t):
    """x [B, L, ...] -> the per-sample row t [B, 1, ...]."""
    idx = t.reshape(t.shape[0], *([1] * (x.ndim - 1)))
    return jnp.take_along_axis(x, jnp.broadcast_to(idx, (t.shape[0], 1) + x.shape[2:]), axis=1)


def _scatter_row(x, t, value):
    """Write value [B, 1, ...] into rows t of x [B, L, ...] (one-hot blend;
    decode visits each position exactly once)."""
    onehot = jax.nn.one_hot(t, x.shape[1], dtype=x.dtype)
    onehot = onehot.reshape(onehot.shape + (1,) * (x.ndim - 2))
    return x * (1.0 - onehot) + onehot * value


def sample(model, variables, rng, X, randn, S_true, chain_mask,
           chain_encoding_all, residue_idx, mask, temperature=1.0,
           omit_AAs=None, bias_AAs=None, chain_M_pos=None, omit_AA_mask=None,
           bias_by_res=None, pssm_coef=None, pssm_bias=None, pssm_multi=0.0,
           pssm_log_odds_flag=False, pssm_log_odds_mask=None,
           pssm_bias_flag=False):
    """Autoregressive sampling (reference `sample`, :709-801) as one
    `lax.scan` over decode steps.

    Returns {"S", "probs", "decoding_order"}; positions with
    chain_mask*chain_M_pos*mask == 0 keep S_true and zero probs, exactly
    the reference's fixed-position semantics (:790-792)."""
    B, L = X.shape[0], X.shape[1]
    V = model.num_letters
    omit_AAs = jnp.zeros(V) if omit_AAs is None else jnp.asarray(omit_AAs, jnp.float32)
    bias_AAs = jnp.zeros(V) if bias_AAs is None else jnp.asarray(bias_AAs, jnp.float32)
    bias_by_res = jnp.zeros((B, L, V)) if bias_by_res is None else bias_by_res
    chain_M_pos = jnp.ones_like(chain_mask) if chain_M_pos is None else chain_M_pos

    h_V, h_E, E_idx = model.apply(variables, X, mask, residue_idx,
                                  chain_encoding_all, method=model.encode)
    chain_mask = chain_mask * chain_M_pos * mask
    decoding_order = decoding_order_from_noise(chain_mask, randn)
    mask_bw, mask_fw = order_attend_masks(decoding_order, E_idx, mask)

    h_EX_encoder = cat_neighbors_nodes(jnp.zeros_like(h_V), h_E, E_idx)
    h_EXV_encoder = cat_neighbors_nodes(h_V, h_EX_encoder, E_idx)
    h_EXV_encoder_fw = mask_fw * h_EXV_encoder

    D = model.num_decoder_layers
    h_V_stack0 = jnp.concatenate(
        [h_V[None], jnp.zeros((D,) + h_V.shape, h_V.dtype)], axis=0)

    pssm = None
    if pssm_bias_flag or pssm_log_odds_flag:
        pssm = (pssm_coef if pssm_bias_flag else None,
                pssm_bias if pssm_bias_flag else None,
                pssm_multi,
                pssm_log_odds_mask if pssm_log_odds_flag else None)

    def step(carry, t):
        h_S, S, h_V_stack, all_probs, key = carry
        key, sub = jax.random.split(key)
        E_idx_t = _row(E_idx, t)                        # [B, 1, K]
        h_E_t = _row(h_E, t)                            # [B, 1, K, H]
        h_EXV_t = _row(h_EXV_encoder_fw, t)             # [B, 1, K, 3H]
        mask_bw_t = _row(mask_bw, t)                    # [B, 1, K, 1]
        mask_t = _row(mask, t)                          # [B, 1]
        h_ES_t = cat_neighbors_nodes(h_S, h_E_t, E_idx_t)
        for l in range(D):
            h_ESV_dec = cat_neighbors_nodes(h_V_stack[l], h_ES_t, E_idx_t)
            h_ESV_t = mask_bw_t * h_ESV_dec + h_EXV_t
            h_V_t = _row(h_V_stack[l], t)
            new = model.apply(variables, l, h_V_t, h_ESV_t, mask_t,
                              method=model.decode_layer)
            h_V_stack = h_V_stack.at[l + 1].set(
                _scatter_row(h_V_stack[l + 1], t, new))
        h_V_last = _row(h_V_stack[D], t)[:, 0]          # [B, H]
        logits = model.apply(variables, h_V_last, method=model.logits)
        bias_t = _row(bias_by_res, t)[:, 0]
        omit_t = _row(omit_AA_mask, t)[:, 0] if omit_AA_mask is not None else None
        pssm_t = None
        if pssm is not None:
            coef, pbias, multi, lom = pssm
            pssm_t = (None if coef is None else _row(coef, t)[:, 0],
                      None if pbias is None else _row(pbias, t)[:, 0],
                      multi,
                      None if lom is None else _row(lom, t)[:, 0])
        probs = _adjusted_probs(logits, temperature, omit_AAs, bias_AAs,
                                bias_t, pssm=pssm_t, omit_AA_mask_t=omit_t)
        S_samp = jax.random.categorical(sub, jnp.log(probs))
        cm_t = _row(chain_mask, t)[:, 0]                # [B]
        S_true_t = _row(S_true, t)[:, 0]
        S_t = jnp.where(cm_t > 0, S_samp, S_true_t).astype(S_true.dtype)
        all_probs = _scatter_row(all_probs, t,
                                 (cm_t[:, None] * probs)[:, None, :])
        h_S_new = model.apply(variables, S_t[:, None], method=model.embed_seq)
        h_S = _scatter_row(h_S, t, h_S_new)
        S = _scatter_row(S.astype(jnp.float32), t,
                         S_t[:, None].astype(jnp.float32)).astype(S_true.dtype)
        return (h_S, S, h_V_stack, all_probs, key), None

    carry0 = (jnp.zeros_like(h_V), jnp.zeros((B, L), S_true.dtype),
              h_V_stack0, jnp.zeros((B, L, V), jnp.float32), rng)
    (h_S, S, _, all_probs, _), _ = jax.lax.scan(
        step, carry0, decoding_order.T)
    return {"S": S, "probs": all_probs, "decoding_order": decoding_order}


def build_tied_groups(decoding_order_row, tied_pos, L):
    """Host-side group construction for tied sampling (reference :815-824):
    walk the (concrete) decoding order; the first occurrence of any member
    of a tied set pulls the whole set in as one group.  Returns
    (groups [G, Gmax] int32, flat decoding order [L]) with -1 padding."""
    seen = set()
    groups = []
    tied_lookup = {}
    for s in tied_pos or []:
        for p in s:
            tied_lookup[int(p)] = [int(q) for q in s]
    for t in np.asarray(decoding_order_row).tolist():
        if t in seen:
            continue
        grp = tied_lookup.get(t, [t])
        groups.append(grp)
        seen.update(grp)
    gmax = max(len(g) for g in groups)
    padded = np.full((len(groups), gmax), -1, dtype=np.int32)
    for i, g in enumerate(groups):
        padded[i, :len(g)] = g
    flat = np.concatenate([np.asarray(g, np.int32) for g in groups])
    return padded, flat


def tied_sample(model, variables, rng, X, randn, S_true, chain_mask,
                chain_encoding_all, residue_idx, mask, tied_pos,
                tied_beta=None, temperature=1.0, omit_AAs=None,
                bias_AAs=None, chain_M_pos=None, omit_AA_mask=None,
                bias_by_res=None):
    """Tied-position sampling (reference `tied_sample`, :804-895): tied
    sets (e.g. symmetric chains) decode together — their logits average
    (weighted by tied_beta) and one draw is written to every member.

    `randn` must be concrete (numpy/host array): the group order depends
    on its values, like the reference's host-side group walk (:815-824).
    Groups follow batch element 0's decode order for the whole batch,
    matching the reference (:816)."""
    B, L = X.shape[0], X.shape[1]
    V = model.num_letters
    omit_AAs = jnp.zeros(V) if omit_AAs is None else jnp.asarray(omit_AAs, jnp.float32)
    bias_AAs = jnp.zeros(V) if bias_AAs is None else jnp.asarray(bias_AAs, jnp.float32)
    bias_by_res = jnp.zeros((B, L, V)) if bias_by_res is None else bias_by_res
    chain_M_pos = jnp.ones_like(chain_mask) if chain_M_pos is None else chain_M_pos
    tied_beta = (np.ones(L, np.float32) if tied_beta is None
                 else np.asarray(tied_beta, np.float32))

    chain_mask_c = np.asarray(chain_mask * chain_M_pos * mask)
    order_row = np.argsort(
        (chain_mask_c[0] + 0.0001) * np.abs(np.asarray(randn)[0]))
    groups, flat_order = build_tied_groups(order_row, tied_pos, L)
    decoding_order = jnp.broadcast_to(
        jnp.asarray(flat_order, jnp.int32)[None], (B, L))

    chain_mask = jnp.asarray(chain_mask_c)
    h_V, h_E, E_idx = model.apply(variables, X, mask, residue_idx,
                                  chain_encoding_all, method=model.encode)
    mask_bw, mask_fw = order_attend_masks(decoding_order, E_idx, mask)
    h_EX_encoder = cat_neighbors_nodes(jnp.zeros_like(h_V), h_E, E_idx)
    h_EXV_encoder_fw = mask_fw * cat_neighbors_nodes(h_V, h_EX_encoder, E_idx)

    D = model.num_decoder_layers
    Gmax = groups.shape[1]
    tied_beta_j = jnp.asarray(tied_beta)

    def step(carry, group):
        h_S, S, h_V_stack, all_probs, key = carry
        key, sub = jax.random.split(key)
        valid = (group >= 0)
        n_valid = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
        logits_sum = jnp.zeros((B, V), jnp.float32)
        bias_sum = jnp.zeros((B, V), jnp.float32)
        for j in range(Gmax):
            t0 = jnp.maximum(group[j], 0)
            t = jnp.broadcast_to(t0, (B,))
            vj = valid[j].astype(jnp.float32)
            E_idx_t = _row(E_idx, t)
            h_E_t = _row(h_E, t)
            h_EXV_t = _row(h_EXV_encoder_fw, t)
            mask_bw_t = _row(mask_bw, t)
            mask_t = _row(mask, t)
            h_ES_t = cat_neighbors_nodes(h_S, h_E_t, E_idx_t)
            for l in range(D):
                h_ESV_dec = cat_neighbors_nodes(h_V_stack[l], h_ES_t, E_idx_t)
                h_ESV_t = mask_bw_t * h_ESV_dec + h_EXV_t
                h_V_t = _row(h_V_stack[l], t)
                new = model.apply(variables, l, h_V_t, h_ESV_t, mask_t,
                                  method=model.decode_layer)
                upd = _scatter_row(h_V_stack[l + 1], t, new)
                h_V_stack = h_V_stack.at[l + 1].set(
                    jnp.where(valid[j], upd, h_V_stack[l + 1]))
            h_V_last = _row(h_V_stack[D], t)[:, 0]
            lg = model.apply(variables, h_V_last, method=model.logits)
            logits_sum = logits_sum + vj * tied_beta_j[t0] * (lg / temperature) / n_valid
            bias_sum = bias_sum + vj * _row(bias_by_res, t)[:, 0] / n_valid
        probs = jax.nn.softmax(
            logits_sum - omit_AAs[None, :] * 1e8
            + bias_AAs[None, :] / temperature + bias_sum / temperature, axis=-1)
        if omit_AA_mask is not None:
            t0 = jnp.maximum(group[0], 0)
            om = _row(omit_AA_mask, jnp.broadcast_to(t0, (B,)))[:, 0]
            pm = probs * (1.0 - om)
            probs = pm / jnp.sum(pm, axis=-1, keepdims=True)
        S_samp = jax.random.categorical(sub, jnp.log(probs))
        for j in range(Gmax):
            t0 = jnp.maximum(group[j], 0)
            t = jnp.broadcast_to(t0, (B,))
            cm_t = _row(chain_mask, t)[:, 0]
            S_true_t = _row(S_true, t)[:, 0]
            S_t = jnp.where(cm_t > 0, S_samp, S_true_t).astype(S_true.dtype)
            h_S_new = model.apply(variables, S_t[:, None], method=model.embed_seq)
            h_S = jnp.where(valid[j], _scatter_row(h_S, t, h_S_new), h_S)
            S_upd = _scatter_row(S.astype(jnp.float32), t,
                                 S_t[:, None].astype(jnp.float32)).astype(S_true.dtype)
            S = jnp.where(valid[j], S_upd, S)
            m_t = _row(mask, t)[:, 0]
            ap_upd = _scatter_row(all_probs, t,
                                  (m_t[:, None] * probs)[:, None, :])
            all_probs = jnp.where(valid[j], ap_upd, all_probs)
        return (h_S, S, h_V_stack, all_probs, key), None

    h_V_stack0 = jnp.concatenate(
        [h_V[None], jnp.zeros((D,) + h_V.shape, h_V.dtype)], axis=0)
    carry0 = (jnp.zeros_like(h_V), jnp.zeros((B, L), S_true.dtype),
              h_V_stack0, jnp.zeros((B, L, V), jnp.float32), rng)
    (h_S, S, _, all_probs, _), _ = jax.lax.scan(
        step, carry0, jnp.asarray(groups))
    return {"S": S, "probs": all_probs, "decoding_order": decoding_order}


def conditional_probs(model, variables, X, S, mask, chain_M, residue_idx,
                      chain_encoding_all, randn, backbone_only=False):
    """Per-position conditionals (reference `conditional_probs`,
    :897-956): for each position idx, run the teacher-forced decoder with
    a decode order placing idx LAST (backbone_only=False: idx conditions
    on every other position's true S) or FIRST among non-idx positions
    (backbone_only=True: idx sees backbone only).  Positions with
    chain_M*mask == 0 return zeros, per-sample (the reference keys the
    loop on batch element 0's chain_M, :923-925)."""
    B, L = X.shape[0], X.shape[1]
    h_V_enc, h_E, E_idx = model.apply(variables, X, mask, residue_idx,
                                      chain_encoding_all, method=model.encode)
    h_S = model.apply(variables, S, method=model.embed_seq)
    chain_M = chain_M * mask

    def body(carry, idx):
        onehot = jax.nn.one_hot(idx, L)
        order_mask = (1.0 - onehot) if backbone_only else onehot
        dec_order = decoding_order_from_noise(
            jnp.broadcast_to(order_mask[None], (B, L)), randn)
        mask_bw, mask_fw = order_attend_masks(dec_order, E_idx, mask)
        lp = model.apply(variables, h_V_enc, h_E, E_idx, h_S, mask,
                         mask_bw, mask_fw, method=model.decode_parallel)
        row = jax.lax.dynamic_index_in_dim(lp, idx, axis=1, keepdims=False)
        return carry, row

    _, rows = jax.lax.scan(body, None, jnp.arange(L))
    out = jnp.transpose(rows, (1, 0, 2))                # [B, L, V]
    return out * chain_M[..., None]
