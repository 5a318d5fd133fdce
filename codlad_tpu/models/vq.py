"""Vector quantization: EMA codebook and FSQ, as pure functional state.

On TPU the nearest-codeword search is a single [N, D] x [D, K] matmul on
the MXU — no custom kernel needed at these sizes (K=4096, D=3).  The EMA
codebook update is expressed as explicit state-in/state-out so it stays
correct under data parallelism: the per-batch statistics (cluster counts and
embed sums) are plain reductions over the batch, which XLA turns into global
reductions when the batch is sharded over the mesh (the reference trains
Stage 1 single-GPU and keeps the codebook as torch buffers,
utils/vq_module.py:39-163).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class VQState:
    codebook: jnp.ndarray      # [n_codes, dim]
    cluster_size: jnp.ndarray  # [n_codes] EMA of assignment counts
    embed_avg: jnp.ndarray     # [n_codes, dim] EMA of assigned-vector sums


def vq_init(rng, n_codes, dim, scale=1.0):
    # uniform in [-1/n, 1/n] like common VQ inits; the EMA pulls codes to the
    # data distribution within a few hundred steps either way.
    init = jax.random.uniform(rng, (n_codes, dim), minval=-1.0, maxval=1.0)
    init = init * scale / np.sqrt(dim)
    # distinct buffers: the state may be donated to a jitted step
    return VQState(codebook=init, cluster_size=jnp.zeros(n_codes),
                   embed_avg=jnp.copy(init))


def nearest_code(codebook, z_flat):
    """argmin_k |z - e_k|^2 via the matmul expansion (MXU-friendly)."""
    dist = (
        jnp.sum(z_flat**2, axis=-1, keepdims=True)
        - 2.0 * z_flat @ codebook.T
        + jnp.sum(codebook**2, axis=-1)[None, :]
    )
    return jnp.argmin(dist, axis=-1)


def vq_quantize(state: VQState, z, mask=None, *, train=False, decay=0.99,
                commitment_weight=0.25, epsilon=1e-5):
    """Quantize z [..., D] against the codebook.

    Returns (z_q with straight-through gradients, indices, commit_loss,
    new_state).  `mask` (broadcastable to z[..., 0]) excludes padded
    positions from both the loss and the EMA statistics.
    """
    D = z.shape[-1]
    # restored states may hold host numpy arrays; make them traceable
    state = jax.tree.map(jnp.asarray, state)
    z_flat = z.reshape(-1, D)
    idx = nearest_code(state.codebook, z_flat)
    quantized = state.codebook[idx].reshape(z.shape)

    if mask is None:
        maskf = jnp.ones(z.shape[:-1], z.dtype)
    else:
        maskf = jnp.broadcast_to(mask, z.shape[:-1]).astype(z.dtype)
    m_flat = maskf.reshape(-1)

    diff = (z - jax.lax.stop_gradient(quantized)) ** 2
    denom = jnp.maximum(maskf.sum() * D, 1.0)
    commit_loss = commitment_weight * jnp.sum(diff * maskf[..., None]) / denom

    if train:
        n_codes = state.codebook.shape[0]
        onehot = jax.nn.one_hot(idx, n_codes, dtype=z.dtype) * m_flat[:, None]
        bins = onehot.sum(0)                      # [K]; global under DP
        dw = onehot.T @ jax.lax.stop_gradient(z_flat)
        cluster_size = state.cluster_size * decay + bins * (1 - decay)
        embed_avg = state.embed_avg * decay + dw * (1 - decay)
        n = cluster_size.sum()
        smoothed = (cluster_size + epsilon) / (n + n_codes * epsilon) * n
        codebook = embed_avg / smoothed[:, None]
        # freeze codes never assigned yet (smoothed ~ 0 would blow up)
        codebook = jnp.where(cluster_size[:, None] > 1e-3, codebook, state.codebook)
        new_state = VQState(codebook=codebook, cluster_size=cluster_size,
                            embed_avg=embed_avg)
    else:
        new_state = state

    z_q = z + jax.lax.stop_gradient(quantized - z)
    return z_q, idx.reshape(z.shape[:-1]), commit_loss, new_state


def vq_quantize_cosine(state: VQState, z, mask=None, *, train=False,
                       decay=0.99, commitment_weight=0.25, epsilon=1e-5):
    """Cosine-similarity VQ (reference 'low_cosvq_3'/'low3_num16_gumble_cos'
    variants, utils/vq_module.py:145-160): codes and inputs are L2-normalized
    for the nearest-neighbor search and the codebook lives on the sphere."""
    state = jax.tree.map(jnp.asarray, state)
    norm = lambda v: v / jnp.maximum(
        jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-8)
    sphere = VQState(codebook=norm(state.codebook),
                     cluster_size=state.cluster_size,
                     embed_avg=state.embed_avg)
    zn = norm(z)
    zq, idx, loss, new_state = vq_quantize(
        sphere, zn, mask, train=train, decay=decay,
        commitment_weight=commitment_weight, epsilon=epsilon)
    if train:
        new_state = new_state.replace(codebook=norm(new_state.codebook))
    # straight-through against the ORIGINAL (unnormalized) input
    return z + jax.lax.stop_gradient(zq - z), idx, loss, new_state


def _gumbel_onehot_st(rng, logits, *, temperature=1.0, reinmax=True):
    """Stochastic one-hot with straight-through gradients.

    Samples D ~ Categorical(softmax(logits + gumbel)) and returns a hard
    one-hot whose backward pass follows either the plain ST softmax or the
    second-order ReinMax estimator (Liu et al. 2023) — the estimator the
    reference's gumbel variant enables via `stochastic_sample_codes=True,
    straight_through=True, reinmax=True` (utils/vq_module.py:152-160)."""
    idx = jax.random.categorical(rng, logits / max(temperature, 1e-6), axis=-1)
    hard = jax.nn.one_hot(idx, logits.shape[-1], dtype=logits.dtype)
    if reinmax:
        # pi2 = 2*softmax(sg[log((D + softmax(logits/T))/2)] + logits
        #       - sg[logits]) - 0.5*softmax(logits); grad flows via logits
        pi0 = jax.nn.softmax(logits, axis=-1)
        pi1 = (hard + jax.nn.softmax(logits / max(temperature, 1e-6), -1)) / 2
        shift = jax.lax.stop_gradient(jnp.log(jnp.maximum(pi1, 1e-20)) - logits)
        pi1 = jax.nn.softmax(shift + logits, axis=-1)
        pi2 = 2.0 * pi1 - 0.5 * pi0
        soft = pi2
    else:
        soft = jax.nn.softmax(logits / max(temperature, 1e-6), axis=-1)
    return hard + soft - jax.lax.stop_gradient(soft), idx


def vq_quantize_gumbel(rng, state: VQState, z, mask=None, *, train=False,
                       decay=0.99, commitment_weight=0.25, epsilon=1e-5,
                       temperature=1.0, reinmax=True):
    """Gumbel/cosine VQ (reference 'low3_num16_gumble_cos',
    utils/vq_module.py:152-160): cosine-similarity logits over an
    L2-normalized codebook; at train time the code is SAMPLED with gumbel
    noise and gradients flow through a ReinMax straight-through one-hot;
    at eval time the argmax code is taken deterministically.

    The EMA codebook update uses the sampled hard assignments (masked),
    keeping the same global-reduction DP semantics as `vq_quantize`."""
    state = jax.tree.map(jnp.asarray, state)
    D = z.shape[-1]
    norm = lambda v: v / jnp.maximum(
        jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-8)
    cb = norm(state.codebook)
    z_flat = z.reshape(-1, D)
    zn = norm(z_flat)
    logits = zn @ cb.T                        # cosine similarity [N, K]

    if mask is None:
        maskf = jnp.ones(z.shape[:-1], z.dtype)
    else:
        maskf = jnp.broadcast_to(mask, z.shape[:-1]).astype(z.dtype)
    m_flat = maskf.reshape(-1)

    if train:
        assert rng is not None, "gumbel variant needs an rng at train time"
        onehot_st, idx = _gumbel_onehot_st(rng, logits,
                                           temperature=temperature,
                                           reinmax=reinmax)
        # soft-gradient path THROUGH the one-hot selection matmul
        quantized = (onehot_st @ cb).reshape(z.shape)
        hard = jax.nn.one_hot(idx, cb.shape[0], dtype=z.dtype) * m_flat[:, None]
        n_codes = cb.shape[0]
        bins = hard.sum(0)
        dw = hard.T @ jax.lax.stop_gradient(zn)
        cluster_size = state.cluster_size * decay + bins * (1 - decay)
        embed_avg = state.embed_avg * decay + dw * (1 - decay)
        n = cluster_size.sum()
        smoothed = (cluster_size + epsilon) / (n + n_codes * epsilon) * n
        codebook = embed_avg / smoothed[:, None]
        codebook = jnp.where(cluster_size[:, None] > 1e-3, norm(codebook),
                             state.codebook)
        new_state = VQState(codebook=codebook, cluster_size=cluster_size,
                            embed_avg=embed_avg)
    else:
        idx = jnp.argmax(logits, axis=-1)
        quantized = cb[idx].reshape(z.shape)
        new_state = state

    zq_sg = jax.lax.stop_gradient(quantized)
    diff = (norm(z.reshape(-1, D)).reshape(z.shape) - zq_sg) ** 2
    denom = jnp.maximum(maskf.sum() * D, 1.0)
    commit_loss = commitment_weight * jnp.sum(diff * maskf[..., None]) / denom

    if train:
        # gradients flow through the ReinMax one-hot selection (NOT the
        # plain identity ST — that is the whole point of the estimator)
        z_q = quantized
    else:
        z_q = z + jax.lax.stop_gradient(quantized - z)
    return z_q, idx.reshape(z.shape[:-1]), commit_loss, new_state


def vq_sample_stochastic(rng, state: VQState, z, temperature=1.0):
    """Gumbel/stochastic code sampling (reference stochastic_sample_codes):
    sample indices ~ softmax(-d^2 / temperature). Returns (z_q, idx)."""
    state = jax.tree.map(jnp.asarray, state)
    D = z.shape[-1]
    z_flat = z.reshape(-1, D)
    dist = (jnp.sum(z_flat**2, -1, keepdims=True)
            - 2 * z_flat @ state.codebook.T
            + jnp.sum(state.codebook**2, -1)[None])
    idx = jax.random.categorical(rng, -dist / max(temperature, 1e-6), axis=-1)
    zq = state.codebook[idx].reshape(z.shape)
    return z + jax.lax.stop_gradient(zq - z), idx.reshape(z.shape[:-1])


def orthogonal_reg_loss(codebook, weight=10.0, max_codes=None, rng=None):
    """Orthogonality regularizer on the codebook (reference 'orthogonal_vq',
    utils/vq_module.py:128-136): || C C^T - I ||^2 / K^2 * weight, optionally
    on a random subset of codes."""
    if max_codes is not None and codebook.shape[0] > max_codes:
        idx = jax.random.choice(rng, codebook.shape[0], (max_codes,),
                                replace=False)
        codebook = codebook[idx]
    n = codebook.shape[0]
    cb = codebook / jnp.maximum(
        jnp.linalg.norm(codebook, axis=-1, keepdims=True), 1e-8)
    gram = cb @ cb.T
    return weight * ((gram - jnp.eye(n)) ** 2).sum() / (n * n)


def multihead_vq_quantize(states, z, mask=None, *, train=False, decay=0.99,
                          commitment_weight=0.25):
    """Multi-head VQ (reference 'headvq', utils/vq_module.py:137-144): split
    the channel dim into len(states) heads, quantize each against its own
    codebook. Returns (z_q, indices [..., H], total commit loss, states)."""
    H = len(states)
    parts = jnp.split(z, H, axis=-1)
    outs, idxs, losses, new_states = [], [], 0.0, []
    for h in range(H):
        zq, idx, loss, st = vq_quantize(states[h], parts[h], mask, train=train,
                                        decay=decay,
                                        commitment_weight=commitment_weight)
        outs.append(zq)
        idxs.append(idx)
        losses = losses + loss
        new_states.append(st)
    return (jnp.concatenate(outs, -1), jnp.stack(idxs, -1), losses / H,
            new_states)


def residual_vq_quantize(states, z, mask=None, *, train=False, decay=0.99,
                         commitment_weight=0.25):
    """Residual VQ (SoundStream-style; extension — the reference's variant
    set stops at multi-head, utils/vq_module.py:98-163): stage i quantizes
    the residual left by stages < i against its own codebook, and the
    output is the SUM of stage codes.  Quantization error decays
    geometrically with stages at the same per-stage codebook size.

    Straight-through estimator applied ONCE around the summed hard codes
    (each stage's commitment loss still shapes its own input residual).
    Returns (z_q, indices [..., n_stages], mean commit loss, states)."""
    resid = z
    total = jnp.zeros_like(z)
    idxs, losses, new_states = [], 0.0, []
    for st in states:
        zq, idx, loss, ns = vq_quantize(st, resid, mask, train=train,
                                        decay=decay,
                                        commitment_weight=commitment_weight)
        hard = jax.lax.stop_gradient(zq)
        total = total + hard
        resid = resid - hard
        idxs.append(idx)
        losses = losses + loss
        new_states.append(ns)
    z_q = z + jax.lax.stop_gradient(total - z)
    return z_q, jnp.stack(idxs, -1), losses / len(states), new_states


def expire_dead_codes(rng, state: VQState, z, mask=None, threshold=2.0):
    """Replace codes with EMA cluster size below threshold by random batch
    vectors (reference 'Expiring_stalevq', utils/vq_module.py:122-127)."""
    state = jax.tree.map(jnp.asarray, state)
    D = z.shape[-1]
    z_flat = z.reshape(-1, D)
    n_codes = state.codebook.shape[0]
    pick = jax.random.randint(rng, (n_codes,), 0, z_flat.shape[0])
    replacements = z_flat[pick]
    dead = state.cluster_size < threshold
    codebook = jnp.where(dead[:, None], replacements, state.codebook)
    cluster_size = jnp.where(dead, threshold, state.cluster_size)
    embed_avg = jnp.where(dead[:, None], replacements * threshold,
                          state.embed_avg)
    return VQState(codebook=codebook, cluster_size=cluster_size,
                   embed_avg=embed_avg)


# ---------------------------------------------------------------------------
# FSQ (finite scalar quantization), levels like [7, 5, 5, 5, 5]
# (reference config: utils/vq_module.py:118-121)


def _round_ste(z):
    return z + jax.lax.stop_gradient(jnp.round(z) - z)


def fsq_quantize(z, levels):
    """FSQ: bound each channel, round to `levels` integers, renormalize.

    z: [..., len(levels)]. Returns (z_q in [-1, 1], flat indices).
    """
    levels = np.asarray(levels)
    assert z.shape[-1] == len(levels)
    half_l = (levels - 1) * (1 + 1e-3) / 2
    offset = np.where(levels % 2 == 0, 0.5, 0.0)
    shift = np.arctanh(offset / half_l)
    bounded = jnp.tanh(z + shift) * half_l - offset
    quantized = _round_ste(bounded)
    half_width = levels // 2
    z_q = quantized / half_width

    # codebook indices: mixed-radix encoding
    digits = jnp.round(bounded) + half_width  # in [0, levels)
    basis = np.concatenate([[1], np.cumprod(levels[:-1])])
    idx = jnp.sum(digits * basis, axis=-1).astype(jnp.int32)
    return z_q, idx


# ---------------------------------------------------------------------------
# factory (the reference's build_quantize, utils/vq_module.py:98-163):
# one name -> (init, quantize) pair the trainers/pipelines dispatch on.


class Quantizer:
    """Uniform interface over the VQ variants.

    quantize(state, z, mask, train, rng) -> (z_q, idx, commit_loss,
    new_state); state is None for the stateless FSQ."""

    KINDS = ("vqvae", "cosine", "orthogonal", "expire", "fsq", "rvq",
             "multihead", "gumbel")

    # the reference's build_quantize method strings (utils/vq_module.py:
    # 98-163) mapped onto our kinds, so every reference config loads as-is
    REFERENCE_ALIASES = {
        "vqema": "vqvae",                  # local VectorQuantizerEMA (:99)
        "vq_3": "vqvae",                   # dim=3 VectorQuantize (:112)
        "fsq_5": "fsq",                    # levels [7,5,5,5,5] (:118)
        "Expiring_stalevq": "expire",      # dead-code expiry (:122)
        "orthogonal_vq": "orthogonal",     # ortho reg weight 10 (:128)
        "headvq": "multihead",             # 8 heads, separate books (:137)
        "low_cosvq_3": "cosine",           # cosine sim, 16x codes (:145)
        "low3_num16_gumble_cos": "gumbel", # gumbel+reinmax+cosine (:152)
    }

    def __init__(self, kind, codebook_size=4096, dim=3, levels=None,
                 decay=0.99, commitment_weight=0.25, ortho_weight=10.0,
                 expire_threshold=2.0, n_stages=2, n_heads=None,
                 gumbel_temperature=1.0, reinmax=True):
        if kind in self.REFERENCE_ALIASES:
            # reference-specific defaults ride along with the alias
            if kind == "headvq" and not n_heads:
                n_heads = 8
            if kind in ("low_cosvq_3", "low3_num16_gumble_cos"):
                codebook_size = codebook_size * 16
            kind = self.REFERENCE_ALIASES[kind]
        if kind not in self.KINDS:
            raise ValueError(f"unknown quantize_type {kind!r}")
        self.kind = kind
        self.codebook_size = codebook_size
        self.dim = dim
        self.levels = levels or [7, 5, 5, 5, 5]
        self.decay = decay
        self.commitment_weight = commitment_weight
        self.ortho_weight = ortho_weight
        self.expire_threshold = expire_threshold
        self.n_stages = n_stages
        self.n_heads = n_heads
        self.gumbel_temperature = gumbel_temperature
        self.reinmax = reinmax
        if kind == "fsq" and dim != len(self.levels):
            raise ValueError(
                f"fsq needs vqdim == len(levels) ({len(self.levels)}), got {dim}")
        if kind == "multihead":
            if not n_heads:
                raise ValueError("multihead needs n_heads (-vq_heads)")
            if dim % n_heads:
                raise ValueError(f"vqdim {dim} must divide by n_heads {n_heads}")

    def init(self, rng):
        if self.kind == "fsq":
            return None
        if self.kind == "rvq":
            return [vq_init(jax.random.fold_in(rng, i), self.codebook_size,
                            self.dim) for i in range(self.n_stages)]
        if self.kind == "multihead":
            return [vq_init(jax.random.fold_in(rng, i), self.codebook_size,
                            self.dim // self.n_heads)
                    for i in range(self.n_heads)]
        return vq_init(rng, self.codebook_size, self.dim)

    def quantize(self, state, z, mask=None, *, train=False, rng=None):
        kw = dict(train=train, decay=self.decay,
                  commitment_weight=self.commitment_weight)
        if self.kind == "fsq":
            z_q, idx = fsq_quantize(z, self.levels)
            return z_q, idx, jnp.float32(0.0), None
        if self.kind == "rvq":
            return residual_vq_quantize(state, z, mask, **kw)
        if self.kind == "multihead":
            return multihead_vq_quantize(state, z, mask, **kw)
        if self.kind == "cosine":
            return vq_quantize_cosine(state, z, mask, **kw)
        if self.kind == "gumbel":
            if train and rng is None:
                raise ValueError("gumbel variant needs an rng at train time")
            return vq_quantize_gumbel(rng, state, z, mask, **kw,
                                      temperature=self.gumbel_temperature,
                                      reinmax=self.reinmax)
        z_q, idx, loss, new_state = vq_quantize(state, z, mask, **kw)
        if self.kind == "orthogonal":
            loss = loss + orthogonal_reg_loss(new_state.codebook,
                                              weight=self.ortho_weight)
        if self.kind == "expire" and train:
            assert rng is not None, "expire variant needs an rng"
            new_state = expire_dead_codes(rng, new_state, z, mask,
                                          threshold=self.expire_threshold)
        return z_q, idx, loss, new_state

    def snap(self, state, z):
        """Inference-time quantization: (z_q, flat code indices) with no
        state update — the eval/extract surface (works for every kind;
        multi-stage indices are flattened for usage histograms)."""
        z_q, idx, _, _ = self.quantize(state, z, mask=None, train=False)
        return z_q, idx.reshape(idx.shape[:z.ndim - 1] + (-1,))


def build_quantize(quantize_type, codebook_size=4096, dim=3, **kw):
    return Quantizer(quantize_type, codebook_size=codebook_size, dim=dim, **kw)
