"""ProteinMPNN-style kNN graph blocks with adaLN timestep conditioning.

TPU-first port of the reference denoiser building blocks (reference:
models/protein_mpnn_utils.py:97-523): dense padded [B, L, K] neighbor
tensors, masked pairwise distances + `lax.top_k` for the kNN graph, and
edge/node message MLPs that lower onto the MXU as large batched matmuls.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from codlad_tpu.nn.layers import torch_linear_init
from codlad_tpu.kernels.mpnn_kernels import (fused_message_edge,
                                             fused_message_edge_lnmod,
                                             fused_message_edge_lnmod_drop,
                                             fused_message_edge_lnmod_pdrop,
                                             fused_message_sum)


def gather_nodes(nodes, neighbor_idx):
    """nodes [B,N,C], idx [B,M,K] -> [B,M,K,C] (M may differ from N, e.g.
    single-position rows in the autoregressive decode)."""
    B, _, C = nodes.shape
    M, K = neighbor_idx.shape[1], neighbor_idx.shape[-1]
    flat = neighbor_idx.reshape(B, M * K, 1)
    out = jnp.take_along_axis(nodes, flat, axis=1)
    return out.reshape(B, M, K, C)


def make_neighbor_gather(E_idx, mode="auto", dtype=jnp.bfloat16,
                         n_nodes=None):
    """Neighbor-gather operand: {'idx': [B,L,K]} plus, in one-hot mode, the
    selection matrix {'onehot': [B, L*K, L]}.

    TPU dynamic gathers are ~4x slower than the equivalent one-hot matmul at
    MPNN shapes (and their backward is a scatter-add, worse still); since
    E_idx is fixed per conditioning batch, the one-hot is built once and
    every gather becomes an MXU batched GEMM.  Both the memory and the
    contraction FLOPs scale O(L^2 K), so 'auto' enables it only for
    L <= 256 — measured on v5e, the one-hot and dynamic-gather paths break
    even around L=512 and the selection matrices stop paying for
    themselves.

    mode='idx' skips the one-hot entirely — the right choice for operands
    consumed only by the fused Pallas chains, which build their selection
    matrices on the fly in VMEM (kernels/mpnn_kernels.py) and never want
    the [B, L*K, L] tensor in HBM.

    n_nodes: the gather-table length when it differs from the index rows
    (sequence-sharded runs: local rows, global indices into the full
    table).
    """
    B, L, K = E_idx.shape
    N = n_nodes if n_nodes is not None else L
    nbr = {"idx": E_idx}
    if mode == "onehot" or (mode == "auto" and N <= 256):
        nbr["onehot"] = jax.nn.one_hot(E_idx.reshape(B, L * K), N, dtype=dtype)
    return nbr


def gather_neighbors(nodes, nbr):
    """nodes [B,N,C] -> [B,M,K,C] via idx or one-hot matmul (M = the
    index rows; N = the table length — they differ under sequence
    sharding)."""
    if "onehot" in nbr:
        B, C = nodes.shape[0], nodes.shape[-1]
        M, K = nbr["idx"].shape[1], nbr["idx"].shape[2]
        oh = nbr["onehot"]
        out = jnp.einsum("bnl,blh->bnh", oh, nodes.astype(oh.dtype))
        return out.reshape(B, M, K, C).astype(nodes.dtype)
    return gather_nodes(nodes, nbr["idx"])


def gather_edges(edges, neighbor_idx):
    """edges [B,N,N,C], idx [B,N,K] -> [B,N,K,C]."""
    return jnp.take_along_axis(edges, neighbor_idx[..., None], axis=2)


def cat_neighbors_nodes(h_nodes, h_neighbors, E_idx):
    return jnp.concatenate([h_neighbors, gather_nodes(h_nodes, E_idx)], axis=-1)


class PositionWiseFeedForward(nn.Module):
    num_hidden: int
    num_ff: int

    @nn.compact
    def __call__(self, x):
        # torch-style init (nonzero biases) is REQUIRED here: with zero
        # biases PFF(0) = 0 and the trunk-gated adaLN layers gradient-
        # deadlock at init (see nn/layers.torch_linear_init)
        h = jax.nn.gelu(nn.Dense(self.num_ff,
                                 **torch_linear_init(x.shape[-1]))(x),
                        approximate=False)
        return nn.Dense(self.num_hidden,
                        **torch_linear_init(self.num_ff))(h)


class PositionalEncodings(nn.Module):
    """Relative sequence-offset one-hot -> linear (clipped at +/-32)."""

    num_embeddings: int
    max_relative_feature: int = 32

    @nn.compact
    def __call__(self, offset, mask):
        m = self.max_relative_feature
        d = jnp.clip(offset + m, 0, 2 * m) * mask + (1 - mask) * (2 * m + 1)
        d_onehot = jax.nn.one_hot(d, 2 * m + 2)
        return nn.Dense(self.num_embeddings)(d_onehot)


def _quaternions(Rm):
    """Rotation matrices [...,3,3] -> unit quaternions [...,4]."""
    diag = jnp.diagonal(Rm, axis1=-2, axis2=-1)
    Rxx, Ryy, Rzz = diag[..., 0], diag[..., 1], diag[..., 2]
    magnitudes = 0.5 * jnp.sqrt(
        jnp.abs(1 + jnp.stack([Rxx - Ryy - Rzz, -Rxx + Ryy - Rzz, -Rxx - Ryy + Rzz], axis=-1))
    )
    signs = jnp.sign(jnp.stack([
        Rm[..., 2, 1] - Rm[..., 1, 2],
        Rm[..., 0, 2] - Rm[..., 2, 0],
        Rm[..., 1, 0] - Rm[..., 0, 1],
    ], axis=-1))
    xyz = signs * magnitudes
    w = jnp.sqrt(jax.nn.relu(1 + diag.sum(-1, keepdims=True))) / 2.0
    q = jnp.concatenate([xyz, w], axis=-1)
    # degenerate frames (masked CA jumps) can give q == 0; clamp like
    # torch.nn.functional.normalize does
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)


def _normalize(v, axis=-1, eps=1e-8):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True), eps)


class CAProteinFeatures(nn.Module):
    """C-alpha-only structure featurizer -> (edge embeddings, kNN indices).

    Dense masked pairwise distances + top-k (reference:
    models/protein_mpnn_utils.py:347-523 `CA_ProteinFeatures`): 9 RBF sets
    over shifted C-alpha triplets, local-frame orientation quaternions, and
    relative positional encodings.
    """

    edge_features: int
    num_positional_embeddings: int = 16
    num_rbf: int = 16
    top_k: int = 30
    augment_eps: float = 0.0
    gather_mode: str = "auto"

    def _dist(self, X, mask):
        mask_2d = mask[:, None, :] * mask[:, :, None]
        dX = X[:, None, :, :] - X[:, :, None, :]
        D = mask_2d * jnp.sqrt(jnp.sum(dX**2, axis=-1) + 1e-6)
        D_max = jnp.max(D, axis=-1, keepdims=True)
        D_adjust = D + (1.0 - mask_2d) * D_max
        k = min(self.top_k, X.shape[1])
        neg_top, E_idx = jax.lax.top_k(-D_adjust, k)
        return -neg_top, E_idx

    def _rbf(self, D):
        D_min, D_max, D_count = 2.0, 22.0, self.num_rbf
        D_mu = jnp.linspace(D_min, D_max, D_count)
        D_sigma = (D_max - D_min) / D_count
        return jnp.exp(-(((D[..., None] - D_mu) / D_sigma) ** 2))

    def _get_rbf(self, A, B, nbr):
        """RBF(|A_i - B_nbr(i,k)|) without materializing [B, L, L]: gather
        the B points via the one-hot op, then norm directly."""
        Bn = gather_neighbors(B, nbr)                    # [B, L, K, 3]
        D_nbr = jnp.sqrt(jnp.sum((A[:, :, None, :] - Bn) ** 2, axis=-1) + 1e-6)
        return self._rbf(D_nbr)

    def _frames(self, X):
        """Per-node local backbone frames O [B, L, 9] from the Ca chain
        (the per-node half of the reference's _orientations_coarse,
        protein_mpnn_utils.py:397-443)."""
        dX = X[:, 1:, :] - X[:, :-1, :]
        dX_norm = jnp.linalg.norm(dX, axis=-1)
        dX_mask = ((3.6 < dX_norm) & (dX_norm < 4.0)).astype(X.dtype)
        dX = dX * dX_mask[..., None]
        U = _normalize(dX)
        u_2, u_1 = U[:, :-2], U[:, 1:-1]
        n_2 = _normalize(jnp.cross(u_2, u_1))
        o_1 = _normalize(u_2 - u_1)
        O = jnp.stack([o_1, n_2, jnp.cross(o_1, n_2)], axis=2)
        O = O.reshape(O.shape[0], O.shape[1], 9)
        return jnp.pad(O, ((0, 0), (1, 2), (0, 0)))

    def _orient_edges(self, X_rows, O_rows, X_full, O_full, nbr):
        """Per-edge orientation features (direction + quaternion) for the
        local rows, gathering neighbor frames/coords from the full
        tables."""
        O_neighbors = gather_neighbors(O_full, nbr)
        X_neighbors = gather_neighbors(X_full, nbr)
        Om = O_rows.reshape(O_rows.shape[0], O_rows.shape[1], 3, 3)
        On = O_neighbors.reshape(O_neighbors.shape[:3] + (3, 3))
        dXn = X_neighbors - X_rows[:, :, None, :]
        dU = _normalize(jnp.einsum("blij,blkj->blki", Om, dXn))
        Rmat = jnp.einsum("blji,blkjm->blkim", Om, On)
        Q = _quaternions(Rmat)
        return jnp.concatenate([dU, Q], axis=-1)

    @nn.compact
    def __call__(self, Ca, mask, residue_idx, chain_labels, rng=None,
                 seq=None):
        """seq=(axis_name, n_shards): sequence-sharded mode — Ca/mask/
        residue_idx/chain_labels hold this shard's rows, residue_idx
        carries GLOBAL positions, and the returned E_idx holds global
        indices.  The O(L²) distance/top-k is ring-streamed
        (parallel/sequence.ring_knn); per-node O(L) tables are
        all-gathered.  Parameters are identical to the dense mode."""
        if self.augment_eps > 0 and rng is not None:
            Ca = Ca + self.augment_eps * jax.random.normal(rng, Ca.shape, Ca.dtype)

        if seq is None:
            D_neighbors, E_idx = self._dist(Ca, mask)
            Ca_full, res_full, chain_full = Ca, residue_idx, chain_labels
            n_nodes = Ca.shape[1]
            loc = lambda tbl: tbl
        else:
            from codlad_tpu.parallel.sequence import (local_rows, ring_knn,
                                                      seq_all_gather)
            axis, n_shards = seq
            n_nodes = Ca.shape[1] * n_shards
            D_neighbors, E_idx = ring_knn(Ca, mask,
                                          min(self.top_k, n_nodes),
                                          axis, n_shards)
            Ca_full = seq_all_gather(Ca, axis)
            res_full = seq_all_gather(residue_idx, axis)
            chain_full = seq_all_gather(chain_labels, axis)
            loc = lambda tbl: local_rows(tbl, axis, n_shards)

        nbr = make_neighbor_gather(E_idx, mode=self.gather_mode,
                                   n_nodes=n_nodes)

        Ca_0 = jnp.pad(Ca_full[:, :-1], ((0, 0), (1, 0), (0, 0)))
        Ca_1 = Ca_full
        Ca_2 = jnp.pad(Ca_full[:, 1:], ((0, 0), (0, 1), (0, 0)))

        O_full = self._frames(Ca_full)
        O_features = self._orient_edges(loc(Ca_full), loc(O_full),
                                        Ca_full, O_full, nbr)

        rbf_all = [self._rbf(D_neighbors)]
        for A, Bc in [(Ca_0, Ca_0), (Ca_2, Ca_2), (Ca_0, Ca_1), (Ca_0, Ca_2),
                      (Ca_1, Ca_0), (Ca_1, Ca_2), (Ca_2, Ca_0), (Ca_2, Ca_1)]:
            rbf_all.append(self._get_rbf(loc(A), Bc, nbr))
        rbf_all = jnp.concatenate(rbf_all, axis=-1)

        # residue_idx is an arange per sample (global under seq), so
        # relative offsets derive from gathered neighbor positions
        offset = residue_idx[:, :, None] - gather_neighbors(
            res_full[..., None].astype(jnp.float32), nbr)[..., 0].astype(residue_idx.dtype)
        E_chains = (gather_neighbors(chain_full[..., None], nbr)[..., 0]
                    == chain_labels[:, :, None]).astype(jnp.int32)
        E_positional = PositionalEncodings(self.num_positional_embeddings)(offset, E_chains)

        # follow the coordinate dtype: linspace/one_hot default to f32 and
        # would otherwise promote the whole [B, L, K, ~420] edge stack —
        # and the downstream Dense/LayerNorm/W_e chain — to f32 under
        # bf16 training (measured ~4 ms/step of f32 traffic + layout
        # copies at B=128, L=128 on v5e)
        E = jnp.concatenate([E_positional, rbf_all, O_features],
                            axis=-1).astype(Ca.dtype)
        E = nn.Dense(self.edge_features, use_bias=False)(E)
        E = nn.LayerNorm()(E)
        return E, E_idx


def modulate(x, shift, scale):
    """x [B, L, ...] modulated by per-sample shift/scale [B, H]."""
    extra = x.ndim - 2
    shape = (x.shape[0],) + (1,) * extra + (x.shape[-1],)
    return x * (1 + scale.reshape(shape)) + shift.reshape(shape)


class SplitMessageChain(nn.Module):
    """The MPNN message MLP W3(gelu(W2(gelu(W1(cat[self, edge, nbr])))))
    with W1 split by input block so gathered tensors are transformed at
    node level FIRST and gathered after.

    Exactly equivalent to the concatenated form (W1 is linear; per-edge
    scalar masks commute with it), but it never materializes the
    [B, L, K, 3H] concat and turns 2/3 of the W1 FLOPs from per-edge into
    per-node work.  The per-edge part (edge matmul, in-VMEM gather, two
    gelu-matmuls, optional masked K-sum) runs as ONE fused Pallas kernel on
    TPU (see kernels/mpnn_kernels.py); gelu is the tanh approximation there.

    reduce_sum=True returns the masked sum over neighbors [B, L, H] / scale;
    False returns raw messages [B, L, K, H].
    """

    num_hidden: int
    reduce_sum: bool = False
    scale: float = 30.0
    edge_scale: float = 1.0

    @nn.compact
    def components(self, h_self, edge_pre_dim, nbr_node_pre):
        """The chain's node-level pieces + raw weights, for callers that
        feed a fused cross-layer kernel (kernels.fused_edge_then_sum):
        (A [B, L, H], Gn [B, N, H], W_e (edge_scale folded), W2, b2, W3,
        b3).  `edge_pre_dim` is the trailing dim of the edge operand (the
        W_e input width) — a static int, since the fused caller never
        materializes the edge tensor this chain would consume."""
        H = self.num_hidden
        # torch-parity init (see nn/layers.torch_linear_init): xavier
        # weights, nonzero uniform biases — the biases break the
        # adaLN-zero trunk-gating gradient deadlock
        A = nn.Dense(H, **torch_linear_init(h_self.shape[-1]))(h_self)
        Gn = nn.Dense(H, use_bias=False,
                      kernel_init=nn.initializers.xavier_uniform())(nbr_node_pre)
        init = nn.initializers.xavier_uniform()
        ubound = 1.0 / np.sqrt(H)
        uinit = lambda key, shape: jax.random.uniform(key, shape,
                                                      jnp.float32,
                                                      -ubound, ubound)
        W_e = self.param("W_e", init, (edge_pre_dim, H))
        W2 = self.param("W2", init, (H, H))
        b2 = self.param("b2", uinit, (H,))
        W3 = self.param("W3", init, (H, H))
        b3 = self.param("b3", uinit, (H,))
        if self.edge_scale != 1.0:
            W_e = W_e * self.edge_scale
        return A, Gn, W_e, W2, b2, W3, b3

    def __call__(self, h_self, edge_pre, nbr_node_pre, nbr, mask_attend=None,
                 ln_mod=None, keep=None, pdrop=None):
        """h_self: [B, L, H]; edge_pre: [B, L, K, H] per-edge features;
        nbr_node_pre: [B, L, H] node features gathered via the `nbr` op.

        ln_mod=(sh, sc, g): fuse the encoder's h_E epilogue
        g * modulate(LN(edge_pre + msg), sh, sc) into the kernel (saves two
        [B, L, K, H] HBM round trips per layer; reduce_sum=False only).
        keep (with ln_mod): [B, L, K, H] dropout scales (0 or 1/(1-p))
        applied to msg INSIDE the fused epilogue.
        pdrop (with ln_mod): (seeds [B] int32, p) — dropout whose mask is
        generated in VMEM by the TPU hardware PRNG (and regenerated in
        the backward): no mask generation or HBM mask traffic at all.
        This is the training path; `keep` remains for injecting an
        explicit mask (tests, parity checks).

        edge_scale: static scalar folded into W_e — callers whose edge
        input is c*h_E pass h_E and edge_scale=c instead of materializing
        a scaled [B, L, K, H] copy in HBM (W_e is linear)."""
        A, Gn, W_e, W2, b2, W3, b3 = self.components(
            h_self, edge_pre.shape[-1], nbr_node_pre)
        idx = nbr["idx"]
        onehot = nbr.get("onehot")
        if self.reduce_sum:
            if mask_attend is None:
                mask_attend = jnp.ones(idx.shape, A.dtype)
            return fused_message_sum(A, edge_pre, Gn, idx, onehot,
                                     mask_attend, W_e, W2, b2, W3, b3,
                                     self.scale)
        if ln_mod is not None:
            sh, sc, g = ln_mod
            if pdrop is not None:
                seeds, p = pdrop
                return fused_message_edge_lnmod_pdrop(
                    A, edge_pre, Gn, idx, onehot, W_e, W2, b2, W3, b3,
                    sh, sc, g, seeds, p)
            if keep is not None:
                return fused_message_edge_lnmod_drop(
                    A, edge_pre, Gn, idx, onehot, W_e, W2, b2, W3, b3,
                    sh, sc, g, keep)
            return fused_message_edge_lnmod(A, edge_pre, Gn, idx, onehot,
                                            W_e, W2, b2, W3, b3, sh, sc, g)
        return fused_message_edge(A, edge_pre, Gn, idx, onehot,
                                  W_e, W2, b2, W3, b3)


class EncLayerDiffusion(nn.Module):
    """Encoder layer: node+edge updates with 9-way adaLN modulation
    (reference: models/protein_mpnn_utils.py:208-271; message MLPs in the
    equivalent split-linear form, see SplitMessageChain)."""

    num_hidden: int
    num_in: int
    dropout: float = 0.1
    scale: float = 30.0
    gate_mode: str = "trunk"  # 'trunk' (reference) | 'residual' (DiT-style)
    seq: tuple | None = None  # (axis_name, n_shards) sequence sharding

    def setup(self):
        # attribute names mirror the previous nn.compact auto-names so
        # checkpoints stay loadable across the refactor
        self.Dense_0 = nn.Dense(9 * self.num_hidden,
                                kernel_init=nn.initializers.zeros,
                                bias_init=nn.initializers.zeros)
        self.SplitMessageChain_0 = SplitMessageChain(
            self.num_hidden, reduce_sum=True, scale=self.scale)
        self.PositionWiseFeedForward_0 = PositionWiseFeedForward(
            self.num_hidden, self.num_hidden * 4)
        self.SplitMessageChain_1 = SplitMessageChain(self.num_hidden)
        self.Dropout_0 = nn.Dropout(self.dropout)
        self.LayerNorm_0 = nn.LayerNorm(use_bias=False, use_scale=False,
                                        epsilon=1e-6)

    def mods(self, c):
        """The 9-way adaLN modulation splits for one conditioning batch."""
        return jnp.split(self.Dense_0(jax.nn.silu(c)), 9, axis=-1)

    def _tbl(self, v):
        # gather tables: with rows sharded over the sequence axis, the
        # chains gather neighbor state from the all-gathered full table
        # ([B, L, H] — cheap; the [B, L, K, H] edge work stays sharded)
        if self.seq is not None:
            from codlad_tpu.parallel.sequence import seq_all_gather
            return seq_all_gather(v, self.seq[0])
        return v

    def node_epilogue(self, h_V, dh, sh1, sc1, g1, sh2, sc2, g2,
                      mask_V=None, deterministic=True):
        """Trunk-mode h_V update from a precomputed node-message sum:
        LN -> modulate/gate -> PFF -> LN -> modulate/gate -> mask."""
        ln = self.LayerNorm_0
        drop = lambda x: self.Dropout_0(x, deterministic=deterministic)
        h_V = ln(h_V + drop(dh.astype(h_V.dtype)))
        h_V = g1[:, None, :] * modulate(h_V, sh1, sc1)
        dh2 = self.PositionWiseFeedForward_0(h_V)
        h_V = ln(h_V + drop(dh2))
        h_V = g2[:, None, :] * modulate(h_V, sh2, sc2)
        if mask_V is not None:
            h_V = mask_V[..., None] * h_V
        return h_V

    def node_half(self, h_V, h_E, nbr, mask_V, mask_attend, sh1, sc1, g1,
                  sh2, sc2, g2, deterministic=True):
        """Trunk-mode node update (message chain + epilogue) WITHOUT the
        edge update — the fused sampling path computes the edge update
        inside the previous pair's kernel."""
        dh = self.SplitMessageChain_0(h_V, h_E, self._tbl(h_V), nbr,
                                      mask_attend=mask_attend)
        return self.node_epilogue(h_V, dh, sh1, sc1, g1, sh2, sc2, g2,
                                  mask_V, deterministic)

    def __call__(self, h_V, h_E, nbr, mask_V=None, mask_attend=None, c=None,
                 deterministic=True):
        (sh1, sc1, g1, sh2, sc2, g2, sh3, sc3, g3) = self.mods(c)

        ln = self.LayerNorm_0
        drop = lambda x: self.Dropout_0(x, deterministic=deterministic)
        tbl = self._tbl

        if self.gate_mode == "residual":
            # DiT-style: gates scale the BRANCH, identity at init (the
            # reference zeroes the whole trunk through the gate,
            # protein_mpnn_utils.py:249,270 — see ROADMAP 7)
            x = modulate(ln(h_V), sh1, sc1)
            dh = self.SplitMessageChain_0(x, h_E, tbl(x), nbr,
                                          mask_attend=mask_attend)
            h_V = h_V + g1[:, None, :] * drop(dh.astype(h_V.dtype))
            x = modulate(ln(h_V), sh2, sc2)
            dh = self.PositionWiseFeedForward_0(x)
            h_V = h_V + g2[:, None, :] * drop(dh)
            if mask_V is not None:
                h_V = mask_V[..., None] * h_V
            xe = modulate(ln(h_E), sh3, sc3)
            h_message = self.SplitMessageChain_1(h_V, xe, tbl(h_V), nbr)
            h_E = h_E + g3[:, None, None, :] * drop(h_message.astype(h_E.dtype))
            return h_V, h_E

        h_V = self.node_half(h_V, h_E, nbr, mask_V, mask_attend,
                             sh1, sc1, g1, sh2, sc2, g2, deterministic)

        if deterministic or self.dropout == 0.0:
            # dropout is identity: fold LN + modulate/gate into the kernel
            h_E = self.SplitMessageChain_1(
                h_V, h_E, tbl(h_V), nbr, ln_mod=(sh3, sc3, g3))
        else:
            # training: dropout fused into the same kernel epilogue, mask
            # generated IN VMEM by the hardware PRNG from per-sample seeds
            # (an explicit [B, L, K, H] keep mask measured perf-NEUTRAL:
            # its own generation + three HBM passes cancel the fusion win)
            key = self.make_rng("dropout")
            seeds = jax.random.randint(key, (h_E.shape[0],), 0,
                                       np.iinfo(np.int32).max,
                                       dtype=jnp.int32)
            h_E = self.SplitMessageChain_1(
                h_V, h_E, tbl(h_V), nbr, ln_mod=(sh3, sc3, g3),
                pdrop=(seeds, self.dropout))
        return h_V, h_E


class DecLayerDiffusion(nn.Module):
    """Decoder layer: node updates with 6-way adaLN modulation (reference:
    models/protein_mpnn_utils.py:274-318).

    The decoder's message input cat[h_V_self, h_E-ish, h_S_nbr, h_V_nbr]
    (with the encoder-context sum folded in) is consumed in split-linear
    form: pass `edge_pre` ([B,L,K,H] per-edge block, e.g. 2*h_E for the
    summed non-masked path) and `s_node`/`v_node` ([B,L,H] node blocks,
    transformed per node then gathered via E_idx).
    """

    num_hidden: int
    num_in: int
    dropout: float = 0.1
    scale: float = 30.0
    gate_mode: str = "trunk"  # 'trunk' (reference) | 'residual' (DiT-style)
    masked: bool = False      # autoregressive (decoder_mask) configuration

    def setup(self):
        H = self.num_hidden
        # attribute names mirror the previous nn.compact auto-names so
        # checkpoints stay loadable across the refactor
        self.Dense_0 = nn.Dense(6 * H, kernel_init=nn.initializers.zeros,
                                bias_init=nn.initializers.zeros)
        self.PositionWiseFeedForward_0 = PositionWiseFeedForward(H, H * 4)
        self.Dropout_0 = nn.Dropout(self.dropout)
        self.LayerNorm_0 = nn.LayerNorm(use_bias=False, use_scale=False,
                                        epsilon=1e-6)
        if self.masked:
            xavier = nn.initializers.xavier_uniform()
            self.Dense_1 = nn.Dense(H, use_bias=False, kernel_init=xavier)
            self.Dense_2 = nn.Dense(H, use_bias=False, kernel_init=xavier)
            self.Dense_3 = nn.Dense(H, **torch_linear_init(H))
            self.Dense_4 = nn.Dense(H, use_bias=False, kernel_init=xavier)
            self.Dense_5 = nn.Dense(H, **torch_linear_init(H))
            self.Dense_6 = nn.Dense(H, **torch_linear_init(H))
        else:
            self.SplitMessageChain_0 = SplitMessageChain(
                H, reduce_sum=True, scale=self.scale)

    def mods(self, c):
        """The 6-way adaLN modulation splits for one conditioning batch."""
        return jnp.split(self.Dense_0(jax.nn.silu(c)), 6, axis=-1)

    def node_epilogue(self, h_V, dh, sh1, sc1, g1, sh2, sc2, g2,
                      mask_V=None, deterministic=True):
        """Trunk-mode h_V update from a precomputed node-message sum."""
        ln = self.LayerNorm_0
        drop = lambda x: self.Dropout_0(x, deterministic=deterministic)
        h_V = ln(h_V + drop(dh.astype(h_V.dtype)))
        h_V = g1[:, None, :] * modulate(h_V, sh1, sc1)
        dh2 = self.PositionWiseFeedForward_0(h_V)
        h_V = ln(h_V + drop(dh2))
        h_V = g2[:, None, :] * modulate(h_V, sh2, sc2)
        if mask_V is not None:
            h_V = mask_V[..., None] * h_V
        return h_V

    def __call__(self, h_V, nbr, edge_pre, s_node, v_node, mask_V=None,
                 mask_attend=None, c=None, deterministic=True,
                 edge_scale=1.0):
        sh1, sc1, g1, sh2, sc2, g2 = self.mods(c)

        ln = self.LayerNorm_0
        drop = lambda x: self.Dropout_0(x, deterministic=deterministic)
        act = lambda x: jax.nn.gelu(x, approximate=False)
        residual_gates = self.gate_mode == "residual"
        h_V_in = h_V
        if residual_gates:
            h_V = modulate(ln(h_V), sh1, sc1)

        if s_node.ndim == 3 and v_node.ndim == 3:
            # production path: node blocks concatenated -> one Dense inside
            # the fused chain (equals the sum of per-block Denses).
            # NB: SplitMessageChain.edge_scale is a module attribute; the
            # per-call edge_scale is folded into the chain's W_e here by
            # scaling the EDGE OPERAND's contribution equivalently — the
            # chain is constructed with edge_scale=1, so pass the scale
            # through the module attribute path kept below.
            dh = self._chain(h_V, edge_pre, s_node, v_node, nbr,
                             mask_attend, edge_scale)
        else:
            assert self.masked, (
                "per-edge node blocks require masked=True (decoder_mask)")
            # masked-decoder path: per-edge [B,L,K,H] blocks, explicit ops
            nbr_term = self.Dense_1(
                s_node if s_node.ndim == 4 else gather_neighbors(s_node, nbr))
            nbr_term = nbr_term + self.Dense_2(
                v_node if v_node.ndim == 4 else gather_neighbors(v_node, nbr))
            pre = (self.Dense_3(h_V)[:, :, None, :]
                   + self.Dense_4(edge_pre)
                   + nbr_term)
            h_message = self.Dense_5(act(self.Dense_6(act(pre))))
            if mask_attend is not None:
                h_message = mask_attend[..., None] * h_message
            dh = jnp.sum(h_message, axis=-2) / self.scale
        if residual_gates:
            h_V = h_V_in + g1[:, None, :] * drop(dh.astype(h_V_in.dtype))
            x = modulate(ln(h_V), sh2, sc2)
            dh = self.PositionWiseFeedForward_0(x)
            h_V = h_V + g2[:, None, :] * drop(dh)
            if mask_V is not None:
                h_V = mask_V[..., None] * h_V
            return h_V
        return self.node_epilogue(h_V_in, dh, sh1, sc1, g1, sh2, sc2, g2,
                                  mask_V, deterministic)

    def _chain(self, h_V, edge_pre, s_node, v_node, nbr, mask_attend,
               edge_scale):
        A, Gn, W_e, W2, b2, W3, b3 = self.SplitMessageChain_0.components(
            h_V, edge_pre.shape[-1],
            jnp.concatenate([s_node, v_node], axis=-1))
        if edge_scale != 1.0:
            W_e = W_e * edge_scale
        from codlad_tpu.kernels.mpnn_kernels import fused_message_sum
        idx = nbr["idx"]
        if mask_attend is None:
            mask_attend = jnp.ones(idx.shape, A.dtype)
        return fused_message_sum(A, edge_pre, Gn, idx, nbr.get("onehot"),
                                 mask_attend, W_e, W2, b2, W3, b3,
                                 self.scale)


class ProteinFeatures(nn.Module):
    """Full-backbone featurizer: 25 RBF sets over N/CA/C/O + virtual Cb
    (reference: models/protein_mpnn_utils.py:526-621; unused by the shipped
    ca_only=True config but part of the component inventory).

    Takes X [B, L, 4, 3] (N, CA, C, O) and returns (E, E_idx) like
    CAProteinFeatures; the kNN graph is built on CA distances.
    """

    edge_features: int
    num_positional_embeddings: int = 16
    num_rbf: int = 16
    top_k: int = 30
    augment_eps: float = 0.0
    gather_mode: str = "auto"

    def _rbf(self, D):
        D_mu = jnp.linspace(2.0, 22.0, self.num_rbf)
        D_sigma = 20.0 / self.num_rbf
        return jnp.exp(-(((D[..., None] - D_mu) / D_sigma) ** 2))

    @nn.compact
    def __call__(self, X, mask, residue_idx, chain_labels, rng=None):
        if self.augment_eps > 0 and rng is not None:
            X = X + self.augment_eps * jax.random.normal(rng, X.shape, X.dtype)

        N, Ca, C, O = X[:, :, 0], X[:, :, 1], X[:, :, 2], X[:, :, 3]
        # virtual C-beta from ideal backbone geometry (reference :542-546)
        b = Ca - N
        c = C - Ca
        a = jnp.cross(b, c)
        Cb = -0.58273431 * a + 0.56802827 * b - 0.54067466 * c + Ca

        mask_2d = mask[:, None, :] * mask[:, :, None]
        dX = Ca[:, None, :, :] - Ca[:, :, None, :]
        D = mask_2d * jnp.sqrt(jnp.sum(dX**2, axis=-1) + 1e-6)
        D_adjust = D + (1.0 - mask_2d) * jnp.max(D, axis=-1, keepdims=True)
        k = min(self.top_k, X.shape[1])
        neg_top, E_idx = jax.lax.top_k(-D_adjust, k)
        nbr = make_neighbor_gather(E_idx, mode=self.gather_mode)

        atoms = [Ca, N, C, O, Cb]
        # 25 ordered (A, B) pairs (reference :560-585)
        rbf_all = []
        for A_at in atoms:
            for B_at in atoms:
                Bn = gather_neighbors(B_at, nbr)
                Dn = jnp.sqrt(jnp.sum((A_at[:, :, None, :] - Bn) ** 2, -1) + 1e-6)
                rbf_all.append(self._rbf(Dn))
        rbf_all = jnp.concatenate(rbf_all, axis=-1)

        offset = residue_idx[:, :, None] - gather_neighbors(
            residue_idx[..., None].astype(jnp.float32), nbr)[..., 0].astype(residue_idx.dtype)
        E_chains = (gather_neighbors(chain_labels[..., None], nbr)[..., 0]
                    == chain_labels[:, :, None]).astype(jnp.int32)
        E_positional = PositionalEncodings(self.num_positional_embeddings)(offset, E_chains)
        E = jnp.concatenate([E_positional, rbf_all], axis=-1).astype(X.dtype)
        E = nn.Dense(self.edge_features, use_bias=False)(E)
        E = nn.LayerNorm()(E)
        return E, E_idx
