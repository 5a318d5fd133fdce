"""Latent denoiser: ProteinMPNN-style kNN graph network with adaLN timestep
conditioning over per-residue latents.

TPU-first port of the reference Stage-2 backbone (reference:
models/latent_model.py:77-281 `ProteinMPNN_diffusion_new`): operates on the
framework's native padded [B, L, C] layout (no flat-graph reshaping), the
CG conditioning graph is rebuilt from coordinates on device each call, and
the whole forward is a stack of dense [B, L, K, H] message MLPs that lower
onto the MXU.

API notes vs the reference:
  * conditioning arrives as explicit arrays (res_type, cg_xyz, mask) rather
    than a raw-batch dict; callers running classifier-free-style doubled
    batches simply tile those arrays (reference latent_model.py:178-186).
  * the `y` argument is accepted for parity but unused, as in the reference
    (conditioning is structural; latent_model.py:175).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from codlad_tpu.nn.layers import FinalLayer, TimestepEmbedder
from codlad_tpu.nn.mpnn import (
    CAProteinFeatures,
    DecLayerDiffusion,
    EncLayerDiffusion,
    cat_neighbors_nodes,
    gather_nodes,
)


class MPNNDenoiser(nn.Module):
    hidden_dim: int = 128
    edge_features: int = 128
    node_features: int = 128
    num_encoder_layers: int = 3
    num_decoder_layers: int = 3
    vocab: int = 30
    k_neighbors: int = 64
    augment_eps: float = 0.0
    dropout: float = 0.6
    input_size: int = 3
    learn_sigma: bool = True
    decoder_mask: bool = False
    use_seq_in_encoder: bool = True
    use_input_decoding_order: bool = False
    self_condition: bool = False
    final_adln: bool = True

    @nn.compact
    def __call__(self, x, t, res_type, cg_xyz, mask, y=None, x_self_cond=None,
                 deterministic=True, augment_rng=None, decoding_rng=None):
        """
        x: [B, L, input_size] noisy latents; t: [B] timesteps (int or float);
        res_type: [B, L] residue ids; cg_xyz: [B, L, 3] C-alpha trace (Å);
        mask: [B, L] validity. Returns [B, L, input_size * (2 if learn_sigma
        else 1)].
        """
        B, L, _ = x.shape
        maskf = mask.astype(x.dtype)

        t = jnp.broadcast_to(jnp.atleast_1d(t), (B,))
        c = TimestepEmbedder(self.hidden_dim)(t)

        residue_idx = jnp.broadcast_to(jnp.arange(L)[None, :], (B, L))
        chain_labels = jnp.ones((B, L), dtype=x.dtype)

        E, E_idx = CAProteinFeatures(
            self.edge_features, top_k=self.k_neighbors,
            augment_eps=self.augment_eps,
        )(cg_xyz, maskf, residue_idx, chain_labels, rng=augment_rng)

        if self.self_condition:
            if x_self_cond is None:
                x_self_cond = jnp.zeros_like(x)
            x = jnp.concatenate([x_self_cond, x], axis=-1)

        h_V = nn.Dense(self.hidden_dim)(x)
        h_E = nn.Dense(self.hidden_dim)(E)

        mask_attend = gather_nodes(maskf[..., None], E_idx)[..., 0]
        mask_attend = maskf[..., None] * mask_attend
        for _ in range(self.num_encoder_layers):
            h_V, h_E = EncLayerDiffusion(self.hidden_dim, self.hidden_dim * 2,
                                         dropout=self.dropout)(
                h_V, h_E, E_idx, maskf, mask_attend, c=c,
                deterministic=deterministic)

        h_S = nn.Embed(self.vocab, self.hidden_dim)(res_type)
        h_ES = cat_neighbors_nodes(h_S, h_E, E_idx)
        h_EX_encoder = cat_neighbors_nodes(
            h_S if self.use_seq_in_encoder else jnp.zeros_like(h_S), h_E, E_idx)
        h_EXV_encoder = cat_neighbors_nodes(h_V, h_EX_encoder, E_idx)

        if self.decoder_mask:
            # Autoregressive-style masking from a random decoding order
            # (reference latent_model.py:236-256).  Requires a "decoding"
            # rng; the shipped config disables this path.
            randn = jax.random.normal(decoding_rng, (B, L))
            chain_m = maskf
            decoding_order = jnp.argsort((chain_m + 1e-4) * jnp.abs(randn), axis=-1)
            perm = jax.nn.one_hot(decoding_order, L, dtype=x.dtype)
            tri = 1.0 - jnp.triu(jnp.ones((L, L), dtype=x.dtype))
            order_mask_backward = jnp.einsum("ij,biq,bjp->bqp", tri, perm, perm)
            mask_attend_d = jnp.take_along_axis(order_mask_backward, E_idx, axis=2)[..., None]
            mask_1d = maskf[:, :, None, None]
            mask_bw = mask_1d * mask_attend_d
            mask_fw = mask_1d * (1.0 - mask_attend_d)
            h_EXV_encoder_fw = mask_fw * h_EXV_encoder
            for _ in range(self.num_decoder_layers):
                h_ESV = cat_neighbors_nodes(h_V, h_ES, E_idx)
                h_ESV = mask_bw * h_ESV + h_EXV_encoder_fw
                h_V = DecLayerDiffusion(self.hidden_dim, self.hidden_dim * 3,
                                        dropout=self.dropout)(
                    h_V, h_ESV, maskf, c=c, deterministic=deterministic)
        else:
            for _ in range(self.num_decoder_layers):
                h_ESV = cat_neighbors_nodes(h_V, h_ES, E_idx) + h_EXV_encoder
                h_V = DecLayerDiffusion(self.hidden_dim, self.hidden_dim * 3,
                                        dropout=self.dropout)(
                    h_V, h_ESV, maskf, c=c, deterministic=deterministic)

        out_size = self.input_size * (2 if self.learn_sigma else 1)
        if self.final_adln:
            return FinalLayer(self.hidden_dim, out_size)(h_V, c)
        return nn.Dense(out_size)(h_V)


def mpnn_diffusion(**kwargs):
    """The production Stage-2 config (reference latent_model.py:276-277)."""
    kwargs.setdefault("augment_eps", 0.0)
    kwargs.setdefault("decoder_mask", False)
    kwargs.setdefault("use_seq_in_encoder", True)
    return MPNNDenoiser(**kwargs)


MPNN_MODELS = {"mpnn_diffusion": mpnn_diffusion}
