"""Internal-coordinate decoders: latent -> [B, L, 13, 3] ic tensors.

Port of the reference "constraint-decoupled" decoders (reference:
models/vae_model.py:318-503): hard local geometry (bond lengths, and in the
base variant side-chain angles) comes from residue-type embedding lookups,
while angles/torsions that carry conformational information are predicted
by invariant message passing over the CG radius graph.

Two variants, as in the reference:
  * `ICDecoder` — side-chain dist AND angle are embedding lookups (PED/N6);
  * `ICDecoderAngle` — side-chain angles are also MLP-predicted, and the
    torsion blocks consume them (PDB/K3, Atlas/K4).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from codlad_tpu.nn.basis import ACTIVATIONS, InvariantMessage
from codlad_tpu.nn.graph import make_directed_batched, make_edge_ops


class _MLP2(nn.Module):
    """act -> Dense -> act -> Dense (reference dense-block shape)."""

    mid: int
    out: int
    activation: str = "swish"

    @nn.compact
    def __call__(self, x):
        act = ACTIVATIONS[self.activation]
        x = act(x)
        x = nn.Dense(self.mid)(x)
        x = act(x)
        return nn.Dense(self.out)(x)


class _ICDecoderBase(nn.Module):
    n_atom_basis: int = 36
    n_rbf: int = 15
    cutoff: float = 21.0
    num_conv: int = 4
    activation: str = "swish"
    res_embed_dim: int = 4
    predict_sc_angle: bool = False

    @nn.compact
    def __call__(self, batch, latents):
        """latents: [B, L, n_atom_basis] per-residue invariants."""
        res_type = batch["res_type"]
        res_mask = batch["res_mask"]
        B, L = res_type.shape
        F = self.n_atom_basis + self.res_embed_dim

        cg_xyz = batch["cg_xyz_og"][:, 1:-1]
        c_edges, c_mask = make_directed_batched(batch["cg_edges"],
                                                batch["cg_edges_mask"])
        ops = make_edge_ops(c_edges, c_mask, L)
        r_ij = ops.gather_dst(cg_xyz) - ops.gather_src(cg_xyz)
        dist = jnp.sqrt(jnp.sum(r_ij * r_ij, axis=-1) + 1e-8)

        bb_dist = nn.Embed(25, 3)(res_type)[..., None]       # [B, L, 3, 1]
        sc_dist = nn.Embed(25, 10)(res_type)[..., None]      # [B, L, 10, 1]

        s = jnp.concatenate([latents, nn.Embed(25, self.res_embed_dim)(res_type)], axis=-1)
        s = s * res_mask[..., None]

        for _ in range(self.num_conv):
            msg = InvariantMessage(F, F, self.n_rbf, self.cutoff)(s, dist, ops)
            v = ops.aggregate_to_src(msg, reduce="sum")
            s = s + _MLP2(F, F, self.activation)(v)

        bb_angle = _MLP2(3, 3, self.activation)(s)
        bb_torsion = _MLP2(3, 3, self.activation)(jnp.concatenate([s, bb_angle], axis=-1))

        if self.predict_sc_angle:
            sc_angle = _MLP2(10, 10, self.activation)(s)
            sc_s = jnp.concatenate([s, sc_angle], axis=-1)
            for _ in range(self.num_conv):
                sc_s = sc_s + _MLP2(F + 10, F + 10, self.activation)(sc_s)
            sc_torsion = _MLP2(10, 10, self.activation)(sc_s)
        else:
            sc_angle = nn.Embed(25, 10)(res_type)            # [B, L, 10]
            for _ in range(self.num_conv):
                s = s + _MLP2(F, F, self.activation)(s)
            sc_torsion = _MLP2(10, 10, self.activation)(s)

        ic_bb = jnp.concatenate(
            [bb_dist, bb_angle[..., None], bb_torsion[..., None]], axis=-1)
        ic_sc = jnp.concatenate(
            [sc_dist, sc_angle[..., None], sc_torsion[..., None]], axis=-1)
        return jnp.concatenate([ic_bb, ic_sc], axis=-2)       # [B, L, 13, 3]


class ICDecoder(_ICDecoderBase):
    predict_sc_angle: bool = False


class ICDecoderAngle(_ICDecoderBase):
    predict_sc_angle: bool = True
