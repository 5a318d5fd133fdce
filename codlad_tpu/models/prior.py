"""CG-only tensor-product prior network (reference:
models/vae_model.py:207-311 `e3nnPrior`).

Consumes only the C-alpha trace + residue types and emits per-residue
(mu, sigma) heads; used as the CG-conditioned prior of the GenZProt
baseline and as the test-time condition source.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from codlad_tpu.nn.basis import GaussianSmearing
from codlad_tpu.nn.irreps import Irreps, sh_l2
from codlad_tpu.nn.tensor_product import TPConv
from codlad_tpu.models.encoder import EdgeEmbed, flatten_edges, irrep_ladder, make_directed


class CGPrior(nn.Module):
    n_atom_basis: int = 36
    ns: int = 12
    nv: int = 4
    num_conv_layers: int = 3
    cg_max_radius: float = 26.0
    distance_embed_dim: int = 8
    in_edge_features: int = 4

    @nn.compact
    def __call__(self, batch):
        res_type = batch["res_type"]
        res_mask = batch["res_mask"]
        B, L = res_type.shape
        ns = self.ns
        sh_ir = Irreps("1x0e + 1x1o + 1x2e")
        ladder = irrep_ladder(ns, self.nv)

        cg_xyz = batch["cg_xyz_og"][:, 1:-1]
        c_edges, c_mask = make_directed(batch["cg_edges"], batch["cg_edges_mask"])
        c_src, c_dst, c_maskf = flatten_edges(c_edges, c_mask, L)
        cg_flat = cg_xyz.reshape(B * L, 3)
        r_IJ = cg_flat[c_dst] - cg_flat[c_src]
        cg_sh = sh_l2(r_IJ)
        zf = res_type.reshape(-1)
        attr = jnp.concatenate([
            zf[c_src, None].astype(cg_xyz.dtype),
            zf[c_dst, None].astype(cg_xyz.dtype),
            jnp.zeros((c_src.shape[0], self.in_edge_features), cg_xyz.dtype),
            GaussianSmearing(0.0, self.cg_max_radius, self.distance_embed_dim)(
                jnp.linalg.norm(r_IJ, axis=-1)),
        ], axis=-1)
        attr = EdgeEmbed(ns)(attr)
        feat = nn.Embed(30, ns)(res_type).reshape(B * L, ns)
        feat = feat * res_mask.reshape(-1, 1)

        for l in range(self.num_conv_layers):
            in_ir, out_ir = ladder[min(l, 3)], ladder[min(l + 1, 3)]
            attr_full = jnp.concatenate([attr, feat[c_src, :ns], feat[c_dst, :ns]], axis=-1)
            update = TPConv(in_irreps=tuple(in_ir), sh_irreps=tuple(sh_ir),
                            out_irreps=tuple(out_ir), n_edge_features=3 * ns,
                            hidden_features=3 * ns, residual=False)(
                feat, c_src, c_dst, attr_full, cg_sh, c_maskf)
            pad = update.shape[-1] - feat.shape[-1]
            feat = jnp.pad(feat, ((0, 0), (0, pad))) + update

        feat = feat.reshape(B, L, -1)

        def head(x):
            h = nn.Dense(self.n_atom_basis)(x)
            h = jnp.tanh(h)
            return nn.Dense(self.n_atom_basis)(h)

        mu = head(feat)
        logvar = head(feat)
        sigma = 1e-9 + jnp.exp(logvar / 2.0)
        m = res_mask[..., None]
        return mu * m, sigma * m
