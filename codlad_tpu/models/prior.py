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
from codlad_tpu.nn.graph import make_directed_batched, make_edge_ops
from codlad_tpu.nn.irreps import Irreps, sh_l2
from codlad_tpu.nn.tensor_product import TPConv
from codlad_tpu.models.encoder import EdgeEmbed, irrep_ladder


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
        c_edges, c_mask = make_directed_batched(batch["cg_edges"],
                                                batch["cg_edges_mask"])
        ops = make_edge_ops(c_edges, c_mask, L)
        # one gather per edge side: [xyz | res_type] payload (4 lanes)
        cgz_e = res_type[..., None].astype(cg_xyz.dtype)
        cgxz = jnp.concatenate([cg_xyz, cgz_e], axis=-1)
        g_src, g_dst = ops.gather_src(cgxz), ops.gather_dst(cgxz)
        r_IJ = g_dst[..., :3] - g_src[..., :3]
        cg_sh = sh_l2(r_IJ)
        attr = jnp.concatenate([
            g_src[..., 3:], g_dst[..., 3:],
            jnp.zeros(r_IJ.shape[:2] + (self.in_edge_features,), cg_xyz.dtype),
            GaussianSmearing(0.0, self.cg_max_radius, self.distance_embed_dim)(
                jnp.sqrt((r_IJ**2).sum(-1) + 1e-12)),
        ], axis=-1)
        attr = EdgeEmbed(ns)(attr)
        feat = nn.Embed(30, ns)(res_type)
        feat = feat * res_mask[..., None]

        for l in range(self.num_conv_layers):
            in_ir, out_ir = ladder[min(l, 3)], ladder[min(l + 1, 3)]
            gd_full = ops.gather_dst(feat)
            attr_full = jnp.concatenate(
                [attr, ops.gather_src(feat[..., :ns]),
                 gd_full[..., :ns]], axis=-1)
            update = TPConv(in_irreps=tuple(in_ir), sh_irreps=tuple(sh_ir),
                            out_irreps=tuple(out_ir), n_edge_features=3 * ns,
                            hidden_features=3 * ns, residual=False)(
                feat, ops, attr_full, cg_sh, x_dst=gd_full)
            pad = update.shape[-1] - feat.shape[-1]
            feat = jnp.pad(feat, ((0, 0), (0, 0), (0, pad))) + update

        def head(x):
            h = nn.Dense(self.n_atom_basis)(x)
            h = jnp.tanh(h)
            return nn.Dense(self.n_atom_basis)(h)

        mu = head(feat)
        logvar = head(feat)
        sigma = 1e-9 + jnp.exp(logvar / 2.0)
        m = res_mask[..., None]
        return mu * m, sigma * m
