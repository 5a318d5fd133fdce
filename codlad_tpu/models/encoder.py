"""E(3) tensor-product graph encoder over atom14 proteins.

TPU-first port of the reference Stage-1 encoder (reference:
models/vae_model.py:21-204 `e3nnEncoder`): three interleaved graphs —

  * atom radius graph (per-sample padded edge list; gathers/aggregation as
    one-hot MXU contractions, see nn/graph.py — TPU row gathers and
    scatter-add backwards are serial at these edge counts),
  * CG radius graph,
  * atom<->CG cross graph — which in the atom14 layout is DENSE: every atom
    couples to exactly its own residue site, so the cross convolutions
    become per-slot tensor products and the atom->CG aggregation is a
    masked mean over the 14 slots (no scatter at all).

The irreps ladder is `ns x0e -> +nv x1o -> +nv x1e -> +ns x0o` with
spherical-harmonic edges (lmax=2), and the invariant readout concatenates
atom and CG features, residue-averages, and projects to the latent width.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from codlad_tpu.geometry import residues as R
from codlad_tpu.nn.basis import GaussianSmearing
from codlad_tpu.nn.graph import make_directed_batched, make_edge_ops
from codlad_tpu.nn.irreps import Irreps, sh_l2
from codlad_tpu.nn.tensor_product import FullyConnectedTP, TPConv


def irrep_ladder(ns, nv):
    return [
        Irreps(f"{ns}x0e"),
        Irreps(f"{ns}x0e + {nv}x1o"),
        Irreps(f"{ns}x0e + {nv}x1o + {nv}x1e"),
        Irreps(f"{ns}x0e + {nv}x1o + {nv}x1e + {ns}x0o"),
    ]


class EdgeEmbed(nn.Module):
    ns: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.ns)(x)
        h = nn.relu(h)
        return nn.Dense(self.ns)(h)


class E3Encoder(nn.Module):
    n_atom_basis: int = 36
    ns: int = 12
    nv: int = 4
    num_conv_layers: int = 3
    atom_max_radius: float = 14.0
    cg_max_radius: float = 26.0
    cross_max_distance: float = 26.0
    distance_embed_dim: int = 8
    cross_distance_embed_dim: int = 8
    in_edge_features: int = 4
    compute_dtype: str = "float32"   # 'bfloat16': run the TP feature path
                                     # in bf16 (geometry stays f32)

    @nn.compact
    def __call__(self, batch):
        """batch: padded dict (see data/batch.py). Returns [B, L,
        n_atom_basis] per-residue invariant latents."""
        res_type = batch["res_type"]
        B, L = res_type.shape
        NA = L * R.MAX_ATOMS
        ns = self.ns
        sh_ir = Irreps("1x0e + 1x1o + 1x2e")
        ladder = irrep_ladder(ns, self.nv)

        atom_z = jnp.asarray(R.ATOM14_ATOMIC_NUM)[res_type]          # [B, L, 14]
        atom_mask = batch["atom_mask"]
        xyz = batch["xyz14"]                                          # [B, L, 14, 3]
        cg_xyz = batch["cg_xyz_og"][:, 1:-1]                          # [B, L, 3]
        res_mask = batch["res_mask"]

        xyz_a = xyz.reshape(B, NA, 3)
        zf = (atom_z * atom_mask).reshape(B, NA)

        # ---- atom graph (edge ops built once, reused by every layer)
        a_edges, a_mask = make_directed_batched(batch["atom_edges"],
                                                batch["atom_edges_mask"])
        a_ops = make_edge_ops(a_edges, a_mask, NA)
        # one gather per edge side: [xyz | z] payload (4 lanes) — each
        # extra gather pays a full [TE, NA] one-hot build in the kernel
        zf_e = zf[..., None].astype(xyz.dtype)
        xyzz = jnp.concatenate([xyz_a, zf_e], axis=-1)                # [B, NA, 4]
        g_src, g_dst = a_ops.gather_src(xyzz), a_ops.gather_dst(xyzz)
        r_ij = g_dst[..., :3] - g_src[..., :3]
        atom_sh = sh_l2(r_ij)
        a_attr = jnp.concatenate([
            g_src[..., 3:], g_dst[..., 3:],
            jnp.zeros(r_ij.shape[:2] + (self.in_edge_features,), xyz.dtype),
            GaussianSmearing(0.0, self.atom_max_radius, self.distance_embed_dim)(
                jnp.sqrt((r_ij**2).sum(-1) + 1e-12)),
        ], axis=-1)
        a_attr = EdgeEmbed(ns)(a_attr)
        atom_feat = nn.Embed(30, ns)(zf.astype(jnp.int32))            # [B, NA, ns]
        atom_feat = atom_feat * atom_mask.reshape(B, NA, 1)

        # bf16 feature path: the per-edge TP tensors dominate HBM traffic;
        # SH/attrs are computed from f32 geometry first, then cast
        cdt = jnp.dtype(self.compute_dtype)
        if cdt != jnp.float32:
            cast = lambda v: v.astype(cdt)
            atom_feat, a_attr, atom_sh = map(cast, (atom_feat, a_attr, atom_sh))

        # ---- CG graph
        c_edges, c_mask = make_directed_batched(batch["cg_edges"],
                                                batch["cg_edges_mask"])
        c_ops = make_edge_ops(c_edges, c_mask, L)
        cgz_e = res_type[..., None].astype(xyz.dtype)
        cgxz = jnp.concatenate([cg_xyz, cgz_e], axis=-1)              # [B, L, 4]
        cg_src, cg_dst = c_ops.gather_src(cgxz), c_ops.gather_dst(cgxz)
        r_IJ = cg_dst[..., :3] - cg_src[..., :3]
        cg_sh = sh_l2(r_IJ)
        c_attr = jnp.concatenate([
            cg_src[..., 3:], cg_dst[..., 3:],
            jnp.zeros(r_IJ.shape[:2] + (self.in_edge_features,), xyz.dtype),
            GaussianSmearing(0.0, self.cg_max_radius, self.distance_embed_dim)(
                jnp.sqrt((r_IJ**2).sum(-1) + 1e-12)),
        ], axis=-1)
        c_attr = EdgeEmbed(ns)(c_attr)
        cg_feat = nn.Embed(30, ns)(res_type)                          # [B, L, ns]
        cg_feat = cg_feat * res_mask[..., None]
        if cdt != jnp.float32:
            cg_feat, c_attr, cg_sh = map(cast, (cg_feat, c_attr, cg_sh))

        # ---- cross graph: dense atom <-> own-residue site
        r_iI = xyz - cg_xyz[:, :, None, :]                            # [B, L, 14, 3]
        cross_sh = sh_l2(r_iI)
        cross_attr = GaussianSmearing(0.0, self.cross_max_distance,
                                      self.cross_distance_embed_dim)(
            jnp.linalg.norm(r_iI, axis=-1))
        cross_attr = EdgeEmbed(ns)(cross_attr)                        # [B, L, 14, ns]
        if cdt != jnp.float32:
            cross_attr, cross_sh = map(cast, (cross_attr, cross_sh))
        amask_f = atom_mask.astype(cdt if cdt != jnp.float32 else xyz.dtype)

        for l in range(self.num_conv_layers):
            in_ir = ladder[min(l, 3)]
            out_ir = ladder[min(l + 1, 3)]
            conv = dict(in_irreps=tuple(in_ir), sh_irreps=tuple(sh_ir),
                        out_irreps=tuple(out_ir), n_edge_features=3 * ns,
                        hidden_features=3 * ns, residual=False)

            # atom intra-graph messages; the dst gather runs ONCE — its
            # scalar prefix feeds the edge attrs, the full width feeds the
            # conv's tensor product (x_dst)
            gd_full = a_ops.gather_dst(atom_feat)
            a_attr_full = jnp.concatenate(
                [a_attr, a_ops.gather_src(atom_feat[..., :ns]),
                 gd_full[..., :ns]], axis=-1)
            atom_intra = TPConv(**conv)(atom_feat, a_ops, a_attr_full,
                                        atom_sh, x_dst=gd_full)

            # CG -> atom cross messages (dense: one CG parent per atom)
            af4 = atom_feat.reshape(B, L, R.MAX_ATOMS, -1)
            cross_full = jnp.concatenate([
                cross_attr,
                af4[..., :ns],
                jnp.broadcast_to(cg_feat[:, :, None, :ns],
                                 (B, L, R.MAX_ATOMS, ns)),
            ], axis=-1)
            tp_c2a = FullyConnectedTP(tuple(in_ir), tuple(sh_ir), tuple(out_ir))
            hidden = 3 * ns
            w = nn.Dense(tp_c2a.weight_numel)(nn.relu(nn.Dense(hidden)(cross_full)))
            atom_inter = tp_c2a(
                jnp.broadcast_to(cg_feat[:, :, None, :],
                                 (B, L, R.MAX_ATOMS, cg_feat.shape[-1])),
                cross_sh, w)
            atom_inter = (atom_inter * amask_f[..., None]).reshape(B, NA, -1)

            if l != self.num_conv_layers - 1:
                cgd_full = c_ops.gather_dst(cg_feat)
                c_attr_full = jnp.concatenate(
                    [c_attr, c_ops.gather_src(cg_feat[..., :ns]),
                     cgd_full[..., :ns]], axis=-1)
                cg_intra = TPConv(**conv)(cg_feat, c_ops, c_attr_full,
                                          cg_sh, x_dst=cgd_full)
                # atom -> CG: masked mean over the residue's atom slots
                tp_a2c = FullyConnectedTP(tuple(in_ir), tuple(sh_ir), tuple(out_ir))
                w2 = nn.Dense(tp_a2c.weight_numel)(nn.relu(nn.Dense(hidden)(cross_full)))
                msg_a2c = tp_a2c(af4, cross_sh, w2)
                msg_a2c = msg_a2c * amask_f[..., None]
                denom = jnp.maximum(amask_f.sum(-1, keepdims=True), 1.0)
                cg_inter = msg_a2c.sum(2) / denom

            pad = atom_intra.shape[-1] - atom_feat.shape[-1]
            atom_feat = jnp.pad(atom_feat, ((0, 0), (0, 0), (0, pad))) \
                + atom_intra + atom_inter

            if l != self.num_conv_layers - 1:
                padc = cg_intra.shape[-1] - cg_feat.shape[-1]
                cg_feat = jnp.pad(cg_feat, ((0, 0), (0, 0), (0, padc))) \
                    + cg_intra + cg_inter

        # readout: concat atom features with their residue's CG features,
        # residue-mean, project (reference vae_model.py:161-164)
        af4 = atom_feat.reshape(B, L, R.MAX_ATOMS, -1)
        node = jnp.concatenate([
            af4,
            jnp.broadcast_to(cg_feat[:, :, None, :],
                             (B, L, R.MAX_ATOMS, cg_feat.shape[-1])),
        ], axis=-1)
        node = node * amask_f[..., None]
        denom = jnp.maximum(amask_f.sum(-1, keepdims=True), 1.0)
        per_res = (node.sum(2) / denom).astype(jnp.float32)            # [B, L, 84]

        h = nn.Dense(self.n_atom_basis)(per_res)
        h = jnp.tanh(h)
        h = nn.Dense(self.n_atom_basis)(h)
        return h * res_mask[..., None]
