"""Stage-1 (VQ-VAE) multi-term reconstruction loss on the padded layout.

Port of the reference 7-term objective (reference:
utils/train_module.py:167-457 `train_loop`) as a pure function:

  loss = 5*bond + angle + delta*torsion + eta*xyz + omega*graph
         + zeta*clash + theta*interaction + vq_commit + beta*KL

All normalizations reproduce the reference's semantics on masked padded
tensors: ic terms divide by the total count of valid ic rows
(`natom_batch`, train_module.py:250), the xyz term averages squared
residuals over existing atoms with interior-endpoint residues zeroed, and
edge terms are masked means over their padded lists.  The `ic_to_xyz14`
rebuild runs inside the jitted loss (the reference prints what % of a step
it costs — here it fuses into the graph).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from codlad_tpu.geometry.internal import ic_to_xyz14

EPS = 1e-7


@dataclasses.dataclass(frozen=True)
class LossWeights:
    """(reference train_vqvae.py:349-356 defaults)."""

    beta: float = 1e-4    # KL
    delta: float = 1.0    # torsion
    eta: float = 1.0      # xyz
    zeta: float = 5.0     # clash
    omega: float = 3.0    # graph (GED)
    theta: float = 0.0    # interaction

    def dynamic(self, epoch, dynamic_loss=True):
        """Reference schedule: epoch 0 disables xyz+clash; epoch > 20
        doubles clash (train_module.py:197-202)."""
        eta, zeta = self.eta, self.zeta
        if dynamic_loss and epoch == 0:
            eta, zeta = 0.0, 0.0
        if dynamic_loss and epoch > 20:
            zeta = zeta * 2
        return dataclasses.replace(self, eta=eta, zeta=zeta)


def _masked_edge_dist(xyz_flat, edges, mask, eps=EPS):
    """edges [B, E, 2] into per-sample flat atom space; xyz_flat [B, N, 3]."""
    p0 = jnp.take_along_axis(xyz_flat, edges[..., 0:1], axis=1)
    p1 = jnp.take_along_axis(xyz_flat, edges[..., 1:2], axis=1)
    d = jnp.sqrt(((p0 - p1) ** 2).sum(-1) + eps)
    return d, mask.astype(d.dtype)


def _mean(x, m):
    return (x * m).sum() / jnp.maximum(m.sum(), 1.0)


def vqvae_loss_terms(batch, ic_recon, weights: LossWeights):
    """Geometric losses shared by VQ-VAE and GenZProt training.

    Returns (recon_loss, metrics dict). VQ/KL terms are added by callers.
    """
    B, L = batch["res_type"].shape
    ic = batch["ic"]
    ic_mask = batch["ic_mask"].astype(ic.dtype)          # [B, L, 13]
    natom = jnp.maximum(ic_mask.sum(), 1.0)

    # --- bond / angle / torsion (reference train_module.py:252-260)
    d_bond = (ic_recon[..., 0] - ic[..., 0]) * ic_mask
    loss_bond = (d_bond**2).sum() / natom
    loss_angle = (jnp.sqrt(2 * (1 - jnp.cos(ic[..., 1] - ic_recon[..., 1])) + EPS)
                  * ic_mask).sum() / natom
    loss_torsion = (jnp.sqrt(2 * (1 - jnp.cos(ic[..., 2] - ic_recon[..., 2])) + EPS)
                    * ic_mask).sum() / natom

    # --- Cartesian rebuild + xyz loss
    xyz_recon = ic_to_xyz14(batch["cg_xyz_og"], ic_recon, batch["res_type"])
    atom_mask = batch["atom_mask"].astype(ic.dtype)      # [B, L, 14]
    # interior-endpoint residues are zeroed on both sides (reference
    # mask_xyz_list handling, train_module.py:279-281) but still counted.
    keep = (1.0 - batch["endpoint_mask"].astype(ic.dtype))[..., None] * atom_mask
    xyz_ref = batch["xyz14"] * keep[..., None]
    xyz_gen = xyz_recon * keep[..., None]
    sq = ((xyz_gen - xyz_ref) ** 2).sum(-1)
    loss_xyz = (sq * atom_mask).sum() / jnp.maximum(atom_mask.sum(), 1.0)

    # --- flat per-sample atom space for edge terms
    N = L * batch["xyz14"].shape[2]
    gen_flat = xyz_gen.reshape(B, N, 3)
    ref_flat = xyz_ref.reshape(B, N, 3)

    gen_d, bmask = _masked_edge_dist(gen_flat, batch["bond_edges"], batch["bond_edges_mask"])
    ref_d, _ = _masked_edge_dist(ref_flat, batch["bond_edges"], batch["bond_edges_mask"])
    loss_graph = _mean((gen_d - ref_d) ** 2, bmask)

    clash_d, cmask = _masked_edge_dist(gen_flat, batch["clash_edges"], batch["clash_edges_mask"])
    loss_nbr = _mean(jax.nn.relu(2.0 - clash_d), cmask)
    no_d, nmask = _masked_edge_dist(gen_flat, batch["bb_no_edges"], batch["bb_no_edges_mask"])
    loss_bb_no = _mean(jax.nn.relu(2.2 - no_d), nmask)
    loss_clash = loss_nbr + loss_bb_no

    # --- interaction score (reference train_module.py:348-372)
    int_d, imask = _masked_edge_dist(gen_flat, batch["inter_edges"], batch["inter_edges_mask"])
    n_inter = imask.sum()
    pp = batch["pipi_pairs"]
    ppm = batch["pipi_pairs_mask"].astype(ic.dtype)
    c0 = 0.5 * (jnp.take_along_axis(gen_flat, pp[..., 0:1], 1)
                + jnp.take_along_axis(gen_flat, pp[..., 1:2], 1))
    c1 = 0.5 * (jnp.take_along_axis(gen_flat, pp[..., 2:3], 1)
                + jnp.take_along_axis(gen_flat, pp[..., 3:4], 1))
    pp_d = jnp.sqrt(((c0 - c1) ** 2).sum(-1) + EPS)
    n_pipi = ppm.sum()
    n_tot = jnp.maximum(n_inter + n_pipi, 1.0)
    loss_inter = (_mean(jax.nn.relu(int_d - 4.0), imask) * n_inter / n_tot
                  + _mean(jax.nn.relu(pp_d - 6.0), ppm) * n_pipi / n_tot)

    w = weights
    recon = (5.0 * loss_bond + loss_angle + w.delta * loss_torsion
             + w.eta * loss_xyz + w.omega * loss_graph + w.zeta * loss_clash
             + w.theta * loss_inter)

    metrics = {
        "bond": loss_bond, "angle": loss_angle, "torsion": loss_torsion,
        "xyz": loss_xyz, "graph": loss_graph, "clash": loss_clash,
        "inter": loss_inter, "recon": recon,
    }
    return recon, metrics


def _mask_gaussian_inputs(mask, mu, sigma):
    """Replace padded positions with the standard normal BEFORE any ratio:
    a masked-out `0 * term` cannot rescue an overflowed/NaN `term` (inf * 0
    = NaN), so the inputs themselves must be neutral there."""
    m = mask[..., None]
    return jnp.where(m, mu, 0.0), jnp.where(m, sigma, 1.0)


def kl_standard_normal(mu, sigma, mask=None):
    """KL(N(mu, sigma) || N(0, 1)) summed over channels, masked mean over
    residues (reference train_module.py:154-156)."""
    if mask is not None:
        mu, sigma = _mask_gaussian_inputs(mask, mu, sigma)
    kl = -0.5 * jnp.sum(1 + jnp.log(sigma**2 + 1e-20) - mu**2 - sigma**2, axis=-1)
    if mask is None:
        return kl.mean()
    m = mask.astype(kl.dtype)
    return (kl * m).sum() / jnp.maximum(m.sum(), 1.0)


def kl_gaussians(mu1, sigma1, mu2, sigma2, mask=None):
    """KL between diagonal Gaussians, the GenZProt prior term (reference
    train_module.py:158-164, including its sigma2-not-squared quirk in the
    mean term)."""
    if mask is not None:
        mu1, sigma1 = _mask_gaussian_inputs(mask, mu1, sigma1)
        mu2, sigma2 = _mask_gaussian_inputs(mask, mu2, sigma2)
    term = (
        (sigma1**2 / (sigma2**2 + 1e-20)).sum(-1)
        + ((mu1 - mu2) ** 2 / (sigma2 + 1e-20)).sum(-1)
        + jnp.log(sigma2**2 + 1e-20).sum(-1)
        - jnp.log(sigma1**2 + 1e-20).sum(-1)
        - mu1.shape[-1]
    ) * 0.5
    if mask is None:
        return term.mean()
    m = mask.astype(term.dtype)
    return (term * m).sum() / jnp.maximum(m.sum(), 1.0)
