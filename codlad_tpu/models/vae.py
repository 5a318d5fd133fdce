"""Stage-1 composition shells: VQ-VAE, FG(V)AE, CG-VAE and GenZProt.

Port of the reference composition layer (reference:
models/vae_model.py:509-838 `VAE` / `GenZProt`), with the quantizer kept
OUTSIDE the flax module as explicit functional state (see models/vq.py) —
the train step threads (params, vq_state) through, which is what makes the
EMA codebook correct under sharded batches.

Everything operates on the single padded layout, so there is no
flat<->padded reshaping step (reference gcn_nn.py:35-52) — per-residue
latents are born as [B, L, D].
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from codlad_tpu.models.decoder import ICDecoder, ICDecoderAngle
from codlad_tpu.models.encoder import E3Encoder
from codlad_tpu.models.prior import CGPrior


def reparametrize(rng, mu, sigma):
    return mu + sigma * jax.random.normal(rng, sigma.shape, sigma.dtype)


class MuSigmaHead(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, h):
        def head(x):
            x = nn.Dense(self.dim)(x)
            x = nn.relu(x)
            return nn.Dense(self.dim)(x)

        mu = head(h)
        logvar = head(h)
        sigma = 1e-12 + jnp.exp(logvar / 2.0)
        return mu, sigma


class VAE(nn.Module):
    """Encoder/decoder shell; `mode` picks the latent path.

    mode='vqvae': encoder -> map_in (embed_dim->vqdim) -> [external VQ] ->
      map_out -> IC decoder.
    mode='fgae' / 'fgvae': plain / reparametrized encoder latents.
    mode='cgvae': CG prior provides (mu, sigma).
    """

    embed_dim: int = 36
    vqdim: int = 3
    mode: str = "vqvae"
    predict_angle: bool = False
    n_rbf: int = 15
    dec_cutoff: float = 21.0
    dec_nconv: int = 4
    enc_nconv: int = 3
    activation: str = "swish"
    atom_cutoff: float = 9.0
    cg_cutoff: float = 21.0
    compute_dtype: str = "float32"

    def setup(self):
        self.encoder = E3Encoder(
            n_atom_basis=self.embed_dim,
            num_conv_layers=self.enc_nconv,
            atom_max_radius=self.atom_cutoff + 5,
            cg_max_radius=self.cg_cutoff + 5,
            cross_max_distance=self.cg_cutoff + 5,
            compute_dtype=self.compute_dtype,
        )
        dec_cls = ICDecoderAngle if self.predict_angle else ICDecoder
        self.decoder = dec_cls(
            n_atom_basis=self.embed_dim, n_rbf=self.n_rbf,
            cutoff=self.dec_cutoff, num_conv=self.dec_nconv,
            activation=self.activation)
        if self.mode == "vqvae" and self.embed_dim != self.vqdim:
            self.map_in = nn.Dense(self.vqdim)
            self.map_out = nn.Dense(self.embed_dim)
        if self.mode in ("fgvae",):
            self.head = MuSigmaHead(self.embed_dim)
        if self.mode == "cgvae":
            self.prior = CGPrior(n_atom_basis=self.embed_dim,
                                 num_conv_layers=self.enc_nconv,
                                 cg_max_radius=self.cg_cutoff + 5)

    def encode(self, batch):
        """-> pre-quantization per-residue latents [B, L, vqdim or embed]."""
        if self.mode == "cgvae":
            mu, sigma = self.prior(batch)
            return mu, (mu, sigma)
        h = self.encoder(batch)
        if self.mode == "vqvae":
            if self.embed_dim != self.vqdim:
                h = self.map_in(h)
            return h, (None, None)
        if self.mode == "fgvae":
            mu, sigma = self.head(h)
            return mu, (mu, sigma)
        return h, (None, None)  # fgae

    def decode(self, batch, latents):
        """latents [B, L, vqdim] (post-quantization) -> ic [B, L, 13, 3]."""
        if self.mode == "vqvae" and self.embed_dim != self.vqdim:
            latents = self.map_out(latents)
        return self.decoder(batch, latents)

    def __call__(self, batch):
        """Deterministic encode->decode (no VQ; used for init/shape checks)."""
        h, _ = self.encode(batch)
        return self.decode(batch, h)


class GenZProt(nn.Module):
    """Prior-VAE baseline (reference models/vae_model.py:509-683)."""

    embed_dim: int = 36
    n_rbf: int = 15
    dec_cutoff: float = 21.0
    dec_nconv: int = 4
    enc_nconv: int = 3
    activation: str = "swish"
    atom_cutoff: float = 9.0
    cg_cutoff: float = 21.0

    def setup(self):
        self.encoder = E3Encoder(
            n_atom_basis=self.embed_dim, num_conv_layers=self.enc_nconv,
            atom_max_radius=self.atom_cutoff + 5,
            cg_max_radius=self.cg_cutoff + 5,
            cross_max_distance=self.cg_cutoff + 5)
        self.prior_net = CGPrior(n_atom_basis=self.embed_dim,
                                 num_conv_layers=self.enc_nconv,
                                 cg_max_radius=self.cg_cutoff + 5)
        self.head = MuSigmaHead(self.embed_dim)
        self.decoder = ICDecoder(
            n_atom_basis=self.embed_dim, n_rbf=self.n_rbf,
            cutoff=self.dec_cutoff, num_conv=self.dec_nconv,
            activation=self.activation)

    def __call__(self, batch, rng=None):
        h = self.encoder(batch)
        mu, sigma = self.head(h)
        prior_mu, prior_sigma = self.prior_net(batch)
        z = reparametrize(rng, mu, sigma) if rng is not None else mu
        ic_recon = self.decoder(batch, z)
        return mu, sigma, prior_mu, prior_sigma, ic_recon

    def get_latent_cg(self, batch, rng):
        """CG-prior latent sample: the test-time condition source
        (reference vae_model.py:649-658)."""
        prior_mu, prior_sigma = self.prior_net(batch)
        return reparametrize(rng, prior_mu, prior_sigma), prior_mu, prior_sigma

    def decode(self, batch, latents):
        return self.decoder(batch, latents)
