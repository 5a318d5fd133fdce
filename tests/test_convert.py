"""Torch checkpoint import: structure match + verifiable value checks
against the C2 GenZProt checkpoint shipped inside the reference repo."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

C2 = "/root/reference/results/Vae_m1_12-23-23_12345/model.pt"

pytestmark = pytest.mark.skipif(not os.path.exists(C2),
                                reason="reference C2 checkpoint not present")


@pytest.fixture(scope="module")
def imported():
    from codlad_tpu.convert.torch_import import convert_genzprot
    return convert_genzprot(C2)


@pytest.fixture(scope="module")
def batch():
    from codlad_tpu.data import batch as B
    from codlad_tpu.data.synthetic import synthetic_examples

    exs = synthetic_examples(2, 16, seed=0)
    spec = B.spec_for(exs, length_multiple=4, edge_multiple=64)
    return {k: jnp.asarray(v) for k, v in B.collate(exs, spec).items()}


def test_param_tree_matches_model(imported, batch):
    """Imported tree has exactly the structure GenZProt.init produces."""
    from codlad_tpu.models.vae import GenZProt

    model = GenZProt()
    rng = jax.random.PRNGKey(0)
    init = jax.jit(lambda r, b: model.init(r, b, rng=r))(rng, batch)
    flat_a = jax.tree_util.tree_flatten_with_path(init)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(imported)[0]
    paths_a = {jax.tree_util.keystr(p): v.shape for p, v in flat_a}
    paths_b = {jax.tree_util.keystr(p): tuple(v.shape) for p, v in flat_b}
    assert set(paths_a) == set(paths_b), (
        set(paths_a) ^ set(paths_b))
    for k in paths_a:
        assert tuple(paths_a[k]) == tuple(paths_b[k]), (k, paths_a[k], paths_b[k])


def test_imported_model_runs_and_bond_head_is_exact(imported, batch):
    """Forward runs finite, and the constraint-decoupled bond-length heads
    surface the checkpoint's embedding values EXACTLY in the ic output —
    an end-to-end value check of the decoder import."""
    import torch

    from codlad_tpu.models.vae import GenZProt

    model = GenZProt()
    mu, sigma, pmu, psigma, ic_recon = model.apply(
        imported, batch, rng=jax.random.PRNGKey(0))
    for x in (mu, sigma, pmu, psigma, ic_recon):
        assert np.isfinite(np.asarray(x)).all()

    sd = torch.load(C2, map_location="cpu", weights_only=True)
    bb = np.asarray(sd["equivaraintconv.backbone_dist.weight"])   # [25, 3]
    sc = np.asarray(sd["equivaraintconv.sidechain_dist.weight"])  # [25, 10]
    res = np.asarray(batch["res_type"])
    got_bb = np.asarray(ic_recon[..., :3, 0])
    got_sc = np.asarray(ic_recon[..., 3:, 0])
    np.testing.assert_allclose(got_bb, bb[res], atol=1e-5)
    np.testing.assert_allclose(got_sc, sc[res], atol=1e-5)
    # C2 was trained on real proteins: its bond-length table must be
    # chemically sane for standard residues
    assert 1.0 < bb[:20].mean() < 2.0


def test_imported_prior_statistics(imported, batch):
    """The imported CG prior produces bounded, structured (mu, sigma)."""
    from codlad_tpu.models.vae import GenZProt

    model = GenZProt()
    z, pmu, psigma = model.apply(imported, batch, jax.random.PRNGKey(1),
                                 method=GenZProt.get_latent_cg)
    m = np.asarray(batch["res_mask"])
    s = np.asarray(psigma)[m]
    assert np.isfinite(s).all() and (s >= 0).all()
    assert s.mean() < 10.0  # trained sigma head stays in a sane range
