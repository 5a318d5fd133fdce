"""End-to-end eval pipeline tests: sample -> VQ snap -> decode -> metrics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from codlad_tpu.data import batch as B
from codlad_tpu.data.synthetic import synthetic_examples
from codlad_tpu.eval import metrics as M
from codlad_tpu.eval.harness import SamplingPipeline, evaluate_structures, run_ensemble
from codlad_tpu.gen.diffusion import create_diffusion
from codlad_tpu.models.denoiser import mpnn_diffusion
from codlad_tpu.models.vae import VAE
from codlad_tpu.models.vq import vq_init


@pytest.fixture(scope="module")
def setup():
    exs = synthetic_examples(2, 14, seed=0)
    spec = B.spec_for(exs, length_multiple=4, edge_multiple=64)
    batch = {k: jnp.asarray(v) for k, v in B.collate(exs, spec).items()}

    vae = VAE(embed_dim=36, vqdim=3, mode="vqvae", dec_nconv=2, enc_nconv=2)
    vae_params = vae.init(jax.random.PRNGKey(0), batch)
    denoiser = mpnn_diffusion(input_size=3, learn_sigma=True, k_neighbors=8,
                              dropout=0.0)
    Bsz, L = batch["res_type"].shape
    x = jnp.zeros((Bsz, L, 3))
    extras = (batch["res_type"], batch["cg_xyz_og"][:, 1:-1], batch["res_mask"])
    den_params = denoiser.init(jax.random.PRNGKey(1), x, jnp.zeros((Bsz,), jnp.int32), *extras)

    pipeline = SamplingPipeline(
        denoiser=denoiser, denoiser_params=den_params,
        process=create_diffusion("ddim5", diffusion_steps=100),
        process_kind="diffusion",
        vae=vae, vae_params=vae_params,
        vq_state=vq_init(jax.random.PRNGKey(2), 64, 3),
        norm_mean=np.zeros(3, np.float32), norm_std=np.ones(3, np.float32),
    )
    return batch, pipeline


@pytest.mark.slow
def test_sample_and_decode_shapes(setup):
    batch, pipeline = setup
    ic_recon, xyz14 = pipeline.sample_and_decode(jax.random.PRNGKey(0), batch)
    Bsz, L = batch["res_type"].shape
    assert ic_recon.shape == (Bsz, L, 13, 3)
    assert xyz14.shape == (Bsz, L, 14, 3)
    assert np.isfinite(np.asarray(xyz14)).all()


@pytest.mark.slow
def test_doubled_batch_halves_match(setup):
    batch, pipeline = setup
    import dataclasses
    doubled = dataclasses.replace(pipeline, doubled_batch=True)
    lat1 = pipeline.sample_and_decode(jax.random.PRNGKey(3), batch)[0]
    lat2 = doubled.sample_and_decode(jax.random.PRNGKey(3), batch)[0]
    assert lat1.shape == lat2.shape


@pytest.mark.slow
def test_recon_experiment(setup):
    """encode -> VQ -> decode on ground-truth structures, metrics finite."""
    batch, pipeline = setup
    h = pipeline.encode_latents(batch)
    ic_recon, xyz14 = pipeline.decode(batch, (h - pipeline.norm_mean) / pipeline.norm_std)
    m = evaluate_structures(batch, ic_recon, xyz14)
    for k, v in m.items():
        assert np.isfinite(float(v)), k
    assert 0.0 <= float(m["graph_valid_ratio"]) <= 1.0
    assert 0.0 <= float(m["clash"]) <= 2.0


@pytest.mark.slow
def test_run_ensemble_div(setup):
    batch, pipeline = setup
    agg = run_ensemble(pipeline, batch, num_ensemble=3, seed=0)
    assert "div" in agg and np.isfinite(agg["div"])
    assert agg["rmsd"] > 0


@pytest.mark.slow
def test_run_ensemble_fold_matches_sequential(setup):
    """fold>1 tiles the batch instead of looping members; with a
    deterministic (rng- and noise-independent) sample_fn the folded and
    sequential paths must produce identical metrics, and a non-multiple
    fold must still yield exactly num_ensemble members."""
    batch, pipeline = setup
    Bsz = batch["res_type"].shape[0]

    def det_sample(rng, b):  # per-member output depends only on the batch
        ic, xyz = pipeline.decode(b, jnp.zeros(b["res_type"].shape + (3,)))
        return ic, xyz

    seq = run_ensemble(pipeline, batch, num_ensemble=5, seed=0,
                       sample_fn=det_sample)
    fld = run_ensemble(pipeline, batch, num_ensemble=5, seed=0,
                       sample_fn=det_sample, fold=3)  # chunks of 3 + 2
    assert len(fld["per_ensemble"]) == 5
    for k in seq:
        if k == "per_ensemble":
            continue
        np.testing.assert_allclose(fld[k], seq[k], rtol=1e-5, atol=1e-6,
                                   err_msg=k)
    # folded structures keep the per-member [B, ...] shape
    _, structs = run_ensemble(pipeline, batch, num_ensemble=4, seed=0,
                              sample_fn=det_sample, fold=2,
                              return_structures=True)
    assert structs.shape[0] == 4 and structs.shape[1] == Bsz


def test_kabsch_rmsd_invariances():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 50, 3)).astype(np.float32)
    mask = np.ones((2, 50), dtype=bool)
    # rotated+translated copy has ~zero aligned rmsd
    from codlad_tpu.nn.irreps import _random_rotation
    rot = _random_rotation(rng).astype(np.float32)
    y = x @ rot.T + 3.0
    r = M.kabsch_rmsd(jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(r), np.zeros(2), atol=1e-4)
    # unaligned rmsd of a pure translation = the translation norm
    y2 = x + np.array([3.0, 0, 0], np.float32)
    r2 = M.unaligned_rmsd(jnp.asarray(x), jnp.asarray(y2), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(r2), np.full(2, 3.0), atol=1e-5)


@pytest.mark.slow
def test_graph_validity_self_is_valid(setup):
    batch, _ = setup
    keep = (~batch["endpoint_mask"])[..., None] & batch["atom_mask"]
    valid, ratio = M.graph_validity(batch["xyz14"], batch["xyz14"],
                                    batch["res_type"], keep)
    np.testing.assert_allclose(np.asarray(valid), 1.0)
    np.testing.assert_allclose(np.asarray(ratio), 0.0)


@pytest.mark.slow
def test_flow_sampling_pipeline(setup):
    """Flow-matching latent sampling through the pipeline (ODE solver path)."""
    import dataclasses

    from codlad_tpu.gen.flow import FLOW_MATCHERS
    from codlad_tpu.models.denoiser import mpnn_diffusion

    batch, pipeline = setup
    Bsz, L = batch["res_type"].shape
    den = mpnn_diffusion(input_size=3, learn_sigma=False, k_neighbors=8,
                         dropout=0.0)
    x = jnp.zeros((Bsz, L, 3))
    params = den.init(jax.random.PRNGKey(0), x, jnp.zeros((Bsz,)),
                      batch["res_type"], batch["cg_xyz_og"][:, 1:-1],
                      batch["res_mask"])
    flow_pipe = dataclasses.replace(
        pipeline, denoiser=den, denoiser_params=params,
        process=FLOW_MATCHERS["icfm"](), process_kind="icfm",
        ode_steps=8, ode_method="midpoint")
    ic_recon, xyz14 = flow_pipe.sample_and_decode(jax.random.PRNGKey(1), batch)
    assert np.isfinite(np.asarray(xyz14)).all()


@pytest.mark.slow
def test_cfg_scales(setup):
    """cfg wiring (reference's broken test.py:525 path, fixed here):
    cfg=1 reproduces the unguided sample exactly (u + 1*(c-u) = c on the
    same trajectory/rng); cfg=1.5 changes the sample."""
    import dataclasses
    import dataclasses as dc

    batch, pipeline = setup
    # at init the adaLN gates zero the trunk (reference quirk, ROADMAP 7),
    # making cond == uncond — jitter params so guidance has signal
    leaves, treedef = jax.tree_util.tree_flatten(pipeline.denoiser_params)
    keys = jax.random.split(jax.random.PRNGKey(123), len(leaves))
    jittered = treedef.unflatten([
        p + 0.02 * jax.random.normal(k, p.shape, p.dtype)
        for p, k in zip(leaves, keys)])
    from codlad_tpu.gen.diffusion import create_diffusion
    pipeline = dc.replace(pipeline, denoiser_params=jittered,
                          process=create_diffusion("ddim2",
                                                   diffusion_steps=100))

    extras = {"res_type": batch["res_type"],
              "cg_xyz": batch["cg_xyz_og"][:, 1:-1],
              "mask": batch["res_mask"]}
    rng = jax.random.PRNGKey(7)
    base = np.asarray(pipeline.sample_latents(rng, extras))
    # cfg disabled (reference README uses --cfg_scale 0.0): plain path,
    # bit-exact
    cfg0 = dataclasses.replace(pipeline, cfg_scale=0.0).sample_latents(rng, extras)
    np.testing.assert_array_equal(np.asarray(cfg0), base)
    # s=1: u + 1*(c-u) = c analytically; only XLA fusion rounding differs
    # between the B and 2B programs
    cfg1 = np.asarray(dataclasses.replace(pipeline, cfg_scale=1.0)
                      .sample_latents(rng, extras))
    np.testing.assert_allclose(cfg1, base, rtol=2e-2, atol=2e-2)
    # s=1.5: guidance must actually move the sample
    cfg15 = np.asarray(dataclasses.replace(pipeline, cfg_scale=1.5)
                       .sample_latents(rng, extras))
    assert np.abs(cfg15 - base).max() > 1e-3


def test_graph_validity_chunked_matches_dense():
    """Chunked graph_validity (memory O(B*C*N)) agrees with a dense numpy
    reference incl. the multi-chunk path (N > 1024) and the reference's
    signed-net diff ratio (protein_module.py:320)."""
    from codlad_tpu.data.synthetic import random_protein
    from codlad_tpu.geometry import residues as R

    rng = np.random.default_rng(17)
    res_type_og, _, cg, xyz14 = random_protein(rng, 82)  # 80*14=1120 > 1024
    res_type = res_type_og[1:-1][None]
    gen = xyz14[None] + rng.normal(0, 0.35, xyz14.shape).astype(np.float32)
    ref = xyz14[None]
    amask = R.ATOM14_EXISTS[res_type]

    valid, ratio = M.graph_validity(jnp.asarray(gen), jnp.asarray(ref),
                                    jnp.asarray(res_type), jnp.asarray(amask))

    # dense numpy reference
    z = np.asarray(R.ATOM14_ATOMIC_NUM)[res_type].reshape(-1)
    m = amask.reshape(-1)
    cut = np.array([R.COVALENT_CUTOFF.get(i, 1.5) for i in range(120)])[z]
    cutoff = (cut[:, None] + cut[None, :]) * 1.3
    pm = (m[:, None] & m[None, :]) & ~np.eye(m.size, dtype=bool)

    def bonds(x):
        d = np.sqrt(((x[:, None] - x[None, :]) ** 2).sum(-1) + 1e-7)
        return (d < cutoff) & pm

    bg, br = bonds(gen.reshape(-1, 3)), bonds(ref.reshape(-1, 3))
    exp_valid = float((bg != br).sum() == 0)
    exp_ratio = abs(int(br.sum()) - int(bg.sum())) / max(int(br.sum()), 1)
    assert float(valid[0]) == exp_valid
    np.testing.assert_allclose(float(ratio[0]), exp_ratio, atol=1e-6)
    assert (bg != br).sum() > 0  # perturbation actually broke bonds


@pytest.mark.slow
def test_cfg_monotonic_shift(setup):
    """Guidance strength shifts samples monotonically: the deviation from
    the cfg=1 (pure conditional) trajectory grows with the scale
    (train-time null-token cfg, VERDICT r2 item 4)."""
    import dataclasses as dc

    from codlad_tpu.gen.diffusion import create_diffusion

    batch, pipeline = setup
    leaves, treedef = jax.tree_util.tree_flatten(pipeline.denoiser_params)
    keys = jax.random.split(jax.random.PRNGKey(321), len(leaves))
    jittered = treedef.unflatten([
        p + 0.02 * jax.random.normal(k, p.shape, p.dtype)
        for p, k in zip(leaves, keys)])
    pipeline = dc.replace(pipeline, denoiser_params=jittered,
                          process=create_diffusion("ddim2",
                                                   diffusion_steps=100))
    extras = {"res_type": batch["res_type"],
              "cg_xyz": batch["cg_xyz_og"][:, 1:-1],
              "mask": batch["res_mask"]}
    rng = jax.random.PRNGKey(17)
    ref = np.asarray(dc.replace(pipeline, cfg_scale=1.0)
                     .sample_latents(rng, extras))
    devs = []
    for s in (2.0, 4.0, 8.0):
        out = np.asarray(dc.replace(pipeline, cfg_scale=s)
                         .sample_latents(rng, extras))
        devs.append(float(np.abs(out - ref).mean()))
    assert devs[0] > 1e-5
    assert devs[0] < devs[1] < devs[2], devs


def test_summarize_convergence_skips_aggregate_rows(tmp_path, capsys):
    """scripts/summarize_convergence must average per-protein rows only:
    cli.test also writes __global__ (scalar means, double-counts) and
    __global_stats__ ({mean,std} dicts, TypeErrors under sum()) — the
    round-5 floor-study orchestrator crashed on exactly this."""
    import importlib.util
    import json
    import os
    import sys

    spec = importlib.util.spec_from_file_location(
        "summarize_convergence",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "summarize_convergence.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    row = {"rmsd_aligned": 1.0, "ged": 0.5, "clash": 0.1,
           "graph_valid_ratio": 0.9, "div": 0.3}
    summary = {
        "prot_0000.npz": dict(row),
        "prot_0001.npz": {k: 3 * v for k, v in row.items()},
        "__global__": {k: 2 * v for k, v in row.items()},
        "__global_stats__": {k: {"mean": 2 * v, "std": 0.0}
                             for k, v in row.items()},
    }
    for sub in ("eval_recon", "eval_latent"):
        d = tmp_path / sub
        d.mkdir()
        (d / "summary_stats.json").write_text(json.dumps(summary))

    assert mod.mean(summary, "rmsd_aligned") == 2.0  # (1 + 3) / 2

    mod.main(str(tmp_path))
    out = capsys.readouterr().out
    assert "| rmsd_aligned | 2.0000 | 2.0000 | +0.0000 |" in out
    assert "__global__" not in out
