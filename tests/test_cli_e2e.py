"""End-to-end CLI pipeline test: preprocess -> train Stage 1 -> extract
features -> train Stage 2 -> evaluate. Tiny shapes, full coverage of the
user-facing workflow."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full preprocess->train->extract->test CLI drives


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return tmp_path_factory.mktemp("e2e")


def test_full_pipeline(workdir):
    from codlad_tpu.cli import extract_features, preprocess, test as test_cli, train_vqvae

    shards_dir = str(workdir / "shards")
    # 1. preprocess synthetic data (2 proteins x 6 frames, 14 residues)
    preprocess.main(["--synthetic", "2", "14", "6", "--out_dir", shards_dir])
    manifest = json.load(open(os.path.join(shards_dir, "manifest.json")))
    assert len(manifest["success"]) == 2

    # 2. Stage-1 VQ-VAE training (2 epochs, tiny model)
    logdir = str(workdir / "vq")
    train_vqvae.main([
        "-data_dir", shards_dir, "-logdir", logdir, "-nepochs", "2",
        "-batch_size", "2", "-enc_nconv", "2", "-dec_nconv", "2",
        "-vqdim", "3", "-codebook_size", "32",
    ])
    assert os.path.isdir(os.path.join(logdir, "last"))
    assert os.path.exists(os.path.join(logdir, "train_log.csv"))

    # 3. extract latent features + stats
    feat_dir = str(workdir / "features")
    stats_dir = str(workdir / "stats")
    extract_features.main([
        "--ckpt", logdir, "--data_dir", shards_dir, "--out_dir", feat_dir,
        "--stats_name", "TEST", "--stats_dir", stats_dir,
    ])
    assert os.path.exists(os.path.join(stats_dir, "TEST_stats.npz"))
    z = np.load(os.path.join(feat_dir, "prot_0000.npz"))
    assert z["latents"].shape[-1] == 3

    # 4. Stage-2 latent diffusion training (a few steps)
    from codlad_tpu.cli import train_latent
    exp_dir = str(workdir / "latent")
    train_latent.main([
        "--feature_dir", feat_dir, "--exp", exp_dir, "--model", "diffusion",
        "--latent_size", "3", "--batch_size", "4", "--epochs", "1",
        "--max_steps", "4", "--warmup", "2", "--save_step", "4",
        "--stats_name", "TEST", "--stats_dir", stats_dir, "--dropout", "0.0",
        "--log_step", "2",
    ])
    assert os.path.isdir(os.path.join(exp_dir, "last"))

    # 5. evaluation: recon experiment
    out_dir = str(workdir / "eval_recon")
    summary = test_cli.main([
        "--experiment", "recon", "--vae_ckpt", logdir,
        "--data_dir", shards_dir, "--out_dir", out_dir,
        "--stats_name", "TEST", "--stats_dir", stats_dir,
        "--batch_size", "2", "--save_pdb",
    ])
    g = summary["__global__"]
    assert np.isfinite(g["rmsd"]) and np.isfinite(g["ged"])
    pdbs = [f for f in os.listdir(out_dir) if f.endswith(".pdb")]
    assert pdbs, "recon PDB export missing"

    # 6. evaluation: latent sampling experiment (tiny ensemble/steps)
    out_dir2 = str(workdir / "eval_latent")
    summary2 = test_cli.main([
        "--experiment", "latent", "--model", "diffusion",
        "--vae_ckpt", logdir, "--latent_ckpt", exp_dir,
        "--data_dir", shards_dir, "--out_dir", out_dir2,
        "--num_sampling_steps", "4", "--num_ensemble", "2",
        "--stats_name", "TEST", "--stats_dir", stats_dir,
        "--batch_size", "2", "--save_pdb", "--save_xtc",
    ])
    g2 = summary2["__global__"]
    assert np.isfinite(g2["rmsd"]) and np.isfinite(g2["div"])
    # reporting parity: per-ensemble stats + global mean/std + artifacts
    prot_key = next(k for k in summary2 if not k.startswith("__"))
    assert len(summary2[prot_key]["per_ensemble"]) == 2
    assert set(summary2["__global_stats__"]["rmsd"]) == {"mean", "std"}
    gen_pdbs = [f for f in os.listdir(out_dir2) if f.endswith("_gen.pdb")]
    gen_xtcs = [f for f in os.listdir(out_dir2) if f.endswith("_gen.xtc")]
    assert gen_pdbs and gen_xtcs, "latent ensemble artifact export missing"
    from codlad_tpu.data.xtc import read_xtc
    traj = read_xtc(os.path.join(out_dir2, gen_xtcs[0]))
    assert traj["xyz"].shape[0] == 2  # num_ensemble frames


def test_distill_pipeline(workdir):
    """Progressive distillation on the trained Stage-2 checkpoint: two
    halvings of an 8-step teacher grid, then evaluation through the DDIM
    sampler on the student's own grid (auto-selected from its config)."""
    from codlad_tpu.cli import distill, test as test_cli

    exp_dir = str(workdir / "latent")
    if not os.path.isdir(os.path.join(exp_dir, "last")):
        pytest.skip("needs test_full_pipeline's latent checkpoint")
    feat_dir = str(workdir / "features")
    stats_dir = str(workdir / "stats")
    dist_dir = str(workdir / "distill")
    distill.main([
        "--teacher_ckpt", exp_dir, "--feature_dir", feat_dir,
        "--exp", dist_dir, "--stats_name", "TEST", "--stats_dir", stats_dir,
        "--start_steps", "8", "--rounds", "2", "--steps_per_round", "3",
        "--batch_size", "4", "--warmup", "1", "--log_step", "2",
    ])
    assert os.path.isdir(os.path.join(dist_dir, "last"))
    assert os.path.isdir(os.path.join(dist_dir, "T2"))  # 8 -> 4 -> 2
    cfg = json.load(open(os.path.join(dist_dir, "modelparams.json")))
    assert cfg["distilled"] and len(cfg["distill_tmap"]) == 2

    out_dir = str(workdir / "eval_distilled")
    summary = test_cli.main([
        "--experiment", "latent", "--model", "diffusion",
        "--vae_ckpt", str(workdir / "vq"), "--latent_ckpt", dist_dir,
        "--data_dir", str(workdir / "shards"), "--out_dir", out_dir,
        "--num_sampling_steps", "2", "--num_ensemble", "2",
        "--stats_name", "TEST", "--stats_dir", stats_dir,
        "--batch_size", "2",
    ])
    g = summary["__global__"]
    assert np.isfinite(g["rmsd"]) and np.isfinite(g["div"])


def test_ddim_sampler_cli_flag(workdir):
    """--sampler ddim on an UNdistilled diffusion checkpoint (the sampler
    is usable standalone, not only through distillation)."""
    from codlad_tpu.cli import test as test_cli

    exp_dir = str(workdir / "latent")
    if not os.path.isdir(os.path.join(exp_dir, "last")):
        pytest.skip("needs test_full_pipeline's latent checkpoint")
    out_dir = str(workdir / "eval_ddim")
    summary = test_cli.main([
        "--experiment", "latent", "--model", "diffusion",
        "--vae_ckpt", str(workdir / "vq"), "--latent_ckpt", exp_dir,
        "--data_dir", str(workdir / "shards"), "--out_dir", out_dir,
        "--num_sampling_steps", "4", "--num_ensemble", "2",
        "--stats_name", "TEST", "--stats_dir", str(workdir / "stats"),
        "--batch_size", "2", "--sampler", "ddim",
    ])
    g = summary["__global__"]
    assert np.isfinite(g["rmsd"]) and np.isfinite(g["div"])


def test_pdb_roundtrip(workdir):
    """write_pdb -> parse_pdb preserves structure."""
    from codlad_tpu.data.pdb import parse_pdb, write_pdb
    from codlad_tpu.data.synthetic import random_protein

    rng = np.random.default_rng(0)
    res_type_og, chain_id_og, cg, xyz14 = random_protein(rng, 12)
    path = str(workdir / "test.pdb")
    write_pdb(path, res_type_og, chain_id_og, xyz14[None])
    parsed = parse_pdb(path)
    # modeled residues of the written file = all residues minus terminals
    # of the re-parse; compare the overlapping region's CA positions
    assert parsed["res_type_og"].tolist() == res_type_og[1:-1].tolist()
    ca_written = xyz14[:, 3]  # CA slot of modeled residues
    np.testing.assert_allclose(parsed["cg_xyz_og"][0], ca_written, atol=2e-3)


def test_genzprot_pipeline(workdir):
    """ivae (GenZProt) training + genzprot sampling experiment."""
    from codlad_tpu.cli import preprocess, test as test_cli, train_vqvae

    shards_dir = str(workdir / "shards_gz")
    preprocess.main(["--synthetic", "1", "12", "4", "--out_dir", shards_dir])

    logdir = str(workdir / "genz")
    train_vqvae.main([
        "-data_dir", shards_dir, "-logdir", logdir, "-nepochs", "1",
        "-batch_size", "2", "-enc_nconv", "2", "-dec_nconv", "2",
        "-train_section", "ivae",
    ])
    out_dir = str(workdir / "eval_genz")
    summary = test_cli.main([
        "--experiment", "genzprot", "--vae_ckpt", logdir,
        "--data_dir", shards_dir, "--out_dir", out_dir,
        "--num_ensemble", "2", "--batch_size", "2",
    ])
    g = summary["__global__"]
    import numpy as np
    assert np.isfinite(g["rmsd"]) and np.isfinite(g["clash"])


def test_rvq_pipeline(workdir):
    """Residual-VQ variant end to end: Stage-1 training with -quantize_type
    rvq (per-stage VQState list in the checkpoint), then extraction
    rebuilding the same quantizer for restore + usage histogram."""
    from codlad_tpu.cli import extract_features, preprocess, train_vqvae

    shards_dir = str(workdir / "shards_rvq")
    preprocess.main(["--synthetic", "1", "12", "6", "--out_dir", shards_dir])
    logdir = str(workdir / "vq_rvq")
    train_vqvae.main([
        "-data_dir", shards_dir, "-logdir", logdir, "-nepochs", "1",
        "-batch_size", "2", "-enc_nconv", "2", "-dec_nconv", "2",
        "-vqdim", "4", "-codebook_size", "16", "-quantize_type", "rvq",
        "-vq_stages", "3",
    ])
    assert os.path.isdir(os.path.join(logdir, "last"))
    feat_dir = str(workdir / "features_rvq")
    extract_features.main([
        "--ckpt", logdir, "--data_dir", shards_dir, "--out_dir", feat_dir,
    ])
    usage = np.load(os.path.join(feat_dir, "codebook_usage.npy"))
    assert usage.sum() > 0  # flattened multi-stage histogram counted codes


def test_seq_shard_cli(workdir):
    """--seq_shards through BOTH user surfaces: train_latent trains on a
    2-D data x seq mesh (4 x 2 of the 8 virtual devices) and cli.test
    samples sequence-sharded with cfg guidance on top."""
    from codlad_tpu.cli import test as test_cli, train_latent

    feat_dir = str(workdir / "features")
    stats_dir = str(workdir / "stats")
    if not os.path.isdir(feat_dir):
        pytest.skip("needs test_full_pipeline's features")
    exp_dir = str(workdir / "latent_seq")
    train_latent.main([
        "--feature_dir", feat_dir, "--exp", exp_dir, "--model", "diffusion",
        "--latent_size", "3", "--batch_size", "4", "--epochs", "1",
        "--max_steps", "2", "--warmup", "1", "--save_step", "2",
        "--stats_name", "TEST", "--stats_dir", stats_dir, "--dropout", "0.1",
        "--log_step", "1", "--seq_shards", "2",
    ])
    assert os.path.isdir(os.path.join(exp_dir, "last"))

    out_dir = str(workdir / "eval_seq")
    summary = test_cli.main([
        "--experiment", "latent", "--model", "diffusion",
        "--vae_ckpt", str(workdir / "vq"), "--latent_ckpt", exp_dir,
        "--data_dir", str(workdir / "shards"), "--out_dir", out_dir,
        "--num_sampling_steps", "3", "--num_ensemble", "2",
        "--stats_name", "TEST", "--stats_dir", stats_dir,
        "--batch_size", "2", "--seq_shards", "2", "--cfg_scale", "1.5",
    ])
    g = summary["__global__"]
    assert np.isfinite(g["rmsd"]) and np.isfinite(g["div"])


def test_max_seconds_budget(workdir):
    """--max_seconds: a deadline-bounded run stops after the running step,
    saves `last`, and force-runs a final validation so `best` reflects the
    finishing state (floor-study time-boxing on a shared chip)."""
    from codlad_tpu.cli import train_latent

    feat_dir = str(workdir / "features")
    stats_dir = str(workdir / "stats")
    if not os.path.isdir(feat_dir):
        pytest.skip("needs test_full_pipeline's features")
    exp_dir = str(workdir / "latent_budget")
    train_latent.main([
        "--feature_dir", feat_dir, "--exp", exp_dir, "--model", "diffusion",
        "--latent_size", "3", "--batch_size", "4", "--epochs", "5",
        "--max_steps", "1000", "--warmup", "2", "--save_step", "1000",
        "--stats_name", "TEST", "--stats_dir", stats_dir, "--dropout", "0.0",
        "--log_step", "1000", "--val_every_epochs", "100",
        "--max_seconds", "0.001",
    ])
    # budget (well under one step) fires on the first loop iteration
    assert os.path.isdir(os.path.join(exp_dir, "last"))
    # final validation is forced on a budget stop despite val_every_epochs=100
    assert os.path.isdir(os.path.join(exp_dir, "best"))
    log = open(os.path.join(exp_dir, "log.txt")).read()
    assert "wall-clock budget" in log
