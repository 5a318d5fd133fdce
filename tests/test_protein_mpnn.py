"""Autoregressive ProteinMPNN (models/protein_mpnn.py) vs the reference
semantics (reference: models/protein_mpnn_utils.py:624-988)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from codlad_tpu.models import protein_mpnn as PM


@pytest.fixture(scope="module")
def setup():
    B, L, K, V = 2, 12, 6, 21
    model = PM.ProteinMPNN(hidden_dim=32, node_features=32, edge_features=32,
                           num_encoder_layers=2, num_decoder_layers=2,
                           k_neighbors=K, dropout=0.0, num_letters=V, vocab=V)
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(B, L, 3)) * 3.8, jnp.float32)
    mask = jnp.ones((B, L), jnp.float32).at[1, -3:].set(0.0)
    S_true = jnp.asarray(rng.integers(0, V, (B, L)), jnp.int32)
    chain_M = jnp.ones((B, L), jnp.float32)
    residue_idx = jnp.broadcast_to(jnp.arange(L), (B, L)).astype(jnp.int32)
    chains = jnp.zeros((B, L), jnp.int32)
    randn = jnp.asarray(rng.normal(size=(B, L)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), X, S_true, mask, chain_M,
                           residue_idx, chains, randn)
    return dict(model=model, variables=variables, X=X, mask=mask,
                S_true=S_true, chain_M=chain_M, residue_idx=residue_idx,
                chains=chains, randn=randn, B=B, L=L, V=V)


def test_forward_log_probs_normalized(setup):
    s = setup
    lp = s["model"].apply(s["variables"], s["X"], s["S_true"], s["mask"],
                          s["chain_M"], s["residue_idx"], s["chains"],
                          s["randn"])
    assert lp.shape == (s["B"], s["L"], s["V"])
    np.testing.assert_allclose(
        np.asarray(jax.scipy.special.logsumexp(lp, axis=-1)), 0.0, atol=1e-5)


def test_sample_matches_teacher_forced_forward(setup):
    """The scan-based sequential decode must equal the dense parallel
    forward: feeding the SAMPLED sequence back through the teacher-forced
    forward with the sampler's decoding order must reproduce the
    per-position probabilities the sampler drew from (the defining
    autoregressive-consistency property of ProteinMPNN's masked decoder,
    reference :690-705 vs :749-793)."""
    s = setup
    out = PM.sample(s["model"], s["variables"], jax.random.PRNGKey(7),
                    s["X"], s["randn"], s["S_true"], s["chain_M"],
                    s["chains"], s["residue_idx"], s["mask"])
    S = out["S"]
    lp = s["model"].apply(s["variables"], s["X"], S, s["mask"], s["chain_M"],
                          s["residue_idx"], s["chains"], s["randn"],
                          use_input_decoding_order=True,
                          decoding_order=out["decoding_order"])
    probs_fwd = np.exp(np.asarray(lp))
    probs_seq = np.asarray(out["probs"])
    cm = np.asarray(s["chain_M"] * s["mask"])
    # compare only decoded (chain_mask=1) positions; sampler zeroes others
    np.testing.assert_allclose(probs_seq[cm > 0], probs_fwd[cm > 0],
                               rtol=2e-4, atol=2e-5)
    # fixed/padded positions keep S_true and zero probs
    np.testing.assert_array_equal(np.asarray(S)[cm == 0],
                                  np.asarray(s["S_true"])[cm == 0])
    assert np.all(probs_seq[cm == 0] == 0.0)


def test_forward_causality(setup):
    """Perturbing S at a position decoded LATER must not change log-probs
    at positions decoded earlier."""
    s = setup
    order = jnp.broadcast_to(jnp.arange(s["L"]), (s["B"], s["L"])).astype(jnp.int32)
    base = s["model"].apply(s["variables"], s["X"], s["S_true"], s["mask"],
                            s["chain_M"], s["residue_idx"], s["chains"],
                            s["randn"], use_input_decoding_order=True,
                            decoding_order=order)
    # perturb the LAST-decoded position: no position may see it
    S2 = s["S_true"].at[:, -1].set((s["S_true"][:, -1] + 3) % s["V"])
    pert = s["model"].apply(s["variables"], s["X"], S2, s["mask"],
                            s["chain_M"], s["residue_idx"], s["chains"],
                            s["randn"], use_input_decoding_order=True,
                            decoding_order=order)
    np.testing.assert_allclose(np.asarray(base), np.asarray(pert), atol=1e-5)
    # perturb the FIRST-decoded position: it must not change its own row
    # but must be visible at some later-decoded position (sanity)
    S3 = s["S_true"].at[:, 0].set((s["S_true"][:, 0] + 3) % s["V"])
    pert3 = s["model"].apply(s["variables"], s["X"], S3, s["mask"],
                             s["chain_M"], s["residue_idx"], s["chains"],
                             s["randn"], use_input_decoding_order=True,
                             decoding_order=order)
    np.testing.assert_allclose(np.asarray(base[:, 0]),
                               np.asarray(pert3[:, 0]), atol=1e-5)
    assert np.abs(np.asarray(base[:, 1:] - pert3[:, 1:])).max() > 1e-4


def test_omit_AAs_never_sampled(setup):
    s = setup
    omit = np.zeros(s["V"], np.float32)
    omit[[0, 5, 20]] = 1.0
    out = PM.sample(s["model"], s["variables"], jax.random.PRNGKey(3),
                    s["X"], s["randn"], s["S_true"], s["chain_M"],
                    s["chains"], s["residue_idx"], s["mask"],
                    omit_AAs=omit, temperature=2.0)
    cm = np.asarray(s["chain_M"] * s["mask"]) > 0
    sampled = np.asarray(out["S"])[cm]
    assert not np.isin(sampled, [0, 5, 20]).any()


def test_unconditional_probs(setup):
    s = setup
    lp = s["model"].apply(s["variables"], s["X"], s["mask"],
                          s["residue_idx"], s["chains"],
                          method=s["model"].unconditional_probs)
    assert lp.shape == (s["B"], s["L"], s["V"])
    assert np.isfinite(np.asarray(lp)).all()
    # no sequence context: independent of S by construction — equals the
    # teacher-forced forward under an all-zero backward mask, i.e. a
    # decode order where every position is "first".  Check S-independence
    # via conditional_probs with backbone_only=True at one position
    lp2 = s["model"].apply(s["variables"], s["X"], s["mask"],
                           s["residue_idx"], s["chains"],
                           method=s["model"].unconditional_probs)
    np.testing.assert_array_equal(np.asarray(lp), np.asarray(lp2))


def test_conditional_probs_idx_last_matches_forward(setup):
    """order_mask = onehot(idx) sorts idx last, so conditional_probs[idx]
    must equal the teacher-forced forward at idx under an explicit order
    that places idx last (conditioning on all other true letters)."""
    s = setup
    idx = 4
    lp_cond = PM.conditional_probs(s["model"], s["variables"], s["X"],
                                   s["S_true"], s["mask"], s["chain_M"],
                                   s["residue_idx"], s["chains"], s["randn"])
    # explicit order: the same argsort the scan body uses for this idx
    onehot = jnp.zeros((s["L"],)).at[idx].set(1.0)
    order = PM.decoding_order_from_noise(
        jnp.broadcast_to(onehot[None], (s["B"], s["L"])), s["randn"])
    lp_fwd = s["model"].apply(s["variables"], s["X"], s["S_true"], s["mask"],
                              s["chain_M"], s["residue_idx"], s["chains"],
                              s["randn"], use_input_decoding_order=True,
                              decoding_order=order)
    np.testing.assert_allclose(np.asarray(lp_cond[:, idx]),
                               np.asarray(lp_fwd[:, idx]), atol=1e-5)


def test_tied_sample_ties_positions(setup):
    s = setup
    tied = [[1, 7], [2, 9]]
    out = PM.tied_sample(s["model"], s["variables"], jax.random.PRNGKey(11),
                         s["X"], np.asarray(s["randn"]), s["S_true"],
                         s["chain_M"], s["chains"], s["residue_idx"],
                         s["mask"], tied_pos=tied)
    S = np.asarray(out["S"])
    assert (S[:, 1] == S[:, 7]).all()
    # ties hold only where chain_mask=1; sample 1 has position 9 masked,
    # so the fixed-position rule wins there and S_true is kept
    # (reference :889 applies the chain_mask blend per member)
    assert S[0, 2] == S[0, 9]
    assert S[1, 9] == np.asarray(s["S_true"])[1, 9]
    # decoding order is a permutation covering every position
    do = np.asarray(out["decoding_order"])
    for b in range(s["B"]):
        assert sorted(do[b].tolist()) == list(range(s["L"]))
    # tied members are adjacent in the flat order
    for grp in tied:
        pos = [do[0].tolist().index(t) for t in grp]
        assert abs(pos[0] - pos[1]) == 1


def test_build_tied_groups():
    order = np.array([3, 1, 0, 2, 4])
    groups, flat = PM.build_tied_groups(order, [[1, 4]], 5)
    # first occurrence of 1 pulls in 4; 4 skipped later
    assert flat.tolist() == [3, 1, 4, 0, 2]
    assert groups.shape[1] == 2
    assert groups[1].tolist() == [1, 4]
    assert groups[0].tolist() == [3, -1]


def test_class_shuffle_order():
    from codlad_tpu.data.shards import class_shuffle_order
    labels = np.array([0, 0, 1, 1, 1, 2, 2])
    rng = np.random.default_rng(0)
    order = class_shuffle_order(labels, rng)
    assert sorted(order.tolist()) == list(range(7))
    # class-contiguous: labels along the order form contiguous runs
    runs = labels[order]
    changes = (np.diff(runs) != 0).sum()
    assert changes == 2
