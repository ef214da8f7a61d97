import jax
import numpy as np
import pytest

from singa_tpu.data.batch import synthetic_batch
from singa_tpu.models.singa import SINGA
from singa_tpu.train.gan import GANTrainer, sample_sequences

from tests.test_model import TGT_LEN, tiny_config


@pytest.fixture(scope="module")
def gan_setup():
    cfg = tiny_config()
    batch = synthetic_batch(0, batch_size=2, shapes=cfg.shapes, tgt_len=TGT_LEN)
    model = SINGA(cfg)
    g_params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    trainer = GANTrainer(cfg)
    state = trainer.init(jax.random.PRNGKey(1), g_params, batch)
    return cfg, batch, trainer, state


def test_sampling_produces_valid_sequences(gan_setup):
    from singa_tpu.config import EOS_TOKEN, PAD_TOKEN, SOS_TOKEN

    cfg, batch, trainer, state = gan_setup
    enc, pad, prop = trainer._encode(state.g_params, batch)
    tokens, logp = jax.jit(
        lambda k: sample_sequences(
            trainer.model, state.g_params, enc, pad, prop, k, TGT_LEN
        )
    )(jax.random.PRNGKey(2))
    tokens = np.asarray(tokens)
    assert tokens.shape == (2, TGT_LEN)
    assert (tokens[:, 0] == SOS_TOKEN).all()
    # after EOS everything is PAD
    for row in tokens:
        eos = np.nonzero(row == EOS_TOKEN)[0]
        if len(eos):
            assert (row[eos[0] + 1 :] == PAD_TOKEN).all()
    lp = np.asarray(logp)
    assert (lp <= 0).all()
    # positions AFTER the sampled EOS contribute zero log-prob (the model may
    # legitimately sample '^' with nonzero log-prob before any EOS)
    for row, lrow in zip(tokens, lp):
        eos = np.nonzero(row == EOS_TOKEN)[0]
        if len(eos):
            assert lrow[eos[0] + 1 :].sum() == 0.0


@pytest.mark.parametrize("grammar_mask", [False, True])
def test_sequence_logp_matches_sampler(gan_setup, grammar_mask):
    """The teacher-forced log-prob recompute (the REINFORCE surrogate) must
    equal the log-probs the sampler recorded, per sequence, with and without
    the grammar mask — this is what makes the host-bridge g_step on-policy."""
    from singa_tpu.train.gan import sequence_logp

    cfg, batch, trainer, state = gan_setup
    enc, pad, prop = trainer._encode(state.g_params, batch)
    tokens, logp = jax.jit(
        lambda k: sample_sequences(
            trainer.model, state.g_params, enc, pad, prop, k, TGT_LEN,
            grammar_mask=grammar_mask,
        )
    )(jax.random.PRNGKey(7))
    got = jax.jit(
        lambda t: sequence_logp(
            trainer.model, state.g_params, t, enc, pad, prop,
            grammar_mask=grammar_mask,
        )
    )(tokens)
    want = np.asarray(logp).sum(axis=1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=1e-4)


def test_adversarial_round_updates_all(gan_setup):
    cfg, batch, trainer, state = gan_setup
    d0 = jax.tree_util.tree_leaves(state.d_params)[0].copy()
    g0 = jax.tree_util.tree_leaves(state.g_params)[0].copy()
    gd0 = jax.tree_util.tree_leaves(state.gd_params)[0].copy()
    state2, metrics = trainer.train_round(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(metrics["gan/d_loss"])
    assert np.isfinite(metrics["gan/gd_loss"])
    assert np.isfinite(metrics["gan/g_loss"])
    # reward = seq-D prob + graph-D prob (valid only) + chem reward (<= 2)
    assert 0.0 <= metrics["gan/reward"] <= 4.5
    assert 0.0 <= metrics["gan/pct_valid"] <= 100.0
    d1 = jax.tree_util.tree_leaves(state2.d_params)[0]
    g1 = jax.tree_util.tree_leaves(state2.g_params)[0]
    gd1 = jax.tree_util.tree_leaves(state2.gd_params)[0]
    assert not np.allclose(np.asarray(d0), np.asarray(d1))
    assert not np.allclose(np.asarray(gd0), np.asarray(gd1))
    # generator update may be tiny but parameters should change
    assert not np.allclose(np.asarray(g0), np.asarray(g1))


def test_wgan_gp_round():
    cfg = tiny_config()
    batch = synthetic_batch(0, batch_size=2, shapes=cfg.shapes, tgt_len=TGT_LEN)
    model = SINGA(cfg)
    g_params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    trainer = GANTrainer(cfg, graph_loss="wgan-gp")
    state = trainer.init(jax.random.PRNGKey(1), g_params, batch)
    state2, metrics = trainer.train_round(state, batch, jax.random.PRNGKey(4))
    assert np.isfinite(metrics["gan/gd_loss"])
    gd0 = jax.tree_util.tree_leaves(state.gd_params)[0]
    gd1 = jax.tree_util.tree_leaves(state2.gd_params)[0]
    assert not np.allclose(np.asarray(gd0), np.asarray(gd1))


def test_chem_reward_validity_gate():
    """Valid molecules earn >= 1; garbage earns exactly 0."""
    import numpy as np

    from singa_tpu.chem.tokenizer import encode
    from singa_tpu.train.rewards import _reward_host

    good_in, _ = encode("CC(=O)Oc1ccccc1C(=O)O", 32)
    junk = np.full((32,), 3, np.int32)  # "((((..." garbage
    # note: encode()'s input row starts with '&' which decode() strips
    r = _reward_host(np.stack([good_in, junk]), 0.5, 0.5)
    assert r[0] >= 1.0
    assert r[1] == 0.0
