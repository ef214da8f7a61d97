import jax
import jax.numpy as jnp
import numpy as np
import pytest

from singa_tpu.config import EOS_TOKEN, PAD_TOKEN, SOS_TOKEN
from singa_tpu.data.batch import synthetic_batch
from singa_tpu.data.dataset import SyntheticDataset, save_complex, NpzDataset, _stack
from singa_tpu.generate.beam import beam_search
from singa_tpu.models.discriminator import GINDiscriminator, SeqDiscriminator
from singa_tpu.models.masking import mask_ligand
from singa_tpu.data.batch import flat_edges

from tests.test_model import TGT_LEN, tiny_config


def test_beam_search_greedy_matches_argmax():
    """With a deterministic token-independent distribution, beam search must
    recover the argmax continuation and terminate on EOS."""
    V = 20
    T = 10
    B = 2
    logits_table = np.full((V,), -5.0, np.float32)
    best = 7
    logits_table[best] = 5.0

    def decode_fn(tokens, cur_len, cache):
        # prefer `best` until length 5, then prefer EOS
        base = jnp.asarray(logits_table)
        eos_pref = jnp.full((V,), -5.0).at[EOS_TOKEN % V].set(10.0)
        out = jnp.where(cur_len < 5, base, eos_pref)
        return jnp.broadcast_to(out, (tokens.shape[0], V)), cache

    tokens, scores = beam_search(
        decode_fn,
        batch_size=B,
        num_beams=3,
        max_length=T,
        eos_token=EOS_TOKEN % V,
        topk=1,
    )
    tok = np.asarray(tokens)[:, 0]
    assert (tok[:, 0] == SOS_TOKEN).all()
    assert (tok[:, 1:5] == best).all()
    # after EOS-preferred step the hypothesis should have ended: stored tokens
    # beyond the finished length remain PAD
    assert (tok[:, 5:] == PAD_TOKEN).all()
    assert np.isfinite(np.asarray(scores)).all()


def test_beam_search_scores_sorted():
    V = 12
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(V,)).astype(np.float32))

    def decode_fn(tokens, cur_len, cache):
        return jnp.broadcast_to(table, (tokens.shape[0], V)), cache

    tokens, scores = beam_search(
        decode_fn, batch_size=1, num_beams=4, max_length=6, eos_token=1, topk=4
    )
    s = np.asarray(scores)[0]
    assert (np.diff(s) <= 1e-6).all()


def test_seq_discriminator_shapes():
    disc = SeqDiscriminator(vocab_size=116, hidden=32, num_layers=1, num_heads=2)
    tokens = synthetic_batch(0, 4, tgt_len=TGT_LEN).tokens.target
    params = jax.jit(disc.init)(jax.random.PRNGKey(0), tokens)
    logit = jax.jit(disc.apply)(params, tokens)
    assert logit.shape == (4,)
    # soft one-hot input path
    onehot = jax.nn.one_hot(tokens, 116)
    logit2 = jax.jit(disc.apply)(params, onehot)
    np.testing.assert_allclose(np.asarray(logit), np.asarray(logit2), atol=1e-4)


def test_gin_discriminator():
    cfg = tiny_config()
    batch = synthetic_batch(0, 2, shapes=cfg.shapes, tgt_len=TGT_LEN)
    disc = GINDiscriminator(hidden=16, out_channels=8, num_layers=2)
    edges = flat_edges(batch.ll, cfg.shapes.num_ligand_nodes, cfg.shapes.num_ligand_nodes)
    params = jax.jit(disc.init)(
        jax.random.PRNGKey(0), batch.ligand.x, batch.ligand.mask, edges
    )
    out = jax.jit(lambda p: disc.apply(p, batch.ligand.x, batch.ligand.mask, edges))(params)
    assert out.shape == (2,)
    assert np.isfinite(np.asarray(out)).all()


def test_mask_ligand():
    cfg = tiny_config()
    batch = synthetic_batch(1, 3, shapes=cfg.shapes, tgt_len=TGT_LEN)
    masked_batch, removed = jax.jit(mask_ligand)(batch, jax.random.PRNGKey(0))
    removed = np.asarray(removed)
    keep = np.asarray(masked_batch.ligand.mask)
    orig = np.asarray(batch.ligand.mask)
    # removed atoms were valid, and keep + removed partitions the valid set
    assert (removed <= orig).all()
    assert ((keep | removed) == orig).all()
    assert (removed.sum(1) >= 1).all()
    assert (keep.sum(1) >= 1).all()
    # ll edges touching removed atoms are masked out
    ll = masked_batch.ll
    idx = np.asarray(ll.index)
    m = np.asarray(ll.mask)
    for b in range(3):
        for e in range(idx.shape[1]):
            if m[b, e]:
                assert keep[b, idx[b, e, 0]] and keep[b, idx[b, e, 1]]


def test_npz_dataset_roundtrip(tmp_path):
    cfg = tiny_config()
    for i in range(4):
        b = synthetic_batch(i, 1, shapes=cfg.shapes, tgt_len=TGT_LEN)
        save_complex(str(tmp_path / f"c{i}.npz"), b)
    ds = NpzDataset(str(tmp_path), batch_size=2, shuffle=False)
    batches = list(ds.epoch())
    assert len(batches) == 2
    assert batches[0].protein.x.shape[0] == 2
    ref = synthetic_batch(0, 1, shapes=cfg.shapes, tgt_len=TGT_LEN)
    np.testing.assert_allclose(
        np.asarray(batches[0].protein.x[0]), np.asarray(ref.protein.x[0])
    )


def test_kv_cache_matches_full_decode():
    """Incremental cached decoding must reproduce full-prefix logits."""
    import jax.numpy as jnp
    from singa_tpu.models.singa import SINGA

    cfg = tiny_config()
    batch = synthetic_batch(5, batch_size=2, shapes=cfg.shapes, tgt_len=TGT_LEN)
    model = SINGA(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    enc, pad = jax.jit(lambda p, b: model.apply(p, b, method="encode_pocket"))(
        params, batch
    )
    prop = jnp.ones((2, 3), jnp.float32)

    tokens = batch.tokens.input
    full = jax.jit(
        lambda p: model.apply(p, tokens, enc, pad, prop, method="decode_step")
    )(params)  # [B, T, V]

    _, variables = model.apply(
        params, enc, pad, prop, method="prime_cache", mutable=["cache"]
    )
    cache = variables["cache"]

    def step(cache, t):
        logits, vars_ = model.apply(
            {**params, "cache": cache},
            jax.lax.dynamic_slice_in_dim(tokens, t, 1, axis=1),
            t,
            enc,
            pad,
            method="decode_token",
            mutable=["cache"],
        )
        return vars_["cache"], logits

    cache, inc = jax.lax.scan(step, cache, jnp.arange(8))
    inc = jnp.transpose(inc, (1, 0, 2))  # [B, 8, V]
    np.testing.assert_allclose(
        np.asarray(inc), np.asarray(full[:, :8, :]), atol=2e-3, rtol=1e-3
    )


def test_beam_generate_matches_closure_path():
    """beam_generate (params as jit arguments — the form whose HLO is ~1 MB
    instead of the closure form's ~103 MB of inlined weights) must reproduce
    the legacy make_cached_decode_fn + beam_search path exactly."""
    import functools

    import jax.numpy as jnp
    from singa_tpu.generate.beam import beam_generate, make_cached_decode_fn
    from singa_tpu.models.singa import SINGA

    cfg = tiny_config()
    batch = synthetic_batch(3, batch_size=2, shapes=cfg.shapes, tgt_len=TGT_LEN)
    model = SINGA(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    enc, pad = jax.jit(lambda p, b: model.apply(p, b, method="encode_pocket"))(
        params, batch
    )
    prop = jnp.ones((2, 3), jnp.float32)
    kw = dict(num_beams=3, max_length=12, length_penalty=0.7, topk=2)

    decode_fn, cache = make_cached_decode_fn(model, params, enc, pad, prop, 3)
    ref_tok, ref_sc = jax.jit(
        lambda c: beam_search(
            decode_fn, batch_size=2, init_cache=c, grammar_mask=True, **kw
        )
    )(cache)

    tok, sc = jax.jit(
        functools.partial(beam_generate, model, grammar_mask=True, **kw)
    )(params, enc, pad, prop)

    np.testing.assert_array_equal(np.asarray(tok), np.asarray(ref_tok))
    np.testing.assert_allclose(np.asarray(sc), np.asarray(ref_sc), rtol=1e-6)


def test_generate_cli_npz_input(tmp_path):
    """The generate CLI accepts an ETL .npz complex directly (the trained-on
    featurization, used by the real-data anchor runbook stage 5)."""
    from singa_tpu.generate import generate as gen_cli
    from singa_tpu.train.loop import Trainer

    cfg = tiny_config()
    batch = synthetic_batch(0, 1, shapes=cfg.shapes, tgt_len=TGT_LEN)
    npz = tmp_path / "complex.npz"
    save_complex(str(npz), batch)

    logdir = tmp_path / "run"
    trainer = Trainer(cfg, logdir=str(logdir), use_mesh=False)
    trainer.init_state(batch)
    trainer.step = 1
    trainer.save()
    trainer.ckpt.wait()

    out = tmp_path / "gen.csv"
    gen_cli.main(
        [
            "--checkpoint", str(logdir / "checkpoints"),
            "--input", str(npz),
            "--output", str(out),
        ]
    )
    lines = out.read_text().strip().splitlines()
    assert lines[0] == "smiles,score"
    assert len(lines) > 1
