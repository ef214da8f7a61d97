"""Adversarial (GAN) training: generator sampling + two discriminators.

The reference never implemented its GAN (Discriminator.py / Generator.py are
0-byte placeholders; SURVEY.md §0). This module supplies the intended
capability as a first-class loop:

  * generator = the (CE-pretrained) SINGA model, sampling SMILES token
    sequences conditioned on the pocket encoding + property prefix;
  * sequence discriminator = SeqDiscriminator over token sequences, fully
    on-device (SeqGAN-style);
  * graph discriminator = GINDiscriminatorDense over *molecular graphs*
    parsed back from the generated SMILES (the reference's intended
    direction, vanilla/vanillaModel.py:144-180); supports plain BCE or
    WGAN-GP critics (BASELINE configs[3] names a WGAN finetune);
  * generator step: REINFORCE with (seq-D probability + graph-D probability +
    validity-gated chemistry reward) and a batch-mean baseline, masked past
    EOS. Invalid SMILES earn zero chemistry/graph reward (the validity gate).

One adversarial round is three jitted segments around one explicit host round
trip: (1) sample token sequences on device, (2) decode/parse/score them on
the host (train/rewards.py — the axon TPU runtime has no jax.pure_callback,
and one sampling pass can feed all three updates), (3) jitted D / graph-D /
G updates consuming the host results as array inputs. The generator update
recomputes the sampled sequences' log-probs teacher-forced (parallel over T)
instead of differentiating through the sampling scan — identical value and
gradient, since the parameters are unchanged between sampling and update.

CLI: ``python -m singa_tpu.train.gan --synthetic --rounds 20``.
"""
from __future__ import annotations

import functools
import os
from typing import Callable, NamedTuple, Optional

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from singa_tpu.config import Config, EOS_TOKEN, PAD_TOKEN, SOS_TOKEN
from singa_tpu.data.batch import ComplexBatch
from singa_tpu.models.discriminator import GINDiscriminatorDense, SeqDiscriminator
from singa_tpu.models.singa import SINGA, binarize_props
from singa_tpu.train.rewards import chem_reward_host, graph_batch_host


class GANState(NamedTuple):
    g_params: any
    g_opt: any
    d_params: any
    d_opt: any
    gd_params: any  # graph discriminator (None when disabled)
    gd_opt: any
    step: jax.Array


def sample_sequences(
    model: SINGA,
    g_params,
    enc,
    enc_pad,
    prop,
    key: jax.Array,
    max_length: int,
    temperature: float = 1.0,
    grammar_mask: bool = False,
    allow_dot: bool = False,
):
    """KV-cached autoregressive categorical sampling.

    Returns (tokens [B, T], logp [B, T]); positions after the sampled EOS are
    PAD with zero log-prob contribution. With ``grammar_mask`` the SMILES
    grammar/valence mask (generate/grammar.py) zeroes inadmissible tokens
    before sampling — the reference's unrealised Masking.py intent.
    """
    from singa_tpu.generate import grammar as _grammar

    B = enc.shape[0]
    T = max_length

    _, variables = model.apply(
        g_params, enc, enc_pad, prop, method="prime_cache", mutable=["cache"]
    )
    cache0 = variables["cache"]
    tokens0 = jnp.full((B, T), PAD_TOKEN, jnp.int32).at[:, 0].set(SOS_TOKEN)

    gram0 = _grammar.init_state((B,)) if grammar_mask else None

    def step(carry, t):
        tokens, finished, key, cache, prev, gram = carry
        logits, vars_ = model.apply(
            {**g_params, "cache": cache},
            prev,
            t - 1,
            enc,
            enc_pad,
            method="decode_token",
            mutable=["cache"],
        )  # [B, V]
        cache = vars_["cache"]
        key, sub = jax.random.split(key)
        logits32 = logits.astype(jnp.float32)
        if grammar_mask:
            ok = _grammar.allowed_tokens(gram, allow_dot=allow_dot)
            logits32 = jnp.where(ok, logits32, -1e9)
        nxt = jax.random.categorical(sub, logits32 / temperature, axis=-1)
        logp_all = jax.nn.log_softmax(logits32, axis=-1)
        logp = jnp.take_along_axis(logp_all, nxt[:, None], axis=-1)[:, 0]
        nxt = jnp.where(finished, PAD_TOKEN, nxt.astype(jnp.int32))
        logp = jnp.where(finished, 0.0, logp)
        if grammar_mask:
            stepped = _grammar.update(gram, nxt)
            gram = jax.tree_util.tree_map(
                lambda new, old: jnp.where(
                    finished.reshape((B,) + (1,) * (new.ndim - 1)), old, new
                ),
                stepped,
                gram,
            )
        tokens = tokens.at[:, t].set(nxt)
        finished = finished | (nxt == EOS_TOKEN)
        return (tokens, finished, key, cache, nxt[:, None], gram), logp

    (tokens, _, _, _, _, _), logps = jax.lax.scan(
        step,
        (tokens0, jnp.zeros((B,), bool), key, cache0, tokens0[:, :1], gram0),
        jnp.arange(1, T),
    )
    logp_seq = jnp.concatenate([jnp.zeros((B, 1)), logps.T], axis=1)  # [B, T]
    return tokens, logp_seq


def sequence_logp(
    model: SINGA,
    g_params,
    tokens: jax.Array,  # [B, T] sampled sequences (SOS first)
    enc,
    enc_pad,
    prop,
    grammar_mask: bool = False,
    allow_dot: bool = False,
) -> jax.Array:
    """Per-sequence log-prob of sampled tokens under the current policy,
    teacher-forced (one parallel decode over T instead of the sampling scan).

    Matches ``sample_sequences``'s recorded log-probs exactly — value AND
    gradient — as long as the parameters haven't changed since sampling,
    which is how the REINFORCE step uses it. When ``grammar_mask`` is on the
    grammar state machine is replayed over the sampled tokens so the
    log-probs are those of the *masked* (on-policy) distribution.
    """
    from singa_tpu.generate import grammar as _grammar

    B, T = tokens.shape
    logits = model.apply(
        g_params, tokens, enc, enc_pad, prop, method="decode_step"
    ).astype(jnp.float32)  # [B, T, V]; position t-1 predicts tokens[t]
    logits = logits[:, :-1]
    if grammar_mask:

        def replay(gram, tok):
            ok = _grammar.allowed_tokens(gram, allow_dot=allow_dot)
            return _grammar.update(gram, tok), ok

        _, ok = jax.lax.scan(
            replay, _grammar.init_state((B,)), tokens[:, 1:].T
        )  # [T-1, B, V]
        logits = jnp.where(ok.transpose(1, 0, 2), logits, -1e9)
    logp_all = jax.nn.log_softmax(logits, axis=-1)
    lp = jnp.take_along_axis(logp_all, tokens[:, 1:, None], axis=-1)[..., 0]
    # a position is on-policy until (and including) the first EOS; the
    # sampler emits forced PAD with zero log-prob afterwards
    is_eos = tokens[:, 1:] == EOS_TOKEN
    live = (jnp.cumsum(is_eos, axis=1) - is_eos) == 0
    return jnp.sum(lp * live, axis=1)  # [B]


class GANTrainer:
    def __init__(
        self,
        config: Config,
        g_lr: float = 1e-5,
        d_lr: float = 1e-4,
        extra_reward_fn: Optional[Callable] = "chem",
        temperature: float = 1.0,
        use_graph_disc: bool = True,
        graph_loss: str = "bce",  # 'bce' | 'wgan-gp'
        gp_weight: float = 10.0,
        grammar_mask: bool = False,
        d_label_smooth: float = 0.9,
    ):
        self.config = config
        self.model = SINGA(config)
        self.disc = SeqDiscriminator(vocab_size=config.model.decoder.vocab_size)
        # one-sided label smoothing on the real targets: a standard
        # saturation counter — D can never reach zero loss, so its sigmoid
        # stays off the rails and gradient keeps flowing to G (round-4
        # trajectory hit d_acc=1.0 / d_loss=0.004 by round 60)
        self.d_label_smooth = d_label_smooth
        # last measured D accuracies, for the train_round d_acc_cap guard
        self._last_d_acc: float | None = None
        self._last_gd_acc: float | None = None
        self.g_optimizer = optax.adam(g_lr)
        self.d_optimizer = optax.adam(d_lr)
        self.use_graph_disc = use_graph_disc
        self.graph_loss = graph_loss
        self.gp_weight = gp_weight
        if use_graph_disc:
            self.graph_disc = GINDiscriminatorDense()
            self.gd_optimizer = optax.adam(d_lr)
            self._graphs_host = functools.partial(
                graph_batch_host, n_max=config.shapes.num_ligand_nodes
            )
        # host fn np tokens [B, T] -> np rewards [B] (explicit host bridge;
        # see module docstring)
        if extra_reward_fn == "chem":
            extra_reward_fn = chem_reward_host
        elif extra_reward_fn == "chem-shaped":
            from singa_tpu.train.rewards import chem_reward_host_shaped

            extra_reward_fn = chem_reward_host_shaped
        self.extra_reward_fn = extra_reward_fn
        self.temperature = temperature
        # SMILES grammar/valence masking during REINFORCE sampling
        # (generate/grammar.py); log-probs stay on-policy for the masked
        # distribution, so the policy gradient remains unbiased
        self.grammar_mask = grammar_mask
        self._build()

    def init(self, key: jax.Array, g_params, example_batch: ComplexBatch) -> GANState:
        k1, k2 = jax.random.split(key)
        d_params = self.disc.init(k1, example_batch.tokens.target)
        gd_params = gd_opt = None
        if self.use_graph_disc:
            s = self.config.shapes
            B = example_batch.batch_size
            gd_params = self.graph_disc.init(
                k2,
                example_batch.ligand.x,
                jnp.zeros((B, s.num_ligand_nodes, s.num_ligand_nodes)),
                example_batch.ligand.mask,
            )
            gd_opt = self.gd_optimizer.init(gd_params)
        return GANState(
            g_params=g_params,
            g_opt=self.g_optimizer.init(g_params),
            d_params=d_params,
            d_opt=self.d_optimizer.init(d_params),
            gd_params=gd_params,
            gd_opt=gd_opt,
            step=jnp.zeros((), jnp.int32),
        )

    @staticmethod
    def _real_graph(batch: ComplexBatch):
        """Dense ligand adjacency from the covalent ll edges."""
        n_l = batch.ligand.x.shape[1]
        idx, mask = batch.ll.index, batch.ll.mask
        src = jax.nn.one_hot(idx[..., 0], n_l, dtype=jnp.float32)
        dst = jax.nn.one_hot(idx[..., 1], n_l, dtype=jnp.float32)
        adj = jnp.einsum("ben,bem->bnm", src * mask[..., None], dst)
        adj = jnp.clip(adj + adj.transpose(0, 2, 1), 0.0, 1.0)
        return batch.ligand.x, adj, batch.ligand.mask

    def _encode(self, g_params, batch: ComplexBatch):
        enc, pad = self.model.apply(g_params, batch, method="encode_pocket")
        prop = (
            binarize_props(batch, self.config.model.props)
            if self.config.model.num_props
            else None
        )
        return enc, pad, prop

    def _build(self):
        model, disc = self.model, self.disc
        T = self.config.model.decoder.tgt_len
        temp = self.temperature

        def d_loss_fn(d_params, real_tokens, fake_tokens):
            real_logit = disc.apply(d_params, real_tokens)
            fake_logit = disc.apply(d_params, fake_tokens)
            loss = jnp.mean(
                optax.sigmoid_binary_cross_entropy(
                    real_logit,
                    jnp.full_like(real_logit, self.d_label_smooth),
                )
            ) + jnp.mean(
                optax.sigmoid_binary_cross_entropy(
                    fake_logit, jnp.zeros_like(fake_logit)
                )
            )
            acc = 0.5 * (
                (real_logit > 0).mean() + (fake_logit < 0).mean()
            )
            return loss, acc

        def sample(g_params, batch: ComplexBatch, key):
            enc, pad, prop = self._encode(g_params, batch)
            tokens, _ = sample_sequences(
                model, g_params, enc, pad, prop, key, T, temp,
                grammar_mask=self.grammar_mask,
            )
            return tokens

        def d_step(state: GANState, batch: ComplexBatch, fake_tokens):
            real = batch.tokens.target
            (loss, acc), grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
                state.d_params, real, fake_tokens
            )
            updates, d_opt = self.d_optimizer.update(grads, state.d_opt, state.d_params)
            d_params = optax.apply_updates(state.d_params, updates)
            return state._replace(d_params=d_params, d_opt=d_opt), loss, acc

        def gd_loss_fn(gd_params, real, fake, key):
            """Graph discriminator loss on (x, adj, mask) triples.

            Invalid generated molecules arrive as empty graphs with valid=0;
            their fake-loss terms are masked so the critic learns chemistry,
            not emptiness (validity is already penalised in the G reward)."""
            rx, radj, rmask = real
            fx, fmask, fadj, fvalid = fake
            gdisc = self.graph_disc
            r_logit = gdisc.apply(gd_params, rx, radj, rmask)
            f_logit = gdisc.apply(gd_params, fx, fadj, fmask)
            w = fvalid / jnp.maximum(fvalid.sum(), 1.0)
            if self.graph_loss == "wgan-gp":
                critic = jnp.sum(f_logit * w) - jnp.mean(r_logit)
                # gradient penalty at interpolated graphs
                eps = jax.random.uniform(key, (rx.shape[0], 1, 1))
                xi = eps * rx + (1 - eps) * fx
                ai = eps[..., 0:1] * radj + (1 - eps[..., 0:1]) * fadj
                mi = rmask | fmask

                def f(x_and_a):
                    x_, a_ = x_and_a
                    return jnp.sum(gdisc.apply(gd_params, x_, a_, mi))

                gx, ga = jax.grad(f)((xi, ai))
                gn = jnp.sqrt(
                    jnp.sum(gx**2, axis=(1, 2)) + jnp.sum(ga**2, axis=(1, 2)) + 1e-12
                )
                gp = jnp.mean((gn - 1.0) ** 2)
                loss = critic + self.gp_weight * gp
                acc = 0.5 * ((r_logit > f_logit.mean()).mean() + 0.5)
            else:
                loss = jnp.mean(
                    optax.sigmoid_binary_cross_entropy(r_logit, jnp.ones_like(r_logit))
                ) + jnp.sum(
                    optax.sigmoid_binary_cross_entropy(f_logit, jnp.zeros_like(f_logit))
                    * w
                )
                acc = 0.5 * ((r_logit > 0).mean() + ((f_logit < 0) * fvalid).sum()
                             / jnp.maximum(fvalid.sum(), 1.0))
            return loss, acc

        def gd_step(state: GANState, batch: ComplexBatch, fake, key):
            real = self._real_graph(batch)
            (loss, acc), grads = jax.value_and_grad(gd_loss_fn, has_aux=True)(
                state.gd_params, real, fake, key
            )
            updates, gd_opt = self.gd_optimizer.update(
                grads, state.gd_opt, state.gd_params
            )
            gd_params = optax.apply_updates(state.gd_params, updates)
            return state._replace(gd_params=gd_params, gd_opt=gd_opt), loss, acc

        def g_loss_fn(g_params, d_params, gd_params, batch, tokens, chem_r, fake):
            enc, pad, prop = self._encode(g_params, batch)
            seq_logp = sequence_logp(
                model, g_params, tokens, enc, pad, prop,
                grammar_mask=self.grammar_mask,
            )
            reward = jax.nn.sigmoid(disc.apply(d_params, tokens))
            valid = None
            if self.use_graph_disc and gd_params is not None:
                fx, fmask, fadj, fvalid = fake
                g_score = jax.nn.sigmoid(
                    self.graph_disc.apply(gd_params, fx, fadj, fmask)
                )
                reward = reward + g_score * fvalid
                valid = fvalid
            if chem_r is not None:
                reward = reward + chem_r
            baseline = jnp.mean(reward)
            advantage = jax.lax.stop_gradient(reward - baseline)
            loss = -jnp.mean(advantage * seq_logp)
            pct_valid = jnp.mean(valid) if valid is not None else jnp.nan
            return loss, (jnp.mean(reward), pct_valid)

        def g_step(state: GANState, batch: ComplexBatch, tokens, chem_r, fake):
            (loss, (reward, pct_valid)), grads = jax.value_and_grad(
                g_loss_fn, has_aux=True
            )(state.g_params, state.d_params, state.gd_params, batch, tokens,
              chem_r, fake)
            updates, g_opt = self.g_optimizer.update(grads, state.g_opt, state.g_params)
            g_params = optax.apply_updates(state.g_params, updates)
            return (
                state._replace(g_params=g_params, g_opt=g_opt, step=state.step + 1),
                loss,
                reward,
                pct_valid,
            )

        def d_eval(d_params, batch: ComplexBatch, fake_tokens):
            return d_loss_fn(d_params, batch.tokens.target, fake_tokens)

        def gd_eval(gd_params, batch: ComplexBatch, fake, key):
            return gd_loss_fn(gd_params, self._real_graph(batch), fake, key)

        self.sample = jax.jit(sample)
        self.d_step = jax.jit(d_step)
        self.d_eval = jax.jit(d_eval)
        self.gd_step = jax.jit(gd_step) if self.use_graph_disc else None
        self.gd_eval = jax.jit(gd_eval) if self.use_graph_disc else None
        self.g_step = jax.jit(g_step)

    def _host_bridge(self, tokens):
        """Device tokens -> (np tokens, chem rewards, fake graph batch)."""
        tokens_np = np.asarray(tokens)
        chem_r = (
            jnp.asarray(self.extra_reward_fn(tokens_np))
            if self.extra_reward_fn is not None
            else None
        )
        fake = self._graphs_host(tokens_np) if self.use_graph_disc else None
        return chem_r, fake

    def train_round(self, state: GANState, batch: ComplexBatch, key, d_steps=1,
                    g_steps=1, d_acc_cap: float = 1.0):
        """One adversarial round: sample -> host chemistry -> D/graph-D/G.

        The same sampled batch feeds the discriminator updates and the first
        generator update (on-policy: g_params are unchanged until g_step);
        additional g_steps resample.

        ``d_acc_cap`` < 1 pauses a discriminator's updates while its last
        measured accuracy exceeds the cap (the standard saturation counter:
        a perfect D gives G a vanishing sigmoid reward gradient) — its
        loss/acc are still evaluated and logged every round, so the pause
        releases as soon as G catches up."""
        metrics = {}
        key, sub = jax.random.split(key)
        tokens = self.sample(state.g_params, batch, sub)
        chem_r, fake = self._host_bridge(tokens)
        pause_d = self._last_d_acc is not None and self._last_d_acc > d_acc_cap
        pause_gd = self._last_gd_acc is not None and self._last_gd_acc > d_acc_cap
        for i in range(d_steps):
            if pause_d:
                d_loss, d_acc = self.d_eval(state.d_params, batch, tokens)
            else:
                state, d_loss, d_acc = self.d_step(state, batch, tokens)
            metrics["gan/d_loss"] = float(d_loss)
            metrics["gan/d_acc"] = float(d_acc)
            metrics["gan/d_paused"] = float(pause_d)
            if self.gd_step is not None:
                key, sub = jax.random.split(key)
                if pause_gd:
                    gd_loss, gd_acc = self.gd_eval(state.gd_params, batch, fake, sub)
                else:
                    state, gd_loss, gd_acc = self.gd_step(state, batch, fake, sub)
                metrics["gan/gd_loss"] = float(gd_loss)
                metrics["gan/gd_acc"] = float(gd_acc)
                metrics["gan/gd_paused"] = float(pause_gd)
                self._last_gd_acc = float(gd_acc)
            self._last_d_acc = float(d_acc)
            pause_d = d_acc_cap < 1.0 and self._last_d_acc > d_acc_cap
            pause_gd = (
                d_acc_cap < 1.0
                and self._last_gd_acc is not None
                and self._last_gd_acc > d_acc_cap
            )
            if i + 1 < d_steps:  # fresh negatives for the next D update
                key, sub = jax.random.split(key)
                tokens = self.sample(state.g_params, batch, sub)
                chem_r, fake = self._host_bridge(tokens)
        for i in range(g_steps):
            if i > 0:  # stay on-policy after the parameter update
                key, sub = jax.random.split(key)
                tokens = self.sample(state.g_params, batch, sub)
                chem_r, fake = self._host_bridge(tokens)
            state, g_loss, reward, pct_valid = self.g_step(
                state, batch, tokens, chem_r, fake
            )
            metrics["gan/g_loss"] = float(g_loss)
            metrics["gan/reward"] = float(reward)
            if self.use_graph_disc:
                metrics["gan/pct_valid"] = float(pct_valid) * 100.0
        return state, metrics


def main(argv=None):
    """GAN CLI: CE-pretrain (optional) then alternating adversarial rounds."""
    import argparse
    import os
    import time

    import numpy as np

    from singa_tpu.config import load_config
    from singa_tpu.data.dataset import NpzDataset, SyntheticDataset
    from singa_tpu.dtypes import set_compute_dtype
    from singa_tpu.models.singa import cross_entropy_loss
    from singa_tpu.train.loop import MetricsWriter
    from singa_tpu.train.rewards import validity_stats

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, default=None)
    ap.add_argument("--logdir", type=str, default="runs/gan")
    ap.add_argument("--data", type=str, default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--rounds", type=int, default=10)
    ap.add_argument("--d-steps", type=int, default=1)
    ap.add_argument("--g-steps", type=int, default=1)
    ap.add_argument("--pretrain", type=int, default=0, help="CE warmup steps")
    ap.add_argument(
        "--init-ckpt", type=str, default=None,
        help="train-run dir (or its checkpoints/ subdir) to restore the "
        "pretrained generator from — BASELINE configs[3]: full CE pretrain "
        "then adversarial finetune",
    )
    ap.add_argument(
        "--eval-every", type=int, default=0,
        help="every N rounds, decode a sample batch and log "
        "validity/uniqueness/QED/SA to metrics.jsonl (quality trajectory)",
    )
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--graph-loss", type=str, default="bce", choices=["bce", "wgan-gp"])
    ap.add_argument("--no-graph-disc", action="store_true")
    ap.add_argument(
        "--d-acc-cap", type=float, default=0.95,
        help="pause discriminator updates while its accuracy exceeds this "
        "(anti-saturation; 1.0 disables)",
    )
    ap.add_argument(
        "--d-label-smooth", type=float, default=0.9,
        help="one-sided label smoothing target for D's real examples",
    )
    ap.add_argument(
        "--vina-eval", type=int, default=0,
        help="at the final report, dock N sampled molecules into their "
        "conditioning pockets (native engine) and log the vina < -7.5 "
        "pass-rate",
    )
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--grammar-mask", action="store_true",
        help="mask REINFORCE sampling with the SMILES grammar/valence mask",
    )
    ap.add_argument(
        "--shaped-reward", action="store_true",
        help="dense-gradient chemistry reward (monotone in QED/SA below the "
        "conditioning thresholds) instead of the pure threshold form",
    )
    args = ap.parse_args(argv)

    cfg = load_config(args.config) if args.config else Config()
    set_compute_dtype(cfg.train.compute_dtype)
    if args.synthetic or not args.data:
        data = SyntheticDataset(args.batch_size, cfg.shapes, cfg.model.decoder.tgt_len)
    else:
        data = NpzDataset(os.path.join(args.data, "train"), args.batch_size)
    it = iter(data)
    batch = next(it)

    model = SINGA(cfg)
    key = jax.random.PRNGKey(args.seed)
    g_params = jax.jit(model.init)(key, batch)

    if args.init_ckpt:
        from singa_tpu.train.checkpointing import CheckpointManager
        from singa_tpu.train.optim import make_optimizer

        d = args.init_ckpt
        if os.path.isdir(os.path.join(d, "checkpoints")):
            d = os.path.join(d, "checkpoints")
        opt_like = make_optimizer(cfg.train.optimizer).init(g_params)
        mgr = CheckpointManager(d)
        restored = mgr.restore(g_params, opt_like)
        assert restored is not None, f"no checkpoint under {d}"
        step0, g_params, _, _ = restored
        mgr.close()
        print(f"restored generator from {d} @ step {step0}")

    if args.pretrain:
        opt = optax.adam(1e-4)
        opt_state = opt.init(g_params)

        @jax.jit
        def ce_step(p, s, b):
            def loss_fn(p):
                return cross_entropy_loss(model.apply(p, b), b.tokens.target)

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, s = opt.update(grads, s, p)
            return optax.apply_updates(p, updates), s, loss

        for i in range(args.pretrain):
            g_params, opt_state, ce = ce_step(g_params, opt_state, next(it))
        print(f"pretrain done: CE={float(ce):.3f}")

    trainer = GANTrainer(
        cfg,
        use_graph_disc=not args.no_graph_disc,
        graph_loss=args.graph_loss,
        grammar_mask=args.grammar_mask,
        d_label_smooth=args.d_label_smooth,
        extra_reward_fn="chem-shaped" if args.shaped_reward else "chem",
    )
    state = trainer.init(jax.random.PRNGKey(args.seed + 1), g_params, batch)
    from singa_tpu.train.checkpointing import save_config

    save_config(args.logdir, cfg)
    writer = MetricsWriter(args.logdir)

    sample_jit = jax.jit(
        lambda p, e, pd, pr, k: sample_sequences(
            trainer.model, p, e, pd, pr, k, cfg.model.decoder.tgt_len,
            grammar_mask=args.grammar_mask,
        )
    )

    def sample_quality(params, k):
        """validity/uniqueness/QED/SA of a decoded sample batch (host)."""
        enc, pad, prop = trainer._encode(params, batch)
        tokens, _ = sample_jit(params, enc, pad, prop, k)
        return validity_stats(np.asarray(tokens))

    t0 = time.time()
    for r in range(1, args.rounds + 1):
        key, sub = jax.random.split(key)
        state, metrics = trainer.train_round(
            state, next(it), sub, args.d_steps, args.g_steps,
            d_acc_cap=args.d_acc_cap,
        )
        if args.eval_every and (r == 1 or r % args.eval_every == 0):
            key, sub = jax.random.split(key)
            q = sample_quality(state.g_params, sub)
            metrics.update({f"quality/{k}": v for k, v in q.items()})
        writer.write(r, **metrics)
        if r == 1 or r % 5 == 0:
            print(
                f"round {r}: "
                + " ".join(f"{k.split('/')[1]}={v:.3f}" for k, v in metrics.items())
                + f" ({(time.time()-t0)/r:.1f}s/round)"
            )
    # final sample quality report (+ optional vina conditioning pass-rate)
    stats = sample_quality(state.g_params, key)
    if args.vina_eval:
        from singa_tpu.train.rewards import vina_conditioning_host

        enc, pad, prop = trainer._encode(state.g_params, batch)
        key, sub = jax.random.split(key)
        tokens, _ = sample_jit(state.g_params, enc, pad, prop, sub)
        v = vina_conditioning_host(batch, np.asarray(tokens), n_eval=args.vina_eval)
        if v is not None:
            stats.update(v)
        else:
            print("vina conditioning eval skipped: native dock lib unavailable")
    print("sample stats:", stats)
    writer.write(args.rounds + 1, **{f"quality/{k}": v for k, v in stats.items()})
    writer.close()
    # save the adversarially-finetuned generator so generation CLIs can
    # restore it (tools/bench_generate --ckpt <logdir>, the configs[4]
    # 10k sweep; round-4 only ever restored INTO the GAN, never out of it)
    from singa_tpu.train.checkpointing import CheckpointManager
    from singa_tpu.train.optim import make_optimizer

    # opt_state saved in the TRAIN optimizer's shape so the standard restore
    # template (bench_generate --ckpt, gan --init-ckpt) round-trips
    opt_like = make_optimizer(cfg.train.optimizer).init(state.g_params)
    mgr = CheckpointManager(os.path.join(args.logdir, "checkpoints"))
    mgr.save(args.rounds, state.g_params, opt_like)
    mgr.close()
    print(f"saved generator -> {args.logdir}/checkpoints @ round {args.rounds}")


if __name__ == "__main__":
    main()
