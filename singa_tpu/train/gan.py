"""Adversarial (GAN) training: generator sampling + sequence discriminator.

The reference never implemented its GAN (Discriminator.py / Generator.py are
0-byte placeholders; SURVEY.md §0). This module supplies the intended
capability as a first-class, fully on-device loop:

  * generator = the (CE-pretrained) SINGA model, sampling SMILES token
    sequences conditioned on the pocket encoding + property prefix;
  * discriminator = SeqDiscriminator over token sequences (real ligand
    SMILES from the batch vs. sampled ones);
  * discriminator step: binary cross-entropy on real/fake;
  * generator step: REINFORCE with the discriminator probability as reward
    and a batch-mean baseline (SeqGAN-style), masked past EOS.

Rewards are pluggable: ``extra_reward_fn(tokens) -> [B]`` hooks in host-side
chemistry scores (validity, QED/SA via singa_tpu.chem, Vina via the C++
scorer) through ``jax.pure_callback``.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from singa_tpu.config import Config, EOS_TOKEN, PAD_TOKEN, SOS_TOKEN
from singa_tpu.data.batch import ComplexBatch
from singa_tpu.models.discriminator import SeqDiscriminator
from singa_tpu.models.singa import SINGA, binarize_props


class GANState(NamedTuple):
    g_params: any
    g_opt: any
    d_params: any
    d_opt: any
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
):
    """KV-cached autoregressive categorical sampling.

    Returns (tokens [B, T], logp [B, T]); positions after the sampled EOS are
    PAD with zero log-prob contribution.
    """
    B = enc.shape[0]
    T = max_length

    _, variables = model.apply(
        g_params, enc, enc_pad, prop, method="prime_cache", mutable=["cache"]
    )
    cache0 = variables["cache"]
    tokens0 = jnp.full((B, T), PAD_TOKEN, jnp.int32).at[:, 0].set(SOS_TOKEN)

    def step(carry, t):
        tokens, finished, key, cache, prev = carry
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
        nxt = jax.random.categorical(sub, logits / temperature, axis=-1)
        logp_all = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        logp = jnp.take_along_axis(logp_all, nxt[:, None], axis=-1)[:, 0]
        nxt = jnp.where(finished, PAD_TOKEN, nxt.astype(jnp.int32))
        logp = jnp.where(finished, 0.0, logp)
        tokens = tokens.at[:, t].set(nxt)
        finished = finished | (nxt == EOS_TOKEN)
        return (tokens, finished, key, cache, nxt[:, None]), logp

    (tokens, _, _, _, _), logps = jax.lax.scan(
        step,
        (tokens0, jnp.zeros((B,), bool), key, cache0, tokens0[:, :1]),
        jnp.arange(1, T),
    )
    logp_seq = jnp.concatenate([jnp.zeros((B, 1)), logps.T], axis=1)  # [B, T]
    return tokens, logp_seq


class GANTrainer:
    def __init__(
        self,
        config: Config,
        g_lr: float = 1e-5,
        d_lr: float = 1e-4,
        extra_reward_fn: Optional[Callable] = None,
        temperature: float = 1.0,
    ):
        self.config = config
        self.model = SINGA(config)
        self.disc = SeqDiscriminator(vocab_size=config.model.decoder.vocab_size)
        self.g_optimizer = optax.adam(g_lr)
        self.d_optimizer = optax.adam(d_lr)
        self.extra_reward_fn = extra_reward_fn
        self.temperature = temperature
        self._build()

    def init(self, key: jax.Array, g_params, example_batch: ComplexBatch) -> GANState:
        d_params = self.disc.init(key, example_batch.tokens.target)
        return GANState(
            g_params=g_params,
            g_opt=self.g_optimizer.init(g_params),
            d_params=d_params,
            d_opt=self.d_optimizer.init(d_params),
            step=jnp.zeros((), jnp.int32),
        )

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
                    real_logit, jnp.ones_like(real_logit)
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

        def d_step(state: GANState, batch: ComplexBatch, key):
            enc, pad, prop = self._encode(state.g_params, batch)
            fake, _ = sample_sequences(
                model, state.g_params, enc, pad, prop, key, T, temp
            )
            real = batch.tokens.target
            (loss, acc), grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
                state.d_params, real, fake
            )
            updates, d_opt = self.d_optimizer.update(grads, state.d_opt, state.d_params)
            d_params = optax.apply_updates(state.d_params, updates)
            return state._replace(d_params=d_params, d_opt=d_opt), loss, acc

        def g_loss_fn(g_params, d_params, batch: ComplexBatch, key):
            enc, pad, prop = self._encode(g_params, batch)
            tokens, logp = sample_sequences(model, g_params, enc, pad, prop, key, T, temp)
            reward = jax.nn.sigmoid(disc.apply(d_params, tokens))
            if self.extra_reward_fn is not None:
                reward = reward + self.extra_reward_fn(tokens)
            baseline = jnp.mean(reward)
            advantage = jax.lax.stop_gradient(reward - baseline)
            seq_logp = logp.sum(axis=1)
            loss = -jnp.mean(advantage * seq_logp)
            return loss, jnp.mean(reward)

        def g_step(state: GANState, batch: ComplexBatch, key):
            (loss, reward), grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
                state.g_params, state.d_params, batch, key
            )
            updates, g_opt = self.g_optimizer.update(grads, state.g_opt, state.g_params)
            g_params = optax.apply_updates(state.g_params, updates)
            return (
                state._replace(g_params=g_params, g_opt=g_opt, step=state.step + 1),
                loss,
                reward,
            )

        self.d_step = jax.jit(d_step)
        self.g_step = jax.jit(g_step)

    def train_round(self, state: GANState, batch: ComplexBatch, key, d_steps=1, g_steps=1):
        metrics = {}
        for i in range(d_steps):
            key, sub = jax.random.split(key)
            state, d_loss, d_acc = self.d_step(state, batch, sub)
            metrics["gan/d_loss"] = float(d_loss)
            metrics["gan/d_acc"] = float(d_acc)
        for i in range(g_steps):
            key, sub = jax.random.split(key)
            state, g_loss, reward = self.g_step(state, batch, sub)
            metrics["gan/g_loss"] = float(g_loss)
            metrics["gan/reward"] = float(reward)
        return state, metrics
