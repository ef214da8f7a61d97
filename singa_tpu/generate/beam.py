"""On-device beam search with static shapes and KV-cached decoding.

Re-design of /root/reference/model/BeamSearch.py: the python BeamHypotheses
heap and per-batch bookkeeping loops (BeamSearch.py:7-35, 92-139) become
masked tensor ops inside ``lax.while_loop``; the decoder runs incrementally
against a KV cache (the reference re-runs the full decoder per token,
BeamSearch.py:81-83). Semantics follow the reference: top-2K candidate
expansion, EOS candidates ranked above K are dropped, finished hypotheses are
length-penalty scored (logp_sum / len^penalty), early exit when every batch's
worst kept hypothesis beats the best possible live continuation.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from singa_tpu.config import EOS_TOKEN, PAD_TOKEN, SOS_TOKEN
from singa_tpu.generate import grammar as _grammar

NEG = -1e9
# Finite demotion applied to a beam whose ONLY admissible token is the
# grammar safety valve's forced EOS (invalid completion, e.g. an open ring
# with exhausted valence): large enough that any naturally-finishable beam
# outranks it, finite so it remains a last-resort hypothesis.
FORCED_EOS_PENALTY = 25.0


class BeamState(NamedTuple):
    tokens: jax.Array  # [B, K, T] int32, PAD-filled
    scores: jax.Array  # [B, K] cumulative log-prob of live beams
    fin_tokens: jax.Array  # [B, K, T]
    fin_scores: jax.Array  # [B, K] length-penalised, NEG when empty
    cur_len: jax.Array  # scalar int32
    done: jax.Array  # [B] bool
    cache: Any  # KV-cache pytree (or None)
    gram: Any  # per-beam GrammarState ([B, K] leading) or None


def _gather_cache(cache: Any, flat_idx: jax.Array, rows: int) -> Any:
    """Reorder per-beam cache rows after beam selection."""
    if cache is None:
        return None

    def g(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == rows:
            return x[flat_idx]
        return x

    return jax.tree_util.tree_map(g, cache)


def beam_search(
    decode_fn: Callable,
    batch_size: int,
    num_beams: int,
    max_length: int,
    length_penalty: float = 0.7,
    sos_token: int = SOS_TOKEN,
    eos_token: int = EOS_TOKEN,
    pad_token: int = PAD_TOKEN,
    topk: int = 1,
    init_cache: Any = None,
    grammar_mask: bool = False,
    allow_dot: bool = True,
):
    """Run beam search.

    Args:
      decode_fn: ``(tokens [B*K, T], cur_len, cache) -> (logits [B*K, V],
        cache)`` — next-token logits after position ``cur_len - 1``. The
        cache may be None (full-prefix decoding) or a KV-cache pytree whose
        leading-row-``B*K`` arrays are gathered on beam reorder.
      topk: hypotheses returned per batch element.
      grammar_mask: apply the SMILES grammar + valence mask
        (generate/grammar.py) to each step's log-probs, so only chemically
        admissible tokens are expanded (the reference's unrealised
        Masking.py intent, BASELINE north star).
      allow_dot: admit '.' (multi-fragment output) under the grammar mask.

    Returns ``(tokens [B, topk, T], scores [B, topk])``.
    """
    B, K, T = batch_size, num_beams, max_length

    init_tokens = jnp.full((B, K, T), pad_token, jnp.int32).at[:, :, 0].set(sos_token)
    init_scores = jnp.full((B, K), NEG, jnp.float32).at[:, 0].set(0.0)

    state = BeamState(
        tokens=init_tokens,
        scores=init_scores,
        fin_tokens=jnp.full((B, K, T), pad_token, jnp.int32),
        fin_scores=jnp.full((B, K), NEG, jnp.float32),
        cur_len=jnp.asarray(1, jnp.int32),
        done=jnp.zeros((B,), bool),
        cache=init_cache,
        gram=_grammar.init_state((B, K)) if grammar_mask else None,
    )

    def cond(state: BeamState):
        return (state.cur_len < T) & ~jnp.all(state.done)

    def body(state: BeamState) -> BeamState:
        logits, cache = decode_fn(
            state.tokens.reshape(B * K, T), state.cur_len, state.cache
        )
        V = logits.shape[-1]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        if grammar_mask:
            ok, forced = _grammar.allowed_tokens(
                state.gram, allow_dot=allow_dot, return_forced=True
            )
            logp = jnp.where(ok.reshape(B * K, V), logp, NEG)
            logp = logp - forced.reshape(B * K, 1) * FORCED_EOS_PENALTY
        cand = state.scores.reshape(B * K, 1) + logp  # [BK, V]
        cand = cand.reshape(B, K * V)
        top_scores, top_idx = jax.lax.top_k(cand, 2 * K)  # [B, 2K]
        beam_idx = top_idx // V
        tok_idx = top_idx % V
        is_eos = tok_idx == eos_token

        # ---- finished candidates: EOS within the first K ranks ----
        rank = jnp.broadcast_to(jnp.arange(2 * K), (B, 2 * K))
        fin_cand_valid = is_eos & (rank < K)
        cl = state.cur_len.astype(jnp.float32)  # hypothesis length (excl. EOS)
        fin_cand_scores = jnp.where(
            fin_cand_valid, top_scores / (cl**length_penalty), NEG
        )
        src_tokens = jnp.take_along_axis(
            state.tokens, beam_idx[:, :, None], axis=1
        )  # [B, 2K, T]
        all_scores = jnp.concatenate([state.fin_scores, fin_cand_scores], axis=1)
        all_tokens = jnp.concatenate([state.fin_tokens, src_tokens], axis=1)
        keep_scores, keep_idx = jax.lax.top_k(all_scores, K)
        new_fin_tokens = jnp.take_along_axis(all_tokens, keep_idx[:, :, None], axis=1)
        fin_scores = jnp.where(state.done[:, None], state.fin_scores, keep_scores)
        fin_tokens = jnp.where(
            state.done[:, None, None], state.fin_tokens, new_fin_tokens
        )

        # ---- live beams: best K non-EOS candidates ----
        live_key = jnp.where(is_eos, NEG, top_scores)
        live_scores, live_sel = jax.lax.top_k(live_key, K)  # [B, K]
        live_beam = jnp.take_along_axis(beam_idx, live_sel, axis=1)
        live_tok = jnp.take_along_axis(tok_idx, live_sel, axis=1)
        new_tokens = jnp.take_along_axis(state.tokens, live_beam[:, :, None], axis=1)
        new_tokens = jax.vmap(
            lambda t, tk, cl_: t.at[:, cl_].set(tk), in_axes=(0, 0, None)
        )(new_tokens, live_tok, state.cur_len)

        new_tokens = jnp.where(state.done[:, None, None], state.tokens, new_tokens)
        new_scores = jnp.where(state.done[:, None], state.scores, live_scores)

        # reorder the per-beam KV cache rows to follow the selected beams
        base = (jnp.arange(B, dtype=jnp.int32) * K)[:, None]
        keep_beam = jnp.where(
            state.done[:, None],
            jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32), (B, K)),
            live_beam.astype(jnp.int32),
        )
        flat_idx = (keep_beam + base).reshape(-1)
        cache = _gather_cache(cache, flat_idx, B * K)

        # grammar state: follow the selected beams, then consume the token
        gram = state.gram
        if grammar_mask:
            def _g(x):  # leaves are [B, K] or [B, K, D]
                idx = keep_beam.reshape(B, K, *([1] * (x.ndim - 2)))
                return jnp.take_along_axis(x, idx, axis=1)

            gram = jax.tree_util.tree_map(_g, state.gram)
            stepped = _grammar.update(gram, live_tok)
            keep_old = state.done[:, None]

            def _sel(new, old):
                m = keep_old.reshape(B, 1, *([1] * (new.ndim - 2)))
                return jnp.where(m, old, new)

            gram = jax.tree_util.tree_map(_sel, stepped, gram)

        # ---- done condition (BeamHypotheses.is_done, BeamSearch.py:29-35) ----
        heap_full = fin_scores > NEG / 2
        worst_kept = jnp.min(jnp.where(heap_full, fin_scores, jnp.inf), axis=1)
        best_live = jnp.max(new_scores, axis=1) / (cl**length_penalty)
        newly_done = jnp.all(heap_full, axis=1) & (worst_kept >= best_live)

        return BeamState(
            tokens=new_tokens,
            scores=new_scores,
            fin_tokens=fin_tokens,
            fin_scores=fin_scores,
            cur_len=state.cur_len + 1,
            done=state.done | newly_done,
            cache=cache,
            gram=gram,
        )

    state = jax.lax.while_loop(cond, body, state)

    # flush remaining live beams for unfinished batches (BeamSearch.py:141-149)
    cl = state.cur_len.astype(jnp.float32)
    live_pen = state.scores / (cl**length_penalty)
    live_pen = jnp.where(state.done[:, None], NEG, live_pen)
    if grammar_mask:
        # a flushed beam with an open ring/branch/bond is known-invalid:
        # demote it below any grammatically complete hypothesis
        g = state.gram
        incomplete = (g.rings != 0) | (g.depth != 0) | (g.pending != 0)
        live_pen = live_pen - incomplete * FORCED_EOS_PENALTY
    all_scores = jnp.concatenate([state.fin_scores, live_pen], axis=1)
    all_tokens = jnp.concatenate([state.fin_tokens, state.tokens], axis=1)
    final_scores, sel = jax.lax.top_k(all_scores, K)
    final_tokens = jnp.take_along_axis(all_tokens, sel[:, :, None], axis=1)

    return final_tokens[:, :topk], final_scores[:, :topk]


def beam_generate(
    model,
    params,
    enc,
    enc_pad_mask,
    prop,
    *,
    num_beams: int,
    max_length: int,
    length_penalty: float = 0.7,
    topk: int = 1,
    grammar_mask: bool = False,
    allow_dot: bool = True,
):
    """KV-cached beam search as ONE pure function of (params, enc, pad, prop).

    Call it under ``jax.jit`` with ``functools.partial`` binding ``model`` and
    the static knobs. Everything data-like rides as a jit ARGUMENT — the
    closure-capture form (make_cached_decode_fn + a ``lambda cache:`` jit)
    baked the full parameter pytree into the program as literal constants:
    ~103 MB of weights serialized into every beam HLO, 25-30 min remote
    compiles, and HTTP 413 rejections from the axon compile service. As
    arguments the program is ~1 MB and the compiled executable is reusable
    across checkpoints.

    Returns ``(tokens [B, topk, T], scores [B, topk])``.
    """
    B = enc.shape[0]
    enc_rep = jnp.repeat(enc, num_beams, axis=0)
    pad_rep = jnp.repeat(enc_pad_mask, num_beams, axis=0)
    prop_rep = None if prop is None else jnp.repeat(prop, num_beams, axis=0)

    _, variables = model.apply(
        params, enc_rep, pad_rep, prop_rep, method="prime_cache", mutable=["cache"]
    )
    init_cache = variables["cache"]

    def decode_fn(tokens, cur_len, cache):
        last = jnp.take_along_axis(
            tokens,
            (cur_len - 1)[None, None].astype(jnp.int32)
            * jnp.ones((tokens.shape[0], 1), jnp.int32),
            axis=1,
        )
        logits, mut = model.apply(
            {**params, "cache": cache},
            last,
            cur_len - 1,
            enc_rep,
            pad_rep,
            method="decode_token",
            mutable=["cache"],
        )
        return logits, mut["cache"]

    return beam_search(
        decode_fn,
        batch_size=B,
        num_beams=num_beams,
        max_length=max_length,
        length_penalty=length_penalty,
        topk=topk,
        init_cache=init_cache,
        grammar_mask=grammar_mask,
        allow_dot=allow_dot,
    )


def make_decode_fn(model, params, enc, enc_pad_mask, prop, num_beams: int):
    """Full-prefix decode adapter (no KV cache; fallback / parity path)."""
    enc_rep = jnp.repeat(enc, num_beams, axis=0)
    pad_rep = jnp.repeat(enc_pad_mask, num_beams, axis=0)
    prop_rep = None if prop is None else jnp.repeat(prop, num_beams, axis=0)

    def decode_fn(tokens, cur_len, cache):
        logits = model.apply(
            params, tokens, enc_rep, pad_rep, prop_rep, method="decode_step"
        )  # [BK, T, V]
        step = jnp.take_along_axis(
            logits,
            (cur_len - 1)[None, None, None].astype(jnp.int32)
            * jnp.ones((tokens.shape[0], 1, 1), jnp.int32),
            axis=1,
        )[:, 0, :]
        return step, cache

    return decode_fn


def make_cached_decode_fn(model, params, enc, enc_pad_mask, prop, num_beams: int):
    """KV-cached decode adapter. Returns (decode_fn, init_cache).

    The cache is primed with the property prefix; each step feeds only the
    last token. ``model`` is the SINGA module (methods prime_cache /
    decode_token on its CProMG transformer).
    """
    enc_rep = jnp.repeat(enc, num_beams, axis=0)
    pad_rep = jnp.repeat(enc_pad_mask, num_beams, axis=0)
    prop_rep = None if prop is None else jnp.repeat(prop, num_beams, axis=0)

    _, variables = model.apply(
        params, enc_rep, pad_rep, prop_rep, method="prime_cache", mutable=["cache"]
    )
    init_cache = variables["cache"]

    def decode_fn(tokens, cur_len, cache):
        last = jnp.take_along_axis(
            tokens,
            (cur_len - 1)[None, None].astype(jnp.int32)
            * jnp.ones((tokens.shape[0], 1), jnp.int32),
            axis=1,
        )  # [BK, 1]
        logits, variables = model.apply(
            {**params, "cache": cache},
            last,
            cur_len - 1,
            enc_rep,
            pad_rep,
            method="decode_token",
            mutable=["cache"],
        )
        return logits, variables["cache"]

    return decode_fn, init_cache
