"""Benchmark: beam-search generation throughput (molecules/sec).

BASELINE.json configs[4]: beam-20 decode over pockets. Uses the KV-cached
on-device beam search. Prints one JSON line.

Run: python tools/bench_generate.py [batch_size] [num_beams]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import jax
import numpy as np
import jax.numpy as jnp


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    from singa_tpu.config import Config
    from singa_tpu.data.batch import synthetic_batch
    from singa_tpu.dtypes import set_compute_dtype
    from singa_tpu.generate.beam import beam_generate
    from singa_tpu.models.singa import SINGA

    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("batch_size", type=int, nargs="?", default=8)
    ap.add_argument("num_beams", type=int, nargs="?", default=20)
    ap.add_argument("--pretrain", type=int, default=0)
    # SMILES grammar/valence masking during decode (generate/grammar.py);
    # --no-mask measures the unmasked baseline for the ablation. (The old
    # hand-rolled parsing swallowed option VALUES as positionals: --pretrain
    # 200 silently became num_beams=200 — a 10x-too-wide beam.)
    ap.add_argument("--no-mask", action="store_true")
    a = ap.parse_args()
    B, beams, pretrain, mask = a.batch_size, a.num_beams, a.pretrain, not a.no_mask
    cfg = Config()
    set_compute_dtype(cfg.train.compute_dtype)
    batch = synthetic_batch(0, batch_size=B, shapes=cfg.shapes, tgt_len=cfg.model.decoder.tgt_len)
    model = SINGA(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

    if pretrain:
        # brief CE pretraining on drug-SMILES targets (chem/drug_corpus.py):
        # gives the decoder real grammar so %valid is a meaningful number
        import optax

        from singa_tpu.models.singa import cross_entropy_loss
        from singa_tpu.train.optim import make_optimizer

        opt = make_optimizer(cfg.train.optimizer)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state, b):
            def loss_fn(p):
                # mask_pad: with ~25-token drugs in a 200-token bucket, the
                # reference-parity unmasked loss is 85% pad prediction and an
                # undertrained model decodes to pad/EOS everywhere
                return cross_entropy_loss(
                    model.apply(p, b), b.tokens.target, mask_pad=True
                )

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        t0 = time.time()
        for i in range(pretrain):
            tb = synthetic_batch(
                i, batch_size=32, shapes=cfg.shapes,
                tgt_len=cfg.model.decoder.tgt_len, smiles_tokens=True,
            )
            params, opt_state, loss = step(params, opt_state, tb)
        print(
            f"pretrained {pretrain} steps on drug SMILES in "
            f"{time.time()-t0:.0f}s, final CE {float(loss):.3f}",
            file=sys.stderr,
        )

    enc, pad = jax.jit(lambda p, b: model.apply(p, b, method="encode_pocket"))(params, batch)
    prop = jnp.ones((B, 3), jnp.float32)

    # params/enc ride as jit ARGUMENTS — the old closure form serialized the
    # weight pytree into the program (~103 MB HLO -> 25+ min remote compiles
    # and HTTP 413 on axon; see generate/beam.py beam_generate docstring)
    import functools

    run = jax.jit(
        functools.partial(
            beam_generate,
            model,
            num_beams=beams,
            max_length=cfg.generate.max_length,
            length_penalty=cfg.generate.length_penalty,
            topk=1,
            grammar_mask=mask,
            allow_dot=False,
        )
    )

    t0 = time.time()
    tokens, scores = run(params, enc, pad, prop)
    jax.block_until_ready(tokens)
    print(f"compile+first {time.time()-t0:.1f}s", file=sys.stderr)

    iters = 3
    t0 = time.time()
    for _ in range(iters):
        tokens, scores = run(params, enc, pad, prop)
    jax.block_until_ready(tokens)
    dt = (time.time() - t0) / iters
    mps = B / dt
    print(f"{dt*1000:.0f} ms/batch ({mps:.2f} molecules/s, beam {beams})", file=sys.stderr)

    # generation-quality metrics via the in-repo SMILES reader (VERDICT #5):
    # %valid (parse + valence check), %unique, mean properties of the valid set
    from singa_tpu.chem.properties import qed, sa_score
    from singa_tpu.chem.smiles_parser import parse_smiles
    from singa_tpu.chem.tokenizer import decode

    smiles = [decode(t) for t in np.asarray(tokens).reshape(-1, tokens.shape[-1])]
    valid, qeds, sas = [], [], []
    errs = []
    for smi in smiles:
        try:
            mol = parse_smiles(smi)
            valid.append(smi)
            qeds.append(qed(mol))
            sas.append(sa_score(mol))
        except Exception as e:  # noqa: BLE001
            errs.append((smi, str(e)))
    for smi, err in errs[:4]:
        print(f"  invalid: {smi[:60]!r}: {err[:60]}", file=sys.stderr)
    for smi in valid[:4]:
        print(f"  valid:   {smi[:60]!r}", file=sys.stderr)
    pct_valid = 100.0 * len(valid) / max(len(smiles), 1)
    pct_unique = 100.0 * len(set(valid)) / max(len(valid), 1)
    print(
        f"valid {pct_valid:.1f}% unique {pct_unique:.1f}% "
        f"mean QED {np.mean(qeds) if qeds else 0:.3f} "
        f"mean SA {np.mean(sas) if sas else 0:.2f}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "beam_decode_molecules_per_sec",
                "value": round(mps, 3),
                "unit": "molecules/s",
                "num_beams": beams,
                "grammar_mask": mask,
                "pct_valid": round(pct_valid, 2),
                "pct_unique": round(pct_unique, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
