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
    # ---- 10k-ligand sweep mode (BASELINE configs[4]) ----
    ap.add_argument("--num", type=int, default=0,
                    help="decode this many TOTAL molecules (looped batches)")
    ap.add_argument("--ckpt", type=str, default=None,
                    help="train-run dir to restore the generator from")
    ap.add_argument("--config", type=str, default=None)
    ap.add_argument("--data", type=str, default=None,
                    help="npz shard dir: decode from its REAL pockets "
                    "(cycled) instead of synthetic ones")
    ap.add_argument("--csv", type=str, default=None,
                    help="write per-molecule smiles/valid/qed/sa/filter rows")
    ap.add_argument("--topk", type=int, default=1, help="beams kept per pocket")
    ap.add_argument(
        "--sample", action="store_true",
        help="categorical sampling (temperature 1) instead of beam search — "
        "the decode mode the GAN loop trains under; deterministic beam "
        "collapses to near-identical outputs on partially-memorized models "
        "(round-5 sweep: 0.1% unique under beam)",
    )
    ap.add_argument("--temperature", type=float, default=1.0)
    a = ap.parse_args()
    B, beams, pretrain, mask = a.batch_size, a.num_beams, a.pretrain, not a.no_mask
    from singa_tpu.config import load_config

    cfg = load_config(a.config) if a.config else Config()
    set_compute_dtype(cfg.train.compute_dtype)
    data_it = None
    if a.data:
        from singa_tpu.data.dataset import NpzDataset

        data_it = iter(NpzDataset(a.data, B, shuffle=False))  # endless epochs
        batch = next(data_it)
    else:
        batch = synthetic_batch(0, batch_size=B, shapes=cfg.shapes, tgt_len=cfg.model.decoder.tgt_len)
    model = SINGA(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

    if a.ckpt:
        from singa_tpu.train.checkpointing import CheckpointManager
        from singa_tpu.train.optim import make_optimizer

        d = a.ckpt
        if os.path.isdir(os.path.join(d, "checkpoints")):
            d = os.path.join(d, "checkpoints")
        mgr = CheckpointManager(d)
        restored = mgr.restore(params, make_optimizer(cfg.train.optimizer).init(params))
        assert restored is not None, f"no checkpoint under {d}"
        step0, params, _, _ = restored
        mgr.close()
        print(f"restored generator from {d} @ step {step0}", file=sys.stderr)

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

    encode = jax.jit(lambda p, b: model.apply(p, b, method="encode_pocket"))
    enc, pad = encode(params, batch)
    # conditioning: with REAL pockets use each complex's OWN binarized
    # labels — the decoder was trained conditioned on them, and off-label
    # conditioning derails free-running decode (round-3 7cff ablation; the
    # round-5 sweep first measured 0.05% unique from the all-ones vector)
    from singa_tpu.models.singa import binarize_props

    def prop_of(b):
        if a.data:
            return binarize_props(b, cfg.model.props)
        return jnp.ones((B, len(cfg.model.props)), jnp.float32)

    prop = prop_of(batch)

    # params/enc ride as jit ARGUMENTS — the old closure form serialized the
    # weight pytree into the program (~103 MB HLO -> 25+ min remote compiles
    # and HTTP 413 on axon; see generate/beam.py beam_generate docstring)
    import functools

    if a.sample:
        from singa_tpu.train.gan import sample_sequences

        def _sample(params, enc, pad, prop, key):
            toks, _ = sample_sequences(
                model, params, enc, pad, prop, key,
                cfg.generate.max_length, a.temperature, grammar_mask=mask,
            )
            return toks[:, None, :], jnp.zeros((toks.shape[0], 1))

        sample_jit = jax.jit(_sample)
        _key = [jax.random.PRNGKey(17)]

        def run(params, enc, pad, prop):
            _key[0], sub = jax.random.split(_key[0])
            return sample_jit(params, enc, pad, prop, sub)
    else:
        run = jax.jit(
            functools.partial(
                beam_generate,
                model,
                num_beams=beams,
                max_length=cfg.generate.max_length,
                length_penalty=cfg.generate.length_penalty,
                topk=a.topk,
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
    # force a value fetch: bare block_until_ready under-reports on the axon
    # backend (DESIGN.md measurement hygiene; the round-5 sweep printed a
    # nonsense 62k mol/s from the old sync)
    _ = int(np.asarray(tokens).sum())
    dt = (time.time() - t0) / iters
    mps = B * a.topk / dt
    print(f"{dt*1000:.0f} ms/batch ({mps:.2f} molecules/s, beam {beams})", file=sys.stderr)

    # generation-quality metrics via the in-repo SMILES reader (VERDICT #5):
    # %valid (parse + valence check), %unique, mean properties of the valid set
    from singa_tpu.chem.properties import qed, sa_score
    from singa_tpu.chem.smiles_parser import parse_smiles
    from singa_tpu.chem.tokenizer import decode

    all_tokens = [np.asarray(tokens)]
    if a.num:
        # ---- BASELINE configs[4]: the N-ligand sweep (default N=10k via
        # --num 10000) with SA/QED filter statistics on the host parser ----
        per_batch = B * a.topk
        n_batches = max(0, -(-a.num // per_batch) - 1)  # first batch done
        t0 = time.time()
        for bi in range(n_batches):
            if data_it is not None:
                b = next(data_it)
            else:
                b = synthetic_batch(
                    bi + 1, batch_size=B, shapes=cfg.shapes,
                    tgt_len=cfg.model.decoder.tgt_len,
                )
            e_i, pad_i = encode(params, b)
            tk, _ = run(params, e_i, pad_i, prop_of(b))
            all_tokens.append(np.asarray(tk))
            if (bi + 1) % 20 == 0:
                done = (bi + 2) * per_batch
                el = time.time() - t0
                print(f"  sweep {done}/{a.num} ({done/el:.1f} mol/s incl. "
                      "encode+host)", file=sys.stderr)
        sweep_dt = time.time() - t0
        if n_batches:
            print(f"sweep throughput {(n_batches*per_batch)/sweep_dt:.2f} "
                  "mol/s (encode + decode + host transfer)", file=sys.stderr)

    tok_arr = np.concatenate([t.reshape(-1, t.shape[-1]) for t in all_tokens])
    smiles = [decode(t) for t in tok_arr]
    valid, qeds, sas = [], [], []
    errs = []
    rows = []
    for smi in smiles:
        try:
            mol = parse_smiles(smi)
            q, s = qed(mol), sa_score(mol)
            valid.append(smi)
            qeds.append(q)
            sas.append(s)
            rows.append((smi, 1, q, s))
        except Exception as e:  # noqa: BLE001
            errs.append((smi, str(e)))
            rows.append((smi, 0, float("nan"), float("nan")))
    for smi, err in errs[:4]:
        print(f"  invalid: {smi[:60]!r}: {err[:60]}", file=sys.stderr)
    for smi in valid[:4]:
        print(f"  valid:   {smi[:60]!r}", file=sys.stderr)
    pct_valid = 100.0 * len(valid) / max(len(smiles), 1)
    pct_unique = 100.0 * len(set(valid)) / max(len(valid), 1)
    # the reference's property thresholds (models/singa.py binarize_props):
    # QED >= 0.6, SAS <= 4.0 — the configs[4] sweep's filter pass-rates
    qa = np.asarray(qeds) if qeds else np.zeros(0)
    sa = np.asarray(sas) if sas else np.zeros(0)
    pass_qed = 100.0 * float((qa >= 0.6).mean()) if len(qa) else 0.0
    pass_sa = 100.0 * float((sa <= 4.0).mean()) if len(sa) else 0.0
    pass_both = (
        100.0 * float(((qa >= 0.6) & (sa <= 4.0)).mean()) if len(qa) else 0.0
    )
    print(
        f"n={len(smiles)} valid {pct_valid:.1f}% unique {pct_unique:.1f}% "
        f"mean QED {np.mean(qeds) if qeds else 0:.3f} "
        f"mean SA {np.mean(sas) if sas else 0:.2f} | filters (of valid): "
        f"QED>=0.6 {pass_qed:.1f}%  SA<=4 {pass_sa:.1f}%  both {pass_both:.1f}%",
        file=sys.stderr,
    )
    if a.csv:
        import csv as _csv

        with open(a.csv, "w", newline="") as f:
            w = _csv.writer(f)
            w.writerow(["smiles", "valid", "qed", "sa", "pass_filter"])
            for smi, ok, q, s in rows:
                w.writerow([smi, ok, f"{q:.4f}", f"{s:.3f}",
                            int(ok and q >= 0.6 and s <= 4.0)])
        print(f"wrote {len(rows)} rows -> {a.csv}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "beam_decode_molecules_per_sec",
                "value": round(mps, 3),
                "unit": "molecules/s",
                "num_beams": beams,
                "grammar_mask": mask,
                "n_decoded": len(smiles),
                "pct_valid": round(pct_valid, 2),
                "pct_unique": round(pct_unique, 2),
                "pass_qed": round(pass_qed, 2),
                "pass_sa": round(pass_sa, 2),
                "pass_both": round(pass_both, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
