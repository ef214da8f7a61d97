"""Generation pipeline: checkpoint -> pocket featurization -> beam search ->
SMILES CSV.

Re-design of /root/reference/gen.py + model/BeamSearch.py: featurization goes
through the self-contained chem stack, the search runs fully on-device, and
the detokenizer strips the control tokens (gen.py:200-213).

CLI: python -m singa_tpu.generate.generate --checkpoint runs/x/checkpoints \
       --input pocket.pdb --output out.csv
"""
from __future__ import annotations

import argparse
import csv
import functools
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import jax
import jax.numpy as jnp
import numpy as np

from singa_tpu.chem.tokenizer import decode as detokenize
from singa_tpu.config import Config, load_config
from singa_tpu.data.complex_builder import build_from_files
from singa_tpu.generate.beam import beam_generate
from singa_tpu.models.singa import SINGA
from singa_tpu.train.checkpointing import CheckpointManager


def generate_for_pocket(
    model: SINGA,
    params,
    batch,
    cfg: Config,
    prop_target=None,
):
    """Returns (smiles list, scores) for one pocket batch.

    params/enc/prop ride as jit ARGUMENTS (not closure constants): the old
    closure form serialized the full weight pytree into the beam program
    (~103 MB HLO, 25+ min remote compiles on axon — see beam.beam_generate).
    """
    enc, pad = jax.jit(lambda p, b: model.apply(p, b, method="encode_pocket"))(
        params, batch
    )
    prop = None
    if cfg.model.num_props:
        tgt = prop_target if prop_target is not None else cfg.generate.prop
        prop = jnp.asarray([tgt] * batch.batch_size, jnp.float32)

    tokens, scores = jax.jit(
        functools.partial(
            beam_generate,
            model,
            num_beams=cfg.generate.num_beams,
            max_length=cfg.generate.max_length,
            length_penalty=cfg.generate.length_penalty,
            topk=cfg.generate.topk,
            grammar_mask=cfg.generate.grammar_mask,
            allow_dot=cfg.generate.allow_dot,
        )
    )(params, enc, pad, prop)
    tokens = np.asarray(tokens)
    smiles = [
        detokenize(tokens[b, k])
        for b in range(tokens.shape[0])
        for k in range(tokens.shape[1])
    ]
    return smiles, np.asarray(scores).reshape(-1)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", type=str, required=True)
    ap.add_argument("--config", type=str, default=None)
    ap.add_argument(
        "--input", type=str, required=True,
        help="pocket PDB, or a .npz complex from the ETL (exact same "
        "featurization the checkpoint was trained on)",
    )
    ap.add_argument("--ligand", type=str, default=None,
                    help="ligand SDF locating the pocket (PDB input only)")
    ap.add_argument("--output", type=str, default="generated.csv")
    ap.add_argument(
        "--props", action="store_true",
        help="add validity/QED/SA/logP/TPSA columns (host chem stack; the "
        "reference's gen.py CSV carries the molecules only)",
    )
    ap.add_argument(
        "--prop", type=str, default=None,
        help="property prefix override: comma-separated floats (e.g. "
        "'0,0,1'), or 'from-input' to binarize the input complex's own "
        "labels with the model thresholds (npz input only) — the right "
        "conditioning for reconstruction/overfit checks; default is "
        "config.generate.prop (the desired-properties vector)",
    )
    ap.add_argument(
        "--no-mask", action="store_true",
        help="disable SMILES grammar/valence masking during decode "
        "(the ablation baseline; masking is on by default)",
    )
    ap.add_argument(
        "--allow-dot", action="store_true",
        help="admit '.' under the grammar mask (multi-fragment outputs, e.g. "
        "ligands with counter-ions like the bundled 7cff complex); default "
        "masks it out so every output is one connected molecule",
    )
    args = ap.parse_args(argv)

    cfg = load_config(args.config) if args.config else Config()
    ckpt_cfg_path = os.path.join(os.path.dirname(args.checkpoint.rstrip("/")), "config.yml")
    if args.config is None and os.path.exists(ckpt_cfg_path):
        cfg = load_config(ckpt_cfg_path)
    if args.no_mask or args.allow_dot:
        import dataclasses

        cfg = dataclasses.replace(
            cfg,
            generate=dataclasses.replace(
                cfg.generate,
                grammar_mask=cfg.generate.grammar_mask and not args.no_mask,
                allow_dot=cfg.generate.allow_dot or args.allow_dot,
            ),
        )

    if args.input.endswith(".npz"):
        from singa_tpu.data.dataset import _stack

        batch = _stack([dict(np.load(args.input))])
    else:
        batch = build_from_files(
            args.input, args.ligand, cfg.shapes, cfg.model.decoder.tgt_len
        )
    model = SINGA(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    mgr = CheckpointManager(args.checkpoint)
    from singa_tpu.train.optim import make_optimizer

    opt = make_optimizer(cfg.train.optimizer)
    restored = mgr.restore(params, opt.init(params))
    if restored is None:
        raise FileNotFoundError(f"no checkpoint under {args.checkpoint}")
    _, params, _, _ = restored

    prop_target = None
    if args.prop == "from-input":
        from singa_tpu.models.singa import binarize_props

        prop_target = np.asarray(binarize_props(batch, cfg.model.props))[0]
    elif args.prop:
        prop_target = [float(x) for x in args.prop.split(",")]

    smiles, scores = generate_for_pocket(
        model, params, batch, cfg, prop_target=prop_target
    )
    with open(args.output, "w", newline="") as f:
        w = csv.writer(f)
        if not args.props:
            w.writerow(["smiles", "score"])
            for s, sc in zip(smiles, scores):
                w.writerow([s, float(sc)])
        else:
            from singa_tpu.chem.properties import logp, qed, sa_score, tpsa
            from singa_tpu.chem.smiles_parser import parse_smiles

            w.writerow(["smiles", "score", "valid", "qed", "sa", "logp", "tpsa"])
            n_valid = 0
            for s, sc in zip(smiles, scores):
                try:
                    mol = parse_smiles(s)
                    row = [s, float(sc), 1, qed(mol), sa_score(mol), logp(mol), tpsa(mol)]
                    n_valid += 1
                except Exception:
                    row = [s, float(sc), 0, "", "", "", ""]
                w.writerow(row)
            print(f"valid: {n_valid}/{len(smiles)}")
    print(f"wrote {len(smiles)} molecules to {args.output}")


if __name__ == "__main__":
    main()
