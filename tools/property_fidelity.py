"""Quantify own-chemistry vs RDKit property fidelity (VERDICT r4 #7).

The conditioning vector binarizes vina < -7.5 / qed > 0.6 / sas < 4.0
(models/singa.py binarize_props; reference model/GAN.py:38-44), so a
systematic offset between our self-contained property implementations
(chem/properties.py) and the reference's RDKit labels
(/root/reference/utils/PLParser.py:378-386) can FLIP conditioning labels
even when absolute accuracy looks acceptable.

Ground truth available in this environment: the three prebuilt reference
graphs bundled under /root/reference/example/ and imported by
tools/import_ref_graphs.py (data/ref_graphs_large/train/{3wi2_4tpp,
4agq_5a7b,5cp5_4nue}.npz) carry the reference's own RDKit-computed labels;
their token sequences decode back to the ligand SMILES, which our parser +
property stack re-scores. 7cff.npz went through OUR ETL (own labels) and is
excluded.

Output: per-graph table of ref-vs-own logP/QED/SA/TPSA/MW, the deltas, the
binarized qed/sas labels on both sides, and the label-flip count; then a
threshold-sensitivity sweep over the corpus — the fraction of corpus
ligands whose qed/sas label WOULD flip if our values are biased by the
median deltas observed on the reference graphs.

Run: python tools/property_fidelity.py [--corpus data/corpus] [--md]
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from singa_tpu.chem.properties import logp as own_logp  # noqa: E402
from singa_tpu.chem.properties import qed, sa_score, tpsa  # noqa: E402
from singa_tpu.chem.smiles_parser import parse_smiles  # noqa: E402
from singa_tpu.chem.tokenizer import decode  # noqa: E402

QED_T, SAS_T = 0.6, 4.0
REF_GRAPHS = ("3wi2_4tpp", "4agq_5a7b", "5cp5_4nue")


def score_ref_graphs(root: str = "data/ref_graphs_large/train"):
    """[(name, smiles, ref_props, own_props)] for the reference-labelled
    bundled graphs."""
    rows = []
    for name in REF_GRAPHS:
        path = os.path.join(root, f"{name}.npz")
        if not os.path.exists(path):
            continue
        z = np.load(path)
        smi = decode(z["tokens.target"])
        mol = parse_smiles(smi)
        ref = {
            "logp": float(z["props.logp"]),
            "qed": float(z["props.qed"]),
            "sas": float(z["props.sas"]),
            "tpsa": float(z["props.tpsa"]),
            "weight": float(z["props.weight"]),
        }
        own = {
            "logp": float(own_logp(mol)),
            "qed": float(qed(mol)),
            "sas": float(sa_score(mol)),
            "tpsa": float(tpsa(mol)),
            "weight": float(mol.mol_weight),
        }
        rows.append((name, smi, ref, own))
    return rows


def flip_count(rows) -> tuple[int, int]:
    """(#binarized qed/sas labels that flip, #labels compared)."""
    flips = total = 0
    for _, _, ref, own in rows:
        for key, thresh, op in (("qed", QED_T, "gt"), ("sas", SAS_T, "lt")):
            r = ref[key] > thresh if op == "gt" else ref[key] < thresh
            o = own[key] > thresh if op == "gt" else own[key] < thresh
            total += 1
            flips += int(r != o)
    return flips, total


def corpus_sensitivity(corpus: str, d_qed: float, d_sas: float, n_max: int = 200):
    """Fraction of corpus ligands whose binarized label would flip under a
    systematic bias of (d_qed, d_sas) on our values."""
    files = sorted(glob.glob(os.path.join(corpus, "train", "*.npz")))[:n_max]
    if not files:
        return None
    q_flip = s_flip = n = 0
    for f in files:
        z = np.load(f)
        q, s = float(z["props.qed"]), float(z["props.sas"])
        n += 1
        q_flip += int((q > QED_T) != (q + d_qed > QED_T))
        s_flip += int((s < SAS_T) != (s + d_sas < SAS_T))
    return {"n": n, "qed_flip_pct": 100.0 * q_flip / n, "sas_flip_pct": 100.0 * s_flip / n}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data/ref_graphs_large/train")
    ap.add_argument("--corpus", default="data/corpus")
    ap.add_argument("--md", action="store_true", help="markdown table output")
    args = ap.parse_args()

    rows = score_ref_graphs(args.root)
    if not rows:
        raise SystemExit(f"no reference-labelled graphs under {args.root}")

    keys = ("logp", "qed", "sas", "tpsa", "weight")
    if args.md:
        print("| graph | prop | RDKit (ref) | own | delta |")
        print("|---|---|---|---|---|")
    for name, smi, ref, own in rows:
        for k in keys:
            d = own[k] - ref[k]
            if args.md:
                print(f"| {name} | {k} | {ref[k]:.3f} | {own[k]:.3f} | {d:+.3f} |")
            else:
                print(f"{name:12s} {k:7s} ref={ref[k]:9.3f} own={own[k]:9.3f} d={d:+8.3f}")
        rq = ref["qed"] > QED_T
        oq = own["qed"] > QED_T
        rs = ref["sas"] < SAS_T
        os_ = own["sas"] < SAS_T
        line = (
            f"{name}: labels qed>{QED_T}: ref={int(rq)} own={int(oq)}"
            f"{' FLIP' if rq != oq else ''}; sas<{SAS_T}: ref={int(rs)} "
            f"own={int(os_)}{' FLIP' if rs != os_ else ''}"
        )
        print(("> " if args.md else "") + line)

    flips, total = flip_count(rows)
    print(f"\nbinarized label flips: {flips}/{total}")

    d_qed = float(np.median([own["qed"] - ref["qed"] for _, _, ref, own in rows]))
    d_sas = float(np.median([own["sas"] - ref["sas"] for _, _, ref, own in rows]))
    print(f"median deltas: qed {d_qed:+.3f}, sas {d_sas:+.3f}")
    sens = corpus_sensitivity(args.corpus, d_qed, d_sas)
    if sens:
        print(
            f"corpus sensitivity (n={sens['n']}): a systematic bias of that "
            f"size would flip {sens['qed_flip_pct']:.1f}% of qed labels and "
            f"{sens['sas_flip_pct']:.1f}% of sas labels"
        )


if __name__ == "__main__":
    main()
