"""Host-side chemistry bridge for the adversarial loop.

Generated token sequences are decoded to SMILES, parsed back to molecular
graphs (singa_tpu/chem/smiles_parser.py) and scored on the host; the results
re-enter the device as ordinary array inputs of the next jitted step. This is
the round trip the reference would have done through RDKit
(utils/PLParser.py:378-386) had its GAN been finished (model/Discriminator.py
is a 0-byte placeholder).

The bridge is an EXPLICIT host round trip between jitted segments, not a
``jax.pure_callback`` inside jit: the axon TPU runtime does not implement
host send/recv callbacks (measured round 3: UNIMPLEMENTED at trace time),
and the explicit form also lets one sampling pass feed all three updates of
an adversarial round. Gradients are unaffected — rewards are
``stop_gradient`` inputs to REINFORCE either way.

Two bridges:
  * ``chem_reward_host`` — [B] scalar rewards: validity gate x property terms
    (QED / SA windows, matching the conditioning thresholds of reference
    model/GAN.py:38-40).
  * ``graph_batch_host`` — fixed-shape (node features, mask, dense adjacency,
    valid flag) batches for the graph discriminator.
"""
from __future__ import annotations

import numpy as np

from singa_tpu.chem.featurize import NODE_FEAT_DIM, atom_features
from singa_tpu.chem.properties import qed, sa_score
from singa_tpu.chem.smiles_parser import parse_smiles
from singa_tpu.chem.tokenizer import decode

# conditioning thresholds (reference model/GAN.py:38-40)
QED_GOOD = 0.6
SAS_GOOD = 4.0


def _parse_tokens(tokens: np.ndarray):
    """[B, T] int -> list[Molecule | None] (None = invalid or empty)."""
    mols = []
    for row in np.asarray(tokens):
        try:
            smi = decode(row)
            mols.append(parse_smiles(smi) if smi else None)
        except (ValueError, RecursionError, IndexError):
            mols.append(None)
    return mols


def chem_reward_host(
    tokens: np.ndarray, w_qed: float = 0.5, w_sas: float = 0.5
) -> np.ndarray:
    """[B, T] tokens -> [B] float32 rewards (host).

    Reward = 0 for invalid SMILES (the validity gate), else
    1 + w_qed*[QED > 0.6] + w_sas*[SA < 4.0].
    """
    out = np.zeros(len(tokens), np.float32)
    for i, mol in enumerate(_parse_tokens(tokens)):
        if mol is None or mol.num_atoms < 3:
            continue  # invalid: reward stays 0 (validity gate)
        r = 1.0
        if w_qed:
            r += w_qed * float(qed(mol) > QED_GOOD)
        if w_sas:
            r += w_sas * float(sa_score(mol) < SAS_GOOD)
        out[i] = r
    return out


# backward-compatible name (tests/test_gan_loop.py pins the gate behaviour)
def _reward_host(tokens: np.ndarray, w_qed: float, w_sas: float) -> np.ndarray:
    return chem_reward_host(tokens, w_qed, w_sas)


def chem_reward_host_shaped(
    tokens: np.ndarray, w_qed: float = 0.5, w_sas: float = 0.5
) -> np.ndarray:
    """Dense-gradient reward: the threshold form gives REINFORCE no signal
    BELOW the conditioning thresholds (round-5 recipe run: qed_mean drifted
    0.37 -> 0.06 with pct_qed_good pinned at 0 — any valid molecule earned
    the same chemistry reward). Shaped terms are monotone in the property,
    equal the threshold form's value AT the threshold, and keep a bonus for
    actually clearing it:

        r = 1 + w_qed*(min(qed/0.6, 1) + [qed > 0.6])/2
              + w_sas*(clip((4-sa)/4, 0, 1) + [sa < 4])/2
    """
    out = np.zeros(len(tokens), np.float32)
    for i, mol in enumerate(_parse_tokens(tokens)):
        if mol is None or mol.num_atoms < 3:
            continue
        q, s = qed(mol), sa_score(mol)
        r = 1.0
        r += w_qed * (min(q / QED_GOOD, 1.0) + float(q > QED_GOOD)) / 2.0
        r += w_sas * (min(max((SAS_GOOD - s) / SAS_GOOD, 0.0), 1.0) + float(s < SAS_GOOD)) / 2.0
        out[i] = r
    return out


def graph_batch_host(tokens: np.ndarray, n_max: int) -> tuple[np.ndarray, ...]:
    """[B, T] tokens -> (x [B,N,59] f32, mask [B,N] bool, adj [B,N,N] f32,
    valid [B] f32) on the host; invalid molecules give empty graphs and
    valid=0 so the caller can mask them out of losses."""
    B = len(tokens)
    x = np.zeros((B, n_max, NODE_FEAT_DIM), np.float32)
    mask = np.zeros((B, n_max), bool)
    adj = np.zeros((B, n_max, n_max), np.float32)
    valid = np.zeros((B,), np.float32)
    for i, mol in enumerate(_parse_tokens(tokens)):
        if mol is None or not (3 <= mol.num_atoms <= n_max):
            continue
        n = mol.num_atoms
        x[i, :n] = atom_features(mol)
        mask[i, :n] = True
        for a, b in mol.bonds:
            adj[i, a, b] = adj[i, b, a] = 1.0
        valid[i] = 1.0
    return x, mask, adj, valid


def validity_stats(tokens: np.ndarray) -> dict:
    """%valid / %unique / property means / conditioning pass-rates over a
    decoded batch (host-side; for generation benchmarks and GAN logging).

    Conditioning success (``pct_qed_good`` / ``pct_sas_good`` / ``pct_cond``)
    is the fraction of ALL generated molecules meeting the conditioning
    thresholds the generator was asked for (qed > 0.6, sas < 4.0 — reference
    model/GAN.py:38-40); invalid molecules count as failures, so the numbers
    answer "how often did conditioning actually work", not "how good are the
    survivors"."""
    mols = _parse_tokens(tokens)
    smiles = [decode(r) for r in np.asarray(tokens)]
    valid = [s for s, m in zip(smiles, mols) if m is not None and m.num_atoms >= 3]
    stats = {
        "n": len(smiles),
        "pct_valid": 100.0 * len(valid) / max(1, len(smiles)),
        "pct_unique": 100.0 * len(set(valid)) / max(1, len(valid)) if valid else 0.0,
    }
    scored = [m for m in mols if m is not None and m.num_atoms >= 3]
    n_all = max(1, len(smiles))
    qed_ok = sas_ok = both_ok = 0
    if scored:
        qs = [qed(m) for m in scored]
        ss = [sa_score(m) for m in scored]
        stats["qed_mean"] = float(np.mean(qs))
        stats["sas_mean"] = float(np.mean(ss))
        qed_ok = sum(q > QED_GOOD for q in qs)
        sas_ok = sum(s < SAS_GOOD for s in ss)
        both_ok = sum((q > QED_GOOD) and (s < SAS_GOOD) for q, s in zip(qs, ss))
    stats["pct_qed_good"] = 100.0 * qed_ok / n_all
    stats["pct_sas_good"] = 100.0 * sas_ok / n_all
    stats["pct_cond"] = 100.0 * both_ok / n_all
    return stats


def vina_conditioning_host(batch, tokens: np.ndarray, n_eval: int = 16,
                           exhaustiveness: int = 2, seed: int = 0) -> dict | None:
    """Dock up to ``n_eval`` generated molecules into their conditioning
    pockets and report the vina < -7.5 pass-rate (the third conditioning
    threshold, reference model/GAN.py:38).

    Pockets are rebuilt from the batch itself: protein atoms + covalent pp
    bonds of row b form the receptor Molecule; the dock box centers on that
    row's real-ligand centroid. Generated SMILES get 3D coordinates from the
    distance-geometry embedder, then a short native MC dock
    (singa_tpu/dock). Invalid/unembeddable molecules count as failures.
    Returns None when the native library is unavailable.
    """
    try:
        from singa_tpu.chem.embed3d import embed_smiles
        from singa_tpu.chem.mol import Molecule
        from singa_tpu.dock.engine import dock
    except Exception:
        return None

    VINA_GOOD = -7.5
    tokens = np.asarray(tokens)[:n_eval]
    prot_x = np.asarray(batch.protein.atomic_num)
    prot_pos = np.asarray(batch.protein.pos)
    prot_mask = np.asarray(batch.protein.mask)
    pp_idx = np.asarray(batch.pp.index)
    pp_mask = np.asarray(batch.pp.mask)
    lig_pos = np.asarray(batch.ligand.pos)
    lig_mask = np.asarray(batch.ligand.mask)

    n_ok = n_scored = 0
    scores = []
    for b, row in enumerate(tokens):
        try:
            smi = decode(row)
            if not smi:
                continue
            mol = embed_smiles(smi, seed=seed + b)
            # oversized molecules exceed the ligand bucket anyway and their
            # torsion trees make the MC dock minutes-slow — count as failures
            if not (4 <= mol.num_atoms <= 64):
                continue
        except Exception:
            continue
        m = prot_mask[b]
        n_p = int(m.sum())
        if n_p < 10 or not lig_mask[b].any():
            continue
        # pocket Molecule: masked atoms + deduped covalent bonds
        old2new = np.cumsum(m) - 1
        eb = pp_idx[b][pp_mask[b]]
        eb = eb[(eb[:, 0] < eb[:, 1]) & m[eb[:, 0]] & m[eb[:, 1]]]
        pocket = Molecule(
            atomic_num=prot_x[b][m],
            pos=prot_pos[b][m],
            bonds=old2new[eb],
            bond_order=np.ones(len(eb), np.int64),
            bond_aromatic=np.zeros(len(eb), bool),
        )
        center = lig_pos[b][lig_mask[b]].mean(axis=0).astype(np.float64)
        mol.pos = (mol.pos - mol.pos.mean(axis=0)) + center.astype(np.float32)
        try:
            res = dock(pocket, mol, center=center, box_size=16.0,
                       exhaustiveness=exhaustiveness, seed=seed + b, max_poses=1)
        except Exception:
            continue
        if not res:
            continue
        n_scored += 1
        scores.append(res[0].score)
        n_ok += res[0].score < VINA_GOOD
    n_all = max(1, len(tokens))
    return {
        "pct_vina_good": 100.0 * n_ok / n_all,
        "n_vina_scored": n_scored,
        "vina_mean": float(np.mean(scores)) if scores else float("nan"),
    }
