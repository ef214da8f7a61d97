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
    """%valid / %unique / property means over a decoded batch (host-side;
    for generation benchmarks and GAN logging)."""
    mols = _parse_tokens(tokens)
    smiles = [decode(r) for r in np.asarray(tokens)]
    valid = [s for s, m in zip(smiles, mols) if m is not None and m.num_atoms >= 3]
    stats = {
        "n": len(smiles),
        "pct_valid": 100.0 * len(valid) / max(1, len(smiles)),
        "pct_unique": 100.0 * len(set(valid)) / max(1, len(valid)) if valid else 0.0,
    }
    scored = [m for m in mols if m is not None and m.num_atoms >= 3]
    if scored:
        stats["qed_mean"] = float(np.mean([qed(m) for m in scored]))
        stats["sas_mean"] = float(np.mean([sa_score(m) for m in scored]))
    return stats
