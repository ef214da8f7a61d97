"""Host-side chemistry bridge for the adversarial loop.

Generated token sequences are decoded to SMILES, parsed back to molecular
graphs (singa_tpu/chem/smiles_parser.py) and scored on the host; results
re-enter the jitted loop through ``jax.pure_callback``. This is the round
trip the reference would have done through RDKit (utils/PLParser.py:378-386)
had its GAN been finished (model/Discriminator.py is a 0-byte placeholder).

Two bridges:
  * ``chem_reward_fn`` — [B] scalar rewards: validity gate x property terms
    (QED / SA / logP windows, matching the conditioning thresholds of
    reference model/GAN.py:38-40).
  * ``graph_batch_fn`` — fixed-shape (node features, mask, dense adjacency,
    valid flag) batches for the graph discriminator.
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
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


def _reward_host(tokens: np.ndarray, w_qed: float, w_sas: float) -> np.ndarray:
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


def chem_reward_fn(w_qed: float = 0.5, w_sas: float = 0.5) -> Callable:
    """Returns ``fn(tokens [B, T]) -> [B] float32`` usable inside jit.

    Reward = 0 for invalid SMILES (the validity gate), else
    1 + w_qed*[QED > 0.6] + w_sas*[SA < 4.0].
    """

    def fn(tokens: jax.Array) -> jax.Array:
        shape = jax.ShapeDtypeStruct((tokens.shape[0],), jnp.float32)
        return jax.pure_callback(
            functools.partial(_reward_host, w_qed=w_qed, w_sas=w_sas),
            shape,
            tokens,
            vmap_method="sequential",
        )

    return fn


def _graphs_host(tokens: np.ndarray, n_max: int) -> tuple[np.ndarray, ...]:
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


def graph_batch_fn(n_max: int) -> Callable:
    """Returns ``fn(tokens) -> (x [B,N,59], mask [B,N], adj [B,N,N],
    valid [B])`` usable inside jit; invalid molecules give empty graphs and
    valid=0 so the caller can mask them out of losses."""

    def fn(tokens: jax.Array):
        B = tokens.shape[0]
        shapes = (
            jax.ShapeDtypeStruct((B, n_max, NODE_FEAT_DIM), jnp.float32),
            jax.ShapeDtypeStruct((B, n_max), jnp.bool_),
            jax.ShapeDtypeStruct((B, n_max, n_max), jnp.float32),
            jax.ShapeDtypeStruct((B,), jnp.float32),
        )
        return jax.pure_callback(
            functools.partial(_graphs_host, n_max=n_max),
            shapes,
            tokens,
            vmap_method="sequential",
        )

    return fn


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
