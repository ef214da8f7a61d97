"""ctypes bindings for the native Vina scoring library.

Builds ``libvina_score.so`` from singa_tpu/cpp/src on first use (g++ -O3),
then scores protein-ligand poses in-process — the replacement for the
reference's per-molecule subprocess into the vendored vina binary
(/root/reference/MakeGraph.py:103-111).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from singa_tpu.chem.mol import Molecule
from singa_tpu.chem.properties import rotatable_bonds

_DIR = os.path.dirname(__file__)
_SRCS = [
    os.path.join(_DIR, "src", "vina_score.cc"),
    os.path.join(_DIR, "src", "vina_dock.cc"),
]
_HDR = os.path.join(_DIR, "src", "vina_common.h")
_SO = os.path.join(_DIR, "libvina_score.so")
_LIB = None

# XS type ids (keep in sync with vina_score.cc)
C_H, C_P = 0, 1
N_P, N_D, N_A, N_DA = 2, 3, 4, 5
O_P, O_D, O_A, O_DA = 6, 7, 8, 9
S_T, P_T = 10, 11
F_H, CL_H, BR_H, I_H = 12, 13, 14, 15
MET_D, OTHER = 16, 17


def build(force: bool = False) -> str:
    newest_src = max(os.path.getmtime(p) for p in _SRCS + [_HDR])
    if force or not os.path.exists(_SO) or os.path.getmtime(_SO) < newest_src:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
             "-o", _SO] + _SRCS,
            check=True,
        )
    return _SO


def _lib():
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(build())
        dp = ctypes.POINTER(ctypes.c_double)
        ip = ctypes.POINTER(ctypes.c_int)
        lib.vina_score.restype = ctypes.c_double
        lib.vina_score.argtypes = [dp, ip, ctypes.c_int, dp, ip, ctypes.c_int, ctypes.c_int]
        lib.vina_score_batch.restype = None
        lib.vina_score_batch.argtypes = [dp, ip, ip, ip, ctypes.c_int, dp, ip, ctypes.c_int, dp]
        lib.vina_terms.restype = None
        lib.vina_terms.argtypes = [dp, ip, ctypes.c_int, dp, ip, ctypes.c_int, dp]
        _LIB = lib
    return _LIB


def xs_types(mol: Molecule) -> np.ndarray:
    """Map our perceived atom classes to the XS scoring types."""
    n = mol.num_atoms
    out = np.full(n, OTHER, np.int32)
    don = mol.is_donor
    acc = mol.is_acceptor
    hyd = mol.is_hydrophobe
    for a in range(n):
        z = int(mol.atomic_num[a])
        if z == 6:
            out[a] = C_H if hyd[a] else C_P
        elif z == 7:
            out[a] = (N_DA if acc[a] else N_D) if don[a] else (N_A if acc[a] else N_P)
        elif z == 8:
            out[a] = (O_DA if acc[a] else O_D) if don[a] else (O_A if acc[a] else O_P)
        elif z == 16:
            out[a] = S_T
        elif z == 15:
            out[a] = P_T
        elif z == 9:
            out[a] = F_H
        elif z == 17:
            out[a] = CL_H
        elif z == 35:
            out[a] = BR_H
        elif z == 53:
            out[a] = I_H
        elif z in (12, 20, 25, 26, 30):
            out[a] = MET_D
    return out


def _c_arr(x, ctype):
    return np.ascontiguousarray(x).ctypes.data_as(ctypes.POINTER(ctype))


def score_pose(
    lig_pos: np.ndarray,
    lig_types: np.ndarray,
    rec_pos: np.ndarray,
    rec_types: np.ndarray,
    n_rot: int,
) -> float:
    lib = _lib()
    lp = np.ascontiguousarray(lig_pos, np.float64)
    rp = np.ascontiguousarray(rec_pos, np.float64)
    lt = np.ascontiguousarray(lig_types, np.int32)
    rt = np.ascontiguousarray(rec_types, np.int32)
    return float(
        lib.vina_score(
            _c_arr(lp, ctypes.c_double), _c_arr(lt, ctypes.c_int), len(lt),
            _c_arr(rp, ctypes.c_double), _c_arr(rt, ctypes.c_int), len(rt),
            int(n_rot),
        )
    )


def score_complex(pocket: Molecule, ligand: Molecule) -> float:
    """Affinity estimate (kcal/mol-scale) for the given pose."""
    return score_pose(
        ligand.pos, xs_types(ligand), pocket.pos, xs_types(pocket),
        rotatable_bonds(ligand),
    )


def score_terms(pocket: Molecule, ligand: Molecule) -> np.ndarray:
    """Unweighted (gauss1, gauss2, repulsion, hydrophobic, hbond) sums."""
    lib = _lib()
    out = np.zeros(5, np.float64)
    lp = np.ascontiguousarray(ligand.pos, np.float64)
    rp = np.ascontiguousarray(pocket.pos, np.float64)
    lt = xs_types(ligand)
    rt = xs_types(pocket)
    lib.vina_terms(
        _c_arr(lp, ctypes.c_double), _c_arr(lt, ctypes.c_int), len(lt),
        _c_arr(rp, ctypes.c_double), _c_arr(rt, ctypes.c_int), len(rt),
        _c_arr(out, ctypes.c_double),
    )
    return out


def score_batch(
    ligands: list[tuple[np.ndarray, np.ndarray, int]],
    rec_pos: np.ndarray,
    rec_types: np.ndarray,
) -> np.ndarray:
    """Score many (pos, types, n_rot) ligands against one receptor."""
    lib = _lib()
    offsets = np.zeros(len(ligands) + 1, np.int32)
    for i, (pos, _, _) in enumerate(ligands):
        offsets[i + 1] = offsets[i] + len(pos)
    all_pos = np.concatenate([np.asarray(p, np.float64) for p, _, _ in ligands])
    all_types = np.concatenate([np.asarray(t, np.int32) for _, t, _ in ligands])
    nrot = np.asarray([r for _, _, r in ligands], np.int32)
    out = np.zeros(len(ligands), np.float64)
    rp = np.ascontiguousarray(rec_pos, np.float64)
    rt = np.ascontiguousarray(rec_types, np.int32)
    lib.vina_score_batch(
        _c_arr(all_pos, ctypes.c_double), _c_arr(all_types, ctypes.c_int),
        _c_arr(offsets, ctypes.c_int), _c_arr(nrot, ctypes.c_int), len(ligands),
        _c_arr(rp, ctypes.c_double), _c_arr(rt, ctypes.c_int), len(rt),
        _c_arr(out, ctypes.c_double),
    )
    return out
