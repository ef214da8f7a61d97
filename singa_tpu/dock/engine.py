"""ctypes driver for the native pose search (cpp/src/vina_dock.cc).

High-level API::

    from singa_tpu.dock import dock
    poses = dock(pocket, ligand, exhaustiveness=8)
    poses[0].score, poses[0].pos  # best pose

Replaces the reference's subprocess into the vendored AutoDock Vina binary
(/root/reference/MakeGraph.py:103-111) with an in-process, seedable,
threaded search.
"""
from __future__ import annotations

import ctypes
from typing import NamedTuple

import numpy as np

from singa_tpu.chem.mol import Molecule
from singa_tpu.chem.properties import rotatable_bonds
from singa_tpu.cpp import vina as _vina
from singa_tpu.dock.tree import TorsionTree, interacting_pairs, torsion_tree

_DP = ctypes.POINTER(ctypes.c_double)
_IP = ctypes.POINTER(ctypes.c_int)
_LIB = None


def _lib():
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(_vina.build())
        lib.vina_dock.restype = ctypes.c_int
        lib.vina_dock.argtypes = [
            _DP, _IP, ctypes.c_int,          # ligand
            _DP, _IP, ctypes.c_int,          # receptor
            ctypes.c_int, _IP, _IP, _IP,     # torsion tree
            ctypes.c_int, _IP,               # intra pairs
            _DP, _DP,                        # box center/size
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_double,   # max_poses, rmsd
            _DP, _DP,                        # out xyz / score
        ]
        lib.vina_conf_energy.restype = ctypes.c_double
        lib.vina_conf_energy.argtypes = [
            _DP, _IP, ctypes.c_int, _DP, _IP, ctypes.c_int,
            ctypes.c_int, _IP, _IP, _IP, ctypes.c_int, _IP, _DP, _DP,
        ]
        _LIB = lib
    return _LIB


def _dp(x):
    return np.ascontiguousarray(x, np.float64).ctypes.data_as(_DP)


def _ip(x):
    return np.ascontiguousarray(x, np.int32).ctypes.data_as(_IP)


class DockResult(NamedTuple):
    score: float  # Vina affinity estimate (kcal/mol scale)
    pos: np.ndarray  # [N, 3] docked ligand coordinates


def conf_energy(
    ligand: Molecule,
    pocket: Molecule,
    x: np.ndarray,
    tree: TorsionTree | None = None,
    pairs: np.ndarray | None = None,
) -> tuple[float, np.ndarray]:
    """e_inter + e_intra of the conformation at dof vector ``x``
    ([cx, cy, cz, rx, ry, rz, torsions...]); returns (energy, coords)."""
    tree = tree or torsion_tree(ligand)
    pairs = interacting_pairs(ligand, tree) if pairs is None else pairs
    lt = _vina.xs_types(ligand)
    rt = _vina.xs_types(pocket)
    n = ligand.num_atoms
    out = np.zeros((n, 3), np.float64)
    lig = np.ascontiguousarray(ligand.pos, np.float64)
    rec = np.ascontiguousarray(pocket.pos, np.float64)
    xv = np.ascontiguousarray(x, np.float64)
    assert xv.shape == (6 + len(tree.axes),), xv.shape
    e = _lib().vina_conf_energy(
        _dp(lig), _ip(lt), n, _dp(rec), _ip(rt), pocket.num_atoms,
        len(tree.axes), _ip(tree.axes), _ip(tree.move_offsets),
        _ip(tree.move_atoms), len(pairs), _ip(pairs), _dp(xv), _dp(out),
    )
    return float(e), out


def dock(
    pocket: Molecule,
    ligand: Molecule,
    center: np.ndarray | None = None,
    box_size: float | np.ndarray = 22.0,
    exhaustiveness: int = 8,
    n_steps: int | None = None,
    seed: int = 0,
    max_poses: int = 9,
    rmsd_thresh: float = 2.0,
) -> list[DockResult]:
    """Search ligand poses in the pocket; returns poses best-first.

    ``center`` defaults to the ligand's input centroid (re-docking). The
    step count follows Vina's heuristic scaling in the dof count.
    """
    tree = torsion_tree(ligand)
    pairs = interacting_pairs(ligand, tree)
    lt = _vina.xs_types(ligand)
    rt = _vina.xs_types(pocket)
    n = ligand.num_atoms
    if center is None:
        center = np.asarray(ligand.pos, np.float64).mean(axis=0)
    center = np.asarray(center, np.float64).reshape(3)
    size = np.broadcast_to(np.asarray(box_size, np.float64), (3,)).copy()
    n_tor = len(tree.axes)
    if n_steps is None:
        n_steps = 20 + 6 * (6 + n_tor)  # scaled in dof, Vina-style

    out_xyz = np.zeros((max_poses, n, 3), np.float64)
    out_score = np.zeros(max_poses, np.float64)
    lig = np.ascontiguousarray(ligand.pos, np.float64)
    rec = np.ascontiguousarray(pocket.pos, np.float64)
    k = _lib().vina_dock(
        _dp(lig), _ip(lt), n, _dp(rec), _ip(rt), pocket.num_atoms,
        n_tor, _ip(tree.axes), _ip(tree.move_offsets), _ip(tree.move_atoms),
        len(pairs), _ip(pairs), _dp(center), _dp(size),
        int(exhaustiveness), int(n_steps), int(seed),
        rotatable_bonds(ligand), int(max_poses), float(rmsd_thresh),
        _dp(out_xyz), _dp(out_score),
    )
    # clustering picks basin representatives by search energy (inter+intra);
    # report best-affinity-first like the reference binary's output table
    results = [
        DockResult(float(out_score[i]), out_xyz[i].copy()) for i in range(k)
    ]
    return sorted(results, key=lambda r: r.score)
