"""Native pose search (singa_tpu/dock + cpp/src/vina_dock.cc).

Covers the torsion tree, the C++ conformation builder, and end-to-end
re-docking of the bundled 7cff complex — the pose-generation capability the
reference gets from the vendored AutoDock Vina binary
(/root/reference/MakeGraph.py:103-111).
"""
import numpy as np
import pytest

from singa_tpu.chem.mol import Molecule
from singa_tpu.dock import conf_energy, dock, interacting_pairs, torsion_tree

REF_PROTEIN = "/root/reference/example/7cff_protein.pdb"
REF_LIGAND = "/root/reference/example/7cff_ligand.sdf"


def _chain(n, spacing=1.5):
    """n-carbon chain along x with a zig-zag in y (real torsions)."""
    pos = np.zeros((n, 3), np.float32)
    for i in range(n):
        pos[i] = (i * spacing, 0.4 * (i % 2), 0.0)
    bonds = np.array([(i, i + 1) for i in range(n - 1)])
    return Molecule(
        atomic_num=np.full(n, 6),
        pos=pos,
        bonds=bonds,
        bond_order=np.ones(n - 1, int),
        bond_aromatic=np.zeros(n - 1, bool),
    )


def test_torsion_tree_pentane():
    mol = _chain(5)
    tree = torsion_tree(mol)
    # rotatable: bonds 1-2 and 2-3 (terminal bonds have a degree-1 end)
    assert len(tree.axes) == 2
    # every moving set excludes both axis atoms
    for t, (a_par, a_chd) in enumerate(tree.axes):
        mv = tree.move_atoms[tree.move_offsets[t] : tree.move_offsets[t + 1]]
        assert a_par not in mv and a_chd not in mv
        assert len(mv) >= 1


def test_conf_identity_and_torsion_motion():
    mol = _chain(5)
    tree = torsion_tree(mol)
    pairs = interacting_pairs(mol, tree)
    # distant dummy receptor so inter term is 0
    rec = Molecule(
        atomic_num=np.array([6]),
        pos=np.array([[500.0, 0, 0]], np.float32),
        bonds=np.zeros((0, 2), int),
        bond_order=np.zeros(0, int),
        bond_aromatic=np.zeros(0, bool),
    )
    cen = np.asarray(mol.pos, np.float64).mean(axis=0)
    x0 = np.concatenate([cen, np.zeros(3 + len(tree.axes))])
    e0, xyz0 = conf_energy(mol, rec, x0, tree, pairs)
    np.testing.assert_allclose(xyz0, mol.pos, atol=1e-6)

    # turning one torsion by pi moves exactly its moving set
    x1 = x0.copy()
    x1[6] = np.pi
    _, xyz1 = conf_energy(mol, rec, x1, tree, pairs)
    mv = set(
        tree.move_atoms[tree.move_offsets[0] : tree.move_offsets[1]].tolist()
    )
    a_par, a_chd = (int(v) for v in tree.axes[0])
    # centroid shifts when a subtree rotates; compare shapes via pairwise
    # distances instead: bonded distances must be preserved exactly
    for (i, j) in mol.bonds:
        d0 = np.linalg.norm(xyz0[i] - xyz0[j])
        d1 = np.linalg.norm(xyz1[i] - xyz1[j])
        np.testing.assert_allclose(d0, d1, atol=1e-6)
    # and SOME cross-body distance must change (the torsion did something)
    i = int(tree.axes[0][0])
    far = [a for a in range(mol.num_atoms) if a in mv]
    changed = any(
        abs(
            np.linalg.norm(xyz0[i] - xyz0[j]) - np.linalg.norm(xyz1[i] - xyz1[j])
        )
        > 0.1
        for j in far
        for i in range(mol.num_atoms)
        if i not in mv and i != a_par and i != a_chd
    )
    assert changed


def test_global_rotation_preserves_shape():
    mol = _chain(5)
    tree = torsion_tree(mol)
    pairs = interacting_pairs(mol, tree)
    rec = Molecule(
        atomic_num=np.array([6]),
        pos=np.array([[500.0, 0, 0]], np.float32),
        bonds=np.zeros((0, 2), int),
        bond_order=np.zeros(0, int),
        bond_aromatic=np.zeros(0, bool),
    )
    cen = np.asarray(mol.pos, np.float64).mean(axis=0)
    x = np.concatenate([cen + [1.0, -2.0, 0.5], [0.3, -1.1, 0.7], np.zeros(len(tree.axes))])
    _, xyz = conf_energy(mol, rec, x, tree, pairs)
    # rigid: all pairwise distances preserved
    d0 = np.linalg.norm(mol.pos[:, None] - mol.pos[None, :], axis=-1)
    d1 = np.linalg.norm(xyz[:, None] - xyz[None, :], axis=-1)
    np.testing.assert_allclose(d0, d1, atol=1e-5)
    # centroid landed where requested
    np.testing.assert_allclose(xyz.mean(axis=0), x[:3], atol=1e-6)


@pytest.mark.slow
def test_redock_7cff_recovers_pocket():
    from singa_tpu.chem.pdb import PDBProtein
    from singa_tpu.chem.sdf import parse_sdf
    from singa_tpu.cpp.vina import score_complex

    lig = parse_sdf(REF_LIGAND)
    prot = PDBProtein(REF_PROTEIN)
    pocket, _ = prot.pocket(lig.pos, radius=10.0)

    crystal_score = score_complex(pocket, lig)
    assert crystal_score < 0, crystal_score  # the crystal pose binds

    poses = dock(
        pocket, lig, exhaustiveness=4, n_steps=40, seed=3, max_poses=5
    )
    assert poses, "search returned no poses"
    assert poses[0].score == min(p.score for p in poses)
    # the search must find a pose at least as favourable as a 4A-displaced
    # start would score, and in the same energy basin class as the crystal
    assert poses[0].score < 0, poses[0].score
    assert poses[0].score <= crystal_score + 2.0, (
        poses[0].score,
        crystal_score,
    )
    # poses are mutually distinct (clustering worked)
    for i in range(1, len(poses)):
        rmsd = float(
            np.sqrt(np.mean(np.sum((poses[0].pos - poses[i].pos) ** 2, -1)))
        )
        assert rmsd > 1.0, rmsd
