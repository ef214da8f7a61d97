"""Distance-geometry conformer embedding + SDF writer round-trip.

The reference reads ligand 3D coordinates from CrossDocked SDFs
(/root/reference/utils/PLParser.py:378) and never embeds conformers;
chem/embed3d.py closes that gap so tools/gen_corpus_complexes.py can
synthesize a reference-scale corpus in an environment with no structure
data. These tests pin the physical-plausibility bar the module promises:
bond lengths near covalent-radius sums, no nonbonded clashes, planar
aromatic rings.
"""
import numpy as np
import pytest

from singa_tpu.chem.embed3d import embed_molecule, embed_smiles
from singa_tpu.chem.periodic import covalent_radius
from singa_tpu.chem.sdf import parse_sdf, write_sdf

SMILES = {
    "aspirin": "CC(=O)Oc1ccccc1C(=O)O",
    "ibuprofen": "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
    "nicotine": "CN1CCC[C@H]1c1cccnc1",
}


@pytest.mark.parametrize("name", sorted(SMILES))
def test_embed_physical_plausibility(name):
    mol = embed_smiles(SMILES[name], seed=0)
    pos = mol.pos
    assert pos.shape == (mol.num_atoms, 3)
    assert np.isfinite(pos).all()

    # bonds within ~8% of the covalent target
    for (i, j), o, ar in zip(mol.bonds, mol.bond_order, mol.bond_aromatic):
        d = float(np.linalg.norm(pos[int(i)] - pos[int(j)]))
        r = covalent_radius(int(mol.atomic_num[int(i)])) + covalent_radius(
            int(mol.atomic_num[int(j)])
        )
        assert 0.6 * r < d < 1.15 * r, (i, j, d, r)

    # no nonbonded heavy-atom clash
    n = mol.num_atoms
    bonded = {(min(int(i), int(j)), max(int(i), int(j))) for i, j in mol.bonds}
    dm = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    for i in range(n):
        for j in range(i + 1, n):
            if (i, j) not in bonded:
                assert dm[i, j] > 1.5, (i, j, dm[i, j])


def test_aromatic_ring_planarity():
    mol = embed_smiles(SMILES["aspirin"], seed=1)
    ring = next(r for r in mol.rings if all(mol.aromatic[a] for a in r))
    p = mol.pos[list(ring)]
    p = p - p.mean(axis=0)
    # smallest singular value = out-of-plane extent
    s = np.linalg.svd(p, compute_uv=False)
    assert s[-1] < 0.35 * s[0]


def test_single_atom():
    from singa_tpu.chem.smiles_parser import parse_smiles

    mol = parse_smiles("[Zn]")
    pos = embed_molecule(mol)
    assert pos.shape == (1, 3)


def test_write_sdf_roundtrip():
    mol = embed_smiles(SMILES["nicotine"], seed=2)
    txt = write_sdf(mol, name="nicotine")
    back = parse_sdf(txt)
    assert back.num_atoms == mol.num_atoms
    assert np.allclose(back.pos, mol.pos, atol=5e-4)
    assert (back.atomic_num == mol.atomic_num).all()
    a = {(min(int(i), int(j)), max(int(i), int(j))) for i, j in mol.bonds}
    b = {(min(int(i), int(j)), max(int(i), int(j))) for i, j in back.bonds}
    assert a == b
    assert (back.formal_charge == mol.formal_charge).all()


def test_write_sdf_charges():
    from singa_tpu.chem.smiles_parser import parse_smiles

    mol = parse_smiles("C[N+](C)(C)C")
    mol.pos = embed_molecule(mol, n_restarts=1, n_iters=120)
    back = parse_sdf(write_sdf(mol))
    assert int(back.formal_charge.sum()) == 1
