import numpy as np

from singa_tpu.chem.mol import Molecule
from singa_tpu.cpp.vina import (
    build,
    score_complex,
    score_pose,
    score_terms,
    xs_types,
    C_H, O_A, O_D,
)


def _mol(z, pos, bonds=None):
    bonds = bonds if bonds is not None else np.zeros((0, 2), int)
    m = len(bonds)
    return Molecule(
        atomic_num=z, pos=np.asarray(pos, np.float32), bonds=bonds,
        bond_order=np.ones(m, int), bond_aromatic=np.zeros(m, bool),
    )


def test_builds():
    assert build().endswith(".so")


def test_hydrophobic_contact_favourable():
    # two hydrophobic carbons at optimal surface distance (~0 gap)
    lig = np.array([[0.0, 0, 0]])
    rec = np.array([[3.8, 0, 0]])  # r=3.8, surface d = 0: g1 max, hphob max
    t = np.array([C_H], np.int32)
    s = score_pose(lig, t, rec, t, 0)
    assert s < 0, s


def test_steric_clash_unfavourable():
    lig = np.array([[0.0, 0, 0]])
    rec = np.array([[2.0, 0, 0]])  # deep overlap
    t = np.array([C_H], np.int32)
    s = score_pose(lig, t, rec, t, 0)
    assert s > 0.5, s


def test_hbond_better_than_nonpolar():
    lig = np.array([[0.0, 0, 0]])
    rec = np.array([[3.0, 0, 0]])  # surface d = -0.4 -> strong hbond region
    hb = score_pose(lig, np.array([O_A], np.int32), rec, np.array([O_D], np.int32), 0)
    non = score_pose(lig, np.array([O_A], np.int32), rec, np.array([O_A], np.int32), 0)
    assert hb < non


def test_rotatable_penalty_scales():
    lig = np.array([[0.0, 0, 0]])
    rec = np.array([[3.8, 0, 0]])
    t = np.array([C_H], np.int32)
    s0 = score_pose(lig, t, rec, t, 0)
    s5 = score_pose(lig, t, rec, t, 5)
    assert abs(s5) < abs(s0)
    np.testing.assert_allclose(s5, s0 / (1 + 0.05846 * 5), rtol=1e-6)


def test_cutoff():
    lig = np.array([[0.0, 0, 0]])
    rec = np.array([[9.0, 0, 0]])  # beyond 8A cutoff
    t = np.array([C_H], np.int32)
    assert score_pose(lig, t, rec, t, 0) == 0.0


def test_reference_complex_plausible():
    from singa_tpu.chem.pdb import PDBProtein
    from singa_tpu.chem.sdf import parse_sdf

    prot = PDBProtein("/root/reference/example/7cff_protein.pdb")
    lig = parse_sdf("/root/reference/example/7cff_ligand.sdf")
    pocket, _ = prot.pocket(lig.pos, 10.0)
    s = score_complex(pocket, lig)
    assert -15.0 < s < 0.0, s
    terms = score_terms(pocket, lig)
    assert (terms >= 0).all()
