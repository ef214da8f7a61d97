import numpy as np
import pytest

from singa_tpu.chem.featurize import NODE_FEAT_DIM, atom_features, bond_features
from singa_tpu.chem.mol import Molecule, perceive_bonds
from singa_tpu.chem.pdb import PDBProtein
from singa_tpu.chem.sdf import center_of_mass, parse_sdf
from singa_tpu.chem.tokenizer import decode, encode, split_smiles

REF_LIGAND = "/root/reference/example/7cff_ligand.sdf"
REF_PROTEIN = "/root/reference/example/7cff_protein.pdb"


# ---------- tokenizer ----------

def test_split_roundtrip():
    smis = [
        "CC(=O)Oc1ccccc1C(=O)O",
        "C[C@H](N)C(=O)O",
        "c1ccc2c(c1)[nH]c1ccccc12",
        "CC[N+](C)(C)Cc1ccccc1Br",
        "O=[N+]([O-])c1ccccc1",
    ]
    for s in smis:
        toks = split_smiles(s)
        assert "".join(toks) == s


def test_encode_decode():
    smi = "CC(=O)Oc1ccccc1"
    inp, tgt = encode(smi, tgt_len=32)
    assert inp.shape == (32,) and tgt.shape == (32,)
    from singa_tpu.config import SMI_VOCAB, SOS_TOKEN, EOS_TOKEN, PAD_TOKEN

    assert inp[0] == SOS_TOKEN
    assert PAD_TOKEN in tgt
    assert EOS_TOKEN in tgt
    assert decode(tgt) == smi
    assert decode(inp) == smi


def test_encode_too_long_raises():
    with pytest.raises(ValueError):
        encode("C" * 300, tgt_len=200)


# ---------- molecules ----------

def _ethanol():
    # C-C-O with explicit Hs omitted
    return Molecule(
        atomic_num=[6, 6, 8],
        pos=[[0.0, 0, 0], [1.5, 0, 0], [2.2, 1.2, 0]],
        bonds=[[0, 1], [1, 2]],
        bond_order=[1, 1],
        bond_aromatic=[False, False],
    )


def _benzene():
    ang = np.linspace(0, 2 * np.pi, 7)[:6]
    pos = np.stack([1.39 * np.cos(ang), 1.39 * np.sin(ang), np.zeros(6)], -1)
    bonds = [[i, (i + 1) % 6] for i in range(6)]
    orders = [2, 1, 2, 1, 2, 1]
    return Molecule(
        atomic_num=[6] * 6,
        pos=pos,
        bonds=bonds,
        bond_order=orders,
        bond_aromatic=[False] * 6,
    )


def test_perception_ethanol():
    m = _ethanol()
    assert list(m.hybridization) == [3, 3, 3]
    assert not m.aromatic.any()
    assert m.is_acceptor[2] and not m.is_acceptor[0]
    assert m.is_donor[2]
    assert m.is_hydrophobe[0] and not m.is_hydrophobe[1]
    q = m.partial_charge
    assert q[2] < 0  # O pulls charge
    assert abs(q.sum()) < 0.3


def test_perception_benzene():
    m = _benzene()
    assert m.aromatic.all()
    assert (m.hybridization == 2).all()
    assert m.in_ring.all()
    assert m.is_hydrophobe.all()


def test_feature_dims():
    m = _ethanol()
    x = atom_features(m)
    assert x.shape == (3, NODE_FEAT_DIM)
    # one-hot blocks sum to 1
    np.testing.assert_allclose(x[:, :44].sum(1), 1.0)
    np.testing.assert_allclose(x[:, 44:51].sum(1), 1.0)
    ei, attr = bond_features(m)
    assert ei.shape == (2, 4) and attr.shape == (4, 6)
    assert (attr[:, 3] == 1).all()  # single bonds


def test_perceive_bonds_water_dimer():
    # two O atoms 3 A apart: no bond; O-H style short contact: bond
    z = np.array([8, 8, 6])
    pos = np.array([[0.0, 0, 0], [3.0, 0, 0], [1.4, 0, 0]])
    bonds = perceive_bonds(z, pos)
    pairs = {tuple(b) for b in bonds}
    assert (0, 2) in pairs and (1, 2) not in pairs or (1, 2) in pairs
    assert (0, 1) not in pairs


# ---------- real reference fixtures ----------

def test_parse_reference_ligand():
    mol = parse_sdf(REF_LIGAND)
    assert mol.num_atoms > 10
    assert (mol.atomic_num != 1).all()
    com = center_of_mass(mol)
    assert np.isfinite(com).all()
    x = atom_features(mol)
    assert np.isfinite(x).all()
    assert x.shape[1] == NODE_FEAT_DIM
    ei, attr = bond_features(mol)
    assert ei.shape[1] == 2 * len(mol.bonds)
    # bond lengths chemically plausible
    assert attr[:, 0].min() > 0.9 and attr[:, 0].max() < 2.2


def test_parse_reference_protein_and_pocket():
    prot = PDBProtein(REF_PROTEIN)
    assert prot.num_atoms > 1000
    assert len(prot.residues) > 100
    lig = parse_sdf(REF_LIGAND)
    pocket, idx = prot.pocket(lig.pos, radius=10.0)
    assert 50 < pocket.num_atoms < prot.num_atoms
    # pocket graph is chemically connected-ish: most atoms have bonds
    deg = pocket.degree
    assert (deg > 0).mean() > 0.9
    block = prot.residues_to_pdb_block(prot.query_residues_ligand(lig.pos, 10.0))
    reparsed = PDBProtein(block)
    assert reparsed.num_atoms == pocket.num_atoms
