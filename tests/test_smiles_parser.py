"""SMILES parser: round trips with the writer, validity checks, kekulisation.

The reference relies on RDKit for all of this (utils/PLParser.py:378-386);
these tests pin our self-contained implementation on known molecules.
"""
import numpy as np
import pytest

from singa_tpu.chem.smiles_parser import is_valid_smiles, parse_smiles
from singa_tpu.chem.smiles_writer import write_smiles

ASPIRIN = "CC(=O)Oc1ccccc1C(=O)O"
CAFFEINE = "Cn1cnc2c1c(=O)n(C)c(=O)n2C"
IBUPROFEN = "CC(C)Cc1ccc(cc1)C(C)C(=O)O"


def test_parse_basic_counts():
    mol = parse_smiles(ASPIRIN)
    assert mol.num_atoms == 13
    z = np.asarray(mol.atomic_num)
    assert (z == 6).sum() == 9 and (z == 8).sum() == 4
    assert mol.aromatic.sum() == 6
    # kekulised aromatic ring: alternating single/double
    ring_orders = [
        int(o) for (i, j), o, ar in zip(mol.bonds, mol.bond_order, mol.bond_aromatic)
        if ar
    ]
    assert sorted(ring_orders) == [1, 1, 1, 2, 2, 2]


def test_parse_charges_and_h():
    mol = parse_smiles("[NH3+]CC(=O)[O-]")  # zwitterionic glycine
    assert mol.formal_charge.sum() == 0
    assert mol.formal_charge[0] == 1 and mol.formal_charge[-1] == -1
    hs = mol._h_count()
    assert hs[0] == 3  # bracket H count respected
    assert hs[-1] == 0


def test_parse_ring_closures_percent():
    assert is_valid_smiles("C1CCCCC1")
    assert is_valid_smiles("C%10CCCCC%10")
    assert not is_valid_smiles("C1CCCC")  # unclosed
    assert not is_valid_smiles("C1CC11CC1" * 1 + "1")  # dangling digit


def test_invalid_grammar():
    assert not is_valid_smiles("")
    assert not is_valid_smiles("C((C)C")
    assert not is_valid_smiles("C)")
    assert not is_valid_smiles("C==C")
    assert not is_valid_smiles("[Xx]")
    assert not is_valid_smiles("C#")


def test_invalid_valence():
    assert not is_valid_smiles("C(C)(C)(C)(C)C")  # 5-valent carbon
    assert not is_valid_smiles("O=C(=O)=O")  # 6-valent carbon... also bad O
    assert not is_valid_smiles("FF" + "F")  # F with 2 bonds via chain
    assert is_valid_smiles("S(=O)(=O)(O)O")  # hypervalent S allowed
    assert is_valid_smiles("[N+](C)(C)(C)C")  # quaternary N+ allowed
    assert not is_valid_smiles("N(C)(C)(C)C")  # neutral 4-valent N invalid


def test_kekulisation():
    assert is_valid_smiles("c1ccccc1")  # benzene
    assert is_valid_smiles("c1cc[nH]c1")  # pyrrole
    assert is_valid_smiles("c1ccncc1")  # pyridine
    assert is_valid_smiles("c1ccc2ccccc2c1")  # naphthalene
    # odd all-carbon aromatic ring: no perfect matching -> rejected.
    # (Anti-aromatic but matchable rings like c1ccc1 are accepted — a known
    # permissiveness difference vs RDKit's Hückel-based perception.)
    assert not is_valid_smiles("c1cccc1")


def test_roundtrip_writer_parser():
    for smi in (ASPIRIN, CAFFEINE, IBUPROFEN, "c1ccncc1", "CC(N)C(=O)O"):
        mol = parse_smiles(smi)
        out = write_smiles(mol)
        mol2 = parse_smiles(out)
        assert mol2.num_atoms == mol.num_atoms
        assert sorted(mol2.atomic_num.tolist()) == sorted(mol.atomic_num.tolist())
        assert len(mol2.bonds) == len(mol.bonds)
        assert mol2.aromatic.sum() == mol.aromatic.sum()


def test_properties_on_parsed_molecules():
    """Topology-only properties work on parsed (coordinate-free) molecules."""
    from singa_tpu.chem.properties import logp, qed, sa_score, tpsa

    mol = parse_smiles(ASPIRIN)
    assert 0.0 < qed(mol) <= 1.0
    assert 1.0 <= sa_score(mol) <= 10.0
    assert -5.0 < logp(mol) < 10.0
    assert 0.0 < tpsa(mol) < 200.0
