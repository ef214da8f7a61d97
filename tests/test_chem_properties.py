import numpy as np
import pytest

from singa_tpu.chem.mol import Molecule
from singa_tpu.chem.properties import (
    all_properties,
    aromatic_ring_count,
    hba,
    hbd,
    logp,
    qed,
    rotatable_bonds,
    sa_score,
    tpsa,
)
from singa_tpu.chem.sasa import shrake_rupley, total_sasa, classify_atoms
from singa_tpu.chem.sdf import parse_sdf
from singa_tpu.chem.smiles_writer import write_smiles
from singa_tpu.chem.tokenizer import encode, split_smiles

REF_LIGAND = "/root/reference/example/7cff_ligand.sdf"


def _hexane():
    pos = np.stack([np.arange(6) * 1.5, np.zeros(6), np.zeros(6)], -1)
    return Molecule(
        atomic_num=[6] * 6, pos=pos,
        bonds=[[i, i + 1] for i in range(5)],
        bond_order=[1] * 5, bond_aromatic=[False] * 5,
    )


def _glycerol():
    # C3H8O3-ish: C-C-C with three OH
    return Molecule(
        atomic_num=[6, 6, 6, 8, 8, 8],
        pos=np.random.default_rng(0).normal(size=(6, 3)) * 1.5,
        bonds=[[0, 1], [1, 2], [0, 3], [1, 4], [2, 5]],
        bond_order=[1] * 5, bond_aromatic=[False] * 5,
    )


def test_logp_hydrophobic_positive_polar_negative():
    assert logp(_hexane()) > 1.0
    assert logp(_glycerol()) < 0.0


def test_logp_rdkit_pins():
    """Exact RDKit Crippen.MolLogP literature values (the numbers the
    chem/crippen.py docstring promises) — the reference computes its logP
    label through RDKit (utils/PLParser.py:381)."""
    from singa_tpu.chem.smiles_parser import parse_smiles

    pins = {
        "CCO": -0.0014,  # ethanol
        "c1ccccc1": 1.6866,  # benzene
        "CC(=O)Oc1ccccc1C(=O)O": 1.3101,  # aspirin
        "Cn1cnc2c1c(=O)n(C)c(=O)n2C": -1.0293,  # caffeine
        "CC(C)Cc1ccc(cc1)C(C)C(=O)O": 3.0732,  # ibuprofen
        "CC(=O)Nc1ccc(O)cc1": 1.3506,  # paracetamol
        "CCCCCC": 2.5866,  # hexane
        "Oc1ccccc1": 1.3922,  # phenol
    }
    for smi, want in pins.items():
        assert abs(logp(parse_smiles(smi)) - want) < 5e-4, smi


def test_tpsa_counts_polar_atoms():
    assert tpsa(_hexane()) == 0.0
    # 3 hydroxyls ~ 3 * 20.23
    np.testing.assert_allclose(tpsa(_glycerol()), 3 * 20.23, rtol=0.01)


def test_tpsa_rdkit_pins():
    """Full Ertl table: exact RDKit CalcTPSA values on known molecules.

    Nitrobenzene pins RDKit's charge-separated nitro perception (43.14), not
    the PubChem/Cactvs pentavalent-N value (45.82) — the reference stack is
    RDKit (utils/PLParser.py:385)."""
    from singa_tpu.chem.smiles_parser import parse_smiles

    pins = {
        "CCO": 20.23,
        "c1ccccc1": 0.0,
        "CC(=O)Oc1ccccc1C(=O)O": 63.60,  # aspirin
        "Cn1cnc2c1c(=O)n(C)c(=O)n2C": 61.82,  # caffeine
        "CC(=O)Nc1ccc(O)cc1": 49.33,  # paracetamol
        "CC(C)Cc1ccc(cc1)C(C)C(=O)O": 37.30,  # ibuprofen
        "CN1CCCC1c1cccnc1": 16.13,  # nicotine
        "NCC(=O)O": 63.32,  # glycine
        "c1ccc2[nH]ccc2c1": 15.79,  # indole
        "O=[N+]([O-])c1ccccc1": 43.14,  # nitrobenzene (RDKit form)
        "N#Cc1ccccc1": 23.79,  # benzonitrile
        "NS(=O)(=O)c1ccccc1": 60.16,  # benzenesulfonamide
    }
    for smi, want in pins.items():
        assert abs(tpsa(parse_smiles(smi)) - want) < 0.02, smi


def test_hba_hbd():
    g = _glycerol()
    assert hba(g) == 3
    assert hbd(g) == 3
    assert hbd(_hexane()) == 0


def test_rotatable_bonds():
    assert rotatable_bonds(_hexane()) == 3  # internal C-C bonds only
    from tests.test_chem import _benzene

    assert rotatable_bonds(_benzene()) == 0


def test_qed_in_range_and_ordering():
    q_hex = qed(_hexane())
    lig = parse_sdf(REF_LIGAND)
    q_lig = qed(lig)
    assert 0.0 < q_hex < 1.0
    assert 0.0 < q_lig < 1.0
    # drug-like ligand should beat plain hexane
    assert q_lig > q_hex


def test_sa_score_scale():
    assert 1.0 <= sa_score(_hexane()) <= 4.0
    lig = parse_sdf(REF_LIGAND)
    s = sa_score(lig)
    assert 1.0 <= s <= 10.0


def test_all_properties_keys():
    props = all_properties(parse_sdf(REF_LIGAND))
    assert set(props) == {"sas", "logp", "qed", "weight", "tpsa"}
    assert 250 < props["weight"] < 450


def test_sasa_isolated_atom():
    # single carbon: full sphere of radius 1.7 + 1.4
    area = shrake_rupley(np.zeros((1, 3)), np.array([1.7]))
    np.testing.assert_allclose(area[0], 4 * np.pi * 3.1**2, rtol=0.02)


def test_sasa_burial():
    # a row of atoms: middle atom has less exposed area than ends
    pos = np.array([[0.0, 0, 0], [1.6, 0, 0], [3.2, 0, 0]])
    area = shrake_rupley(pos, np.full(3, 1.7))
    assert area[1] < area[0]
    assert area[1] < area[2]
    polar, radii = classify_atoms(np.array([6, 7, 8]))
    assert list(polar) == [False, True, True]


def test_smiles_writer_roundtrip_tokens():
    lig = parse_sdf(REF_LIGAND)
    smi = write_smiles(lig)
    toks = split_smiles(smi)
    assert "".join(toks) == smi
    inp, tgt = encode(smi, 200)
    assert inp.shape == (200,)


def test_smiles_writer_rings():
    from tests.test_chem import _benzene

    smi = write_smiles(_benzene())
    assert smi.count("1") == 2  # one ring closure pair
    assert smi.count("c") == 6  # all six aromatic carbons
    assert "=" not in smi  # aromatic ring, no explicit double bonds


def test_sa_score_fragment_db_ordering():
    """The Morgan-fragment DB (tools/gen_sa_db.py) separates common drug
    chemistry from exotic structures, and keeps simple drugs under the <4.0
    conditioning threshold (reference model/GAN.py:40)."""
    from singa_tpu.chem.morgan import _load_db, fragment_score
    from singa_tpu.chem.smiles_parser import parse_smiles

    assert len(_load_db()) > 500  # shipped table present
    aspirin = parse_smiles("CC(=O)Oc1ccccc1C(=O)O")
    weird = parse_smiles("FC(F)(F)C1(N=NC2(CC2)C1(Br)Br)C#CC#CC1CC1")
    assert fragment_score(aspirin) > fragment_score(weird)
    assert sa_score(aspirin) < 4.0 < sa_score(weird)
    # bridged polycyclics read as harder than their fused analogues
    morphinan = parse_smiles("CN1CCC23c4c5ccc(O)c4OC2C(O)C=CC3C1C5")
    naphthalene = parse_smiles("c1ccc2ccccc2c1")
    assert sa_score(morphinan) > sa_score(naphthalene) + 1.0
