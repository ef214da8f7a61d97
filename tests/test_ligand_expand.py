"""Tests: substituent enumeration + ligand-disjoint split (round-5 corpus)."""
import numpy as np

from singa_tpu.chem.ligand_expand import (
    SUBSTITUENTS,
    attach,
    attachment_sites,
    derive_variant,
    expand_corpus,
    ligand_disjoint_split,
)
from singa_tpu.chem.smiles_parser import parse_smiles
from singa_tpu.chem.tokenizer import encode


def test_attach_adds_substituent():
    mol = parse_smiles("c1ccccc1")  # benzene
    sites = attachment_sites(mol)
    assert len(sites) == 6
    out = attach(mol, sites[0], 1)  # fluoro
    assert out.num_atoms == 7
    assert int(out.atomic_num[-1]) == 9


def test_derive_variant_valid():
    var = derive_variant("CC(=O)Oc1ccccc1C(=O)O", 0, 0)  # aspirin + methyl
    assert var is not None
    parse_smiles(var)  # round-trips


def test_expand_corpus_unique_and_encodable():
    lig = expand_corpus(220, seed=3)
    smis = [s for _, s, _ in lig]
    assert len(lig) >= 220
    assert len(set(smis)) == len(smis)  # all unique
    for _, s, _ in lig[150:170]:  # spot-check variants tokenize
        encode(s, 200)


def test_expand_deterministic():
    a = expand_corpus(180, seed=5)
    b = expand_corpus(180, seed=5)
    assert a == b


def test_ligand_disjoint_split_holds_out_families():
    lig = expand_corpus(250, seed=0)
    split = ligand_disjoint_split(lig, val_frac=0.12, seed=0)
    # every variant follows its base drug's split: val ligands' SMILES never
    # appear under train and vice versa
    train_smis = {s for _, s, b in lig if split[b] == "train"}
    val_smis = {s for _, s, b in lig if split[b] == "val"}
    assert val_smis and train_smis
    assert not (train_smis & val_smis)
    # and val bases are a nonempty strict subset
    n_val = sum(1 for v in split.values() if v == "val")
    assert 0 < n_val < len(split)


def test_validity_stats_conditioning_keys():
    from singa_tpu.chem.tokenizer import encode as enc
    from singa_tpu.train.rewards import validity_stats

    rows = [enc("CC(=O)Oc1ccccc1C(=O)O", 32)[1], enc("CCO", 32)[1]]
    stats = validity_stats(np.stack(rows))
    for k in ("pct_qed_good", "pct_sas_good", "pct_cond"):
        assert k in stats
        assert 0.0 <= stats[k] <= 100.0
    # pct_cond can never exceed either marginal
    assert stats["pct_cond"] <= stats["pct_qed_good"] + 1e-9
    assert stats["pct_cond"] <= stats["pct_sas_good"] + 1e-9
