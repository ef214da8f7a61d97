"""Generate the SA-score Morgan-fragment frequency database.

The reference ships ``utils/fpscores.pkl.gz`` — RDKit Morgan-hash
frequencies from a large PubChem sample — consumed by utils/SAScorer.py.
RDKit's hash is not reproducible here, so the repo's scorer
(chem/properties.sa_score) uses its own circular-environment hash
(chem/morgan.py) with a frequency table built by this tool from an embedded
corpus of ~100 well-known approved drugs and common biomolecules: exactly the
"buildable from any open compound set" route. Fragments common in real drugs
score near zero (easy); fragments absent from the corpus get the Ertl
rare-fragment default (-4).

Run:  python tools/gen_sa_db.py        (writes singa_tpu/chem/data/sa_fragments.json)
"""
from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (name, SMILES) — approved drugs, natural products, amino acids, nucleobases,
# common ring systems. Stereocentres mostly omitted: the environment hash is
# stereo-blind, matching the reference scorer's fragment term.
CORPUS = [
    ("aspirin", "CC(=O)Oc1ccccc1C(=O)O"),
    ("paracetamol", "CC(=O)Nc1ccc(O)cc1"),
    ("ibuprofen", "CC(C)Cc1ccc(cc1)C(C)C(=O)O"),
    ("naproxen", "CC(C(=O)O)c1ccc2cc(OC)ccc2c1"),
    ("diclofenac", "OC(=O)Cc1ccccc1Nc1c(Cl)cccc1Cl"),
    ("caffeine", "Cn1cnc2c1c(=O)n(C)c(=O)n2C"),
    ("theophylline", "Cn1c(=O)c2[nH]cnc2n(C)c1=O"),
    ("theobromine", "Cn1cnc2c1c(=O)[nH]c(=O)n2C"),
    ("nicotine", "CN1CCCC1c1cccnc1"),
    ("atenolol", "CC(C)NCC(O)COc1ccc(CC(N)=O)cc1"),
    ("propranolol", "CC(C)NCC(O)COc1cccc2ccccc12"),
    ("metoprolol", "COCCc1ccc(OCC(O)CNC(C)C)cc1"),
    ("salbutamol", "CC(C)(C)NCC(O)c1ccc(O)c(CO)c1"),
    ("ciprofloxacin", "OC(=O)c1cn(C2CC2)c2cc(N3CCNCC3)c(F)cc2c1=O"),
    ("sulfamethoxazole", "Cc1cc(NS(=O)(=O)c2ccc(N)cc2)no1"),
    ("sulfanilamide", "Nc1ccc(S(N)(=O)=O)cc1"),
    ("trimethoprim", "COc1cc(Cc2cnc(N)nc2N)cc(OC)c1OC"),
    ("penicillin-g", "CC1(C)SC2C(NC(=O)Cc3ccccc3)C(=O)N2C1C(=O)O"),
    ("diazepam", "CN1C(=O)CN=C(c2ccccc2)c2cc(Cl)ccc21"),
    ("lidocaine", "CCN(CC)CC(=O)Nc1c(C)cccc1C"),
    ("procaine", "CCN(CC)CCOC(=O)c1ccc(N)cc1"),
    ("benzocaine", "CCOC(=O)c1ccc(N)cc1"),
    ("warfarin", "CC(=O)CC(c1ccccc1)c1c(O)c2ccccc2oc1=O"),
    ("celecoxib", "Cc1ccc(-c2cc(C(F)(F)F)nn2-c2ccc(S(N)(=O)=O)cc2)cc1"),
    ("chlorpromazine", "CN(C)CCCN1c2ccccc2Sc2ccc(Cl)cc21"),
    ("imipramine", "CN(C)CCCN1c2ccccc2CCc2ccccc21"),
    ("fluoxetine", "CNCCC(Oc1ccc(C(F)(F)F)cc1)c1ccccc1"),
    ("sertraline", "CNC1CCC(c2ccc(Cl)c(Cl)c2)c2ccccc21"),
    ("haloperidol", "OC1(c2ccc(Cl)cc2)CCN(CCCC(=O)c2ccc(F)cc2)CC1"),
    ("metformin", "CN(C)C(=N)NC(N)=N"),
    ("omeprazole", "COc1ccc2[nH]c(S(=O)Cc3ncc(C)c(OC)c3C)nc2c1"),
    ("captopril", "CC(CS)C(=O)N1CCCC1C(=O)O"),
    ("losartan", "CCCCc1nc(Cl)c(CO)n1Cc1ccc(-c2ccccc2-c2nnn[nH]2)cc1"),
    ("dopamine", "NCCc1ccc(O)c(O)c1"),
    ("serotonin", "NCCc1c[nH]c2ccc(O)cc12"),
    ("histamine", "NCCc1c[nH]cn1"),
    ("adrenaline", "CNCC(O)c1ccc(O)c(O)c1"),
    ("melatonin", "COc1ccc2[nH]cc(CCNC(C)=O)c2c1"),
    ("amphetamine", "CC(N)Cc1ccccc1"),
    ("methamphetamine", "CNC(C)Cc1ccccc1"),
    ("mescaline", "COc1cc(CCN)cc(OC)c1OC"),
    ("chloroquine", "CCN(CC)CCCC(C)Nc1ccnc2cc(Cl)ccc12"),
    ("acyclovir", "Nc1nc2n(COCCO)cnc2c(=O)[nH]1"),
    ("levodopa", "NC(Cc1ccc(O)c(O)c1)C(=O)O"),
    ("gabapentin", "NCC1(CC(=O)O)CCCCC1"),
    ("pregabalin", "CC(C)CC(CN)CC(=O)O"),
    ("valproic-acid", "CCCC(CCC)C(=O)O"),
    ("isoniazid", "NNC(=O)c1ccncc1"),
    ("pyrazinamide", "NC(=O)c1cnccn1"),
    ("ethambutol", "CCC(CO)NCCNC(CC)CO"),
    ("dapsone", "Nc1ccc(S(=O)(=O)c2ccc(N)cc2)cc1"),
    ("ketamine", "CNC1(c2ccccc2Cl)CCCCC1=O"),
    ("tramadol", "COc1cccc(C2(O)CCCCC2CN(C)C)c1"),
    ("nifedipine", "COC(=O)C1=C(C)NC(C)=C(C(=O)OC)C1c1ccccc1[N+](=O)[O-]"),
    ("amlodipine", "CCOC(=O)C1=C(COCCN)NC(C)=C(C(=O)OC)C1c1ccccc1Cl"),
    ("hydrochlorothiazide", "NS(=O)(=O)c1cc2c(cc1Cl)NCNS2(=O)=O"),
    ("furosemide", "NS(=O)(=O)c1cc(C(=O)O)c(NCc2ccco2)cc1Cl"),
    ("sildenafil", "CCCc1nn(C)c2c(=O)[nH]c(-c3cc(S(=O)(=O)N4CCN(C)CC4)ccc3OCC)nc12"),
    ("cocaine", "COC(=O)C1C(OC(=O)c2ccccc2)CC2CCC1N2C"),
    ("atropine", "CN1C2CCC1CC(OC(=O)C(CO)c1ccccc1)C2"),
    ("aspartame", "COC(=O)C(Cc1ccccc1)NC(=O)C(N)CC(=O)O"),
    ("saccharin", "O=C1NS(=O)(=O)c2ccccc21"),
    ("vanillin", "COc1cc(C=O)ccc1O"),
    ("eugenol", "C=CCc1ccc(O)c(OC)c1"),
    ("menthol", "CC(C)C1CCC(C)CC1O"),
    ("camphor", "CC1(C)C2CCC1(C)C(=O)C2"),
    ("limonene", "CC(=C)C1CCC(C)=CC1"),
    ("folic-acid", "Nc1nc2ncc(CNc3ccc(C(=O)NC(CCC(=O)O)C(=O)O)cc3)nc2c(=O)[nH]1"),
    ("pyridoxine", "Cc1ncc(CO)c(CO)c1O"),
    ("niacin", "OC(=O)c1cccnc1"),
    ("biotin", "O=C1NC2C(CCCCC(=O)O)SCC2N1"),
    ("chloramphenicol", "O=[N+]([O-])c1ccc(C(O)C(CO)NC(=O)C(Cl)Cl)cc1"),
    ("metronidazole", "Cc1ncc([N+](=O)[O-])n1CCO"),
    ("fluconazole", "OC(Cn1cncn1)(Cn1cncn1)c1ccc(F)cc1F"),
    ("cetirizine", "OC(=O)COCCN1CCN(C(c2ccccc2)c2ccc(Cl)cc2)CC1"),
    ("diphenhydramine", "CN(C)CCOC(c1ccccc1)c1ccccc1"),
    ("clopidogrel", "COC(=O)C(c1ccccc1Cl)N1CCc2sccc2C1"),
    ("testosterone", "CC12CCC3C(CCC4=CC(=O)CCC34C)C1CCC2O"),
    ("estradiol", "CC12CCC3c4ccc(O)cc4CCC3C1CCC2O"),
    ("progesterone", "CC(=O)C1CCC2C1(C)CCC1C2CCC2=CC(=O)CCC12C"),
    ("hydrocortisone", "CC12CCC(=O)C=C1CCC1C2C(O)CC2(C)C1CCC2(O)C(=O)CO"),
    ("ascorbic-acid", "OCC(O)C1OC(=O)C(O)=C1O"),
    ("citric-acid", "OC(=O)CC(O)(CC(=O)O)C(=O)O"),
    ("lactic-acid", "CC(O)C(=O)O"),
    ("urea", "NC(N)=O"),
    ("glycerol", "OCC(O)CO"),
    ("glucose", "OCC1OC(O)C(O)C(O)C1O"),
    # the 20 proteinogenic amino acids
    ("glycine", "NCC(=O)O"),
    ("alanine", "CC(N)C(=O)O"),
    ("valine", "CC(C)C(N)C(=O)O"),
    ("leucine", "CC(C)CC(N)C(=O)O"),
    ("isoleucine", "CCC(C)C(N)C(=O)O"),
    ("proline", "OC(=O)C1CCCN1"),
    ("phenylalanine", "NC(Cc1ccccc1)C(=O)O"),
    ("tyrosine", "NC(Cc1ccc(O)cc1)C(=O)O"),
    ("tryptophan", "NC(Cc1c[nH]c2ccccc12)C(=O)O"),
    ("serine", "NC(CO)C(=O)O"),
    ("threonine", "CC(O)C(N)C(=O)O"),
    ("cysteine", "NC(CS)C(=O)O"),
    ("methionine", "CSCCC(N)C(=O)O"),
    ("asparagine", "NC(=O)CC(N)C(=O)O"),
    ("glutamine", "NC(=O)CCC(N)C(=O)O"),
    ("aspartate", "NC(CC(=O)O)C(=O)O"),
    ("glutamate", "NC(CCC(=O)O)C(=O)O"),
    ("lysine", "NCCCCC(N)C(=O)O"),
    ("arginine", "NC(=N)NCCCC(N)C(=O)O"),
    ("histidine", "NC(Cc1c[nH]cn1)C(=O)O"),
    # nucleobases
    ("adenine", "Nc1ncnc2[nH]cnc12"),
    ("guanine", "Nc1nc2[nH]cnc2c(=O)[nH]1"),
    ("cytosine", "Nc1cc[nH]c(=O)n1"),
    ("thymine", "Cc1c[nH]c(=O)[nH]c1=O"),
    ("uracil", "O=c1cc[nH]c(=O)[nH]1"),
    # common ring systems / simple organics
    ("benzene", "c1ccccc1"),
    ("toluene", "Cc1ccccc1"),
    ("phenol", "Oc1ccccc1"),
    ("aniline", "Nc1ccccc1"),
    ("benzoic-acid", "OC(=O)c1ccccc1"),
    ("benzamide", "NC(=O)c1ccccc1"),
    ("benzaldehyde", "O=Cc1ccccc1"),
    ("anisole", "COc1ccccc1"),
    ("nitrobenzene", "O=[N+]([O-])c1ccccc1"),
    ("benzonitrile", "N#Cc1ccccc1"),
    ("styrene", "C=Cc1ccccc1"),
    ("naphthalene", "c1ccc2ccccc2c1"),
    ("pyridine", "c1ccncc1"),
    ("pyrimidine", "c1cncnc1"),
    ("pyrazine", "c1cnccn1"),
    ("imidazole", "c1c[nH]cn1"),
    ("pyrazole", "c1cc[nH]n1"),
    ("furan", "c1ccoc1"),
    ("thiophene", "c1ccsc1"),
    ("pyrrole", "c1cc[nH]c1"),
    ("oxazole", "c1cnco1"),
    ("thiazole", "c1cncs1"),
    ("indole", "c1ccc2[nH]ccc2c1"),
    ("quinoline", "c1ccc2ncccc2c1"),
    ("isoquinoline", "c1ccc2cnccc2c1"),
    ("purine", "c1ncc2[nH]cnc2n1"),
    ("piperidine", "C1CCNCC1"),
    ("piperazine", "C1CNCCN1"),
    ("morpholine", "C1COCCN1"),
    ("pyrrolidine", "C1CCNC1"),
    ("tetrahydrofuran", "C1CCOC1"),
    ("dioxane", "C1COCCO1"),
    ("cyclohexane", "C1CCCCC1"),
    ("cyclopentane", "C1CCCC1"),
    ("cyclopropane", "C1CC1"),
    ("adamantane", "C1C2CC3CC1CC(C2)C3"),
    ("ethanol", "CCO"),
    ("acetic-acid", "CC(=O)O"),
    ("acetone", "CC(C)=O"),
    ("dimethylamine", "CNC"),
    ("acetamide", "CC(N)=O"),
    ("ethyl-acetate", "CCOC(C)=O"),
]


def main():
    from singa_tpu.chem.morgan import morgan_environments
    from singa_tpu.chem.smiles_parser import parse_smiles

    counts: dict[int, int] = {}
    parsed = failed = 0
    for name, smi in CORPUS:
        try:
            mol = parse_smiles(smi)
        except Exception as e:  # noqa: BLE001
            print(f"SKIP {name}: {e}")
            failed += 1
            continue
        parsed += 1
        for h, c in morgan_environments(mol).items():
            counts[h] = counts.get(h, 0) + c

    # Ertl-style scoring: log10 relative frequency vs a high-percentile
    # reference count, clipped to the published [-4, 0.5] band.
    ref = sorted(counts.values())[int(len(counts) * 0.98)]
    db = {
        str(h): round(max(-4.0, min(0.5, math.log10(c / ref))), 4)
        for h, c in counts.items()
    }
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "..", "singa_tpu", "chem", "data", "sa_fragments.json",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(db, f, separators=(",", ":"))
    print(
        f"parsed {parsed}/{parsed + failed} molecules, "
        f"{len(db)} unique environments, ref count {ref} -> {out}"
    )


if __name__ == "__main__":
    main()
