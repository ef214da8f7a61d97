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

from singa_tpu.chem.drug_corpus import CORPUS  # noqa: E402


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
