"""Dataset ETL: (protein.pdb, ligand.sdf) complexes -> fixed-shape .npz shards.

Re-design of /root/reference/MakeGraph.py: pocket extraction, featurization,
interaction edges, property labels (QED/logP/TPSA/SA/weight via
singa_tpu.chem.properties; Vina affinity via the native scorer when built,
else 0), SMILES tokens, Laplacian PEs — all precomputed offline.

Input layouts supported:
  * --index FILE: lines "protein.pdb ligand.sdf [split]"
  * --scan DIR: pairs "<name>_protein.pdb" / "<name>_ligand.sdf"

Run: python tools/make_dataset.py --scan data/raw --outdir data/processed
"""
from __future__ import annotations

import argparse
import os
import sys
import traceback

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from singa_tpu.chem.interactions import ProteinContext  # noqa: E402
from singa_tpu.chem.pdb import PDBProtein  # noqa: E402
from singa_tpu.chem.properties import all_properties  # noqa: E402
from singa_tpu.chem.sdf import parse_sdf  # noqa: E402
from singa_tpu.chem.smiles_writer import write_smiles  # noqa: E402
from singa_tpu.config import Config, load_config  # noqa: E402
from singa_tpu.data.complex_builder import BucketOverflow, build_complex  # noqa: E402
from singa_tpu.data.dataset import save_complex  # noqa: E402


def vina_score(pocket, ligand) -> float:
    """Affinity label via the native scorer (singa_tpu/cpp); 0.0 if unbuilt."""
    try:
        from singa_tpu.cpp.vina import score_complex

        return float(score_complex(pocket, ligand))
    except Exception:
        return 0.0


def process_one(protein_pdb: str, ligand_sdf: str, out_path: str, cfg: Config, pocket_radius: float = 10.0) -> str | None:
    prot = PDBProtein(protein_pdb)
    ligand = parse_sdf(ligand_sdf)
    residues = prot.query_residues_ligand(ligand.pos, pocket_radius)
    idx = np.array([i for r in residues for i in r.atom_indices], np.int64)
    if len(idx) == 0:
        return "empty pocket"
    pocket = prot.to_molecule(idx)
    ctx = ProteinContext(
        res_name=np.array([prot.atoms[i].res_name for i in idx]),
        atom_name=np.array([prot.atoms[i].name for i in idx]),
        res_id=np.array(
            [hash((prot.atoms[i].chain, prot.atoms[i].res_seq)) % (1 << 31) for i in idx]
        ),
    )
    props = all_properties(ligand)
    props["vina"] = vina_score(pocket, ligand)
    smiles = write_smiles(ligand)
    sample = build_complex(
        pocket,
        ligand,
        ctx,
        cfg.shapes,
        cfg.model.decoder.tgt_len,
        smiles=smiles,
        props=props,
    )
    save_complex(out_path, sample)
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", type=str, default=None)
    ap.add_argument("--scan", type=str, default=None)
    ap.add_argument("--outdir", type=str, required=True)
    ap.add_argument("--config", type=str, default=None)
    ap.add_argument("--split", type=str, default="train")
    ap.add_argument("--pocket-radius", type=float, default=10.0)
    ap.add_argument(
        "--bucket", choices=["default", "large"], default="default",
        help="'large' = (576 protein nodes, 1280 pp edges): with the "
        "reference's 10 A pocket radius, half the bundled real complexes "
        "overflow the default 384-node bucket (counts 234/320/465/555)",
    )
    args = ap.parse_args()

    cfg = load_config(args.config) if args.config else Config()
    if args.bucket == "large":
        import dataclasses

        cfg = dataclasses.replace(
            cfg,
            shapes=dataclasses.replace(
                cfg.shapes, num_protein_nodes=576, num_pp_edges=1280
            ),
        )

    pairs: list[tuple[str, str, str]] = []
    if args.index:
        with open(args.index) as f:
            for line in f:
                parts = line.split()
                if not parts or parts[0].startswith("#"):
                    continue
                split = parts[2] if len(parts) > 2 else args.split
                pairs.append((parts[0], parts[1], split))
    elif args.scan:
        for f in sorted(os.listdir(args.scan)):
            if f.endswith("_protein.pdb"):
                name = f[: -len("_protein.pdb")]
                lig = os.path.join(args.scan, name + "_ligand.sdf")
                if os.path.exists(lig):
                    pairs.append((os.path.join(args.scan, f), lig, args.split))
    else:
        ap.error("need --index or --scan")

    skipped = []
    for p_pdb, l_sdf, split in pairs:
        # name by the LIGAND file: index files may pair many ligands with one
        # protein (tools/gen_corpus_complexes.py); for --scan pairs the ligand
        # prefix equals the protein prefix, so this is backward compatible
        name = os.path.basename(l_sdf).replace("_ligand.sdf", "").replace(".sdf", "")
        outdir = os.path.join(args.outdir, split)
        os.makedirs(outdir, exist_ok=True)
        out = os.path.join(outdir, name + ".npz")
        try:
            err = process_one(p_pdb, l_sdf, out, cfg, args.pocket_radius)
            if err:
                skipped.append((name, err))
            else:
                print(f"ok {name}")
        except BucketOverflow as e:
            skipped.append((name, f"bucket overflow: {e}"))
        except Exception as e:
            skipped.append((name, f"{type(e).__name__}: {e}"))
            traceback.print_exc()
    print(f"done: {len(pairs) - len(skipped)} ok, {len(skipped)} skipped")
    for name, why in skipped:
        print(f"  skipped {name}: {why}")


if __name__ == "__main__":
    main()
