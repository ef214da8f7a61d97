"""Re-dock a ligand into its pocket with the native search engine.

Counterpart of the reference's vendored-binary docking step
(/root/reference/MakeGraph.py:103-111), fully in-process:

    python tools/dock_ligand.py PROTEIN.pdb LIGAND.sdf \
        [--exhaustiveness 8] [--steps N] [--seed 0] [--poses 9] \
        [--radius 10] [--out poses.sdf]

Prints a Vina-style result table (mode, affinity, RMSD from input pose) and
optionally writes the docked poses as a multi-molecule SDF.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sdf_block(mol, pos, name: str) -> str:
    lines = [name, "  singa_tpu dock", ""]
    n, m = mol.num_atoms, len(mol.bonds)
    lines.append(f"{n:3d}{m:3d}  0  0  0  0  0  0  0  0999 V2000")
    from singa_tpu.chem.periodic import SYMBOLS  # index = atomic number

    for i in range(n):
        x, y, z = (float(v) for v in pos[i])
        zi = int(mol.atomic_num[i])
        sym = SYMBOLS[zi] if 0 < zi < len(SYMBOLS) else "X"
        lines.append(f"{x:10.4f}{y:10.4f}{z:10.4f} {sym:<3} 0  0  0  0  0  0  0  0  0  0  0  0")
    for (i, j), o in zip(mol.bonds, mol.bond_order):
        lines.append(f"{int(i)+1:3d}{int(j)+1:3d}{int(o):3d}  0  0  0  0")
    lines += ["M  END", "$$$$"]
    return "\n".join(lines) + "\n"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("protein")
    ap.add_argument("ligand")
    ap.add_argument("--exhaustiveness", type=int, default=8)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--poses", type=int, default=9)
    ap.add_argument("--radius", type=float, default=10.0)
    ap.add_argument("--box", type=float, default=22.0)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args(argv)

    from singa_tpu.chem.pdb import PDBProtein
    from singa_tpu.chem.sdf import parse_sdf
    from singa_tpu.cpp.vina import score_complex
    from singa_tpu.dock import dock, torsion_tree

    lig = parse_sdf(args.ligand)
    pocket, _ = PDBProtein(args.protein).pocket(lig.pos, radius=args.radius)
    tree = torsion_tree(lig)
    print(
        f"ligand: {lig.num_atoms} atoms, {len(tree.axes)} torsions; "
        f"pocket: {pocket.num_atoms} atoms (r={args.radius} A)",
        file=sys.stderr,
    )
    print(f"input-pose affinity: {score_complex(pocket, lig):8.3f}", file=sys.stderr)

    t0 = time.time()
    poses = dock(
        pocket, lig,
        box_size=args.box, exhaustiveness=args.exhaustiveness,
        n_steps=args.steps, seed=args.seed, max_poses=args.poses,
    )
    dt = time.time() - t0
    print(f"search: {dt:.1f}s ({args.exhaustiveness} runs)", file=sys.stderr)

    print("mode |  affinity  | rmsd from input")
    print("-----+------------+----------------")
    ref = np.asarray(lig.pos, np.float64)
    for i, p in enumerate(poses, 1):
        rmsd = float(np.sqrt(np.mean(np.sum((p.pos - ref) ** 2, axis=-1))))
        print(f"{i:4d} | {p.score:10.3f} | {rmsd:10.2f}")

    if args.out:
        with open(args.out, "w") as f:
            for i, p in enumerate(poses, 1):
                f.write(_sdf_block(lig, p.pos, f"pose_{i}_score_{p.score:.3f}"))
        print(f"wrote {len(poses)} poses to {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
