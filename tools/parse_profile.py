"""Parse a jax.profiler trace into a per-HLO self-time table.

Usage: python tools/parse_profile.py PROFILE_DIR [top_n]

Feeds the xplane.pb from `bench.py --profile DIR` through xprof's
hlo_stats converter (gviz JSON) and prints the top self-time rows with
their framework-op attribution — the table behind DESIGN.md's perf-log
subsystem splits.
"""
from __future__ import annotations

import glob
import json
import sys


def main():
    d = sys.argv[1]
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    xplanes = sorted(glob.glob(f"{d}/**/*.xplane.pb", recursive=True))
    if not xplanes:
        sys.exit(f"no xplane.pb under {d}")
    from xprof.convert import raw_to_tool_data as r2t

    data, _ = r2t.xspace_to_tool_data([xplanes[-1]], "hlo_stats", {})
    tbl = json.loads(data.decode() if isinstance(data, bytes) else data)
    cols = [c["id"] for c in tbl["cols"]]
    i_self = cols.index("total_self_time")
    i_cat = cols.index("category")
    i_fw = cols.index("tf_op_name")
    i_name = cols.index("hlo_op_name")
    i_occ = cols.index("occurrences")
    out = []
    for row in tbl["rows"]:
        v = [c.get("v") for c in row["c"]]
        out.append((float(v[i_self]), str(v[i_cat]), str(v[i_fw]), str(v[i_name]), int(v[i_occ])))
    out.sort(reverse=True)
    total = sum(t for t, *_ in out)
    print(f"total accounted: {total/1e3:.1f} ms  ({len(out)} ops)")
    print(f"{'us':>10} {'%':>5} {'n':>4}  category | framework op | hlo")
    for t, cat, fw, name, occ in out[:top]:
        print(f"{t:10.0f} {100*t/total:5.1f} {occ:4d}  {cat:22s}| {fw[:66]:66s}| {name[:40]}")
    agg = {}
    for t, cat, fw, name, occ in out:
        agg[cat] = agg.get(cat, 0.0) + t
    print("\nby category:")
    for cat, t in sorted(agg.items(), key=lambda kv: -kv[1]):
        print(f"{t/1e3:10.2f} ms  {100*t/total:5.1f}%  {cat}")


if __name__ == "__main__":
    main()
