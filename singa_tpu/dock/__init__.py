"""Native docking: flexible-ligand pose search against a rigid pocket.

The reference's pose path shells out to the vendored AutoDock Vina binary
(/root/reference/MakeGraph.py:103-111); here both the scoring function
(cpp/src/vina_score.cc) and the search (cpp/src/vina_dock.cc — MC basin
hopping + pattern-search local opt, threaded over exhaustiveness) are native
in-process C++ behind ctypes.
"""
from singa_tpu.dock.engine import DockResult, conf_energy, dock
from singa_tpu.dock.tree import interacting_pairs, torsion_tree

__all__ = ["DockResult", "conf_energy", "dock", "interacting_pairs", "torsion_tree"]
