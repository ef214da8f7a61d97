"""Regression: own-chemistry vs reference RDKit labels on the bundled graphs.

Pins the property deltas and the binarized conditioning-label flip rate
measured by tools/property_fidelity.py on the three reference-labelled
graphs (VERDICT r4 #7). If chem/properties.py changes move these, the table
in DESIGN.md must be regenerated."""
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from property_fidelity import REF_GRAPHS, flip_count, score_ref_graphs  # noqa: E402

ROOT = os.path.join(os.path.dirname(__file__), "..", "data", "ref_graphs_large", "train")


@pytest.fixture(scope="module")
def rows():
    r = score_ref_graphs(ROOT)
    if len(r) < len(REF_GRAPHS):
        pytest.skip("bundled reference graphs not present")
    return r


def test_exact_properties_match(rows):
    """TPSA and MW are table-driven and must match RDKit essentially exactly."""
    for name, _, ref, own in rows:
        assert abs(own["tpsa"] - ref["tpsa"]) < 0.05, name
        assert abs(own["weight"] - ref["weight"]) < 0.05, name


def test_logp_within_one_log_unit(rows):
    for name, _, ref, own in rows:
        assert abs(own["logp"] - ref["logp"]) < 1.0, name


def test_qed_sas_delta_bounds(rows):
    """QED within 0.25 absolute; SA systematically high but < 1.0."""
    for name, _, ref, own in rows:
        assert abs(own["qed"] - ref["qed"]) < 0.25, name
        assert -0.2 < own["sas"] - ref["sas"] < 1.0, name


def test_label_flip_rate_pinned(rows):
    """Measured 2026-08-20: exactly one of six qed/sas conditioning labels
    flips (5cp5_4nue qed 0.439->0.658 across the 0.6 threshold)."""
    flips, total = flip_count(rows)
    assert total == 6
    assert flips == 1
