"""Physical-plan invariants over EVERY driver entry (plan only, no
terminal jobs): zero row-at-a-time Python UDFs, no unwhitelisted
cartesian products. The whitelist documents each allowed nested-loop
join's bounded side (tools/plan_audit.py)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)
def test_all_entry_plans_clean(spark):
    from plan_audit import audit

    rows, hard = audit(SF_DIR)
    assert len(rows) >= 140
    bad = [r for r in rows if "violation" in r or "error" in r]
    assert hard == 0, bad
    assert all(r["batch_eval_python"] == 0 for r in rows)
