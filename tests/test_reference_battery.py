"""Parity harness: the reference's own shape-battery statements, basic file.

The full 2,300-statement sweep runs via ``tools/reference_battery.py``
(report: REFERENCE_BATTERY.json); CI pins the basic file at 100% to
catch dialect regressions fast.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

BATTERY = "/root/reference/tests/integration/sql_battery/test_shapes_basic.py"


@pytest.mark.skipif(not os.path.exists(BATTERY), reason="reference not present")
def test_reference_basic_battery_passes():
    from reference_battery import run_battery

    report = run_battery([BATTERY])
    assert report["totals"]["fail"] == 0, report["failures"]
    assert report["totals"]["pass"] >= 55
