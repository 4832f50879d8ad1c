"""Full-registry oracle gate (ADVICE r4, medium).

The external driver's CORRECTNESS window covers only the first 50 of
the 56 registry queries; the 6 past the cap rotate per round (see the
ORDER MATTERS block in __spark_entry__.py).  This gate runs EVERY
queries()/oracle_sql() pair against DuckDB locally — the same
sorted-columns value comparison the driver records — so a regression in
a currently-rotated-out query fails the suite instead of waiting a
round to resurface in the driver window.

Runs at sf0.001 to keep the gate cheap (~2-4 min): equality against
the oracle is scale-independent — both sides read the same parquet.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "BENCH"))

SF_DIR = os.environ.get("SPARK_GRAFT_SWEEP_SF", "/root/testdata/sf0.001")

#: ADVICE r5 (medium): this gate is the ONLY verification for the
#: queries currently rotated out of the driver's first-50 CORRECTNESS
#: window, so a silent skip on a machine without the testdata would
#: let the suite report green with those queries unverified.  Missing
#: testdata is therefore a FAILURE unless the runner explicitly
#: acknowledges it (SPARK_GRAFT_SWEEP_OPTIONAL=1).
_OPTIONAL = os.environ.get("SPARK_GRAFT_SWEEP_OPTIONAL") == "1"


@pytest.mark.skipif(
    _OPTIONAL and not os.path.isdir(SF_DIR),
    reason="driver testdata not present (explicitly waived via "
    "SPARK_GRAFT_SWEEP_OPTIONAL=1)",
)
def test_every_registry_query_matches_its_oracle(spark):
    assert os.path.isdir(SF_DIR), (
        f"oracle-sweep testdata missing at {SF_DIR}: this gate is the only "
        "verification for rotated-out registry queries — point "
        "SPARK_GRAFT_SWEEP_SF at a generated sf dir, or set "
        "SPARK_GRAFT_SWEEP_OPTIONAL=1 to explicitly waive the gate"
    )
    from oracle_sweep import sweep

    fails, total = sweep(spark, SF_DIR)
    assert total >= 50
    assert not fails, f"oracle sweep failures at {SF_DIR}: {fails}"
