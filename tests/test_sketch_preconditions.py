"""Sizing preconditions that keep sketch-backed EXACT oracles sound.

heavy_hitters_twopass's driver oracle computes EXACT counts, which is
only guaranteed to match the approx_top_k candidate pass while the
sketch is in its exact regime: maxItemsTracked (HH_SKETCH_WIDTH) must
dominate the distinct-key count so nothing is ever purged.  The
fixture's user universe is near-uniform (no frequency gap), so the
other containment bound never applies — this test turns the assumed
precondition into a checked one (round-9 advisor fix): a fixture
regeneration that crosses the width fails HERE with a readable
message instead of as a silent value-hash mismatch in the driver.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from sumologic_aws_lambda_spark.queries.sketches import HH_SKETCH_WIDTH

# The driver runs the oracle gate at sf0.01; check every SF present so
# a bench run at sf0.1 is covered by the same invariant.  The root is
# env-overridable and a missing root yields an (explicitly skipped)
# empty parameter set instead of a collection-time FileNotFoundError
# (round-9 review finding: a checkout without fixtures crashed the
# WHOLE pytest session here).
_SF_ROOT = os.path.dirname(os.path.normpath(os.path.abspath(
    os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))))
_SFS = ([d for d in sorted(os.listdir(_SF_ROOT))
         if os.path.exists(os.path.join(_SF_ROOT, d, "events.parquet"))]
        if os.path.isdir(_SF_ROOT) else [])


@pytest.mark.skipif(not _SFS, reason=f"no fixture SFs under {_SF_ROOT}")
@pytest.mark.parametrize("sf", _SFS or ["<none>"])
def test_heavy_hitter_width_dominates_distinct_users(sf):
    path = os.path.join(_SF_ROOT, sf, "events.parquet")
    [(n_distinct,)] = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM '{path}'").fetchall()
    assert n_distinct <= HH_SKETCH_WIDTH, (
        f"{sf}: {n_distinct} distinct users exceed HH_SKETCH_WIDTH="
        f"{HH_SKETCH_WIDTH}; heavy_hitters_twopass's approx_top_k pass "
        f"leaves its exact regime and the EXACT DuckDB oracle is no "
        f"longer guaranteed to match — raise the width or switch the "
        f"oracle to candidate-set semantics.")
