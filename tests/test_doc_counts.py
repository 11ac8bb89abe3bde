"""Doc-count drift guard (round-7 verdict hygiene item: COVERAGE.md
said 248 while the registry held 252).  The COVERAGE.md status header
must state the LIVE registry count, so late-landing queries can't
silently desynchronize the docs the judge cross-checks."""

from __future__ import annotations

import pathlib
import re

from sumologic_aws_lambda_spark import queries as registry

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_coverage_header_matches_live_registry():
    live = len(registry.all_queries())
    text = (REPO / "COVERAGE.md").read_text()
    m = re.search(r"Status \(round \d+\): (\d+) registry queries", text)
    assert m, "COVERAGE.md status header missing"
    assert int(m.group(1)) == live, (
        f"COVERAGE.md says {m.group(1)} registry queries; live registry "
        f"has {live} — update the header")


def test_every_query_has_oracle_or_is_documented():
    qs = registry.all_queries()
    oracles = registry.all_oracles()
    missing = sorted(set(qs) - set(oracles))
    # Non-SQL-expressible ops may omit the oracle (driver records a
    # rows-only check) — keep that list EXPLICIT so additions are
    # deliberate.
    allowed_no_oracle: set[str] = set()
    assert set(missing) <= allowed_no_oracle, (
        f"queries without oracles not on the documented list: {missing}")


def test_priority_window_is_exactly_50():
    # The external driver samples only the first 50 _PRIORITY entries;
    # a 51-entry window silently drops the tail (round-6 sed-miss).
    from sumologic_aws_lambda_spark.queries import _PRIORITY

    assert len(_PRIORITY) == 50, len(_PRIORITY)
    qs = registry.all_queries()
    unknown = [n for n in _PRIORITY if n not in qs]
    assert not unknown, f"_PRIORITY names not in registry: {unknown}"
    assert len(set(_PRIORITY)) == 50, "duplicate names in _PRIORITY"


def _latest_sample_rounds() -> dict[str, int]:
    import json

    latest: dict[str, int] = {}
    for p in sorted(REPO.glob("CORRECTNESS_r*.json")):
        r = int(re.search(r"r(\d+)", p.name).group(1))
        for q in json.load(open(p)):
            latest[q] = max(r, latest.get(q, 0))
    assert latest, "no CORRECTNESS artifacts found"
    return latest


def test_priority_window_follows_rotation_protocol():
    """Round-14 (r13 verdict items 2-3: the hand-kept rotation note
    drifted twice in one round — '40' for a true 39).  Recompute
    freshness from the CORRECTNESS_r*.json artifacts and pin the
    protocol the window must satisfy:
    (a) every registered query the driver has NEVER sampled is in the
    window (new additions earn their first green immediately);
    (b) every query in the changed-file re-verification map
    (_REVERIFY) is in the window (operator changes re-earn green at
    the next head — r14 verdict item 3);
    (c) the remaining slots backfill stale-first: no query OUTSIDE the
    window may be strictly staler than a non-reverify window member
    (nothing old is skipped in favor of something younger)."""
    from sumologic_aws_lambda_spark.queries import (
        _PRIORITY,
        _REVERIFY,
        _REVERIFY_CARRYOVER,
    )

    latest = _latest_sample_rounds()
    window = set(_PRIORITY)
    qs = set(registry.all_queries())

    never_sampled = sorted(qs - set(latest))
    missing_new = [q for q in never_sampled if q not in window]
    assert not missing_new, (
        f"never-sampled queries must head the window: {missing_new}")

    reverify = ({q for names in _REVERIFY.values() for q in names}
                | set(_REVERIFY_CARRYOVER))
    missing_changed = sorted(reverify - window)
    assert not missing_changed, (
        f"changed-file re-verification queries missing from the "
        f"window: {missing_changed}")

    backfill = {q for q in window
                if q in latest and q not in reverify}
    outside = {q for q in qs if q not in window and q in latest}
    if backfill and outside:
        worst_in = max(latest[q] for q in backfill)
        best_out = min(latest[q] for q in outside)
        assert worst_in <= best_out, (
            f"window backfill skipped a staler query: a non-reverify "
            f"window member was last sampled r{worst_in} while "
            f"{sorted(q for q in outside if latest[q] < worst_in)} "
            f"wait outside at r{best_out}")


def test_round_changed_files_are_reverified():
    """r14 verdict item 8: derive this round's changed files from git
    (diff vs the round-start commit — the last commit touching
    VERDICT.md, which the external driver writes when it closes a
    round) and fail if any changed package source file is neither
    mapped to re-verification queries in _REVERIFY nor explicitly
    exempted — forgetting to rotate a changed operator into the window
    becomes a failing test instead of a review convention."""
    import subprocess

    import pytest

    from sumologic_aws_lambda_spark.queries import (
        _PRIORITY,
        _REVERIFY,
        _REVERIFY_EXEMPT,
    )

    try:
        start = subprocess.run(
            ["git", "rev-list", "-1", "HEAD", "--", "VERDICT.md"],
            cwd=REPO, capture_output=True, text=True, timeout=30,
        )
        if start.returncode != 0 or not start.stdout.strip():
            pytest.skip("no git round-start ref available")
        diff = subprocess.run(
            ["git", "diff", "--name-only", start.stdout.strip()],
            cwd=REPO, capture_output=True, text=True, timeout=30,
        )
        if diff.returncode != 0:
            pytest.skip("git diff unavailable")
    except (OSError, subprocess.TimeoutExpired):
        pytest.skip("git unavailable")

    changed = [f for f in diff.stdout.splitlines()
               if f.startswith("sumologic_aws_lambda_spark/")
               and f.endswith(".py")]
    unmapped = [f for f in changed
                if f not in _REVERIFY and f not in _REVERIFY_EXEMPT]
    assert not unmapped, (
        f"files changed this round with neither a _REVERIFY mapping "
        f"nor a _REVERIFY_EXEMPT justification: {unmapped}")
    window = set(_PRIORITY)
    for f in changed:
        names = _REVERIFY.get(f, ())
        missing = [q for q in names if q not in window]
        assert not missing, (
            f"{f}: _REVERIFY queries not in the window: {missing}")
