"""Plan-shape markers: make adjudicated scale exceptions local to their
call sites.

``bounded_global_window`` wraps the one pattern the shuffle audit flags
by design — a ``Window.orderBy(...)`` with NO ``partitionBy``, which
Spark executes as a single-partition sort ("Moving all data to a single
partition").  That is a scale bug on an unbounded frame and the
registry-wide plan-shape guard fails it
(``tests/test_plan_shapes.py::test_no_unbounded_global_windows_registry_wide``);
it is the RIGHT plan on a frame whose cardinality is bounded by
construction (a post-aggregation timeslice series, a capped vocabulary,
a dimension table).  Before round 13 that adjudication lived only in the
test's allowlist — at the call site, a raw ``Window.orderBy`` looked
identical to an accidental one (round-12 verdict item 6).  Every
sanctioned site now goes through this helper and states its bound; a
new raw global window still fails the plan-shape suite until it is
either partitioned or marked here AND allowlisted with a reason.
"""

from __future__ import annotations

from pyspark.sql import Window, WindowSpec


def bounded_global_window(*order_cols, bound: str) -> WindowSpec:
    """``Window.orderBy(*order_cols)`` for a BOUNDED-by-construction
    input frame.  ``bound`` is mandatory documentation: one sentence
    naming the invariant that caps the frame's cardinality (e.g.
    "post-agg timeslice series — one row per slice of the query
    range", "vocabulary frame capped by distinct tokens").  The
    single-partition sort the plan produces is then the point, not a
    bottleneck.  Raises when the bound is missing or vacuous so the
    marker can't be cargo-culted silently."""
    if not isinstance(bound, str) or len(bound.strip()) < 12:
        raise ValueError(
            "bounded_global_window requires a real `bound` sentence "
            "documenting the cardinality invariant — a global window "
            "over an unbounded frame is a single-partition sort at "
            f"scale (got {bound!r})")
    return Window.orderBy(*order_cols)
