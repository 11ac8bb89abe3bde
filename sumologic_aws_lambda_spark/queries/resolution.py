"""Entity resolution: blocked fuzzy matching between two record sets.

The canonical data-integration operator a 100 TB pipeline needs when two
sources describe the same entities with near-identical keys (host names,
account ids, vendor names).  The naive form is an all-pairs edit-distance
scan — O(n·m) and unshuffleable; the scalable form is *blocking*: a cheap
deterministic key (here: the last two digits of the normalized id) turns
the cartesian into an equi-join, and the expensive similarity function
runs only inside blocks.  Recall is bounded by the blocking key — a pair
that disagrees in the blocked suffix is never considered — which is the
documented, standard trade-off (Fellegi–Sunter / record-linkage
literature, public).

Reference tie-in: the collectors key outputs deterministically
(``securityhub_collector.py:45`` — ``{ProductArn}-{request_id}``); this
is the analytics-side counterpart — resolving near-duplicate keys back
together.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from . import query


def blocked_match(left: DataFrame, right: DataFrame,
                  left_key: str, right_key: str,
                  left_id: str, right_id: str,
                  block_chars: int = 2,
                  max_distance: int = 1,
                  broadcast_right: bool = False) -> DataFrame:
    """Blocked edit-distance matching, best match per left row.

    Join on the last ``block_chars`` characters of the normalized key
    (equi-join — never cartesian), filter to ``levenshtein ≤
    max_distance``, then resolve the best match per left row with two
    skew-safe groupBys: min distance first, then min right-id among the
    tied best — no window over a possibly-hot left key.

    When both sides are large the block key makes this a plain
    shuffled equi-join; pass ``broadcast_right=True`` only when the
    right side is a genuine dim table (the optimizer is left to decide
    otherwise).

    Returns (left_id, right_id, distance).
    """
    lb = left.select(
        F.col(left_id),
        F.col(left_key).alias("__lk"),
        F.substring(F.col(left_key), -block_chars, block_chars)
        .alias("__blk"),
    )
    rb = right.select(
        F.col(right_id),
        F.col(right_key).alias("__rk"),
        F.substring(F.col(right_key), -block_chars, block_chars)
        .alias("__blk"),
    )
    if broadcast_right:
        rb = F.broadcast(rb)
    pairs = (
        lb.join(rb, "__blk")
        .withColumn("distance", F.levenshtein("__lk", "__rk"))
        .filter(F.col("distance") <= max_distance)
        .select(left_id, right_id, "distance")
    )
    best = pairs.groupBy(left_id).agg(F.min("distance").alias("distance"))
    return (
        pairs.join(best, [left_id, "distance"])
        .groupBy(left_id, "distance")
        .agg(F.min(right_id).alias(right_id))
        .select(left_id, right_id, "distance")
    )


@query(
    "blocked_name_matching",
    oracle="""
    WITH l AS (
        SELECT c_custkey, regexp_extract(c_name, '([0-9]+)$', 1) AS k
        FROM customer
    ),
    r AS (
        SELECT s_suppkey, regexp_extract(s_name, '([0-9]+)$', 1) AS k
        FROM supplier
    ),
    pairs AS (
        SELECT l.c_custkey, r.s_suppkey,
               levenshtein(l.k, r.k) AS distance
        FROM l JOIN r ON substr(l.k, length(l.k) - 1, 2)
                       = substr(r.k, length(r.k) - 1, 2)
        WHERE levenshtein(l.k, r.k) <= 1
    ),
    best AS (
        SELECT c_custkey, min(distance) AS distance FROM pairs
        GROUP BY c_custkey
    )
    SELECT p.c_custkey, min(p.s_suppkey) AS s_suppkey, p.distance
    FROM pairs p JOIN best b
      ON b.c_custkey = p.c_custkey AND b.distance = p.distance
    GROUP BY p.c_custkey, p.distance
    """,
)
def blocked_name_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolve customers to suppliers whose zero-padded id suffix is
    within edit distance 1, blocking on the last two digits.

    The block key turns O(customers × suppliers) into an equi-join with
    ≤ 100 blocks; the supplier side is a broadcast dim.  Best-match
    resolution is two groupBys, not a window, so a hot block cannot
    serialize into one task.
    """
    c = table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.regexp_extract("c_name", r"([0-9]+)$", 1).alias("ck"),
    )
    s = table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.regexp_extract("s_name", r"([0-9]+)$", 1).alias("sk"),
    )
    return blocked_match(
        c, s, left_key="ck", right_key="sk",
        left_id="c_custkey", right_id="s_suppkey",
        block_chars=2, max_distance=1,
        broadcast_right=True,  # supplier is a genuine dim table
    )
