"""Count-min sketch (Cormode & Muthukrishnan 2005) as a pure-Catalyst
aggregate — the frequency counterpart of the HLL distinct sketch (SURVEY.md
§2 row 24) and the bounded-memory complement of the EXACT heavy-hitters
profile (row 52): the exact profile's state is O(distinct values), which is
honest at 10^5 categories and hopeless at 10^9 user-ids; the CMS grid is
depth x width counters REGARDLESS of cardinality, and every estimate
overestimates by at most e*N/width with probability 1 - e^-depth.

Representation: a :class:`CMSketch` wrapper around a tiny ``(row, bucket,
n)`` DataFrame grid — depth x width rows at most — plus the (depth, width)
parameters. The parameters ride in Python, NOT as grid columns needing a
collect: estimating or merging with mismatched parameters would silently
break the ">= true count" hard guarantee (a missing row index coalesces to
0 and wins the min), so both operations validate them eagerly and raise.
Persist ``sketch.grid`` (parquet) and rehydrate with ``CMSketch(grid, depth,
width)``.

Construction is ONE scan + ONE exchange with map-side partial aggregation:
the per-row projection explodes each value onto its depth (row, bucket)
coordinates and the hash-agg collapses to <= d*w rows per task before
anything shuffles, so the shuffle is constant-size no matter the input.
Merging sketches (across partitions, runs, or tables) is a groupBy-sum of
the union — associative and commutative, proven in tests.

Hashing: xxhash64(value_string, row_index) mod width — JVM-codegen'd,
deterministic across engines/sessions, and the row index rides as a second
hash input so the d rows are pairwise-independent-enough in the standard
practical sense. NULL values are excluded (a NULL hashes to NULL — no
defined coordinates; NULL frequency is the null-rate stat's job, row 23).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CMSketch:
    grid: DataFrame  # (row:int, bucket:long, n:long), sparse — absent = 0
    depth: int
    width: int


def _coords(col, depth: int, width: int):
    """Array of (row, bucket) structs for one value — the d CMS coordinates."""
    s = F.col(col).cast("string") if isinstance(col, str) else col.cast("string")
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                F.pmod(F.xxhash64(s, F.lit(i)), F.lit(width)).alias("bucket"),
            )
            for i in range(depth)
        ]
    )


def cms_build(df: DataFrame, col: str, depth: int = 5, width: int = 2048) -> CMSketch:
    """Build the sketch over non-NULL values of ``col``."""
    if depth <= 0 or width <= 0:
        raise ValueError("depth and width must be positive")
    grid = (
        df.filter(F.col(col).isNotNull())
        .select(F.explode(_coords(col, depth, width)).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return CMSketch(grid, depth, width)


def cms_merge(*sketches: CMSketch) -> CMSketch:
    """Merge sketches built with the SAME (depth, width): counter-wise sum.
    Associativity/commutativity (and merge(build(A), build(B)) ==
    build(A union B)) are pinned by tests; mismatched parameters raise —
    summing differently-hashed grids is silent garbage, never an estimate."""
    if not sketches:
        raise ValueError("need at least one sketch")
    params = {(s.depth, s.width) for s in sketches}
    if len(params) != 1:
        raise ValueError(f"cannot merge sketches with different (depth, width): {sorted(params)}")
    out = sketches[0].grid
    for s in sketches[1:]:
        out = out.unionByName(s.grid)
    merged = out.groupBy("row", "bucket").agg(F.sum("n").alias("n"))
    return CMSketch(merged, sketches[0].depth, sketches[0].width)


def cms_estimate(sketch: CMSketch, queries: DataFrame, col: str) -> DataFrame:
    """Point-frequency estimates for each distinct non-NULL value in
    ``queries[col]``: min over the d rows of the value's counters. The grid
    is d*w rows at most → broadcast; the query side never shuffles beyond
    its own distinct-agg. Never-seen values estimate 0 (missing coordinates
    coalesce to zero). Guarantee: estimate >= true count always; estimate <=
    true + e*N/width with probability 1 - e^-depth per query.
    """
    depth, width = sketch.depth, sketch.width
    q = (
        queries.filter(F.col(col).isNotNull())
        .select(F.col(col).alias("value"))
        .distinct()
        .select("value", F.explode(_coords("value", depth, width)).alias("c"))
        .select("value", F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
    )
    joined = q.join(F.broadcast(sketch.grid), on=["row", "bucket"], how="left")
    return joined.groupBy("value").agg(
        F.min(F.coalesce(F.col("n"), F.lit(0))).alias("estimate")
    )
