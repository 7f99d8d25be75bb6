"""Point-in-interval (range) join without a nested loop.

The naive formulation — ``points JOIN intervals ON key = key AND start <= ts
AND ts <= end`` — has a non-equi conjunct, so Spark plans a sort-merge join
on the key alone and filters the range INSIDE each key group: a hot key
degenerates to all-points x all-intervals. With no equi key at all it plans
BroadcastNestedLoopJoin — quadratic, and the classic OOM/runtime cliff at
scale.

The scalable construction is time bucketing (the standard interval-join
technique, e.g. Flink's interval join and the published range-join
optimizations in Databricks' runtime): pick a bucket width W, assign every
point to bucket floor(ts/W), explode every interval onto the buckets it
overlaps (floor(start/W) .. floor(end/W)), equi-join on (key, bucket), then
apply the exact range predicate. Each point lands in EXACTLY ONE bucket, so
no dedup pass is needed; each interval fans out to len/W + 1 rows. Cost: one
exchange per side on (key, bucket) — a plain shuffled equi-join AQE can
split on skew — and the candidate set is bounded by rows whose buckets
actually collide, never |points| x |intervals|.

Choosing W: the typical interval length. Too small → interval fan-out
explodes; too large → buckets regress toward per-key nested loops. Both
failure modes are visible (row counts of the exploded side / the joined
candidate set), not silent.

Semantics (SEMANTICS.md): bounds are INCLUSIVE on both ends; intervals with
end < start or a NULL key/bound are dropped; points with a NULL key/ts are
dropped (inner-join semantics — nothing for them to match).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lyra_spark.sessionize import epoch_us

_BKT = "__range_bucket__"


def _bucket(col, width_us: int):
    # Exact floor-division of epoch micros: subtract the non-negative pmod
    # remainder first, so the double division divides an exact multiple of
    # the width (quotient is an exact integer; micros magnitudes are far
    # below 2^53, so the round-trip is lossless). A raw floor(us / W) in
    # doubles can misbucket a timestamp within 1 ulp of a bucket boundary,
    # which here would silently drop a true point-interval match.
    us = epoch_us(col)
    rem = F.pmod(us, F.lit(width_us))
    return ((us - rem) / F.lit(width_us)).cast("long")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_width_sec: float = 86400.0,
) -> DataFrame:
    """Inner-join every point to every interval (same ``on`` key) whose
    ``[start_ts, end_ts]`` contains ``point_ts``. Output columns: the key
    columns once, then the remaining point columns, then the remaining
    interval columns (names must not clash — rename beforehand).
    """
    width_us = int(float(bucket_width_sec) * 1_000_000)
    if width_us <= 0:
        raise ValueError("bucket_width_sec must be positive")
    clash = (set(points.columns) & set(intervals.columns)) - set(on)
    if clash:
        raise ValueError(f"column name clash outside the join key: {sorted(clash)}")

    p_ok = F.col(point_ts).isNotNull()
    i_ok = (
        F.col(start_ts).isNotNull()
        & F.col(end_ts).isNotNull()
        & (F.col(end_ts) >= F.col(start_ts))
    )
    for k in on:
        p_ok = p_ok & F.col(k).isNotNull()
        i_ok = i_ok & F.col(k).isNotNull()

    if _BKT in points.columns or _BKT in intervals.columns:
        raise ValueError(f"inputs must not contain the reserved column {_BKT!r}")
    p = points.filter(p_ok).withColumn(_BKT, _bucket(F.col(point_ts), width_us))
    # sequence() with an explicit step of 1 over the covered bucket ids;
    # end >= start is guaranteed by the filter above, so the sequence is
    # never descending.
    i = (
        intervals.filter(i_ok)
        .withColumn(
            _BKT,
            F.explode(
                F.sequence(
                    _bucket(F.col(start_ts), width_us),
                    _bucket(F.col(end_ts), width_us),
                    F.lit(1).cast("long"),
                )
            ),
        )
    )
    joined = p.join(i, on=[*on, _BKT], how="inner").filter(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) <= F.col(end_ts))
    )
    point_rest = [c for c in points.columns if c not in on]
    interval_rest = [c for c in intervals.columns if c not in on]
    return joined.select(*on, *point_rest, *interval_rest)
