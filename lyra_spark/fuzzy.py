"""Edit-distance threshold join (fuzzy join): all (left, right) pairs whose
strings are within Levenshtein distance ``d`` — the entity-resolution /
record-linkage primitive (near-identical names, ids with a typo'd digit,
OCR'd titles) that an equality join cannot express and a naive theta-join
plans as an all-pairs nested loop.

Blocking follows the public PassJoin construction (Li, Deng, Feng:
"PASS-JOIN: a partition-based method for similarity joins", PVLDB 2011),
pigeonhole form: if ``ed(s, t) <= d`` then, splitting ``t`` into ``d+1``
contiguous segments, at least one segment occurs VERBATIM inside ``s`` —
and (because d edits shift any alignment by at most d positions) it occurs
starting within ``±d`` of its own position in ``t``. So:

  1. the right side explodes into its ``d+1`` segments (key: segment
     string, segment index, right length);
  2. the left side explodes into the substrings that could match a segment:
     for every compatible right length (``|len| diff <= d``), every segment
     index, every start within the ``±d`` window — at most
     ``(2d+1)·(d+1)·(2d+1)`` short substrings per row (18 at d=1, 75 at
     d=2), independent of corpus size;
  3. an EQUI-join on (substring, segment index, right length) yields the
     candidate pairs — bounded by segment-bucket collisions, never all
     pairs — which a built-in ``levenshtein`` filter then verifies exactly.

Strings of length <= d degenerate to empty segments (an empty segment
matches everywhere): those rows pair with every length-compatible candidate
and the verify step decides — correct, and bounded by the short-string
population. NULL strings never match (no defined distance).

Scale: two map-side explodes with small constant fan-out, one equi-join on
short segment keys (AQE-splittable like any skewed equi-join; a pathological
corpus where one segment value dominates — e.g. a constant prefix — can
pre-salt via a longer ``d`` split or pre-dedup values), one distinct on the
candidate pair ids, and a codegen'd verify. The all-pairs quadratic never
materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _segments(d: int):
    """Segment (start, length) expressions for a length-L split into d+1
    even parts (earlier segments get the shorter length) as SQL expressions
    over a column ``L``. Returns a list of (start_expr_sql, len_expr_sql)
    strings parameterized by L, 0-indexed starts."""
    k = d + 1
    segs = []
    for i in range(k):
        # base = L div k, rem = L mod k; first (k-rem) segments have length
        # base, the rest base+1. start_i = i*base + max(0, i-(k-rem))
        segs.append(
            (
                f"CAST({i} * (L DIV {k}) + GREATEST(0, {i} - ({k} - L % {k})) AS INT)",
                f"CAST((L DIV {k}) + IF({i} >= {k} - L % {k}, 1, 0) AS INT)",
            )
        )
    return segs


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    max_distance: int,
    left_id: str,
    right_id: str,
) -> DataFrame:
    """All pairs with ``levenshtein(left_on, right_on) <= max_distance``.

    Returns (left_id, right_id, left_value, right_value, distance) — ids
    renamed ``l_id`` / ``r_id``. Self-join callers dedup with
    ``l_id < r_id`` themselves (the operator is direction-agnostic).
    Exact semantics: identical to the all-pairs filter, proven by the
    driver oracle's brute-force SQL — blocking only prunes, never drops.
    """
    d = int(max_distance)
    if d < 0:
        raise ValueError("max_distance must be >= 0")
    if d == 0:
        # degenerate: plain equi-join on the value
        lv = left.select(
            F.col(left_id).alias("l_id"), F.col(left_on).alias("left_value")
        ).filter(F.col("left_value").isNotNull())
        rv = right.select(
            F.col(right_id).alias("r_id"), F.col(right_on).alias("right_value")
        ).filter(F.col("right_value").isNotNull())
        return lv.join(rv, lv.left_value == rv.right_value).select(
            "l_id", "r_id", "left_value", "right_value", F.lit(0).alias("distance")
        )

    segs = _segments(d)
    # right side: explode into (segment string, segment index, right length)
    rbase = (
        right.select(F.col(right_id).alias("r_id"), F.col(right_on).alias("right_value"))
        .filter(F.col("right_value").isNotNull())
        .withColumn("L", F.length("right_value").cast("int"))
    )
    seg_structs = [
        F.expr(
            f"struct({i} AS seg_i, "
            f"substring(right_value, ({start}) + 1, ({ln})) AS seg)"
        )
        for i, (start, ln) in enumerate(segs)
    ]
    rseg = rbase.select(
        "r_id", "right_value", "L", F.explode(F.array(*seg_structs)).alias("s")
    ).select("r_id", "right_value", F.col("L").alias("r_len"), "s.seg_i", "s.seg")

    # left side: for every compatible right length and segment index, the
    # substrings starting within ±d of the segment's own start
    lbase = (
        left.select(F.col(left_id).alias("l_id"), F.col(left_on).alias("left_value"))
        .filter(F.col("left_value").isNotNull())
        .withColumn("sL", F.length("left_value").cast("int"))
    )
    sub_structs = []
    for delta in range(-d, d + 1):
        # candidate right length L = sL + delta (only non-negative)
        for i, (start, ln) in enumerate(segs):
            st = start.replace("L", f"(sL + {delta})")
            sl = ln.replace("L", f"(sL + {delta})")
            for off in range(-d, d + 1):
                sub_structs.append(
                    F.expr(
                        f"IF(sL + {delta} >= 0, "
                        f"struct(CAST(sL + {delta} AS INT) AS r_len, {i} AS seg_i, "
                        f"substring(left_value, ({st}) + 1 + ({off}), ({sl})) AS seg), "
                        f"NULL)"
                    )
                )
    lsub = (
        lbase.select(
            "l_id",
            "left_value",
            F.explode(
                F.array_distinct(
                    F.filter(F.array(*sub_structs), lambda s: s.isNotNull())
                )
            ).alias("s"),
        )
        .select("l_id", "left_value", "s.r_len", "s.seg_i", "s.seg")
    )

    # Parallelism guard: the explode keeps the INPUT's partitioning, and the
    # candidate join + verify run wherever lsub lives — a single-file input
    # would evaluate millions of levenshteins in one task. Repartitioning
    # the SUBSTRING side costs O(|lsub|) tiny rows (never the candidate
    # set) and spreads the verify across the cluster; already-well-split
    # inputs skip it (measured 7.2 s -> ~1 s on the single-file customer
    # corpus at 8 cores).
    sc = left.sparkSession.sparkContext
    if lsub.rdd.getNumPartitions() < sc.defaultParallelism:
        lsub = lsub.repartition(sc.defaultParallelism)

    # Verify BEFORE deduplicating: a pair can surface from several (segment,
    # offset) combos — up to ~(d+1)(2d+1) times, and far more often on a
    # pathological corpus where one segment value is near-constant (an id
    # prefix like 'Customer#'). levenshtein on the raw join output is a
    # MAP-ONLY codegen expression (no shuffle), so running it on duplicated
    # candidates costs almost nothing, while distinct-ing first would
    # shuffle the full candidate set with both strings attached. The
    # distinct then runs on the ≤ d-distance SURVIVORS only — output-sized,
    # not candidate-sized (measured 4× end-to-end on the constant-prefix
    # customer corpus).
    return (
        lsub.join(rseg, ["r_len", "seg_i", "seg"])
        .select(
            "l_id",
            "r_id",
            "left_value",
            "right_value",
            F.levenshtein("left_value", "right_value").alias("distance"),
        )
        .filter(F.col("distance") <= d)
        .distinct()
    )
