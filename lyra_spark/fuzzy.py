"""Edit-distance threshold join (fuzzy join): all (left, right) pairs whose
strings are within Levenshtein distance ``d`` — the entity-resolution /
record-linkage primitive (near-identical names, ids with a typo'd digit,
OCR'd titles) that an equality join cannot express and a naive theta-join
plans as an all-pairs nested loop.

Two lossless blocking strategies, picked automatically by distance:

**Deletion neighborhood (d <= 2, the default there)** — the public FastSS
construction (Schulz & Mihov's universal deletion dictionaries; Bocek et
al. 2007 tech report form): if ``ed(s, t) <= d`` then deleting at most
``d`` characters from each reaches a COMMON string, so the sets of
"every ≤ d-deletion variant" intersect. Each side explodes into its
variant set (``1 + L + C(L,2)`` strings at d=2 — fan-out ``O(L^d)``,
fine for the short record-linkage strings this operator targets), keyed
by ``xxhash64(variant)`` so only (id, 8-byte hash) pairs ever shuffle;
the equi-join on the hash yields candidate id pairs, values join back,
and a built-in ``levenshtein`` verifies exactly (which also absorbs hash
collisions — blocking stays lossless). The key is the nearly-whole
string, so a corpus-wide constant PREFIX (``Customer#0000…``) costs
nothing — exactly the case where segment blocking degenerates: PassJoin
on the sf0.1 customer corpus runs ~50 s (every first segment identical
→ ~n²/offsets candidates); this path runs it in ~1 s.

**PassJoin segment blocking (d >= 3)** — (Li, Deng, Feng: "PASS-JOIN: a
partition-based method for similarity joins", PVLDB 2011), pigeonhole
form: if ``ed(s, t) <= d`` then, splitting ``t`` into ``d+1`` contiguous
segments, at least one segment occurs VERBATIM inside ``s`` — and
(because d edits shift any alignment by at most d positions) it occurs
starting within ``±d`` of its own position in ``t``. Fan-out is
``O(d²)`` per row regardless of string length, the right trade once the
deletion neighborhood's ``C(L,d)`` blows up. So:

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

Strings of length <= d degenerate to empty segments/variants (an empty key
matches every other empty key): those rows pair with every other short
string and the verify step decides — correct, and bounded by the
short-string population. NULL strings never match (no defined distance).

Scale: map-side explodes with bounded fan-out, one equi-join on selective
keys (AQE-splittable like any skewed equi-join), one distinct on the
candidate pair ids, and a codegen'd verify. The all-pairs quadratic never
materializes on either path. The residual hot key both paths share is an
actual mass duplicate (10⁶ copies of one string) — but there the OUTPUT
is quadratic, not just the blocking.
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


def _deletion_variant_hashes(value_col: str, d: int):
    """``array<bigint>`` Column: xxhash64 of every string reachable from
    ``value_col`` by deleting at most ``d`` characters (d in {1, 2}),
    duplicates removed. Pure Catalyst — ``sequence`` + ``transform`` build
    the variants, only their 8-byte hashes survive the projection."""
    s = value_col
    parts = [f"array(xxhash64({s}))"]
    # one deletion: drop position i (1-indexed); guard L >= 1 because
    # sequence(1, 0) is a DESCENDING sequence in Spark, not empty
    parts.append(
        f"IF(length({s}) >= 1, "
        f"transform(sequence(1, length({s})), i -> "
        f"  xxhash64(concat(substring({s}, 1, i - 1), substring({s}, i + 1)))), "
        f"array())"
    )
    if d >= 2:
        # two deletions: drop positions i < j
        parts.append(
            f"IF(length({s}) >= 2, "
            f"flatten(transform(sequence(1, length({s}) - 1), i -> "
            f"  transform(sequence(i + 1, length({s})), j -> "
            f"    xxhash64(concat(substring({s}, 1, i - 1), "
            f"             substring({s}, i + 1, j - i - 1), "
            f"             substring({s}, j + 1)))))), "
            f"array())"
        )
    return F.array_distinct(F.expr(f"concat({', '.join(parts)})"))


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    max_distance: int,
    left_id: str,
    right_id: str,
    method: str = "auto",
    spread: bool | None = None,
) -> DataFrame:
    """All pairs with ``levenshtein(left_on, right_on) <= max_distance``.

    Returns (left_id, right_id, left_value, right_value, distance) — ids
    renamed ``l_id`` / ``r_id``. Self-join callers dedup with
    ``l_id < r_id`` themselves (the operator is direction-agnostic).
    Exact semantics: identical to the all-pairs filter, proven by the
    driver oracle's brute-force SQL — blocking only prunes, never drops.

    ``method``: "auto" (deletion neighborhood for d <= 2, PassJoin above),
    or force "deletion" (d <= 2 only) / "passjoin".
    """
    d = int(max_distance)
    if d < 0:
        raise ValueError("max_distance must be >= 0")
    if method not in ("auto", "deletion", "passjoin"):
        raise ValueError(f"unknown method {method!r}")
    if method == "deletion" and d > 2:
        raise ValueError("deletion-neighborhood blocking supports max_distance <= 2")
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
    if d <= 2 and method == "deletion":
        return _fuzzy_join_deletion(left, right, left_on, right_on, d, left_id, right_id)
    if d <= 2 and method == "auto":
        # Length-hybrid: deletion blocking's O(L^d) fan-out is the right
        # trade only for short strings (names, ids, titles); long strings
        # keep PassJoin's O(d²) fan-out. short×short / long×anything /
        # short×long partition the pair space disjointly and exhaustively.
        # Stays a PURE transformation: no eager emptiness probes (probing a
        # filter that turns out empty is itself a full scan, run as a
        # surprise job at plan-build time, and can go stale before the real
        # action). The passjoin branches cost two extra column-pruned
        # (id, value) scans at runtime even when the long population is
        # empty — corpora KNOWN to be all-short can pass method="deletion"
        # to skip them.
        T = _DELETION_MAX_LEN
        l_short = left.filter(F.length(left_on) <= T)
        r_short = right.filter(F.length(right_on) <= T)
        l_long = left.filter(F.length(left_on) > T)
        r_long = right.filter(F.length(right_on) > T)
        return (
            _fuzzy_join_deletion(l_short, r_short, left_on, right_on, d, left_id, right_id)
            .unionByName(
                _fuzzy_join_passjoin(l_long, right, left_on, right_on, d, left_id, right_id, spread)
            )
            .unionByName(
                _fuzzy_join_passjoin(l_short, r_long, left_on, right_on, d, left_id, right_id, spread)
            )
        )
    return _fuzzy_join_passjoin(left, right, left_on, right_on, d, left_id, right_id, spread)


# deletion-neighborhood fan-out at this length (d=2: ~2k variants) is ~the
# cost where PassJoin's degenerate-segment risk stops being the worse deal
_DELETION_MAX_LEN = 64


def _fuzzy_join_passjoin(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    d: int,
    left_id: str,
    right_id: str,
    spread: bool | None = None,
) -> DataFrame:
    """PassJoin segment blocking — see the module docstring."""
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
    # corpus at 8 cores). Decided from the leaf scan's file metadata only
    # (io.spread_if_narrow) — the former .rdd probe forced AQE stage
    # finalization at plan-build time.
    from lyra_spark.io import spread_if_narrow

    lsub = spread_if_narrow(lsub, spread)

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


def _fuzzy_join_deletion(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    d: int,
    left_id: str,
    right_id: str,
) -> DataFrame:
    """Deletion-neighborhood (FastSS) blocking for d in {1, 2} — see the
    module docstring. Only (id, variant-hash) pairs shuffle into the
    candidate join; the strings come back by id for the exact verify."""
    lbase = (
        left.select(F.col(left_id).alias("l_id"), F.col(left_on).alias("left_value"))
        .filter(F.col("left_value").isNotNull())
    )
    rbase = (
        right.select(F.col(right_id).alias("r_id"), F.col(right_on).alias("right_value"))
        .filter(F.col("right_value").isNotNull())
    )
    lvar = lbase.select(
        "l_id", F.explode(_deletion_variant_hashes("left_value", d)).alias("h")
    )
    rvar = rbase.select(
        "r_id", F.explode(_deletion_variant_hashes("right_value", d)).alias("h")
    )
    # candidate id pairs: a true pair shares >= 1 variant (often several —
    # identical strings share all of them), so distinct BEFORE the values
    # join back; the distinct runs on 16-byte id pairs, candidate-sized,
    # while the value joins and the verify run output-ish-sized
    cand = lvar.join(rvar, "h").select("l_id", "r_id").distinct()
    return (
        cand.join(lbase, "l_id")
        .join(rbase, "r_id")
        .select(
            "l_id",
            "r_id",
            "left_value",
            "right_value",
            F.levenshtein("left_value", "right_value").alias("distance"),
        )
        .filter(F.col("distance") <= d)
        # output-sized distinct for row-multiplicity parity with the PassJoin
        # path when an input carries duplicate (id, value) rows
        .distinct()
    )
