"""Deterministic global shuffle + sharded training export.

The last hop of every training-data pipeline: the cleaned corpus must reach
the trainer in (a) a pseudo-random order — SGD degrades measurably on
source-/time-clustered data — that is (b) exactly reproducible across reruns,
engines, and repartitioning, and (c) laid out as N similarly-sized shard
files the data loader can stream independently.

Construction: the shuffle key is the md5 draw already used by the samplers in
``pipeline.sample`` (TFX `hash_buckets`-style), so the permutation is a pure
function of the document id — no `rand()`, no per-partition seeds, no global
sort of arrival order. Shard = hash mod N (map-only); position within shard =
rank by the hash (one exchange on the shard key). Reading shards
0..N-1 each in position order replays one fixed global permutation.

Scale shape: assignment is map-only whole-stage codegen; the ONLY exchange is
the repartition on `shard` that the sharded write needs anyway, and its key is
uniform by construction (md5), so no skew handling is required. Shard count is
chosen so one shard ≈ one output file (e.g. 100 TB / 1 GB → 10^5 shards);
within-shard rank sorts corpus/N rows per task — the same work any sorted
file write does. No driver-side data, no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# The md5-uint32 construction is defined ONCE in pipeline.sample (every
# sampler's draw divides the same integer); the oracle rendering lives there.
from lyra_spark.pipeline.sample import hash_uint32


def shuffle_index(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shuffle",
    shard_col: str = "shard",
    position_col: str = "position",
    partition_for_write: bool = False,
) -> DataFrame:
    """Add (``shard``, ``position``): the deterministic global-shuffle
    address of each row. shard = md5-uint32 mod ``n_shards`` (map-only);
    position = 0-based rank within the shard by (md5-uint32, id) — the id
    tiebreak makes the permutation total even under 32-bit hash collisions
    (~n²/2³³ pairs: guaranteed at corpus scale).

    NULL ids are excluded — they have no defined draw, and silently routing
    them all to one shard would both skew it and hide the broken identity.

    One exchange (on the uniform shard key), one within-shard sort. The
    single-task-per-shard sort is the scale dial: pick ``n_shards`` from
    target file size, never from cluster size.

    ``partition_for_write``: hash-repartition to ``n_shards`` tasks on the
    shard key BEFORE the rank window. The window's ClusteredDistribution is
    satisfied by hashpartitioning(shard, n_shards), so the plan keeps ONE
    exchange end-to-end and a downstream per-shard writer needs no second
    repartition (without it the window exchanges at
    spark.sql.shuffle.partitions and a write-side repartition to n_shards
    would shuffle the full corpus AGAIN — ~2× the export's I/O).
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    for c in (shard_col, position_col, "__h"):
        if c in df.columns:
            raise ValueError(f"input must not contain the reserved column {c!r}")
    h = hash_uint32(id_col, salt)
    out = (
        df.filter(F.col(id_col).isNotNull())
        .withColumn("__h", h)
        .withColumn(shard_col, F.pmod(F.col("__h"), F.lit(int(n_shards))))
    )
    if partition_for_write:
        out = out.repartition(int(n_shards), shard_col)
    w = Window.partitionBy(shard_col).orderBy(F.col("__h").asc(), F.col(id_col).asc())
    return out.withColumn(position_col, F.row_number().over(w) - F.lit(1)).drop("__h")


def write_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shuffle",
    pack_budget: int | None = None,
    token_col: str = "n_tokens",
    fmt: str = "parquet",
) -> None:
    """Materialize the shuffled corpus as ``path/shard=K/`` parquet dirs,
    rows inside each shard stored in permutation order (parquet preserves
    write order, so a loader streaming one shard replays its slice of the
    permutation without sorting).

    The repartition targets `n_shards` tasks keyed on the shard id; hash
    collisions may co-locate a few shards per task (and leave some tasks
    empty) — harmless, since `partitionBy` still splits them into their own
    directories and `sortWithinPartitions(shard, position)` keeps each dir
    internally ordered. Rewriting with the same inputs is byte-stable: every
    row's (shard, position, bytes) is a pure function of the data.

    ``pack_budget`` adds SHARD-LOCAL (pack_id, pack_offset) columns via
    pack_within_shards — packing must follow the shuffle layout (packing
    before it would scatter each pack's members across shards), and the
    window rides the same shard partitioning, so it costs no extra
    exchange.

    ``fmt``: "parquet" (default) or "json" — JSON-Lines shards (one object
    per row, write-order preserved like parquet) for trainers that stream
    jsonl instead of columnar files. Same layout, same determinism; the
    only cost is JSON's text encoding.
    """
    if fmt not in ("parquet", "json"):
        raise ValueError(f"fmt must be 'parquet' or 'json', got {fmt!r}")
    # partition_for_write: ONE exchange total — the rank window and this
    # writer share the same hashpartitioning(shard, n_shards); a second
    # write-side repartition would re-shuffle the whole corpus
    out = shuffle_index(df, n_shards, id_col=id_col, salt=salt, partition_for_write=True)
    if pack_budget is not None:
        out = pack_within_shards(out, pack_budget, token_col=token_col)
    (
        out.sortWithinPartitions("shard", "position")
        .write.mode("overwrite")
        .partitionBy("shard")
        .format(fmt)
        .save(path)
    )


def pack_within_shards(
    indexed: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    shard_col: str = "shard",
    position_col: str = "position",
    out_col: str = "pack_id",
    offset_col: str = "pack_offset",
) -> DataFrame:
    """Add SHARD-LOCAL (pack_id, pack_offset) to a shuffle-indexed frame:
    concat-and-chunk packing in permutation order, restarting at every
    shard, so a pack NEVER straddles two shard files — a loader streams one
    shard and assembles its packs contiguously. (Global id-ordered packing
    before the shuffle would be scattered across shards by it; packing must
    follow the layout, not precede it.)

    Zero extra exchange: the running token sum is a window over the SAME
    (shard) partitioning the shuffle index already established. Global pack
    identity is the PAIR (shard, pack_id). NULL token counts pack as 0,
    like pack_sequences.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    for c in (out_col, offset_col, "__cum"):
        # same reserved-column contract as shuffle_index: silently clobbering
        # a pre-existing pack_id/pack_offset (e.g. re-exporting a prior
        # export's output) would destroy data
        if c in indexed.columns:
            raise ValueError(f"input must not contain the reserved column {c!r}")
    w = (
        Window.partitionBy(shard_col)
        .orderBy(position_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tok = F.coalesce(F.col(token_col).cast("long"), F.lit(0))
    cum = F.coalesce(F.sum(tok).over(w), F.lit(0))
    # integral DIV, never double division: past 2^53 cumulative tokens a
    # float quotient can round across a pack boundary (pack_sequences uses
    # exact numpy // for the same reason)
    return (
        indexed.withColumn("__cum", cum)
        .withColumn(out_col, F.expr(f"__cum div {int(budget)}"))
        .withColumn(offset_col, F.pmod(F.col("__cum"), F.lit(int(budget))))
        .drop("__cum")
    )
