"""Sequence packing: assign documents to fixed-token-budget training packs.

The concat-and-chunk example builder every LLM pipeline runs before training:
documents are laid end-to-end in a deterministic global order and cut into
packs of ``budget`` tokens; a doc belongs to the pack where its first token
lands. Semantically this is a GLOBAL exclusive prefix sum over the token
counts — trivially a single-partition window in SQL, which is exactly the
thing that cannot run on 10^12 rows. The distributed construction here is the
classic two-phase scan:

  1. range-repartition by the order key and sort within partitions — one
     shuffle, the only data movement in the whole operator;
  2. per-partition token totals (P rows) come back to the driver, which
     prefix-sums them into per-partition OFFSETS — bytes moved: O(P), not
     O(rows);
  3. a map-only Arrow pass (mapInPandas + TaskContext.partitionId) adds each
     partition's offset to its local running cumsum — zero further shuffles,
     vectorized numpy per batch, never per-row Python.

The result is bit-identical to the single-partition window (pinned by test
against a window/pandas reference at several partition counts), so the DuckDB
oracle is just `SUM(...) OVER (ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING
AND 1 PRECEDING)`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    out_col: str = "pack_id",
    offset_col: str = "pack_offset",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add (``pack_id``, ``pack_offset``): the training pack this doc starts
    in and its token offset within that pack, for docs laid out in ascending
    ``id_col`` order and cut every ``budget`` tokens.

    Deterministic on fixed input (the order key is the id, not arrival
    order); NULL-id rows are excluded (they have no defined position); NULL
    token counts pack as 0. A doc longer than ``budget`` still starts in one
    pack (its tail straddles into the next — splitting doc text itself is the
    tokenizer stage's job, downstream of this assignment).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    for c in (out_col, offset_col):
        if c in df.columns:
            raise ValueError(f"input must not contain the reserved output column {c!r}")
    df = df.filter(F.col(id_col).isNotNull())
    ranged = df.repartitionByRange(
        *( [num_partitions] if num_partitions else [] ), F.col(id_col)
    ).sortWithinPartitions(id_col)
    # Pin the range boundaries: both the totals job and the final pass must
    # see the SAME partitioning (lazy checkpoint materializes on first use).
    ranged = ranged.localCheckpoint(eager=False)

    tok = F.coalesce(F.col(token_col).cast("long"), F.lit(0))
    totals = (
        ranged.select(F.spark_partition_id().alias("pid"), tok.alias("__t"))
        .groupBy("pid")
        .agg(F.sum("__t").alias("t"))
        .collect()
    )  # P rows — the driver-side half of the two-phase scan, O(partitions)
    by_pid = {r["pid"]: r["t"] for r in totals}
    offsets: dict[int, int] = {}
    run = 0
    for pid in sorted(by_pid):
        offsets[pid] = run
        run += by_pid[pid]

    fields = ranged.schema.fieldNames()
    # a FRESH StructType — StructType.add mutates in place, and DataFrame
    # caches its schema object, so extending ranged.schema directly corrupts
    # ranged's own column resolution inside mapInPandas
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        list(ranged.schema.fields)
        + [StructField(out_col, LongType()), StructField(offset_col, LongType())]
    )

    def add_packs(iterator):
        import numpy as np
        from pyspark import TaskContext

        running = offsets.get(TaskContext.get().partitionId(), 0)
        for pdf in iterator:
            t = (
                pdf[token_col].fillna(0).to_numpy(dtype="int64")
                if token_col in pdf
                else np.zeros(len(pdf), dtype="int64")
            )
            cum_before = running + np.cumsum(t) - t  # exclusive prefix sum
            running += int(t.sum())
            pdf = pdf[fields].copy()
            pdf[out_col] = cum_before // budget
            pdf[offset_col] = cum_before - (cum_before // budget) * budget
            yield pdf

    return ranged.mapInPandas(add_packs, schema=out_schema)


def chunk_documents(
    df: DataFrame,
    max_tokens: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window document chunking: split each document's whitespace
    tokens into windows of ``max_tokens`` advancing by ``max_tokens −
    overlap`` — the long-document preprocessing twin of pack_sequences (that
    one concatenates SHORT docs up to a budget; this one cuts LONG docs down
    to it, with overlap so no context is lost at a boundary).

    Returns (id_col, chunk_idx, n_chunks, chunk_text, n_tokens): chunk_idx
    0-based in document order, every window exactly ``max_tokens`` tokens
    except the last (the tail, ≥ 1 token), a ≤-max_tokens doc yields itself
    as its only chunk. NULL and whitespace-only texts yield NO chunks (no
    content to window — the caller's completeness checks own those rows).

    Scale: pure Catalyst and MAP-ONLY — split → explode(sequence) → slice →
    array_join, zero exchanges, codegen end-to-end; fan-out per row is
    ceil((n−max)/(max−overlap))+1 chunks, proportional to the document's own
    length like any tokenizer. Deterministic, and cheap enough to inline
    before pack_sequences (chunk → pack is the standard long-doc pipeline).
    """
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    if not (0 <= overlap < max_tokens):
        raise ValueError("overlap must satisfy 0 <= overlap < max_tokens")
    step = max_tokens - overlap
    toks = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != "")
    base = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), toks.alias("__toks"))
        .withColumn("__n", F.size("__toks"))
        .filter(F.col("__n") > 0)
    )
    k = F.when(F.col("__n") <= max_tokens, F.lit(0)).otherwise(
        F.ceil((F.col("__n") - F.lit(max_tokens)) / F.lit(float(step))).cast("int")
    )
    return (
        base.withColumn("__k", k)
        .select(
            id_col,
            "__toks",
            "__n",
            (F.col("__k") + 1).cast("int").alias("n_chunks"),
            F.explode(F.sequence(F.lit(0), F.col("__k"))).alias("chunk_idx"),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            "n_chunks",
            F.array_join(
                F.slice(F.col("__toks"), F.col("chunk_idx") * step + 1, max_tokens), " "
            ).alias("chunk_text"),
            F.least(
                F.lit(max_tokens), F.col("__n") - F.col("chunk_idx") * step
            ).cast("int").alias("n_tokens"),
        )
    )
