"""Deterministic synthetic transcript fixtures (FIXTURES.md §1-2, seed=42).

Generates the primary `transcripts` input table (conv_id, turn_idx, role, text,
tool, ts, part_date), the `tools_dim` broadcast dimension, and an
`injected_violations` manifest recording every row the injector corrupted.
No external data (BASELINE.json:15); everything derives from a fixed seed, so
two runs produce byte-identical frames.

Scale ladder mirrors TESTDATA.md tiers:
  sf0.001 → 100 convs (~6k turns), sf0.01 → 1,000 (~60k), sf0.1 → 10,000 (~600k).

Skew: Zipf(a=1.5) turns-per-conversation truncated to [2, 200] plus exactly one
hot conversation holding ~10% of all rows — exercises salted aggregation and
AQE skew handling (BASELINE.json:6,14).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

SEED = 42
# Last full day of the 90-day start window — the drift-injected partition
# (dense at every sf; identical across generation chunks).
import datetime as _dt

DRIFT_DATE = _dt.date(2024, 3, 30)
# Bump when generated CONTENT changes: materialize() stamps this into the
# _SUCCESS marker and regenerates cached fixture dirs written by older code.
FIXTURE_VERSION = "3"
N_CONVS = {"0.001": 100, "0.01": 1_000, "0.1": 10_000}
ROLES_CYCLE = ["user", "assistant", "tool"]
VOCAB = np.array(
    [
        "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel",
        "india", "juliet", "kilo", "lima", "mike", "november", "oscar", "papa",
        "quebec", "romeo", "sierra", "tango", "uniform", "victor", "whiskey",
        "xray", "yankee", "zulu", "amber", "birch", "cedar", "dune", "ember",
        "fjord", "grove", "heath", "isle", "jade", "knoll", "lagoon", "mesa",
        "nook", "oasis", "pine", "quarry", "ridge", "slate", "tarn", "umber",
        "vale", "wharf", "zephyr",
    ]
)

# Injection rates (FIXTURES.md §1) — rule_id → rate.
INJECTION_RATES = {
    "text_required": 0.005,
    "text_nonempty": 0.002,
    "role_enum": 0.002,
    "turn_idx_range": 0.001,
    "uniq_conv_turn": 0.002,
    "tool_ref": 0.003,  # of tool rows
    "ts_monotone": 0.002,  # of conversations
}


def gen_tools_dim() -> pd.DataFrame:
    cats = ["search", "code", "math", "io"]
    return pd.DataFrame(
        {
            "tool_name": [f"tool_{i:02d}" for i in range(50)],
            "category": [cats[i % 4] for i in range(50)],
        }
    )


def _gen_texts(rng: np.random.Generator, n: int) -> np.ndarray:
    """Token sequences from the 50-word vocab, length ~ lognormal(4.0, 0.6) chars."""
    lengths = np.clip(rng.lognormal(4.0, 0.6, n).astype(np.int64), 5, 2000)
    n_words = lengths // 6 + 1
    flat = rng.integers(0, len(VOCAB), int(n_words.sum()))
    bounds = np.cumsum(n_words)[:-1]
    return np.array([" ".join(VOCAB[w]) for w in np.split(flat, bounds)], dtype=object)


def gen_clean_transcripts(sf: str = "0.01", seed: int = SEED, conv_offset: int = 0) -> pd.DataFrame:
    """Clean (violation-free) transcripts at the given scale factor.

    ``seed``/``conv_offset`` support chunked generation of very large
    fixtures: each chunk draws from its own stream and owns a disjoint
    conv_id range, so chunks can be generated in parallel processes and
    written into one dataset root."""
    rng = np.random.default_rng(seed)
    n_convs = N_CONVS[sf]

    # Turns per conversation: Zipf(1.5)×8 truncated to [2, 200] → mean ≈ 57, so
    # total rows ≈ 60 × n_convs after the hot conversation is added (matches the
    # TESTDATA.md tier row counts). One hot conversation gets ~10% of all rows.
    turns = np.clip(rng.zipf(1.5, n_convs) * 8, 2, 200)
    base_total = int(turns.sum())
    hot_turns = max(int(base_total / 9), 201)  # ≈10% of final total, beyond the cap
    turns[0] = hot_turns
    total = int(turns.sum())

    conv_ord = np.repeat(np.arange(conv_offset, conv_offset + n_convs), turns)
    conv_id = np.char.add("c", np.char.zfill(conv_ord.astype(str), 8))
    turn_idx = np.concatenate([np.arange(t) for t in turns]).astype(np.int32)

    # Roles: 'system' only at turn 0; afterwards cycle user/assistant with every
    # 5th turn a 'tool' turn.
    role = np.where(
        turn_idx == 0,
        "system",
        np.where(turn_idx % 5 == 0, "tool", np.where(turn_idx % 2 == 1, "user", "assistant")),
    ).astype(object)

    text = _gen_texts(rng, total)

    tools = gen_tools_dim()["tool_name"].to_numpy()
    tool = np.where(role == "tool", tools[rng.integers(0, len(tools), total)], None)

    # ts: conversation start uniform in [2024-01-01, 2024-03-31), per-turn
    # exponential increments (mean 30 s), microsecond precision, UTC.
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    span_us = int(90 * 86400 * 1e6)
    starts = rng.integers(0, span_us, n_convs)
    incr = rng.exponential(30_000_000, total).astype(np.int64)  # µs
    # The hot conversation must stay INSIDE the 90-day window: at 30 s/turn a
    # conversation holding 10% of sf4's rows would trail ~2.4 years past the
    # window, manufacturing thousands of near-empty date partitions — a shape
    # no real daily-partitioned table has (at 10^12 turns dates get DENSER,
    # not more numerous; date count is bounded by calendar time). Pin its
    # start to the window start and scale its increment mean so it spans the
    # whole window at every sf (same per-date density profile across scales).
    starts[0] = 0
    incr[:hot_turns] = rng.exponential(span_us / hot_turns, hot_turns).astype(np.int64)
    # cumulative within each conversation: offset[i] = Σ incr over turns (first..i]
    cum = np.cumsum(incr)
    conv_first = np.concatenate([[0], np.cumsum(turns)[:-1]])
    offsets = cum - np.repeat(cum[conv_first], turns)
    base = np.repeat(starts, turns)
    ts = t0 + (base + offsets).astype("timedelta64[us]")

    df = pd.DataFrame(
        {
            "conv_id": conv_id.astype(object),
            "turn_idx": turn_idx,
            "role": role,
            "text": text,
            "tool": tool,
            "ts": pd.Series(ts).astype("datetime64[us]"),
        }
    )
    df["part_date"] = df["ts"].dt.date
    return df


def inject_violations(df: pd.DataFrame, sf: str = "0.01", seed: int = SEED) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Corrupt a seeded subset of rows; return (dirty_df, injected_manifest).

    The manifest records (conv_id, turn_idx, rule_id) for every injected row so
    tests can assert injected ⊆ detected. The authoritative expected set is
    recomputed by the in-repo pandas oracle (tests/oracle.py), which handles
    interactions between injections.
    """
    rng = np.random.default_rng(seed + 1)
    df = df.copy()
    n = len(df)
    records: list[tuple[str, int, str]] = []

    def pick(rate: float, mask: np.ndarray | None = None) -> np.ndarray:
        idx = np.arange(n) if mask is None else np.flatnonzero(mask)
        k = max(1, int(round(len(idx) * rate))) if len(idx) else 0
        return rng.choice(idx, size=min(k, len(idx)), replace=False) if k else np.array([], int)

    taken = np.zeros(n, dtype=bool)  # avoid stacking injections on one row

    def claim(rate: float, mask: np.ndarray | None = None) -> np.ndarray:
        base = ~taken if mask is None else (mask & ~taken)
        idx = pick(rate, base)
        taken[idx] = True
        return idx

    i = claim(INJECTION_RATES["text_required"])
    df.loc[i, "text"] = None
    records += [(df.at[j, "conv_id"], int(df.at[j, "turn_idx"]), "text_required") for j in i]

    i = claim(INJECTION_RATES["text_nonempty"])
    df.loc[i, "text"] = ""
    records += [(df.at[j, "conv_id"], int(df.at[j, "turn_idx"]), "text_nonempty") for j in i]

    i = claim(INJECTION_RATES["role_enum"])
    bad_roles = np.where(rng.integers(0, 2, len(i)) == 0, "robot", "USER")
    df.loc[i, "role"] = bad_roles
    records += [(df.at[j, "conv_id"], int(df.at[j, "turn_idx"]), "role_enum") for j in i]

    i = claim(INJECTION_RATES["turn_idx_range"], (df["turn_idx"] > 0).to_numpy())
    df.loc[i, "turn_idx"] = -1
    records += [(df.at[j, "conv_id"], -1, "turn_idx_range") for j in i]

    i = claim(INJECTION_RATES["tool_ref"], df["tool"].notna().to_numpy())
    df.loc[i, "tool"] = [f"ghost_tool_{k}" for k in range(len(i))]
    records += [(df.at[j, "conv_id"], int(df.at[j, "turn_idx"]), "tool_ref") for j in i]

    # ts_monotone: swap ts of two adjacent turns in a sample of conversations.
    # One groupby pass for per-conv row positions — a full-frame scan per
    # sampled conversation is O(k·n) and takes an hour at sf4 (~25M rows).
    convs = df["conv_id"].unique()
    k = max(1, int(round(len(convs) * INJECTION_RATES["ts_monotone"])))
    conv_pos = df.groupby("conv_id", sort=False).indices
    turn_arr = df["turn_idx"].to_numpy()
    for cid in rng.choice(convs, size=k, replace=False):
        cand = conv_pos[cid]
        cand = cand[~taken[cand]]
        rows = cand[np.argsort(turn_arr[cand], kind="stable")]
        if len(rows) < 3:
            continue
        a, b = int(rows[1]), int(rows[2])
        df.loc[[a, b], "ts"] = df.loc[[b, a], "ts"].to_numpy()
        # mark BOTH swapped rows taken: without this the uniqueness pick
        # below can duplicate a swap-affected row, stacking injections and
        # making the detection order of the tied violating turn seed-lucky
        taken[a] = taken[b] = True
        records.append((cid, int(df.at[b, "turn_idx"]), "ts_monotone"))

    # uniq_conv_turn: duplicate existing rows.
    i = pick(INJECTION_RATES["uniq_conv_turn"], ~taken)
    dupes = df.loc[i].copy()
    records += [(r.conv_id, int(r.turn_idx), "uniq_conv_turn") for r in dupes.itertuples()]
    df = pd.concat([df, dupes], ignore_index=True)

    # text_len_drift: the DRIFT_DATE partition gets 3× text length (KS/PSI must
    # flag that partition, all others pass). Pinned to the last FULL day of the
    # start window, not max(part_date): conversations trail past the window by
    # up to ~turns×30 s, so the calendar-max date is a ragged tail with ~1 row
    # — below any statistically honest KS gate — and under chunked generation
    # each chunk would otherwise drift its own (different) max date.
    m = (df["part_date"] == DRIFT_DATE) & df["text"].notna()
    df.loc[m, "text"] = df.loc[m, "text"] * 3

    manifest = pd.DataFrame(records, columns=["conv_id", "turn_idx", "rule_id"]).sort_values(
        ["conv_id", "turn_idx", "rule_id"], ignore_index=True
    )
    return df, manifest


def materialize(sf: str, outdir: str, seed: int = SEED, conv_offset: int = 0, chunk: str | None = None) -> str:
    """Write transcripts (Hive-partitioned by part_date), tools_dim, and the
    injected-violations manifest under ``outdir``. Idempotent via a _SUCCESS marker.

    ``chunk`` names one slice of a larger fixture: chunks share ``outdir``
    (their files accumulate in the same part_date=… dirs), own disjoint
    conv_id ranges via ``conv_offset``, and draw from per-chunk seeds — so a
    100M-turn fixture generates as N parallel bounded-memory processes
    (tools/gen_chunks.py)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    done = os.path.join(outdir, f"_SUCCESS_{chunk}" if chunk else "_SUCCESS")
    if os.path.exists(done):
        with open(done) as f:
            if f.read().strip() == FIXTURE_VERSION:
                return outdir
        # stale generator version: the dataset layout may differ (e.g. the
        # part_date range), and write_to_dataset APPENDS — regenerating on top
        # would mix versions. Wipe (single-process mode) or make the caller do
        # it (chunked: concurrent chunk processes share outdir; an automatic
        # wipe here would race a sibling chunk's in-flight write).
        if chunk:
            raise RuntimeError(
                f"{outdir} was generated by an older fixture version; delete it "
                "and re-run tools/gen_chunks.py"
            )
        import shutil

        shutil.rmtree(outdir, ignore_errors=True)
    os.makedirs(outdir, exist_ok=True)
    clean = gen_clean_transcripts(sf, seed=seed, conv_offset=conv_offset)
    dirty, manifest = inject_violations(clean, sf, seed=seed)
    dirty = dirty.sort_values(["part_date", "conv_id", "turn_idx"], ignore_index=True)

    table = pa.Table.from_pandas(dirty, preserve_index=False)
    pq.write_to_dataset(
        table,
        root_path=os.path.join(outdir, "transcripts"),
        partition_cols=["part_date"],
        basename_template=(f"{chunk}-" if chunk else "") + "part-{i}.parquet",
    )
    # concurrent chunk processes (tools/gen_chunks.py) share one outdir: EVERY
    # chunk writes the (identical) dim atomically via tmp+rename — concurrent
    # identical os.replace calls are safe, a reader can never observe a torn
    # file, and regenerating a single non-zero chunk into a fresh outdir still
    # produces a complete fixture (a chunk-0-only write left it dim-less).
    dim_tmp = os.path.join(outdir, f".tools_dim.{os.getpid()}.tmp")
    gen_tools_dim().to_parquet(dim_tmp, index=False)
    os.replace(dim_tmp, os.path.join(outdir, "tools_dim.parquet"))
    manifest.to_parquet(
        os.path.join(outdir, f"injected_violations{'_' + chunk if chunk else ''}.parquet"), index=False
    )
    with open(done, "w") as f:
        f.write(FIXTURE_VERSION)
    return outdir
