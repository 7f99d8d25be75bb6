"""Stats block vs exact pandas computations (SURVEY.md §2.3 rows 23-26)."""

import os

import pandas as pd
import pytest

from lyra_spark.stats import column_stats, hll_sketches, length_histogram, merge_hll


@pytest.fixture(scope="module")
def tdf(spark, fixtures_sf0001):
    return spark.read.parquet(os.path.join(fixtures_sf0001, "transcripts"))


@pytest.fixture(scope="module")
def pdf(fixtures_sf0001):
    df = pd.read_parquet(os.path.join(fixtures_sf0001, "transcripts"))
    df["part_date"] = pd.to_datetime(df["part_date"].astype(str)).dt.date
    return df


def test_null_rate_min_max_exact(tdf, pdf):
    got = column_stats(tdf, ["text", "tool", "turn_idx"], partition_col=None).toPandas().set_index("column")
    assert got.loc["text", "null_rate"] == pytest.approx(pdf["text"].isna().mean())
    assert got.loc["tool", "null_rate"] == pytest.approx(pdf["tool"].isna().mean())
    assert got.loc["turn_idx", "min_value"] == str(pdf["turn_idx"].min())
    assert got.loc["turn_idx", "max_value"] == str(pdf["turn_idx"].max())
    assert int(got.loc["text", "row_count"]) == len(pdf)


def test_approx_distinct_within_rsd(tdf, pdf):
    got = column_stats(tdf, ["conv_id"], partition_col=None).toPandas().iloc[0]
    exact = pdf["conv_id"].nunique()
    assert abs(got["approx_distinct"] - exact) / exact < 0.10  # 2× the 5% rsd


def test_length_histogram_matches_exact(tdf, pdf):
    got = (
        length_histogram(tdf, "text", bucket_width=50, partition_col=None)
        .toPandas()
        .set_index("bucket")["count"]
        .sort_index()
    )
    exact = (pdf["text"].dropna().str.len() // 50).value_counts().sort_index()
    assert got.to_dict() == {int(k): int(v) for k, v in exact.items()}


def test_hll_sketch_merge_matches_direct(tdf, pdf):
    """Merging per-partition sketches ≈ direct estimate ≈ exact (mergeability)."""
    per_part = hll_sketches(tdf, ["conv_id"], partition_col="part_date")
    merged = merge_hll(per_part).toPandas().iloc[0]
    exact = pdf["conv_id"].nunique()
    assert abs(merged["estimate"] - exact) / exact < 0.10


def test_per_partition_stats_grouping(tdf, pdf):
    got = column_stats(tdf, ["text"], partition_col="part_date").toPandas()
    assert len(got) == pdf["part_date"].nunique()
    assert int(got["row_count"].sum()) == len(pdf)
