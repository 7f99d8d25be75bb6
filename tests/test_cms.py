"""Count-min sketch (sketch.cms): overestimate-only guarantee within the
e*N/width bound, exact merge semantics, parameter-mismatch rejection, and
the broadcast plan shape that keeps estimation cheap."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lyra_spark.sketch.cms import CMSketch, cms_build, cms_estimate, cms_merge
from test_plan_shapes import plan_str

DEPTH, WIDTH = 4, 128


def _zipf_df(spark, n=20_000, seed=5):
    rng = np.random.default_rng(seed)
    vals = rng.zipf(1.4, n) % 3000  # heavy head, long tail, cardinality ~2k
    pdf = pd.DataFrame({"v": vals.astype("int64")})
    pdf.loc[:49, "v"] = None  # planted NULLs must be excluded
    return spark.createDataFrame(pdf)


def test_cms_overestimates_within_bound(spark):
    df = _zipf_df(spark)
    sk = cms_build(df, "v", DEPTH, WIDTH)
    est = cms_estimate(sk, df.select("v"), "v")
    exact = df.filter("v is not null").groupBy(F.col("v").alias("value")).count()
    j = est.join(exact, "value").toPandas()
    n_total = int(j["count"].sum())
    over = j["estimate"] - j["count"]
    assert (over >= 0).all()  # CMS never undercounts — a hard guarantee
    # e*N/width holds per-query w.p. 1-e^-depth; the corpus is deterministic,
    # so this is a fixed fact about (data, seed), not a flaky draw
    assert (over <= math.e * n_total / WIDTH).all()
    # the sketch grid is bounded by depth*width rows no matter the input
    assert sk.grid.count() <= DEPTH * WIDTH


def test_cms_merge_equals_build_of_union_and_is_associative(spark):
    df = _zipf_df(spark)
    a = df.filter("v % 3 = 0")
    b = df.filter("v % 3 = 1")
    c = df.filter("v % 3 = 2")
    whole = cms_build(df.filter("v is not null"), "v", DEPTH, WIDTH)
    sa, sb, sc = (cms_build(x, "v", DEPTH, WIDTH) for x in (a, b, c))

    def as_map(s):
        return {(r.row, r.bucket): r.n for r in s.grid.collect()}

    merged = as_map(cms_merge(sa, sb, sc))
    assert merged == as_map(whole)
    assert merged == as_map(cms_merge(cms_merge(sa, sb), sc))
    assert merged == as_map(cms_merge(sc, cms_merge(sb, sa)))


def test_cms_parameter_mismatch_raises(spark):
    """Estimating or merging across different (depth, width) would silently
    break the >= guarantee (missing row index coalesces to 0 and wins the
    min) — the API must refuse, not garbage."""
    df = _zipf_df(spark, n=2_000)
    sk = cms_build(df, "v", DEPTH, WIDTH)
    other = cms_build(df, "v", DEPTH + 1, WIDTH)
    with pytest.raises(ValueError, match="different"):
        cms_merge(sk, other)
    with pytest.raises(ValueError, match="different"):
        cms_merge(sk, CMSketch(sk.grid, DEPTH, WIDTH * 2))


def test_cms_unseen_value_estimates_zero_or_collision(spark):
    df = _zipf_df(spark)
    sk = cms_build(df, "v", DEPTH, WIDTH)
    probe = spark.createDataFrame(pd.DataFrame({"v": [10**12, 10**12 + 7]}))
    rows = cms_estimate(sk, probe, "v").collect()
    n_total = df.filter("v is not null").count()
    for r in rows:
        assert 0 <= r.estimate <= math.e * n_total / WIDTH


def test_cms_estimate_plan_broadcasts_grid(spark):
    df = _zipf_df(spark)
    sk = cms_build(df, "v", DEPTH, WIDTH)
    p = plan_str(cms_estimate(sk, df.select("v"), "v"))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
