"""Lint-style guard (SURVEY.md §4): BASELINE.json:15 forbids per-row Python.

No `F.udf(` / `@udf` row-at-a-time UDFs and no RDD `.map(`/`.flatMap(` in the
engine; pandas/Arrow UDFs and mapInPandas/applyInPandas are the only Python
crossings allowed."""

import os
import re

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "lyra_spark")

FORBIDDEN = [
    (re.compile(r"\bF\.udf\("), "row-at-a-time F.udf"),
    (re.compile(r"@udf\b"), "row-at-a-time @udf"),
    (re.compile(r"\.rdd\.(map|flatMap|mapPartitions)\("), "RDD map in engine"),
    (re.compile(r"\.toPandas\(\)"), "driver-side collect of big data in engine code"),
    (re.compile(r"\.collect\(\)\s*$"), None),  # checked below with allowlist
]

# collect() is legitimate only on tiny frames (sketch blobs, partition lists,
# small-dimension value lists inlined as enum literals in fused.py)
COLLECT_ALLOWED = {"drift.py", "io.py", "fused.py"}


def _sources():
    for root, _, files in os.walk(PKG):
        for fn in files:
            if fn.endswith(".py"):
                yield fn, os.path.join(root, fn)


def test_no_per_row_python_in_engine():
    offenders = []
    for fn, path in _sources():
        src = open(path).read()
        for pat, label in FORBIDDEN[:4]:
            if pat.search(src):
                offenders.append((fn, label))
    assert not offenders, offenders


def test_collect_only_on_small_frames():
    offenders = []
    for fn, path in _sources():
        src = open(path).read()
        if ".collect()" in src and fn not in COLLECT_ALLOWED:
            offenders.append(fn)
    assert not offenders, f"collect() outside allowlist: {offenders}"
