"""Vendored pure-numpy t-digest (merging variant).

Public-knowledge algorithm: Dunning & Ertl, "Computing Extremely Accurate
Quantiles Using t-Digests" (arXiv:1902.04023). Centroids are (mean, weight)
pairs kept small by the k1 scale function k(q) = (δ/2π)·asin(2q−1), which
bounds centroid weight by the local quantile density — tight tails, coarse
middle. Digests are associative/commutative under merge, so they form the
leaf→partition→global combiner tree BASELINE.json:6 mandates, with only
~O(δ) floats ever crossing an exchange.

No external deps (sandbox has no t-digest package); numpy only.
"""

from __future__ import annotations

import io

import numpy as np

_MAGIC = b"TD01"


class TDigest:
    __slots__ = ("means", "weights", "delta", "_min", "_max")

    def __init__(
        self,
        means: np.ndarray | None = None,
        weights: np.ndarray | None = None,
        delta: int = 100,
        vmin: float = np.inf,
        vmax: float = -np.inf,
    ):
        self.means = np.asarray(means if means is not None else [], dtype=np.float64)
        self.weights = np.asarray(weights if weights is not None else [], dtype=np.float64)
        self.delta = int(delta)
        # default bounds with non-empty centroids would silently invert
        # quantiles (quantile(0) = +inf): derive them from the means
        if self.means.size and not (vmin <= vmax):
            vmin, vmax = float(self.means.min()), float(self.means.max())
        self._min = float(vmin)
        self._max = float(vmax)

    # --- construction -----------------------------------------------------
    @classmethod
    def from_values(cls, values, delta: int = 100) -> "TDigest":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return cls(delta=delta)
        d = cls(v, np.ones_like(v), delta, float(v.min()), float(v.max()))
        d._compress()
        return d

    def merge(self, other: "TDigest") -> "TDigest":
        if other.size == 0:
            return self.copy()
        if self.size == 0:
            return other.copy()
        out = TDigest(
            np.concatenate([self.means, other.means]),
            np.concatenate([self.weights, other.weights]),
            max(self.delta, other.delta),
            min(self._min, other._min),
            max(self._max, other._max),
        )
        out._compress()
        return out

    def copy(self) -> "TDigest":
        return TDigest(self.means.copy(), self.weights.copy(), self.delta, self._min, self._max)

    @property
    def size(self) -> float:
        return float(self.weights.sum()) if self.weights.size else 0.0

    # --- scale function (k1) ------------------------------------------------
    def _k(self, q: float) -> float:
        return self.delta / (2 * np.pi) * np.arcsin(2 * min(max(q, 0.0), 1.0) - 1)

    def _k_inv(self, k: float) -> float:
        return (np.sin(k * 2 * np.pi / self.delta) + 1) / 2

    def _compress(self) -> None:
        # Vectorized k-limit clustering: the classic per-VALUE accumulation
        # loop is O(rows) interpreted Python — the exact per-row-Python
        # anti-pattern the engine bans from its hot path, and from_values
        # runs inside every Arrow batch of the drift sketcher. Instead we
        # iterate per OUTPUT CENTROID (≤ ~delta iterations): each cluster is
        # the sorted run whose cumulative weight stays within the k-limit,
        # found by one searchsorted over the weight cumsum; its mean is the
        # exact weighted mean from prefix sums. Same clustering rule as the
        # sequential form (cluster boundaries can shift by float-boundary
        # ulps; all consumers gate on tolerances, SEMANTICS.md decision 43).
        if self.means.size <= 1:
            return
        order = np.argsort(self.means, kind="mergesort")
        means, weights = self.means[order], self.weights[order]
        total = weights.sum()
        cumw = np.cumsum(weights)
        sums = np.cumsum(means * weights)
        out_m: list[float] = []
        out_w: list[float] = []
        acc = 0.0  # weight fully emitted so far
        i = 0
        n = means.size
        while i < n:
            q_limit = self._k_inv(self._k(acc / total) + 1.0)
            j = int(np.searchsorted(cumw, q_limit * total, side="right"))
            if j <= i:
                j = i + 1  # a cluster always takes at least its first element
            w = cumw[j - 1] - (cumw[i - 1] if i else 0.0)
            sm = sums[j - 1] - (sums[i - 1] if i else 0.0)
            out_m.append(sm / w)
            out_w.append(w)
            acc += w
            i = j
        self.means = np.asarray(out_m)
        self.weights = np.asarray(out_w)

    # --- queries ------------------------------------------------------------
    def cdf(self, x) -> np.ndarray:
        """P(X ≤ x), linear interpolation between centroid midpoints."""
        x = np.atleast_1d(np.asarray(x, dtype=np.float64))
        if self.means.size == 0:
            return np.full(x.shape, np.nan)
        total = self.weights.sum()
        # cumulative weight at centroid centers
        cum = np.cumsum(self.weights) - self.weights / 2
        xs = np.concatenate([[self._min], self.means, [self._max]])
        ys = np.concatenate([[0.0], cum / total, [1.0]])
        # ensure monotone xs for interp (min/max may equal first/last mean)
        order = np.argsort(xs, kind="mergesort")
        return np.interp(x, xs[order], ys[order], left=0.0, right=1.0)

    def quantile(self, q) -> np.ndarray:
        q = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if self.means.size == 0:
            return np.full(q.shape, np.nan)
        total = self.weights.sum()
        cum = np.cumsum(self.weights) - self.weights / 2
        xs = np.concatenate([[0.0], cum / total, [1.0]])
        ys = np.concatenate([[self._min], self.means, [self._max]])
        return np.interp(q, xs, ys)

    # --- serialization (BinaryType blobs across the wire) --------------------
    def to_bytes(self) -> bytes:
        buf = io.BytesIO()
        buf.write(_MAGIC)
        header = np.array([self.delta, self.means.size], dtype=np.int64)
        buf.write(header.tobytes())
        buf.write(np.array([self._min, self._max], dtype=np.float64).tobytes())
        buf.write(self.means.astype(np.float64).tobytes())
        buf.write(self.weights.astype(np.float64).tobytes())
        return buf.getvalue()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "TDigest":
        if blob[:4] != _MAGIC:
            raise ValueError("not a TDigest blob")
        delta, n = np.frombuffer(blob, dtype=np.int64, count=2, offset=4)
        off = 4 + 16
        vmin, vmax = np.frombuffer(blob, dtype=np.float64, count=2, offset=off)
        off += 16
        means = np.frombuffer(blob, dtype=np.float64, count=int(n), offset=off).copy()
        off += int(n) * 8
        weights = np.frombuffer(blob, dtype=np.float64, count=int(n), offset=off).copy()
        return cls(means, weights, int(delta), float(vmin), float(vmax))


def merge_all(digests: list[TDigest]) -> TDigest:
    """Pairwise tree reduction (order-stable) of a list of digests."""
    if not digests:
        return TDigest()
    layer = list(digests)
    while len(layer) > 1:
        nxt = [layer[i].merge(layer[i + 1]) if i + 1 < len(layer) else layer[i] for i in range(0, len(layer), 2)]
        layer = nxt
    return layer[0]
