"""Distributed PCA via sufficient statistics + fixed-round power iteration.

The 100 TB shape: the only data-sized work is ONE pass computing the
second-moment sufficient statistics — per-dimension sums and the d×d
cross-moment matrix — as DECIMAL partial aggregates (map-side combine
makes the shuffle O(partitions · d²), independent of row count). The
d×d covariance is then assembled DRIVER-SIDE (d=64 → 4 KB; even
d=4096 → 128 MB of floats is bounded and row-count-free), and the top
components come from a fixed number of power-iteration rounds with
deflation — O(iters · d²) driver flops, no data involvement. Scoring
is a map-only projection with the component vectors folded into
whole-stage codegen as literals (same trick as
`operators/projection.py`): zero shuffles, zero broadcasts.

Cross-engine exactness (the repo's DuckDB-oracle discipline):

- moment sums are DECIMAL(38,10) — order-free, so Spark's shuffle
  order and DuckDB's scan order cannot disagree; products are
  `round(x·y, 10)` first (engine HALF_UP) so the double→decimal snap
  is unambiguous in both engines;
- every covariance entry, iteration vector, and eigenvalue is
  quantized (`round(·, 10)` / `round(·, 9)`) after each step, so
  float drift cannot accumulate across the fixed `iters` rounds;
- all dot products are ORDERED folds: Python `acc += x·y` here,
  `F.aggregate(zip_with(...), 0.0, +)` in the scoring plan, and
  `list_dot_product` over `list(... ORDER BY dim)` in the oracle —
  verified bit-identical (no FMA contraction / reassociation).

Plain power iteration converges at rate (λ₂/λ₁)^t — hopeless on the
near-degenerate spectra of real embedding covariances (λ₂/λ₁ ≈ 0.93 on
the test corpus → ~200 rounds). Instead the matrix is POWERED first:
`squarings` scaled squarings turn the ratio into (λ₂/λ₁)^(2^s)
(0.93³² ≈ 0.10 at s=5), after which a handful of rounds converge to
~1e-8. Each squaring rescales by the max-abs entry so repeated
squaring cannot underflow the quantization grid. Squaring is O(d³)
driver flops on a d×d float matrix — data-size-free. The result is
DEFINED operationally as "`squarings` scaled squarings + `rounds`
power rounds from the all-ones start", which both engines replicate
exactly, so parity never depends on convergence; closeness to numpy's
`eigh` on the same covariance is pinned in tests/test_pca.py.

Reference parity note: the reference normalizes features driver-side
with sklearn-style scalers before its Keras scoring
(proto_data_analysis.py:700-740); this module is the corresponding
dimensionality-reduction step re-expressed as a Spark sufficient-
statistics plan rather than a single-node fit.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _round_engine(x: float, nd: int) -> float:
    """HALF_UP on the exact binary double — Spark/DuckDB `round()`
    semantics (Python's builtin round is half-even and disagrees)."""
    return float(Decimal(x).quantize(Decimal(f"1e-{nd}"), rounding=ROUND_HALF_UP))


def _fold_dot(a: list[float], b: list[float]) -> float:
    """Ordered sequential dot — the Python twin of DuckDB's
    `list_dot_product` and Spark's `F.aggregate(zip_with(·), 0.0, +)`
    (all three verified bit-identical on doubles)."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def moment_frames(
    emb: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> tuple[DataFrame, DataFrame]:
    """(marginal, cross-moment) sufficient-statistic frames.

    marginal: (i, s DECIMAL(38,10), n)        — d rows
    cross:    (i, j, s DECIMAL(38,10)), i ≤ j — d(d+1)/2 rows

    One scan feeds both aggregates; the double posexplode generates
    n·d(d+1)/2 product rows (UPPER TRIANGLE only — the moment matrix is
    symmetric, so the lower half is mirrored driver-side for free) and
    they partial-aggregate map-side, so the shuffle carries only
    `shuffle_partitions · d²/2` decimal cells. i, j are 1-based to
    match the oracle's `generate_series(1, d)`.
    """
    e1 = emb.select(
        F.col(vec_col).alias("_v"),
        F.posexplode(F.col(vec_col)).alias("i0", "_xi"),
    ).select(
        F.col("_v"),
        (F.col("i0") + 1).alias("i"),
        F.col("_xi").cast("double").alias("xi"),
    )
    marginal = e1.groupBy("i").agg(
        F.sum(F.col("xi").cast("decimal(38,10)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    e2 = (
        e1.select("i", "xi", F.posexplode(F.col("_v")).alias("j0", "_xj"))
        .filter(F.col("j0") + 1 >= F.col("i"))
        .select(
            "i",
            (F.col("j0") + 1).alias("j"),
            # quantize the product BEFORE the decimal snap so both
            # engines land on the same 1e-10 grid point (round is
            # HALF_UP in both)
            F.round(F.col("xi") * F.col("_xj").cast("double"), 10)
            .cast("decimal(38,10)")
            .alias("p"),
        )
    )
    cross = e2.groupBy("i", "j").agg(F.sum("p").alias("s"))
    return marginal, cross


def fit_pca(
    emb: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    n_components: int = 2,
    squarings: int = 5,
    rounds: int = 8,
) -> dict:
    """Fit means + top components from one sufficient-statistics pass.

    Returns {"means": [d], "components": [[d]·k], "eigenvalues": [k],
    "trace": float, "n": int}. The collect is BOUNDED: d + d² rows of
    decimals (data-size-free), the documented exception to the
    no-collect rule (same class as k-means centroids / packing offsets).
    """
    marginal, cross = moment_frames(emb, vec_col, dim)
    return fit_from_moments(
        marginal,
        cross,
        dim=dim,
        n_components=n_components,
        squarings=squarings,
        rounds=rounds,
    )


def combine_moments(
    a: tuple[DataFrame, DataFrame], b: tuple[DataFrame, DataFrame]
) -> tuple[DataFrame, DataFrame]:
    """Merge two (marginal, cross) sufficient-statistic pairs — the
    incremental-fit primitive. Decimal sums are EXACTLY associative
    (every product was grid-snapped before summation), so
    fit_from_moments(combine(moments(A), moments(B))) is bit-identical
    to fit_pca(A ∪ B) — pinned in tests/test_pca.py. This is how a
    100 TB corpus PCA absorbs a daily delta: moments of the delta (one
    scan of the delta only) folded into the stored corpus moments
    (d + d² persisted decimals)."""
    ma, ca = a
    mb, cb = b
    marginal = (
        ma.unionByName(mb)
        .groupBy("i")
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
    )
    cross = (
        ca.unionByName(cb)
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
    )
    return marginal, cross


def fit_from_moments(
    marginal: DataFrame,
    cross: DataFrame,
    dim: int = 64,
    n_components: int = 2,
    squarings: int = 5,
    rounds: int = 8,
) -> dict:
    """The driver half of `fit_pca`: collect the bounded moment frames
    and eigensolve. Exposed so incremental pipelines can feed merged /
    persisted moments (see `combine_moments`)."""
    marg_rows = {r["i"]: r for r in marginal.collect()}
    if not marg_rows:
        raise ValueError("fit_pca: empty input")
    n = marg_rows[1]["n"]
    s = {i: float(marg_rows[i]["s"]) for i in marg_rows}
    # upper triangle from the frame, lower mirrored (exact symmetry)
    mom = {(r["i"], r["j"]): float(r["s"]) for r in cross.collect()}
    # covariance, entrywise-quantized exactly as the oracle's
    # round((s_ij - s_i*s_j/n)/n, 10); s_i·s_j multiplied in (i,j)
    # index order on BOTH triangles so mirrored entries stay identical
    cov = [
        [
            _round_engine(
                (
                    mom[(min(i, j), max(i, j))]
                    - s[min(i, j)] * s[max(i, j)] / n
                )
                / n,
                10,
            )
            for j in range(1, dim + 1)
        ]
        for i in range(1, dim + 1)
    ]
    means = [s[i] / n for i in range(1, dim + 1)]
    trace = 0.0
    for i in range(dim):
        trace += cov[i][i]

    components: list[list[float]] = []
    eigenvalues: list[float] = []
    work = cov
    for _ in range(n_components):
        v, lam = _top_component(work, squarings, rounds)
        components.append(v)
        eigenvalues.append(lam)
        # Hotelling deflation on the quantized grid — mirrors the
        # oracle's round(c - λ·v_min·v_max, 10). Multiplying in
        # canonical (min,max) index order keeps the matrix EXACTLY
        # symmetric (float (λ·vᵢ)·vⱼ ≠ (λ·vⱼ)·vᵢ in the last ulp),
        # which `_scaled_square`'s row-dot identity requires.
        work = [
            [
                _round_engine(
                    work[i][j]
                    - lam * v[min(i, j)] * v[max(i, j)],
                    10,
                )
                for j in range(dim)
            ]
            for i in range(dim)
        ]
    return {
        "means": means,
        "components": components,
        "eigenvalues": eigenvalues,
        "trace": trace,
        "n": n,
    }


def _scaled_square(a: list[list[float]]) -> list[list[float]]:
    """A ← round(A²/‖A²‖_maxabs, 10), exploiting that every matrix in
    the chain is EXACTLY symmetric (see below): (A²)ᵢⱼ = rowᵢ·rowⱼ, an
    ORDERED fold the oracle replays verbatim as
    `list_dot_product(a.cr, b.cr)` — no order-free decimal machinery
    needed, and the driver math is plain float (O(d³/2) flops).
    Rescaling by the max-abs entry keeps repeated squaring from
    underflowing the 10-dp grid (λ^(2^s) → 0 otherwise).

    Symmetry is exact by construction at every step: the covariance is
    built from symmetric decimal moment sums; rowᵢ·rowⱼ runs the SAME
    product sequence as rowⱼ·rowᵢ (commutative multiplies in the same
    k order); rescale/round are entrywise; deflation multiplies in
    canonical (min,max) index order (`fit_pca`)."""
    d = len(a)
    raw = [[0.0] * d for _ in range(d)]
    for i in range(d):
        for j in range(i, d):
            raw[i][j] = raw[j][i] = _fold_dot(a[i], a[j])
    scale = max(abs(x) for row in raw for x in row)
    if scale == 0.0:
        return raw  # zero matrix stays zero
    return [[_round_engine(x / scale, 10) for x in row] for row in raw]


def _top_component(
    cov: list[list[float]], squarings: int, rounds: int
) -> tuple[list[float], float]:
    """Dominant eigenvector of `cov` via matrix powering: `squarings`
    scaled squarings sharpen the eigengap to (λ₂/λ₁)^(2^s), then
    `rounds` power rounds from all-ones with per-round round(·, 9)
    quantization. λ is the Rayleigh quotient vᵀ·C·v on the ORIGINAL
    covariance (ordered folds). Returns (unit-ish vector, λ)."""
    d = len(cov)
    powered = cov
    for _ in range(squarings):
        powered = _scaled_square(powered)
    v = [1.0] * d
    for _ in range(rounds):
        u = [_fold_dot(row, v) for row in powered]
        nm = math.sqrt(_fold_dot(u, u))
        if nm == 0.0:  # degenerate (zero-variance) input
            return [0.0] * d, 0.0
        v = [_round_engine(x / nm, 9) for x in u]
    w = [_fold_dot(row, v) for row in cov]
    return v, _round_engine(_fold_dot(v, w), 9)


def pca_scores(
    emb: DataFrame,
    fit: dict,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Map-only projection onto the fitted components: (id, pc1..pck).

    The mean and component vectors are codegen LITERAL arrays — the
    executors never see the fit as data; the plan is a pure projection
    with zero exchanges (pinned in tests/test_pca.py)."""
    mu = F.array(*[F.lit(m) for m in fit["means"]])
    centered = F.zip_with(
        F.col(vec_col), mu, lambda x, m: x.cast("double") - m
    )
    cols: list[Column] = [F.col(id_col)]
    for c, vec in enumerate(fit["components"], 1):
        vv = F.array(*[F.lit(x) for x in vec])
        prod = F.zip_with(centered, vv, lambda a, b: a * b)
        cols.append(
            F.round(
                F.aggregate(prod, F.lit(0.0), lambda a, x: a + x), round_to
            ).alias(f"pc{c}")
        )
    return emb.select(*cols)


def components_frame(spark, fit: dict, round_to: int = 6) -> DataFrame:
    """The fit as a small table: (component, dim, loading, eigenvalue,
    explained_ratio) — k·d rows, driver-built by construction (the fit
    itself is driver-resident sufficient-statistics output)."""
    trace = fit["trace"]
    rows = []
    for c, (vec, lam) in enumerate(
        zip(fit["components"], fit["eigenvalues"]), 1
    ):
        ratio = _round_engine(lam / trace, round_to) if trace else 0.0
        for d, x in enumerate(vec):
            rows.append((c, d, _round_engine(x, round_to), _round_engine(lam, round_to), ratio))
    return spark.createDataFrame(
        rows,
        "component bigint, dim bigint, loading double, eigenvalue double, explained_ratio double",
    )
