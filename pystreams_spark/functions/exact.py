"""Engine-exact rounded averages — the integer-scaled half-up contract.

``ROUND(AVG(x), d)`` over raw doubles is the one aggregate where two
correct engines legitimately disagree: floating summation order can
land the average exactly on a half at digit ``d`` on one engine and a
hair off it on the other (the r9 ``novelty_budget_selection`` mismatch,
re-confirmed at sf0.1 by the r11 parity sweep on
``resample_user_purchases_daily``). The contract removes the class:
values that are exact multiples of ``10^-d`` (exact integers, cents,
pre-``ROUND(x, d)`` scores) are scaled to integers, summed exactly, and
the average is rounded half-up in pure integer arithmetic —
``(2·Σ + N) div (2·N)`` — so no float ever decides a digit.

Overflow posture (the r11 ADVICE finding): the Spark-side sum
accumulates in DECIMAL(38,0), not BIGINT — a BIGINT sum of micros
wraps silently in non-ANSI mode once ``2·Σ`` passes 2^63 (reachable
around sf≈50 for whole-table money sums), while DuckDB's SUM(BIGINT)
already widens to HUGEINT (int128) and raises rather than wraps. With
DECIMAL(38,0) both engines carry ≥38 digits of headroom; the final
``div`` result is an average in scaled units, which fits BIGINT for
any value the per-value ``CAST(... AS BIGINT)`` admitted in the first
place.

Sign convention: ``div`` (Spark) and integral ``//`` (DuckDB BIGINT /
HUGEINT) both truncate toward zero, so for negative sums the contract
is "half toward zero" — cross-engine identical, which is the property
the oracle gate needs. NULL-safe: empty groups return NULL (count
guard), never a div-by-zero.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "avg_round_half_up",
    "avg_round_half_up_sql",
    "np_round_half_away_scaled",
    "np_trunc_div",
    "quantized_threshold",
    "sum_exact_scaled",
    "sum_exact_scaled_sql",
    "sum_round_half_up",
    "sum_round_half_up_sql",
]


def quantized_threshold(threshold: float, scale: int) -> int:
    """Smallest integer ``q`` with ``q/scale >= threshold`` under IEEE
    double division — the EXACT integer form of the float predicate
    ``score >= threshold`` over scores quantized to ``q/scale``. A
    naive ``round(threshold*scale)`` is wrong twice over: Python's
    round is half-to-EVEN, and for off-grid thresholds the correct cut
    is ceil-like, not nearest (``threshold=0.125, scale=100`` must cut
    at 13, not 12). The float-product seed can be off by an ulp either
    way (0.2·1e6 = 200000.00000000003), so the seed is corrected by
    direct comparison against the actual quotient doubles."""
    q = int(round(threshold * scale))
    while q / scale < threshold:
        q += 1
    while (q - 1) / scale >= threshold:
        q -= 1
    return q


def np_round_half_away_scaled(m, scale: int):
    """``CAST(ROUND(m * scale) AS BIGINT)`` with the SQL engines'
    half-AWAY-from-zero rule, vectorized for numpy — ``np.round`` is
    half-to-EVEN, which silently disagrees with Spark's
    BigDecimal-HALF_UP and DuckDB's std::round exactly on the half
    cases this module exists to pin down. Exact for ``|m·scale| <
    2^52``: the product is the identical IEEE multiply both engines
    perform, ``x - trunc(x)`` is exact there, and the half comparison
    is exact."""
    import numpy as np

    x = m * float(scale)
    r = np.trunc(x)
    frac = x - r
    r = r + (frac >= 0.5) - (frac <= -0.5)
    return r.astype(np.int64)


def np_trunc_div(num, den):
    """Integer division truncating toward zero on int64 arrays —
    numpy's ``//`` floors, but Spark's ``div`` and DuckDB's integral
    ``//`` truncate; for negative numerators the two differ by one."""
    q = num // den
    return q + ((num % den != 0) & ((num < 0) != (den < 0)))


def avg_round_half_up(col: str, digits: int = 6) -> Column:
    """Spark Column: engine-exact ``ROUND(AVG(col), digits)`` for values
    that are exact multiples of ``10^-digits``. ``col`` is a SQL
    fragment (column name or expression)."""
    s = 10 ** int(digits)
    return F.expr(
        f"case when count({col}) > 0 then "
        f"cast((2 * sum(cast(round({col} * {s}) as decimal(38,0)))"
        f" + count({col})) div (2 * count({col})) as double)"
        f" / {s}.0 end"
    )


def sum_exact_scaled(col: str, digits: int = 2) -> Column:
    """Spark Column: engine-exact ``ROUND(SUM(col), digits)`` for values
    on the ``10^-digits`` grid (cents, pre-rounded scores) — the SUM
    sibling of the average contract (r12). ``ROUND(SUM(raw double))``
    is order-dependent: a naive per-partition float sum of N cents
    values carries error that grows with N (random-walk ~√N·ulp(Σ)),
    crossing the half-cent grid around N·mean ≈ 1e13 — i.e. whole-table
    money sums at roughly sf ≥ 100, exactly the scale this engine
    targets. Quantize-before-sum makes the reported digit a pure
    integer function of the data: identical on any partitioning, any
    engine, any scale the DECIMAL(38,0) accumulator admits. For values
    OFF the grid (irrational math sums) this is a deliberate contract
    change — the sum of per-value-quantized terms — which is the
    deterministic form an oracle can certify (same reasoning as the
    Lloyd centroid contract). Per-value exactness bound: |col·10^d| <
    2^52. NULL semantics match ROUND(SUM(...)): empty/all-NULL → NULL.
    """
    s = 10 ** int(digits)
    return F.expr(
        f"cast(sum(cast(round(({col}) * {s}) as decimal(38,0))) as double)"
        f" / {s}.0"
    )


def sum_exact_scaled_sql(col: str, digits: int = 2) -> str:
    """DuckDB SQL fragment equivalent of :func:`sum_exact_scaled`
    (per-value BIGINT cast; DuckDB's SUM widens to HUGEINT natively;
    HUGEINT→DOUBLE and Spark Decimal→Double are both correctly rounded,
    so the final quotient is the identical double)."""
    s = 10 ** int(digits)
    return (
        f"CAST(SUM(CAST(ROUND(({col}) * {s}) AS BIGINT)) AS DOUBLE)"
        f" / {s}.0"
    )


def sum_round_half_up(col: str, value_digits: int, digits: int) -> Column:
    """Spark Column: engine-exact ``ROUND(SUM(col), digits)`` where the
    values sit on a FINER grid than the output (e.g. 4dp-exact
    discounted prices reported at cents): quantize per value at
    ``value_digits`` (exact), sum in DECIMAL(38,0), then round the
    integer quotient with the single-arg scaled rule — ``ROUND(x)`` of
    the identical double is engine-exact (ties are dyadic ``k.5``
    doubles, rounded away on both engines), unlike two-arg ROUND whose
    internal scaling paths differ. Requires ``value_digits >= digits``.
    """
    v, d = int(value_digits), int(digits)
    if v < d:
        raise ValueError(f"sum_round_half_up: value_digits {v} < digits {d}")
    sv, down, sd = 10 ** v, 10 ** (v - d), 10 ** d
    # the final cast keeps the quotient DOUBLE — a bare bigint/100.0
    # would promote to DECIMAL under Spark's decimal-literal rule
    return F.expr(
        f"cast(cast(round(cast(sum(cast(round(({col}) * {sv})"
        f" as decimal(38,0))) as double) / {down}) as bigint) as double)"
        f" / {sd}.0"
    )


def sum_round_half_up_sql(col: str, value_digits: int, digits: int) -> str:
    """DuckDB SQL fragment equivalent of :func:`sum_round_half_up`."""
    v, d = int(value_digits), int(digits)
    if v < d:
        raise ValueError(
            f"sum_round_half_up_sql: value_digits {v} < digits {d}"
        )
    sv, down, sd = 10 ** v, 10 ** (v - d), 10 ** d
    return (
        f"CAST(ROUND(CAST(SUM(CAST(ROUND(({col}) * {sv}) AS BIGINT))"
        f" AS DOUBLE) / {down}) AS BIGINT) / {sd}.0"
    )


def avg_round_half_up_sql(col: str, digits: int = 6) -> str:
    """DuckDB SQL fragment equivalent of :func:`avg_round_half_up`.

    The per-value cast stays BIGINT (a single value's scaled form fits
    easily); the SUM widens to HUGEINT natively, so the numerator is
    exact to 128 bits and ``//`` on HUGEINT truncates toward zero
    exactly like Spark's ``div``.
    """
    s = 10 ** int(digits)
    return (
        f"CASE WHEN COUNT({col}) > 0 THEN "
        f"CAST((2 * SUM(CAST(ROUND({col} * {s}) AS BIGINT))"
        f" + COUNT({col})) // (2 * COUNT({col})) AS DOUBLE)"
        f" / {s}.0 END"
    )
