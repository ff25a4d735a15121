"""Cross-engine exact rounding device — decimal floor-division form (r12).

The repo's parity contract for every surfaced ratio is: round(num/den, k)
half-away-from-zero computed ENTIRELY in exact integer/decimal space, so
Spark and the DuckDB oracle can never disagree on a half boundary the way
round(double, k) does (Spark rounds the shortest decimal string HALF_UP,
DuckDB C-rounds the binary double — the r9 win_macd driver FAIL).

Through r11 the device was ``(2·10^k·|num| + den) DIV (2·den)`` on
decimal(38,0). Spark's ``DIV`` returns BIGINT, so the GRID VALUE
num·10^k/den silently wrapped past 2^63 (|num/den| ≈ 9.22e12 at k=6 —
hypothesis-found, boundary-pinned in tests/test_property.py). r12 replaces
the DIV with exact decimal floor division::

    q = (t - t % d) / d        -- t = 2·10^k·|num| + den,  d = 2·den

``t - t % d`` is exactly divisible by ``d``, so Spark's decimal divide
(result type decimal(38,6)) introduces NO rounding — the quotient IS the
floor, carried in decimal end to end. New domain: the grid value must fit
the 32 integer digits of decimal(38,6) (|num/den| < 10^26 at k=6, vs the
old 9.22e12), and overflow past that is LOUD (error under ANSI, NULL under
non-ANSI) instead of a silent wrap. DuckDB's side is unchanged: HUGEINT
``//`` on the same operands — both engines produce the same exact integer.

Property-tested against Decimal ROUND_HALF_UP including exact half
boundaries and past the old int64 boundary
(tests/test_property.py::test_integer_round_device_is_half_away_from_zero,
::test_integer_round_device_decimal_domain).

Caller contract (same as the old device): ``den_sql`` must evaluate > 0
and must already be decimal-typed wherever it contains multiplies that
could wrap int64 (write ``CAST(x AS DECIMAL(38,0)) * y``, never
``CAST(x * y AS DECIMAL(38,0))``). ``num_sql`` is widened to decimal
inside the device.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def floor_div_sql(num_sql: str, den_sql: str) -> str:
    """Exact floor division of two NON-NEGATIVE decimal SQL fragments.

    Returns a DECIMAL(38,0) fragment equal to floor(num/den). The
    subtraction makes the divide exact, so no rounding mode is ever
    consulted; the cast from the integer-valued decimal(38,6) quotient
    back to decimal(38,0) is exact.
    """
    t, d = f"({num_sql})", f"({den_sql})"
    return f"CAST((({t} - ({t} % {d})) / {d}) AS DECIMAL(38,0))"


def iround_grid_sql(
    num_sql: str, den_sql: str, k: int = 6, *, signed: bool = True
) -> str:
    """Grid value round(num/den, k)·10^k as a DECIMAL(38,0) SQL fragment.

    Sign-aware half-away-from-zero: the sign is extracted first, the
    floor-division runs on non-negative operands (where floor ≡ truncate ≡
    round-half-up after the +den/2 shift), then reapplied. ``signed=False``
    skips the CASE/abs for numerators that are provably ≥ 0 (cheaper and
    keeps the fragment short).
    """
    scale = 2 * 10**k
    if signed:
        t = f"{scale} * CAST(abs({num_sql}) AS DECIMAL(38,0)) + ({den_sql})"
        q = floor_div_sql(t, f"2 * ({den_sql})")
        return f"(CASE WHEN ({num_sql}) < 0 THEN -1 ELSE 1 END) * {q}"
    t = f"{scale} * CAST(({num_sql}) AS DECIMAL(38,0)) + ({den_sql})"
    return floor_div_sql(t, f"2 * ({den_sql})")


def iround_sql(num_sql: str, den_sql: str, k: int = 6, *, signed: bool = True) -> str:
    """round(num/den, k) half-away-from-zero as a DOUBLE SQL fragment.

    The grid integer is exact in decimal; the one cast to double at the
    end rounds to nearest-even identically on both engines (IEEE), so the
    surfaced double is bit-identical to DuckDB evaluating the same device
    with HUGEINT ``//``.
    """
    return f"(CAST({iround_grid_sql(num_sql, den_sql, k, signed=signed)} AS DOUBLE) / {10**k})"


def iround_col(num_sql: str, den_sql: str, k: int = 6, *, signed: bool = True) -> F.Column:
    """:func:`iround_sql` as a pyspark Column."""
    return F.expr(iround_sql(num_sql, den_sql, k, signed=signed))
