"""q_ab_chi2's staged division must stay EXACT through the old overflow zone.

r07 advice: the single-expression form 1000*n*(ad-bc)^2 div den silently
overflowed decimal(38,0) at ~1.7e7 users (worst-case numerator ~62.5*n^5)
despite a 1e8 guard. The staged form (chi2_from_cells) never materializes
that numerator; these cases drive it through the former silent-NULL window
and up to the new 6e9 ceiling, comparing against Python bignum arithmetic.
"""

from __future__ import annotations

import pytest
from hypothesis import assume, given, settings
from hypothesis import strategies as st

from iceberg_benchmark_poc_spark.queries.behavior import AB_CHI2_MAX_USERS, chi2_from_cells

# (a, b, c, d) = (v0_miss, v0_conv, v1_miss, v1_conv)
CASES = [
    (3, 5, 7, 11),
    # the advice's silent-NULL window: ~1.7e7..1e8 users, skewed
    (17_000_000, 1, 2, 17_000_000),
    (99_999_990, 3, 4, 2),
    (50_000_000, 25_000_000, 12_500_000, 12_500_000),
    # near the new ceiling, balanced (maximal den factors) and skewed
    (1_500_000_000, 1_500_000_000, 1_500_000_000, 1_499_999_999),
    (5_999_999_900, 37, 41, 19),
    (2_999_999_999, 1, 2_999_999_998, 2),
]


def _expected_milli(a: int, b: int, c: int, d: int) -> int:
    n = a + b + c + d
    diff = a * d - b * c
    den = (a + b) * (c + d) * (a + c) * (b + d)
    return (1000 * n * diff * diff) // den


@pytest.mark.parametrize("a,b,c,d", CASES)
def test_staged_chi2_exact(spark, a, b, c, d):
    assert a + b + c + d <= AB_CHI2_MAX_USERS
    cells = spark.sql(
        f"SELECT CAST({a} AS DECIMAL(38,0)) v0_miss, CAST({b} AS DECIMAL(38,0)) v0_conv,"
        f" CAST({c} AS DECIMAL(38,0)) v1_miss, CAST({d} AS DECIMAL(38,0)) v1_conv"
    )
    row = chi2_from_cells(cells).collect()[0]
    assert row["chi2_milli"] is not None, "staged form returned NULL — silent overflow"
    assert row["chi2_milli"] == _expected_milli(a, b, c, d)
    assert row["chi2_diff"] == a * d - b * c
    assert row["chi2_den1"] == (a + b) * (c + d)
    assert row["chi2_den2"] == (a + c) * (b + d)


@settings(max_examples=30, deadline=None)
@given(
    a=st.integers(0, 1_499_999_999),
    b=st.integers(0, 1_499_999_999),
    c=st.integers(0, 1_499_999_999),
    d=st.integers(0, 1_499_999_999),
)
def test_staged_chi2_matches_bignum_ground_truth(spark, a, b, c, d):
    """r8 verdict item 7: fuzz the staging identity, don't just boundary-test
    it. Any 2x2 table under the ceiling (with nonzero marginals, as the real
    query guarantees — every variant and every outcome is observed) must
    reproduce Python's arbitrary-precision (1000*n*diff^2) // (den1*den2)
    exactly; the staged form never materializes that ~5th-power numerator."""
    den = (a + b) * (c + d) * (a + c) * (b + d)
    assume(den != 0)
    cells = spark.sql(
        f"SELECT CAST({a} AS DECIMAL(38,0)) v0_miss, CAST({b} AS DECIMAL(38,0)) v0_conv,"
        f" CAST({c} AS DECIMAL(38,0)) v1_miss, CAST({d} AS DECIMAL(38,0)) v1_conv"
    )
    row = chi2_from_cells(cells).collect()[0]
    assert row["chi2_milli"] == _expected_milli(a, b, c, d)


def test_ceiling_guard_raises_loudly(spark):
    from py4j.protocol import Py4JJavaError

    over = AB_CHI2_MAX_USERS  # n = 4*over/4 > ceiling with these cells
    cells = spark.sql(
        f"SELECT CAST({over} AS DECIMAL(38,0)) v0_miss, CAST(1 AS DECIMAL(38,0)) v0_conv,"
        " CAST(1 AS DECIMAL(38,0)) v1_miss, CAST(1 AS DECIMAL(38,0)) v1_conv"
    )
    with pytest.raises((Py4JJavaError, Exception), match="q_ab_chi2"):
        chi2_from_cells(cells).collect()
