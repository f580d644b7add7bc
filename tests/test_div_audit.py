"""The truncating-DIV sweep (SCALE.md r10) as a RATCHET: the audit's
residual list (divisors not provably safe by pattern) may only
shrink. A new query dividing by a data-dependent quantity must either
NULLIF-guard it on both engines (the 'guarded' class) or match a
structurally-safe pattern — otherwise this test fails and points at
tools/div_audit.py's output."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
    ),
)

import div_audit as DA  # noqa: E402

# the r10 sweep's classified counts (SCALE.md "Truncating-DIV sweep"):
# every residual site was proven >= 1 structurally and recorded there.
R10_RESIDUAL = 175


def test_residual_is_a_ratchet():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hits = DA.sweep(
        os.path.join(repo, "series_tiempo_ar_scraping_spark", "queries*.py")
    )
    residual = [h for h in hits if h[0] == "RESIDUAL"]
    assert len(residual) <= R10_RESIDUAL, (
        f"{len(residual)} residual DIV sites (r10 baseline "
        f"{R10_RESIDUAL}): a new data-dependent divisor was added "
        "without a NULLIF guard or a recorded structural proof — run "
        "python tools/div_audit.py and fix or document the new sites, "
        "then lower this baseline"
    )


def test_classifier_patterns():
    c = DA.classify
    assert c("1000000") == "literal"
    assert c("(1 << 20)") == "literal"
    assert c("{_HLL_M}") == "fstring"
    assert c("NULLIF(qty, 0)") == "guarded"
    assert c("(2 * NULLIF(tp + fp, 0))") == "guarded"
    assert c("COUNT(*)") == "count_star"
    assert c("(COUNT(*) * COUNT(*))") == "count_star"
    assert c("GREATEST(d, 1)") == "greatest_floor"
    assert c("greatest(SUM(x), 1)") == "greatest_floor"
    assert c("qty") is None  # data-dependent: residual
    assert c("SUM(inv)") is None


def test_divisor_extraction_balances_parens():
    s = "SELECT a // NULLIF(SUM(b + c), 0) AS x FROM t"
    pos = s.index("//") + 2
    assert DA.divisor_after(s, pos) == "NULLIF(SUM(b + c), 0)"
    s2 = "a DIV (n * n - s) AS k"
    pos2 = s2.index("DIV") + 3
    assert DA.divisor_after(s2, pos2) == "(n * n - s)"
