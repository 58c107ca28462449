"""Pure-Python tail probabilities for the CSV-audit driver-side verdicts.

The reference grades its hypothesis checks with scipy p-values
(checks/hypothesis_checks.py, cross_column_checks.py); scipy is not in
this environment, so the classical special-function routines are
implemented here directly — regularized incomplete beta (continued
fraction, Lentz's method) and regularized incomplete gamma (series +
continued fraction), from the public formulas in Abramowitz & Stegun
§6.2/§26 and the standard numerical literature.  Each agrees with scipy
to ~1e-12 over the ranges audits produce (pinned in tests/test_statsx.py).

Everything here runs on a HANDFUL of driver-side aggregates (a t
statistic, a chi-square, an F ratio) — never per row — so pure Python is
the right tool; the heavy lifting stayed in the Spark aggregation passes.
"""

from __future__ import annotations

import math

_EPS = 3e-16
_FPMIN = 1e-300


def norm_cdf(z: float) -> float:
    """Standard normal CDF via the C-library erfc (exact to double)."""
    return 0.5 * math.erfc(-z / math.sqrt(2.0))


def norm_sf(z: float) -> float:
    return 0.5 * math.erfc(z / math.sqrt(2.0))


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (Lentz's method)."""
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < _FPMIN:
        d = _FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, 300):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = 1.0 + aa / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = 1.0 + aa / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < _EPS:
            break
    return h


def betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_bt = (math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
             + a * math.log(x) + b * math.log1p(-x))
    bt = math.exp(ln_bt)
    if x < (a + 1.0) / (a + b + 2.0):
        return bt * _betacf(a, b, x) / a
    return 1.0 - bt * _betacf(b, a, 1.0 - x) / b


def gammainc_upper(s: float, x: float) -> float:
    """Regularized upper incomplete gamma Q(s, x)."""
    if x < 0.0 or s <= 0.0:
        return 1.0
    if x == 0.0:
        return 1.0
    if x < s + 1.0:
        # series for P(s, x), return 1 - P
        term = 1.0 / s
        total = term
        ap = s
        for _ in range(500):
            ap += 1.0
            term *= x / ap
            total += term
            if abs(term) < abs(total) * _EPS:
                break
        p = total * math.exp(-x + s * math.log(x) - math.lgamma(s))
        return max(0.0, 1.0 - p)
    # continued fraction for Q directly
    b = x + 1.0 - s
    c = 1.0 / _FPMIN
    d = 1.0 / b
    h = d
    for i in range(1, 500):
        an = -i * (i - s)
        b += 2.0
        d = an * d + b
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = b + an / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < _EPS:
            break
    return h * math.exp(-x + s * math.log(x) - math.lgamma(s))


def t_sf(t: float, df: float) -> float:
    """P(T_df > t), one-sided."""
    if df <= 0:
        return float("nan")
    x = df / (df + t * t)
    p = 0.5 * betainc(df / 2.0, 0.5, x)
    return p if t >= 0 else 1.0 - p


def t_two_sided(t: float, df: float) -> float:
    return min(1.0, 2.0 * t_sf(abs(t), df))


def chi2_sf(x: float, k: float) -> float:
    """P(chi2_k > x)."""
    if x <= 0:
        return 1.0
    return gammainc_upper(k / 2.0, x / 2.0)


def f_sf(w: float, d1: float, d2: float) -> float:
    """P(F_{d1,d2} > w)."""
    if w <= 0:
        return 1.0
    return betainc(d2 / 2.0, d1 / 2.0, d2 / (d2 + d1 * w))


def ks_sf(lam: float) -> float:
    """Asymptotic Kolmogorov survival Q_KS(lambda) = 2 sum (-1)^{k-1}
    exp(-2 k^2 lambda^2) (the scipy kstwobign tail)."""
    if lam <= 0:
        return 1.0
    total = 0.0
    for k in range(1, 101):
        term = 2.0 * (-1.0) ** (k - 1) * math.exp(-2.0 * k * k * lam * lam)
        total += term
        if abs(term) < 1e-16:
            break
    return min(1.0, max(0.0, total))


def ks_1sample_p(d: float, n: int) -> float:
    """Asymptotic p for a 1-sample KS distance (Stephens' effective-n
    correction lambda = D (sqrt(n) + 0.12 + 0.11/sqrt(n)))."""
    if n <= 0:
        return 1.0
    rn = math.sqrt(n)
    return ks_sf(d * (rn + 0.12 + 0.11 / rn))


def ks_2sample_p(d: float, n1: int, n2: int) -> float:
    if n1 <= 0 or n2 <= 0:
        return 1.0
    ne = n1 * n2 / (n1 + n2)
    rn = math.sqrt(ne)
    return ks_sf(d * (rn + 0.12 + 0.11 / rn))


def welch(n1, m1, v1, n2, m2, v2):
    """(t, df, p_two_sided) for Welch's unequal-variance t-test from
    per-group aggregates; (nan, nan, 1.0) when either group degenerates."""
    if (not n1 or not n2 or n1 < 2 or n2 < 2
            or v1 is None or v2 is None):
        return float("nan"), float("nan"), 1.0
    se2 = v1 / n1 + v2 / n2
    if se2 <= 0:
        return float("nan"), float("nan"), 1.0
    t = (m1 - m2) / math.sqrt(se2)
    df = se2 * se2 / ((v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1))
    return t, df, t_two_sided(t, df)


def bartlett_2(n1, v1, n2, v2):
    """(stat, p) Bartlett's test for two groups from per-group sample
    variances (chi2 with 1 dof)."""
    if n1 < 2 or n2 < 2 or not v1 or not v2 or v1 <= 0 or v2 <= 0:
        return float("nan"), 1.0
    n = n1 + n2
    sp2 = ((n1 - 1) * v1 + (n2 - 1) * v2) / (n - 2)
    stat = ((n - 2) * math.log(sp2)
            - (n1 - 1) * math.log(v1) - (n2 - 1) * math.log(v2))
    corr = 1.0 + (1.0 / (n1 - 1) + 1.0 / (n2 - 1) - 1.0 / (n - 2)) / 3.0
    stat /= corr
    return stat, chi2_sf(max(stat, 0.0), 1.0)


def levene_2(n1, zbar1, zvar1, n2, zbar2, zvar2):
    """(W, p) Brown-Forsythe/Levene for two groups from aggregates of
    z = |x - median(group)| (center='median', the reference's choice);
    F with (1, N-2) dof."""
    if n1 < 2 or n2 < 2 or zvar1 is None or zvar2 is None:
        return float("nan"), 1.0
    n = n1 + n2
    zbar = (n1 * zbar1 + n2 * zbar2) / n
    num = (n - 2) * (n1 * (zbar1 - zbar) ** 2 + n2 * (zbar2 - zbar) ** 2)
    den = (n1 - 1) * zvar1 + (n2 - 1) * zvar2
    if den <= 0:
        return float("nan"), 1.0
    w = num / den
    return w, f_sf(w, 1.0, n - 2)


def pearson_p(r: float, n: int) -> float:
    """Two-sided p for a Pearson correlation via the exact t transform."""
    if n < 3 or r is None or abs(r) >= 1.0:
        return 0.0 if (r is not None and abs(r) >= 1.0 and n >= 3) else 1.0
    t = r * math.sqrt((n - 2) / (1.0 - r * r))
    return t_two_sided(t, n - 2)


def chi2_contingency(table: list[list[float]]):
    """(chi2, p, dof, cramers_v) from a 2-D contingency list — the
    driver-side finish for a collected (bounded) crosstab."""
    rows = [r for r in table if sum(r) > 0]
    if not rows:
        return 0.0, 1.0, 0, 0.0
    ncol = len(rows[0])
    col_tot = [sum(r[j] for r in rows) for j in range(ncol)]
    keep = [j for j in range(ncol) if col_tot[j] > 0]
    rows = [[r[j] for j in keep] for r in rows]
    col_tot = [col_tot[j] for j in keep]
    n = sum(col_tot)
    if len(rows) < 2 or len(col_tot) < 2 or n <= 0:
        return 0.0, 1.0, 0, 0.0
    row_tot = [sum(r) for r in rows]
    chi2 = 0.0
    for i, r in enumerate(rows):
        for j, obs in enumerate(r):
            exp = row_tot[i] * col_tot[j] / n
            if exp > 0:
                chi2 += (obs - exp) ** 2 / exp
    dof = (len(rows) - 1) * (len(col_tot) - 1)
    min_dim = min(len(rows), len(col_tot)) - 1
    v = math.sqrt(chi2 / (n * min_dim)) if min_dim > 0 else 0.0
    return chi2, chi2_sf(chi2, dof), dof, v
