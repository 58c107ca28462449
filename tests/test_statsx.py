"""Pin statsx special functions against independently-known values.

Reference values computed once from the standard distributions (R /
scipy on a dev box, published tables for the classics) — the audit's
p-value verdicts are only as honest as these tails.
"""

import math

from qualityspark import statsx as SX


def approx(a, b, tol=1e-6):
    assert abs(a - b) <= tol * max(1.0, abs(b)), (a, b)


def test_norm():
    approx(SX.norm_cdf(0.0), 0.5)
    approx(SX.norm_cdf(1.959963985), 0.975, 1e-8)
    approx(SX.norm_sf(3.0), 0.0013498980316301, 1e-9)


def test_t_distribution():
    # scipy.stats.t.sf(2.0, 10) = 0.03669402...
    approx(SX.t_sf(2.0, 10), 0.036694020, 1e-7)
    # symmetric
    approx(SX.t_sf(-2.0, 10), 1 - 0.036694020, 1e-7)
    # two-sided at the classic 5% critical value t=2.228, df=10
    approx(SX.t_two_sided(2.2281388519649385, 10), 0.05, 1e-7)
    # large df converges to normal
    approx(SX.t_two_sided(1.96, 1e7), 2 * SX.norm_sf(1.96), 1e-4)


def test_chi2():
    # classic table values: P(chi2_1 > 3.841458821) = 0.05
    approx(SX.chi2_sf(3.841458821, 1), 0.05, 1e-7)
    approx(SX.chi2_sf(5.991464547, 2), 0.05, 1e-7)
    approx(SX.chi2_sf(18.30703805, 10), 0.05, 1e-7)
    # exp(-x/2) closed form at dof 2
    approx(SX.chi2_sf(7.0, 2), math.exp(-3.5), 1e-10)


def test_f():
    # P(F_{1,10} > 4.964602744) = 0.05 ; F(1,d) = t(d)^2
    approx(SX.f_sf(4.964602744, 1, 10), 0.05, 1e-7)
    approx(SX.f_sf(2.0 ** 2, 1, 10), SX.t_two_sided(2.0, 10), 1e-10)


def test_ks():
    # scipy.special.kolmogorov(1.0) = 0.26999967...
    approx(SX.ks_sf(1.0), 0.2699996716773, 1e-9)
    approx(SX.ks_sf(0.5), 0.9639452436, 1e-7)
    assert SX.ks_sf(0.0) == 1.0


def test_welch_matches_textbook():
    # two groups, hand-checked with scipy.stats.ttest_ind(equal_var=False)
    # a = [1,2,3,4,5]; b = [3,5,7,9,11]: t=-2.447..., p=0.0459...
    t, df, p = SX.welch(5, 3.0, 2.5, 5, 7.0, 10.0)
    approx(t, -2.5298221281347035, 1e-9)
    approx(df, 5.882352941176471, 1e-9)   # 6.25 / 1.0625
    approx(p, 0.04546461897, 1e-6)


def test_bartlett_levene_chi2_contingency():
    stat, p = SX.bartlett_2(10, 4.0, 10, 4.0)
    approx(stat, 0.0, 1e-12)
    assert p == 1.0
    w, p = SX.levene_2(10, 2.0, 1.0, 10, 2.0, 1.0)
    approx(w, 0.0, 1e-12)
    assert p == 1.0
    # scipy.stats.chi2_contingency([[10, 20], [20, 10]], correction=False)
    chi2, p, dof, v = SX.chi2_contingency([[10, 20], [20, 10]])
    approx(chi2, 6.666666666, 1e-8)
    assert dof == 1
    approx(p, 0.009823274507519235, 1e-6)
    approx(v, math.sqrt(6.666666666 / 60), 1e-6)


def test_pearson_p():
    # scipy.stats.pearsonr exact-t equivalence: r=0.6, n=20
    # t = 0.6*sqrt(18/0.64) = 3.1819805, p = 2*t.sf(3.1819805, 18)
    approx(SX.pearson_p(0.6, 20), SX.t_two_sided(3.181980515339464, 18),
           1e-10)
    assert SX.pearson_p(None, 20) == 1.0
    assert SX.pearson_p(0.5, 2) == 1.0
