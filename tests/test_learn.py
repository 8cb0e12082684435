"""Distributed logistic regression: exactness and learning behavior.
Cross-engine parity of the full training loop is covered by
tests/test_oracle_parity.py::pipe_quality_logreg; these pin the operator
semantics themselves."""

from __future__ import annotations

import pyspark.sql.functions as F

from yat_geo_db_spark.pipelines.learn import logreg_fit_history, logreg_score


def _toy(spark, n_parts):
    # linearly separable in x1: y = 1 iff x1 > 0.5
    rows = [
        (i, 1.0, (i % 100) / 100.0, ((i * 7) % 100) / 100.0,
         1.0 if (i % 100) / 100.0 > 0.5 else 0.0)
        for i in range(400)
    ]
    return spark.createDataFrame(
        rows, "id long, bias double, x1 double, x2 double, y double"
    ).repartition(n_parts)


def test_logreg_learns_separable_boundary(spark):
    hist = logreg_fit_history(
        _toy(spark, 4), ["bias", "x1", "x2"], "y", n_iter=8, lr=4.0
    )
    # loss decreases overall, accuracy beats the 0.51 majority floor
    assert hist[-1]["loss"] < hist[0]["loss"]
    assert hist[-1]["acc"] > 0.8
    # the separating feature carries the dominant positive weight
    w = hist[-1]["weights"]
    assert w[1] > 0 and abs(w[1]) > abs(w[2])


def test_logreg_weights_partition_invariant(spark):
    """The exact fixed-point gradient sums make fitted weights BIT-equal
    across partitionings — the property that lets the oracle reproduce
    the loop (float sums would drift with partition order)."""
    h3 = logreg_fit_history(_toy(spark, 3), ["bias", "x1", "x2"], "y", n_iter=4)
    h11 = logreg_fit_history(_toy(spark, 11), ["bias", "x1", "x2"], "y", n_iter=4)
    for a, b in zip(h3, h11):
        assert a["weights"] == b["weights"]  # exact, not approx
        assert a["loss"] == b["loss"] and a["acc"] == b["acc"]


def test_logreg_score_matches_training_probabilities(spark):
    df = _toy(spark, 2)
    hist = logreg_fit_history(df, ["bias", "x1", "x2"], "y", n_iter=2, lr=1.0)
    scored = logreg_score(df, ["bias", "x1", "x2"], hist[-1]["weights"])
    out = scored.select("y", "p").collect()
    assert all(0.0 <= r["p"] <= 1.0 for r in out)
    # scoring with the fitted weights reproduces the accuracy the NEXT
    # iteration would report (same margin fold, same rounding)
    hist3 = logreg_fit_history(df, ["bias", "x1", "x2"], "y", n_iter=3, lr=1.0)
    acc = (
        scored.select(
            F.round(
                F.sum(
                    (((F.col("p") >= 0.5) & (F.col("y") == 1.0))
                     | ((F.col("p") < 0.5) & (F.col("y") == 0.0))).cast("long")
                ) / F.count(F.lit(1)),
                6,
            ).alias("acc")
        ).collect()[0]["acc"]
    )
    assert acc == hist3[-1]["acc"]


def test_grouped_ols_matches_numpy(spark):
    """grouped_ols per-group parameters must match a NumPy least-squares
    fit of the same points (to rounding), with degenerate groups mapped
    to NULLs, not division artifacts: single-point and zero-x-variance
    groups have no slope; constant-y groups fit slope 0 with undefined
    (NULL) r2."""
    import random

    import numpy as np

    from yat_geo_db_spark.pipelines.learn import grouped_ols

    rng = random.Random(3)
    rows = []
    for g in range(4):
        for i in range(50):
            x = float(i)
            y = 2.5 * g * x - 7.0 + rng.uniform(-5, 5)
            rows.append((g, x, round(y, 3)))
    rows.append((90, 1.0, 5.0))                # n == 1
    rows += [(91, 2.0, float(v)) for v in (1, 9, 4)]   # zero x-variance
    rows += [(92, float(i), 3.0) for i in range(5)]    # constant y

    df = spark.createDataFrame(rows, "g long, x double, y double")
    got = {
        r["g"]: (r["n"], r["slope"], r["intercept"], r["r2"])
        for r in grouped_ols(df, ["g"], "x", "y").collect()
    }

    for g in range(4):
        pts = [(x, y) for gg, x, y in rows if gg == g]
        xs = np.array([p[0] for p in pts])
        ys = np.array([p[1] for p in pts])
        m, b = np.polyfit(xs, ys, 1)
        r = np.corrcoef(xs, ys)[0, 1] ** 2
        n, slope, intercept, r2 = got[g]
        assert n == 50
        assert abs(slope - m) < 1e-4
        assert abs(intercept - b) < 1e-3
        assert abs(r2 - r) < 1e-4

    assert got[90] == (1, None, None, None)
    assert got[91] == (3, None, None, None)
    n, slope, intercept, r2 = got[92]
    assert (n, slope, intercept, r2) == (5, 0.0, 3.0, None)


def test_calibration_curve_perfect_and_biased(spark):
    """A perfectly calibrated synthetic score (pos_rate == score in each
    bin) must show ~zero gap; an always-overconfident score must show a
    negative gap; score=1.0 clamps into the top bin."""
    import pyspark.sql.functions as F
    from yat_geo_db_spark.pipelines.learn import calibration_curve

    # bin k holds 20 rows with score k/10 + 0.05 and exactly
    # round(20 * (k/10 + 0.05)) positives → observed == predicted
    rows = []
    for k in range(10):
        s = k / 10 + 0.05
        n_pos = round(20 * s)
        for i in range(20):
            rows.append((s, 1 if i < n_pos else 0))
    rows.append((1.0, 1))  # exact 1.0 must land in bin 9
    df = spark.createDataFrame(rows, "score double, label int")
    out = {r["bin"]: r for r in calibration_curve(df, "score", "label").collect()}
    assert set(out) == set(range(10))
    assert out[9]["n"] == 21
    for k in range(9):
        assert abs(out[k]["gap"]) <= 0.05  # exact-count rounding only
    over = spark.createDataFrame(
        [(0.95, 0)] * 50, "score double, label int"
    )
    g = calibration_curve(over, "score", "label").collect()[0]
    assert g["bin"] == 9 and g["pos_rate"] == 0.0 and g["gap"] == -0.95


def test_auc_golden_cases(spark):
    """Perfect separation -> 1.0; reversed -> 0.0; all tied -> 0.5;
    sklearn-style tie case computed by hand; empty class -> NULL."""
    from yat_geo_db_spark.pipelines.learn import auc_score

    def auc_of(rows):
        df = spark.createDataFrame(rows, "score double, label int")
        return auc_score(df, "score", "label").collect()[0]

    perfect = [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)]
    assert auc_of(perfect)["auc"] == 1.0
    reversed_ = [(s, 1 - y) for s, y in perfect]
    assert auc_of(reversed_)["auc"] == 0.0
    tied = [(0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0)]
    assert auc_of(tied)["auc"] == 0.5
    # hand case: pos scores {0.8, 0.5}, neg {0.5, 0.3}
    # pairs: (0.8 vs 0.5)=1, (0.8 vs 0.3)=1, (0.5 vs 0.5)=0.5,
    # (0.5 vs 0.3)=1 -> 3.5/4
    mixed = [(0.8, 1), (0.5, 1), (0.5, 0), (0.3, 0)]
    assert auc_of(mixed)["auc"] == 0.875
    one_class = [(0.8, 1), (0.5, 1)]
    row = auc_of(one_class)
    assert row["auc"] is None and row["n_neg"] == 0


def test_cusum_changepoint_localizes_shift(spark):
    """A mid-stream mean shift must peak at (or adjacent to) the shift
    boundary; a constant series must score exactly 0."""
    from yat_geo_db_spark.pipelines.learn import cusum_changepoint

    rows = [("shift", i, 10.0 if i < 50 else 20.0) for i in range(100)]
    rows += [("flat", i, 7.0) for i in range(100)]
    df = spark.createDataFrame(rows, "src string, i long, x double")
    got = {
        r["src"]: r
        for r in cusum_changepoint(df, ["src"], "i", "x").collect()
    }
    # CUSUM of a clean step peaks exactly at the last pre-shift index
    assert got["shift"]["peak_at"] == 49
    assert got["shift"]["peak_cusum"] == 250.0  # 50 * |10 - 15|
    assert got["flat"]["peak_cusum"] == 0.0
    assert got["flat"]["n"] == 100


def test_cusum_timestamp_order_and_auc_null_scores(spark):
    """Review regressions: cusum_changepoint must accept a TIMESTAMP
    order column (the natural arrival order); auc_score must exclude
    NULL scores rather than inherit engine-defined NULL ordering."""
    import datetime as dt

    import pyspark.sql.functions as F
    from yat_geo_db_spark.pipelines.learn import auc_score, cusum_changepoint

    rows = [
        ("s", dt.datetime(2024, 1, 1, 0, 0, i), 10.0 if i < 5 else 20.0)
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "src string, ts timestamp, x double")
    got = cusum_changepoint(df, ["src"], "ts", "x").collect()[0]
    assert got["peak_at"] == dt.datetime(2024, 1, 1, 0, 0, 4)
    assert got["peak_cusum"] == 25.0

    scored = spark.createDataFrame(
        [(0.9, 1), (0.1, 0), (None, 1), (None, 0)],
        "score double, label int",
    )
    row = auc_score(scored, "score", "label").collect()[0]
    assert (row["n_pos"], row["n_neg"], row["auc"]) == (1, 1, 1.0)


def test_cuped_reduces_variance_preserves_effect(spark):
    """With a covariate that strongly predicts the metric, CUPED must
    cut variance substantially while leaving the between-variant mean
    GAP essentially unchanged (the whole point: tighter CIs, unbiased
    effect); with a useless covariate theta ≈ 0 and nothing changes."""
    import random

    from yat_geo_db_spark.pipelines.learn import cuped_adjusted_means

    rng = random.Random(7)
    rows = []
    for u in range(400):
        variant = u % 2
        x = rng.gauss(50, 10)            # pre-period covariate
        noise = rng.gauss(0, 2)
        y = x + (1.0 if variant else 0.0) + noise  # true lift = 1.0
        rows.append((variant, x, y))
    df = spark.createDataFrame(rows, "variant int, x double, y double")
    got = {r["variant"]: r for r in cuped_adjusted_means(df, "variant", "x", "y").collect()}
    raw_gap = got[1]["mean_raw"] - got[0]["mean_raw"]
    adj_gap = got[1]["mean_adj"] - got[0]["mean_adj"]
    assert abs(adj_gap - 1.0) < 0.5
    assert abs(adj_gap - raw_gap) < 1.5
    assert got[0]["var_reduction"] > 0.9  # x explains ~96% of var(y)

    useless = df.withColumn("x", F.lit(7.0))
    g2 = cuped_adjusted_means(useless, "variant", "x", "y").collect()[0]
    assert g2["theta"] == 0.0 and abs(g2["var_reduction"]) < 1e-6


def test_kaplan_meier_textbook_example(spark):
    """Classic KM hand case: durations (event) = 1(d),2(c),3(d),4(d),5(c)
    → S(1)=4/5, S(3)=4/5·2/3, S(4)=4/5·2/3·1/2; censored rows shrink the
    risk set but emit no curve step; an everyone-dies final time pins
    survival to exactly 0."""
    from yat_geo_db_spark.pipelines.learn import kaplan_meier

    df = spark.createDataFrame(
        [(1, 1), (2, 0), (3, 1), (4, 1), (5, 0)], "t long, e int"
    )
    got = {r["t"]: r for r in kaplan_meier(df, "t", "e").collect()}
    assert set(got) == {1, 3, 4}
    assert abs(got[1]["survival"] - 0.8) < 1e-5
    assert abs(got[3]["survival"] - 0.8 * (2 / 3)) < 1e-5
    assert abs(got[4]["survival"] - 0.8 * (2 / 3) * 0.5) < 1e-5
    assert got[1]["n_risk"] == 5 and got[3]["n_risk"] == 3

    total = spark.createDataFrame([(1, 1), (2, 1)], "t long, e int")
    g2 = {r["t"]: r["survival"] for r in kaplan_meier(total, "t", "e").collect()}
    assert g2[2] == 0.0 and abs(g2[1] - 0.5) < 1e-5


def test_bootstrap_ci_covers_and_narrows(spark):
    """The bootstrap CI must straddle both the sample mean and (on a
    well-behaved sample) the true mean; quadrupling the data must
    NARROW the interval (the 1/√n contract); the draw is replayable
    (identical CI on a second call)."""
    from yat_geo_db_spark.pipelines.learn import bootstrap_mean_ci

    rows = [(i, float(100 + (i * 7919) % 41)) for i in range(500)]
    small = spark.createDataFrame(rows, "doc_id long, x double")
    big = spark.createDataFrame(
        [(i, float(100 + (i * 7919) % 41)) for i in range(2000)],
        "doc_id long, x double",
    )
    s1 = bootstrap_mean_ci(small, "x", "doc_id").collect()[0]
    s2 = bootstrap_mean_ci(small, "x", "doc_id").collect()[0]
    assert s1 == s2  # deterministic
    assert s1["ci_lo"] < s1["mean"] < s1["ci_hi"]
    # the congruence makes the true mean ~120; CI must cover it
    assert s1["ci_lo"] < 120.5 and s1["ci_hi"] > 119.5
    b = bootstrap_mean_ci(big, "x", "doc_id").collect()[0]
    assert (b["ci_hi"] - b["ci_lo"]) < (s1["ci_hi"] - s1["ci_lo"])
