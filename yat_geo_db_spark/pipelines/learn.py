"""Distributed model fitting with engine-exact arithmetic.

The corpus-curation stack wants small learned models fit ON the cluster
(quality classifiers a la fasttext/DSIR, not imported ones). The fits here
follow the same discipline as `similarity.kmeans_fit`: every cross-row
reduction is an exact fixed-point sum (`relational.queries.dsum`), so the
fitted parameters are bit-stable across partitionings AND reproducible by
the DuckDB oracle, which unrolls the training loop as chained CTEs — the
training loop itself is hash-checked, not just the final predictions.

Scale shape of one logistic-regression iteration: one scan computing
per-row sigmoid + gradient contributions, ONE hash aggregation with
map-side partial combine reducing to a single k+3-column row (k = number
of features), one driver-side weight update of k doubles. No shuffle of
rows, no N×k explosion; iterations stream over the cached feature table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F

from yat_geo_db_spark.relational.queries import dsum

#: probability clamp keeping log-loss finite after 6-dp rounding
P_EPS = 1e-6


def sigmoid6(margin: Column) -> Column:
    """Sigmoid rounded to 6 dp. The rounding is load-bearing for
    cross-engine parity: libm exp() and java.lang.Math.exp() may differ
    in the last ulp, and a raw p would leak that into the gradient sums;
    6-dp rounding collapses both to the same value (a p landing within
    one ulp of a 0.5e-6 boundary is the measure-zero residual risk)."""
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-margin)), 6)


def logreg_fit_history(
    features: DataFrame,
    feature_cols: list[str],
    label_col: str,
    n_iter: int = 3,
    lr: float = 0.5,
) -> list[dict]:
    """Batch gradient-descent logistic regression from zero weights.
    Returns one dict per iteration: {"iter", "weights" (post-update),
    "loss", "acc"} — loss/accuracy are computed with the PRE-update
    weights, i.e. they describe the model the iteration started from.

    Engine-exact by construction: the margin is an explicit left-to-right
    fold over (weight, feature) products, p is `sigmoid6`, per-row
    gradient contributions and the per-row 6-dp-rounded log-loss are
    summed with `dsum` (fixed-point, partition-order-independent), and
    the weight update `w - lr * (gsum / n)` is plain IEEE arithmetic the
    SQL oracle repeats verbatim. Weights therefore match DuckDB
    bit-for-bit at every iteration."""
    w = [0.0] * len(feature_cols)
    y = F.col(label_col).cast("double")
    history: list[dict] = []
    for it in range(1, n_iter + 1):
        margin = F.lit(w[0]) * F.col(feature_cols[0])
        for wj, c in zip(w[1:], feature_cols[1:]):
            margin = margin + F.lit(wj) * F.col(c)
        p = sigmoid6(margin)
        pc = F.least(
            F.greatest(p, F.lit(P_EPS)), F.lit(1.0 - P_EPS)
        )
        resid = p - y
        loss_row = F.round(
            -(y * F.log(pc) + (F.lit(1.0) - y) * F.log(F.lit(1.0) - pc)), 6
        )
        correct = (
            ((p >= F.lit(0.5)) & (y == F.lit(1.0)))
            | ((p < F.lit(0.5)) & (y == F.lit(0.0)))
        ).cast("long")
        n_rows = F.count(F.lit(1))
        # loss/acc round INSIDE the engine (F.round), not in Python —
        # Python's round() is banker's and would diverge from the SQL
        # oracle's round() on exact halves
        row = features.agg(
            n_rows.alias("n"),
            F.round(dsum(loss_row, 9) / n_rows, 6).alias("loss"),
            F.round(F.sum(correct) / n_rows, 6).alias("acc"),
            *[
                dsum(resid * F.col(c), 9).alias(f"g{j}")
                for j, c in enumerate(feature_cols)
            ],
        ).collect()[0]
        n = row["n"]
        w = [w[j] - lr * (row[f"g{j}"] / n) for j in range(len(feature_cols))]
        history.append(
            {
                "iter": it,
                "weights": list(w),
                "loss": row["loss"],
                "acc": row["acc"],
            }
        )
    return history


def logreg_score(
    features: DataFrame,
    feature_cols: list[str],
    weights: list[float],
    out_col: str = "p",
) -> DataFrame:
    """Score rows with fitted weights: adds `out_col` = sigmoid6(margin),
    the same fold order as training — a pure derived-column pass that
    runs at scan speed (no shuffle, no UDF)."""
    margin = F.lit(weights[0]) * F.col(feature_cols[0])
    for wj, c in zip(weights[1:], feature_cols[1:]):
        margin = margin + F.lit(wj) * F.col(c)
    return features.withColumn(out_col, sigmoid6(margin))


def grouped_ols(
    df: DataFrame,
    key_cols: list[str],
    x_col: str,
    y_col: str,
    scale: int = 4,
) -> DataFrame:
    """Per-group closed-form simple linear regression — (keys, n, slope,
    intercept, r2) from the five sufficient statistics (Σx, Σy, Σxy,
    Σx², Σy²). The drift monitor of a corpus pipeline: fit quality or
    length against arrival order PER SOURCE in one aggregation pass and
    alert on trending-down sources.

    Scale shape: ONE hash aggregate with map-side partial combine
    reducing each group to six numbers; the regression arithmetic is a
    pure projection on the aggregate row. No iteration, no per-group
    sort, no UDF. The sums run through dsum fixed-point, so the fitted
    parameters are bit-stable across partitionings and the DuckDB
    oracle reproduces them exactly. Degenerate groups (n == 1 or zero
    x-variance) return NULL slope/intercept/r2 rather than a division
    artifact; zero y-variance (a perfectly constant y) fits slope 0
    with r2 NULL (0/0 — correlation undefined)."""
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    agg = df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        dsum(x, scale).alias("_sx"),
        dsum(y, scale).alias("_sy"),
        dsum(x * y, scale).alias("_sxy"),
        dsum(x * x, scale).alias("_sxx"),
        dsum(y * y, scale).alias("_syy"),
    )
    var_x = F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    var_y = F.col("_n") * F.col("_syy") - F.col("_sy") * F.col("_sy")
    cov = F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    slope = F.when(var_x > 0, cov / var_x)
    intercept = F.when(
        var_x > 0, (F.col("_sy") - (cov / var_x) * F.col("_sx")) / F.col("_n")
    )
    r2 = F.when(
        (var_x > 0) & (var_y > 0), (cov * cov) / (var_x * var_y)
    )
    return agg.select(
        *key_cols,
        F.col("_n").cast("long").alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


def calibration_curve(
    scored: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram for a [0,1] classifier score: bucket rows into
    n_bins equal-width score bins and report, per bin, the row count,
    mean predicted score, observed positive rate, and the signed
    calibration gap (observed − predicted) — the one-table read that
    says whether a quality classifier's 0.9 means 90%.

    Scale shape: a single map-side-combinable groupBy(bin) pass —
    conditional count + dsum fixed-point score sum — over one scan;
    n_bins output rows. score == 1.0 clamps into the top bin (inputs
    are non-null scores; the least() clamp never sees a NULL to skip)."""
    b = F.least(
        F.floor(F.col(score_col) * n_bins).cast("int"),
        F.lit(n_bins - 1),
    )
    agg = (
        scored.select(
            b.alias("bin"),
            F.col(score_col).alias("_s"),
            F.col(label_col).cast("int").alias("_y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("_s"), 9).alias("_ss"),
            F.sum("_y").alias("_pos"),
        )
    )
    return agg.select(
        "bin",
        "n",
        F.round(F.col("_ss") / F.col("n"), 6).alias("mean_score"),
        F.round(F.col("_pos") / F.col("n"), 6).alias("pos_rate"),
        F.round(
            F.col("_pos") / F.col("n") - F.col("_ss") / F.col("n"), 6
        ).alias("gap"),
    )


def auc_score(
    scored: DataFrame, score_col: str, label_col: str
) -> DataFrame:
    """Exact ROC AUC by rank-sum (Mann–Whitney), tie-aware: group rows
    by distinct score into (pos_n, neg_n) counts, order score groups
    ascending, and credit each positive with the negatives strictly
    below it plus half the negatives tied with it —
    AUC = Σ pos_n·(2·neg_below + neg_tied) / (2·P·N). All-integer
    until the single final division, so the value is exact and
    engine-portable with no float accumulation.

    Scale shape: one map-side-combinable groupBy(score) over the scan,
    then a running-sum window over the DISTINCT-SCORE table — fine
    while distinct scores are bounded (classifier outputs rounded to
    fixed precision); an unbounded-score input should be rounded or
    routed through dedup.global_rank first. Returns one row:
    (n_pos, n_neg, auc); AUC is NULL when either class is empty. Rows
    with NULL scores are excluded (they have no rank; keeping them would
    also leave the running-sum window's NULL placement engine-defined —
    Spark sorts NULLS FIRST, most SQL engines NULLS LAST)."""
    g = (
        scored.where(F.col(score_col).isNotNull())
        .select(
            F.col(score_col).alias("_s"),
            F.col(label_col).cast("int").alias("_y"),
        )
        .groupBy("_s")
        .agg(
            F.sum("_y").alias("pos_n"),
            F.sum(1 - F.col("_y")).alias("neg_n"),
        )
    )
    w = Window.orderBy("_s").rowsBetween(Window.unboundedPreceding, -1)
    credited = g.select(
        "pos_n",
        "neg_n",
        F.coalesce(F.sum("neg_n").over(w), F.lit(0)).alias("neg_below"),
    )
    return credited.agg(
        F.sum("pos_n").alias("n_pos"),
        F.sum("neg_n").alias("n_neg"),
        F.round(
            F.when(
                (F.sum("pos_n") > 0) & (F.sum("neg_n") > 0),
                F.sum(
                    F.col("pos_n")
                    * (F.lit(2) * F.col("neg_below") + F.col("neg_n"))
                )
                / (
                    F.lit(2) * F.sum("pos_n") * F.sum("neg_n")
                ).cast("double"),
            ),
            6,
        ).alias("auc"),
    )


def cusum_changepoint(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    value_col: str,
    scale: int = 4,
) -> DataFrame:
    """Per-group CUSUM change-point scan: the running sum of
    (x − group mean) in arrival order peaks (in absolute value) at the
    most likely mean-shift point — the classic drift LOCALIZER next to
    grouped_ols' trend direction. Returns per group: n, the peak
    |CUSUM| (a stable source scores ≈ 0; a mid-stream shift scores
    ~n·shift/2), and the order key where the peak occurs.

    Scale shape: one groupBy for the per-group mean (dsum fixed-point ⇒
    associative), one broadcast join back, ONE group-keyed window sort
    for the running sum (dsum_over — fixed-point, so the running values
    are exact 10^-s multiples and the argmax is engine-exact), and a
    max(struct) argmax aggregate — never a per-group collect."""
    from yat_geo_db_spark.relational.queries import dsum, dsum_over

    means = df.groupBy(*group_cols).agg(
        (dsum(F.col(value_col), scale) / F.count(F.lit(1))).alias("_mean"),
        F.count(F.lit(1)).alias("n"),
    )
    joined = df.join(F.broadcast(means), group_cols)
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cusum = joined.select(
        *group_cols,
        F.col("n"),
        F.col(order_col).alias("_ord"),
        F.abs(
            dsum_over(F.col(value_col) - F.col("_mean"), w, scale)
        ).alias("_abs_cusum"),
    )
    # argmax via a group-keyed ranking window (peak desc, order asc):
    # works for ANY orderable order column — timestamps included — where
    # a max(struct(peak, -ord)) negation trick would fail analysis; it
    # shares the running-sum window's group partitioning, so no extra
    # shuffle
    pick = Window.partitionBy(*group_cols).orderBy(
        F.desc("_abs_cusum"), F.asc("_ord")
    )
    return (
        cusum.withColumn("_rn", F.row_number().over(pick))
        .filter(F.col("_rn") == 1)
        .select(
            *group_cols,
            "n",
            F.round(F.col("_abs_cusum"), scale).alias("peak_cusum"),
            F.col("_ord").alias("peak_at"),
        )
    )


def cuped_adjusted_means(
    df: DataFrame,
    variant_col: str,
    x_col: str,
    y_col: str,
    scale: int = 6,
) -> DataFrame:
    """CUPED variance reduction for experiment readouts (Deng et al.
    WSDM'13): adjust each unit's metric with its PRE-period covariate,
    y' = y − θ·(x − x̄) with θ = cov(x,y)/var(x) pooled across variants
    — the industry-standard way to tighten A/B confidence intervals
    without waiting for more traffic. Returns one row per variant
    (n, mean_raw, mean_adj) plus the pooled θ and the achieved global
    variance-reduction ratio 1 − var(y')/var(y) on every row.

    Scale shape: one sufficient-statistics aggregate (dsum fixed-point
    ⇒ engine-exact θ/x̄), a broadcast of that 1-row frame, a pure
    adjusted-metric projection, one per-variant aggregate and one 1-row
    variance aggregate — three passes over the UNIT table (already
    aggregated from events), nothing over raw rows. Degenerate var(x)=0
    ⇒ θ=0 (no adjustment), never a division artifact."""
    x, y = F.col(x_col).cast("double"), F.col(y_col).cast("double")
    stats = F.broadcast(
        df.agg(
            F.count(F.lit(1)).cast("double").alias("_n"),
            dsum(x, scale).alias("_sx"),
            dsum(y, scale).alias("_sy"),
            dsum(x * y, scale).alias("_sxy"),
            dsum(x * x, scale).alias("_sxx"),
        )
    )
    var_x = F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    cov = F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    theta = F.when(var_x > 0, cov / var_x).otherwise(F.lit(0.0))
    xbar = F.col("_sx") / F.col("_n")
    adjusted = df.crossJoin(stats).select(
        F.col(variant_col),
        y.alias("_y"),
        (y - theta * (x - xbar)).alias("_adj"),
        theta.alias("_theta"),
    )
    per_variant = adjusted.groupBy(variant_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(dsum(F.col("_y"), scale) / F.count(F.lit(1)), 6).alias(
            "mean_raw"
        ),
        F.round(dsum(F.col("_adj"), scale) / F.count(F.lit(1)), 6).alias(
            "mean_adj"
        ),
        F.round(F.first("_theta"), 6).alias("theta"),
    )
    var_frame = F.broadcast(
        adjusted.agg(
            F.count(F.lit(1)).cast("double").alias("_vn"),
            dsum(F.col("_y"), scale).alias("_vy"),
            dsum(F.col("_y") * F.col("_y"), scale).alias("_vyy"),
            dsum(F.col("_adj"), scale).alias("_va"),
            dsum(F.col("_adj") * F.col("_adj"), scale).alias("_vaa"),
        )
    )
    var_y = F.col("_vn") * F.col("_vyy") - F.col("_vy") * F.col("_vy")
    var_a = F.col("_vn") * F.col("_vaa") - F.col("_va") * F.col("_va")
    return per_variant.crossJoin(var_frame).select(
        variant_col,
        "n",
        "mean_raw",
        "mean_adj",
        "theta",
        F.round(
            F.when(var_y > 0, F.lit(1.0) - var_a / var_y), 6
        ).alias("var_reduction"),
    )


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    scale: int = 6,
) -> DataFrame:
    """Kaplan–Meier survival curve with right-censoring: at each
    distinct event time t, S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ) with dᵢ deaths
    at tᵢ and nᵢ the at-risk count (units with duration ≥ tᵢ) — the
    retention/churn curve that uses censored units (still alive at
    observation end) correctly instead of dropping them.

    Engine-exact product: each factor's ln is 6-dp rounded, the running
    sum goes through fixed-point dsum_over, and S = exp(·) is rounded —
    so the curve matches the SQL oracle bit-for-bit (a naive running
    float product is order-fragile). Scale shape: one groupBy(duration)
    for the death/censor counts, one descending cumulative window for
    the at-risk set, one ordered window over the DISTINCT-DURATION
    table (bounded like a vocabulary, not the unit count)."""
    from yat_geo_db_spark.relational.queries import dsum_over

    per_t = (
        df.select(
            F.col(duration_col).alias("t"),
            F.col(event_col).cast("int").alias("_e"),
        )
        .groupBy("t")
        .agg(
            F.sum("_e").alias("d"),
            F.count(F.lit(1)).alias("c"),
        )
    )
    w_desc = (
        Window.orderBy(F.desc("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    at_risk = per_t.withColumn("n_risk", F.sum("c").over(w_desc))
    # a time where EVERYONE at risk dies (d == n) sends ln(1-d/n) to
    # -inf; factor it out as an explicit zero: survival is 0 from the
    # first such time onward, and that row contributes no log term
    factored = at_risk.where(F.col("d") > 0).withColumn(
        "_lnf",
        F.when(
            F.col("d") < F.col("n_risk"),
            F.round(
                F.log(
                    F.lit(1.0)
                    - F.col("d").cast("double")
                    / F.col("n_risk").cast("double")
                ),
                6,
            ),
        ),
    )
    w_asc = (
        Window.orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    zero_from = F.min(
        F.when(F.col("d") == F.col("n_risk"), F.col("t"))
    ).over(w_asc)
    return factored.select(
        "t",
        F.col("d").alias("n_events"),
        F.col("n_risk"),
        F.when(zero_from.isNotNull(), F.lit(0.0))
        .otherwise(
            F.round(F.exp(dsum_over(F.col("_lnf"), w_asc, scale)), 6)
        )
        .alias("survival"),
    )


#: Poisson(1) inverse-CDF breakpoints (cumulative, 6-dp fixed literals so
#: both engines compare the SAME constants): P(X<=k) for k = 0..4
POISSON1_CDF = (0.367879, 0.735759, 0.919699, 0.981012, 0.996340)


def bootstrap_mean_ci(
    df: DataFrame,
    value_col: str,
    key_col: str,
    n_replicas: int = 64,
    alpha: float = 0.05,
    scale: int = 6,
) -> DataFrame:
    """Percentile-bootstrap confidence interval for a mean via the
    POISSON bootstrap (Chamandy et al., Google 2012) — the resampling
    scheme that actually distributes: instead of drawing n rows with
    replacement (which needs global coordination), every row
    contributes an independent Poisson(1) count to each replica, so
    replica construction is a pure per-row projection. Deterministic:
    the Poisson draw inverts a fixed 6-dp CDF ladder on the per-(key,
    replica) uniform hash — no RNG state, replayable, oracle-exact.

    Scale shape: one n_replicas-way explode of the scan (the honest
    cost — B passes of weighted sums fused into one shuffle-free
    aggregate per replica), per-replica fixed-point weighted means,
    then exact percentiles over the B-row replica-mean table. Returns
    one row: (n_rows, n_replicas, mean, ci_lo, ci_hi)."""
    from yat_geo_db_spark.pipelines.text import MIX_MULT, MIX_PRIME

    r = F.explode(
        F.sequence(F.lit(0), F.lit(n_replicas - 1))
    ).alias("_rep")
    seeded = df.select(
        F.col(value_col).alias("_v"), F.col(key_col).alias("_k")
    ).where(F.col("_v").isNotNull()).select("_v", "_k", r)
    u = (
        (
            F.pmod(
                F.col("_k") * F.lit(n_replicas) + F.col("_rep"),
                F.lit(MIX_PRIME),
            )
            * F.lit(MIX_MULT)
        )
        % F.lit(MIX_PRIME)
    ).cast("double") / F.lit(float(MIX_PRIME))
    k = (
        F.when(u < POISSON1_CDF[0], 0)
        .when(u < POISSON1_CDF[1], 1)
        .when(u < POISSON1_CDF[2], 2)
        .when(u < POISSON1_CDF[3], 3)
        .when(u < POISSON1_CDF[4], 4)
        .otherwise(5)
    )
    weighted = seeded.select(
        "_rep", F.col("_v"), k.cast("double").alias("_w")
    )
    per_rep = weighted.groupBy("_rep").agg(
        F.round(
            F.when(
                F.sum("_w") > 0,
                dsum(F.col("_v") * F.col("_w"), scale) / F.sum("_w"),
            ),
            6,
        ).alias("_mean")
    )
    lo_q, hi_q = alpha / 2, 1 - alpha / 2
    base = df.where(F.col(value_col).isNotNull())
    stats = base.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(
            dsum(F.col(value_col), scale) / F.count(F.lit(1)), 6
        ).alias("mean"),
    )
    ci = per_rep.agg(
        F.round(F.expr(f"percentile(_mean, {lo_q}d)"), 6).alias("ci_lo"),
        F.round(F.expr(f"percentile(_mean, {hi_q}d)"), 6).alias("ci_hi"),
    )
    return stats.crossJoin(F.broadcast(ci)).select(
        "n_rows",
        F.lit(n_replicas).alias("n_replicas"),
        "mean",
        "ci_lo",
        "ci_hi",
    )
