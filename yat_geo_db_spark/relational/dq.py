"""Declarative data-quality audit (dbt-tests / Great-Expectations style):
not-null, uniqueness, range, accepted-values, and referential-integrity
rules evaluated over a table in as few passes as the rule mix allows.

Scale shape: every ROW-LEVEL rule (not_null / range / accepted values)
is a conditional count inside ONE aggregation over ONE scan — auditing
30 columns costs the same scan as auditing one. Uniqueness rides the
same aggregate via count(col) - count(DISTINCT col). Referential
integrity is the only rule needing a second relation: one left-anti
join per (child, parent) pair, parent side broadcast when it's a
dimension. Nothing collects to the driver; the result is one row per
rule."""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def dq_audit(
    df: DataFrame,
    not_null: tuple[str, ...] = (),
    unique: tuple[str, ...] = (),
    ranges: dict[str, tuple[float, float]] | None = None,
    accepted: dict[str, tuple] | None = None,
    refs: tuple[tuple[str, DataFrame, str], ...] = (),
) -> DataFrame:
    """Evaluate the given rules; return one row per rule:
    (rule, column, n_violations, n_rows, ok).

    - not_null: columns that must not contain NULL
    - unique: columns whose non-null values must be distinct
      (violations = count(col) - count(DISTINCT col), the duplicate surplus)
    - ranges: col -> (lo, hi) inclusive bounds; NULLs don't violate range
      (they're not_null's job)
    - accepted: col -> allowed literal values; NULLs don't violate
    - refs: (child_col, parent_df, parent_col) — child keys must exist in
      the parent (anti-join count; NULL child keys don't violate,
      matching SQL FK semantics)
    """
    ranges = ranges or {}
    accepted = accepted or {}
    aggs = [F.count(F.lit(1)).alias("_n")]
    labels: list[tuple[str, str, str]] = []  # (agg_alias, rule, column)

    def add(cond_or_agg, rule: str, col: str) -> None:
        # aliases are POSITIONAL (_r0, _r1, ...) — always valid
        # identifiers inside the stack() expr regardless of what the
        # user's column is named (backtick/quote column names are legal
        # in Spark and must not be spliced into generated SQL)
        alias = f"_r{len(labels)}"
        aggs.append(cond_or_agg.alias(alias))
        labels.append((alias, rule, col))

    for c in not_null:
        add(F.count(F.when(F.col(c).isNull(), 1)), "not_null", c)
    for c, (lo, hi) in ranges.items():
        add(
            F.count(
                F.when(
                    F.col(c).isNotNull() & ((F.col(c) < lo) | (F.col(c) > hi)),
                    1,
                )
            ),
            f"range[{lo},{hi}]",
            c,
        )
    for c, vals in accepted.items():
        add(
            F.count(F.when(F.col(c).isNotNull() & ~F.col(c).isin(*vals), 1)),
            "accepted_values",
            c,
        )
    for c in unique:
        add(F.count(F.col(c)) - F.count_distinct(F.col(c)), "unique", c)

    def lit_str(s: str) -> str:
        """SQL single-quoted literal with quote/backslash escaping — rule
        labels and user column names pass through generated SQL safely."""
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    row = df.agg(*aggs)
    parts = []
    if labels:
        # unpivot the single stats row into one row per rule — a
        # driver-free stack() over a 1-row frame (stack(0) won't parse,
        # hence the guard: an FK-only audit has no row-level rules)
        stack_args = ", ".join(
            f"{lit_str(rule)}, {lit_str(col)}, {alias}"
            for alias, rule, col in labels
        )
        parts.append(
            row.select(
                F.col("_n"),
                F.expr(
                    f"stack({len(labels)}, {stack_args})"
                    " AS (rule, column, n_violations)"
                ),
            ).select(
                "rule",
                "column",
                F.col("n_violations").cast("bigint").alias("n_violations"),
                F.col("_n").alias("n_rows"),
                (F.col("n_violations") == 0).alias("ok"),
            )
        )
    # the 1-row stats frame carries n_rows to the ref rules via a
    # broadcast cross join — no driver-side count action
    n_rows_frame = F.broadcast(row.select(F.col("_n")))
    for child_col, parent_df, parent_col in refs:
        orphans = (
            df.select(F.col(child_col))
            .filter(F.col(child_col).isNotNull())
            .join(
                parent_df.select(F.col(parent_col).alias(child_col)),
                child_col,
                "left_anti",
            )
        )
        parts.append(
            orphans.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_violations")
            )
            .crossJoin(n_rows_frame)
            .select(
                F.lit("referential").alias("rule"),
                F.lit(child_col).alias("column"),
                "n_violations",
                F.col("_n").alias("n_rows"),
                (F.col("n_violations") == 0).alias("ok"),
            )
        )
    if not parts:
        raise ValueError("dq_audit called with no rules")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def robust_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    z_threshold: float = 3.5,
) -> DataFrame:
    """Per-group robust anomaly detection via the modified z-score
    (Iglewicz–Hoaglin): z = 0.6745·(x − median) / MAD, flagging
    |z| > z_threshold. Median/MAD resist the very outliers they hunt
    (a mean/stddev gate moves with the contamination — the classic
    failure on long-tailed quality metrics like doc length).

    Scale shape: two groupBy-percentile passes (median, then median of
    absolute deviations) — each an exact per-group sort, fine while
    groups fit a partition; the sketch-percentile path is the
    whole-table fallback — and two joins of the tiny per-group stats
    back to the rows (broadcast: one row per group). A group with
    MAD = 0 (over half its rows identical) yields NULL z and never
    flags — degenerate groups must not divide by zero."""
    med = df.groupBy(*group_cols).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("med")
    )
    with_med = df.join(F.broadcast(med), group_cols)
    mad = (
        with_med.withColumn(
            "_absdev", F.abs(F.col(value_col) - F.col("med"))
        )
        .groupBy(*group_cols)
        .agg(F.expr("percentile(_absdev, 0.5)").alias("mad"))
    )
    scored = with_med.join(F.broadcast(mad), group_cols).withColumn(
        "robust_z",
        F.when(
            F.col("mad") > 0,
            F.round(
                F.lit(0.6745)
                * (F.col(value_col) - F.col("med"))
                / F.col("mad"),
                6,
            ),
        ),
    )
    return scored.withColumn(
        "is_outlier",
        F.coalesce(
            F.abs(F.col("robust_z")) > F.lit(z_threshold), F.lit(False)
        ),
    )


#: dtypes table_stats treats as numeric (profiled into min_num/max_num).
#: Exact names + the parameterized decimal — a bare "int" PREFIX would
#: also match "interval ..." types and crash the cast.
_NUMERIC_TYPES = ("int", "bigint", "double", "float", "smallint", "tinyint")


def table_stats(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """ANALYZE-style column profile: one row per column with row count,
    null count/fraction, EXACT distinct count, numeric min/max (numeric
    and timestamp columns; timestamps as epoch microseconds), and mean
    string length — the stats a planner (or a data engineer deciding
    bucketing/partition keys) reads first.

    Scale shape: ONE aggregate over ONE scan computes every per-column
    statistic (the multi-count_distinct expands map-side, never
    rescans), then a driver-free stack() unpivots the single stats row
    into the per-column report. Exact distinct is what makes the oracle
    line up; swap in approx_count_distinct at the 100 TB interactive
    tier if a 2% ndv error is acceptable."""
    dtypes = dict(df.dtypes)
    cols = columns or list(dtypes)
    aggs = [F.count(F.lit(1)).alias("_n")]
    labels: list[tuple[str, str]] = []  # (prefix, column)
    for j, c in enumerate(cols):
        p = f"_c{j}"
        t = dtypes[c]
        if t in _NUMERIC_TYPES or t.startswith("decimal"):
            num = F.col(c).cast("double")
        elif t.startswith("timestamp"):
            num = F.unix_micros(F.col(c).cast("timestamp")).cast("double")
        else:
            num = F.lit(None).cast("double")
        alen = (
            F.avg(F.length(F.col(c)))
            if t == "string"
            else F.lit(None).cast("double")
        )
        # maps aren't comparable: count_distinct on them fails analysis
        nd = (
            F.first(F.lit(None).cast("bigint"))
            if t.startswith("map")
            else F.count_distinct(F.col(c))
        )
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"{p}_nul"),
            nd.alias(f"{p}_nd"),
            F.min(num).alias(f"{p}_mn"),
            F.max(num).alias(f"{p}_mx"),
            alen.alias(f"{p}_al") if t == "string" else F.first(alen).alias(f"{p}_al"),
        ]
        labels.append((p, c))

    def lit_str(s: str) -> str:
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"{lit_str(c)}, {p}_nul, {p}_nd, {p}_mn, {p}_mx, {p}_al"
        for p, c in labels
    )
    out = row.select(
        F.col("_n").alias("n_rows"),
        F.expr(
            f"stack({len(labels)}, {stack_args}) AS "
            "(column_name, n_null, n_distinct, min_num, max_num, avg_len)"
        ),
    )
    return out.select(
        "column_name",
        "n_rows",
        "n_null",
        F.round(F.col("n_null") / F.col("n_rows"), 6).alias("null_frac"),
        "n_distinct",
        F.round("min_num", 6).alias("min_num"),
        F.round("max_num", 6).alias("max_num"),
        F.round("avg_len", 6).alias("avg_len"),
    )


def winsorize(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p_lo: float = 0.01,
    p_hi: float = 0.99,
    out_col: str | None = None,
) -> DataFrame:
    """Per-group percentile clipping (winsorization): values below the
    group's p_lo quantile raise to it, above p_hi lower to it — the
    standard tail-taming transform before means/regressions on
    long-tailed metrics (a raw mean of doc lengths is whatever the top
    0.1% says it is). NULL values stay NULL (the when-guard keeps them
    out of the least/greatest clamp, which would otherwise null-skip
    to a bound).

    Scale shape: one groupBy-percentile pass to the per-group (lo, hi)
    bounds, one broadcast join back, and a pure projection — the data
    moves zero times beyond its scan."""
    q = df.groupBy(*group_cols).agg(
        F.expr(
            f"percentile({value_col}, array({p_lo}d, {p_hi}d))"
        ).alias("_q")
    ).select(
        *group_cols,
        F.col("_q")[0].alias("_qlo"),
        F.col("_q")[1].alias("_qhi"),
    )
    out = out_col or f"{value_col}_w"
    return df.join(F.broadcast(q), group_cols).withColumn(
        out,
        F.when(
            F.col(value_col).isNotNull(),
            F.least(
                F.greatest(F.col(value_col), F.col("_qlo")), F.col("_qhi")
            ),
        ),
    ).drop("_qlo", "_qhi")


def impute_median(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """NULL repair by per-group median with a global-median fallback
    (for groups that are entirely NULL) — the robust imputation default
    for long-tailed metrics where a mean-fill drags toward outliers.
    Non-null values pass through untouched.

    Scale shape: one groupBy-percentile pass (percentile ignores
    NULLs), one 1-row global percentile aggregate, one broadcast join +
    pure coalesce projection — the data moves zero times beyond its
    scan."""
    med = df.groupBy(*group_cols).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("_gmed")
    )
    glob = df.agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("_allmed")
    )
    out = out_col or f"{value_col}_filled"
    return (
        df.join(F.broadcast(med), group_cols)
        .crossJoin(F.broadcast(glob))
        .withColumn(
            out,
            F.coalesce(F.col(value_col), F.col("_gmed"), F.col("_allmed")),
        )
        .drop("_gmed", "_allmed")
    )


def corr_matrix(
    df: DataFrame, cols: list[str], scale: int = 4
) -> DataFrame:
    """Pairwise Pearson correlations over numeric columns in ONE
    aggregate over ONE scan (k columns → k·(k+1)/2 fixed-point sums in
    the same pass — profiling 10 columns costs the same scan as 2),
    unpivoted to (col_a, col_b, n, corr) rows for every a < b pair.
    Complete-case semantics: rows with a NULL in ANY profiled column
    are excluded first, so every pair sees the same n (the matrix stays
    positive-semidefinite, unlike pairwise deletion). Degenerate
    (zero-variance) columns yield NULL correlations, never a division
    artifact. dsum fixed-point sums ⇒ engine-exact."""
    from yat_geo_db_spark.relational.queries import dsum

    base = df
    for c in cols:
        base = base.where(F.col(c).isNotNull())
    xs = {c: F.col(c).cast("double") for c in cols}
    aggs = [F.count(F.lit(1)).cast("double").alias("_n")]
    for c in cols:
        aggs.append(dsum(xs[c], scale).alias(f"_s_{c}"))
        aggs.append(dsum(xs[c] * xs[c], scale).alias(f"_ss_{c}"))
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    for j, (a, b) in enumerate(pairs):
        aggs.append(dsum(xs[a] * xs[b], scale).alias(f"_sp_{j}"))
    row = base.agg(*aggs)

    def lit_str(s: str) -> str:
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    corr_exprs = []
    for j, (a, b) in enumerate(pairs):
        var_a = F.col("_n") * F.col(f"_ss_{a}") - F.col(f"_s_{a}") * F.col(f"_s_{a}")
        var_b = F.col("_n") * F.col(f"_ss_{b}") - F.col(f"_s_{b}") * F.col(f"_s_{b}")
        cov = F.col("_n") * F.col(f"_sp_{j}") - F.col(f"_s_{a}") * F.col(f"_s_{b}")
        corr_exprs.append(
            F.round(
                F.when(
                    (var_a > 0) & (var_b > 0),
                    cov / (F.sqrt(var_a) * F.sqrt(var_b)),
                ),
                6,
            ).alias(f"_c_{j}")
        )
    scored = row.select(F.col("_n"), *corr_exprs)
    stack_args = ", ".join(
        f"{lit_str(a)}, {lit_str(b)}, _c_{j}" for j, (a, b) in enumerate(pairs)
    )
    return scored.select(
        F.col("_n").cast("long").alias("n"),
        F.expr(
            f"stack({len(pairs)}, {stack_args}) AS (col_a, col_b, corr)"
        ),
    ).select("col_a", "col_b", "n", "corr")


def chi_square_independence(
    df: DataFrame, col_a: str, col_b: str, scale: int = 6
) -> DataFrame:
    """Pearson chi-square independence statistic for two categorical
    columns: X² = Σ (observed − expected)²/expected over the
    contingency table, expected = row_total·col_total/N — the
    first-line "are these two labels related" screen (lang × source,
    variant × outcome). Returns one row: (n, dof, chi2). Compare chi2
    against the χ²(dof) critical value client-side — the CDF is not a
    SQL-portable closed form, and shipping the statistic exactly
    matters more than baking in one significance level.

    Scale shape: one groupBy(a,b) count (contingency cells), the two
    marginal tables derived FROM the cell table (never a rescan),
    broadcast joins back, one fixed-point sum of the per-cell terms.
    Rows with NULL in either column are excluded (no category)."""
    from yat_geo_db_spark.relational.queries import dsum

    observed = (
        df.where(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
        .groupBy(col_a, col_b)
        .agg(F.count(F.lit(1)).alias("_o"))
    )
    row_m = observed.groupBy(col_a).agg(F.sum("_o").alias("_ra"))
    col_m = observed.groupBy(col_b).agg(F.sum("_o").alias("_cb"))
    # the statistic runs over the FULL ka×kb grid: an EMPTY cell still
    # contributes (0 − E)²/E — dropping unobserved cells (the natural
    # groupBy output) understates X² exactly when dependence is
    # strongest (test-pinned: a fully dependent 2×2 is n, not n/2)
    cells = (
        row_m.crossJoin(F.broadcast(col_m))
        .join(observed, [col_a, col_b], "left")
        .withColumn("_o", F.coalesce(F.col("_o"), F.lit(0)))
    )
    n_frame = F.broadcast(observed.agg(F.sum("_o").alias("_n")))
    enriched = cells.crossJoin(n_frame)
    expected = (
        F.col("_ra").cast("double")
        * F.col("_cb").cast("double")
        / F.col("_n").cast("double")
    )
    term = (
        (F.col("_o").cast("double") - expected)
        * (F.col("_o").cast("double") - expected)
        / expected
    )
    dims = F.broadcast(
        cells.agg(
            F.count_distinct(F.col(col_a)).alias("_ka"),
            F.count_distinct(F.col(col_b)).alias("_kb"),
        )
    )
    return (
        enriched.agg(
            F.first(F.col("_n")).alias("n"),
            F.round(dsum(term, scale), 6).alias("chi2"),
        )
        .crossJoin(dims)
        .select(
            "n",
            ((F.col("_ka") - 1) * (F.col("_kb") - 1)).alias("dof"),
            "chi2",
        )
    )
