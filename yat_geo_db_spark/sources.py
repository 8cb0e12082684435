"""Robust file sources: schema-enforced reads with a dead-letter split.

Real ingestion at 100 TB meets malformed records — truncated uploads,
mixed schemas, stray log lines. Spark's FAILFAST kills the job on the
first bad row and DROPMALFORMED silently loses data; the production
pattern is PERMISSIVE + ``columnNameOfCorruptRecord``: parse what
parses, capture the raw text of what doesn't, and route it to a
dead-letter sink for replay after the producer is fixed. These helpers
package that split so every pipeline gets the same semantics.

Implementation notes (the gotchas these helpers absorb):
- the corrupt-record column must be APPENDED to the user schema before
  the read — Spark only populates a corrupt column that exists in the
  schema;
- Spark refuses a filter that references ONLY the internal corrupt
  column on a lazily-parsed frame (SPARK-38523: the parser would have
  to re-run per subtree and could disagree with itself); the documented
  fix is to materialize first, so the split caches the parsed frame —
  call ``unpersist_hint.unpersist()`` (returned) when both sides have
  been consumed;
- a JSON line that parses but MISMATCHES the schema type-wise is also
  corrupt under PERMISSIVE (the mis-typed field nulls out and the raw
  line lands in the corrupt column) — the split therefore catches
  schema drift, not just syntax errors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F
import pyspark.sql.types as T

#: name for the captured raw text of unparseable rows
CORRUPT_COL = "_corrupt_record"


def _dlq_split(parsed: DataFrame, data_cols: list[str]):
    """(good, bad, unpersist_hint) from a PERMISSIVE parse carrying
    CORRUPT_COL. input_file_name() is captured BEFORE the cache — on a
    cached frame the scan is an InMemoryTableScan and the function
    returns ''."""
    parsed = parsed.withColumn("_src", F.input_file_name()).cache()
    good = parsed.where(F.col(CORRUPT_COL).isNull()).select(*data_cols)
    bad = parsed.where(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw"), F.col("_src").alias("source")
    )
    return good, bad, parsed


def read_json_dlq(
    spark: SparkSession, path: str, schema: T.StructType
):
    """Schema-enforced JSONL read with a dead-letter split. Returns
    ``(good, bad, unpersist_hint)``: `good` carries exactly the schema's
    columns for rows that parsed AND type-checked; `bad` carries
    (raw, source) for every line that didn't — syntactically broken or
    schema-drifted — ready for a dead-letter sink and later replay."""
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    parsed = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    return _dlq_split(parsed, [f.name for f in schema.fields])


def read_csv_dlq(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    sep: str = ",",
):
    """The CSV twin of read_json_dlq: malformed lines (wrong arity,
    unparseable types) land in `bad` with their raw text; `good` is
    schema-clean."""
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    parsed = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
    )
    return _dlq_split(parsed, [f.name for f in schema.fields])


def parse_json_dlq_cols(
    df: DataFrame, raw_col: str, schema: T.StructType,
    passthrough: tuple[str, ...] = (),
):
    """The COLUMNAR twin of read_json_dlq, for payloads that arrive as a
    string column — Kafka values, event-log bodies, readStream frames.
    Returns (good, bad): `good` carries the schema's columns for rows
    whose payload parsed and type-checked, `bad` carries (raw,) for the
    rest; `passthrough` names input columns copied onto BOTH sides
    (provenance like a source path riding along the split). Built on
    from_json in PERMISSIVE mode, which is a plain expression: it
    composes into Structured Streaming plans unchanged and carries none
    of the file-source corrupt-column caveats (no cache needed —
    SPARK-38523 is specific to file-source parsing)."""
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    parsed = df.withColumn(
        "_p",
        F.from_json(
            F.col(raw_col),
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ),
    )
    # a NULL struct means the payload was so broken from_json bailed
    # entirely (or the input was NULL) — that is a bad row too
    is_bad = F.col(f"_p.{CORRUPT_COL}").isNotNull() | F.col("_p").isNull()
    extra = [F.col(c) for c in passthrough]
    good = parsed.where(~is_bad).select(
        *[F.col(f"_p.{f.name}").alias(f.name) for f in schema.fields],
        *extra,
    )
    bad = parsed.where(is_bad).select(F.col(raw_col).alias("raw"), *extra)
    return good, bad


def dlq_ingest_report(
    good: DataFrame, bad: DataFrame, quarantine_version: int | None = None
) -> DataFrame:
    """One-row ingestion health verdict: row counts on both sides and
    the bad share — the number an ingestion SLO alerts on. When the bad
    side was persisted with quarantine_write, pass the returned version
    so the report points at the replayable quarantine snapshot
    (quarantine_version is NULL otherwise)."""
    n_good = good.count()
    n_bad = bad.count()
    total = n_good + n_bad
    spark = good.sparkSession
    return spark.createDataFrame(
        [
            (
                n_good,
                n_bad,
                round(n_bad / total, 6) if total else 0.0,
                quarantine_version,
            )
        ],
        "n_good long, n_bad long, bad_share double, "
        "quarantine_version long",
    )


def quarantine_write(bad: DataFrame, root: str, reason: str = "parse") -> int:
    """Persist a dead-letter side as a new immutable VERSION of a
    quarantine table (relational.layout.versioned_write: root/v=N plus
    an atomic _latest marker — the same commit discipline as every
    versioned table, so a crash mid-write never publishes a partial
    quarantine). Rows are (raw, source, reason); `source` is NULL when
    the bad frame carries none (the columnar parse_json_dlq_cols path).
    Returns the committed version — hand it to dlq_ingest_report and to
    quarantine_replay.

    Versioned rather than appended: each ingestion run's failures are
    one immutable snapshot, so a replay after a producer fix targets
    exactly one run's rows, re-quarantines the still-bad remainder as a
    NEW version, and never double-replays (time travel + vacuum come
    for free from the layout machinery)."""
    from yat_geo_db_spark.relational.layout import versioned_write

    cols = set(bad.columns)
    out = bad.select(
        F.col("raw").cast("string").alias("raw"),
        (
            F.col("source") if "source" in cols
            else F.lit(None).cast("string")
        ).alias("source"),
        F.lit(reason).alias("reason"),
    )
    return versioned_write(out, root)


def quarantine_replay(
    spark: SparkSession, root: str, schema: T.StructType,
    version: int | None = None,
):
    """Re-parse one quarantined version's raw JSON payloads under a
    FIXED schema — the operational second half of the dead-letter
    split: the producer (or the schema) gets fixed, the quarantined
    run is replayed, and only the still-unparseable remainder stays
    bad. Returns ``(good, still_bad)``:

    - `good`: the fixed schema's columns + the original `source` —
      ready to union into the main table;
    - `still_bad`: (raw, source, reason) rows that STILL fail under
      the new schema — feed straight back into quarantine_write (it
      becomes a new, smaller version; iterate until empty).

    Parsing IS parse_json_dlq_cols (one splitter, one set of PERMISSIVE
    corner-case fixes) with the quarantine's provenance columns riding
    through the split under reserved internal names — so a payload
    schema that itself defines `source` or `reason` keeps its own
    parsed fields intact (the provenance column is then published as
    `quarantine_source` instead of shadowing the payload's). A plain
    expression, no file-source corrupt-column caveats, works
    identically if the quarantine is read as a stream."""
    from yat_geo_db_spark.relational.layout import read_version

    q = read_version(spark, root, version).select(
        "raw",
        F.col("source").alias("_prov_source"),
        F.col("reason").alias("_prov_reason"),
    )
    good, still_bad = parse_json_dlq_cols(
        q, "raw", schema, passthrough=("_prov_source", "_prov_reason")
    )
    fields = [f.name for f in schema.fields]
    prov = "source" if "source" not in fields else "quarantine_source"
    good = good.select(
        *fields, F.col("_prov_source").alias(prov)
    )
    still_bad = still_bad.select(
        "raw",
        F.col("_prov_source").alias("source"),
        F.col("_prov_reason").alias("reason"),
    )
    return good, still_bad
