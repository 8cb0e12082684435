"""fuzzy_join max_gram_df — the high-document-frequency gram prune.

VERDICT r11 task 5: the parameter was advertised (default 0.1) but
silently ignored; the DuckDB oracle for geo_fuzzy_join ALREADY replays
the prune (its `keep` CTE), so the Spark side only matched because no
fixture gram crossed the 10% df cap. These tests exercise a corpus
where the cap BITES: every entity name carries the same stopword-like
suffix, so its grams sit in 100% of posting lists and a probe
occurrence of each drags the full corpus through the candidate
shuffle unless pruned.
"""
from __future__ import annotations

import pyspark.sql.functions as F

from yat_geo_db_spark.geo import fuzzy


def _stopword_corpus(spark):
    """60 entities, each 'name<i> common plaza city' — the shared
    ' common plaza city' tail grams have df = 1.0 (every entity),
    the 'name<i>' head grams individuate."""
    rows = [
        (i, f"name{i:02d} common plaza city", f"name{i:02d} common plaza city")
        for i in range(60)
    ]
    return spark.createDataFrame(
        rows, "id long, value string, clean_value string"
    )


def _candidate_rows(spark, shapes, probes, max_gram_df):
    """Candidate-join volume (rows through the gram equi-join) with and
    without the prune — the quantity the df cap exists to cut."""
    postings = fuzzy.build_postings(shapes)
    cleaned = probes.select(
        "probe_id",
        fuzzy.clean_entity_col(F.col("probe_value")).alias("probe_clean"),
    )
    q_ex = cleaned.select(
        "probe_id",
        F.explode(fuzzy.ngrams_col(F.col("probe_clean"))).alias("ngram"),
    )
    if max_gram_df is not None:
        n_sh = shapes.agg(F.count(F.lit(1)).alias("_n"))
        hot = (
            postings.groupBy("ngram")
            .agg(F.count_distinct("entity_id").alias("_df"))
            .crossJoin(F.broadcast(n_sh))
            .filter(F.col("_df").cast("double") > max_gram_df * F.col("_n"))
            .select("ngram")
        )
        q_ex = q_ex.join(F.broadcast(hot), "ngram", "left_anti")
    return q_ex.join(postings, "ngram").count()


def test_prune_cuts_candidate_volume_keeps_top1(spark):
    shapes = _stopword_corpus(spark)
    # probes: drop the first character of every 3rd name (the
    # geo_fuzzy_join corruption) — the 'ame<i>' head grams still
    # individuate, so top-1 must survive the prune
    probes = shapes.filter(F.col("id") % 3 == 0).select(
        F.col("id").alias("probe_id"),
        F.expr("substring(value, 2)").alias("probe_value"),
    )

    pruned = fuzzy.fuzzy_join(
        shapes, probes, num_results=1, max_gram_df=0.1
    )
    full = fuzzy.fuzzy_join(
        shapes, probes, num_results=1, max_gram_df=None
    )
    got_p = sorted(map(tuple, pruned.collect()))
    got_f = sorted(map(tuple, full.collect()))
    assert got_p and got_p == got_f
    # every probe resolves to its own entity
    assert all(r[0] == r[2] for r in got_p)

    rows_full = _candidate_rows(spark, shapes, probes, None)
    rows_pruned = _candidate_rows(spark, shapes, probes, 0.1)
    # the shared-suffix grams are ~70% of each probe's grams and each
    # fans out to all 60 entities; the prune must remove that mass
    assert rows_pruned * 10 < rows_full, (rows_pruned, rows_full)
    print(f"# candidate rows: full={rows_full} pruned={rows_pruned} "
          f"({rows_full / max(rows_pruned, 1):.1f}x)")


def test_prune_all_common_probe_gets_no_candidates(spark):
    """A probe made ONLY of corpus-common grams loses every candidate
    under the cap — by construction nothing individuates it; the
    documented recall boundary."""
    shapes = _stopword_corpus(spark)
    probes = spark.createDataFrame(
        [(999, "common plaza city")], "probe_id long, probe_value string"
    )
    assert fuzzy.fuzzy_join(
        shapes, probes, num_results=1, max_gram_df=0.1
    ).count() == 0
    # unpruned, the same probe matches (ties broken by id)
    assert fuzzy.fuzzy_join(
        shapes, probes, num_results=1, max_gram_df=None
    ).count() == 1


def test_prune_noop_when_no_gram_crosses_cap(spark):
    """Distinct-name corpus: no gram reaches 10% df, the drop list is
    empty and the pruned plan returns exactly the unpruned result —
    the regime every registry fixture has been in so far."""
    rows = [(i, f"alpha{i:03d} beta{i:03d}", f"alpha{i:03d} beta{i:03d}")
            for i in range(40)]
    shapes = spark.createDataFrame(
        rows, "id long, value string, clean_value string"
    )
    probes = shapes.select(
        F.col("id").alias("probe_id"),
        F.expr("substring(value, 2)").alias("probe_value"),
    )
    a = sorted(map(tuple, fuzzy.fuzzy_join(
        shapes, probes, num_results=1, max_gram_df=0.1).collect()))
    b = sorted(map(tuple, fuzzy.fuzzy_join(
        shapes, probes, num_results=1, max_gram_df=None).collect()))
    assert a and a == b


def test_supplied_postings_df_fraction_uses_postings_population(spark):
    """ADVICE r12: with a caller-supplied `postings` built over MORE
    entities than `shapes`, the df fraction must divide by the posting
    population, not shapes.count(). Here a gram sits in 12 of 120
    indexed entities (df 10%, at the 0.1 cap boundary → kept) but 12 of
    12 shapes (df 100% → wrongly pruned under the old denominator,
    which would strip the probe's every gram and return 0 rows)."""
    # 120-entity corpus: 12 carry the 'shared plaza' tail, 108 don't
    rows = [
        (i, f"name{i:03d} shared plaza", f"name{i:03d} shared plaza")
        for i in range(12)
    ] + [
        (i, f"other{i:03d} unique", f"other{i:03d} unique")
        for i in range(12, 120)
    ]
    corpus = spark.createDataFrame(
        rows, "id long, value string, clean_value string"
    )
    postings = fuzzy.build_postings(corpus)
    # shapes = ONLY the 12 tail-carrying entities (a partition of the
    # corpus, as a partitioned sub-index caller would pass)
    shapes = corpus.filter(F.col("id") < 12)
    probes = spark.createDataFrame(
        [(0, "name005 shared plaza")], "probe_id long, probe_value string"
    )
    got = fuzzy.fuzzy_join(
        shapes, probes, num_results=1, postings=postings, max_gram_df=0.2
    ).collect()
    assert len(got) == 1 and got[0]["id"] == 5, got
    # sanity: the OLD denominator (shapes.count()=12) would have pruned
    # the tail grams (df 12 > 0.2*12) AND the head grams (df 1 < 2.4 ok)
    # — tail pruned, head kept, so top-1 still id=5; tighten: a probe of
    # ONLY the shared tail individuates nothing under the old math but
    # under the correct postings-population math (12/120 = 10% ≤ 20%)
    # the tail grams survive and the probe matches.
    tail_probe = spark.createDataFrame(
        [(1, "shared plaza")], "probe_id long, probe_value string"
    )
    got_tail = fuzzy.fuzzy_join(
        shapes, tail_probe, num_results=1, postings=postings,
        max_gram_df=0.2,
    ).count()
    assert got_tail == 1
