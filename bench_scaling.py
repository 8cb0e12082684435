"""Two-point scaling evidence for the heavy operator family.

Builds a 10x scale-up of the $SPARK_GRAFT_SF_DIR (default sf0.1)
`documents` and `embeddings` tables and measures the heavy headline
queries at BOTH sizes, printing one JSON line of per-query
{base_sec, scaled_sec, ratio}. The bar is <=~linear-in-input on a
fixed local[N] box (these are all equi-join/agg pipelines; a
superlinear ratio means a hidden candidate blow-up the sf0.1 bench and
the plan tests cannot see).

The scale-up is a union of SCALE deterministic variants, not raw
copies — each copy perturbs content so it contributes new distinct
work instead of exact duplicates:

- documents: per-copy word ROTATION of the text (same vocabulary,
  length and token distributions; different strings, different
  sort/blocking keys) + disjoint doc_id range per copy.
- embeddings: per-copy cyclic DIMENSION rotation of the vector (norms
  and pairwise-distance distribution preserved within a copy; copies
  land in different regions) + disjoint vec_id range per copy.

Both transforms are pure Column expressions — the fixture build is one
distributed pass per table. The `source` column is left as-is: its
cardinality is fixed by the upstream generator across scale factors
(20 at every sf), so the ppr/lpa graph is constant-size by design and
their scaling measures the distinct-scan, not graph growth — see
BENCHLOG.md for the per-query interpretation.

Round 10 adds the SALTED fixture family (VERDICT r9 task 1): the
word-rotation copies above share every char n-gram with their base, so
scaled copies are MUTUAL near-duplicates — fine for stressing scan
volume, wrong for claiming "representative 10× corpus" on any dedup
ratio (round 9's pipe_dedup_clusters 28× needed a 925×-edge-growth
adjudication). The salted transform interleaves per-COPY salt tokens
(a copy-specific letter alphabet encodes the word position) into every
other word gap:

- cross-copy char-3-gram Jaccard of the same base doc drops to ~0.35
  (below the 0.5 near-dup threshold) and cross-copy word-shingle
  Jaccard to ~0 — copies are NOT near-dups, so pair/edge counts grow
  ~linearly with copies;
- within a copy every doc gets the SAME tokens at the same cadence, so
  planted near-dup pairs keep their similarity (measured: char-3 J of
  planted pairs moves 0.55→0.63-0.77) and exact dups stay exact;
- the 1× fixture is copy 0 of the SAME transform, so the two-point
  ratio measures pure scale on a fixed distribution.

Round 11 adds the CLUSTERED recall fixture (VERDICT r10 task 4):
planted Gaussian clusters on the unit sphere + isotropic background,
so SemDeDup recall is measured at a realistic t=0.8 where the absolute
number is meaningful (see build_clustered_fixture).

Usage:  python bench_scaling.py
        [rotation|salted|recall|recall_clustered|sampled ...]
        (no args = all panels)
Env:    SPARK_GRAFT_SF_DIR    base dir   (default /root/testdata/sf0.1)
        SPARK_GRAFT_SCALE_DIR fixture dir (default /tmp/sf_scaled_10x)
        SPARK_GRAFT_SALT_DIR  salted fixture dir prefix
                              (default /tmp/sf_salted)
        SPARK_GRAFT_SCALE     copies      (default 10)
"""
from __future__ import annotations

import json
import os
import sys
import time

BASE_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALE_DIR = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/sf_scaled_10x")
SALT_DIR = os.environ.get("SPARK_GRAFT_SALT_DIR", "/tmp/sf_salted")
SCALE = int(os.environ.get("SPARK_GRAFT_SCALE", "10"))

#: the heavy family the round-8 verdict asked for, plus the autok
#: semdedup twin (the production auto-sized path — fixed-k semdedup is
#: quadratic-in-cell-size BY DESIGN and is pinned only for its oracle)
HEAVY = [
    "pipe_dedup_sorted_neighborhood",
    "pipe_sim_mmr",
    "pipe_graph_lpa",
    "pipe_source_ppr",
]

#: bench-only twins measured alongside HEAVY (appended in main)
EXTRA = ["pipe_sim_semdedup_autok", "pipe_sim_semdedup_scaled"]

_ID_STRIDE = 100_000_000


def build_fixture(spark) -> None:
    import pyspark.sql.functions as F

    from yat_geo_db_spark.testdata import load_table

    stamp = f"scale={SCALE} base={BASE_DIR}\n"
    marker = f"{SCALE_DIR}/_FIXTURE_OK"
    if os.path.exists(marker):
        # the marker records what the fixture IS — a changed
        # SPARK_GRAFT_SCALE/SF_DIR against the same dir must rebuild,
        # not silently measure stale data under a fresh label
        with open(marker) as fh:
            if fh.read() == stamp:
                return
        # stale stamp: drop it BEFORE rebuilding, so a crash mid-
        # rebuild can never leave the old stamp over half-new data
        os.remove(marker)
    docs = load_table(spark, BASE_DIR, "documents")
    emb = load_table(spark, BASE_DIR, "embeddings")

    def doc_copy(c: int):
        words = F.split(F.col("text"), " ")
        n = F.size(words)
        k = F.lit(c * 3) % F.greatest(n, F.lit(1))
        rotated = F.array_join(
            F.concat(
                F.slice(words, k + 1, n - k), F.slice(words, 1, k)
            ),
            " ",
        )
        return docs.select(
            (F.col("doc_id") + F.lit(c * _ID_STRIDE)).alias("doc_id"),
            (rotated if c else F.col("text")).alias("text"),
            "lang",
            "source",
            "n_chars",
        )

    def emb_copy(c: int):
        v = F.col("embedding")
        d = F.size(v)
        k = F.lit(c) % F.greatest(d, F.lit(1))
        rotated = F.concat(F.slice(v, k + 1, d - k), F.slice(v, 1, k))
        return emb.select(
            (F.col("vec_id") + F.lit(c * _ID_STRIDE)).alias("vec_id"),
            (rotated if c else v).alias("embedding"),
            "label",
        )

    all_docs = doc_copy(0)
    all_emb = emb_copy(0)
    for c in range(1, SCALE):
        all_docs = all_docs.unionByName(doc_copy(c))
        all_emb = all_emb.unionByName(emb_copy(c))
    all_docs.write.mode("overwrite").parquet(f"{SCALE_DIR}/documents.parquet")
    all_emb.write.mode("overwrite").parquet(f"{SCALE_DIR}/embeddings.parquet")
    with open(marker, "w") as fh:
        fh.write(stamp)


_SALT_ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _salt_alphabet(c: int) -> str:
    """Copy `c`'s 10-letter digit alphabet. Copies 0-16 keep the
    original disjoint sliding windows (ZERO shared salt grams between
    any two of them — and bit-identical fixtures to every prior
    round's). Copies ≥ 17 — the multiplicative unlock for scale points
    past the window alphabet's 16× maximum (VERDICT r11 'what's
    missing' #4) — draw a pseudorandom 10-of-26 permutation from a
    self-contained LCG Fisher-Yates seeded by c (no reliance on
    random-module stability). Alphabet agreement between two copies ≥17
    no longer matters for cross-copy gram sharing: _token_parts embeds
    the copy INDEX into every token, so tokens are copy-unique by
    construction (VERDICT r12 task 6 — the old ~(scale/26³)·N²
    alphabet-collision term polluted the 100× candidate-estimate
    linearity telemetry). The pairwise-distinct assertion in
    build_salted_fixture stays as a belt-and-braces exactness guard."""
    if c <= 16:
        return _SALT_ALPHA[c:c + 10]
    letters = list(_SALT_ALPHA)
    state = (0x9E3779B9 ^ (c * 0x85EBCA6B)) & 0xFFFFFFFF
    for i in range(25, 0, -1):
        state = (state * 1664525 + 1013904223) & 0xFFFFFFFF
        j = state % (i + 1)
        letters[i], letters[j] = letters[j], letters[i]
    return "".join(letters[:10])


def _token_parts(c: int) -> tuple[str, str | None]:
    """(lead_char, constant_tail) of copy `c`'s salt tokens. Copies
    ≤ 16 keep the legacy shape `z + body + reverse(body)` (tail None =
    position-dependent reverse; bit-identical fixtures to every prior
    round's ≤16× markers, zero sharing via disjoint window alphabets).
    Copies ≥ 17 use `y + body + enc3(c)` — SAME 7-char token length
    (the first salt-v2 attempt appended a suffix, and the +3 chars per
    token inflated per-doc gram mass ~20%, lengthening every prefix and
    admitting MORE cross-copy word-gap grams into the candidate join:
    measured 6.6× of linear at 100× vs the old fixture's 2.0× — worse,
    not better). The `y` lead makes a ≥17 token unequal to EVERY ≤16
    token; enc3(c) (three base-26 letters of the copy index, 17,576
    copies) makes two ≥17 copies' WHOLE tokens unequal. Position-wise
    the tokens are NOT everywhere-unequal — consecutive copies share
    enc3 prefixes (enc3(17)='aar' vs enc3(18)='aas' agree on 2 of 3
    chars) and two copies' permuted alphabets agree on any body
    position with ~1/26 probability — so a gram that straddles a token
    WITHOUT covering its distinguishing chars can still be shared
    cross-copy. What the construction buys is ATTENUATION (each
    overlapped salt char multiplies the collision odds by ~1/26, i.e.
    ~26^-d for d salt chars in the gram), not exact zero: the
    ~(scale/26³)·N² whole-token alphabet-collision term is gone, and
    the measured 100× residual (2.8× of linear on gap_mod=2, 0.90× on
    dense) is dominated by the salt-free every-other word gaps — with
    a small attenuated straddling-gram term folded in, not assumed
    away."""
    if c <= 16:
        return "z", None
    enc3 = (
        _SALT_ALPHA[(c // 676) % 26]
        + _SALT_ALPHA[(c // 26) % 26]
        + _SALT_ALPHA[c % 26]
    )
    return "y", enc3


def _salted_doc_copy(docs, c: int, gap_mod: int = 2):
    """Copy `c` of the documents table with per-copy salt tokens
    interleaved into every other word gap (``gap_mod=2``, the legacy
    cadence) or EVERY gap (``gap_mod=1``, the dense variant). The token
    encodes the word position in a COPY-SPECIFIC 10-letter alphabet
    (_salt_alphabet: disjoint windows for c ≤ 16, seeded permutations
    beyond), so two copies share ~no salt grams while every doc WITHIN
    a copy gets identical tokens at identical positions (near-dup pairs
    survive salting, copies do not become near-dups of each other —
    validated numbers in the module docstring). The dense cadence
    exists for the linearity adjudication (round 13): at gap_mod=2 the
    UNSALTED gaps carry word-run grams identical across ALL copies
    (df ∝ copies), the residual super-linear candidate channel once the
    salt tokens themselves are copy-unique; at gap_mod=1 every ≥2-word
    gram spans a copy-unique token and the channel closes. Pure Column
    expressions: the fixture build stays one distributed pass."""
    import pyspark.sql.functions as F

    alpha = _salt_alphabet(c)
    lead, tail = _token_parts(c)

    def emit(w, i):
        body = F.translate(
            F.lpad(i.cast("string"), 3, "0"), "0123456789", alpha
        )
        tok = F.concat(
            F.lit(lead), body,
            F.reverse(body) if tail is None else F.lit(tail),
        )
        return F.when(
            (i % gap_mod == 1) if gap_mod > 1 else (i >= 1),
            F.concat(tok, F.lit(" "), w),
        ).otherwise(w)

    text = F.array_join(
        F.transform(F.split(F.col("text"), " "), emit), " "
    )
    return docs.select(
        (F.col("doc_id") + F.lit(c * _ID_STRIDE)).alias("doc_id"),
        text.alias("text"),
        "lang",
        "source",
        F.length(text).cast(
            docs.schema["n_chars"].dataType
        ).alias("n_chars"),
    )


def build_salted_fixture(spark, scale: int, out_dir: str,
                         gap_mod: int = 2) -> None:
    """documents-only fixture: `scale` salted copies with disjoint id
    ranges (1× = copy 0 of the SAME transform, so 1×-vs-10× isolates
    scale from distribution). ``gap_mod=1`` builds the DENSE variant
    (every gap salted — see _salted_doc_copy) under its own stamp."""
    from yat_geo_db_spark.testdata import load_table

    # v3 only where re-tokenized copies (c ≥ 17) are included: smaller
    # scales' outputs are bit-identical to v1, so their cached fixtures
    # stay valid and no regeneration is paid (v2 — the abandoned
    # suffix attempt — never shipped a committed number)
    ver = "salt-v3" if scale > 17 else "salt-v1"
    if gap_mod != 2:
        ver += f"-dense{gap_mod}"
    stamp = f"{ver} scale={scale} base={BASE_DIR}\n"
    marker = f"{out_dir}/_FIXTURE_OK"
    if os.path.exists(marker):
        with open(marker) as fh:
            if fh.read() == stamp:
                return
        os.remove(marker)
    alphas = [_salt_alphabet(c) for c in range(scale)]
    if len(set(alphas)) != scale:
        raise AssertionError(
            "salt alphabet collision — two copies would be exact "
            "cross-copy duplicates"
        )
    docs = load_table(spark, BASE_DIR, "documents")
    out = _salted_doc_copy(docs, 0, gap_mod=gap_mod)
    for c in range(1, scale):
        out = out.unionByName(_salted_doc_copy(docs, c, gap_mod=gap_mod))
    out.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    with open(marker, "w") as fh:
        fh.write(stamp)


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _time_query(spark, fn, sf_dir: str, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        best = min(best, time.perf_counter() - t0)
    spark.catalog.clearCache()
    return best


def _timed_pair(spark, fn, d_base: str, d_scaled: str):
    base = _time_query(spark, fn, d_base)
    scaled = _time_query(spark, fn, d_scaled)
    return {
        "base_sec": round(base, 3),
        "scaled_sec": round(scaled, 3),
        "ratio": round(scaled / base, 2),
    }


def _panel_rotation(spark, registry) -> None:
    from bench import BENCH_ONLY

    build_fixture(spark)
    out = {}
    for name in HEAVY + EXTRA:
        fn = BENCH_ONLY.get(name) or registry[name][0]
        out[name] = r = _timed_pair(spark, fn, BASE_DIR, SCALE_DIR)
        print(f"# {name}: {r['base_sec']}s -> {r['scaled_sec']}s "
              f"({r['ratio']}x at {SCALE}x input)", file=sys.stderr)
    print(json.dumps({
        "metric": "scaling_ratio_10x",
        "scale": SCALE,
        "base": BASE_DIR,
        "queries": out,
    }), flush=True)


#: payability gate for actually RUNNING a containment join: past this
#: many candidate rows the measurement is pure pain with no new
#: information (the estimate already is the measurement). Calibration
#: note from this round: candidate COUNT alone under-gates once the
#: grams table outgrows AQE's broadcast ceiling — the verify join then
#: SHUFFLES every candidate with its attached gram array (measured:
#: 132M candidates x ~6 KB arrays at n=7/10x spilled >80 GB before
#: being killed), while 110M candidates at 1x verified in 110 s
#: because the 27 MB grams table broadcast. 30M candidates is safe on
#: either plan shape at this box's disk.
_RUN_CAP = int(os.environ.get("SPARK_GRAFT_CONTAIN_CAP", "30000000"))


def _panel_salted(spark, registry) -> None:
    """VERDICT r9 task 1: dedup ratios on a fixture whose copies are
    NOT mutual near-dups, plus two-point containment evidence driven by
    the operator's own cost model: candidate estimates at n in
    {3, 7, auto} at both scales, wall-clock ONLY where the estimate
    fits _RUN_CAP (the estimate IS the measurement past it — this
    panel's first ungated attempt at n=7/10x spilled the disk full)."""
    from yat_geo_db_spark.pipelines import dedup
    from yat_geo_db_spark.testdata import load_table

    d1, d10 = f"{SALT_DIR}_1x", f"{SALT_DIR}_{SCALE}x"
    build_salted_fixture(spark, 1, d1)
    build_salted_fixture(spark, SCALE, d10)

    def containment_n(n):
        def fn(spark_, sf):
            return dedup.containment_pairs(
                load_table(spark_, sf, "documents"),
                threshold=0.8, n=n, block_cols=("lang",),
            )
        return fn

    out = {}
    for name, fn in (
        ("pipe_dedup_clusters", registry["pipe_dedup_clusters"][0]),
        ("pipe_dedup_minhash_lsh", registry["pipe_dedup_minhash_lsh"][0]),
        # VERDICT r10 task 6: the slowest bench line's O(n·w) claim
        # gets its two-point ratio on the non-near-dup fixture
        ("pipe_dedup_sorted_neighborhood",
         registry["pipe_dedup_sorted_neighborhood"][0]),
    ):
        out[name] = r = _timed_pair(spark, fn, d1, d10)
        print(f"# salted {name}: {r['base_sec']}s -> {r['scaled_sec']}s "
              f"({r['ratio']}x at {SCALE}x input)", file=sys.stderr)

    # containment: estimates FIRST, wall-clock only where the operator's
    # own cost model says the join is payable (the first attempt at this
    # panel timed n=7 ungated and the 10x join spilled the disk full —
    # the estimator exists precisely so nobody launches that job)
    est = {}
    for label, d in (("1x", d1), (f"{SCALE}x", d10)):
        docs = load_table(spark, d, "documents")
        n_auto, e_auto = dedup.containment_auto_n(
            docs, 0.8, block_cols=("lang",)
        )
        est[label] = {"auto_n": n_auto, "auto_est": e_auto}
        for n in (3, 7, n_auto):
            key = f"est_n{n}"
            if key not in est[label]:
                est[label][key] = dedup.containment_candidate_estimate(
                    docs, 0.8, n=n, block_cols=("lang",)
                ) if n != n_auto else e_auto
        print(f"# salted containment estimates {label}: "
              + ", ".join(f"n={k[5:]} -> {v:,}" for k, v in
                          sorted(est[label].items()) if k.startswith("est"))
              + f"; auto picks n={n_auto}", file=sys.stderr)

    for label, d in (("1x", d1), (f"{SCALE}x", d10)):
        for n in (3, 7, est[label]["auto_n"]):
            key = f"n{n}_sec"
            if key in est[label]:
                continue
            e = est[label][f"est_n{n}"]
            if e <= _RUN_CAP:
                try:
                    sec = _time_query(spark, containment_n(n), d, runs=1)
                except Exception as exc:  # a mis-gated run must not
                    # take the rest of the panel down with it
                    est[label][key] = f"failed: {type(exc).__name__}"
                    print(f"# salted containment n={n} at {label}: "
                          f"FAILED ({exc})", file=sys.stderr)
                    continue
                est[label][key] = round(sec, 3)
                print(f"# salted containment n={n} at {label}: {sec:.2f}s "
                      f"({e:,} candidates)", file=sys.stderr)
            else:
                est[label][key] = None  # not payable — the estimate IS
                # the measurement at this point
                print(f"# salted containment n={n} at {label}: SKIPPED "
                      f"(estimate {e:,} > cap {_RUN_CAP:,})",
                      file=sys.stderr)
    print(json.dumps({
        "metric": "scaling_salted",
        "scale": SCALE,
        "base": BASE_DIR,
        "queries": out,
        "containment": est,
    }), flush=True)


#: per-candidate bytes through the exploded verify's pair exchange
#: (the 512 B bloom row) — prices the shuffle of a gated containment
#: run; the extreme panel refuses a run whose projected shuffle would
#: crowd this box's disk (the estimate IS the measurement past that).
#: Shared with the library's opt-in verify pre-flight (dedup.py), so
#: the panel and a production caller price with the same constant.
from yat_geo_db_spark.pipelines.dedup import (  # noqa: E402
    VERIFY_BYTES_PER_CAND as _VERIFY_BYTES_PER_CAND,
)
_EXTREME_SHUFFLE_BUDGET = int(
    os.environ.get("SPARK_GRAFT_EXTREME_BUDGET_BYTES", str(25 << 30))
)


def _panel_salted_extreme(spark, registry) -> None:
    """VERDICT r11 'what's missing' #4: scale points PAST the window
    alphabet's 16× maximum, unlocked by the permutation salt
    (_salt_alphabet c ≥ 17). Two scales: 32× (double the previous
    maximum — wall-clocks for minhash-LSH, sorted-neighborhood, and
    the bloom-verify containment, whose projected pair shuffle
    (estimate × 512 B) must fit the disk budget) and 100× (the
    headline multiplier: minhash + snm wall-clocks, containment
    estimates with the exact-linearity check, and the REFUSAL — the
    projected shuffle exceeds the budget, so the cost model prices the
    join and declines to launch it, which is the behavior a 100 TB
    operator must have)."""
    from yat_geo_db_spark.pipelines import dedup
    from yat_geo_db_spark.testdata import load_table

    # SPARK_GRAFT_EXTREME_ESTIMATES_ONLY=1 skips the wall-clock
    # queries entirely: at 100x the two walls leave enough JVM heap
    # history (cache fragmentation, humongous-region debris) that the
    # estimate sweep can OOM in-panel while succeeding standalone
    # (round 12 measured it; round 13 reproduced it after the walls
    # moved first) — the estimates and the refusal are then the whole
    # point of the invocation, run them in their own fresh JVM
    est_only = os.environ.get(
        "SPARK_GRAFT_EXTREME_ESTIMATES_ONLY"
    ) == "1"
    d1 = f"{SALT_DIR}_1x"
    build_salted_fixture(spark, 1, d1)
    base_docs = load_table(spark, d1, "documents")
    n_auto1, e1 = dedup.containment_auto_n(
        base_docs, 0.8, block_cols=("lang",)
    )
    spark.catalog.clearCache()
    out = {"1x": {"auto_n": n_auto1, "auto_est": e1}}
    for name in ("pipe_dedup_minhash_lsh", "pipe_dedup_sorted_neighborhood"):
        if est_only:
            break
        out["1x"][name + "_sec"] = round(
            _time_query(spark, registry[name][0], d1, runs=1), 3
        )
    # one JVM accumulates enough heap history over a full multi-scale
    # pass that the 100x estimate sweep can die of execution-memory
    # starvation it never sees in a fresh session (measured round 12:
    # standalone 555 s vs UNABLE_TO_ACQUIRE_MEMORY in-panel) — run one
    # scale per invocation when that matters
    scales = tuple(
        int(s) for s in os.environ.get(
            "SPARK_GRAFT_EXTREME_SCALES", "32,100"
        ).split(",") if s
    )
    for scale in scales:
        label = f"{scale}x"
        d = f"{SALT_DIR}_{scale}x"
        build_salted_fixture(spark, scale, d)
        docs = load_table(spark, d, "documents")
        rec = out[label] = {}
        for name in (
            "pipe_dedup_minhash_lsh", "pipe_dedup_sorted_neighborhood",
        ):
            if est_only:
                break
            sec = _time_query(spark, registry[name][0], d, runs=1)
            rec[name + "_sec"] = round(sec, 3)
            base = out["1x"][name + "_sec"]
            print(f"# extreme {name} at {label}: {sec:.2f}s "
                  f"({sec / base:.1f}x the 1x {base:.2f}s)",
                  file=sys.stderr)
        spark.catalog.clearCache()
        # ≥64×: the EXACT probe's per-n window sort is borderline in a
        # 16 GiB/32-thread local JVM (one v2-fixture run squeaked
        # through at 256 shuffle partitions, the next died of
        # UNABLE_TO_ACQUIRE_MEMORY) — this is precisely the regime the
        # library's sampled probe exists for (containment_auto_n
        # sample_fraction, exact 1/f² extrapolation; accuracy ±~10%
        # measured by the `sampled` panel), so the panel uses the same
        # at-scale mechanism a production caller would
        frac = 0.25 if scale >= 64 else None
        n_auto, e_auto = dedup.containment_auto_n(
            docs, 0.8, block_cols=("lang",), sample_fraction=frac,
        )
        spark.catalog.clearCache()
        rec["auto_n"] = n_auto
        rec["auto_est"] = e_auto
        rec["sample_fraction"] = frac
        rec["est_linearity"] = round(e_auto / (e1 * scale), 3)
        print(f"# extreme containment estimates {label}: auto n={n_auto} "
              f"-> {e_auto:,} candidates "
              f"({rec['est_linearity']}x of exact-linear"
              f"{', sampled f=' + str(frac) if frac else ''})",
              file=sys.stderr)
        shuffle_bytes = e_auto * _VERIFY_BYTES_PER_CAND
        if shuffle_bytes <= _EXTREME_SHUFFLE_BUDGET:
            def fn(spark_, sf, _n=n_auto):
                return dedup.containment_pairs(
                    load_table(spark_, sf, "documents"),
                    threshold=0.8, n=_n, block_cols=("lang",),
                )
            sec = _time_query(spark, fn, d, runs=1)
            rec["containment_sec"] = round(sec, 3)
            print(f"# extreme containment n={n_auto} at {label}: "
                  f"{sec:.2f}s ({e_auto:,} candidates, "
                  f"{shuffle_bytes >> 30} GiB projected pair shuffle)",
                  file=sys.stderr)
        else:
            rec["containment_sec"] = None
            # the refusal now flows through the library's own priced
            # error (VERDICT r12 task 5): reuse the sweep's estimate,
            # record the message a production caller would see
            try:
                # pass the SAME fraction the sweep priced e_auto with:
                # the repricing inside the refusal otherwise runs exact
                # per-n probes — the very window sorts the panel
                # switched to sampling at ≥64× to avoid
                dedup._verify_preflight(
                    docs, 0.8, n_auto, e_auto, _EXTREME_SHUFFLE_BUDGET,
                    "containment", dedup.containment_auto_n,
                    dedup._AUTO_N_GRID, "text", "doc_id", ("lang",),
                    frac,
                )
            except dedup.VerifyBudgetExceeded as e:
                rec["refusal"] = str(e)
                print(f"# extreme containment at {label}: REFUSED — {e}",
                      file=sys.stderr)
    print(json.dumps({
        "metric": "scaling_salted_extreme",
        "base": BASE_DIR,
        "scales": out,
    }), flush=True)


def _panel_recall(spark, registry) -> None:
    """VERDICT r9 task 3: quantify the IVF trade-off — emitted-pair
    recall of the flat auto-k and two-level semdedup routes against the
    brute-force thresholded cosine ground truth (emitted pairs are
    exact-verified, so emitted ⊆ truth and recall = count ratio)."""
    import pyspark.sql.functions as F

    from yat_geo_db_spark.pipelines import similarity as sim
    from yat_geo_db_spark.queries.pipeline_queries import COSINE_T
    from yat_geo_db_spark.testdata import load_table

    build_fixture(spark)
    t = COSINE_T  # the registry's semdedup threshold — ~p88 of the
    # synthetic cosine distribution, so the truth set is non-trivial
    out = {}
    for label, d in (("1x", BASE_DIR), (f"{SCALE}x", SCALE_DIR)):
        emb = load_table(spark, d, "embeddings")
        flat = sim.semdedup_pairs(emb, threshold=t).count()
        t0 = time.perf_counter()
        two = sim.semdedup_pairs_scaled(
            emb, threshold=t, coarse_probes=1
        ).count()
        sec_p1 = round(time.perf_counter() - t0, 2)
        # VERDICT r12 task 3: the DIFFUSE fixture is where multi-probe
        # could lose (no planted structure to heal; the n·(p+1)√k
        # assignment is pure overhead if boundary re-routing finds
        # nothing) — price p=2 here, not just on the clustered fixture
        # that flatters it
        t0 = time.perf_counter()
        two_p2 = sim.semdedup_pairs_scaled(
            emb, threshold=t, coarse_probes=2
        ).count()
        sec_p2 = round(time.perf_counter() - t0, 2)
        row = {
            "flat_pairs": flat, "two_level_pairs": two,
            "two_level_p2_pairs": two_p2,
            "sec_two_level": sec_p1, "sec_two_level_p2": sec_p2,
        }
        do_brute = emb.count() <= 25_000  # N² ground truth payable
        if do_brute:
            unit = sim.l2_normalized(
                emb, "vec_id", "embedding"
            ).localCheckpoint()
            a = unit.select(F.col("vec_id").alias("id1"),
                            F.col("embedding").alias("v1"))
            b = unit.select(F.col("vec_id").alias("id2"),
                            F.col("embedding").alias("v2"))
            # deliberate O(N²) ground-truth job, 1× only — mirrors
            # _cell_blocked_pairs' round(dot, 6) >= t exactly
            truth = (
                a.join(b, F.col("id1") < F.col("id2"))
                .select(F.round(
                    sim.dot_col(F.col("v1"), F.col("v2")), 6
                ).alias("cosine"))
                .filter(F.col("cosine") >= t)
                .count()
            )
            row["brute_pairs"] = truth
            row["recall_flat"] = round(flat / truth, 4) if truth else None
            row["recall_two_level"] = (
                round(two / truth, 4) if truth else None
            )
            row["recall_two_level_p2"] = (
                round(two_p2 / truth, 4) if truth else None
            )
        out[label] = row
        print(f"# recall {label}: {row}", file=sys.stderr)
    print(json.dumps({
        "metric": "semdedup_recall",
        "threshold": t,
        "scale": SCALE,
        "base": BASE_DIR,
        "panels": out,
    }), flush=True)


def build_clustered_fixture(
    spark, out_dir: str, n_clusters: int = 40, per_cluster: int = 100,
    n_background: int = 10_000, dim: int = 32, sigma: float = 0.07,
    seed: int = 1234,
) -> None:
    """Embeddings fixture with PLANTED GAUSSIAN CLUSTERS on the unit
    sphere plus an isotropic background (VERDICT r10 task 4): the
    diffuse rotation fixture's cosine distribution made t=0.12 (p88)
    the only non-trivial threshold, so its absolute recall numbers
    (9-12%) measured threshold geometry, not the operator. Here each
    cluster is a unit center + N(0, sigma²) per-dim noise — expected
    within-cluster cosine ≈ 1/(1+sigma²·dim) ≈ 0.87, so a REALISTIC
    t=0.8 separates planted near-dup pairs from the background (whose
    pairwise cosines concentrate in ±few/√dim). Generation is
    distributed Column expressions end-to-end: per-dim F.randn columns
    for the noise, a broadcast join onto the n_clusters×dim seeded
    center table, zip_with for the sum."""
    import numpy as np
    import pyspark.sql.functions as F

    stamp = (
        f"clustered-v1 k={n_clusters} per={per_cluster} bg={n_background} "
        f"dim={dim} sigma={sigma} seed={seed}\n"
    )
    marker = f"{out_dir}/_FIXTURE_OK"
    if os.path.exists(marker):
        with open(marker) as fh:
            if fh.read() == stamp:
                return
        os.remove(marker)
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    cdf = spark.createDataFrame(
        [(i, [float(x) for x in centers[i]]) for i in range(n_clusters)],
        "cl int, center array<double>",
    )
    n_cl = n_clusters * per_cluster
    clustered = (
        spark.range(n_cl)
        .select(
            F.col("id").alias("vec_id"),
            (F.col("id") % n_clusters).cast("int").alias("cl"),
            F.array(
                *[F.randn(seed + 7 * i) for i in range(dim)]
            ).alias("noise"),
        )
        .join(F.broadcast(cdf), "cl")
        .select(
            "vec_id",
            F.zip_with(
                "center", "noise",
                lambda c, x: c + F.lit(float(sigma)) * x,
            ).cast("array<float>").alias("embedding"),
            F.lit("cluster").alias("label"),
        )
    )
    background = spark.range(n_cl, n_cl + n_background).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[F.randn(seed + 1009 + 7 * i) for i in range(dim)]
        ).cast("array<float>").alias("embedding"),
        F.lit("background").alias("label"),
    )
    clustered.unionByName(background).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )
    with open(marker, "w") as fh:
        fh.write(stamp)


def _panel_recall_clustered(spark, registry) -> None:
    """VERDICT r10 task 4: SemDeDup / two-level recall where the
    ABSOLUTE number is meaningful — planted clusters, realistic t=0.8
    on normalized vectors. Emitted pairs are exact-verified cosines
    (emitted ⊆ truth), so recall = count ratio against the brute N²
    ground truth."""
    import pyspark.sql.functions as F

    from yat_geo_db_spark.pipelines import similarity as sim
    from yat_geo_db_spark.testdata import load_table

    d = os.environ.get("SPARK_GRAFT_CLUSTERED_DIR", "/tmp/sf_clustered")
    build_clustered_fixture(spark, d)
    emb = load_table(spark, d, "embeddings")
    t = 0.8
    flat = sim.semdedup_pairs(emb, threshold=t).count()
    t0 = time.perf_counter()
    two = sim.semdedup_pairs_scaled(
        emb, threshold=t, coarse_probes=1
    ).count()
    sec_p1 = round(time.perf_counter() - t0, 2)
    # the 3√k knob (VERDICT r11 task 6): top-2 coarse-cell routing —
    # same pair-join volume, p·√k-heavier assignment, boundary pairs
    # re-unite; recall/cost pair recorded next to p=1's
    t0 = time.perf_counter()
    two_p2 = sim.semdedup_pairs_scaled(
        emb, threshold=t, coarse_probes=2
    ).count()
    sec_p2 = round(time.perf_counter() - t0, 2)
    # round 13, after the default flipped 1 → 2: the p=3 point answers
    # "why stop at 2?" with a measurement — if the boundary healing
    # saturates (recall gain ≪ the p=1→2 step) while the assignment
    # pass keeps growing n·(p+1)√k, the p=2 default is justified from
    # BOTH sides of the knob
    t0 = time.perf_counter()
    two_p3 = sim.semdedup_pairs_scaled(
        emb, threshold=t, coarse_probes=3
    ).count()
    sec_p3 = round(time.perf_counter() - t0, 2)
    unit = sim.l2_normalized(emb, "vec_id", "embedding").localCheckpoint()
    a = unit.select(F.col("vec_id").alias("id1"),
                    F.col("embedding").alias("v1"))
    b = unit.select(F.col("vec_id").alias("id2"),
                    F.col("embedding").alias("v2"))
    # deliberate O(N²) ground-truth job (N = 14k here) — mirrors
    # _cell_blocked_pairs' round(dot, 6) >= t exactly
    truth = (
        a.join(b, F.col("id1") < F.col("id2"))
        .select(F.round(
            sim.dot_col(F.col("v1"), F.col("v2")), 6
        ).alias("cosine"))
        .filter(F.col("cosine") >= t)
        .count()
    )
    # VERDICT r12 task 3: one LARGER-k point (target_cell 128 → k ≈
    # n/128 vs the default 1024's floor-16) — more cells means more
    # coarse boundaries, the regime where multi-probe's healing could
    # either pay off more or drown in the heavier n·(p+1)·√k pass
    tc_big = 128
    t0 = time.perf_counter()
    big_p1 = sim.semdedup_pairs_scaled(
        emb, threshold=t, target_cell=tc_big, coarse_probes=1
    ).count()
    sec_big_p1 = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    big_p2 = sim.semdedup_pairs_scaled(
        emb, threshold=t, target_cell=tc_big, coarse_probes=2
    ).count()
    sec_big_p2 = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    big_p3 = sim.semdedup_pairs_scaled(
        emb, threshold=t, target_cell=tc_big, coarse_probes=3
    ).count()
    sec_big_p3 = round(time.perf_counter() - t0, 2)
    out = {
        "brute_pairs": truth,
        "flat_pairs": flat,
        "two_level_pairs": two,
        "two_level_p2_pairs": two_p2,
        "two_level_p3_pairs": two_p3,
        "recall_flat": round(flat / truth, 4) if truth else None,
        "recall_two_level": round(two / truth, 4) if truth else None,
        "recall_two_level_p2": round(two_p2 / truth, 4) if truth else None,
        "recall_two_level_p3": round(two_p3 / truth, 4) if truth else None,
        "sec_two_level": sec_p1,
        "sec_two_level_p2": sec_p2,
        "sec_two_level_p3": sec_p3,
        "bigk_target_cell": tc_big,
        "bigk_pairs_p1": big_p1,
        "bigk_pairs_p2": big_p2,
        "bigk_pairs_p3": big_p3,
        "recall_bigk_p1": round(big_p1 / truth, 4) if truth else None,
        "recall_bigk_p2": round(big_p2 / truth, 4) if truth else None,
        "recall_bigk_p3": round(big_p3 / truth, 4) if truth else None,
        "sec_bigk_p1": sec_big_p1,
        "sec_bigk_p2": sec_big_p2,
        "sec_bigk_p3": sec_big_p3,
    }
    print(f"# clustered recall (t={t}): {out}", file=sys.stderr)
    print(json.dumps({
        "metric": "semdedup_recall_clustered",
        "threshold": t,
        "fixture": d,
        **out,
    }), flush=True)


def _panel_sampled(spark, registry) -> None:
    """Accuracy + cost of the SAMPLED cost-model probes
    (sample_fraction + 1/f² extrapolation): for each estimator, gram
    size, and scale, the exact estimate vs the f=0.25 extrapolation,
    each with its wall-clock. The claim under test: the sampled probe
    prices the join to within a small relative error at a fraction of
    the probe cost — the regime that matters is the LARGE corpus
    (10×), where the probe pass itself starts to cost real time."""
    from yat_geo_db_spark.pipelines import dedup
    from yat_geo_db_spark.testdata import load_table

    d1, d10 = f"{SALT_DIR}_1x", f"{SALT_DIR}_{SCALE}x"
    build_salted_fixture(spark, 1, d1)
    build_salted_fixture(spark, SCALE, d10)
    frac = float(os.environ.get("SPARK_GRAFT_SAMPLE_FRAC", "0.25"))

    def timed(fn, *args, **kw):
        t0 = time.perf_counter()
        v = fn(*args, **kw)
        return v, round(time.perf_counter() - t0, 3)

    out = {}
    for label, d in (("1x", d1), (f"{SCALE}x", d10)):
        docs = load_table(spark, d, "documents")
        out[label] = {}
        for kind, fn, t in (
            ("containment", dedup.containment_candidate_estimate, 0.8),
            ("jaccard", dedup.ngram_jaccard_candidate_estimate, 0.5),
        ):
            for n in (3, 11):
                exact, s_e = timed(fn, docs, t, n=n, block_cols=("lang",))
                samp, s_s = timed(fn, docs, t, n=n, block_cols=("lang",),
                                  sample_fraction=frac, seed=7)
                rel = round(samp / exact, 3) if exact else None
                out[label][f"{kind}_n{n}"] = {
                    "exact": exact, "exact_sec": s_e,
                    "sampled": samp, "sampled_sec": s_s,
                    "sampled_over_exact": rel,
                }
                print(f"# sampled probe {label} {kind} n={n}: exact "
                      f"{exact:,} in {s_e}s; f={frac} -> {samp:,} in "
                      f"{s_s}s (ratio {rel})", file=sys.stderr)
    print(json.dumps({
        "metric": "cost_model_sampled_probe",
        "fraction": frac,
        "scale": SCALE,
        "base": BASE_DIR,
        "panels": out,
    }), flush=True)


def main() -> None:
    from bench import _bench_session, _warm
    from yat_geo_db_spark.queries import all_queries

    dispatch = {"rotation": _panel_rotation,
                "salted": _panel_salted,
                "extreme": _panel_salted_extreme,
                "recall": _panel_recall,
                "recall_clustered": _panel_recall_clustered,
                "sampled": _panel_sampled}
    # 'extreme' is opt-in only (100x fixture + tens-of-GiB shuffles):
    # the no-args default keeps the round-over-round comparable set
    panels = sys.argv[1:] or [p for p in dispatch if p != "extreme"]
    unknown = [p for p in panels if p not in dispatch]
    if unknown:
        sys.exit(f"unknown panel(s) {unknown}; valid: {sorted(dispatch)}")
    spark = _bench_session()
    registry = all_queries()
    _warm(spark, registry)
    for p in panels:
        dispatch[p](spark, registry)


if __name__ == "__main__":
    main()
