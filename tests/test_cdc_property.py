"""Property test for the theorem the pipe_mm_cdc_dedup oracle rests on:
with min_size = 64, every position where cdc_chunk_bytes is ALLOWED to
declare a Gear boundary has its rolling hash equal to the position-local
64-byte WINDOW hash (terms older than 64 positions carry a 2^64 factor
and vanish mod 2^64) — so boundaries are derivable from window hashes +
the min/max-size jump rule, with no sequential chunk state.

Pure Python (no Spark): this is the mathematical contract between
multimodal.cdc_chunk_bytes and queries.pipeline_queries._mm_cdc_dedup_sql.
"""

from __future__ import annotations

import random

from yat_geo_db_spark.pipelines.multimodal import GEAR, cdc_chunk_bytes

M64 = 1 << 64


def _window_hash(data: bytes, i: int) -> int:
    """Gear hash of the (up to) 64 bytes ending at position i."""
    h = 0
    for j in range(max(0, i - 63), i + 1):
        h = ((h << 1) + GEAR[data[j]]) % M64
    return h


def _boundaries_from_windows(
    data: bytes, min_size: int, avg_bits: int, max_size: int
) -> list[tuple[int, int]]:
    """Replay the oracle's jump rule over position-local candidates."""
    thr = 1 << (64 - avg_bits)
    n = len(data)
    cands = [
        i for i in range(min_size - 1, n) if _window_hash(data, i) < thr
    ]
    chunks, s = [], 0
    while s < n:
        nxt = [i for i in cands if s + min_size - 1 <= i <= s + max_size - 1]
        if nxt:
            e = nxt[0]
        elif s + max_size <= n:
            e = s + max_size - 1
        else:
            e = n - 1
        chunks.append((s, e - s + 1))
        s = e + 1
    return chunks


def test_cdc_boundaries_equal_window_hash_jump_rule():
    rng = random.Random(20260815)
    cases = [
        b"",
        b"x" * 63,
        b"x" * 64,
        b"abc" * 200,
        bytes(rng.randrange(256) for _ in range(1)),
    ]
    # random blobs across the interesting size range, including ones
    # long enough to force max_size boundaries at small max_size
    for _ in range(40):
        n = rng.randrange(0, 3000)
        cases.append(bytes(rng.randrange(256) for _ in range(n)))
    for data in cases:
        for avg_bits, max_size in [(6, 4096), (6, 200), (9, 4096), (5, 128)]:
            want = cdc_chunk_bytes(
                data, min_size=64, avg_bits=avg_bits, max_size=max_size
            )
            got = _boundaries_from_windows(data, 64, avg_bits, max_size)
            assert got == want, (len(data), avg_bits, max_size)


def test_cdc_window_equivalence_requires_min_size_64():
    """Negative control: with min_size < 64 the rolling hash at an
    eligible position can still depend on the chunk start (the window
    spans a boundary reset), so the oracle's precondition is real —
    find at least one blob where the jump rule diverges."""
    rng = random.Random(7)
    diverged = False
    for _ in range(300):
        n = rng.randrange(100, 1200)
        data = bytes(rng.randrange(256) for _ in range(n))
        want = cdc_chunk_bytes(data, min_size=8, avg_bits=4, max_size=4096)
        got = _boundaries_from_windows(data, 8, 4, 4096)
        if got != want:
            diverged = True
            break
    assert diverged
