"""Multimodal column plumbing: image/audio/video as opaque `binary` columns
with typed metadata structs, processed via Arrow-batched `mapInPandas`.

IMAGE decode (JPEG/PNG) is STUBBED — Pillow/cv2/imageio are not importable
in this container (probed: `import PIL` → ModuleNotFoundError; recorded in
tests/test_multimodal.py) — behind `decode_image_stub`, a clearly-marked
deterministic fake. AUDIO decode is REAL: `decode_wav` parses genuine
RIFF/WAVE containers with the stdlib `wave` module + NumPy PCM frames
(`synthesize_wav` builds real WAV payloads to feed it, and `wav_features`
is the distributed mapInPandas kernel). Everything around the stubs is
real and tested: schema, binary payloads, batch iteration, UDF signatures,
partition-size control. Swap `_fake_decode` for PIL/libav and the image
pipeline is production-shaped.

Scale notes: binary payloads dominate row size → keep
`spark.sql.files.maxPartitionBytes` low for these tables, select metadata
columns WITHOUT the binary column whenever possible (column pruning skips
the bytes entirely in Parquet), and resist `collect()` — all feature
extraction stays in executors via mapInPandas.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
import pyspark.sql.functions as F
import pyspark.sql.types as T

#: schema of the decoded-feature output rows
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
    ]
)


def synthesize_media(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic stand-in media table: payload bytes are the UTF-8 text
    (opaque to the engine, exactly like real image bytes), with a typed
    metadata struct — the canonical multimodal layout."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return documents.select(
        "doc_id",
        payload.alias("media_bytes"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.length(payload).alias("n_bytes"),
            (F.col("doc_id") % 640 + 16).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 16).cast("int").alias("height"),
        ).alias("media_meta"),
    )


def _fake_decode(payload: bytes, width: int, height: int) -> dict:
    """STUB decode: deterministic fake in place of a real codec.

    Raises NotImplementedError for non-fake mime types in decode_image_stub;
    here it derives stable pseudo-features from the bytes so the pipeline is
    testable end to end.
    """
    checksum = 0
    for b in payload:
        checksum = (checksum * 31 + b) % 1_000_000_007
    # integer-floor mean (×1e6) keeps the value exactly reproducible in SQL
    # (python round() is banker's rounding — not portable across engines)
    mean_intensity = (
        (sum(payload) * 1_000_000 // len(payload)) / 1e6 if payload else 0.0
    )
    return {
        "n_bytes": len(payload),
        "checksum": checksum,
        "width": width,
        "height": height,
        "mean_intensity": mean_intensity,
    }


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column. Real
    mapInPandas plumbing: batches arrive as pandas DataFrames; per-batch
    python work; schema declared up front."""

    def _extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [
                _fake_decode(
                    bytes(row.media_bytes),
                    int(row.media_meta["width"]),
                    int(row.media_meta["height"]),
                )
                for row in pdf.itertuples()
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return media.mapInPandas(_extract, FEATURE_SCHEMA)


def decode_image_stub(payload: bytes, mime: str) -> dict:
    """The honest decode entry point: real IMAGE codecs are not available
    in this environment (audio/wav has a real path — see decode_wav)."""
    if mime == "image/fake":
        return _fake_decode(payload, 0, 0)
    raise NotImplementedError(
        f"decoding {mime!r} requires an image codec library not present "
        "in this environment (PIL/cv2/imageio all fail to import); wire "
        "PIL/torchvision/libav here. audio/wav decodes for real via "
        "decode_wav/wav_features."
    )


# --------------------------------------------------------------------------
# REAL audio codec: RIFF/WAVE (stdlib `wave` container parse + NumPy PCM)
# --------------------------------------------------------------------------

#: synthesized-WAV defaults
WAV_SAMPLE_RATE = 8000

#: schema of decoded-WAV feature rows — all integers, so the features are
#: exactly reproducible by an oracle that derives the same samples
WAV_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("peak", T.IntegerType()),
        T.StructField("total", T.LongType()),
    ]
)


def encode_wav(samples, sample_rate: int = WAV_SAMPLE_RATE) -> bytes:
    """REAL WAV encode: 16-bit little-endian mono PCM through the stdlib
    `wave` writer. `samples` is any int sequence fitting int16."""
    import io
    import wave as wave_mod

    import numpy as np

    arr = np.asarray(samples, dtype="<i2")
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(arr.tobytes())
    return buf.getvalue()


def synthesize_wav(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sample_rate: int = WAV_SAMPLE_RATE,
) -> DataFrame:
    """(doc_id, media_bytes, media_meta): GENUINE RIFF/WAVE payloads — a
    44-byte canonical header plus 16-bit little-endian mono PCM frames,
    written by the stdlib `wave` encoder. Samples are the text's per-char
    code points (mod 2^15 to fit int16), which keeps every downstream
    decoded feature SQL-derivable from the text for oracle checks while the
    bytes themselves are a real container any audio tool can open."""

    def _encode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payloads = []
            metas = []
            for text in pdf[text_col].fillna(""):
                samples = [ord(c) % 32768 for c in text]
                payload = encode_wav(samples, sample_rate)
                payloads.append(payload)
                metas.append(
                    {
                        "mime": "audio/wav",
                        "n_bytes": len(payload),
                        "sample_rate": sample_rate,
                        "n_samples": len(samples),
                    }
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "media_bytes": payloads,
                    "media_meta": metas,
                }
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("media_bytes", T.BinaryType()),
            T.StructField(
                "media_meta",
                T.StructType(
                    [
                        T.StructField("mime", T.StringType()),
                        T.StructField("n_bytes", T.IntegerType()),
                        T.StructField("sample_rate", T.IntegerType()),
                        T.StructField("n_samples", T.IntegerType()),
                    ]
                ),
            ),
        ]
    )
    return documents.select(id_col, text_col).mapInPandas(_encode, schema)


def decode_wav(payload: bytes):
    """REAL WAV decode: parse the RIFF/WAVE container with the stdlib
    `wave` module and return (sample_rate, samples) with samples a NumPy
    int16 array. Raises on malformed containers — this is an actual codec
    path, not a deterministic fake (only 16-bit mono is wired; extend the
    reshape for multi-channel)."""
    import io
    import wave as wave_mod

    import numpy as np

    with wave_mod.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2 or w.getnchannels() != 1:
            raise NotImplementedError(
                "only 16-bit mono PCM wired; got "
                f"width={w.getsampwidth()} channels={w.getnchannels()}"
            )
        rate = w.getframerate()
        frames = w.readframes(w.getnframes())
    return rate, np.frombuffer(frames, dtype="<i2")


def wav_features(media: DataFrame) -> DataFrame:
    """Distributed WAV feature extraction — the real-codec counterpart of
    extract_features: Arrow-batched mapInPandas, `decode_wav` per payload,
    integer features (peak amplitude, sample sum) so results are exactly
    oracle-checkable. The payload bytes never leave the executors."""

    def _extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for row in pdf.itertuples():
                rate, samples = decode_wav(bytes(row.media_bytes))
                rows.append(
                    {
                        "doc_id": row.doc_id,
                        "sample_rate": rate,
                        "n_samples": int(samples.size),
                        "peak": int(samples.max()) if samples.size else 0,
                        "total": int(samples.sum()) if samples.size else 0,
                    }
                )
            yield pd.DataFrame(rows)

    return media.select("doc_id", "media_bytes").mapInPandas(
        _extract, WAV_FEATURE_SCHEMA
    )


#: schema of resized media rows — same layout as synthesize_media's output
RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_bytes", T.BinaryType()),
        T.StructField(
            "media_meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.IntegerType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def _fake_resize(payload: bytes, w: int, h: int, tw: int, th: int) -> bytes:
    """STUB resize kernel: deterministic byte-stride subsample standing in
    for a real interpolating resampler (swap for PIL.Image.resize). Output
    length shrinks proportionally to the pixel-count ratio."""
    if not payload or tw * th >= w * h:
        return payload
    stride = max(1, (w * h) // (tw * th))
    return payload[::stride]


def resize_media(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Arrow-batched resize: binary in → binary out with the metadata struct
    rewritten to the target dimensions. The payload never leaves the
    executors and never converts to rows — the Spark-side shape of a real
    image-resize stage (kernel stubbed; see module docstring)."""

    def _resize(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for row in pdf.itertuples():
                out = _fake_resize(
                    bytes(row.media_bytes),
                    int(row.media_meta["width"]),
                    int(row.media_meta["height"]),
                    target_w,
                    target_h,
                )
                rows.append(
                    {
                        "doc_id": row.doc_id,
                        "media_bytes": out,
                        "media_meta": {
                            "mime": row.media_meta["mime"],
                            "n_bytes": len(out),
                            "width": target_w,
                            "height": target_h,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(_resize, RESIZED_SCHEMA)


def audio_window_energy(
    documents: DataFrame, window: int = 64, hop: int = 32,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Audio-style windowed feature extraction, fully declarative: treat the
    payload bytes as PCM samples, frame into (window, hop) segments, emit
    per-frame energy (sum of sample values) and peak. No Python in the row
    path — the sample-code array is materialized ONCE per row, then each
    frame aggregates an array slice (the hash-once pattern from
    dedup.shingle_hash_table; never re-decode per frame). Swap the
    byte-codes source for a real PCM decode and the frame math is unchanged.
    """
    codes = F.expr(
        f"transform(sequence(1, length({text_col})), "
        f"i -> ascii(substring({text_col}, i, 1)))"
    )
    n = F.length(text_col)
    starts = F.when(
        n >= window, F.sequence(F.lit(1), n - (window - 1), F.lit(hop))
    ).otherwise(F.array().cast("array<int>"))
    framed = documents.select(
        id_col, codes.alias("codes"), F.explode(starts).alias("frame_start")
    )
    frame = F.slice(F.col("codes"), F.col("frame_start"), window)
    return framed.select(
        id_col,
        F.col("frame_start"),
        F.aggregate(frame, F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "energy"
        ),
        F.array_max(frame).alias("peak"),
    )


def frame_sample_plan(media: DataFrame, every_nth: int = 10) -> DataFrame:
    """Video-frame-sampling stand-in: shows the partition-friendly pattern
    (posexplode of a frame-index sequence derived from metadata, no data
    movement of the payload until the sampled frames are decoded)."""
    n_frames = (F.col("media_meta.n_bytes") / 16).cast("int") + 1
    return media.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_nth))
        ).alias("frame_idx"),
    )


#: schema of Arrow-native byte-statistics rows
BYTE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("distinct_bytes", T.IntegerType()),
        T.StructField("max_run", T.IntegerType()),
    ]
)


def payload_byte_stats(media: DataFrame) -> DataFrame:
    """Per-payload byte statistics via `mapInArrow` — the zero-copy path
    for binary-heavy columns: batches arrive as `pyarrow.RecordBatch`, the
    payload buffers are read without a pandas detour (pandas boxes each
    binary cell into a Python bytes object; Arrow keeps them in one
    contiguous buffer). Same stub-honest stance as the decoders: the stats
    stand in for codec work, the batch plumbing is the real deliverable.

    distinct_bytes and max_run are cheap corruption/compressibility
    screens (a max_run of thousands usually means padding or a broken
    encoder)."""
    import pyarrow as pa

    def _stats(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(batch.schema.get_field_index("doc_id"))
            payloads = batch.column(
                batch.schema.get_field_index("media_bytes")
            )
            n_bytes, distinct, runs = [], [], []
            for buf in payloads:
                b = buf.as_py() or b""
                n_bytes.append(len(b))
                distinct.append(len(set(b)))
                best = cur = 1 if b else 0
                for i in range(1, len(b)):
                    cur = cur + 1 if b[i] == b[i - 1] else 1
                    best = max(best, cur)
                runs.append(best)
            yield pa.RecordBatch.from_arrays(
                [
                    ids.cast(pa.int64()),
                    pa.array(n_bytes, pa.int32()),
                    pa.array(distinct, pa.int32()),
                    pa.array(runs, pa.int32()),
                ],
                names=["doc_id", "n_bytes", "distinct_bytes", "max_run"],
            )

    return media.select("doc_id", "media_bytes").mapInArrow(
        _stats, BYTE_STATS_SCHEMA
    )
