"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB: the payload is an opaque ``binary``
column carried alongside typed metadata; per-item compute (decode, feature
extraction, resize, frame sampling) runs as Arrow-batched ``mapInPandas``
so bytes move Python-ward once per batch, not per row, and the plan stays
a single narrow stage (no shuffle).

The decode step itself needs codec libraries that are not in this container,
so it is STUBBED (``decode_image`` raises NotImplementedError; the harness
uses the deterministic byte-level extractor below). The Spark-side contract
— schema, batch iteration, partitioning — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BINARY_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.IntegerType()),
        T.StructField("digest", T.StringType()),
        # Comma-joined string, not array<int>: downstream hashers /
        # row-oriented consumers (and the driver's pandas canonicalizer)
        # need a hashable scalar; split(',') recovers the array when needed.
        T.StructField("head_bytes", T.StringType()),
    ]
)


def decode_image(payload: bytes) -> "object":
    """Decode an image payload — DISPATCHES to PIL when importable, so
    the day the container grows a codec library this path (and the
    importorskip test pinning it) activates without a code change. With
    no codec present it raises NotImplementedError; the mapInPandas
    plumbing around it is real either way (use extract_binary_features
    for the deterministic byte-level twin)."""
    try:
        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires a codec library (PIL/opencv); "
            "use extract_binary_features for the deterministic byte-level"
            " path"
        ) from exc
    import io

    img = Image.open(io.BytesIO(bytes(payload)))
    img.load()
    return img


#: schema of decode_image_features (real-codec path)
IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mode", T.StringType()),
    ]
)


def decode_image_features(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched REAL image decode over (doc_id, payload) rows —
    identical mapInPandas shape to extract_binary_features, but the
    per-item call is :func:`decode_image` (PIL), yielding
    (doc_id, width, height, mode). In codec-less containers every task
    raises NotImplementedError at execution time; the importorskip test
    in tests/test_multimodal_seams.py exercises this end-to-end whenever
    PIL exists."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            imgs = [decode_image(b) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.Series(
                        [im.width for im in imgs], dtype="int32"
                    ),
                    "height": pd.Series(
                        [im.height for im in imgs], dtype="int32"
                    ),
                    "mode": [im.mode for im in imgs],
                }
            )

    return binary_df.mapInPandas(extract, schema=IMAGE_FEATURES_SCHEMA)


def with_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Materialize an opaque binary column (here: utf-8 bytes of the text —
    the driver testdata has no true media blobs; the engine treats any bytes
    opaquely, which is the point)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def extract_binary_features(binary_df: DataFrame, head_n: int = 4) -> DataFrame:
    """Arrow-batched per-item feature extraction over binary payloads:
    byte length, md5 digest, first-N byte values. Deterministic stand-in for
    a real decoder with identical plumbing (mapInPandas over (id, binary)).
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            # NULL payload -> NULL features (len(None) would kill the
            # Python worker; the SQL twin's octet_length/md5 of NULL is
            # NULL — round-11 all-NULL probe). Int32 keeps the column
            # nullable through Arrow.
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": payloads.map(
                        lambda b: len(b) if b is not None else None
                    ).astype("Int32"),
                    "digest": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                        if b is not None
                        else None
                    ),
                    "head_bytes": payloads.map(
                        lambda b: ",".join(
                            str(int(x)) for x in bytes(b)[:head_n]
                        )
                        if b is not None
                        else None
                    ),
                }
            )

    return binary_df.mapInPandas(extract, schema=BINARY_FEATURES_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_len", T.IntegerType()),
        T.StructField("frame_digest", T.StringType()),
    ]
)


def sample_frames(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    frame_width: int = 100,
    step: int = 2,
) -> DataFrame:
    """Frame sampling: split each payload into fixed-width frames and keep
    every ``step``-th one — the video-frame-sampling plumbing (one input row
    fans out to N output rows inside the Arrow batch; no shuffle, no
    explode node). A real deployment decodes actual frames here; the
    deterministic fake slices the payload by characters so the exact same
    rows are DuckDB-oracle-checkable (substring + md5 on both engines).
    """

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lens, digs = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                for i in range(0, (len(payload) + frame_width - 1) // frame_width, step):
                    frame = payload[i * frame_width : (i + 1) * frame_width]
                    ids.append(doc_id)
                    idxs.append(i)
                    lens.append(len(frame))
                    digs.append(hashlib.md5(frame.encode("utf-8")).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_len": pd.Series(lens, dtype="int32"),
                    "frame_digest": pd.Series(digs, dtype="object"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(frames, schema=FRAME_SCHEMA)


THUMB_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("thumb_head", T.StringType()),
        T.StructField("thumb_digest", T.StringType()),
    ]
)


def resize_payload(
    df: DataFrame, id_col: str, payload_col: str, target: int = 64
) -> DataFrame:
    """Resize-to-fixed-dimensions plumbing: every payload becomes exactly
    ``target`` units (truncate long, pad short) — the shape contract of an
    image resize, on a deterministic character fake ('.'-padding) so the
    output is oracle-checkable. Arrow-batched mapInPandas, narrow stage."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = pdf[payload_col].map(
                lambda s: s[:target].ljust(target, ".") if s is not None else None
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "thumb_head": thumbs.map(
                        lambda s: s[:8] if s is not None else None
                    ),
                    "thumb_digest": thumbs.map(
                        lambda s: hashlib.md5(s.encode("utf-8")).hexdigest()
                        if s is not None
                        else None
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(resize, schema=THUMB_SCHEMA)


PCM_WINDOW_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("win_idx", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def pcm_energy_windows(
    df: DataFrame, id_col: str, text_col: str, frame: int = 50
) -> DataFrame:
    """Audio-style windowed feature extraction — the audio leg of the
    multimodal family next to image thumbnails and video frame sampling:
    treat each item's codepoint stream as a PCM-like sample series
    (centered at 96 so word characters sit positive and spaces
    negative), cut it into fixed ``frame``-sample windows (full windows
    only), and emit per-window RMS energy and the zero-crossing count —
    the two classic voice-activity/segmentation features. A real
    deployment decodes true PCM through the ``decode_image``-style codec
    seam; the windowing/feature math here is the real thing.

    Runs as Arrow-batched ``mapInPandas`` (one input row -> len/frame
    output rows, the same explode-free fan-out as ``sample_frames``).
    Determinism: integer squares/products summed exactly; the only
    floats are one division and one (correctly-rounded, IEEE) sqrt per
    window, floor-rounded — the DuckDB oracle reproduces both.
    """
    import math

    def windows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, widx, ns, rms, zc = [], [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                t = text or ""
                for i in range(len(t) // frame):
                    cs = [ord(ch) - 96 for ch in t[i * frame : (i + 1) * frame]]
                    sum_sq = sum(c * c for c in cs)
                    e = math.sqrt(sum_sq / float(frame))
                    ids.append(doc_id)
                    widx.append(i)
                    ns.append(frame)
                    rms.append(math.floor(e * 10000 + 0.5) / 10000)
                    zc.append(
                        sum(
                            1
                            for j in range(1, frame)
                            if cs[j] * cs[j - 1] < 0
                        )
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "win_idx": pd.Series(widx, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int32"),
                    "rms": pd.Series(rms, dtype="float64"),
                    "zero_crossings": pd.Series(zc, dtype="int64"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        windows, schema=PCM_WINDOW_SCHEMA
    )
