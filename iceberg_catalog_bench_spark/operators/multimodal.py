"""Multimodal-column plumbing for LLM training-data pipelines.

Images / audio / video ride through the engine as opaque ``binary``
columns with typed metadata structs. The real decode libraries
(Pillow / ffmpeg / torchaudio) are not in this container, so the
decode kernels are STUBBED behind ``_decode_image_real`` (raises
NotImplementedError) with a deterministic fake standing in — but the
Spark-side plumbing is real and tested: binary column construction,
Arrow-batched ``mapInPandas`` with an explicit output schema,
per-batch vectorized processing, and frame-table explosion
(one row in → N frame rows out).

At 100 TB the shape matters: mapInPandas streams Arrow record
batches through Python without collecting partitions, metadata-only
predicates (width/height/n_bytes) are computed once and stored
columnar so later filters never touch the blobs, and frame sampling
is a generator (no per-partition materialization of all frames).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register


def _decode_image_real(blob: bytes) -> tuple[int, int]:
    """Real decoder hook (Pillow etc.) — unavailable in this container.

    Replace the fake below with this once an image library ships.
    """
    raise NotImplementedError("image decode libraries not available in this environment")


def _decode_image_fake(blob: bytes) -> tuple[int, int]:
    """Deterministic stand-in for decode: derive (width, height) from
    the byte content so downstream plumbing sees realistic variation."""
    n = len(blob)
    checksum = (blob[0] + blob[-1]) if n else 0
    width = 64 + (n % 512)
    height = 64 + ((n + checksum) % 512)
    return width, height


@register(
    "multimodal_image_meta",
    oracle=(
        "SELECT doc_id, octet_length(encode(text)) AS n_bytes, "
        "64 + (octet_length(encode(text)) % 512) AS width, "
        "64 + ((octet_length(encode(text)) + ascii(text[1]) + "
        "ascii(text[-1])) % 512) AS height "
        "FROM documents"
    ),
)
def multimodal_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode → typed metadata via Arrow-batched
    mapInPandas. The 'image' is the document text encoded as bytes
    (the container has no real image data or codecs); the decode is
    the deterministic fake, so the whole Arrow round-trip — binary
    column in, int metadata out, batch-at-a-time — is oracle-checked.
    """
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", F.encode("text", "utf-8").alias("image_bytes")
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # The decode formula is INLINED (same math as _decode_image_fake,
        # vectorized): a shipped closure must not reference module-level
        # functions of this package — cloudpickle serializes those BY
        # REFERENCE, and a Python worker whose PYTHONPATH lacks the repo
        # (driver added it to sys.path only) would fail to unpickle.
        for pdf in batches:
            blobs = pdf["image_bytes"]
            nb = blobs.map(len)
            checksum = blobs.map(lambda b: (b[0] + b[-1]) if len(b) else 0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": nb.astype("int32"),
                    "width": (64 + (nb % 512)).astype("int32"),
                    "height": (64 + ((nb + checksum) % 512)).astype("int32"),
                }
            )

    return docs.mapInPandas(
        decode_batches, "doc_id bigint, n_bytes int, width int, height int"
    )


@register(
    "multimodal_frame_sample",
    oracle=(
        # The frame-sampling policy is pure integer arithmetic on blob
        # length, so the whole explosion is SQL-reproducible:
        # generate_series per doc == the mapInPandas generator's rows.
        "WITH d AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents), "
        "f AS (SELECT doc_id, n, "
        "unnest(generate_series(0, least(8, greatest(1, n // 256)) - 1)) AS frame_idx "
        "FROM d) "
        "SELECT doc_id, frame_idx, frame_idx * 256 AS byte_offset, "
        "least(256, n - frame_idx * 256) AS frame_bytes FROM f"
    ),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: one binary blob → N frame rows
    (every 256-byte window = one 'frame', capped at 8 per doc — the
    shape of sample-every-Nth-frame). mapInPandas yields a frame
    table; at scale the generator streams batches without holding a
    document's full frame set in memory."""
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", F.encode("text", "utf-8").alias("video_bytes")
    )

    def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_idx, out_off, out_sz = [], [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["video_bytes"]):
                n_frames = min(8, max(1, len(blob) // 256))
                for i in range(n_frames):
                    off = i * 256
                    out_doc.append(doc_id)
                    out_idx.append(i)
                    out_off.append(off)
                    out_sz.append(min(256, len(blob) - off))
            yield pd.DataFrame(
                {"doc_id": out_doc, "frame_idx": out_idx,
                 "byte_offset": out_off, "frame_bytes": out_sz}
            )

    return docs.mapInPandas(
        sample_frames,
        "doc_id bigint, frame_idx int, byte_offset int, frame_bytes int",
    )


@register(
    "multimodal_audio_features",
    oracle=(
        # The 'waveform' is the document's bytes (ASCII text, so byte ==
        # codepoint and the window math is exactly reproducible in SQL):
        # 128-byte windows (max 5), per-window mean amplitude.
        "WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS n "
        "FROM documents), "
        "c AS (SELECT doc_id, text, n, "
        "unnest(generate_series(0, least(5, greatest(1, n // 128)) - 1)) AS chunk_idx "
        "FROM d) "
        "SELECT doc_id, chunk_idx, chunk_idx * 128 AS sample_offset, "
        "least(128, n - chunk_idx * 128) AS chunk_len, "
        "CAST(FLOOR(list_avg(list_transform("
        "generate_series(chunk_idx * 128 + 1, least(n, chunk_idx * 128 + 128)), "
        "i -> ascii(text[i]))) * 1000) AS INT) AS mean_amplitude_milli "
        "FROM c"
    ),
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-style feature extraction: one binary waveform → N windowed
    feature rows (128-byte windows, max 5 per doc; per-window mean
    amplitude). The decode step is the identity fake (bytes ARE the
    samples — real torchaudio/ffmpeg kernels aren't in this container);
    the Spark plumbing is the real shape: Arrow-batched mapInPandas,
    numpy vectorization inside the batch, windowed explosion streamed
    by a generator so a long waveform never materializes all windows.
    """
    import numpy as np  # noqa: F401  (vectorized math inside the closure)

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", F.encode("text", "utf-8").alias("audio_bytes")
    )

    def window_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np

        for pdf in batches:
            out = {"doc_id": [], "chunk_idx": [], "sample_offset": [],
                   "chunk_len": [], "mean_amplitude_milli": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["audio_bytes"]):
                wave = _np.frombuffer(blob, dtype=_np.uint8)
                n = len(wave)
                n_chunks = min(5, max(1, n // 128))
                for i in range(n_chunks):
                    chunk = wave[i * 128:(i + 1) * 128]
                    out["doc_id"].append(doc_id)
                    out["chunk_idx"].append(i)
                    out["sample_offset"].append(i * 128)
                    out["chunk_len"].append(len(chunk))
                    # floor(mean*1000): chunk means are exact binary
                    # fractions (sum/len with len ≤ 128), so the scaled
                    # floor is bit-identical in numpy and DuckDB — no
                    # round-half tie-breaking to disagree on
                    out["mean_amplitude_milli"].append(
                        int(_np.floor(chunk.astype(_np.float64).mean() * 1000))
                    )
            yield pd.DataFrame(out)

    return docs.mapInPandas(
        window_features,
        "doc_id bigint, chunk_idx int, sample_offset int, "
        "chunk_len int, mean_amplitude_milli int",
    )


@register(
    "multimodal_phash_dedup",
    oracle=(
        # The fake pHash is a pure function of the BYTES, so the oracle
        # extracts the first/last UTF-8 byte from the encoded blob via
        # hex() — NOT ascii(text[1])/ascii(text[-1]), which are Unicode
        # codepoints of the first/last CHARACTERS and diverge from the
        # Spark side on any non-ASCII document (ADVICE r4).
        "WITH h AS (SELECT doc_id, octet_length(encode(text)) AS n, "
        "hex(encode(text)) AS hx FROM documents), "
        "p AS (SELECT doc_id, n * 512 + ("
        "COALESCE(TRY_CAST(('0x' || substr(hx, 1, 2)) AS INT), 0) + "
        "COALESCE(TRY_CAST(('0x' || substr(hx, n * 2 - 1, 2)) AS INT), 0)) % 512 "
        "AS phash FROM h) "
        "SELECT phash, MIN(doc_id) AS keeper_id, COUNT(*) AS copies "
        "FROM p GROUP BY phash"
    ),
)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image dedup by perceptual hash — the multimodal twin of
    ``dedup_exact``: decode each binary blob, compute a compact hash,
    shuffle ONLY the (doc_id, hash) pairs, group, keep min doc_id.
    The real pipeline would put a 64-bit aHash/pHash of decoded
    pixels here (`_decode_image_real` hook); the container has no
    codecs, so the hash is the deterministic fake — a pure function
    of the bytes — which keeps the full Arrow mapInPandas plumbing
    (binary in, int64 hash out, batch-at-a-time) oracle-checked.

    At 100 TB the design point is that the blobs NEVER shuffle: the
    hash computes map-side in the Arrow stream, and the exchange
    carries 16 bytes/row regardless of image size."""
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", F.encode("text", "utf-8").alias("image_bytes")
    )

    def phash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # formula inlined (see decode_batches note: closures must not
        # reference module-level package functions)
        for pdf in batches:
            blobs = pdf["image_bytes"]
            n = blobs.map(len)
            first = blobs.map(lambda b: b[0] if len(b) else 0)
            last = blobs.map(lambda b: b[-1] if len(b) else 0)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "phash": n * 512 + (first + last) % 512,
            })

    hashed = docs.mapInPandas(phash_batches, "doc_id bigint, phash bigint")
    return hashed.groupBy("phash").agg(
        F.min("doc_id").alias("keeper_id"), F.count(F.lit(1)).alias("copies")
    )
