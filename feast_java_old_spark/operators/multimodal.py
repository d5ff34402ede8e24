"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video ride through the engine as ``BinaryType`` columns
with a metadata struct; decode / feature-extraction / resize /
frame-sampling run as Arrow-batched Pandas functions over ``mapInPandas``
(the Spark-native replacement for the reference's Arrow-over-gRPC
transform hop, ``OnlineTransformationService.java:313-411``).

The actual codecs (Pillow / ffmpeg / torchaudio) are not installed in
this environment, so the decode kernels are **deterministic stubs** behind
``try``-imports: the Spark-side contract — schema, batch iteration, UDF
signatures, partitioning — is real and tested; swapping in a real decoder
changes only the marked inner function.

Scale notes: ``mapInPandas`` streams Arrow batches (no per-row Python
overhead, bounded memory via ``spark.sql.execution.arrow.maxRecordsPerBatch``);
binary payloads stay in their partition — decode is shuffle-free.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
    ]
)


def attach_binary_payload(
    df: DataFrame, content_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Model a multimodal table: id + opaque binary payload + metadata.

    (The synthetic corpus has no real image bytes; UTF-8 text bytes stand
    in. Real pipelines read payloads via ``spark.read.format("binaryFile")``
    — same downstream shape.)
    """
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(content_col), "UTF-8").alias("payload"),
    )


try:
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except ImportError:  # pragma: no cover - PIL absent in this container
    HAVE_PIL = False


def _decode_image_stub(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decoder — the fallback for payloads that are
    not decodable images (the synthetic corpus carries UTF-8 text bytes
    as stand-in payloads)."""
    n = len(payload)
    return (n % 640) + 1, ((n * 7) % 480) + 1, 3


def _decode_image_meta(payload: bytes) -> tuple[int, int, int]:
    """Real decode when PIL is available and the bytes are a decodable
    image; the deterministic fake otherwise. Per-payload fallback (not
    module-level) so a mixed batch of real images and stand-in bytes
    decodes what it can — and the operator IMPROVES rather than breaks
    the moment the environment gains the codec."""
    if HAVE_PIL:
        import io

        try:
            img = PIL.Image.open(io.BytesIO(payload))
            return img.width, img.height, len(img.getbands())
        except Exception:
            pass  # not an image container — deterministic fake below
    return _decode_image_stub(payload)


def decode_image_metadata(df: DataFrame) -> DataFrame:
    """Arrow-batched decode of binary payloads → typed image metadata.

    ``mapInPandas``: one Python worker per partition, Arrow batches in and
    out, vectorized pandas ops inside (the PIL path is per-image by
    nature; the fake path stays vectorized).
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].map(len)
            if HAVE_PIL:
                meta = pdf["payload"].map(_decode_image_meta)
                out = pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "n_bytes": n.astype("int32"),
                        "width": meta.map(lambda m: m[0]).astype("int32"),
                        "height": meta.map(lambda m: m[1]).astype("int32"),
                        "channels": meta.map(lambda m: m[2]).astype("int32"),
                    }
                )
                yield out
                continue
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n.astype("int32"),
                    "width": ((n % 640) + 1).astype("int32"),
                    "height": (((n * 7) % 480) + 1).astype("int32"),
                    "channels": 3,
                }
            )
            out["channels"] = out["channels"].astype("int32")
            yield out

    return df.mapInPandas(decode, IMAGE_META_SCHEMA)


def frame_sample(
    df: DataFrame, every_n: int = 10, id_col: str = "doc_id"
) -> DataFrame:
    """Frame sampling for video-like payloads: one output row per sampled
    frame index. The frame count derives deterministically from payload
    size (stub); ``posexplode`` of a ``sequence`` keeps it JVM-side —
    a real pipeline swaps the count for the container's metadata and
    decodes the frame bytes in a follow-up ``mapInPandas``.
    """
    n_frames = (F.octet_length("payload") % 100) + 1
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return df.select(
        F.col(id_col),
        n_frames.alias("n_frames"),
        F.explode(idx).alias("frame_idx"),
    )


def extract_embedding_stub(df: DataFrame, dim: int = 8) -> DataFrame:
    """Feature-extraction stub: payload → deterministic pseudo-embedding
    (md5-seeded), as a Pandas UDF over Arrow batches — the exact plumbing
    a real encoder (CLIP/wav2vec) plugs into."""
    import hashlib

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def emb(payload: bytes) -> list[float]:
                h = hashlib.md5(payload).digest()
                return [h[i] / 255.0 for i in range(dim)]

            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "embedding": pdf["payload"].map(emb)}
            )

    return df.mapInPandas(extract, out_schema)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_stub(df: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Resize-to-fixed-shape stub over Arrow batches.

    Decodable image payloads (PIL available) resize for real — PNG
    re-encode at ``(width, height)``; everything else maps
    deterministically onto ``width*height`` bytes (truncate /
    cycle-pad) so downstream batch shapes are exactly what a real
    resize produces. Per-payload fallback, same policy as
    :func:`_decode_image_meta`.

    Shuffle-free: payloads are transformed in place in their partition;
    output batch size is bounded by Arrow batching regardless of input
    payload skew.
    """
    target = width * height

    def _resize_real(payload: bytes):
        import io

        try:
            img = PIL.Image.open(io.BytesIO(payload)).resize(
                (width, height)
            )
            buf = io.BytesIO()
            img.save(buf, "PNG")
            return buf.getvalue()
        except Exception:
            return None  # not an image container — stub fit below

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def fit(payload: bytes) -> bytes:
                if HAVE_PIL:
                    real = _resize_real(payload)
                    if real is not None:
                        return real
                if len(payload) >= target:
                    return bytes(payload[:target])
                reps = -(-target // max(len(payload), 1))
                return bytes((payload * reps)[:target])

            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["payload"].map(fit),
                    "width": width,
                    "height": height,
                }
            ).astype({"width": "int32", "height": "int32"})

    return df.mapInPandas(resize, RESIZED_SCHEMA)
