"""Multimodal column handling for large-scale training-data pipelines.

Media (image/audio/video) is carried as an opaque ``binary`` column plus
a typed metadata struct — the storage pattern that keeps 100 TB of media
bytes out of every shuffle: operators project the metadata columns and
only touch the bytes inside narrow, Arrow-batched stages.

Three stages:
  attach_media — ingest: pack payload bytes + typed metadata struct
                 (media_type, n_bytes) onto each row.
  chunk_media  — split each payload into fixed-size byte chunks with a
                 per-chunk fingerprint (content-defined dedup unit,
                 CDN-block upload unit).  Pure JVM: posexplode over the
                 offset sequence + binary substring + hex/md5 — no
                 Python in the path.
  decode_media — feature extraction via ``mapInPandas``: the Spark-side
                 plumbing (schema, Arrow batching, partition-parallel
                 execution) is real; the actual image/audio decode is
                 STUBBED — this container ships no codec libraries, so a
                 guarded import falls back to a deterministic synthetic
                 decode (documented below) with identical schema/shape.

At scale: chunking fans out rows but each output row holds one chunk's
bytes — `spark.sql.files.maxPartitionBytes` bounds task input, and the
fingerprint groupBy shuffles 32-char digests, never payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHUNK_SIZE = 64  # bytes per chunk (tiny for test corpora; MB-scale in prod)


def attach_media(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "text"
) -> DataFrame:
    """Ingest: opaque bytes + typed metadata struct per row."""
    payload = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col),
        payload.alias("media_bytes"),
        F.struct(
            F.lit("application/octet-stream").alias("media_type"),
            F.length(payload).alias("n_bytes"),
        ).alias("media_meta"),
    )


def chunk_media(
    media: DataFrame,
    id_col: str = "doc_id",
    bytes_col: str = "media_bytes",
    chunk_size: int = CHUNK_SIZE,
) -> DataFrame:
    """Fixed-size byte chunks with per-chunk fingerprints.

    Output: (id, chunk_idx, chunk_bytes, chunk_fp) — one row per chunk;
    ``chunk_fp`` = md5 of the chunk's hex encoding (hex round-trip keeps
    the fingerprint engine-portable: DuckDB's md5 is VARCHAR-only).
    """
    n_chunks = F.ceil(F.length(F.col(bytes_col)) / F.lit(chunk_size)).cast("int")
    chunked = media.filter(F.length(bytes_col) > 0).select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        F.col(bytes_col),
    )
    chunk = F.expr(f"substring({bytes_col}, chunk_idx * {chunk_size} + 1, {chunk_size})")
    return chunked.select(
        F.col(id_col),
        F.col("chunk_idx"),
        chunk.alias("chunk_bytes"),
        F.md5(F.hex(chunk)).alias("chunk_fp"),
    )


DECODE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, width int, height int"
)


def synthetic_decode(buf: bytes) -> tuple[int, int]:
    """Default decoder: DETERMINISTIC synthetic dimensions so the
    pipeline shape is testable (and SQL-oracle-checkable) in a container
    with no codec libraries:

        width  = 100 + n_bytes mod 540
        height = 100 + first_byte mod 380   (0 for empty payloads)
    """
    n = len(buf)
    first = buf[0] if n else 0
    return 100 + n % 540, 100 + first % 380


def pil_image_decoder():
    """Production decoder factory: returns a ``bytes -> (width, height)``
    callable backed by PIL when the library is installed; raises
    ImportError (with the install hint) otherwise.  Keeping the import
    inside the factory means the engine itself never depends on codecs —
    callers opt in with ``decode_media(df, decoder=pil_image_decoder())``.
    """
    import io

    from PIL import Image  # raises ImportError when codecs are absent

    def _decode(buf: bytes) -> tuple[int, int]:
        with Image.open(io.BytesIO(buf)) as img:
            return img.width, img.height

    return _decode


# --- RAW1: a self-describing uncompressed media format ---------------------
#
# Layout (big-endian):  b"RAW1" | width u16 | height u16 | channels u8 |
#                       width*height*channels pixel bytes
#
# The container ships no image/audio codecs, so the PIL/soundfile decode
# path stays an injectable stub — but RAW1 needs only numpy, which means
# the mapInPandas decode stage can exercise REAL byte parsing end-to-end:
# header validation, dimension extraction, pixel-plane statistics.  This
# is exactly the shape of a production raw-tensor sidecar format (NPY,
# raw RGB planes, PCM audio): header + typed payload, decoded in a
# vectorized batch loop.

RAW_MAGIC = b"RAW1"
RAW_HEADER_LEN = 9

RAW_DECODE_SCHEMA = (
    "doc_id long, valid boolean, width int, height int, channels int,"
    " n_pixels int, pixel_sum bigint"
)


def encode_raw_col(width, height, channels, pixels) -> F.Column:
    """JVM-side RAW1 payload construction: concat of the magic, the
    big-endian u16/u8 header fields (via hex/lpad/unhex — no UDF), and
    the pixel bytes.  ``width``/``height``/``channels`` are int columns,
    ``pixels`` a string/binary column whose length must be
    width*height*channels."""

    def be(col, hex_digits):
        return F.unhex(F.lpad(F.hex(col), hex_digits, "0"))

    return F.concat(
        F.lit(RAW_MAGIC),
        be(width, 4),
        be(height, 4),
        be(channels, 2),
        pixels.cast("binary"),
    )


def raw_decode(buf: bytes) -> tuple[bool, int, int, int, int, int]:
    """Decode one RAW1 payload: (valid, width, height, channels,
    n_pixels, pixel_sum).  Malformed payloads (wrong magic, short
    header, truncated pixel plane) return valid=False with zeroed
    fields — corrupt media is data, not an exception."""
    import numpy as np

    if buf is None or len(buf) < RAW_HEADER_LEN or buf[:4] != RAW_MAGIC:
        return False, 0, 0, 0, 0, 0
    w = (buf[4] << 8) | buf[5]
    h = (buf[6] << 8) | buf[7]
    c = buf[8]
    npix = w * h * c
    if len(buf) != RAW_HEADER_LEN + npix:
        return False, 0, 0, 0, 0, 0
    plane = np.frombuffer(buf, dtype=np.uint8, offset=RAW_HEADER_LEN)
    return True, w, h, c, npix, int(plane.sum(dtype=np.int64))


def decode_media_raw(
    media: DataFrame, id_col: str = "doc_id", bytes_col: str = "media_bytes"
) -> DataFrame:
    """RAW1 decode via ``mapInPandas`` — the same Arrow-batched plumbing
    as :func:`decode_media`, but the decoder genuinely parses bytes
    (header validation + numpy pixel-plane statistics), so the decode
    stage is exercised end-to-end without external codec libraries."""

    def _batches(iterator):
        import pandas as pd

        for pdf in iterator:
            rows = [raw_decode(b) for b in pdf[bytes_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "valid": [r[0] for r in rows],
                    "width": [r[1] for r in rows],
                    "height": [r[2] for r in rows],
                    "channels": [r[3] for r in rows],
                    "n_pixels": [r[4] for r in rows],
                    "pixel_sum": [r[5] for r in rows],
                }
            )

    return media.mapInPandas(_batches, schema=RAW_DECODE_SCHEMA)


def decode_media(
    media: DataFrame,
    id_col: str = "doc_id",
    bytes_col: str = "media_bytes",
    decoder=None,
) -> DataFrame:
    """Feature-extract each payload with an Arrow-batched ``mapInPandas``.

    ``decoder`` is any ``bytes -> (width, height)`` callable, executed
    per payload inside the Arrow batch loop on the executors (it must be
    picklable).  Defaults to :func:`synthetic_decode` — this container
    ships no codec libraries; inject :func:`pil_image_decoder`'s result
    (or any custom fn) for real media.  The Spark-side plumbing
    (schema, Arrow batching, partition-parallel execution) is identical
    either way.
    """
    decode_one = decoder if decoder is not None else synthetic_decode

    def _batches(iterator):
        import pandas as pd

        for pdf in iterator:
            dims = [decode_one(b if b is not None else b"") for b in pdf[bytes_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "media_type": "application/octet-stream",
                    "n_bytes": [len(b) if b is not None else 0 for b in pdf[bytes_col]],
                    "width": [w for w, _ in dims],
                    "height": [h for _, h in dims],
                }
            )

    return media.mapInPandas(_batches, schema=DECODE_SCHEMA)
