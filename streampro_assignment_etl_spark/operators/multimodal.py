"""Multimodal columns: binary payloads + typed metadata (north star).

Treats image/audio/video as opaque ``binary`` columns with a typed
metadata struct, processed by Arrow-batched ``mapInPandas`` operators —
the Spark-side plumbing (schema, partitioning, UDF signatures, batch
shapes) is real and tested; only the codec step is stubbed:

* ``extract_features`` — REAL computation: a normalized 16-bin byte
  histogram per payload (numpy over Arrow batches). No codec needed;
  this is the shape any embedding-model featurizer plugs into.
* ``resize_images`` / decode — the container has no image libs, so
  decode is a clearly-marked deterministic stub (``_decode_stub``)
  behind a PIL import-try; the operator contract (binary in → binary
  out + updated meta) is what's tested.
* ``sample_frames`` — real byte-level frame slicing for fixed-size
  frame payloads (every Nth frame), no codec required.

Scale notes: payloads ride through the plan as opaque bytes — never
into driver memory; ``repartition`` before the pandas stage balances
batch sizes (binary rows are wide, so Arrow batch row-count defaults
matter more than row counts elsewhere); metadata lives in a struct so
filters on it prune at the parquet scan without touching payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

N_HIST_BINS = 16

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("frame_bytes", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


# Extension → (kind, mime) for the binaryFile ingest; anything else
# lands as ("binary", "application/octet-stream") and flows through the
# featurize/sample operators untouched (they only branch on kind).
_EXT_KIND_MIME = {
    "jpg": ("image", "image/jpeg"),
    "jpeg": ("image", "image/jpeg"),
    "png": ("image", "image/png"),
    "wav": ("audio", "audio/wav"),
    "mp3": ("audio", "audio/mpeg"),
    "flac": ("audio", "audio/flac"),
    "mp4": ("video", "video/mp4"),
    "webm": ("video", "video/webm"),
}


def read_media_dir(
    spark: SparkSession,
    path: str,
    width: int = 8,
    height: int = 4,
    frame_bytes: int = 8,
    glob: str | None = None,
) -> DataFrame:
    """Ingest a directory of RAW media files into the ``MEDIA_SCHEMA``
    frame via Spark's built-in ``binaryFile`` source — the real-file
    counterpart of ``synthesize_media``. Each file becomes one row:
    ``media_id`` = xxhash64 of the file path (stable across runs and
    partitionings), ``kind``/``meta.mime`` from the extension table
    above, ``payload`` = the file bytes, ``meta.n_frames`` =
    ceil(length / frame_bytes) so ``sample_frames`` works out of the
    box. Dimensions aren't parsed from headers (no codec libs in this
    container — same stub boundary as ``_decode_stub``); callers with
    real decoders overwrite ``width``/``height`` downstream.

    Scale notes: ``binaryFile`` streams file contents straight into
    executor rows (one task per file split; payloads never touch the
    driver), pushes ``pathGlobFilter`` down to the listing, and caps
    per-row size by ``spark.sql.sources.binaryFile.maxLength``. For
    billions of small objects prefer packing into parquet/sequence
    containers first — the listing, not the bytes, becomes the
    bottleneck; this reader is the landing-zone ingest that produces
    exactly those packed parquet media tables.
    """
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)  # (path, modificationTime, length, content)
    # Extension = last '.'-segment of the BASENAME, not the full path:
    # an extension-less file inside a dotted directory (/data.v2/clip)
    # must fall to the binary default, not inherit "v2/clip" as its
    # "extension".
    basename = F.element_at(F.split(F.col("path"), "/"), -1)
    ext = F.lower(F.element_at(F.split(basename, r"\."), -1))
    kind_map = F.create_map(
        *[x for e, (k, _) in _EXT_KIND_MIME.items() for x in (F.lit(e), F.lit(k))]
    )
    mime_map = F.create_map(
        *[x for e, (_, m) in _EXT_KIND_MIME.items() for x in (F.lit(e), F.lit(m))]
    )
    return raw.select(
        F.xxhash64("path").alias("media_id"),
        F.coalesce(kind_map[ext], F.lit("binary")).alias("kind"),
        F.col("content").alias("payload"),
        F.struct(
            F.coalesce(mime_map[ext], F.lit("application/octet-stream")).alias("mime"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.lit(frame_bytes).alias("frame_bytes"),
            F.ceil(F.col("length") / frame_bytes).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def synthesize_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media table (testdata ships no binary columns):
    payload bytes derived from sha2 of the id — stable across runs,
    executors, and engines."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("id") % 3 + 1).cast("int"),
    )
    # 64 hex chars -> 32 payload bytes, repeated by (1 + id % 4).
    payload = F.unhex(
        F.repeat(F.sha2(F.col("id").cast("string"), 256), (F.col("id") % 4 + 1).cast("int"))
    )
    return (
        spark.range(n)
        .select(
            F.col("id").alias("media_id"),
            kinds.alias("kind"),
            payload.alias("payload"),
            F.struct(
                F.lit("application/octet-stream").alias("mime"),
                F.lit(8).alias("width"),
                F.lit(4).alias("height"),
                F.lit(8).alias("frame_bytes"),
                ((F.col("id") % 4 + 1) * 4).cast("int").alias("n_frames"),
            ).alias("meta"),
        )
    )


def _byte_histogram(payload: bytes) -> list[float]:
    """Normalized 16-bin histogram of byte values — the deterministic
    stand-in for a model featurizer, but a real binary computation."""
    if not payload:
        return [0.0] * N_HIST_BINS
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=N_HIST_BINS).astype(np.float64)
    return (hist / hist.sum()).astype(np.float32).tolist()


def extract_features(media: DataFrame, partitions: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas streams an iterator of pandas batches per partition —
    payloads never collect to the driver, and numpy touches each batch
    columnar-wise. A few-split source is spread first so batches are
    balanced (gated: a many-split source skips the payload shuffle —
    guide §2.4; an explicit ``partitions`` forces the caller's
    geometry).
    """
    from ._spread import spread_small_input

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "feature": pdf["payload"].map(_byte_histogram),
                }
            )

    spread = (
        media.repartition(partitions) if partitions else spread_small_input(media)
    )
    return spread.mapInPandas(featurize, FEATURE_SCHEMA)


def _decode_stub(payload: bytes, width: int, height: int) -> bytes:
    """STUB decode: the container ships no image codecs. Deterministic
    fake 'decode' = tile/truncate the payload to width*height bytes.
    Swap for PIL/libvips in a real deployment (see resize_images)."""
    need = width * height
    if not payload:
        return bytes(need)
    reps = -(-need // len(payload))
    return (payload * reps)[:need]


def _resize_pil(payload: bytes, width: int, height: int) -> bytes:
    """REAL decode path (runs when PIL is importable): parse the encoded
    image, NEAREST-resample to (width, height), re-encode as PNG —
    all choices deterministic so re-runs/retries emit identical bytes.
    Executor-side only; payload bytes never leave the Arrow batch."""
    from io import BytesIO

    from PIL import Image

    with Image.open(BytesIO(payload)) as im:
        out = im.resize((width, height), Image.NEAREST)
        # PNG can't encode CMYK/YCbCr/F modes — normalize anything the
        # codec doesn't support (resize first: fewer pixels to convert).
        if out.mode not in ("1", "L", "LA", "I", "P", "RGB", "RGBA"):
            out = out.convert("RGB")
        buf = BytesIO()
        out.save(buf, format="PNG")
        return buf.getvalue()


def resize_images(
    media: DataFrame, width: int, height: int, use_pil: bool | None = None
) -> DataFrame:
    """Resize the image rows to (width, height): decode → resample →
    re-encode. Decode is PIL when available (``_resize_pil``: real
    Image.open/resize/PNG re-encode, mime updated accordingly), else
    the marked deterministic stub — the operator contract (binary in,
    binary out, meta updated, non-images passed through untouched) is
    identical either way. ``use_pil`` forces a path (tests); default
    auto-detects at plan-build time so the flag, not an import race on
    executors, decides the path.

    Environment parity: auto-detection runs on the DRIVER, the decode
    runs on EXECUTORS. If the driver has PIL and an executor doesn't,
    the task fails with an explicit env-mismatch ImportError rather
    than either a raw mid-job stack trace or a silent per-executor stub
    fallback — the latter would make output bytes depend on which
    executor got the batch.
    """
    if use_pil is None:
        try:
            from PIL import Image  # noqa: F401

            use_pil = True
        except ImportError:
            use_pil = False
    have_pil = use_pil

    out_schema = MEDIA_SCHEMA

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if have_pil:
            try:
                from PIL import Image  # noqa: F401
            except ImportError as exc:
                raise ImportError(
                    "resize_images planned the PIL decode path (PIL was "
                    "importable on the driver) but PIL is missing on this "
                    "executor — install pillow on executors or pass "
                    "use_pil=False for the stub path"
                ) from exc
        for pdf in batches:
            is_img = pdf["kind"] == "image"
            resized = pdf.copy()
            decode = (
                (lambda b: _resize_pil(b, width, height))
                if have_pil
                else (lambda b: _decode_stub(b, width, height))
            )
            resized.loc[is_img, "payload"] = pdf.loc[is_img, "payload"].map(decode)
            meta = pd.DataFrame(list(resized["meta"]))
            meta.loc[is_img.values, "width"] = width
            meta.loc[is_img.values, "height"] = height
            if have_pil:
                meta.loc[is_img.values, "mime"] = "image/png"
            resized["meta"] = meta.to_dict("records")
            yield resized

    return media.mapInPandas(do_resize, out_schema)


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Keep every Nth fixed-size frame of video payloads (real byte
    slicing on meta.frame_bytes — no codec), updating n_frames.
    Non-video rows pass through untouched."""

    def do_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            metas = pd.DataFrame(list(out["meta"]))
            is_vid = (pdf["kind"] == "video").values

            def slice_frames(row):
                fb = row["meta"]["frame_bytes"]
                frames = [
                    row["payload"][i : i + fb]
                    for i in range(0, len(row["payload"]), fb)
                ]
                kept = frames[::every_n]
                return b"".join(kept), len(kept)

            sliced = pdf.loc[is_vid].apply(slice_frames, axis=1)
            out.loc[is_vid, "payload"] = sliced.map(lambda t: t[0])
            metas.loc[is_vid, "n_frames"] = (
                sliced.map(lambda t: t[1]) if len(sliced) else metas.loc[is_vid, "n_frames"]
            )
            out["meta"] = metas.to_dict("records")
            yield out

    return media.mapInPandas(do_sample, MEDIA_SCHEMA)


def extract_features_arrow(
    media: DataFrame, partitions: int | None = None
) -> DataFrame:
    """``mapInArrow`` twin of ``extract_features`` — bit-equal output
    (test-pinned), different transport: the worker receives raw
    ``pyarrow.RecordBatch``es, so binary payloads stay Arrow buffers
    end-to-end instead of being boxed into per-row Python ``bytes``
    objects by the pandas bridge. For binary-heavy columns that boxing
    IS the cost of mapInPandas (copy + object allocation per payload);
    the Arrow path reads each payload as a zero-copy buffer slice.

    Per-element work here is identical numpy; at 100 TB the win is
    the removed per-batch pandas materialization of the payload
    column, not the histogram math. Use whichever the UDF body needs:
    pandas ergonomics vs Arrow's zero-copy binary access — this twin
    exists so the choice is measured, not guessed (SCALE.md row)."""
    import pyarrow as pa

    from ._spread import spread_small_input

    def featurize(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            payloads = batch.column(batch.schema.get_field_index("payload"))
            n_bytes, feats = [], []
            for v in payloads:
                b = v.as_py() if v.is_valid else None
                n_bytes.append(len(b) if b is not None else 0)
                feats.append(_byte_histogram(b) if b is not None else [0.0] * N_HIST_BINS)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(batch.schema.get_field_index("media_id")),
                    batch.column(batch.schema.get_field_index("kind")),
                    pa.array(n_bytes, type=pa.int64()),
                    pa.array(feats, type=pa.list_(pa.float32())),
                ],
                names=["media_id", "kind", "n_bytes", "feature"],
            )

    spread = (
        media.repartition(partitions) if partitions else spread_small_input(media)
    )
    return spread.mapInArrow(featurize, FEATURE_SCHEMA)
