"""Multimodal columns: images/audio/video as opaque binary columns with
typed metadata, processed by Arrow-batched Pandas UDFs.

Reference parity: the CLIP ingest path (O19-O21) — binaryFile directory
scan (clip/db_operation.py:100-106), key = basename sans extension
(clip/db_operation.py:61), metadata map {type, dataset, file_path,
dimension} (clip/db_operation.py:62-67), embed → L2-normalize
(clip/embedding.py:64) → upsert.

The real decoders (PIL/torchvision/ffmpeg) and CLIP weights are NOT in
this container, so the decode step is stubbed two ways (SURVEY §2.3
contract): `embed_binary_deterministic` — a seeded hash-projection
embedder with the real UDF signature, batch shape, and normalization,
so the whole pipeline is testable end-to-end; and `embed_binary_clip` —
the real-model hook that raises NotImplementedError until the import
succeeds. Spark-side plumbing (schema, partitioning, Arrow batching) is
real either way.

Scale: ingest is a binaryFile scan → mapInPandas; each Arrow batch holds
a bounded number of blobs (spark.sql.execution.arrow.maxRecordsPerBatch
caps memory), and the embed stage is embarrassingly parallel — exactly
how a 1000-executor image-embedding job runs, with the model loaded once
per python worker, not per row.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

IMAGE_EXTENSIONS = (".jpg", ".jpeg", ".png")  # clip/db_operation.py:100-106

MULTIMODAL_SCHEMA = (
    "key string, modality string, content binary, "
    "meta map<string,string>, embedding array<double>"
)


def read_binary_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Directory-of-files scan (O21): binaryFile source with key =
    basename sans extension and the reference's metadata map."""
    df = spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
    key = F.regexp_replace(
        F.element_at(F.split(F.col("path"), "/"), -1), r"\.[^.]*$", ""
    )
    return df.select(
        key.alias("key"),
        F.lit("image").alias("modality"),
        F.col("content"),
        F.create_map(
            F.lit("type"), F.lit("image"),
            F.lit("file_path"), F.col("path"),
            F.lit("length"), F.col("length").cast("string"),
        ).alias("meta"),
    )


def _make_hash_embed():
    """Build the deterministic fake embedder as a NESTED function:
    cloudpickle serializes nested functions by value, so UDF closures
    that capture it ship self-contained to executors — workers never
    import this package. That matters because a harness may create its
    SparkSession without the repo on executor PYTHONPATH (a
    module-level function would pickle by reference and die with
    ModuleNotFoundError in the worker)."""

    def hash_projection_embed(blobs: pd.Series, dim: int) -> pd.Series:
        """Deterministic fake embedder: seed a per-blob RNG from the
        blob's content hash, draw a unit vector. Stands in for the CLIP
        forward pass (clip/embedding.py:39-68) with identical output
        contract (fixed dim, L2-normalized)."""
        import hashlib

        import numpy as np
        import pandas as pd

        out = []
        for blob in blobs:
            b = bytes(blob) if blob is not None else b""
            # content-derived seed via md5 (stable across processes,
            # unlike built-in hash() under randomized PYTHONHASHSEED)
            seed = int.from_bytes(hashlib.md5(b).digest()[:8], "big")
            rng = np.random.default_rng(seed)
            v = rng.standard_normal(dim)
            n = np.linalg.norm(v)
            out.append((v / n if n > 0 else v).tolist())
        return pd.Series(out)

    return hash_projection_embed


_hash_projection_embed = _make_hash_embed()


def embed_binary_deterministic(
    df: DataFrame, dim: int = 64, content_col: str = "content"
) -> DataFrame:
    """Add an `embedding` column via the deterministic stub embedder.
    mapInPandas so model-state (here: nothing; for CLIP: the weights)
    initializes once per worker, and blobs stream in bounded Arrow
    batches."""
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema = f"{fields}, embedding array<double>"

    # bind the by-value closure locally so the kernel ships self-contained
    _embedder = _hash_projection_embed

    def embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-worker init happens HERE (load model once) in the real path
        for pdf in batches:
            pdf = pdf.copy()
            pdf["embedding"] = _embedder(pdf[content_col], dim)
            yield pdf

    return df.mapInPandas(embed, schema=out_schema)


def embed_binary_clip(
    df: DataFrame,
    content_col: str = "content",
    model_name: str = "openai/clip-vit-base-patch32",
    batch_size: int = 32,
    device: str | None = None,
) -> DataFrame:
    """Real CLIP image embedder (O19): decode image bytes → 512-d
    L2-normalized `get_image_features` vectors, matching the reference
    embedder's contract (clip/embedding.py:39-68: ViT-B/32, normalize,
    512-d) — but BATCHED through mapInPandas where the reference runs
    one forward pass per file: the model loads ONCE per Python worker
    and every Arrow batch is chunked into `batch_size` forward passes,
    so at 1000 executors the weights load 1000 times, not once per
    image. Requires torch+transformers+Pillow; gated with
    NotImplementedError in containers without them (the deterministic
    stand-in `embed_binary_deterministic` keeps the pipeline contract
    testable everywhere)."""
    try:
        import PIL  # noqa: F401
        import torch  # noqa: F401
        import transformers  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "CLIP decode/embed requires torch+transformers+Pillow (not "
            "in this container). Use embed_binary_deterministic for the "
            "pipeline contract; this path runs as-is on a cluster with "
            "the model baked in."
        ) from e

    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    out_schema = f"{fields}, embedding array<double>"

    def embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        import torch
        from PIL import Image
        from transformers import CLIPModel, CLIPProcessor

        dev = device or ("cuda" if torch.cuda.is_available() else "cpu")
        # per-worker init: one weight load per Python worker process
        model = CLIPModel.from_pretrained(model_name).to(dev).eval()
        processor = CLIPProcessor.from_pretrained(model_name)
        for pdf in batches:
            pdf = pdf.copy()
            blobs = pdf[content_col].tolist()
            vecs: list[list[float]] = []
            for i in range(0, len(blobs), batch_size):
                chunk = blobs[i : i + batch_size]
                images = [
                    Image.open(io.BytesIO(bytes(b))).convert("RGB")
                    for b in chunk
                ]
                inputs = processor(images=images, return_tensors="pt").to(dev)
                with torch.no_grad():
                    feats = model.get_image_features(**inputs)
                feats = feats / feats.norm(dim=-1, keepdim=True)
                vecs.extend(feats.cpu().double().numpy().tolist())
            pdf["embedding"] = vecs
            yield pdf

    return df.mapInPandas(embed, schema=out_schema)


def resize_image(
    df: DataFrame,
    width: int,
    height: int,
    content_col: str = "content",
    fmt: str = "PNG",
) -> DataFrame:
    """Image resize over binary columns (O19-adjacent): decode bytes,
    bicubic-resize to (width, height), re-encode as `fmt`, and append
    img_width/img_height metadata. Pillow decodes inside a mapInPandas
    kernel (bytes in → bytes out, bounded Arrow batches — the image
    never round-trips through Python rows one at a time). Gated with
    NotImplementedError where Pillow is absent."""
    try:
        import PIL  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image resize requires Pillow (not in this container); the "
            "deterministic pipeline path is embed_binary_deterministic"
        ) from e

    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    out_schema = f"{fields}, img_width int, img_height int"

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        from PIL import Image

        for pdf in batches:
            pdf = pdf.copy()
            out_bytes: list[bytes] = []
            for b in pdf[content_col].tolist():
                img = Image.open(io.BytesIO(bytes(b))).convert("RGB")
                img = img.resize((width, height), Image.BICUBIC)
                buf = io.BytesIO()
                img.save(buf, format=fmt)
                out_bytes.append(buf.getvalue())
            pdf[content_col] = out_bytes
            pdf["img_width"] = width
            pdf["img_height"] = height
            yield pdf

    return df.mapInPandas(resize, schema=out_schema)


def frame_sample(
    df: DataFrame,
    n_frames: int = 4,
    content_col: str = "content",
    key_col: str = "key",
) -> DataFrame:
    """Video frame sampling as a flat-map: one input blob → n_frames
    rows (key, frame_idx, frame binary). The real decoder (ffmpeg/
    pyav) is absent, so frames are deterministic byte-slices of the
    blob — the PLUMBING (mapInPandas fan-out, schema, bounded Arrow
    batches) is the real contract; swap `slice_frames` for a decoder
    on a cluster that has one.

    Scale: fan-out happens executor-side (no shuffle); a 1h video
    becomes rows in the same partition, and downstream embed stages
    see plain binary rows."""
    import pandas as pd

    def slice_frames(blob: bytes, n: int) -> list[bytes]:
        if not blob:
            return [b""] * n
        step = max(len(blob) // n, 1)
        return [blob[i * step : (i + 1) * step] or blob[-step:] for i in range(n)]

    def fan_out(batches):
        for pdf in batches:
            out = {"key": [], "frame_idx": [], "frame": []}
            for _, row in pdf.iterrows():
                blob = bytes(row[content_col]) if row[content_col] is not None else b""
                for i, fr in enumerate(slice_frames(blob, n_frames)):
                    out["key"].append(row[key_col])
                    out["frame_idx"].append(i)
                    out["frame"].append(fr)
            yield pd.DataFrame(out)

    return df.select(key_col, content_col).mapInPandas(
        fan_out, schema="key string, frame_idx int, frame binary"
    )


def audio_features_deterministic(
    df: DataFrame, n_mfcc: int = 13, content_col: str = "content"
) -> DataFrame:
    """Audio feature extraction stub: real MFCCs need librosa/ffmpeg;
    this derives a deterministic n_mfcc-dim feature vector from byte
    statistics of fixed-size chunks (content-addressed, normalized) so
    the pipeline shape — binary → fixed-dim float features — is fully
    testable."""
    import numpy as np
    import pandas as pd

    def feats(batches):
        for pdf in batches:
            out = []
            for blob in pdf[content_col]:
                b = np.frombuffer(bytes(blob or b"\x00"), dtype=np.uint8).astype(np.float64)
                chunks = np.array_split(b, n_mfcc)
                v = np.array([c.mean() if len(c) else 0.0 for c in chunks])
                n = np.linalg.norm(v)
                out.append((v / n if n > 0 else v).tolist())
            pdf = pdf.copy()
            pdf["features"] = out
            yield pdf

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    return df.mapInPandas(feats, schema=f"{fields}, features array<double>")


def image_meta_stats(multimodal: DataFrame) -> DataFrame:
    """Typed-metadata aggregation over a multimodal table: per-modality
    count + total bytes — pure column ops over the map column."""
    return (
        multimodal.groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.element_at("meta", "length").cast("long")).alias("total_bytes"),
        )
    )
