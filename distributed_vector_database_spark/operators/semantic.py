"""Text→vector semantic search — the reference's CLIP text path
(O20 text2vec, clip/embedding.py:70-93; O22 text_search,
clip/db_operation.py:123-161) with a pluggable embedder.

The real CLIP text tower needs torch+transformers (absent here); the
deterministic hash-projection embedder carries the full contract
(fixed dim, L2-normalized, content-addressed: same text → same vector
on driver and executors alike), so the composition — embed query →
k-NN over an embedded corpus → project metadata — is real and tested.
Swap `text2vec`/`embed_text_column` for the CLIP versions on a cluster
with the model and nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributed_vector_database_spark.config import DEFAULT_TOP_K
from distributed_vector_database_spark.operators.knn import knn_exact


def text2vec(text: str, dim: int = 64) -> list[float]:
    """Driver-side query embedding (O20): deterministic hash projection,
    L2-normalized like the CLIP embedder (clip/embedding.py:89)."""
    import pandas as pd

    from distributed_vector_database_spark.operators.multimodal import (
        _hash_projection_embed,
    )

    return list(_hash_projection_embed(pd.Series([text.encode("utf-8")]), dim)[0])


def embed_text_column(
    df: DataFrame, text_col: str = "text", dim: int = 64
) -> DataFrame:
    """Executor-side corpus embedding: Arrow-batched mapInPandas, model
    state initialized once per worker (the CLIP-on-executors pattern,
    SURVEY O19-O20). Produces exactly text2vec's vectors."""
    import pandas as pd

    from distributed_vector_database_spark.operators.multimodal import (
        _hash_projection_embed,
    )

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema = f"{fields}, embedding array<double>"
    # _hash_projection_embed is a by-value (nested) closure — capturing
    # it here ships the kernel self-contained, no package import on
    # executors (see multimodal._make_hash_embed)
    _embedder = _hash_projection_embed

    def embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            blobs = pdf[text_col].map(lambda t: (t or "").encode("utf-8"))
            pdf["embedding"] = _embedder(blobs, dim)
            yield pdf

    return df.mapInPandas(embed, schema=out_schema)


def embed_text_clip(
    df: DataFrame,
    text_col: str = "text",
    model_name: str = "openai/clip-vit-base-patch32",
    batch_size: int = 64,
    device: str | None = None,
    max_length: int = 77,
) -> DataFrame:
    """Real CLIP text tower (O20): `get_text_features`, L2-normalized
    512-d, matching the reference text embedder's contract
    (clip/embedding.py:70-93) — batched through mapInPandas with
    one weight load per Python worker instead of the reference's
    per-call singleton on one process. Truncates to the CLIP context
    window (77 tokens). Gated with NotImplementedError where
    torch+transformers are absent; `embed_text_column` is the
    deterministic stand-in that keeps the composition testable."""
    try:
        import torch  # noqa: F401
        import transformers  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "CLIP text embedding requires torch+transformers (not in "
            "this container). Use embed_text_column for the pipeline "
            "contract; this path runs as-is on a cluster with the "
            "model baked in."
        ) from e

    import pandas as pd

    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    out_schema = f"{fields}, embedding array<double>"

    def embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import torch
        from transformers import CLIPModel, CLIPTokenizerFast

        dev = device or ("cuda" if torch.cuda.is_available() else "cpu")
        model = CLIPModel.from_pretrained(model_name).to(dev).eval()
        tok = CLIPTokenizerFast.from_pretrained(model_name)
        for pdf in batches:
            pdf = pdf.copy()
            texts = [(t or "") for t in pdf[text_col].tolist()]
            vecs: list[list[float]] = []
            for i in range(0, len(texts), batch_size):
                inputs = tok(
                    texts[i : i + batch_size],
                    padding=True,
                    truncation=True,
                    max_length=max_length,
                    return_tensors="pt",
                ).to(dev)
                with torch.no_grad():
                    feats = model.get_text_features(**inputs)
                feats = feats / feats.norm(dim=-1, keepdim=True)
                vecs.extend(feats.cpu().double().numpy().tolist())
            pdf["embedding"] = vecs
            yield pdf

    return df.mapInPandas(embed, schema=out_schema)


def expr_text_embed(text_col, dim: int = 32):
    """Pure-Catalyst text embedder: per-dimension md5-derived
    pseudo-uniform in [-1, 1), L2-normalized.

    The alternative tier next to the pluggable CLIP-contract embedder
    above: it runs entirely JVM-side (codegen'd column expressions — no
    Python workers, no Arrow transfer, embarrassingly parallel at any
    scale) and is bit-reproducible in ANSI SQL, so the full O20+O22
    composition (embed corpus → embed query → k-NN → project metadata)
    gets a DuckDB hash-matched anchor (`text_knn_expr`). Semantics are
    hash-projection, not learned — the CLIP hook stays the production
    embedder; this is the verifiable plumbing tier."""
    from pyspark.sql import Column

    from distributed_vector_database_spark.functions.vector import normalize

    c = F.col(text_col) if not isinstance(text_col, Column) else text_col
    u = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.conv(
            F.substring(F.md5(F.concat(c, F.lit("|"), i.cast("string"))), 1, 8),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
        * F.lit(2.0)
        - F.lit(1.0),
    )
    return normalize(u)


def text_search(
    corpus: DataFrame,
    query_text: str,
    top_k: int = DEFAULT_TOP_K,
    key_col: str = "doc_id",
    vec_col: str = "embedding",
    project_cols: Sequence[str] = ("source",),
    dim: int = 64,
    predicate=None,
    threshold: float | None = None,
) -> DataFrame:
    """O22: text2vec(query) → distributed k-NN → project metadata
    columns with the score (the {file_path, score} projection of
    clip/db_operation.py:148-158). `predicate`/`threshold` pass
    through to knn_exact — the search-RPC parameters the reference
    declares (src/vector_db.thrift:26-27) surface here too, so every
    entry point (CLI, HTTP facade, this operator) honors them."""
    qvec = text2vec(query_text, dim)
    return knn_exact(
        corpus,
        qvec,
        k=top_k,
        key_col=key_col,
        vec_col=vec_col,
        predicate=predicate,
        threshold=threshold,
        extra_cols=tuple(project_cols),
    )
