"""Driver-side HTTP serving facade (O23): the reference's FastAPI
search endpoint re-expressed over the Spark engine.

Reference parity (clip/backend.py:37-57): `POST /api/search` takes
`{"text": ..., "topk": N}`, runs text→vector→k-NN, and answers
`{"success": true, "results": [...]}` — 500 with
`{"success": false, "results": [], "error": ...}` on failure; static
assets are mounted under `/static` (clip/backend.py:30-31).

Spark-first shape: the endpoint is a thin driver-side adapter — the
query itself is the same `semantic.text_search` plan every contract
query uses (distributed k-NN with TakeOrderedAndProject, never a
driver-side scan), and only the FINAL top-k rows (bounded by `topk`)
are collected into the JSON response. The handler is a plain function
so it is testable without fastapi/uvicorn; `create_app` is
import-gated on fastapi exactly like the CLIP gate in
operators/multimodal.py.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame

DEFAULT_TOPK = 5
MAX_TOPK = 1000  # request-side cap: a malicious topk must not turn
# the bounded top-k collect into a full-corpus download


def make_search_fn(
    corpus: DataFrame,
    key_col: str = "doc_id",
    vec_col: str = "embedding",
    project_cols: tuple[str, ...] = ("source",),
    dim: int = 64,
) -> Callable[..., DataFrame]:
    """Bind a corpus into a (text, topk, filter, threshold) ->
    DataFrame search callable over semantic.text_search — the O22 path
    the endpoint serves. `filter` is a dict of column=value equality
    predicates (the CLI's --filter semantics, __main__.py) applied
    BEFORE distance so it pushes to the scan; `threshold` is the max
    squared-L2 score cutoff (src/vector_db.thrift:27)."""
    from pyspark.sql import functions as F

    from distributed_vector_database_spark.operators.semantic import (
        text_search,
    )

    def _search(
        text: str,
        topk: int,
        filter: dict | None = None,
        threshold: float | None = None,
    ) -> DataFrame:
        predicate = None
        for k, v in (filter or {}).items():
            clause = F.col(str(k)) == v
            predicate = clause if predicate is None else predicate & clause
        return text_search(
            corpus,
            text,
            top_k=topk,
            key_col=key_col,
            vec_col=vec_col,
            project_cols=project_cols,
            dim=dim,
            predicate=predicate,
            threshold=threshold,
        )

    return _search


def search_handler(
    search_fn: Callable[..., DataFrame], payload: Any
) -> tuple[dict, int]:
    """The /api/search request handler as a plain function:
    (body, status). Collects only the bounded top-k result rows —
    never the corpus. Mirrors the reference's response contract:
    success + results list, or success=false + error + 500; also
    honors the search parameters the reference declares but drops
    (`filter` metadata equality map, `threshold` max-score cutoff —
    src/vector_db.thrift:26-27, dropped at
    src/coordinator/handler.py:186-189).

    Deliberate deviation from the reference on errors (same
    note-the-tradeoff discipline as the CORS block below): the
    reference returns str(e) verbatim (clip/backend.py:55), which for
    an engine-level failure can leak Spark plan text and filesystem
    paths to external clients. Input-validation errors (ValueError —
    messages this handler writes itself) keep their text; everything
    else logs the full exception server-side and answers a generic
    'internal error'."""
    try:
        if not isinstance(payload, dict):
            raise ValueError("request body must be a JSON object")
        text = str(payload.get("text", ""))
        topk = int(payload.get("topk", DEFAULT_TOPK))
        if topk <= 0:
            raise ValueError("topk must be positive")
        topk = min(topk, MAX_TOPK)
        flt = payload.get("filter")
        if flt is not None and (
            not isinstance(flt, dict)
            or any(isinstance(v, (dict, list)) for v in flt.values())
        ):
            raise ValueError("filter must be a flat object of column: value")
        threshold = payload.get("threshold")
        if threshold is not None:
            threshold = float(threshold)
            if threshold < 0:
                raise ValueError("threshold must be non-negative")
        # pass the optional params only when the request carries them:
        # a plain (text, topk) search_fn wired before these params
        # existed keeps working for every plain request, and a request
        # that DOES use them against such a backend fails with a clear
        # message instead of a swallowed TypeError
        kwargs = {}
        if flt is not None:
            kwargs["filter"] = flt
        if threshold is not None:
            kwargs["threshold"] = threshold
        try:
            df = search_fn(text, topk, **kwargs)
        except TypeError as e:
            if kwargs and "argument" in str(e):
                raise ValueError(
                    "this search backend does not support "
                    f"{sorted(kwargs)} parameters"
                ) from e
            raise
        rows = df.collect()
        return {
            "success": True,
            "results": [r.asDict(recursive=True) for r in rows],
        }, 200
    except ValueError as e:  # our own validation text — safe to echo
        return {"success": False, "results": [], "error": str(e)}, 500
    except Exception:
        import logging

        logging.getLogger(__name__).exception("search_handler failed")
        return {
            "success": False,
            "results": [],
            "error": "internal error (see server log)",
        }, 500


def create_app(
    search_fn: Callable[..., DataFrame],
    static_dir: str | None = None,
):
    """FastAPI app over search_handler — import-gated: environments
    without fastapi still get the full handler surface above; this
    raises with the install hint only when an actual server is asked
    for (the multimodal torch-gate discipline)."""
    try:
        from fastapi import FastAPI, Request
        from fastapi.responses import JSONResponse
    except ImportError as e:
        raise NotImplementedError(
            "HTTP serving requires fastapi (pip install fastapi uvicorn); "
            "the handler itself is importable without it: "
            "distributed_vector_database_spark.serve.search_handler"
        ) from e

    app = FastAPI()
    try:
        from starlette.middleware.cors import CORSMiddleware

        # deliberate deviation from the reference (clip/backend.py:21-27
        # sets allow_credentials=True with the wildcard): Starlette
        # resolves that combination by ECHOING the request Origin, which
        # grants every site credentialed cross-origin access — a full
        # CORS bypass if the deployment ever sits behind cookie auth.
        # The facade serves anonymous search; credentials stay off.
        app.add_middleware(
            CORSMiddleware,
            allow_origins=["*"],
            allow_credentials=False,
            allow_methods=["*"],
            allow_headers=["*"],
        )
    except ImportError:
        pass

    if static_dir is not None:
        from fastapi.staticfiles import StaticFiles

        app.mount("/static", StaticFiles(directory=static_dir), name="static")

    @app.post("/api/search")
    async def search(request: Request):  # pragma: no cover - needs server
        try:
            payload = await request.json()
        except Exception:
            payload = None
        body, status = search_handler(search_fn, payload)
        return JSONResponse(body, status_code=status)

    return app
