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
) -> Callable[[str, int], DataFrame]:
    """Bind a corpus into a (text, topk) -> DataFrame search callable
    over semantic.text_search — the O22 path the endpoint serves."""
    from distributed_vector_database_spark.operators.semantic import (
        text_search,
    )

    def _search(text: str, topk: int) -> DataFrame:
        return text_search(
            corpus,
            text,
            top_k=topk,
            key_col=key_col,
            vec_col=vec_col,
            project_cols=project_cols,
            dim=dim,
        )

    return _search


def search_handler(
    search_fn: Callable[[str, int], DataFrame], payload: Any
) -> tuple[dict, int]:
    """The /api/search request handler as a plain function:
    (body, status). Collects only the bounded top-k result rows —
    never the corpus. Mirrors the reference's response contract:
    success + results list, or success=false + error + 500."""
    try:
        if not isinstance(payload, dict):
            raise ValueError("request body must be a JSON object")
        text = str(payload.get("text", ""))
        topk = int(payload.get("topk", DEFAULT_TOPK))
        if topk <= 0:
            raise ValueError("topk must be positive")
        topk = min(topk, MAX_TOPK)
        rows = search_fn(text, topk).collect()
        return {
            "success": True,
            "results": [r.asDict(recursive=True) for r in rows],
        }, 200
    except Exception as e:  # reference returns the message verbatim
        return {"success": False, "results": [], "error": str(e)}, 500


def create_app(
    search_fn: Callable[[str, int], DataFrame],
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
