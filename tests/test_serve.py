"""Tests for the O23 HTTP serving facade (serve.py): the handler is
driven directly as a plain function — no server, no fastapi needed —
exactly the import-gate discipline of the CLIP path. Reference
contract: clip/backend.py:37-57."""

import pytest

from distributed_vector_database_spark.serve import (
    DEFAULT_TOPK,
    MAX_TOPK,
    create_app,
    make_search_fn,
    search_handler,
)
from distributed_vector_database_spark.sources.fixtures import load_tables
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def search_fn(spark):
    emb = load_tables(spark, SF_DIR)["embeddings"]
    return make_search_fn(
        emb, key_col="vec_id", vec_col="embedding", project_cols=("label",)
    )


def test_search_handler_success_shape(search_fn):
    body, status = search_handler(search_fn, {"text": "blue sky", "topk": 3})
    assert status == 200
    assert body["success"] is True
    assert len(body["results"]) == 3
    first = body["results"][0]
    assert {"vec_id", "label", "score"} <= set(first)
    # ascending distance order (reference returns best match first)
    scores = [r["score"] for r in body["results"]]
    assert scores == sorted(scores)


def test_search_handler_defaults_topk(search_fn):
    body, status = search_handler(search_fn, {"text": "anything"})
    assert status == 200 and len(body["results"]) == DEFAULT_TOPK


def test_search_handler_results_are_json_safe(search_fn):
    import json

    body, _ = search_handler(search_fn, {"text": "x", "topk": 2})
    json.dumps(body)  # must not raise (no Row/ndarray leakage)


def test_search_handler_error_contract(search_fn):
    # non-object payload -> 500 with the reference's error shape
    body, status = search_handler(search_fn, "not a dict")
    assert status == 500
    assert body == {
        "success": False,
        "results": [],
        "error": "request body must be a JSON object",
    }
    body, status = search_handler(search_fn, {"text": "x", "topk": 0})
    assert status == 500 and body["success"] is False
    body, status = search_handler(search_fn, {"text": "x", "topk": "NaN"})
    assert status == 500 and body["success"] is False


def test_search_handler_caps_topk(search_fn):
    # a huge topk must not become a corpus download: capped, not error
    body, status = search_handler(
        search_fn, {"text": "x", "topk": 10_000_000}
    )
    assert status == 200
    assert len(body["results"]) <= MAX_TOPK


def test_create_app_import_gate(search_fn):
    try:
        import fastapi  # noqa: F401

        have_fastapi = True
    except ImportError:
        have_fastapi = False
    if have_fastapi:
        app = create_app(search_fn)
        paths = {r.path for r in app.routes}
        assert "/api/search" in paths
    else:
        with pytest.raises(NotImplementedError, match="fastapi"):
            create_app(search_fn)
