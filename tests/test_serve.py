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


def test_search_handler_filter_narrows_results(search_fn, spark):
    # the filter param the reference declares-but-drops
    # (src/coordinator/handler.py:186-189) is honored: every hit
    # satisfies the metadata equality predicate
    all_body, _ = search_handler(search_fn, {"text": "q", "topk": 5})
    labels = {r["label"] for r in all_body["results"]}
    assert len(labels) > 1  # non-vacuous: unfiltered mixes labels
    want = sorted(labels)[0]
    body, status = search_handler(
        search_fn, {"text": "q", "topk": 5, "filter": {"label": want}}
    )
    assert status == 200
    assert body["results"] and all(
        r["label"] == want for r in body["results"]
    )


def test_search_handler_threshold_cuts_tail(search_fn):
    body, _ = search_handler(search_fn, {"text": "q", "topk": 5})
    scores = [r["score"] for r in body["results"]]
    cut = scores[2]  # keep the best 3 (ties keep more, none here)
    tb, status = search_handler(
        search_fn, {"text": "q", "topk": 5, "threshold": cut}
    )
    assert status == 200
    assert all(r["score"] <= cut for r in tb["results"])
    assert len(tb["results"]) < len(body["results"])


def test_search_handler_rejects_bad_filter_and_threshold(search_fn):
    body, status = search_handler(
        search_fn, {"text": "q", "filter": ["not", "a", "dict"]}
    )
    assert status == 500 and "filter" in body["error"]
    body, status = search_handler(
        search_fn, {"text": "q", "filter": {"label": {"$gt": 1}}}
    )
    assert status == 500 and "filter" in body["error"]
    body, status = search_handler(search_fn, {"text": "q", "threshold": -1})
    assert status == 500 and "threshold" in body["error"]


def test_search_handler_sanitizes_internal_errors(caplog):
    # engine-level failures must not leak plan text / paths to the
    # client; the full exception goes to the server log instead
    def exploding(text, topk, filter=None, threshold=None):
        raise RuntimeError("secret /path/to/warehouse plan details")

    import logging

    with caplog.at_level(logging.ERROR):
        body, status = search_handler(exploding, {"text": "q"})
    assert status == 500
    assert "secret" not in body["error"]
    assert body["error"] == "internal error (see server log)"
    assert any("secret /path" in r.getMessage() or "search_handler" in r.getMessage() for r in caplog.records)
