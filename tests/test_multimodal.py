"""Multimodal plumbing: binary source, deterministic embed stub, the
CLIP hook's gating (SURVEY §2.3 contract: decode stubbed, Spark-side
schema/partitioning/UDF plumbing real and tested)."""

import pytest

from distributed_vector_database_spark.operators.multimodal import (
    embed_binary_clip,
    embed_binary_deterministic,
    image_meta_stats,
    read_binary_dir,
)


@pytest.fixture()
def blob_dir(tmp_path):
    (tmp_path / "cat_photo.jpg").write_bytes(b"\xff\xd8fakejpegbytes")
    (tmp_path / "dog.png").write_bytes(b"\x89PNGfakebytes")
    return str(tmp_path)


def test_read_binary_dir_key_is_basename(spark, blob_dir):
    # key = basename sans extension (clip/db_operation.py:61)
    df = read_binary_dir(spark, blob_dir)
    rows = {r["key"]: r for r in df.collect()}
    assert set(rows) == {"cat_photo", "dog"}
    meta = rows["cat_photo"]["meta"]
    assert meta["type"] == "image" and meta["file_path"].endswith("cat_photo.jpg")


def test_embed_deterministic_contract(spark, blob_dir):
    df = embed_binary_deterministic(read_binary_dir(spark, blob_dir), dim=32)
    rows = df.select("key", "embedding").collect()
    assert all(len(r["embedding"]) == 32 for r in rows)
    # L2-normalized like the CLIP embedder (clip/embedding.py:64)
    import numpy as np

    for r in rows:
        assert abs(np.linalg.norm(r["embedding"]) - 1.0) < 1e-9


def test_embed_deterministic_is_content_addressed(spark):
    df = spark.createDataFrame(
        [("k1", b"same-bytes"), ("k2", b"same-bytes"), ("k3", b"other")],
        "key string, content binary",
    )
    rows = {
        r["key"]: list(r["embedding"])
        for r in embed_binary_deterministic(df, dim=8).collect()
    }
    assert rows["k1"] == rows["k2"] != rows["k3"]


def test_clip_hook_gated(spark):
    df = spark.createDataFrame([("k", b"x")], "key string, content binary")
    with pytest.raises(NotImplementedError):
        embed_binary_clip(df)


def test_image_meta_stats(spark, blob_dir):
    stats = image_meta_stats(read_binary_dir(spark, blob_dir)).collect()
    assert len(stats) == 1
    assert stats[0]["modality"] == "image" and stats[0]["n_items"] == 2


def _torch_stack_present() -> bool:
    try:
        import PIL  # noqa: F401
        import torch  # noqa: F401
        import transformers  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _torch_stack_present(), reason="torch/transformers/Pillow absent"
)
def test_clip_real_image_path(spark):
    # real forward pass: 512-d unit-norm vectors; similar images closer
    # than dissimilar ones. Runs only on clusters with the model stack.
    import io

    import numpy as np
    from PIL import Image

    def png(color):
        img = Image.new("RGB", (32, 32), color)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    df = spark.createDataFrame(
        [("red1", png((255, 0, 0))), ("red2", png((250, 5, 5))),
         ("blue", png((0, 0, 255)))],
        "key string, content binary",
    )
    rows = {
        r["key"]: np.array(r["embedding"])
        for r in embed_binary_clip(df, batch_size=2).collect()
    }
    assert all(v.shape == (512,) for v in rows.values())
    assert all(abs(np.linalg.norm(v) - 1.0) < 1e-5 for v in rows.values())
    assert rows["red1"] @ rows["red2"] > rows["red1"] @ rows["blue"]


@pytest.mark.skipif(
    not _torch_stack_present(), reason="torch/transformers/Pillow absent"
)
def test_clip_real_text_path(spark):
    import numpy as np

    from distributed_vector_database_spark.operators.semantic import (
        embed_text_clip,
    )

    df = spark.createDataFrame(
        [(1, "a photo of a red apple"), (2, "a crimson apple fruit"),
         (3, "quarterly earnings report")],
        "id long, text string",
    )
    rows = {
        r["id"]: np.array(r["embedding"])
        for r in embed_text_clip(df, batch_size=2).collect()
    }
    assert all(v.shape == (512,) for v in rows.values())
    assert all(abs(np.linalg.norm(v) - 1.0) < 1e-5 for v in rows.values())
    assert rows[1] @ rows[2] > rows[1] @ rows[3]
