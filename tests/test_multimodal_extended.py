"""Frame sampling / audio features / resize gating — the multimodal
plumbing beyond embedding (brief: decode steps stubbed, Spark-side
schema/batching real)."""

import numpy as np
import pytest

from distributed_vector_database_spark.operators.multimodal import (
    audio_features_deterministic,
    frame_sample,
    resize_image,
)


def _blobs(spark):
    return spark.createDataFrame(
        [("vid1", bytes(range(64))), ("vid2", b"\x07" * 100), ("empty", b"")],
        "key string, content binary",
    )


def test_frame_sample_fanout(spark):
    out = frame_sample(_blobs(spark), n_frames=4).collect()
    assert len(out) == 12  # 3 blobs x 4 frames
    by_key = {}
    for r in out:
        by_key.setdefault(r["key"], []).append(r)
    for key, rows in by_key.items():
        assert sorted(r["frame_idx"] for r in rows) == [0, 1, 2, 3]
    # deterministic slicing: vid1 frames tile the original bytes
    v1 = sorted(by_key["vid1"], key=lambda r: r["frame_idx"])
    assert b"".join(bytes(r["frame"]) for r in v1) == bytes(range(64))


def test_audio_features_contract(spark):
    rows = {
        r["key"]: r["features"]
        for r in audio_features_deterministic(_blobs(spark)).collect()
    }
    assert all(len(v) == 13 for v in rows.values())
    assert abs(np.linalg.norm(rows["vid1"]) - 1.0) < 1e-9
    # content-addressed: re-running yields identical features
    rows2 = {
        r["key"]: r["features"]
        for r in audio_features_deterministic(_blobs(spark)).collect()
    }
    assert rows == rows2


def test_resize_gated_without_pil(spark):
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow present; gating not applicable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        resize_image(_blobs(spark), 224, 224)


def _pil_present() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _pil_present(), reason="Pillow absent")
def test_resize_real_path(spark):
    import io

    from PIL import Image

    img = Image.new("RGB", (64, 48), (10, 200, 30))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    df = spark.createDataFrame(
        [("k", buf.getvalue())], "key string, content binary"
    )
    out = resize_image(df, 224, 224).collect()
    assert out[0]["img_width"] == 224 and out[0]["img_height"] == 224
    round_trip = Image.open(io.BytesIO(bytes(out[0]["content"])))
    assert round_trip.size == (224, 224)
