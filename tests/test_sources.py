"""fvecs/ivecs/bvecs parse tests (FIXTURES.md F8, dotvecs.rs parity)
and multimodal plumbing tests."""

import numpy as np
import pytest

from lantern_spark.sources.vecfiles import decode_vecs_bytes, read_vecs, write_vecs


@pytest.mark.parametrize(
    "kind,vecs",
    [
        ("fvecs", [[1.5, -2.0, 3.25, 0.0], [4.0, 5.0, 6.0, 7.0], [0.5, 0.5, 0.5, 0.5]]),
        ("ivecs", [[1, -2, 3, 4], [5, 6, 7, 8], [9, 10, 11, 12]]),
        ("bvecs", [[0, 255, 128, 1], [2, 3, 4, 5], [6, 7, 8, 9]]),
    ],
)
def test_vecs_roundtrip(spark, tmp_path, kind, vecs):
    p = str(tmp_path / f"test.{kind}")
    write_vecs(vecs, p, kind)
    out = read_vecs(spark, p, kind).orderBy("row_id").collect()
    assert len(out) == 3
    for r, expect in zip(out, vecs):
        assert list(r.vec) == pytest.approx(expect)


def test_corrupt_record_raises(spark, tmp_path):
    p = str(tmp_path / "bad.fvecs")
    with open(p, "wb") as f:
        f.write(np.int32(100).tobytes())  # dim=100 but no payload
        f.write(b"\x01\x02")
    with pytest.raises(Exception) as exc:
        read_vecs(spark, p, "fvecs").collect()
    assert "corrupt" in str(exc.value) or "ValueError" in str(exc.value)


def test_multimodal_features(spark):
    from lantern_spark.operators.multimodal import image_features, synthetic_media_df

    df = synthetic_media_df(spark, n=8)
    out = image_features(df, dim=16).collect()
    assert len(out) == 8
    assert all(len(r.features) == 16 for r in out)
    # deterministic
    out2 = image_features(synthetic_media_df(spark, n=8), dim=16).collect()
    assert [r.features for r in out] == [r.features for r in out2]


def test_multimodal_resize_and_frames(spark):
    from lantern_spark.operators.multimodal import (
        resize_images,
        sample_frames,
        synthetic_media_df,
    )

    df = synthetic_media_df(spark, n=4, media_type="video")
    r = resize_images(df, 32, 24).select("meta").first().meta
    assert (r.width, r.height) == (32, 24)
    fr = sample_frames(df, every_ms=500).collect()
    for row in fr:
        assert row.frame_offsets_ms[0] == 0
        assert all(b - a == 500 for a, b in zip(row.frame_offsets_ms, row.frame_offsets_ms[1:]))
        assert len(row.frame_offsets_ms) == (row.meta.duration_ms + 499) // 500
