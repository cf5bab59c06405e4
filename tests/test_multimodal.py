"""Multimodal binary-column plumbing: schema, mapInPandas batch shape,
feature extraction, resize metadata, frame sampling."""

import numpy as np

from lantern_spark.operators.multimodal import (
    image_features,
    media_schema,
    resize_images,
    sample_frames,
    synthetic_media_df,
)


class TestMultimodal:
    def test_schema(self):
        s = media_schema()
        assert [f.name for f in s.fields] == ["media_id", "content", "meta"]
        assert s["content"].dataType.typeName() == "binary"

    def test_image_features_shape_and_determinism(self, spark):
        df = synthetic_media_df(spark, n=16)
        out = image_features(df, dim=16)
        rows = out.select("media_id", "features").orderBy("media_id").collect()
        assert len(rows) == 16
        for r in rows:
            assert len(r["features"]) == 16
        # deterministic: same content → same features across runs
        rows2 = (
            image_features(synthetic_media_df(spark, n=16), dim=16)
            .select("media_id", "features")
            .orderBy("media_id")
            .collect()
        )
        for a, b in zip(rows, rows2):
            assert np.allclose(a["features"], b["features"])

    def test_features_feed_knn(self, spark):
        """Features are a normal vector column downstream — exact KNN
        over extracted features must run end-to-end."""
        from lantern_spark.operators.knn import knn_search

        feats = image_features(synthetic_media_df(spark, n=16), dim=16)
        q = feats.select("features").first()["features"]
        top = knn_search(
            feats, "features", list(q), k=3, metric="l2sq",
            tie_break="media_id",
        ).collect()
        assert len(top) == 3
        assert top[0]["dist"] == 0.0  # the query row itself

    def test_resize_updates_meta(self, spark):
        df = synthetic_media_df(spark, n=4)
        out = resize_images(df, 32, 24).select("meta").first()["meta"]
        assert (out["width"], out["height"]) == (32, 24)
        assert out["media_type"] == "image"

    def test_sample_frames_grid(self, spark):
        df = synthetic_media_df(spark, n=5, media_type="video")
        rows = (
            sample_frames(df, every_ms=500)
            .select("media_id", "meta.duration_ms", "frame_offsets_ms")
            .orderBy("media_id")
            .collect()
        )
        for r in rows:
            offs = r["frame_offsets_ms"]
            assert offs[0] == 0
            assert all(b - a == 500 for a, b in zip(offs, offs[1:]))
            assert offs[-1] < r["duration_ms"]

    def test_null_content(self, spark):
        df = spark.createDataFrame(
            [(99, None, ("image", "fake", 8, 8, None))], media_schema()
        )
        row = image_features(df, dim=8).select("features").first()
        assert row["features"] is None


class TestAudio:
    def test_audio_features_shape_and_determinism(self, spark):
        from lantern_spark.operators.multimodal import (
            audio_features,
            synthetic_media_df,
        )

        df = synthetic_media_df(spark, n=8, media_type="audio")
        rows = (
            audio_features(df, n_bands=8, n_frames=4)
            .select("media_id", "audio_features")
            .orderBy("media_id")
            .collect()
        )
        assert len(rows) == 8
        for r in rows:
            assert len(r["audio_features"]) == 32  # 4 frames × 8 bands
        rows2 = (
            audio_features(
                synthetic_media_df(spark, n=8, media_type="audio"),
                n_bands=8,
                n_frames=4,
            )
            .select("media_id", "audio_features")
            .orderBy("media_id")
            .collect()
        )
        import numpy as np

        for a, b in zip(rows, rows2):
            assert np.allclose(a["audio_features"], b["audio_features"])

    def test_audio_features_feed_knn(self, spark):
        from lantern_spark.operators.knn import knn_search
        from lantern_spark.operators.multimodal import (
            audio_features,
            synthetic_media_df,
        )

        feats = audio_features(
            synthetic_media_df(spark, n=8, media_type="audio")
        )
        q = feats.select("audio_features").first()["audio_features"]
        top = knn_search(
            feats, "audio_features", list(q), k=2, tie_break="media_id"
        ).collect()
        assert top[0]["dist"] == 0.0
