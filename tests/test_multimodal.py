"""Multimodal column plumbing: metadata, resize, stubbed audio/video."""

import pytest
from pyspark.sql import functions as F

from google_vision_ocr_spark import formats


@pytest.fixture(scope="module")
def media_df(spark):
    gray = formats.rgb_to_gray(formats.render_page_rgb("media payload text"))
    rows = [
        ("u:png", formats.encode_png(gray)),
        ("u:rgb", formats.encode_png(formats.render_page_rgb("rgb"))),
        ("u:bmp", formats.encode_bmp_gray(gray)),
        ("u:gif", formats.encode_gif_gray(gray)),
        ("u:junk", b"\x00\x01junk"),
    ]
    return spark.createDataFrame(rows, ["url", "html"])


def test_image_metadata(media_df):
    from google_vision_ocr_spark.operators.multimodal import image_metadata

    got = {r["url"]: r["image_meta"] for r in image_metadata(media_df).collect()}
    assert got["u:png"]["format"] == "PNG" and got["u:png"]["channels"] == 1
    assert got["u:rgb"]["channels"] == 3
    assert got["u:bmp"]["format"] == "BMP"
    assert got["u:png"]["width"] == formats.PAGE_WIDTH
    assert got["u:junk"]["format"] == "UNKNOWN" and got["u:junk"]["width"] is None
    assert got["u:png"]["n_bytes"] > 0


def test_resize_images(media_df):
    from google_vision_ocr_spark.operators.multimodal import resize_images

    got = {r["url"]: r["resized"] for r in resize_images(media_df, target_width=16).collect()}
    ct, arr = formats.decode_png(bytes(got["u:png"]))
    assert ct == 0 and arr.shape[1] == 16
    assert got["u:junk"] is None  # undecodable → null, not crash


def test_audio_metadata_fake_and_stub(spark, media_df):
    from google_vision_ocr_spark.operators.multimodal import make_audio_metadata_udf

    out = media_df.select("url", make_audio_metadata_udf(fake=True)(F.col("html")).alias("m"))
    rows = {r["url"]: r["m"] for r in out.collect()}
    assert all(m["sample_rate"] in (16000, 44100) for m in rows.values())
    assert all(abs(m["duration_s"] - m["n_samples"] / m["sample_rate"]) < 1e-5
               for m in rows.values())
    # deterministic across runs
    rows2 = {r["url"]: r["m"] for r in out.collect()}
    assert rows == rows2
    # the non-fake path marks the real decode call site
    with pytest.raises(Exception, match="NotImplementedError|ffmpeg|soundfile"):
        media_df.select(make_audio_metadata_udf(fake=False)(F.col("html"))).collect()


def test_video_frame_sampling_explode_shape(media_df):
    from google_vision_ocr_spark.operators.multimodal import sample_video_frames

    out = sample_video_frames(media_df, every_n=2).collect()
    by_url = {}
    for r in out:
        by_url.setdefault(r["url"], []).append(r["frame_idx"])
    assert set(by_url) == {r["url"] for r in media_df.collect()}
    for idxs in by_url.values():
        assert idxs == sorted(idxs) and all(i % 2 == 0 for i in idxs)
    # frames deterministic
    again = sample_video_frames(media_df, every_n=2).collect()
    assert {(r["url"], r["frame_idx"], bytes(r["frame"])) for r in out} == \
           {(r["url"], r["frame_idx"], bytes(r["frame"])) for r in again}


def test_embedding_near_dup_pairs_with_planted_dup(spark):
    from google_vision_ocr_spark.operators.similarity import embedding_near_dup_pairs

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dup = e.filter(F.col("vec_id") == 3).select(
        (F.col("vec_id") + 50000).alias("vec_id"), "embedding", "label"
    )
    pairs = embedding_near_dup_pairs(e.unionByName(dup), threshold=0.99).collect()
    assert any(r["id_a"] == 3 and r["id_b"] == 50003 and r["cos_sim"] == 1.0 for r in pairs)
    # random embeddings are near-orthogonal: nothing else above 0.99
    assert all(r["id_b"] == 50003 for r in pairs)
