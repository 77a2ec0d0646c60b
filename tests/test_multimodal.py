"""Multimodal binary-column plumbing: schemas, determinism, 1->N frames."""

import pytest

from crabspark import multimodal as M
from crabspark.shipping import ship_package
from tests.sparkutil import get_spark


@pytest.fixture(scope="module")
def media(request):
    spark = get_spark()
    ship_package(spark)
    rows = [
        (1, "image", b"\x89PNG fake bytes 1", "https://a.com/1.png", "image/png"),
        (2, "image", b"\x89PNG fake bytes 2", "https://a.com/2.png", "image/png"),
        (3, "video", b"\x00\x00ftyp fake mp4", "https://a.com/v.mp4", "video/mp4"),
        (4, "audio", b"RIFF fake wav", "https://a.com/a.wav", "audio/wav"),
        (5, "image", None, "https://a.com/missing.png", "image/png"),
    ]
    return spark, spark.createDataFrame(rows, M.MEDIA_SCHEMA)


def test_decode_meta(media):
    spark, df = media
    out = {r["media_id"]: r for r in M.decode_meta(df).collect()}
    assert len(out) == 5
    assert out[3]["n_frames"] > 1           # video has frames
    assert out[1]["n_frames"] == 1          # image: single frame
    assert out[4]["duration_ms"] > 0        # audio has duration
    assert out[1]["n_bytes"] == 17
    # deterministic across runs
    again = {r["media_id"]: r for r in M.decode_meta(df).collect()}
    assert out[1]["width"] == again[1]["width"]


def test_image_features_shape(media):
    spark, df = media
    rows = M.image_features(df).collect()
    assert all(len(r["embedding"]) == M.FEATURE_DIM for r in rows)
    by_id = {r["media_id"]: r["embedding"] for r in rows}
    assert by_id[1] != by_id[2]           # content-dependent
    rows2 = {r["media_id"]: r["embedding"] for r in M.image_features(df).collect()}
    assert by_id == rows2                  # deterministic


def test_resize_stub_tags(media):
    spark, df = media
    rows = M.resize_images(df, 64, 64).collect()
    assert all(bytes(r["media"]).startswith(b"RSZ64x64:") for r in rows)
    assert all(r["width"] == 64 for r in rows)


def test_sample_frames_explodes_videos_only(media):
    spark, df = media
    rows = M.sample_frames(df, every_n=10).collect()
    assert rows
    assert {r["media_id"] for r in rows} == {3}
    idxs = sorted(r["frame_idx"] for r in rows)
    assert idxs[0] == 0 and all(i % 10 == 0 for i in idxs)
    assert all(len(bytes(r["frame"])) == 20 for r in rows)  # sha1 stub
