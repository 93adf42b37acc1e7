from tailpipe_spark.operators.multimodal import (
    ASSET_SCHEMA,
    extract_features,
    resize_images,
    sample_frames,
)


def _assets(spark):
    rows = [
        (1, "image", "image/png", b"\x89PNG fake bytes", {"width": 64, "height": 48, "duration_ms": None, "sample_rate": None}),
        (2, "audio", "audio/wav", b"RIFF fake wav", {"width": None, "height": None, "duration_ms": 2500, "sample_rate": 16000}),
        (3, "video", "video/mp4", b"\x00\x00ftyp fake", {"width": 320, "height": 240, "duration_ms": 3500, "sample_rate": None}),
    ]
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def test_extract_features_arrow_batched(spark):
    out = extract_features(_assets(spark)).collect()
    by_id = {r["asset_id"]: r for r in out}
    assert len(by_id) == 3
    assert by_id[1]["payload_bytes"] == 15
    assert len(by_id[1]["feature"]) == 8
    # deterministic: same payload → same checksum+feature on re-run
    again = {r["asset_id"]: r for r in extract_features(_assets(spark)).collect()}
    assert again[2]["checksum"] == by_id[2]["checksum"]
    assert again[2]["feature"] == by_id[2]["feature"]


def test_resize_images_only_images(spark):
    out = resize_images(_assets(spark), 32, 32).collect()
    assert len(out) == 1
    assert out[0]["asset_id"] == 1
    assert out[0]["meta"]["width"] == 32


def test_sample_frames(spark):
    out = sample_frames(_assets(spark), every_ms=1000).collect()
    # 3500ms video at 1000ms cadence → 3 frames (0,1000,2000)
    assert [r["frame_ts_ms"] for r in sorted(out, key=lambda r: r["frame_no"])] == [0, 1000, 2000]


def test_resample_audio_only_audio(spark):
    from tailpipe_spark.operators.multimodal import resample_audio

    out = resample_audio(_assets(spark), 8000).collect()
    assert len(out) == 1
    assert out[0]["asset_id"] == 2
    assert out[0]["meta"]["sample_rate"] == 8000
    assert out[0]["meta"]["duration_ms"] == 2500  # preserved
    assert out[0]["payload"] is not None
