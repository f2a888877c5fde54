"""Multimodal column tests: raw-codec decode correctness (numpy ground
truth), mapInPandas batch shape, deterministic synthesis, and the stub
contract for compressed codecs."""

from __future__ import annotations

import numpy as np
import pytest

from geomesa_spark.sources import multimodal as MM


def test_synth_deterministic():
    a, b = MM.synth_media_pdf(12), MM.synth_media_pdf(12)
    assert (a["payload"] == b["payload"]).all()
    assert set(a["kind"]) == {"image", "audio", "video"}


def test_raw_decodes_match_numpy():
    pdf = MM.synth_media_pdf(9)
    img_row = pdf[pdf["kind"] == "image"].iloc[0]
    img = MM.decode_image(img_row["payload"], img_row["codec"], img_row["width"], img_row["height"])
    assert img.shape == (img_row["height"], img_row["width"], 3) and img.dtype == np.uint8
    aud_row = pdf[pdf["kind"] == "audio"].iloc[0]
    x = MM.decode_audio(aud_row["payload"], aud_row["codec"])
    assert x.dtype == np.float32 and np.abs(x).max() <= 1.0
    vid_row = pdf[pdf["kind"] == "video"].iloc[0]
    v = MM.decode_video(vid_row["payload"], vid_row["codec"], vid_row["width"], vid_row["height"], vid_row["n_frames"])
    assert v.shape == (vid_row["n_frames"], vid_row["height"], vid_row["width"], 3)


def test_compressed_codecs_raise_not_implemented():
    with pytest.raises(NotImplementedError):
        MM.decode_image(b"\xff\xd8\xff", "jpeg", 1, 1)
    with pytest.raises(NotImplementedError):
        MM.decode_audio(b"ID3", "mp3")
    with pytest.raises(NotImplementedError):
        MM.decode_video(b"x", "h264", 1, 1, 1)


def test_image_features_and_resize(spark):
    media = MM.synth_media(spark, 18)
    feats = MM.image_features(media).toPandas().sort_values("media_id")
    assert len(feats) == 6  # every third row is an image
    assert ((feats[["mean_r", "mean_g", "mean_b"]] >= 0).all() & (feats[["mean_r", "mean_g", "mean_b"]] <= 255).all()).all()
    # phash is deterministic: rerun equals
    feats2 = MM.image_features(media).toPandas().sort_values("media_id")
    assert list(feats["phash"]) == list(feats2["phash"])
    resized = MM.resize_images(media, 8, 8).toPandas()
    assert (resized["width"] == 8).all() and (resized["height"] == 8).all()
    for p in resized["payload"]:
        assert len(bytes(p)) == 8 * 8 * 3
    # resized payload equals numpy ground truth for one row
    pdf = MM.synth_media_pdf(18)
    row = pdf[pdf["kind"] == "image"].iloc[0]
    img = MM.decode_image(row["payload"], row["codec"], row["width"], row["height"])
    want = MM._resize_nn(img, 8, 8).tobytes()
    got = bytes(resized.set_index("media_id").loc[row["media_id"], "payload"])
    assert got == want


def test_audio_features(spark):
    media = MM.synth_media(spark, 18)
    feats = MM.audio_features(media).toPandas().sort_values("media_id")
    assert len(feats) == 6
    assert (feats["rms"] > 0).all() and (feats["zero_crossings"] > 0).all()
    # ground truth for one row
    pdf = MM.synth_media_pdf(18)
    row = pdf[pdf["kind"] == "audio"].iloc[0]
    x = MM.decode_audio(row["payload"], row["codec"])
    want = float(np.sqrt(np.mean(x * x)))
    got = float(feats.set_index("media_id").loc[row["media_id"], "rms"])
    assert got == pytest.approx(want, rel=1e-12)


def test_frame_sampling(spark):
    media = MM.synth_media(spark, 18)
    frames = MM.sample_frames(media, every_n=2).toPandas()
    pdf = MM.synth_media_pdf(18)
    vids = pdf[pdf["kind"] == "video"]
    want_n = int(sum((nf + 1) // 2 for nf in vids["n_frames"]))
    assert len(frames) == want_n
    assert set(frames["frame_idx"] % 2) == {0}
    row = vids.iloc[0]
    vid = MM.decode_video(row["payload"], row["codec"], row["width"], row["height"], row["n_frames"])
    got0 = bytes(
        frames[(frames["media_id"] == row["media_id"]) & (frames["frame_idx"] == 2)]["frame"].iloc[0]
    )
    assert got0 == vid[2].tobytes()
