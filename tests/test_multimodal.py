"""Multimodal column plumbing: binary payloads + typed metadata through
mapInPandas kernels (decode stubbed deterministically — the Spark-side
schema/batch mechanics are the subject under test)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from logparser_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),
            (1, "hello world"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "x"),
            (4, "lorem ipsum dolor sit amet consectetur"),
            (5, "a b c d e f g"),
        ],
        "doc_id long, text string",
    )
    return mm.attach_payload(docs)


def test_attach_payload_schema_and_bytes(media):
    rows = {r["doc_id"]: r for r in media.collect()}
    assert rows[0]["media_type"] == "image"
    assert rows[1]["media_type"] == "audio"
    assert rows[2]["media_type"] == "video"
    assert bytes(rows[1]["payload"]) == b"hello world"
    assert rows[1]["n_bytes"] == 11


def test_media_stats_matches_hashlib(media):
    got = {r["doc_id"]: r for r in mm.media_stats(media).collect()}
    assert got[2]["content_md5"] == hashlib.md5(
        b"the quick brown fox jumps over the lazy dog"
    ).hexdigest()
    assert got[3]["n_bytes"] == 1
    assert got[0]["first_char"] == ord("a")


def test_decode_media_fake_dims(media):
    out = {r["doc_id"]: r for r in mm.decode_media(media).collect()}
    # image: dims present, audio-only fields null
    img = out[0]  # n_bytes = 22
    assert (img["width"], img["height"]) == (64 + 22 % 193, 64 + (22 * 31) % 129)
    assert img["sample_rate"] is None and img["n_frames"] is None
    # audio: no dims, sample_rate present
    aud = out[1]
    assert aud["width"] is None and aud["height"] is None
    assert aud["sample_rate"] == 8000 + (11 % 5) * 8000
    # video: everything present
    vid = out[2]  # n_bytes = 43
    assert vid["n_frames"] == 1 + 43 % 240
    assert mm.decode_media(media).schema == mm.DECODED_SCHEMA


def test_media_profile_equals_stats_join_decode(media):
    """One-pass profile = media_stats ⋈ decode_media, column for column
    (it exists to read the payload once, not to change any value)."""
    prof = {r["doc_id"]: r.asDict() for r in mm.media_profile(media).collect()}
    stats = {r["doc_id"]: r.asDict() for r in mm.media_stats(media).collect()}
    dec = {r["doc_id"]: r.asDict() for r in mm.decode_media(media).collect()}
    assert set(prof) == set(stats) == set(dec)
    for i in prof:
        assert prof[i] == {**dec[i], **stats[i], **{
            k: dec[i][k] for k in ("width", "height", "sample_rate", "n_frames")
        }}, i


def test_media_profile_real_raises_without_decoders(media):
    if mm._real_decoders():
        pytest.skip("real media libs present; covered by the real-path test")
    with pytest.raises(Exception) as ei:
        mm.media_profile(media, decoder="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_decode_media_real_raises_without_decoders(media):
    """With no media libs importable, the real path must raise loudly
    (never silently fake); with libs present this is skipped and the
    real-path test below runs instead."""
    if mm._real_decoders():
        pytest.skip("real media libs present; covered by the real-path test")
    with pytest.raises(Exception) as ei:
        mm.decode_media(media, decoder="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )
    with pytest.raises(ValueError):
        mm.decode_media(media, decoder="bogus")


def test_decode_media_real_images_with_pillow(spark):
    """Exercised wherever Pillow exists (skipped in this container):
    a real PNG decodes to its true dimensions through the same
    mapInPandas plumbing as the fake path."""
    decoders = mm._real_decoders()
    if "image" not in decoders:
        pytest.skip("Pillow not importable in this environment")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (5, 7)).save(buf, format="PNG")
    payload = buf.getvalue()
    df = spark.createDataFrame(
        [(1, "image", payload, len(payload))], schema=mm.MEDIA_SCHEMA
    )
    row = mm.decode_media(df, decoder="real").collect()[0]
    assert (row["width"], row["height"]) == (5, 7)


def test_resize_images_only_images_fixed_size(media):
    out = mm.resize_images(media, target_w=4, target_h=4).collect()
    # doc_ids 0 and 3 are images
    assert sorted(r["doc_id"] for r in out) == [0, 3]
    for r in out:
        assert (r["width"], r["height"]) == (4, 4)
        assert len(bytes(r["thumb"])) == 16


def test_sample_frames_row_expansion(media):
    out = mm.sample_frames(media, every_n=10).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    # videos are doc_ids 2 (43 bytes -> 44 frames) and 5 (13 bytes -> 14 frames)
    assert sorted(by_doc) == [2, 5]
    assert sorted(by_doc[2]) == list(range(0, 44, 10))
    assert sorted(by_doc[5]) == list(range(0, 14, 10))
    # frame hashes deterministic
    md5s = {(r["doc_id"], r["frame_idx"]): r["frame_md5"] for r in out}
    assert md5s[(5, 0)] == hashlib.md5(
        b"a b c d e f g" + (0).to_bytes(4, "little")
    ).hexdigest()


def test_payload_pruned_from_decode_scan(media):
    """Column pruning: decode output never materializes the payload
    column downstream — the plan after selecting metadata only must not
    carry the blob."""
    out = mm.decode_media(media).select("doc_id", "width")
    assert "payload" not in out.columns


def test_decode_media_real_video_with_ffprobe(spark):
    """Exercised wherever the ffmpeg suite exists (skipped in this
    container): a real container-format video probes to its true
    dimensions + frame count through the same mapInPandas plumbing as
    the fake path. The payload is synthesized with ffmpeg's testsrc so
    the test carries no binary fixture."""
    import shutil
    import subprocess

    decoders = mm._real_decoders()
    if "video" not in decoders or not shutil.which("ffmpeg"):
        pytest.skip("ffprobe/ffmpeg not present in this environment")
    proc = subprocess.run(
        [
            "ffmpeg", "-v", "error", "-f", "lavfi",
            "-i", "testsrc=size=16x8:rate=5:duration=1",
            "-f", "avi", "pipe:1",
        ],
        capture_output=True,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[:300]
    payload = proc.stdout
    df = spark.createDataFrame(
        [(1, "video", payload, len(payload))], schema=mm.MEDIA_SCHEMA
    )
    row = mm.decode_media(df, decoder="real").collect()[0]
    assert (row["width"], row["height"]) == (16, 8)
    assert row["n_frames"] == 5
    assert row["sample_rate"] is None
