"""Tests for salted skew join, sliding windows, and the custom
stateful streaming operator."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from eggv_spark.operators.events import sliding_window_counts
from eggv_spark.operators.relational import salted_join


def test_salted_join_matches_plain_join(spark):
    # Pathological skew: 90% of left rows share one key.
    left = spark.range(1000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id")).alias("k"),
    )
    right = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    plain = left.join(right, "k").select("row_id", "v")
    salted = salted_join(left, right, "k", n_salts=8).select("row_id", "v")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_join_left_outer_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (99, "b")], ["k", "tag"])
    right = spark.createDataFrame([(1, "x")], ["k", "v"])
    out = salted_join(left, right, "k", n_salts=4, how="left")
    rows = {r.tag: r.v for r in out.collect()}
    assert rows == {"a": "x", "b": None}


def test_sliding_window_double_counts(spark):
    base = dt.datetime(2024, 1, 1, 10, 15)
    df = spark.createDataFrame(
        [(1, base, 2.0), (2, base + dt.timedelta(minutes=30), 3.0)],
        ["event_id", "ts", "value"],
    )
    out = sliding_window_counts(df, "ts", "1 hour", "30 minutes")
    rows = sorted(
        (r.window_start.minute, r.n_events, r.sum_value) for r in out.collect()
    )
    # Event 1 (10:15) in windows [9:30,10:30) and [10:00,11:00);
    # event 2 (10:45) in [10:00,11:00) and [10:30,11:30).
    assert rows == [(0, 2, 5.0), (30, 1, 2.0), (30, 1, 3.0)]


def test_gapfill_hourly_fills_missing_hours(spark):
    base = dt.datetime(2024, 1, 1, 10, 0)
    df = spark.createDataFrame(
        [(1, base, 1.0), (2, base + dt.timedelta(hours=3), 2.0)],
        ["event_id", "ts", "value"],
    )
    from eggv_spark.operators.events import gapfill_hourly

    rows = sorted(
        (r.window_start.hour, r.n_events) for r in gapfill_hourly(df).collect()
    )
    # hours 10..13 present, 11 and 12 filled with zero
    assert rows == [(10, 1), (11, 0), (12, 0), (13, 1)]


def test_resize_images_shape(spark):
    from eggv_spark.operators.multimodal import resize_images, synthesize_assets

    docs = spark.createDataFrame(
        [(0, "img doc", "s", "en"), (1, "audio doc", "s", "en")],
        ["doc_id", "text", "source", "lang"],
    )
    out = resize_images(synthesize_assets(docs), width=4, height=2).collect()
    assert len(out) == 1  # only doc 0 is modality 'image'
    assert len(out[0].resized) == 4 * 2 * 3  # w*h*3 RGB bytes
    # Deterministic: same input -> same bytes.
    again = resize_images(synthesize_assets(docs), width=4, height=2).collect()
    assert out[0].resized == again[0].resized


def test_resize_ppm_real_nearest_neighbor():
    from eggv_spark.operators.multimodal import _ppm_parse, resize_ppm

    # 2x2 source, distinct RGB triplets per pixel: p0..p3
    src = b"P6\n2 2\n255\n" + bytes(range(12))
    # Upsample 2x2 -> 4x4: each source pixel repeats in a 2x2 block
    # (sx = x*2//4 = [0,0,1,1], sy likewise).
    up = resize_ppm(src, 4, 4)
    w, h, maxval, raster = _ppm_parse(up)
    assert (w, h, maxval) == (4, 4, 255)
    px = [tuple(raster[i : i + 3]) for i in range(0, len(raster), 3)]
    p = [tuple(range(i * 3, i * 3 + 3)) for i in range(4)]
    assert px == [p[0], p[0], p[1], p[1]] * 2 + [p[2], p[2], p[3], p[3]] * 2
    # Downsample 2x2 -> 1x1: floor mapping keeps the top-left pixel.
    down = resize_ppm(src, 1, 1)
    assert _ppm_parse(down)[3] == bytes(p[0])
    # Identity resize round-trips the payload exactly.
    assert resize_ppm(src, 2, 2) == src


def test_resize_images_real_ppm_path(spark):
    from eggv_spark.operators.multimodal import (
        resize_images,
        resize_ppm,
        synthesize_ppm_images,
    )

    docs = spark.createDataFrame(
        [(3, "t", "s", "en")], ["doc_id", "text", "source", "lang"]
    )
    imgs = synthesize_ppm_images(docs)
    out = resize_images(imgs, width=6, height=3, fake_decode=False).collect()
    assert len(out) == 1
    expected = resize_ppm(bytes(imgs.collect()[0].payload), 6, 3)
    assert bytes(out[0].resized) == expected
    # Non-PPM payloads still refuse the real path loudly.
    import pytest as _pytest

    fake_imgs = spark.createDataFrame(
        [(1, "image", b"\x89PNG...")], ["asset_id", "modality", "payload"]
    )
    with _pytest.raises(Exception, match="NotImplementedError|PIL"):
        resize_images(fake_imgs, width=2, height=2, fake_decode=False).collect()


def test_crop_ppm_slices_exact_window():
    from eggv_spark.operators.multimodal import _ppm_parse, crop_ppm

    src = b"P6\n4 4\n255\n" + bytes(range(48))
    out = crop_ppm(src, 1, 1, 2, 2)
    w, h, maxval, raster = _ppm_parse(out)
    assert (w, h) == (2, 2)
    # pixel (x, y) of source = bytes (y*4+x)*3 .. +3
    expect = b"".join(
        bytes(range((y * 4 + x) * 3, (y * 4 + x) * 3 + 3))
        for y in (1, 2) for x in (1, 2)
    )
    assert raster == expect
    # over-the-edge crop clamps instead of erroring
    clamped = crop_ppm(src, 3, 3, 5, 5)
    assert _ppm_parse(clamped)[:2] == (1, 1)


def test_decimate_wav_halves_rate_and_keeps_even_samples():
    import io
    import struct
    import wave

    from eggv_spark.operators.multimodal import decimate_wav

    samples = list(range(-8, 8))
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack("<16h", *samples))
    out = decimate_wav(buf.getvalue(), 2)
    with wave.open(io.BytesIO(out)) as w:
        assert w.getframerate() == 4000
        got = struct.unpack(f"<{w.getnframes()}h", w.readframes(w.getnframes()))
    assert list(got) == samples[::2]


def test_streaming_user_totals_stateful(spark, tmp_path):
    import pandas as pd

    from eggv_spark.streaming.events_stream import (
        run_available_now,
        streaming_user_totals,
    )

    # Two parquet files -> two micro-batches (maxFilesPerTrigger=1
    # analog): state must carry user 1's count across batches.
    src = tmp_path / "stream_src"
    src.mkdir()
    pd.DataFrame(
        {"user_id": [1, 1, 2], "value": [1.0, 2.0, 10.0]}
    ).to_parquet(src / "a.parquet")
    pd.DataFrame({"user_id": [1], "value": [4.0]}).to_parquet(src / "b.parquet")

    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = run_available_now(streaming_user_totals(stream), output_mode="update")
    # Per-user FINAL state = row with the max running count.
    final = {
        r.user_id: (r.n_events, r.sum_value)
        for r in out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("sum_value", "n_events").alias("sum_value"),
        )
        .collect()
    }
    assert final == {1: (3, 7.0), 2: (1, 10.0)}


def test_decode_ppm_real_parse():
    from eggv_spark.operators.multimodal import decode_payload, decode_ppm

    # 2x2 P6 with a header comment; pixels: RGB triplets 0..11
    payload = b"P6\n# a comment\n2 2\n255\n" + bytes(range(12))
    w, h, maxval, mean_r, mean_g, mean_b, max_px, min_px = decode_ppm(payload)
    assert (w, h, maxval) == (2.0, 2.0, 255.0)
    assert mean_r == (0 + 3 + 6 + 9) / 4
    assert mean_g == (1 + 4 + 7 + 10) / 4
    assert mean_b == (2 + 5 + 8 + 11) / 4
    assert (max_px, min_px) == (11.0, 0.0)
    # decode_payload routes P6 to the REAL parser even with fake=False
    assert decode_payload(payload, "image", fake=False) == decode_ppm(payload)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_ppm(b"P6\n2 2\n255\n\x00")  # truncated raster
    with _pytest.raises(NotImplementedError):
        decode_payload(b"\x89PNG...", "image", fake=False)


def test_synthesized_ppm_decodes_for_real(spark):
    from eggv_spark.operators.multimodal import (
        extract_features,
        synthesize_ppm_images,
    )

    docs = spark.createDataFrame(
        [(3, "t", "s", "en")], ["doc_id", "text", "source", "lang"]
    )
    imgs = synthesize_ppm_images(docs)
    payload = bytes(imgs.collect()[0].payload)
    expected = b"P6\n4 4\n255\n" + bytes((3 * 7 + i * 13) % 256 for i in range(48))
    assert payload == expected  # Column-expr assembly is byte-exact

    feats = extract_features(imgs, fake_decode=False).collect()
    assert len(feats) == 1
    vec = feats[0].feature
    assert vec[0] == 4.0 and vec[1] == 4.0 and vec[2] == 255.0
    assert vec[3] == sum((3 * 7 + i * 13) % 256 for i in range(0, 48, 3)) / 16


def test_decode_bmp_real_parse():
    import pytest as _pytest

    from eggv_spark.operators.multimodal import (
        _bmp_header,
        decode_bmp,
        decode_payload,
    )

    # 2x2 24-bit: row bytes 6, stride 8 -> 2 padding bytes per row.
    # Bottom-up file rows; image rows top-down are [r1, r0].
    # Image pixel (x, y) channels (B, G, R):
    #   row0: (10,20,30) (40,50,60)   row1: (70,80,90) (100,110,120)
    r_img0 = bytes([10, 20, 30, 40, 50, 60])
    r_img1 = bytes([70, 80, 90, 100, 110, 120])
    pad = b"\xff\xff"  # padding must be excluded from stats
    payload = _bmp_header(2, 2) + r_img1 + pad + r_img0 + pad
    w, h, maxval, mean_r, mean_g, mean_b, max_px, min_px = decode_bmp(payload)
    assert (w, h, maxval) == (2.0, 2.0, 255.0)
    assert mean_b == (10 + 40 + 70 + 100) / 4
    assert mean_g == (20 + 50 + 80 + 110) / 4
    assert mean_r == (30 + 60 + 90 + 120) / 4
    assert (max_px, min_px) == (120.0, 10.0)  # pad 0xff excluded
    # decode_payload routes BM to the REAL parser even with fake=False
    assert decode_payload(payload, "image", fake=False) == decode_bmp(payload)

    # top-down variant (negative biHeight) decodes to identical stats
    hdr = bytearray(_bmp_header(2, 2))
    hdr[22:26] = (-2).to_bytes(4, "little", signed=True)
    topdown = bytes(hdr) + r_img0 + pad + r_img1 + pad
    assert decode_bmp(topdown) == decode_bmp(payload)

    with _pytest.raises(ValueError):
        decode_bmp(payload[:-3])  # truncated raster
    with _pytest.raises(NotImplementedError):
        bad = bytearray(payload)
        bad[28] = 8  # 8-bit palette BMP unsupported
        decode_bmp(bytes(bad))
    with _pytest.raises(ValueError):
        decode_bmp(_bmp_header(6, 0) + b"")  # zero-height header
    # text starting with 'BM' must NOT be sniffed as a BMP: in fake
    # mode it takes the digest stand-in instead of crashing
    text = b"BMW sales rose sharply in the third quarter of the year."
    vec = decode_payload(text, "image", fake=True)
    assert len(vec) == 8 and all(0.0 <= v <= 1.0 for v in vec)


def test_synthesized_bmp_decodes_for_real(spark):
    from eggv_spark.operators.multimodal import (
        _bmp_header,
        extract_features,
        synthesize_bmp_images,
    )

    docs = spark.createDataFrame(
        [(3, "t", "s", "en")], ["doc_id", "text", "source", "lang"]
    )
    imgs = synthesize_bmp_images(docs)
    payload = bytes(imgs.collect()[0].payload)
    expected = _bmp_header(6, 4) + bytes(
        (3 * 11 + i * 17) % 256 for i in range(80)
    )
    assert payload == expected  # Column-expr assembly is byte-exact

    feats = extract_features(imgs, fake_decode=False).collect()
    assert len(feats) == 1
    vec = feats[0].feature
    assert vec[0] == 6.0 and vec[1] == 4.0 and vec[2] == 255.0
    # mean_r = channel (i%20)%3==2 among pixel bytes, rows in any
    # order (means are row-order independent)
    pix = [
        (3 * 11 + i * 17) % 256
        for i in range(80)
        if i % 20 < 18
    ]
    assert vec[3] == sum(pix[2::3]) / 24
    assert vec[5] == sum(pix[0::3]) / 24


def test_decode_wav_real_parse():
    import math
    import struct

    from eggv_spark.operators.multimodal import (
        _wav_header,
        decode_payload,
        decode_wav,
    )

    samples = [0, 100, -100, 200]
    payload = _wav_header(4, 8000) + struct.pack("<4h", *samples)
    ch, rate, bits, n, mean, rms, peak, zc = decode_wav(payload)
    assert (ch, rate, bits, n) == (1.0, 8000.0, 16.0, 4.0)
    assert mean == 50.0
    assert rms == math.sqrt((0 + 100**2 + 100**2 + 200**2) / 4)
    assert peak == 200.0
    assert zc == 2  # 100->-100 and -100->200
    # decode_payload routes RIFF to the real parser
    assert decode_payload(payload, "audio", fake=False) == decode_wav(payload)


def test_synthesized_wav_decodes_for_real(spark):
    import struct

    from eggv_spark.operators.multimodal import (
        _wav_header,
        extract_features,
        synthesize_wav_audio,
    )

    docs = spark.createDataFrame(
        [(5, "t", "s", "en")], ["doc_id", "text", "source", "lang"]
    )
    payload = bytes(synthesize_wav_audio(docs).collect()[0].payload)
    expected = _wav_header(64, 8000) + struct.pack(
        "<64h", *[(5 * 31 + i * 17) % 4096 - 2048 for i in range(64)]
    )
    assert payload == expected  # Column-expr assembly is byte-exact

    feats = extract_features(synthesize_wav_audio(docs), fake_decode=False).collect()
    vec = feats[0].feature
    assert (vec[0], vec[1], vec[2], vec[3]) == (1.0, 8000.0, 16.0, 64.0)


def test_decode_y4m_real_parse():
    from eggv_spark.operators.multimodal import decode_payload, decode_y4m

    # 2x2 C444, 2 frames of 12 bytes each
    f0, f1 = bytes(range(12)), bytes(range(100, 112))
    payload = (
        b"YUV4MPEG2 W2 H2 F30:1 Ip A1:1 C444\n"
        + b"FRAME\n" + f0 + b"FRAME\n" + f1
    )
    w, h, fn, fd, frames = decode_y4m(payload)
    assert (w, h, fn, fd) == (2, 2, 30, 1)
    assert frames == [f0, f1]
    # decode_payload routes YUV4MPEG2 to the real parser
    vec = decode_payload(payload, "video", fake=False)
    assert vec[0:4] == [2.0, 2.0, 30.0, 2.0]
    assert vec[4] == (sum(f0[0:4]) + sum(f1[0:4])) / 8  # mean_y
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_y4m(payload[:-4])  # truncated frame
    with _pytest.raises(NotImplementedError):
        decode_payload(b"\x00\x00\x01\xba mpeg", "video", fake=False)


def test_synthesized_y4m_decodes_for_real(spark):
    import hashlib

    from eggv_spark.operators.multimodal import (
        _y4m_header,
        sample_video_frames,
        synthesize_y4m_videos,
    )

    docs = spark.createDataFrame(
        [(3, "t", "s", "en")], ["doc_id", "text", "source", "lang"]
    )
    vids = synthesize_y4m_videos(docs)
    payload = bytes(vids.collect()[0].payload)
    expected = _y4m_header(4, 4) + b"".join(
        b"FRAME\n" + bytes((3 * 7 + f * 11 + i * 13) % 256 for i in range(48))
        for f in range(4)
    )
    assert payload == expected  # Column-expr assembly is byte-exact

    rows = sample_video_frames(vids, n_frames=4, fake_decode=False).collect()
    assert [r.frame_idx for r in rows] == [0, 1, 2, 3]
    f2 = bytes((3 * 7 + 2 * 11 + i * 13) % 256 for i in range(48))
    row2 = next(r for r in rows if r.frame_idx == 2)
    assert row2.frame_hash == hashlib.md5(f2.hex().encode()).hexdigest()
    assert row2.mean_y == sum(f2[:16]) / 16


def test_video_frame_sampling_even_spacing(spark):
    from eggv_spark.operators.multimodal import (
        sample_video_frames,
        synthesize_y4m_videos,
    )

    docs = spark.createDataFrame(
        [(1, "t", "s", "en")], ["doc_id", "text", "source", "lang"]
    )
    vids = synthesize_y4m_videos(docs, n_frames=8)
    rows = sample_video_frames(vids, n_frames=4, fake_decode=False).collect()
    # 4 frames sampled evenly from 8 -> source indices 0, 2, 4, 6
    assert sorted(r.frame_idx for r in rows) == [0, 2, 4, 6]


def test_streaming_running_zscore_carries_prefix_state(spark, tmp_path):
    import math

    import pandas as pd

    from eggv_spark.streaming.events_stream import (
        run_available_now,
        streaming_running_zscore,
    )

    src = tmp_path / "z_src"
    src.mkdir()
    # batch 1: user 1 events at t1..t3; batch 2: one more at t4 —
    # its z must use the FULL 4-event prefix (state crossed batches)
    pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "user_id": [1, 1, 1],
            "ts": [1, 2, 3],
            "value": [10.0, 20.0, 30.0],
        }
    ).to_parquet(src / "a.parquet")
    pd.DataFrame(
        {
            "event_id": [4],
            "user_id": [1],
            "ts": [4],
            "value": [100.0],
        }
    ).to_parquet(src / "b.parquet")

    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, ts long, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = {r.event_id: r.zscore for r in run_available_now(
        streaming_running_zscore(stream), output_mode="append"
    ).collect()}
    assert out[1] is None                      # single-event prefix
    vals = [10.0, 20.0, 30.0, 100.0]
    mean = sum(vals) / 4
    sd = math.sqrt(sum((v - mean) ** 2 for v in vals) / 3)
    assert out[4] == round((100.0 - mean) / sd, 4)


def test_ahash_ppm_hand_computed():
    from eggv_spark.operators.multimodal import ahash_ppm

    # 2x2 image: brightness sums 3, 3, 300, 300 -> mean 153/pixel;
    # threshold s*n >= total: 3*4=12 < 606 (0), 300*4=1200 >= 606 (1)
    raster = bytes([1, 1, 1, 1, 1, 1, 100, 100, 100, 100, 100, 100])
    payload = b"P6\n2 2\n255\n" + raster
    assert ahash_ppm(payload) == (4, 0b0011)


def test_image_ahash_buckets_identical_images_together(spark):
    from eggv_spark.operators.multimodal import image_ahash

    # two byte-identical payloads + one different
    raster_a = bytes(range(2 * 2 * 3))
    raster_b = bytes(reversed(range(2 * 2 * 3)))
    rows = [
        (1, "image", b"P6\n2 2\n255\n" + raster_a),
        (2, "image", b"P6\n2 2\n255\n" + raster_a),
        (3, "image", b"P6\n2 2\n255\n" + raster_b),
        (4, "audio", b"not an image"),   # filtered out by modality
    ]
    df = spark.createDataFrame(
        rows, "asset_id long, modality string, payload binary"
    )
    out = {r.asset_id: r.ahash for r in image_ahash(df).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1] == out[2]   # identical pixels -> identical hash


def test_audio_rms_segments_hand_computed(spark):
    import math

    from eggv_spark.operators.multimodal import (
        _wav_header,
        audio_rms_segments,
    )
    import struct

    # 8 samples, window 4: seg0 = [100]*4, seg1 = [-200]*4
    vals = [100] * 4 + [-200] * 4
    payload = _wav_header(8, 8000) + struct.pack("<8h", *vals)
    df = spark.createDataFrame(
        [(1, "audio", payload), (2, "video", b"skip")],
        "asset_id long, modality string, payload binary",
    )
    rows = {(r.asset_id, r.segment_idx): r for r in
            audio_rms_segments(df, window_samples=4).collect()}
    assert set(rows) == {(1, 0), (1, 1)}
    assert rows[(1, 0)].rms == 100.0 and rows[(1, 0)].peak == 100
    assert rows[(1, 1)].rms == 200.0 and rows[(1, 1)].peak == 200
    assert rows[(1, 0)].n_samples == 4


def test_watermark_late_semantics_pinned(spark, tmp_path):
    """Pin the engine's watermark contract that stream_late_data
    (__spark_entry__) depends on, so a Spark upgrade that changes it
    fails HERE with a readable explanation rather than as an oracle
    hash mismatch:

    1. the late-input filter in batch N uses the watermark computed
       through batch N-2 (one-batch lag): a straggler arriving in the
       batch RIGHT AFTER the bulk is still accepted;
    2. a straggler arriving two batches after the bulk IS dropped;
    3. append mode emits exactly the windows whose end <= final
       watermark.
    """
    import os

    import pandas as pd

    def run(files):
        src = tmp_path / f"feed{len(os.listdir(tmp_path))}"
        src.mkdir()
        for i, stamps in enumerate(files):
            p = src / f"b{i}.parquet"
            pd.DataFrame(
                {"ts": pd.to_datetime(stamps).astype("datetime64[us]")}
            ).to_parquet(p)
            os.utime(p, (1_000_000 + 10 * i,) * 2)
        stream = (
            spark.readStream.schema("ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        from eggv_spark.streaming.events_stream import run_available_now

        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count("*").alias("n"))
        )
        out = run_available_now(agg, output_mode="append")
        return {
            r.s.strftime("%H:%M"): r.n
            for r in out.select(F.col("w.start").alias("s"), "n").collect()
        }

    # (1) one-batch lag: the 02:00 straggler lands in the batch right
    # after the bulk (wm for its filter is still epoch 0) -> KEPT and
    # finalized (end 03:00 <= final wm 10:00); the 10:00/11:00 windows
    # end past the final watermark and never emit
    lagged = run([["2024-01-01 10:00:00"],
                  ["2024-01-01 02:00:00", "2024-01-01 11:00:00"]])
    assert lagged == {"02:00": 1}

    # (2)+(3) bulk, then a head advancing the final watermark to
    # 11:30 (finalizing the 10:00 window), then the same straggler:
    # now filtered against the bulk-established wm=09:00 -> DROPPED
    # (a non-dropping engine would emit {"02:00": 1, "10:00": 1})
    dropped = run([["2024-01-01 10:00:00"],
                   ["2024-01-01 12:30:00"],
                   ["2024-01-01 02:00:00"]])
    assert dropped == {"10:00": 1}


def test_decode_png_real_all_filters():
    """REAL PNG decode (zlib inflate + unfilter): encode a random
    5-row truecolor raster with one scanline filter of each type
    (None/Sub/Up/Average/Paeth), real deflate, real chunk CRCs —
    decode must recover the exact pixel bytes."""
    import random
    import struct
    import zlib

    import pytest as _pytest

    from eggv_spark.operators.multimodal import (
        _png_parse,
        decode_payload,
        decode_png,
    )

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    def make_png(w, h, rows, color_type, filters):
        channels = 3 if color_type == 2 else 1
        bpp, stride = channels, w * channels
        raw, prev = bytearray(), bytes(stride)
        for r, row in enumerate(rows):
            f = filters[r]
            raw.append(f)
            line = bytearray(row)
            enc = bytearray(stride)
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                if f == 0:
                    enc[i] = line[i]
                elif f == 1:
                    enc[i] = (line[i] - a) & 255
                elif f == 2:
                    enc[i] = (line[i] - b) & 255
                elif f == 3:
                    enc[i] = (line[i] - ((a + b) >> 1)) & 255
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = (
                        a if pa <= pb and pa <= pc
                        else (b if pb <= pc else c)
                    )
                    enc[i] = (line[i] - pred) & 255
            raw += enc
            prev = bytes(line)
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(
                ">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + chunk(b"IEND", b"")
        )

    rng = random.Random(42)
    w, h = 4, 5
    rows = [bytes(rng.randrange(256) for _ in range(3 * w)) for _ in range(h)]
    png = make_png(w, h, rows, 2, [0, 1, 2, 3, 4])
    assert _png_parse(png) == (w, h, 3, rows)
    feats = decode_png(png)
    n = w * h
    assert feats[:3] == [4.0, 5.0, 255.0]
    for c in range(3):
        assert abs(feats[3 + c] - sum(sum(r[c::3]) for r in rows) / n) < 1e-9
    assert feats[6] == max(max(r) for r in rows)
    assert feats[7] == min(min(r) for r in rows)
    # dispatch routes the PNG signature to the real parser
    assert decode_payload(png, "image", fake=False) == feats

    # grayscale replicates its channel into all three means
    rows_g = [bytes(rng.randrange(256) for _ in range(w)) for _ in range(h)]
    fg = decode_png(make_png(w, h, rows_g, 0, [4, 3, 2, 1, 0]))
    assert fg[3] == fg[4] == fg[5]
    assert abs(fg[3] - sum(sum(r) for r in rows_g) / n) < 1e-9

    with _pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\n" + b"junk")  # no IHDR
    with _pytest.raises(NotImplementedError):
        bad = bytearray(make_png(w, h, rows, 2, [0] * h))
        bad[24] = 16  # 16-bit depth unsupported
        decode_png(bytes(bad))
    with _pytest.raises(ValueError):
        full = make_png(w, h, rows, 2, [0] * h)
        decode_png(full[:30])  # truncated chunk


def test_synthesized_png_decodes_for_real(spark):
    """Column-expression PNG synthesis (stored-block zlib + real
    F.aggregate adler32) round-trips through the stdlib decoder:
    zlib.decompress validates the adler32, stats match the
    generative formula."""
    from eggv_spark.operators.multimodal import (
        decode_png,
        extract_features,
        synthesize_png_images,
    )

    docs = spark.createDataFrame(
        [(3, "t", "s", "en"), (7, "u", "s", "en")],
        ["doc_id", "text", "source", "lang"],
    )
    assets = synthesize_png_images(docs)  # 6x4 default
    w, h, n = 6, 4, 24
    for r in assets.collect():
        d = r["asset_id"]
        feats = decode_png(bytes(r["payload"]))
        exp_rows = [
            [(d * 11 + rr * 19 + j * 17) % 256 for j in range(3 * w)]
            for rr in range(h)
        ]
        assert feats[0] == w and feats[1] == h
        for c in range(3):
            exp = sum(sum(er[c::3]) for er in exp_rows) / n
            assert abs(feats[3 + c] - exp) < 1e-9

    # and through the Arrow-batched mapInPandas plumbing
    out = extract_features(assets, fake_decode=False).collect()
    assert len(out) == 2 and all(row.feature[0] == 6.0 for row in out)
