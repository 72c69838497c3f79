"""Real-codec tests: netpbm P5/P6, RIFF/WAVE PCM, block-average resize,
magic sniffing, and the Spark-side synthesized-asset → real-decode pipeline.
"""

from __future__ import annotations

import numpy as np
import pytest

from promhouse_spark.operators import codecs as C
from promhouse_spark.operators import multimodal as M


def test_pnm_roundtrip_p6():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 9, 3), dtype=np.uint8)
    d = C.decode_pnm(C.encode_pnm(px))
    assert (d["width"], d["height"], d["channels"]) == (9, 5, 3)
    assert np.array_equal(d["pixels"], px)


def test_pnm_roundtrip_p5_and_comments():
    px = np.arange(12, dtype=np.uint8).reshape(3, 4, 1)
    raw = C.encode_pnm(px)
    # splice a comment into the header — parsers must skip it
    commented = raw[:2] + b"\n# made by a tool\n" + raw[2:]
    d = C.decode_pnm(commented)
    assert d["channels"] == 1
    assert np.array_equal(d["pixels"], px)


def test_pnm_rejects_malformed():
    with pytest.raises(ValueError):
        C.decode_pnm(b"P6\n2 2\n255\nshort")  # truncated raster
    with pytest.raises(ValueError):
        C.decode_pnm(b"BM\x00\x00")  # not netpbm


def test_image_features_known_values():
    # solid mid-gray RGB image: means = luma = 0.5, std = 0
    px = np.full((4, 8, 3), 128, dtype=np.uint8)
    f = C.image_features(C.decode_pnm(C.encode_pnm(px)))
    assert f[0] == 8.0 and f[1] == 4.0  # width, height
    assert f[2] == f[3] == f[4] == pytest.approx(128 / 255)
    assert f[5] == pytest.approx(128 / 255)
    assert f[6] == pytest.approx(0.0)
    assert f[7] == pytest.approx(2.0)  # aspect


def test_resize_block_preserves_mean_and_solid_color():
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    d = C.decode_pnm(C.encode_pnm(px))
    small = C.resize_block(d, 4, 4)
    assert small["pixels"].shape == (4, 4, 3)
    # block averaging preserves the global mean up to rounding
    assert float(small["pixels"].mean()) == pytest.approx(
        float(px.mean()), abs=1.0
    )
    solid = C.resize_block(
        C.decode_pnm(C.encode_pnm(np.full((10, 10, 3), 77, dtype=np.uint8))), 3, 3
    )
    assert np.all(solid["pixels"] == 77)


def test_wav_roundtrip_and_features():
    sr = 8000
    t = np.arange(sr) / sr
    tone = np.sin(2 * np.pi * 440 * t).reshape(-1, 1)  # 1 s, 440 Hz
    d = C.decode_wav(C.encode_wav(tone, sr))
    assert d["sample_rate"] == sr and d["n_channels"] == 1 and d["n_frames"] == sr
    assert np.allclose(d["samples"][:, 0], tone[:, 0], atol=1e-3)
    f = C.audio_features(d)
    assert f[3] == pytest.approx(1.0)  # duration
    assert f[4] == pytest.approx(1 / np.sqrt(2), abs=1e-3)  # sine RMS
    assert f[5] == pytest.approx(1.0, abs=1e-3)  # peak
    # a 440 Hz sine crosses zero ~880 times/s
    assert f[6] * sr == pytest.approx(880, abs=3)


def test_sniff_and_dispatch():
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    assert C.sniff(C.encode_pnm(px)) == "pnm"
    assert C.sniff(C.encode_wav(np.zeros((4, 1)), 8000)) == "wav"
    assert C.sniff(b"\xff\xd8\xff\xe0rest") == "jpeg"
    assert C.sniff(b"\x89PNG\r\n") == "png"
    # ISO-BMFF: any first-box size, not just 0x20
    assert C.sniff(b"\x00\x00\x00\x18ftypmp42rest") == "mp4"
    assert C.sniff(b"\x00\x00\x00 ftypisomrest") == "mp4"
    with pytest.raises(NotImplementedError):
        C.decode_features(b"\x00\x00\x00\x18ftypmp42")
    with pytest.raises(NotImplementedError):
        C.decode_features(b"\xff\xd8\xff\xe0fakejpeg")
    with pytest.raises(ValueError):
        C.decode_features(b"total garbage")
    # real formats decode for real through the dispatcher
    assert len(C.decode_features(C.encode_pnm(px))) == 8
    assert len(C.decode_features(C.encode_wav(np.zeros((4, 1)), 8000))) == 8


def test_synthesized_pnm_assets_decode_for_real(spark, sf_dir):
    """The Spark-side synthesizer emits VALID P6 files: pull payloads back
    and run the real parser on each; features from the distributed
    mapInPandas stage must equal local decode of the same payloads."""
    from promhouse_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    assets = M.synthesize_pnm_assets(docs)
    payloads = {
        r["asset_id"]: bytes(r["payload"])
        for r in assets.select("asset_id", "payload").collect()
    }
    for payload in payloads.values():
        d = C.decode_pnm(payload)  # raises if the synthesis is malformed
        assert (d["width"], d["height"], d["channels"]) == (M.PNM_W, M.PNM_H, 3)

    got = {
        r["asset_id"]: list(r["feature"])
        for r in M.extract_features(assets).collect()
    }
    assert set(got) == set(payloads)
    for aid, payload in payloads.items():
        want = [float(np.float32(x)) for x in C.decode_features(payload)]
        assert got[aid] == want, f"asset {aid}"


# ---------------------------------------------------------------------------
# property-based round-trips (no Spark session needed)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    c=st.sampled_from([1, 3]),
    seed=st.integers(0, 2**31 - 1),
)
def test_pnm_roundtrip_property(w, h, c, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    d = C.decode_pnm(C.encode_pnm(px))
    assert (d["width"], d["height"], d["channels"]) == (w, h, c)
    assert np.array_equal(d["pixels"], px)
    # features are finite and geometry-consistent for every image
    f = C.image_features(d)
    assert len(f) == 8 and all(np.isfinite(f))
    assert f[0] == float(w) and f[1] == float(h)


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(1, 2000),
    ch=st.sampled_from([1, 2]),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, ch, rate, seed):
    rng = np.random.default_rng(seed)
    samples = rng.uniform(-0.999, 0.999, size=(n, ch))
    d = C.decode_wav(C.encode_wav(samples, rate))
    assert d["sample_rate"] == rate and d["n_channels"] == ch and d["n_frames"] == n
    # 16-bit quantization error bound
    assert np.max(np.abs(d["samples"] - samples)) <= 1.0 / 32768 + 1e-9
    f = C.audio_features(d)
    assert len(f) == 8 and all(np.isfinite(f))


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(2, 32),
    h=st.integers(2, 32),
    ow=st.integers(1, 8),
    oh=st.integers(1, 8),
    seed=st.integers(0, 2**31 - 1),
)
def test_resize_block_property(w, h, ow, oh, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = C.resize_block(C.decode_pnm(C.encode_pnm(px)), ow, oh)
    assert out["pixels"].shape == (oh, ow, 3)
    # every output pixel is within the source's value range (it's an average)
    assert out["pixels"].min() >= px.min() and out["pixels"].max() <= px.max()


# ---- YUV4MPEG2 (round 7) ----------------------------------------------------


def test_y4m_roundtrip_exact():
    import numpy as np

    from promhouse_spark.operators.codecs import decode_y4m, encode_y4m, sniff

    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, size=(5, 6, 8), dtype=np.uint8)
    payload = encode_y4m(frames, fps_num=30, fps_den=1)
    assert sniff(payload) == "y4m"
    dec = decode_y4m(payload)
    assert (dec["width"], dec["height"], dec["n_frames"]) == (8, 6, 5)
    assert dec["fps_num"] == 30
    assert (dec["frames"] == frames).all()


def test_y4m_decode_against_independent_parse():
    """Hand-built stream with C420jpeg chroma tag and two frames —
    decoded planes must equal the bytes placed at hand-computed offsets."""
    import numpy as np

    from promhouse_spark.operators.codecs import decode_y4m, video_features

    w, h = 4, 2
    y0 = bytes(range(8))
    y1 = bytes(range(100, 108))
    chroma = bytes([128]) * (2 * (w // 2) * (h // 2))
    payload = (
        b"YUV4MPEG2 W4 H2 F10:1 Ip A1:1 C420jpeg\n"
        + b"FRAME\n" + y0 + chroma
        + b"FRAME\n" + y1 + chroma
    )
    dec = decode_y4m(payload)
    assert dec["frames"][0].tobytes() == y0
    assert dec["frames"][1].tobytes() == y1
    feats = video_features(dec)
    assert feats[:5] == [4.0, 2.0, 2.0, 10.0, 200.0]  # w,h,n,fps,duration_ms
    assert feats[7] == 100.0  # motion: every pixel differs by exactly 100
    # truncated stream and bad marker are errors, not garbage
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_y4m(payload[:-3])
    with _pytest.raises(ValueError):
        decode_y4m(b"YUV4MPEG2 W4 H2 F10:1\nXRAME\n" + y0 + chroma)


def test_sample_video_frames_matches_driver_decode(spark):
    """The mapInPandas frame sampler must emit exactly what a driver-side
    decode of the same payloads computes."""
    import numpy as np

    from promhouse_spark.operators import multimodal as M
    from promhouse_spark.operators.codecs import decode_y4m

    docs = spark.createDataFrame(
        [(i, f"text number {i}", 3) for i in range(6)],
        "doc_id long, text string, n_chars long",
    )
    assets = M.synthesize_y4m_assets(docs)
    got = {
        (r["asset_id"], r["frame_idx"]): (r["frame_ts_ms"], r["sum_luma"])
        for r in M.sample_video_frames(assets, every_ms=250).collect()
    }
    rows = assets.select("asset_id", "payload").collect()
    want = {}
    for r in rows:
        dec = decode_y4m(bytes(r["payload"]))
        for idx in range(0, dec["n_frames"], 1):  # 250 ms at 4 fps = every frame
            want[(r["asset_id"], idx)] = (
                idx * 250,
                int(dec["frames"][idx].astype(np.int64).sum()),
            )
    assert got == want and len(got) == 6 * M.Y4M_FRAMES


def test_synthesized_wav_assets_decode_with_stdlib(spark):
    """The JVM-synthesized WAV payloads are valid for Python's stdlib wave
    module, and audio_stats equals a driver-side decode of the same
    payloads (exact integers)."""
    import numpy as np

    from promhouse_spark.operators import multimodal as M
    from promhouse_spark.operators.codecs import decode_wav, sniff

    docs = spark.createDataFrame(
        [(i, f"speech sample {i}", 5) for i in range(5)],
        "doc_id long, text string, n_chars long",
    )
    assets = M.synthesize_wav_assets(docs)
    got = {
        r["asset_id"]: (r["sample_rate"], r["n_samples"], r["sum_abs_dev"])
        for r in M.audio_stats(assets).collect()
    }
    for r in assets.select("asset_id", "payload").collect():
        payload = bytes(r["payload"])
        assert sniff(payload) == "wav"
        dec = decode_wav(payload)
        mono = dec["samples"].mean(axis=1)
        want = (
            dec["sample_rate"],
            dec["n_frames"],
            int(np.rint(np.abs(mono * 128.0)).sum()),
        )
        assert got[r["asset_id"]] == want
    assert len(got) == 5
