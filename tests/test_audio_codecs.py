import numpy as np
import pytest

from unify_spark.audio import pcm


@pytest.mark.parametrize("codec", pcm.DECODABLE_CODECS)
def test_roundtrip_snr(codec):
    x = pcm.synth_pcm16(7, 16000, 1600)
    y = pcm.decode(pcm.encode(x, codec), codec)
    assert y.shape == x.shape
    assert pcm.snr_db(x, y) >= 30.0


@pytest.mark.parametrize("codec", ["pcm_s16le", "flac"])
def test_lossless_exact(codec):
    x = pcm.synth_pcm16(11, 8000, 777)
    y = pcm.decode(pcm.encode(x, codec), codec)
    assert (x == y).all()


def test_synth_deterministic():
    a = pcm.synth_pcm16(123, 22050, 4097)
    b = pcm.synth_pcm16(123, 22050, 4097)
    assert (a == b).all()
    c = pcm.synth_pcm16(124, 22050, 4097)
    assert (a != c).any()


def test_truncation_fails_snr():
    x = pcm.synth_pcm16(9, 16000, 800)
    blob = pcm.encode(x, "ulaw")
    y = pcm.decode(blob[: len(blob) * 3 // 5], "ulaw")
    assert pcm.snr_db(x, y) == float("-inf")


def test_unknown_codec_raises():
    with pytest.raises(ValueError):
        pcm.decode(b"\x00\x01", "opus")


def test_batch_synth_equals_scalar():
    idx = np.array([5, 123, 99124, 700])
    for sr, n in [(16000, 800), (48000, 2400), (8000, 4397)]:
        batch = pcm.synth_pcm16_batch(idx, sr, n)
        for k, i in enumerate(idx):
            assert (batch[k] == pcm.synth_pcm16(int(i), sr, n)).all()


@pytest.mark.parametrize("codec", pcm.DECODABLE_CODECS)
def test_batch_codec_equals_scalar(codec):
    idx = np.array([1, 42, 77])
    x = pcm.synth_pcm16_batch(idx, 16000, 800)
    blobs = pcm.encode_batch(x, codec)
    dec = pcm.decode_batch(blobs, codec)
    snrs = pcm.snr_db_batch(x, dec)
    for k in range(len(idx)):
        assert blobs[k] == pcm.encode(x[k], codec)
        assert (dec[k] == pcm.decode(blobs[k], codec)).all()
        s = pcm.snr_db(x[k], dec[k])
        assert (np.isinf(snrs[k]) and np.isinf(s)) or abs(snrs[k] - s) < 1e-9


def test_noise_distribution():
    n = pcm._noise_vec(5, 50_000)
    assert abs(float(n.mean())) < 0.02
    assert 0.5 < float(n.std()) < 0.65  # uniform [-1,1) → std ≈ 0.577
    assert float(np.abs(n).max()) <= 1.0


def test_decode_batch_null_sr_reported():
    """A null sr_hz must surface as an explicit 'null sr_hz' violation row
    (previously it NaN-cast to INT64_MIN and slipped through the sha rescue)."""
    import pandas as pd

    from unify_spark.audio import pcm as _pcm
    from unify_spark.operators.payload import _decode_batch

    good = _pcm.encode(_pcm.synth_pcm16(1, 8000, 400), "pcm_s16le")
    pdf = pd.DataFrame(
        {
            "clip_id": ["c-1", "c-2"],
            "bytes": [good, good],
            "sr_hz": [8000.0, None],
            "dur_ms": [50, 50],
            "codec": ["pcm_s16le", "pcm_s16le"],
            "part": ["p1", "p1"],
        }
    )
    out = _decode_batch(pdf, payload_cap_ms=50)
    by_id = {r["clip_id"]: r for _, r in out.iterrows()}
    assert by_id["c-1"]["snr_db"] > 30
    assert by_id["c-2"]["reason"] == "null sr_hz"
    assert by_id["c-2"]["snr_db"] < 0 and not by_id["c-2"]["is_null_bytes"]


def test_alaw_is_real_g711():
    """A-law must be the genuine ITU-T curve, not another stand-in: the
    standard fixed points (mid-rise 0 -> +8, extremes +/-32256), idempotent
    re-encode (the companded lattice is a fixed point), ~37 dB SNR on a
    speech-level signal, and 8 bits/sample."""
    x = pcm.synth_pcm16(3, 16000, 3200)
    blob = pcm.encode(x, "alaw")
    assert len(blob) == len(x)
    y = pcm.decode(blob, "alaw")
    assert 33.0 <= pcm.snr_db(x, y) <= 42.0
    assert pcm.encode(y, "alaw") == blob
    pts = pcm.decode(pcm.encode(np.array([0, 1, -1, 32767, -32768], dtype="<i2"), "alaw"), "alaw")
    assert list(pts) == [8, 8, -8, 32256, -32256]
