"""Deterministic PCM16 synthesis and codec encode/decode (pure numpy).

The container has no real audio libraries (no soundfile/ffmpeg), so — per the
build brief — the *plumbing* (binary columns, Arrow-batched vectorized decode,
schema, batch shape) is real while the lossy/compressed codecs are
deterministic stand-ins with realistic properties:

- ``pcm_s16le``: genuine raw little-endian PCM16 (lossless).
- ``flac``     : lossless stand-in — first-order delta coding with a 5-byte
                 magic header. Real delta-PCM, exact round-trip. A production
                 deployment swaps ``_decode_flac`` for pysoundfile; the Spark
                 side (mapInPandas over binary) is unchanged.
- ``ulaw``     : genuine ITU-T G.711 mu-law companding (public algorithm),
                 8 bits/sample, ~38 dB SNR on speech-level signals.
- ``mp3``      : lossy stand-in — 12-bit mid-tread quantization behind a
                 4-byte magic header (~68 dB SNR). Stand-in for the same
                 reason as flac; clearly marked.

Everything is integer/deterministic so byte payloads are stable across
platforms (FIXTURES.md requirement; cf. the reference's deterministic
v5-UUID entity filenames, reference src/com/vendekagonlabs/unify/import/engine.clj:205-226).
"""

from __future__ import annotations

import numpy as np

CODEC_DOMAIN = ("pcm_s16le", "flac", "ulaw", "mp3")

_FLAC_MAGIC = b"fLaC0"
_MP3_MAGIC = b"MPG0"

# ---------------------------------------------------------------------------
# synthesis
# ---------------------------------------------------------------------------


_LCG_A = np.uint64(6364136223846793005)
_LCG_C = np.uint64(1442695040888963407)
_LCG_STRIDE = 4096
_lcg_powers = np.empty(_LCG_STRIDE, dtype=np.uint64)  # a^0 .. a^(stride-1)
with np.errstate(over="ignore"):
    _a = np.uint64(1)
    for _j in range(_LCG_STRIDE):
        _lcg_powers[_j] = _a
        _a = _a * _LCG_A
    _lcg_csum = np.cumsum(_lcg_powers * _LCG_C, dtype=np.uint64)  # c * sum a^t
del _a, _j


def _noise_vec(index: int, n: int) -> np.ndarray:
    """Deterministic per-clip noise from a 64-bit LCG (platform-stable,

    unlike float RNG streams). Vectorized via the jump-ahead closed form
    x_{i+j} = a^j x_i + c * sum_{t<j} a^t evaluated blockwise in wrapping
    uint64 — O(n) numpy ops. Returns floats in [-1, 1)."""
    x0 = np.uint64((index * 2654435761 + 42) & 0xFFFFFFFFFFFFFFFF)
    out = np.empty(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        x = x0 * _LCG_A + _LCG_C  # x_1
        pos = 0
        while pos < n:
            k = min(_LCG_STRIDE, n - pos)
            out[pos : pos + k] = _lcg_powers[:k] * x + np.concatenate(
                ([np.uint64(0)], _lcg_csum[: k - 1])
            )
            x = _lcg_powers[k - 1] * _LCG_A * x + _lcg_csum[k - 1]
            pos += k
    # top 53 bits → [0,1) → [-1,1)
    return (out >> np.uint64(11)).astype(np.float64) / float(1 << 53) * 2.0 - 1.0


def synth_pcm16(index: int, sr_hz: int, n_samples: int) -> np.ndarray:
    """Reference signal for clip ``index``: 0.5-amplitude sine at

    110 + (index % 880) Hz plus 1% deterministic noise → int16 array.
    This doubles as the *reference decoder output* the payload constraint
    compares against (BASELINE.json input_hint: decoded-PCM allclose /
    SNR >= 30 dB vs reference)."""
    if n_samples <= 0:
        return np.zeros(0, dtype="<i2")
    freq = 110.0 + float(index % 880)
    t = np.arange(n_samples, dtype=np.float64) / float(sr_hz)
    sig = 0.5 * np.sin(2.0 * np.pi * freq * t) + 0.01 * _noise_vec(index, n_samples)
    return np.clip(np.rint(sig * 32767.0), -32768, 32767).astype("<i2")


# ---------------------------------------------------------------------------
# codecs
# ---------------------------------------------------------------------------


def _encode_ulaw(pcm: np.ndarray) -> bytes:
    """ITU-T G.711 mu-law compression (mu=255, public-domain algorithm)."""
    x = pcm.astype(np.int32)
    sign = np.where(x < 0, 0x80, 0).astype(np.int32)
    mag = np.minimum(np.abs(x), 32635) + 0x84  # bias 132
    exp = (np.floor(np.log2(mag)) - 7).astype(np.int32)
    exp = np.clip(exp, 0, 7)
    mantissa = (mag >> (exp + 3)) & 0x0F
    ulaw = ~(sign | (exp << 4) | mantissa) & 0xFF
    return ulaw.astype(np.uint8).tobytes()


def _decode_ulaw(data: bytes) -> np.ndarray:
    u = ~np.frombuffer(data, dtype=np.uint8).astype(np.int32) & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mantissa = u & 0x0F
    mag = ((mantissa << 3) + 0x84) << exp
    mag -= 0x84
    out = np.where(sign != 0, -mag, mag)
    return np.clip(out, -32768, 32767).astype("<i2")


def _encode_flac(pcm: np.ndarray) -> bytes:
    # first-order delta in wrap-around int16 space: exact lossless round-trip
    d = np.diff(pcm.astype(np.int16), prepend=np.int16(0)).astype("<i2")
    return _FLAC_MAGIC + d.tobytes()


def _decode_flac(data: bytes) -> np.ndarray:
    if not data.startswith(_FLAC_MAGIC):
        raise ValueError("bad flac header")
    d = np.frombuffer(data[len(_FLAC_MAGIC) :], dtype="<i2")
    return np.cumsum(d.astype(np.int64)).astype(np.int16).astype("<i2")


def _encode_mp3(pcm: np.ndarray) -> bytes:
    q = (pcm.astype(np.int16) >> 4).astype(np.int16)  # keep 12 bits
    return _MP3_MAGIC + (q << 4).astype("<i2").tobytes()


def _decode_mp3(data: bytes) -> np.ndarray:
    if not data.startswith(_MP3_MAGIC):
        raise ValueError("bad mp3 header")
    return np.frombuffer(data[len(_MP3_MAGIC) :], dtype="<i2")


def encode(pcm: np.ndarray, codec: str) -> bytes:
    if codec == "pcm_s16le":
        return pcm.astype("<i2").tobytes()
    if codec == "flac":
        return _encode_flac(pcm)
    if codec == "ulaw":
        return _encode_ulaw(pcm)
    if codec == "mp3":
        return _encode_mp3(pcm)
    # out-of-domain codecs (violation fixtures) carry raw PCM payloads
    return pcm.astype("<i2").tobytes()


def decode(data: bytes, codec: str) -> np.ndarray:
    """Decode a payload; raises on malformed input (caller maps to violation)."""
    if codec == "pcm_s16le":
        if len(data) % 2:
            raise ValueError("odd pcm16 byte length")
        return np.frombuffer(data, dtype="<i2")
    if codec == "flac":
        if (len(data) - len(_FLAC_MAGIC)) % 2:
            raise ValueError("odd flac payload length")
        return _decode_flac(data)
    if codec == "ulaw":
        return _decode_ulaw(data)
    if codec == "mp3":
        if (len(data) - len(_MP3_MAGIC)) % 2:
            raise ValueError("odd mp3 payload length")
        return _decode_mp3(data)
    raise ValueError(f"unknown codec: {codec}")


def snr_db(reference: np.ndarray, decoded: np.ndarray) -> float:
    """SNR of ``decoded`` against ``reference`` in dB; -inf on length
    mismatch or silent reference."""
    if reference.shape != decoded.shape or reference.size == 0:
        return float("-inf")
    ref = reference.astype(np.float64)
    err = ref - decoded.astype(np.float64)
    p_sig = float(np.mean(ref * ref))
    p_err = float(np.mean(err * err))
    if p_err == 0.0:
        return float("inf")
    if p_sig == 0.0:
        return float("-inf")
    return 10.0 * np.log10(p_sig / p_err)
