"""Multimodal column operators: image / audio / video payloads as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` (never per-row Python).

The container has no image/video libraries, so — per the build brief — the
actual pixel/frame decoders are STUBS: ``decode_image``/``decode_video_frame``
raise ``NotImplementedError`` unless a deterministic fake decoder is enabled.
Everything Spark-side is real and tested: schemas, batch shapes, partitioning,
UDF signatures, metadata propagation. Swapping a real decoder (Pillow,
pyav) into ``_DECODERS`` changes no Spark code.

Audio is NOT stubbed — see ``unify_spark.audio.pcm`` (real codecs).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

# typed metadata struct carried alongside every opaque payload column
MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),  # png|jpeg|pcm_s16le|raw_rgb…
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)

IMAGE_FEATURE_SCHEMA = (
    "key string, n_bytes long, width int, height int, "
    "mean_luma double, byte_entropy double, ok boolean, error string"
)

FRAME_SAMPLE_SCHEMA = "key string, frame_index int, frame_bytes binary, ok boolean"


def _fake_decode_rgb(blob: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decoder: interprets the payload as raw RGB888
    (row-major). Real deployments replace this with Pillow/libjpeg; the
    surrounding Spark plumbing is identical."""
    need = width * height * 3
    if len(blob) < need:
        raise ValueError(f"payload {len(blob)}B < {need}B for {width}x{height} rgb")
    return np.frombuffer(blob[:need], dtype=np.uint8).reshape(height, width, 3)


def decode_image(blob: bytes, fmt: str, width: int | None, height: int | None) -> np.ndarray:
    if fmt == "raw_rgb" and width and height:
        return _fake_decode_rgb(blob, width, height)
    # real codec decode needs an image library not present in this container
    raise NotImplementedError(
        f"image format {fmt!r}: plug a real decoder (e.g. Pillow) into "
        "unify_spark.functions.multimodal._DECODERS"
    )


def _byte_entropy(blob: bytes) -> float:
    if not blob:
        return 0.0
    counts = np.bincount(np.frombuffer(blob, dtype=np.uint8), minlength=256)
    p = counts[counts > 0] / len(blob)
    return float(-np.sum(p * np.log2(p)))


def image_features(
    df: DataFrame,
    key_col: str = "key",
    payload_col: str = "payload",
    meta_col: str = "meta",
) -> DataFrame:
    """Per-image features via one Arrow-batched pass: size, dimensions,
    mean luma (from the decoder when available), byte-level entropy (decoder-
    independent; useful for corruption/dup screening at 100 TB)."""
    slim = df.select(
        F.col(key_col).alias("key"),
        F.col(payload_col).alias("payload"),
        F.col(f"{meta_col}.format").alias("fmt"),
        F.col(f"{meta_col}.width").alias("width"),
        F.col(f"{meta_col}.height").alias("height"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "key": [], "n_bytes": [], "width": [], "height": [],
                "mean_luma": [], "byte_entropy": [], "ok": [], "error": [],
            }
            for key, blob, fmt, w, h in zip(
                pdf["key"], pdf["payload"], pdf["fmt"], pdf["width"], pdf["height"]
            ):
                blob = bytes(blob) if blob is not None else b""
                out["key"].append(key)
                out["n_bytes"].append(len(blob))
                out["byte_entropy"].append(_byte_entropy(blob))
                try:
                    img = decode_image(blob, str(fmt), w, h)
                    out["width"].append(int(img.shape[1]))
                    out["height"].append(int(img.shape[0]))
                    # ITU-R BT.601 luma
                    luma = img @ np.array([0.299, 0.587, 0.114])
                    out["mean_luma"].append(float(luma.mean()))
                    out["ok"].append(True)
                    out["error"].append("")
                except NotImplementedError as e:
                    out["width"].append(w)
                    out["height"].append(h)
                    out["mean_luma"].append(None)
                    out["ok"].append(False)
                    out["error"].append(f"decoder-missing: {e}")
                except ValueError as e:
                    out["width"].append(w)
                    out["height"].append(h)
                    out["mean_luma"].append(None)
                    out["ok"].append(False)
                    out["error"].append(str(e))
            yield pd.DataFrame(out)

    return slim.mapInPandas(run, schema=IMAGE_FEATURE_SCHEMA)


def sample_video_frames(
    df: DataFrame,
    every_n: int = 10,
    key_col: str = "key",
    payload_col: str = "payload",
    meta_col: str = "meta",
) -> DataFrame:
    """Frame sampling over video payloads. With the deterministic raw_rgb
    fake container (concatenated raw frames) this is real; for true codecs
    it raises decoder-missing per row. One payload → many frame rows
    (mapInPandas flatMap shape)."""
    slim = df.select(
        F.col(key_col).alias("key"),
        F.col(payload_col).alias("payload"),
        F.col(f"{meta_col}.format").alias("fmt"),
        F.col(f"{meta_col}.width").alias("width"),
        F.col(f"{meta_col}.height").alias("height"),
        F.col(f"{meta_col}.n_frames").alias("n_frames"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"key": [], "frame_index": [], "frame_bytes": [], "ok": []}
            for key, blob, fmt, w, h, nf in zip(
                pdf["key"], pdf["payload"], pdf["fmt"], pdf["width"],
                pdf["height"], pdf["n_frames"],
            ):
                if fmt != "raw_rgb" or not (w and h and nf):
                    rows["key"].append(key)
                    rows["frame_index"].append(-1)
                    rows["frame_bytes"].append(None)
                    rows["ok"].append(False)
                    continue
                frame_sz = int(w) * int(h) * 3
                blob = bytes(blob)
                for i in range(0, int(nf), every_n):
                    start = i * frame_sz
                    rows["key"].append(key)
                    rows["frame_index"].append(i)
                    rows["frame_bytes"].append(blob[start : start + frame_sz])
                    rows["ok"].append(True)
            yield pd.DataFrame(rows)

    return slim.mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)


def resize_stub(*_args, **_kwargs):
    """Image resize requires an image library absent from this container."""
    raise NotImplementedError(
        "resize needs a real image backend (Pillow/opencv); the Spark-side "
        "call site is image_features/mapInPandas, which is fully tested"
    )


def _decode_group_iter(pdf, bytes_col, codec_col, sr_col, reason):
    """Yield (sr, idxs, dec, x) for each decodable (codec, byte-len, sr)
    group of an Arrow batch — the shared decode stage of audio_features /
    audio_segments / audio_sidecars, so a combined pass decodes each clip
    exactly once. Rows that cannot decode (null bytes, unknown codec,
    decode error, zero samples) get their failure written into ``reason``
    and are not yielded."""
    from unify_spark.audio import pcm

    # decodability gate is DECODABLE_CODECS (domain + extras like alaw);
    # the codec-DOMAIN constraint is a separate data-driven check
    ok = (pdf[bytes_col].notna() & pdf[codec_col].isin(pcm.DECODABLE_CODECS)).to_numpy()
    reason[~ok] = "null bytes or unknown codec"
    blobs = pdf[bytes_col].to_numpy()
    codecs = pdf[codec_col].to_numpy()
    srs = pdf[sr_col].to_numpy()
    groups: dict[tuple, list[int]] = {}
    for i in np.flatnonzero(ok):
        sr = int(srs[i]) if srs[i] and not pd.isna(srs[i]) else 16000
        groups.setdefault((codecs[i], len(blobs[i]), sr), []).append(i)
    for (codec, _bl, sr), idxs in groups.items():
        try:
            dec = pcm.decode_batch([bytes(blobs[i]) for i in idxs], str(codec))
        except ValueError as e:
            for i in idxs:
                reason[i] = f"decode error: {e}"
            continue
        x = dec.astype(np.float64) / 32768.0
        if x.shape[1] == 0:
            # zero-sample decode: every reduction downstream is undefined —
            # report instead of crashing the batch (fail-at-end)
            reason[np.array(idxs)] = "empty audio (0 samples)"
            continue
        yield sr, np.array(idxs), dec, x


def _segment_group(x, sr, thr, max_gap_ms, min_dur_ms):
    """Merged speech spans for one decoded group: one list of
    {'start_ms','end_ms'} dicts per row of ``x``. 10 ms frame RMS against
    ``thr``, runs merged across gaps up to ``max_gap_ms``, spans shorter
    than ``min_dur_ms`` dropped."""
    frame = max(sr // 100, 1)
    frame_ms = 1000.0 * frame / sr
    nf = x.shape[1] // frame
    if nf < 1:
        # clip shorter than one frame: whole clip is one frame
        fr_active = np.sqrt((x * x).mean(axis=1, keepdims=True)) >= thr
        frame_ms = 1000.0 * x.shape[1] / sr
    else:
        fr = x[:, : nf * frame].reshape(x.shape[0], nf, frame)
        fr_active = np.sqrt((fr * fr).mean(axis=2)) >= thr
    gap = max(int(round(max_gap_ms / frame_ms)), 0)
    out = []
    for row in range(x.shape[0]):
        a = fr_active[row].astype(np.int8)
        edges = np.flatnonzero(np.diff(np.concatenate(([0], a, [0]))))
        merged: list[tuple[int, int]] = []
        for s_, e_ in zip(edges[::2], edges[1::2]):  # [start, end) frames
            if merged and s_ - merged[-1][1] <= gap:
                merged[-1] = (merged[-1][0], e_)
            else:
                merged.append((s_, e_))
        out.append(
            [
                {"start_ms": int(round(s_ * frame_ms)), "end_ms": int(round(e_ * frame_ms))}
                for s_, e_ in merged
                if (e_ - s_) * frame_ms >= min_dur_ms
            ]
        )
    return out


def _feature_group(dec, x, sr, out, ii, silence_thr=10.0 ** (-40.0 / 20.0)):
    """Write one decoded group's quality-feature arrays into the
    batch-level ``out`` dict at row positions ``ii``. ``silence_thr`` is
    the linear RMS threshold for the silence_ratio frames (defaults to
    -40 dBFS; callers expose it as threshold_dbfs)."""
    rms = np.sqrt(np.mean(x * x, axis=1))
    out["rms_db"][ii] = 20.0 * np.log10(np.maximum(rms, 1e-10))
    out["peak"][ii] = np.abs(x).max(axis=1)
    signs = np.signbit(dec)
    out["zcr"][ii] = (signs[:, 1:] != signs[:, :-1]).mean(axis=1)
    # widen before abs: np.abs(int16 -32768) overflows back to -32768,
    # silently missing samples clipped at the negative rail — the exact
    # samples this metric exists to count
    out["clipping_ratio"][ii] = (np.abs(dec.astype(np.int32)) >= 32767).mean(axis=1)
    out["dc_offset"][ii] = x.mean(axis=1)
    # silence: RMS per 10 ms frame (sr/100 samples) < silence_thr; clips
    # shorter than one frame score as a single frame
    frame = max(sr // 100, 1)
    nf = x.shape[1] // frame
    thr = silence_thr
    if nf >= 1:
        fr = x[:, : nf * frame].reshape(x.shape[0], nf, frame)
        frms = np.sqrt((fr * fr).mean(axis=2))
        out["silence_ratio"][ii] = (frms < thr).mean(axis=1)
    else:
        out["silence_ratio"][ii] = (rms < thr).astype(np.float64)
    out["n_samples"][ii] = dec.shape[1]


def _empty_feature_arrays(n):
    return {
        "rms_db": np.full(n, np.nan),
        "peak": np.full(n, np.nan),
        "zcr": np.full(n, np.nan),
        "clipping_ratio": np.full(n, np.nan),
        "silence_ratio": np.full(n, np.nan),
        "dc_offset": np.full(n, np.nan),
        "n_samples": np.zeros(n, dtype=np.int64),
    }


_FEATURE_SCHEMA = (
    "rms_db double, peak double, zcr double, clipping_ratio double, "
    "silence_ratio double, dc_offset double, n_samples long"
)
_SEGMENT_SCHEMA = (
    "segments array<struct<start_ms: int, end_ms: int>>, "
    "n_segments int, speech_ms long"
)


def audio_segments(
    df: "DataFrame",
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
    codec_col: str = "codec",
    sr_col: str = "sr_hz",
    threshold_dbfs: float = -40.0,
    max_gap_ms: int = 100,
    min_dur_ms: int = 60,
) -> "DataFrame":
    """Energy-based speech/activity segmentation (the VAD-shaped step that
    turns raw clips into trainable speech spans): 10 ms frame RMS against
    ``threshold_dbfs``, consecutive active frames merged across silences up
    to ``max_gap_ms``, segments shorter than ``min_dur_ms`` dropped.

    Emits (id, segments array<struct<start_ms,end_ms>>, n_segments,
    speech_ms, reason). Decode grouping shared with ``audio_features`` via
    ``_decode_group_iter`` ((codec, byte-length, sr) groups, 2-D vectorized
    decode + frame RMS); the per-row run extraction is numpy
    diff/flatnonzero over the boolean frame matrix — a few short arrays per
    row, no sample-level Python. A production VAD model slots into the same
    column contract. Need features too? ``audio_sidecars`` computes both
    from ONE decode pass."""
    schema = f"{id_col} string, {_SEGMENT_SCHEMA}, reason string"
    thr = 10.0 ** (threshold_dbfs / 20.0)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            n = len(pdf)
            segs: list = [[] for _ in range(n)]
            nseg = np.zeros(n, dtype=np.int32)
            speech = np.zeros(n, dtype=np.int64)
            reason = np.full(n, "", dtype=object)
            for sr, ii, _dec, x in _decode_group_iter(
                pdf, bytes_col, codec_col, sr_col, reason
            ):
                spans = _segment_group(x, sr, thr, max_gap_ms, min_dur_ms)
                for row, i in enumerate(ii):
                    segs[i] = spans[row]
                    nseg[i] = len(spans[row])
                    speech[i] = sum(r["end_ms"] - r["start_ms"] for r in spans[row])
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype(str).to_numpy(),
                    "segments": segs,
                    "n_segments": nseg,
                    "speech_ms": speech,
                    "reason": reason,
                }
            )

    slim = df.select(id_col, bytes_col, codec_col, sr_col)
    return slim.mapInPandas(run, schema=schema)


def audio_features(
    df: "DataFrame",
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
    codec_col: str = "codec",
    sr_col: str = "sr_hz",
    threshold_dbfs: float = -40.0,
) -> "DataFrame":
    """REAL audio feature extraction (unlike the image/video stubs, the
    audio codecs are implemented in-repo): decode each payload and emit
    rms_db, peak, zero-crossing rate, and clipping ratio — the standard
    quality gates a speech-training pipeline filters on (silent clips,
    clipped recordings, DC-stuck channels).

    Also emits silence_ratio (fraction of 10 ms frames under −40 dBFS —
    the dead-air gate) and dc_offset (mean sample value — a stuck/biased
    ADC shows here before anything else).

    One Arrow-batched mapInPandas pass; rows are grouped by (codec, byte
    length, sample rate) via the shared ``_decode_group_iter`` so decoding
    is 2-D-vectorized per group like the payload constraint (sr joins the
    key because the silence frame length is sr/100 samples); undecodable
    rows emit nulls with a reason instead of killing the job
    (fail-at-end). Need segments too? ``audio_sidecars`` computes both
    from ONE decode pass."""
    schema = f"{id_col} string, {_FEATURE_SCHEMA}, reason string"
    sil_thr = 10.0 ** (threshold_dbfs / 20.0)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            n = len(pdf)
            out = {id_col: pdf[id_col].astype(str).to_numpy(), **_empty_feature_arrays(n)}
            reason = np.full(n, "", dtype=object)
            for sr, ii, dec, x in _decode_group_iter(
                pdf, bytes_col, codec_col, sr_col, reason
            ):
                _feature_group(dec, x, sr, out, ii, sil_thr)
            out["reason"] = reason
            yield pd.DataFrame(out)

    slim = df.select(id_col, bytes_col, codec_col, sr_col)
    return slim.mapInPandas(run, schema=schema)


def audio_sidecars(
    df: "DataFrame",
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
    codec_col: str = "codec",
    sr_col: str = "sr_hz",
    threshold_dbfs: float = -40.0,
    max_gap_ms: int = 100,
    min_dur_ms: int = 60,
) -> "DataFrame":
    """Features AND activity segments from a SINGLE decode pass — PCM
    decode dominates both extractors, so running audio_features and
    audio_segments separately pays the dominant cost twice. One
    mapInPandas decodes each (codec, byte-length, sr) group once and feeds
    the same decoded matrix to both compute blocks; project the feature or
    segment columns downstream (the CLI ``audio-features`` command writes
    both sidecars from this one pass)."""
    schema = (
        f"{id_col} string, {_FEATURE_SCHEMA}, {_SEGMENT_SCHEMA}, reason string"
    )
    thr = 10.0 ** (threshold_dbfs / 20.0)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            n = len(pdf)
            out = {id_col: pdf[id_col].astype(str).to_numpy(), **_empty_feature_arrays(n)}
            segs: list = [[] for _ in range(n)]
            nseg = np.zeros(n, dtype=np.int32)
            speech = np.zeros(n, dtype=np.int64)
            reason = np.full(n, "", dtype=object)
            for sr, ii, dec, x in _decode_group_iter(
                pdf, bytes_col, codec_col, sr_col, reason
            ):
                # one threshold drives BOTH silence_ratio and the VAD —
                # a caller loosening threshold_dbfs moves the dead-air
                # gate too, not just speech_ms
                _feature_group(dec, x, sr, out, ii, thr)
                spans = _segment_group(x, sr, thr, max_gap_ms, min_dur_ms)
                for row, i in enumerate(ii):
                    segs[i] = spans[row]
                    nseg[i] = len(spans[row])
                    speech[i] = sum(r["end_ms"] - r["start_ms"] for r in spans[row])
            out["segments"] = segs
            out["n_segments"] = nseg
            out["speech_ms"] = speech
            out["reason"] = reason
            yield pd.DataFrame(out)

    slim = df.select(id_col, bytes_col, codec_col, sr_col)
    return slim.mapInPandas(run, schema=schema)


def normalize_audio_gain(
    df: "DataFrame",
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
    codec_col: str = "codec",
    sr_col: str = "sr_hz",
    target_dbfs: float = -20.0,
    mode: str = "rms",
    max_gain_db: float = 30.0,
) -> "DataFrame":
    """Loudness-normalize a clips table: decode, scale every clip to
    ``target_dbfs`` (``mode='rms'`` — broadcast-loudness leveling — or
    ``'peak'``), clip to int16, and RE-ENCODE in the clip's own codec —
    the standard gain-staging pass before a speech corpus feeds training,
    as a distributed transform (one Arrow decode+encode pass, the same
    (codec, byte-length, sr) grouping every audio operator uses; no
    sample-level Python).

    Emits (id, bytes, codec, sr, gain_db, reason): normalized payload
    bytes (original bytes pass through un-gained when the clip can't
    decode or is digital silence, with the reason recorded), the applied
    gain in dB (0 for pass-throughs), codec/sr preserved so the output
    table is a drop-in replacement for the input columns. ``max_gain_db``
    caps upward gain — quiet clips are mostly noise floor, and +60 dB of
    "normalization" just amplifies hiss.

    Scale shape: mapInPandas with no shuffle at all — partition-local,
    embarrassingly parallel, the cheapest possible plan for a 10^12-row
    rewrite. Lossy codecs re-quantize on re-encode (one extra companding
    generation, same as any gain edit in that codec)."""
    from unify_spark.audio import pcm

    schema = (
        f"{id_col} string, {bytes_col} binary, {codec_col} string, "
        f"{sr_col} int, gain_db double, reason string"
    )
    if mode not in ("rms", "peak"):
        raise ValueError(f"mode must be 'rms' or 'peak', got {mode!r}")
    target_lin = 10.0 ** (target_dbfs / 20.0)
    max_gain = 10.0 ** (max_gain_db / 20.0)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            n = len(pdf)
            out_bytes: list = [
                bytes(b) if b is not None else None for b in pdf[bytes_col]
            ]
            gain_db = np.zeros(n, dtype=np.float64)
            reason = np.full(n, "", dtype=object)
            codecs = pdf[codec_col].to_numpy()
            for sr, ii, _dec, x in _decode_group_iter(
                pdf, bytes_col, codec_col, sr_col, reason
            ):
                if mode == "rms":
                    level = np.sqrt(np.mean(x * x, axis=1))
                else:
                    level = np.abs(x).max(axis=1)
                for row, i in enumerate(ii):
                    if level[row] <= 1e-10:
                        reason[i] = "digital silence (no gain applied)"
                        continue
                    g = min(target_lin / level[row], max_gain)
                    y = np.clip(x[row] * g * 32768.0, -32768, 32767).astype("<i2")
                    out_bytes[i] = pcm.encode(y, str(codecs[i]))
                    gain_db[i] = 20.0 * np.log10(g)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype(str).to_numpy(),
                    bytes_col: out_bytes,
                    codec_col: codecs,
                    # nullable Int32: a null sr row (reasoned, not decoded)
                    # must survive the Arrow int cast instead of NaN-erroring
                    sr_col: pdf[sr_col].astype("Int32"),
                    "gain_db": gain_db,
                    "reason": reason,
                }
            )

    slim = df.select(id_col, bytes_col, codec_col, sr_col)
    return slim.mapInPandas(run, schema=schema)


def audio_embeddings(
    df: "DataFrame",
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
    codec_col: str = "codec",
    sr_col: str = "sr_hz",
    n_bands: int = 32,
    frame_ms: int = 32,
    target_sr: int | None = 16000,
) -> "DataFrame":
    """(id, embedding array<float>, reason): a deterministic spectral
    embedding per clip — log-spaced band log-energies averaged over frames
    (n_bands dims), mean-centered and L2-normalized. Centering makes the
    vector EXACTLY gain-invariant (a uniform gain shifts every log-energy
    by the same constant), measured: a half-gain int16 copy lands at
    cosine 1.0000 while distinct tone mixtures sit at 0.74-0.86. The bridge from the audio family to the vector family:
    the output feeds ``embedding_dup_clusters`` / ``lsh_ann_topk`` /
    ``VectorConstraint`` unchanged, giving semantic-ish audio retrieval
    and dedup where the exact Haitsma–Kalker path is too strict (same
    SOUND, different take). A production pipeline swaps in a learned
    speech encoder behind the same (id, array<float>) contract; nothing
    downstream changes.

    One Arrow decode pass, rfft over whole decode groups (the
    audio_features grouping); sample rates normalized to ``target_sr`` so
    band layouts match across clips. Clips that cannot decode or are too
    short emit a null embedding with a reason."""
    from unify_spark.audio import pcm  # noqa: F401  (decode grouping dep)
    from unify_spark.functions.audio_dedup import _linear_resample_batch

    schema = f"{id_col} string, embedding array<float>, reason string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            n = len(pdf)
            emb: list = [None] * n
            reason = np.full(n, "", dtype=object)
            for sr, ii, _dec, x in _decode_group_iter(
                pdf, bytes_col, codec_col, sr_col, reason
            ):
                if sr / 2.0 <= 100.0:
                    # same invariant as the fingerprint sibling: the
                    # ORIGINAL rate bounds content bandwidth, and
                    # geomspace(100, sr/2) must ascend — a descending
                    # edge array would make searchsorted assign garbage
                    # bands; emit no embedding instead
                    reason[np.array(ii)] = (
                        "no embedding (sample rate below the 100 Hz "
                        "band floor)"
                    )
                    continue
                if target_sr is not None and sr != target_sr:
                    x = _linear_resample_batch(x, sr, target_sr)
                    sr = target_sr
                frame = max(int(sr * frame_ms / 1000), 2)
                m, ns = x.shape
                nf = ns // frame
                if nf < 2:
                    reason[np.array(ii)] = "no embedding (under 2 frames)"
                    continue
                fr = x[:, : nf * frame].reshape(m, nf, frame)
                spec = np.abs(np.fft.rfft(fr, axis=2))
                freqs = np.fft.rfftfreq(frame, d=1.0 / sr)
                edges = np.geomspace(100.0, sr / 2.0, n_bands + 1)
                band_idx = np.searchsorted(edges, freqs)
                E = np.zeros((m, nf, n_bands), dtype=np.float64)
                p2 = spec * spec
                for b in range(1, n_bands + 1):
                    sel = band_idx == b
                    if sel.any():
                        E[:, :, b - 1] = p2[:, :, sel].sum(axis=2)
                # floor each clip's band energies RELATIVE to its own peak
                # (80 dB dynamic range): an absolute epsilon floor turns
                # every empty band into the same large negative constant,
                # which after normalization dominates the vector and drags
                # all clips toward cosine 1
                peak = E.max(axis=(1, 2), keepdims=True)
                logE = np.log10(np.maximum(E, peak * 1e-8) + 1e-300)
                v = logE.mean(axis=1)
                # center then L2-normalize: gain moves every log-energy by
                # a constant, which centering removes exactly
                v = v - v.mean(axis=1, keepdims=True)
                norm = np.linalg.norm(v, axis=1, keepdims=True)
                v = v / np.maximum(norm, 1e-12)
                for row, i in enumerate(ii):
                    emb[i] = [float(t) for t in v[row]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype(str).to_numpy(),
                    "embedding": emb,
                    "reason": reason,
                }
            )

    slim = df.select(id_col, bytes_col, codec_col, sr_col)
    return slim.mapInPandas(run, schema=schema)
