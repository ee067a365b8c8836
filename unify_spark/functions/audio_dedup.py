"""Acoustic fingerprinting + near-duplicate audio detection.

Text dedup catches byte-identical audio via payload digests
(``clean_audio_corpus``); what it cannot catch is the SAME RECORDING under
a different codec, level, or container — the dominant duplication mode in
scraped audio. The standard answer is a robust hash over the
time-frequency energy surface: this module implements the classic
Haitsma–Kalker fingerprint (Philips robust hash, ISMIR 2002 — a public,
widely reimplemented algorithm): per audio frame, log-spaced band
energies; one bit per adjacent band pair from the sign of the
energy-difference's time derivative. HK uses 33 bands / 32 bits per
frame; the default here is 17 bands / 16 bits — measured on tone-mixture
signals, the coarser bands hold 50% exact-frame overlap through even the
8-bit mu-law re-encode (vs 30% at 33 bands) while different signals still
share zero sub-fingerprints; ``n_bands`` restores the paper layout. Bits depend only
on SIGNS of energy differences, so uniform gain, quantization noise, and
mild lossy coding leave most bits intact.

Near-dup detection then reuses the text family's capped-join skeleton:
clips sharing ≥ ``min_shared`` exact 32-bit sub-fingerprints are
candidates — the same shape as ``ngram_jaccard_pairs`` with sub-
fingerprints as the shingles, inheriting the hot-bucket cap and the
slim-join scale properties.

All DSP is numpy (rfft over whole decode groups at once) inside the same
Arrow decode grouping the other audio operators use — no sample-level
Python, no extra decode pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _linear_resample_batch(x, sr_from: int, sr_to: int):
    """Vectorized linear-interpolation resample of an (m, n) PCM matrix —
    enough to normalize sample rates before fingerprinting (the bands only
    reach 2 kHz, far under any practical Nyquist; a production pipeline
    would polyphase-filter first)."""
    import numpy as np

    n_in = x.shape[1]
    n_out = max(int(round(n_in * sr_to / sr_from)), 1)
    pos = np.arange(n_out) * (sr_from / sr_to)
    i0 = np.floor(pos).astype(np.int64)
    i0 = np.minimum(i0, n_in - 1)
    i1 = np.minimum(i0 + 1, n_in - 1)
    frac = pos - i0
    return x[:, i0] * (1.0 - frac) + x[:, i1] * frac


def _hk_bits_batch(x, sr: int, frame_ms: int, n_bands: int, hop_ms: int | None = None):
    """(m, n_samples) float PCM → list of per-clip int64 arrays of packed
    (n_bands-1)-bit sub-fingerprints, one per frame START (frames advance by
    ``hop_ms``, overlapping when hop < frame — HK overlaps 31/32 for exactly
    this reason: a time shift then misaligns frames by at most hop/2, so
    most sub-fingerprints survive a trim/pad; ``hop_ms=None`` keeps the
    legacy non-overlapping hop = frame layout)."""
    import numpy as np

    frame = max(int(sr * frame_ms / 1000), 2)
    hop = frame if hop_ms is None else min(max(int(sr * hop_ms / 1000), 1), frame)
    m, n = x.shape
    nf = (n - frame) // hop + 1 if n >= frame else 0
    # geomspace(300, fmax) must ascend: below ~602 Hz sample rate the band
    # range collapses and searchsorted over a descending array would
    # assign garbage bands — emit no fingerprint instead
    if nf < 2 or min(2000.0, sr / 2.0 - 1) <= 300.0:
        return [np.zeros(0, dtype=np.int64) for _ in range(m)]
    # strided view: (m, nf, frame) overlapping frames with zero copy; the
    # rfft materializes (m, nf, frame//2+1) — the only overlap-factor cost
    fr = np.lib.stride_tricks.sliding_window_view(x, frame, axis=1)[:, ::hop, :]
    spec = np.abs(np.fft.rfft(fr, axis=2))  # (m, nf, frame//2+1)

    # log-spaced band edges over [300 Hz, min(2000, sr/2)) — the HK band
    # layout; energies are sums of squared magnitudes per band
    freqs = np.fft.rfftfreq(frame, d=1.0 / sr)
    fmax = min(2000.0, sr / 2.0 - 1)
    edges = np.geomspace(300.0, fmax, n_bands + 1)
    band_idx = np.searchsorted(edges, freqs)  # 0..n_bands+1
    E = np.zeros((m, nf, n_bands), dtype=np.float64)
    p2 = spec * spec
    for b in range(1, n_bands + 1):
        sel = band_idx == b
        if sel.any():
            E[:, :, b - 1] = p2[:, :, sel].sum(axis=2)

    # bit(n, b) = sign( (E[n,b]-E[n,b+1]) - (E[n-1,b]-E[n-1,b+1]) )
    d = E[:, :, :-1] - E[:, :, 1:]          # (m, nf, n_bands-1)
    bits = (d[:, 1:, :] - d[:, :-1, :]) > 0  # (m, nf-1, n_bands-1)
    weights = 1 << np.arange(n_bands - 1, dtype=np.int64)
    packed = bits.astype(np.int64) @ weights  # (m, nf-1)
    return [packed[i] for i in range(m)]


def audio_fingerprints(
    df: DataFrame,
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
    codec_col: str = "codec",
    sr_col: str = "sr_hz",
    frame_ms: int = 64,
    n_bands: int = 17,
    target_sr: int | None = 16000,
    hop_ms: int | None = 4,
    max_pos_per_fp: int = 8,
) -> DataFrame:
    """(id, fps array<bigint>, n_frames, vfps, vposs, reason): the
    per-frame packed sub-fingerprint sequence for every decodable clip,
    plus the alignment-voting sidecar — ``vfps`` lists each DISTINCT
    sub-fp once and ``vposs[i]`` its first ``max_pos_per_fp`` frame
    positions (``audio_near_dup_candidates``' align path joins on these;
    one row per (clip, fp) after the explode, so the hot-fp cap counts
    CLIPS, not position rows). Same (codec, byte-length, sr) Arrow decode
    grouping as audio_features; clips too short for two frames emit an
    empty sequence with a reason.

    ``target_sr``: sample rates are NORMALIZED (vectorized linear resample)
    before framing, so the same recording re-uploaded at a different rate —
    a common duplicate mode — still lands on matching sub-fingerprints;
    None fingerprints each clip at its native rate.

    ``hop_ms``: frame-start stride. The default 4 ms (frame/16 overlap)
    buys time-offset robustness: a re-upload trimmed or padded by e.g.
    100 ms misaligns the legacy non-overlapping grid completely, but with
    a 4 ms hop the duplicate's frames land within 2 ms of an original
    frame start — most sign-of-energy-difference bits survive. Measured
    worst case over 30-200 ms offsets with alignment voting: 11 aligned
    shared sub-fps at hop 4 (vs the min_shared=5 default; 4 at hop 8;
    ~1 without overlap), while unrelated signals — including 20 s clips,
    whose raw set intersection reaches ~27 by 16-bit chance collisions —
    stay at an aligned count of 1-2. Cost is ~frame/hop more rfft frames
    per clip inside the existing decode pass (measured in
    BENCH/BASELINE.md). ``hop_ms=None`` restores the non-overlapping
    hop = frame layout."""
    import pandas as pd

    from unify_spark.functions.multimodal import _decode_group_iter

    schema = (
        f"{id_col} string, fps array<bigint>, n_frames int, "
        "vfps array<bigint>, vposs array<array<int>>, reason string"
    )

    def run(batches):
        import numpy as np

        def capped_positions(arr, cap):
            # per DISTINCT sub-fp, up to ``cap`` frame positions (stable
            # order): the alignment join's input, bounded so a periodic
            # clip repeating one fp hundreds of times cannot blow the
            # self-join up quadratically; grouped per fp so the exploded
            # frame is one row per (clip, fp) and the hot-fp cap counts
            # clips
            if len(arr) == 0:
                return arr, []
            order = np.argsort(arr, kind="stable")
            sv = arr[order]
            starts = np.flatnonzero(np.concatenate([[True], sv[1:] != sv[:-1]]))
            sizes = np.diff(np.concatenate([starts, [len(sv)]]))
            rank = np.arange(len(sv)) - np.repeat(starts, sizes)
            keep = rank < cap
            kept_sizes = np.minimum(sizes, cap)
            bounds = np.cumsum(kept_sizes)[:-1]
            return sv[starts], np.split(order[keep], bounds)

        for pdf in batches:
            if pdf.empty:
                continue
            n = len(pdf)
            fps: list = [[] for _ in range(n)]
            vfps: list = [[] for _ in range(n)]
            vposs: list = [[] for _ in range(n)]
            nfr = np.zeros(n, dtype=np.int32)
            reason = np.full(n, "", dtype=object)
            for sr, ii, _dec, x in _decode_group_iter(
                pdf, bytes_col, codec_col, sr_col, reason
            ):
                if sr / 2.0 - 1 <= 300.0:
                    # the ORIGINAL rate bounds the content bandwidth:
                    # resampling a sub-600 Hz-rate clip upward cannot put
                    # real energy into the 300-2000 Hz bands
                    reason[np.array(ii)] = (
                        "no fingerprint (sample rate below the 300-2000 Hz "
                        "band range)"
                    )
                    continue
                if target_sr is not None and sr != target_sr:
                    x = _linear_resample_batch(x, sr, target_sr)
                    sr = target_sr
                packs = _hk_bits_batch(x, sr, frame_ms, n_bands, hop_ms)
                for row, i in enumerate(ii):
                    arr = packs[row]
                    if len(arr) == 0:
                        reason[i] = (
                            "no fingerprint (under 2 frames or sample rate "
                            "below the 300-2000 Hz band range)"
                        )
                    fps[i] = [int(v) for v in arr]
                    nfr[i] = len(arr)
                    # sub-fps with (capped) frame positions — the
                    # alignment-voting join's input, computed here in numpy
                    # instead of with a grouped shuffle later
                    cv, ci = capped_positions(arr, max_pos_per_fp)
                    vfps[i] = [int(v) for v in cv]
                    vposs[i] = [[int(p) for p in ps] for ps in ci]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype(str).to_numpy(),
                    "fps": fps,
                    "n_frames": nfr,
                    "vfps": vfps,
                    "vposs": vposs,
                    "reason": reason,
                }
            )

    slim = df.select(id_col, bytes_col, codec_col, sr_col)
    return slim.mapInPandas(run, schema=schema)


def _aligned_pair_counts(sh: DataFrame, min_shared: int) -> DataFrame:
    """Time-alignment voting over an (id, fp, pos) frame: join on the
    sub-fingerprint, vote each pair's matches by the frame-index DELTA,
    and score the pair by the number of DISTINCT sub-fingerprints
    consistent with the best single delta (±1 frame of jitter merged). A
    true duplicate's matches concentrate at one delta — the time offset
    between the recordings — while chance collisions between unrelated
    long clips scatter over deltas and never accumulate. This is the
    Haitsma–Kalker lookup's alignment step as a distributed join.

    Counting distinct fps (not position pairs) is load-bearing: a clip
    whose signal is stationary emits ONE sub-fingerprint at every frame,
    so two UNRELATED hums/tones would otherwise self-align — the capped
    position lists alone give cap² same-delta position pairs from that
    single shared fp, enough to clear any min_shared. One vote per
    (pair, fp, delta) caps a repeated fp's contribution at 1. The ±1
    jitter merge is a 3-way delta smear + hash re-aggregation (distinct
    count per merged center), not a range window — no per-pair sort, and
    a fp voting at both d and d+1 still counts once at each center."""
    a, b = sh.alias("a"), sh.alias("b")
    delta = F.col("b.pos") - F.col("a.pos")
    votes = (
        a.join(b, on="fp")
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            "fp",
            delta.alias("delta"),
        )
        .distinct()
    )
    smeared = votes.select(
        "id_a",
        "id_b",
        "fp",
        F.explode(
            F.array(F.col("delta") - 1, F.col("delta"), F.col("delta") + 1)
        ).alias("center"),
    )
    return (
        smeared.groupBy("id_a", "id_b", "center")
        .agg(F.countDistinct("fp").alias("aligned"))
        .groupBy("id_a", "id_b")
        .agg(F.max("aligned").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def audio_near_dup_candidates(
    df: DataFrame,
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
    codec_col: str = "codec",
    sr_col: str = "sr_hz",
    frame_ms: int = 64,
    n_bands: int = 17,
    min_shared: int = 5,
    max_fp_freq: int | None = 10000,
    target_sr: int | None = 16000,
    hop_ms: int | None = 4,
    align: bool = True,
) -> DataFrame:
    """(id_a, id_b, n_shared, overlap): clip pairs sharing ≥ ``min_shared``
    exact sub-fingerprints — the same recording under a different codec /
    gain / container, at a different rate, or trimmed/padded by a small
    time offset (the overlapping-frame ``hop_ms`` grid) surfaces here
    while unrelated audio does not.
    ``overlap`` = n_shared / min(frame counts), a containment-style score.

    ``align=True`` (default): matches additionally vote on the frame-index
    DELTA between the two clips' first occurrences of each shared
    sub-fingerprint, and ``n_shared`` is the best single alignment's count
    (±1 frame of jitter merged). True duplicates concentrate at one delta
    (their time offset); chance 16-bit collisions between unrelated LONG
    clips — the density floor that grows quadratically with clip length —
    scatter over deltas and stay under ``min_shared``. ``align=False``
    restores plain set-intersection counting.

    Scale shape: the winnow/Jaccard capped-join skeleton — DISTINCT
    (id, fp[, first pos]) rows explode, sub-fingerprints present in more
    than ``max_fp_freq`` clips are dropped before the self-join (silence
    and DC-flat frames hash alike and would contribute candidates
    quadratically), shared counts aggregate (one extra slim delta-keyed
    aggregation + a per-pair window on the align path), sizes join back
    slim."""
    from unify_spark.functions.dedup import _drop_hot_buckets

    fps = audio_fingerprints(
        df, id_col, bytes_col, codec_col, sr_col, frame_ms, n_bands, target_sr, hop_ms
    ).filter(F.col("n_frames") > 0)
    if align:
        # one row per (clip, DISTINCT fp) with the capped position list —
        # the hot-fp cap below therefore counts clips per fp (same
        # semantics as the align=False path), not position rows; positions
        # explode only after the cap, on the partitioning the cap's
        # window already established
        per_fp = fps.select(
            F.col(id_col).alias("id"),
            F.explode(F.arrays_zip("vfps", "vposs")).alias("z"),
        ).select(
            "id", F.col("z.vfps").alias("fp"), F.col("z.vposs").alias("poss")
        )
        per_fp = _drop_hot_buckets(per_fp, ["fp"], max_fp_freq)
        sh = per_fp.select("id", "fp", F.explode("poss").alias("pos"))
        inter = _aligned_pair_counts(sh, min_shared)
    else:
        sh = fps.select(
            F.col(id_col).alias("id"), F.explode(F.array_distinct("fps")).alias("fp")
        )
        sh = _drop_hot_buckets(sh, ["fp"], max_fp_freq)
        a, b = sh.alias("a"), sh.alias("b")
        inter = (
            a.join(b, on="fp")
            .where(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .filter(F.col("n_shared") >= min_shared)
        )
    sizes = fps.select(F.col(id_col).alias("id"), F.col("n_frames").alias("sz"))
    return (
        inter.join(sizes.withColumnsRenamed({"id": "id_a", "sz": "sz_a"}), on="id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "sz": "sz_b"}), on="id_b")
        .select(
            "id_a",
            "id_b",
            "n_shared",
            (F.col("n_shared") / F.least(F.col("sz_a"), F.col("sz_b"))).alias("overlap"),
        )
    )


def audio_dup_clusters(
    df: DataFrame,
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
    codec_col: str = "codec",
    sr_col: str = "sr_hz",
    frame_ms: int = 64,
    n_bands: int = 17,
    min_shared: int = 5,
    max_fp_freq: int | None = 10000,
    max_iter: int = 50,
    target_sr: int | None = 16000,
    hop_ms: int | None = 4,
    align: bool = True,
) -> DataFrame:
    """(id, cluster) over acoustic near-dup candidates via the same
    pointer-doubling connected components the text and embedding paths use
    — re-encode families collapse into one cluster; clips with no
    near-dup edge keep their own id (singletons). ``target_sr``/``hop_ms``/
    ``align`` reach through to the candidate generator so a corpus
    fingerprinted at a non-default rate or frame grid clusters
    consistently."""
    from unify_spark.functions.graph import connected_components

    pairs = audio_near_dup_candidates(
        df, id_col, bytes_col, codec_col, sr_col,
        frame_ms, n_bands, min_shared, max_fp_freq, target_sr, hop_ms, align,
    )
    cc = connected_components(pairs, "id_a", "id_b", max_iter=max_iter)
    return (
        df.select(F.col(id_col).alias("node"))
        .join(cc, on="node", how="left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce("component", F.col("node")).alias("cluster"),
        )
    )
