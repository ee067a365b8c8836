"""Deterministic synthetic fixture generator (FIXTURES.md T1–T4 + V1–V8).

The analogue of the reference's golden-count integration fixtures
(reference test/resources/systems/candel/small-reference-import/validations.edn and
the 2601-tx pin at test/com/vendekagonlabs/unify/import_test.clj:68): a seeded
clips + transcript_map dataset with *known, disjoint, exactly-counted* injected
violations, plus a JSON manifest of the expected violation keys per constraint
so pytest can pin exact violation-row sets and the per-partition verdict
matrix.

Payload note: ``dur_ms`` is the clip's logical duration (drives stats/range/
drift constraints); the stored byte payload is synthesized for
``min(dur_ms, payload_cap_ms)`` so fixture volume stays test-sized. The
payload constraint derives its expected frame count with the same cap. At
production scale the cap is simply None.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from unify_spark.audio import pcm

SR_CHOICES = (8000, 16000, 22050, 44100, 48000)  # weights 1,4,1,2,2 (of 10)
_SR_BY_DECILE = (8000, 16000, 16000, 16000, 16000, 22050, 44100, 44100, 48000, 48000)
_CODEC_BY_DECILE = (
    "pcm_s16le", "pcm_s16le", "pcm_s16le", "pcm_s16le", "pcm_s16le", "pcm_s16le",
    "flac", "flac", "ulaw", "mp3",
)
BAD_CODECS = ("opus", "wav")
DUR_MIN_MS, DUR_MAX_MS = 200, 30000

_WORDLIST = tuple(f"w{i:03d}" for i in range(512))


def _h(i: int, salt: int = 0) -> int:
    """Deterministic 32-bit mix (Knuth multiplicative hash)."""
    return ((i + salt * 1_000_003) * 2654435761) & 0xFFFFFFFF


def _transcript(i: int, dur_ms: int) -> str:
    n_words = max(1, min(int(dur_ms) // 400, 60))
    return " ".join(_WORDLIST[_h(i, k + 1) % 512] for k in range(n_words))


_MAX_WORDS = 60


def _transcripts_vec(idx: np.ndarray, dur: np.ndarray) -> list[str]:
    """Vectorized batch of ``_transcript`` (identical output): the 2-D word
    index matrix is one numpy expression; only the joins stay in Python."""
    n_words = np.clip(dur // 400, 1, _MAX_WORDS).astype(np.int64)
    k = np.arange(1, _MAX_WORDS + 1, dtype=np.int64)
    with np.errstate(over="ignore"):
        w = (
            (idx[:, None] + k[None, :] * 1_000_003) * 2654435761 & 0xFFFFFFFF
        ) % 512
    wl = _WORDLIST
    return [
        " ".join(wl[j] for j in row[:n]) for row, n in zip(w, n_words)
    ]


@dataclass
class FixtureManifest:
    """Expected violation keys per constraint id (the golden answer)."""

    n_rows: int
    n_parts: int
    payload_cap_ms: int
    uniqueness_clip_ids: list[str] = field(default_factory=list)       # V1
    dangling_transcript_ids: list[str] = field(default_factory=list)   # V2
    mismatch_transcript_ids: list[str] = field(default_factory=list)   # V3
    codec_domain_clip_ids: list[str] = field(default_factory=list)     # V4
    range_clip_ids: list[str] = field(default_factory=list)            # V5
    nullness_clip_ids: list[str] = field(default_factory=list)         # V6
    payload_clip_ids: list[str] = field(default_factory=list)          # V7
    drift_part: str = ""                                               # V8

    def to_json(self) -> str:
        return json.dumps(self.__dict__, indent=2, sort_keys=True)


def _part_date(i: int, n_parts: int) -> str:
    return f"2025-01-{1 + _h(i, 9) % n_parts:02d}"


def _payload_shard(args):
    """Worker: transcripts + payload bytes + reference sha/rms for a
    contiguous row range. Everything derives from (idx, dur, sr, codec) —
    no RNG — so sharding cannot change a single byte of output. Groups are
    chunked to ≤ 64k rows per synth/encode call to bound the (rows ×
    samples) intermediate matrices (an unchunked 2M-row group materializes
    multi-GB float64 temporaries — the measured superlinear wall at ≥ 2M
    rows)."""
    idx, dur, sr, codec, payload_cap_ms = args
    import pandas as _pd

    transcripts = _transcripts_vec(idx, dur)
    n = len(idx)
    n_samples_arr = np.minimum(dur, payload_cap_ms) * sr // 1000
    blobs: list[bytes | None] = [None] * n
    ref_sha: list[str] = [""] * n
    ref_rms: list[float] = [0.0] * n
    groups = _pd.DataFrame(
        {"sr": sr, "ns": n_samples_arr, "codec": [str(c) for c in codec]}
    ).groupby(["sr", "ns", "codec"], sort=False).indices
    CHUNK = 65536
    for (sr_v, ns_v, codec_v), g_all in groups.items():
        for off in range(0, len(g_all), CHUNK):
            g = g_all[off : off + CHUNK]
            raw = pcm.synth_pcm16_batch(idx[g], int(sr_v), int(ns_v))
            enc = pcm.encode_batch(raw, codec_v)
            if codec_v in pcm.CODEC_DOMAIN:
                dec = pcm.decode_batch(enc, codec_v) if ns_v > 0 else raw
            else:
                dec = raw  # out-of-domain codecs carry raw pcm
            rms = (
                np.sqrt(np.mean(dec.astype(np.float64) ** 2, axis=1))
                if dec.shape[1]
                else np.zeros(len(g))
            )
            for k, i in enumerate(g):
                blobs[i] = enc[k]
                ref_sha[i] = hashlib.sha256(dec[k].tobytes()).hexdigest()
                ref_rms[i] = float(rms[k])
    return transcripts, blobs, ref_sha, ref_rms


_PARALLEL_THRESHOLD = 400_000


def generate_fixture(
    out_dir: str,
    n_rows: int = 10_000,
    n_parts: int = 8,
    seed: int = 42,
    payload_cap_ms: int = 50,
    inject: bool = True,
    files_per_part: int = 1,
    workers: int | None = None,
) -> FixtureManifest:
    """Write clips/, transcript_map/, codec_domain/, reference_decode/
    parquet datasets under ``out_dir`` and return the violation manifest.

    All randomness is PCG64(seed) vectorized draws + integer hash mixes —
    byte-stable across runs and platforms. Payload synthesis (the wall-time
    bulk) is sharded over ``workers`` spawn processes for n_rows ≥ 400k —
    contiguous index ranges, so output is byte-identical to the serial
    path (pinned by test); spawn (not fork) because callers may hold a
    JVM-threaded SparkSession."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.Generator(np.random.PCG64(seed))
    idx = np.arange(n_rows)

    # -- column draws (vectorized) ------------------------------------------
    dur = np.exp(rng.normal(np.log(3000.0), 0.6, size=n_rows))
    dur = np.clip(dur, DUR_MIN_MS, DUR_MAX_MS).astype(np.int64)
    with np.errstate(over="ignore"):
        h_sr = (idx * 2654435761 + 11 * 1_000_003 * 2654435761) & 0xFFFFFFFF
        h_codec = (idx * 2654435761 + 12 * 1_000_003 * 2654435761) & 0xFFFFFFFF
        h_part = ((idx + 9 * 1_000_003) * 2654435761) & 0xFFFFFFFF
    sr = np.array(_SR_BY_DECILE, dtype=np.int64)[h_sr % 10]
    codec = np.array(_CODEC_BY_DECILE, dtype=object)[h_codec % 10]
    part_names = np.array([f"2025-01-{1 + p:02d}" for p in range(n_parts)], dtype=object)
    part = part_names[h_part % n_parts]

    manifest = FixtureManifest(n_rows=n_rows, n_parts=n_parts, payload_cap_ms=payload_cap_ms)

    # -- violation index sets (disjoint; see FIXTURES.md) --------------------
    v1_dup_src = list(range(100, 125)) if inject else []          # 25 dup clip_ids
    v2_dangling = list(range(17)) if inject else []               # 17 dangling map rows
    v3_mismatch = list(range(700, 713)) if inject else []         # 13 transcript mismatches
    v4_codec = list(range(300, 311)) if inject else []            # 11 bad codecs
    v5_range = list(range(400, 409)) if inject else []            # 9 sr/dur range
    v6_null = list(range(500, 507)) if inject else []             # 7 nulls
    v7_corrupt = list(range(600, 605)) if inject else []          # 5 truncated payloads
    drift_part = f"2025-01-{n_parts:02d}" if inject else ""

    if inject:
        # V5: 5 rows bad sample rate, 4 rows bad duration
        for j, i in enumerate(v5_range):
            if j < 5:
                sr[i] = 11025
            else:
                dur[i] = 0 if j % 2 else 40000
        # V4: out-of-domain codec strings
        for j, i in enumerate(v4_codec):
            codec[i] = BAD_CODECS[j % 2]
        # V8: shift the last partition's duration distribution ×2 (clipped to
        # stay inside the legal range so drift is the ONLY constraint firing)
        drift_mask = part == drift_part
        keep = np.ones(n_rows, dtype=bool)
        keep[v5_range] = False
        dur = np.where(drift_mask & keep, np.minimum(dur * 2, DUR_MAX_MS), dur)
        manifest.drift_part = drift_part

    # -- transcripts + payload bytes + reference decode, sharded -------------
    # contiguous row ranges → worker processes; reassembled in order
    n_workers = workers
    if n_workers is None:
        n_workers = min(os.cpu_count() or 1, 16) if n_rows >= _PARALLEL_THRESHOLD else 1
    if n_workers > 1:
        # spawn re-imports __main__; a file-less main (REPL, `python -`
        # heredoc) deadlocks the children — fall back to serial there
        import sys as _sys

        _main = _sys.modules.get("__main__")
        if getattr(_main, "__file__", None) is None:
            n_workers = 1
    shard_bounds = [
        (n_rows * w // n_workers, n_rows * (w + 1) // n_workers)
        for w in range(n_workers)
    ]
    shard_args = [
        (idx[a:b], dur[a:b], sr[a:b], codec[a:b], payload_cap_ms)
        for a, b in shard_bounds
        if b > a
    ]
    if len(shard_args) <= 1:
        shard_results = [_payload_shard(shard_args[0])] if shard_args else []
    else:
        import multiprocessing as _mp

        with _mp.get_context("spawn").Pool(len(shard_args)) as pool:
            shard_results = pool.map(_payload_shard, shard_args)
    transcripts: list[str | None] = []
    blobs: list[bytes | None] = []
    ref_sha: list[str] = []
    ref_rms: list[float] = []
    for t_s, b_s, sha_s, rms_s in shard_results:
        transcripts.extend(t_s)
        blobs.extend(b_s)
        ref_sha.extend(sha_s)
        ref_rms.extend(rms_s)
    ref_rows = [
        (f"clip-{int(i):010d}", ref_sha[i], ref_rms[i], transcripts[i]) for i in idx
    ]

    if inject:
        for i in v6_null[:4]:
            transcripts[i] = None
        for i in v6_null[4:]:
            blobs[i] = None
        for i in v7_corrupt:
            b = blobs[i]
            blobs[i] = b[: max(2, (len(b) * 3 // 5) & ~1)]  # truncate, keep even length

    clip_ids = [f"clip-{int(i):010d}" for i in idx]

    rows = {
        "clip_id": list(clip_ids),
        "bytes": list(blobs),
        "sr_hz": [int(v) for v in sr],
        "dur_ms": [int(v) for v in dur],
        "codec": [str(c) for c in codec],
        "transcript": list(transcripts),
        "part_date": list(part),
    }

    if inject:
        # V1: re-emit 25 earlier rows under the same clip_id with NEW bytes —
        # same synth index (so payload checks still pass) but a different codec
        # container, landing in spread-out partitions.
        for i in v1_dup_src:
            new_codec = "flac" if str(codec[i]) != "flac" else "mp3"
            n_samples = int(min(int(dur[i]), payload_cap_ms) * int(sr[i]) // 1000)
            raw = pcm.synth_pcm16(int(i), int(sr[i]), n_samples)
            rows["clip_id"].append(clip_ids[i])
            rows["bytes"].append(pcm.encode(raw, new_codec))
            rows["sr_hz"].append(int(sr[i]))
            rows["dur_ms"].append(int(dur[i]))
            rows["codec"].append(new_codec)
            rows["transcript"].append(transcripts[i])
            rows["part_date"].append(_part_date(i + 7_777, n_parts))
            manifest.uniqueness_clip_ids.append(clip_ids[i])

    clips_schema = pa.schema(
        [
            ("clip_id", pa.string()),
            ("bytes", pa.binary()),
            ("sr_hz", pa.int32()),
            ("dur_ms", pa.int32()),
            ("codec", pa.string()),
            ("transcript", pa.string()),
            ("part_date", pa.string()),
        ]
    )
    clips_tbl = pa.table(rows, schema=clips_schema)
    _write_partitioned(
        clips_tbl, os.path.join(out_dir, "clips"), "part_date", files_per_part
    )

    # -- transcript_map (T2) -------------------------------------------------
    m_tid, m_cid, m_txt, m_src, m_rix = [], [], [], [], []
    for i in idx:
        m_tid.append(f"tr-{int(i):010d}")
        m_cid.append(clip_ids[i])
        # map keeps the ORIGINAL transcript (pre-null), so V6 nulls are caught
        # by nullness only, not by the equality check (disjoint sets)
        m_txt.append(ref_rows[i][3])
        m_src.append(f"batch-{int(i) % 20:03d}.tsv")
        m_rix.append(int(i) // 20)
    if inject:
        for j, i in enumerate(v3_mismatch):
            m_txt[i] = (m_txt[i] or "") + " zz-mismatch"
            manifest.mismatch_transcript_ids.append(m_tid[i])
        for j in v2_dangling:
            tid = f"tr-dangling-{j:04d}"
            m_tid.append(tid)
            m_cid.append(f"clip-9{j:09d}")
            m_txt.append(_transcript(j + 31_337, 2000))
            m_src.append(f"batch-{j % 20:03d}.tsv")
            m_rix.append(500 + j)
            manifest.dangling_transcript_ids.append(tid)

    map_tbl = pa.table(
        {
            "transcript_id": m_tid,
            "clip_id": m_cid,
            "transcript": m_txt,
            "source_file": m_src,
            "row_index": m_rix,
        },
        schema=pa.schema(
            [
                ("transcript_id", pa.string()),
                ("clip_id", pa.string()),
                ("transcript", pa.string()),
                ("source_file", pa.string()),
                ("row_index", pa.int64()),
            ]
        ),
    )
    pq.write_table(map_tbl, os.path.join(out_dir, "transcript_map.parquet"))

    # -- codec_domain (T3) ---------------------------------------------------
    dom_tbl = pa.table(
        {
            "codec": list(pcm.CODEC_DOMAIN),
            "lossy": [False, False, True, True],
        }
    )
    pq.write_table(dom_tbl, os.path.join(out_dir, "codec_domain.parquet"))

    # -- reference_decode (T4) ----------------------------------------------
    ref_tbl = pa.table(
        {
            "clip_id": [r[0] for r in ref_rows],
            "pcm_sha256": [r[1] for r in ref_rows],
            "rms": [r[2] for r in ref_rows],
            "transcript": [r[3] for r in ref_rows],
        }
    )
    pq.write_table(ref_tbl, os.path.join(out_dir, "reference_decode.parquet"))

    # -- manifest golden keys ------------------------------------------------
    if inject:
        manifest.codec_domain_clip_ids = [clip_ids[i] for i in v4_codec]
        manifest.range_clip_ids = [clip_ids[i] for i in v5_range]
        manifest.nullness_clip_ids = [clip_ids[i] for i in v6_null]
        manifest.payload_clip_ids = [clip_ids[i] for i in v7_corrupt]

    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        f.write(manifest.to_json())
    return manifest


def _write_partitioned(
    tbl: pa.Table, path: str, part_col: str, files_per_part: int = 1
) -> None:
    """Hive-partitioned parquet dataset (deterministic file naming).

    ``files_per_part > 1`` splits each partition into several files so scan
    parallelism isn't capped by partition count (a 1000-executor cluster
    wants thousands of splits; local[32] wants >= 32)."""
    os.makedirs(path, exist_ok=True)
    parts = tbl.column(part_col).to_pylist()
    order = sorted(set(parts))
    import pyarrow.compute as pc

    for p in order:
        sub = tbl.filter(pc.equal(tbl[part_col], p)).drop_columns([part_col])
        d = os.path.join(path, f"{part_col}={p}")
        os.makedirs(d, exist_ok=True)
        n = max(1, files_per_part)
        chunk = (sub.num_rows + n - 1) // max(n, 1) or 1
        for j in range(n):
            piece = sub.slice(j * chunk, chunk)
            if piece.num_rows == 0 and j > 0:
                break
            # small row groups keep parquet files splittable: Spark's scan
            # parallelism is bounded by row-group count, not file count
            pq.write_table(
                piece, os.path.join(d, f"part-{j:05d}.parquet"), row_group_size=8192
            )
