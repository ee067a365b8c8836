"""Audio payload constraint: vectorized decode + SNR/sha verdicts.

Implements the BASELINE.json input_hint per-row invariant: decoded PCM must
match the reference decode — ``allclose`` with SNR >= 30 dB against the
deterministic reference signal, OR byte-exact sha256 equality with the
``reference_decode`` oracle table. A row passes if EITHER holds (lossy codecs
pass via SNR; lossless via sha; corrupted payloads fail both).

Execution shape (the part that must survive 100 TB):
- one ``mapInPandas`` pass over the clips table — Arrow batches, numpy-
  vectorized per batch, no per-row Python API calls into Spark;
- the pass emits a TINY projection (clip_id, sha, snr, frames) — audio bytes
  never shuffle;
- only rows that can violate (SNR failures, null payloads) leave the pass;
  the sha comparison joins THAT filtered set against ``reference_decode``
  (AQE broadcasts the small failing side), never fact-by-fact.

Reference parity: this is the Spark restatement of unify's per-record spec
gate (src/com/vendekagonlabs/unify/validation/record.clj:22-33) for the
binary column, with decode errors mapped to violations instead of thrown
anomalies (engine.clj:166-181 kills the whole file; we fail-at-end).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from unify_spark.audio import pcm
from unify_spark.operators.base import Constraint, ValidationContext, make_violations

SNR_STRIDE = 4  # 1-in-4 frame stride for SNR estimation (see _decode_batch)

_DECODE_SCHEMA = (
    "clip_id string, part string, decode_ok boolean, n_frames long, "
    "expected_frames long, snr_db double, pcm_sha256 string, reason string, "
    "is_null_bytes boolean"
)


def _parse_index(cid: str) -> int:
    try:
        return int(str(cid).rsplit("-", 1)[-1])
    except ValueError:
        return 0


def _decode_batch(
    pdf: pd.DataFrame, payload_cap_ms: int | None, snr_threshold_db: float = 30.0
) -> pd.DataFrame:
    """Vectorized per-batch decode: rows are grouped by (codec, byte length,
    sr, expected frames) — within a group decode, reference synthesis, and
    SNR are single 2-D numpy operations. Python-per-row work is only the
    grouping keys and sha256 (C speed). Bit-identical to the scalar path
    (pinned by the batch-equivalence tests in tests/test_audio_codecs.py)."""
    # disjointness: bad codec -> Domain; non-positive duration -> Range —
    # skip those rows. Null bytes are REPORTED (is_null_bytes) rather than
    # checked here, so the required-bytes constraint shares this scan instead
    # of re-reading the payload column (at 100 TB that is the whole game).
    null_bytes = pdf[pdf["bytes"].isna()]
    decodable = (
        pdf["bytes"].notna()
        # DECODABLE_CODECS, not the fixture CODEC_DOMAIN: a corpus whose
        # domain table legitimately includes alaw still gets its payloads
        # SNR-checked; truly unknown codecs stay Domain's to flag
        & pdf["codec"].isin(pcm.DECODABLE_CODECS)
        & pdf["dur_ms"].notna()
        & (pdf["dur_ms"] > 0)
    )
    # null sr_hz would NaN→INT64_MIN silently under to_numpy(dtype=int64);
    # surface those rows as explicit violations instead of garbage frames
    null_sr = pdf[decodable & pdf["sr_hz"].isna()]
    sub = pdf[decodable & pdf["sr_hz"].notna()]
    m = len(sub)
    cids = sub["clip_id"].to_numpy()
    parts = sub["part"].to_numpy()
    idx = np.array([_parse_index(c) for c in cids], dtype=np.int64)
    sr = sub["sr_hz"].to_numpy(dtype=np.int64)
    dur = sub["dur_ms"].to_numpy(dtype=np.int64)
    eff = dur if payload_cap_ms is None else np.minimum(dur, payload_cap_ms)
    expected = eff * sr // 1000
    blobs = sub["bytes"].tolist()
    blen = np.array([len(b) for b in blobs], dtype=np.int64)
    codecs = sub["codec"].to_numpy()

    decode_ok = np.zeros(m, dtype=bool)
    n_frames = np.zeros(m, dtype=np.int64)
    snr = np.full(m, -1e9, dtype=np.float64)
    shas = np.full(m, "", dtype=object)
    reasons = np.full(m, "", dtype=object)

    groups = pd.DataFrame(
        {"codec": codecs, "blen": blen, "sr": sr, "exp": expected}
    ).groupby(["codec", "blen", "sr", "exp"], sort=False).indices
    CHUNK = 1024  # bound per-worker float64 temporaries (see synth_pcm16_batch)
    for (codec, bl, sr_v, exp_v), g in groups.items():
        for s0 in range(0, len(g), CHUNK):
            gc = g[s0 : s0 + CHUNK]
            g_blobs = [bytes(blobs[i]) for i in gc]
            try:
                dec = pcm.decode_batch(g_blobs, str(codec))
            except ValueError as e:
                reasons[gc] = f"decode error: {e}"
                continue
            decode_ok[gc] = True
            n_frames[gc] = dec.shape[1]
            if dec.shape[1] == exp_v and exp_v > 0:
                # SNR estimated on a deterministic 1-in-SNR_STRIDE frame
                # stride (exact decimation of the reference stream): 4x less
                # synth CPU + memory traffic; verdict-preserving because the
                # codec SNR margins are >7 dB above threshold and length
                # mismatches (truncation) are caught exactly above
                ref = pcm.synth_pcm16_strided_batch(
                    idx[gc], int(sr_v), int(exp_v), SNR_STRIDE
                )
                s = pcm.snr_db_batch(ref, dec[:, ::SNR_STRIDE])
                snr[gc] = np.clip(np.nan_to_num(s, posinf=1e9, neginf=-1e9), -1e9, 1e9)
            # length mismatch (truncation) keeps snr at -1e9 -> violation.
            # sha256 is the RESCUE check for snr failures only (lossy codecs
            # pass via snr; lossless via snr=inf), so hash just those rows.
            failing = [k for k, gi in enumerate(gc) if snr[gi] < snr_threshold_db]
            for k in failing:
                shas[gc[k]] = hashlib.sha256(dec[k].tobytes()).hexdigest()

    out = pd.DataFrame(
        {
            "clip_id": cids,
            "part": parts,
            "decode_ok": decode_ok,
            "n_frames": n_frames,
            "expected_frames": expected,
            "snr_db": snr,
            "pcm_sha256": shas.astype(str),
            "reason": reasons.astype(str),
            "is_null_bytes": np.zeros(m, dtype=bool),
        }
    )
    extras = []
    if len(null_bytes):
        extras.append(
            pd.DataFrame(
                {
                    "clip_id": null_bytes["clip_id"].to_numpy(),
                    "part": null_bytes["part"].to_numpy(),
                    "decode_ok": False,
                    "n_frames": 0,
                    "expected_frames": 0,
                    "snr_db": 0.0,
                    "pcm_sha256": "",
                    "reason": "null bytes",
                    "is_null_bytes": True,
                }
            )
        )
    if len(null_sr):
        extras.append(
            pd.DataFrame(
                {
                    "clip_id": null_sr["clip_id"].to_numpy(),
                    "part": null_sr["part"].to_numpy(),
                    "decode_ok": False,
                    "n_frames": 0,
                    "expected_frames": 0,
                    "snr_db": -1e9,  # below any threshold -> violation; empty
                    "pcm_sha256": "",  # sha cannot rescue a null sample rate
                    "reason": "null sr_hz",
                    "is_null_bytes": False,
                }
            )
        )
    if extras:
        out = pd.concat([out, *extras], ignore_index=True)
    return out


class AudioPayloadConstraint(Constraint):
    """decoded-PCM allclose (SNR>=30dB) OR sha-exact vs reference_decode."""

    partition_grain = False
    # per-row decode: a partition's verdict never depends on other partitions,
    # so the runner may resume at (constraint, partition) grain
    partition_local = True

    def __init__(
        self,
        table: str = "clips",
        reference_table: str = "reference_decode",
        snr_threshold_db: float = 30.0,
        null_bytes_constraint: str | None = None,
        sample_rate: float | None = None,
        sample_salt: str = "",
    ):
        self.table = table
        self.reference_table = reference_table
        self.snr_threshold_db = snr_threshold_db
        # when set, null-payload rows are emitted under this constraint name
        # from THIS scan (so a RequiredConstraint need not re-read the bytes
        # column); see emits
        self.null_bytes_constraint = null_bytes_constraint
        # sampled mode: decode only a deterministic hash-sample of the rows
        # (the decode dominates suite cost at 10^12 rows; the per-row check
        # is iid across clips, so a sample bounds the corpus violation rate).
        # The keep set is keyed by md5(clip_id||salt) — stable across runs,
        # partitionings, and cluster sizes, so re-runs re-decode the SAME
        # clips and the evidence rows stay comparable. NULL-keyed rows are
        # always kept (never silently skip an unaddressable row).
        # `sampling_estimates` extrapolates sampled violation counts to the
        # full table with a Wilson interval.
        if sample_rate is not None and not (0.0 < sample_rate <= 1.0):
            raise ValueError(f"sample_rate must be in (0, 1], got {sample_rate}")
        self.sample_rate = sample_rate
        self.sample_salt = sample_salt
        self.name = f"payload:{table}.bytes"
        # the per-row verdict compares against the reference table's rows:
        # incremental seeding is sound only while that table is unchanged
        self.aux_tables = [reference_table]

    @property
    def is_sampled(self) -> bool:
        return self.sample_rate is not None and self.sample_rate < 1.0

    def _keep(self):
        from unify_spark.functions.sampling import hash_keep

        return F.coalesce(
            hash_keep(F.col("clip_id").cast("string"), self.sample_rate, self.sample_salt),
            F.lit(True),  # NULL clip_id: keep — never sample away an unaddressable row
        )

    @property
    def emits(self) -> list[str]:
        names = [self.name]
        if self.null_bytes_constraint:
            names.append(self.null_bytes_constraint)
        return names

    def violations(self, tables: dict[str, DataFrame], ctx: ValidationContext) -> DataFrame:
        df = tables[self.table]
        part_col = ctx.part_col if ctx.part_col in df.columns else None
        cap = ctx.payload_cap_ms
        slim = df.select(
            "clip_id",
            "bytes",
            "sr_hz",
            "dur_ms",
            "codec",
            (F.col(part_col) if part_col else F.lit(None).cast("string")).alias("part"),
        )
        if self.is_sampled:
            # pure Column predicate BEFORE the decode: pushes toward the scan,
            # so non-sampled rows never cross the Arrow boundary
            slim = slim.where(self._keep())

        thr = self.snr_threshold_db

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield _decode_batch(pdf, cap, thr)

        decoded = slim.mapInPandas(run, schema=_DECODE_SCHEMA)

        # only rows that can possibly violate leave the decode pass: snr
        # failures (need the sha rescue check) and null payloads. ONE branch
        # over the mapInPandas output — a second branch would recompute the
        # entire decode since the pass output is deliberately uncached.
        emit_nulls = F.lit(self.null_bytes_constraint is not None)
        candidates = decoded.filter(
            (F.col("is_null_bytes") & emit_nulls)
            | (~F.col("is_null_bytes") & (F.col("snr_db") < thr))
        )
        ref = tables[self.reference_table].select(
            "clip_id", F.col("pcm_sha256").alias("_ref_sha")
        )
        joined = candidates.join(ref, on="clip_id", how="left")
        bad = joined.filter(
            F.col("is_null_bytes")
            | F.col("_ref_sha").isNull()
            | (F.col("pcm_sha256") != F.col("_ref_sha"))
        )
        null_name = self.null_bytes_constraint or self.name
        return bad.select(
            F.when(F.col("is_null_bytes"), F.lit(null_name))
            .otherwise(F.lit(self.name))
            .alias("constraint"),
            F.lit(self.table).alias("table"),
            F.col("clip_id").cast("string").alias("key"),
            F.lit("bytes").alias("column"),
            F.when(F.col("is_null_bytes"), F.lit("null"))
            .otherwise(
                F.concat_ws(
                    ";",
                    F.concat(
                        F.lit("snr_db="), F.round(F.col("snr_db"), 2).cast("string")
                    ),
                    F.concat(F.lit("frames="), F.col("n_frames").cast("string")),
                    F.col("reason"),
                )
            )
            .alias("observed"),
            F.when(F.col("is_null_bytes"), F.lit("non-null"))
            .otherwise(F.lit(f"snr>={self.snr_threshold_db}dB or sha match"))
            .alias("expected"),
            F.col("part").cast("string").alias("part"),
            F.lit(None).cast("string").alias("source_file"),
            F.lit(None).cast("long").alias("row_index"),
        )
