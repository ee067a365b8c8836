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
- the sha comparison is a join against ``reference_decode`` on clip_id
  (sort-merge at fact×fact scale; AQE decides).

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

_DECODE_SCHEMA = (
    "clip_id string, part string, decode_ok boolean, n_frames long, "
    "expected_frames long, snr_db double, pcm_sha256 string, reason string"
)


def _decode_batch(pdf: pd.DataFrame, payload_cap_ms: int | None) -> pd.DataFrame:
    out = {
        "clip_id": [], "part": [], "decode_ok": [], "n_frames": [],
        "expected_frames": [], "snr_db": [], "pcm_sha256": [], "reason": [],
    }
    for cid, blob, sr, dur, codec, part in zip(
        pdf["clip_id"], pdf["bytes"], pdf["sr_hz"], pdf["dur_ms"], pdf["codec"], pdf["part"]
    ):
        # disjointness: null bytes → RequiredConstraint; bad codec → Domain;
        # non-positive duration → Range. Skip here.
        if blob is None or codec not in pcm.CODEC_DOMAIN or dur is None or dur <= 0:
            continue
        eff_ms = int(dur) if payload_cap_ms is None else min(int(dur), payload_cap_ms)
        expected_frames = eff_ms * int(sr) // 1000
        out["clip_id"].append(cid)
        out["part"].append(part)
        out["expected_frames"].append(expected_frames)
        try:
            decoded = pcm.decode(bytes(blob), str(codec))
        except ValueError as e:
            out["decode_ok"].append(False)
            out["n_frames"].append(0)
            out["snr_db"].append(float("-inf"))
            out["pcm_sha256"].append("")
            out["reason"].append(f"decode error: {e}")
            continue
        # deterministic reference signal (the "reference decoder" oracle);
        # clip index is encoded in the id suffix
        try:
            index = int(str(cid).rsplit("-", 1)[-1])
        except ValueError:
            index = 0
        ref = pcm.synth_pcm16(index, int(sr), expected_frames)
        snr = pcm.snr_db(ref, decoded)
        out["decode_ok"].append(True)
        out["n_frames"].append(int(decoded.size))
        out["snr_db"].append(snr if np.isfinite(snr) else (1e9 if snr > 0 else -1e9))
        out["pcm_sha256"].append(hashlib.sha256(decoded.tobytes()).hexdigest())
        out["reason"].append("")
    return pd.DataFrame(out)


class AudioPayloadConstraint(Constraint):
    """decoded-PCM allclose (SNR>=30dB) OR sha-exact vs reference_decode."""

    partition_grain = False

    def __init__(
        self,
        table: str = "clips",
        reference_table: str = "reference_decode",
        snr_threshold_db: float = 30.0,
    ):
        self.table = table
        self.reference_table = reference_table
        self.snr_threshold_db = snr_threshold_db
        self.name = f"payload:{table}.bytes"

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

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield _decode_batch(pdf, cap)

        decoded = slim.mapInPandas(run, schema=_DECODE_SCHEMA)

        ref = tables[self.reference_table].select(
            "clip_id", F.col("pcm_sha256").alias("_ref_sha")
        )
        joined = decoded.join(ref, on="clip_id", how="left")
        ok = (F.col("snr_db") >= self.snr_threshold_db) | (
            F.col("_ref_sha").isNotNull() & (F.col("pcm_sha256") == F.col("_ref_sha"))
        )
        bad = joined.filter(~ok)
        return make_violations(
            bad,
            constraint=self.name,
            table=self.table,
            key="clip_id",
            column="bytes",
            observed=F.concat_ws(
                ";",
                F.concat(F.lit("snr_db="), F.round(F.col("snr_db"), 2).cast("string")),
                F.concat(F.lit("frames="), F.col("n_frames").cast("string")),
                F.col("reason"),
            ),
            expected=f"snr>={self.snr_threshold_db}dB or sha match",
            part="part",
        )
