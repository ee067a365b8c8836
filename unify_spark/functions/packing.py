"""Token-budget sequence packing — the concat-and-chunk step of LLM
pretraining data prep.

Semantics (the standard one): order documents deterministically (by id),
concatenate their token streams, and cut every ``budget`` tokens. Each
document is tagged with the chunk where it STARTS (``chunk_id``) and its
token offset inside that chunk (``chunk_offset``); a document may straddle
a boundary (straddle handling — split vs drop vs pad — is the tokenizer
stage's business, this operator supplies the placement). Everything reduces
to a global exclusive prefix sum of per-document token counts:

    tok_before(d) = sum of n_tokens over all ids < d
    chunk_id      = tok_before / budget        (integer division)
    chunk_offset  = tok_before % budget

Scale design: a naive ``Window.orderBy(id)`` with no partition key funnels
the whole table through ONE task — the classic global-window trap. The
distributed prefix sum here is the textbook two-phase scan:

1. range-repartition + sort by id (one shuffle of slim (id, n_tokens)
   rows — at 10^9 docs that's GBs, not the corpus; the text never moves),
   pin the partitioning with ``persist`` so both phases see identical
   partition ids (AQE cannot re-coalesce a materialized exchange);
2. per-partition token totals (P rows) → driver-side exclusive prefix
   offsets (P integers — metadata, not data) shipped back in the task
   closure;
3. one vectorized Arrow pass (mapInPandas, numpy cumsum) adds
   local-exclusive-cumsum + partition offset. Intra-partition row order is
   preserved through mapInPandas, so the sortWithinPartitions order holds.

The result is identical to the single-window form (pytest pins that) and to
a plain SQL window (DuckDB oracle), but every stage is partition-parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from unify_spark.functions import text as text_fn


def pack_chunks(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    num_shards: int | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """(id, n_tokens, tok_before, chunk_id, chunk_offset) for every row of
    ``df``, global order by ``id_col`` — or by ``(order_col, id_col)`` when
    ``order_col`` is given (the padding-minimization trick: ordering the
    stream by document length packs similar-length docs into the same
    chunks, so straddle splits waste less; ties stay deterministic via the
    id). ``num_shards`` defaults to the session's shuffle partitions. Null
    token counts count as 0 (the row still occupies a slot in the order).

    Contract: ``id_col`` must be unique — ties would make the order among
    tied rows (and therefore their tok_before) partitioning-dependent, the
    same way a SQL window ordered on a non-unique key is nondeterministic.
    The uniqueness constraint is the upstream check for this."""
    spark = df.sparkSession
    p = num_shards or int(spark.conf.get("spark.sql.shuffle.partitions"))

    cols = [
        F.col(id_col).alias("_pack_id"),
        F.coalesce(F.col(tokens_col).cast("long"), F.lit(0)).alias("n_tokens"),
    ]
    sort_keys = ["_pack_id"]
    if order_col is not None:
        cols.append(F.col(order_col).alias("_pack_ord"))
        sort_keys = ["_pack_ord", "_pack_id"]
    slim = df.select(*cols)
    sharded = (
        slim.repartitionByRange(p, *sort_keys)
        .sortWithinPartitions(*sort_keys)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    totals = {
        r["_pid"]: r["t"]
        for r in sharded.groupBy("_pid").agg(F.sum("n_tokens").alias("t")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]

    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"_pack_id {id_type}, n_tokens long, tok_before long, "
        "chunk_id long, chunk_offset long"
    )
    b = int(budget)

    def add_prefix(batches):
        import numpy as np

        run = None  # partition-local running total across Arrow batches
        for pdf in batches:
            if not len(pdf):
                continue
            if run is None:
                run = int(offsets.get(int(pdf["_pid"].iloc[0]), 0))
            n = pdf["n_tokens"].to_numpy(dtype="int64")
            before = run + np.concatenate(([0], np.cumsum(n)[:-1]))
            run = int(before[-1] + n[-1])
            yield pdf.assign(
                tok_before=before,
                chunk_id=before // b,
                chunk_offset=before % b,
            ).drop(columns=[c for c in ("_pid", "_pack_ord") if c in pdf.columns])

    out = sharded.mapInPandas(add_prefix, out_schema)
    # the persisted slim frame is what keeps the two phases' partition ids
    # consistent; it is tiny relative to the corpus and left to LRU eviction
    # (an eager unpersist here would invalidate the lazy mapInPandas plan)
    return out.withColumnRenamed("_pack_id", id_col)


def pack_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget: int,
    num_shards: int | None = None,
) -> DataFrame:
    """Convenience: whitespace-token counts then ``pack_chunks``."""
    with_counts = df.withColumn("_n_tok", text_fn.token_count(text_col))
    return pack_chunks(with_counts, id_col, "_n_tok", budget, num_shards)


def pack_spans(
    packed: DataFrame,
    id_col: str,
    budget: int,
) -> DataFrame:
    """Straddle splits for a ``pack_chunks`` result: one row per (document,
    chunk) the document's token stream touches — what a training-sequence
    builder actually consumes. ``slice_start`` is the token offset INSIDE
    the document where the chunk's share begins; ``slice_len`` its length;
    together the spans of a document partition [0, n_tokens) and the spans
    of a chunk sum to ``budget`` (except the final chunk).

    Pure expressions: explode over the chunk range
    [tok_before // budget, (tok_before + n_tokens - 1) // budget] — no
    shuffle at all (the input's partitioning is preserved); a document
    spanning many chunks fans out to exactly its span count. Integer
    division uses the exact (x - x % b) / b form (see pack_chunks_grouped).
    Zero-token documents occupy no span."""
    b = int(budget)

    def _div(x):
        return ((x - x % b) / b).cast("long")

    first = F.col("tok_before")
    n = F.col("n_tokens")
    chunk_start = F.col("chunk_id") * b
    lo = F.greatest(chunk_start, first)
    hi = F.least(chunk_start + b, first + n)
    return (
        packed.filter(n > 0)
        .withColumn("_c0", _div(first))
        .withColumn("_c1", _div(first + n - 1))
        .withColumn("chunk_id", F.explode(F.sequence(F.col("_c0"), F.col("_c1"))))
        .select(
            F.col(id_col),
            F.col("chunk_id"),
            (lo - first).alias("slice_start"),
            (hi - lo).alias("slice_len"),
        )
    )


def pack_chunks_grouped(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    group_col: str,
    big_groups: list | None = None,
) -> DataFrame:
    """Per-group concat-and-chunk: an independent chunk stream per
    ``group_col`` value (domain/language/source — pretraining mixes often
    pack within domains so a sequence never straddles two of them).
    Output adds the group column; (chunk ids restart at 0 per group).

    Scale shape: unlike the GLOBAL prefix sum (which needs the two-phase
    scan in ``pack_chunks``), the grouped form is a plain
    ``Window.partitionBy(group).orderBy(id)`` — one hash shuffle on the
    group key, each group's cumsum runs inside its partition. Skew escape:
    a group's whole slim (id, n_tokens) stream lands in ONE window task, so
    for dominant groups (the 40%-English corpus at 10^10 docs) list them in
    ``big_groups``: each runs through the partition-parallel two-phase
    ``pack_chunks`` scan instead (identical numbers — the global form
    restricted to one group IS the grouped form), and only the long tail of
    small groups takes the window path. Null token counts count as 0;
    ``id_col`` must be unique within a group (same tie contract as
    pack_chunks)."""
    from pyspark.sql import Window

    n = F.coalesce(F.col(tokens_col).cast("long"), F.lit(0))

    big = list(big_groups or [])
    if big:
        # NULL-safe tail filter: ~isin(big) evaluates to NULL (→ dropped)
        # for NULL group values, but the window path treats NULL as its own
        # group — keep those rows on the window path explicitly
        tail = df.where(~F.col(group_col).isin(big) | F.col(group_col).isNull())
        rest = pack_chunks_grouped(tail, id_col, tokens_col, budget, group_col)
        parts = [rest]
        for g in big:
            one = pack_chunks(
                df.where(F.col(group_col) == F.lit(g)), id_col, tokens_col, budget
            ).withColumn(group_col, F.lit(g))
            parts.append(one.select(*rest.columns))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(n).over(w), F.lit(0))
    return df.select(
        F.col(id_col),
        F.col(group_col),
        n.alias("n_tokens"),
        before.alias("tok_before"),
        # exact integer division: (before - before % budget) is an exact
        # multiple of budget, so the double quotient is exact too — a bare
        # (before / budget) double can round UP at a chunk boundary once
        # per-group cumulative counts get large, diverging from the numpy
        # `//` in pack_chunks
        ((before - before % budget) / budget).cast("long").alias("chunk_id"),
        (before % budget).alias("chunk_offset"),
    )
