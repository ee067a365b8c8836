"""Deterministic sampling + token-budget packing + text additions.

The sampling family's load-bearing properties: determinism (same ids →
same sample under any partitioning), rate accuracy, salt decorrelation,
and threshold nesting (a 10% sample is a subset of the 30% sample — the
property that makes hash sampling safe for progressive scale-up).
Packing's load-bearing property: the distributed two-phase prefix sum is
bit-identical to the naive single-window form.
"""

import pytest
from pyspark.sql import Window, functions as F

from unify_spark.functions import packing, sampling, text


# ---------------------------------------------------------------------------
# hash sampling
# ---------------------------------------------------------------------------


def _ids(spark, n, parts=8):
    return spark.range(n).repartition(parts).withColumnRenamed("id", "doc_id")


def test_sample_hash_rate_and_determinism(spark):
    df = _ids(spark, 20000)
    kept1 = {r["doc_id"] for r in sampling.sample_hash(df, "doc_id", 0.1).collect()}
    assert abs(len(kept1) / 20000 - 0.1) < 0.02
    # repartitioning must not change membership (partition-independence)
    kept2 = {
        r["doc_id"]
        for r in sampling.sample_hash(_ids(spark, 20000, parts=3), "doc_id", 0.1).collect()
    }
    assert kept1 == kept2


def test_sample_hash_nesting(spark):
    """Lower-rate samples are strict subsets of higher-rate samples (same
    salt): thresholds nest, so scaling a pipeline from 1% to 10% only ADDS
    documents — no churn in the already-processed set."""
    df = _ids(spark, 10000)
    s10 = {r["doc_id"] for r in sampling.sample_hash(df, "doc_id", 0.1).collect()}
    s30 = {r["doc_id"] for r in sampling.sample_hash(df, "doc_id", 0.3).collect()}
    assert s10 < s30


def test_sample_hash_salt_decorrelates(spark):
    df = _ids(spark, 20000)
    a = {r["doc_id"] for r in sampling.sample_hash(df, "doc_id", 0.5, salt="a").collect()}
    b = {r["doc_id"] for r in sampling.sample_hash(df, "doc_id", 0.5, salt="b").collect()}
    # independent halves overlap on ~25%, not ~50%
    assert abs(len(a & b) / 20000 - 0.25) < 0.03


def test_sample_hash_edge_rates(spark):
    df = _ids(spark, 100)
    assert sampling.sample_hash(df, "doc_id", 1.0).count() == 100
    assert sampling.sample_hash(df, "doc_id", 0.0).count() == 0
    with pytest.raises(ValueError):
        sampling.hash_threshold(1.5)


def test_stratified_sample(spark):
    rows = [(i, "a" if i % 2 else "b") for i in range(10000)]
    df = spark.createDataFrame(rows, ["id", "stratum"])
    out = sampling.stratified_sample(
        df, "id", "stratum", {"a": 1.0, "b": 0.1}, default_rate=0.0
    )
    by = {r["stratum"]: r["n"] for r in out.groupBy("stratum").agg(F.count("*").alias("n")).collect()}
    assert by["a"] == 5000
    assert abs(by.get("b", 0) / 5000 - 0.1) < 0.03
    # unlisted strata fall to default_rate
    df2 = spark.createDataFrame([(i, "c") for i in range(100)], ["id", "stratum"])
    assert sampling.stratified_sample(df2, "id", "stratum", {"a": 1.0}).count() == 0


def test_split_columns_disjoint_exhaustive(spark):
    df = _ids(spark, 10000)
    out = df.select(
        "doc_id",
        sampling.split_columns("doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}).alias("split"),
    )
    by = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(by) == {"train", "val", "test"}  # no null bucket at these rates
    assert sum(by.values()) == 10000
    assert abs(by["train"] / 10000 - 0.8) < 0.02
    # determinism: a row's split is a pure function of its id
    out2 = df.repartition(3).select(
        "doc_id",
        sampling.split_columns("doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}).alias("split"),
    )
    assert out.exceptAll(out2).count() == 0
    with pytest.raises(ValueError):
        sampling.split_columns("doc_id", {"a": 0.9, "b": 0.2})


def test_take_per_stratum_two_phase_giant_stratum(spark):
    """The giant-stratum escape: with strata_counts supplied, a dominant
    stratum is pre-thinned by the hash_keep predicate BEFORE the window
    shuffle. Because hash_keep keeps a strict PREFIX of the very md5 order
    the window ranks by, the two-phase result is EXACTLY the single-phase
    result — asserted here against the unthinned run on a 10^6-row stratum
    — and the pre-filter must appear under the exchange in the plan."""
    big = spark.range(1_000_000).select(
        F.col("id").alias("event_id"), F.lit("web").alias("stratum")
    )
    small = spark.range(1_000_000, 1_000_300).select(
        F.col("id").alias("event_id"), F.lit("books").alias("stratum")
    )
    df = big.unionByName(small)

    two_phase = sampling.take_per_stratum(
        df, "event_id", "stratum", 100, strata_counts={"web": 1_000_000}
    )
    rows = two_phase.collect()
    by = {}
    for r in rows:
        by.setdefault(r["stratum"], set()).add(r["event_id"])
    assert len(by["web"]) == 100 and len(by["books"]) == 100  # exact quotas

    single = sampling.take_per_stratum(df, "event_id", "stratum", 100)
    assert {tuple(sorted(v)) for v in by.values()} == {
        tuple(sorted(v))
        for v in (
            lambda d: [
                {r["event_id"] for r in single.collect() if r["stratum"] == s}
                for s in d
            ]
        )(by)
    }

    # the md5-threshold pre-filter runs before the exchange (pushed toward
    # the scan), so the giant stratum ships ~3n rows, not 10^6
    plan = two_phase._jdf.queryExecution().executedPlan().toString()
    filter_pos = plan.find("md5")
    exchange_pos = plan.find("Exchange")
    assert filter_pos != -1 and exchange_pos != -1 and filter_pos > exchange_pos
    # (plans print top-down: the Filter appearing BELOW the Exchange line
    # means it executes before the shuffle)


def test_take_per_stratum_auto_counts(spark):
    """strata_counts="auto": the dominant stratum is discovered by a
    threshold-filtered count aggregate (no caller-supplied counts), the
    plan still shows the md5 pre-filter under the exchange, and the result
    is exactly the single-phase result."""
    big = spark.range(40_000).select(
        F.col("id").alias("event_id"), F.lit("web").alias("stratum")
    )
    small = spark.range(40_000, 40_200).select(
        F.col("id").alias("event_id"), F.lit("books").alias("stratum")
    )
    df = big.unionByName(small)

    auto = sampling.take_per_stratum(df, "event_id", "stratum", 10, strata_counts="auto")
    single = sampling.take_per_stratum(df, "event_id", "stratum", 10)
    key = lambda rs: sorted((r["stratum"], r["event_id"]) for r in rs)  # noqa: E731
    assert key(auto.collect()) == key(single.collect())

    plan = auto._jdf.queryExecution().executedPlan().toString()
    filter_pos, exchange_pos = plan.find("md5"), plan.find("Exchange")
    assert filter_pos != -1 and exchange_pos != -1 and filter_pos > exchange_pos


def test_take_per_stratum_two_phase_keeps_null_ids(spark):
    """A NULL id hashes to NULL, which the single-phase window ranks FIRST
    (nulls-first sort) — the pre-thin predicate must not drop it, or the
    two-phase form stops being exact."""
    rows = [(i, "big") for i in range(50_000)] + [(None, "big")]
    df = spark.createDataFrame(rows, "event_id long, stratum string")
    out = sampling.take_per_stratum(
        df, "event_id", "stratum", 10, strata_counts={"big": 50_000}
    )
    got = [r["event_id"] for r in out.collect()]
    assert len(got) == 10 and None in got  # null-hash row survives and ranks in


def test_pack_grouped_big_group_fallback(spark):
    """Routing a dominant group through the partition-parallel pack_chunks
    scan must give bit-identical placements to the single-window path —
    including NULL-group rows, which ~isin(big) alone would silently drop
    (NULL predicate → WHERE false) while the window path keeps them as
    their own stream."""
    rows = [(i, (i * 7) % 300, "en" if i % 4 else "fr") for i in range(4000)]
    rows += [(10_000 + i, 50, None) for i in range(20)]  # NULL-group docs
    df = spark.createDataFrame(rows, "doc_id long, n_tok long, lang string")
    plain = packing.pack_chunks_grouped(df, "doc_id", "n_tok", budget=256, group_col="lang")
    escaped = packing.pack_chunks_grouped(
        df, "doc_id", "n_tok", budget=256, group_col="lang", big_groups=["en"]
    )
    assert escaped.count() == len(rows)  # nothing vanishes
    assert plain.exceptAll(escaped).count() == 0
    assert escaped.exceptAll(plain).count() == 0


def test_split_columns_final_catchall():
    """When rates sum to 1 the last split must be a catch-all, not a clamped
    strict-< 'ffffffff' bound — otherwise rows whose 8-hex md5 prefix is
    exactly 'ffffffff' (~2^-32 of rows; real rows at 10^10 docs) fall
    through to a null split, breaking the disjoint-and-exhaustive contract."""
    expr = repr(sampling.split_columns("doc_id", {"a": 0.5, "b": 0.5})).lower()
    assert "ffffffff" not in expr and "true" in expr
    # rates summing to < 1 still leave the documented null tail
    expr2 = repr(sampling.split_columns("doc_id", {"a": 0.5})).lower()
    assert "true" not in expr2


# ---------------------------------------------------------------------------
# token-budget packing
# ---------------------------------------------------------------------------


def test_pack_chunks_matches_single_window(spark):
    """The distributed two-phase prefix sum must be bit-identical to the
    naive global-window form it replaces."""
    import random

    rng = random.Random(5)
    rows = [(i, rng.randrange(0, 400)) for i in range(3000)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tok"])

    got = packing.pack_chunks(df, "doc_id", "n_tok", budget=512, num_shards=7)

    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    want = df.select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tokens"),
        F.coalesce(F.sum("n_tok").over(w), F.lit(0)).alias("tok_before"),
    ).select(
        "doc_id",
        "n_tokens",
        "tok_before",
        (F.col("tok_before") / 512).cast("long").alias("chunk_id"),
        (F.col("tok_before") % 512).alias("chunk_offset"),
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_pack_chunks_shard_invariance(spark):
    rows = [(i, (i * 13) % 97) for i in range(1000)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tok"])
    a = packing.pack_chunks(df, "doc_id", "n_tok", budget=100, num_shards=1)
    b = packing.pack_chunks(df, "doc_id", "n_tok", budget=100, num_shards=16)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_pack_chunks_semantics(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (4, None), (5, 50)], ["doc_id", "n_tok"]
    )
    rows = {r["doc_id"]: r for r in packing.pack_chunks(df, "doc_id", "n_tok", budget=256).collect()}
    assert rows[1]["tok_before"] == 0 and rows[1]["chunk_id"] == 0
    assert rows[3]["tok_before"] == 200 and rows[3]["chunk_id"] == 0
    assert rows[4]["n_tokens"] == 0 and rows[4]["tok_before"] == 300
    assert rows[4]["chunk_id"] == 1 and rows[4]["chunk_offset"] == 44
    assert rows[5]["tok_before"] == 300  # null-token row occupies no budget
    assert all(0 <= r["chunk_offset"] < 256 for r in rows.values())


def test_pack_documents_counts_ws_tokens(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, None), (3, "x")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in packing.pack_documents(df, "doc_id", "text", budget=4).collect()}
    assert rows[1]["n_tokens"] == 3
    assert rows[2]["n_tokens"] == 0
    assert rows[3]["tok_before"] == 3 and rows[3]["chunk_offset"] == 3


# ---------------------------------------------------------------------------
# text additions: normalization dedup, PII scan, corpus n-grams
# ---------------------------------------------------------------------------


def test_normalize_text_and_dups(spark):
    df = spark.createDataFrame(
        [
            (1, "Hello,   World!"),
            (2, "hello world"),
            (3, "HELLO ... world"),
            (4, "goodbye world"),
        ],
        ["doc_id", "text"],
    )
    norm = {r["doc_id"]: r["n"] for r in df.select("doc_id", text.normalize_text("text").alias("n")).collect()}
    assert norm[1] == norm[2] == norm[3] == "hello world"
    dups = text.normalized_duplicates(df, "doc_id", "text").collect()
    assert {r["doc_id"] for r in dups} == {1, 2, 3}
    assert all(r["group_size"] == 3 for r in dups)


def test_pii_counts(spark):
    blob = (
        "contact a@b.com or c.d+x@e.org, server 10.0.0.1, "
        "call 25-989-741-2988, ssn 123-45-6789"
    )
    df = spark.createDataFrame([(1, blob), (2, "clean text"), (3, None)], ["id", "t"])
    rows = {r["id"]: r for r in text.with_pii(df, "t").collect()}
    assert rows[1]["n_email"] == 2
    assert rows[1]["n_ipv4"] == 1
    assert rows[1]["n_phone"] == 1
    assert rows[1]["n_ssn"] == 1
    assert rows[2]["n_email"] == 0
    assert rows[3]["n_email"] is None  # null text stays null (fail-at-end convention)


def test_top_ngrams_doc_freq(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat"),
            (2, "the cat ran"),
            (3, "the cat the cat"),  # repeated within doc counts ONCE
            (4, "a dog"),
        ],
        ["doc_id", "text"],
    )
    rows = [(r["ngram"], r["doc_freq"]) for r in text.top_ngrams(df, "text", n=2, k=3).collect()]
    assert rows[0] == ("the cat", 3)
    # deterministic tie-break: doc_freq desc, then ngram asc
    assert rows[1:] == sorted(rows[1:], key=lambda t: (-t[1], t[0]))


def test_take_per_stratum_exact_and_deterministic(spark):
    rows = [(i, "a" if i % 3 else "b") for i in range(2000)]
    df = spark.createDataFrame(rows, ["id", "stratum"])
    out = sampling.take_per_stratum(df, "id", "stratum", 100)
    by = {r["stratum"]: r["n"] for r in out.groupBy("stratum").agg(F.count("*").alias("n")).collect()}
    assert by == {"a": 100, "b": 100}
    # deterministic: same member set under a different partitioning
    got1 = {(r["id"], r["stratum"]) for r in out.collect()}
    got2 = {(r["id"], r["stratum"]) for r in
            sampling.take_per_stratum(df.repartition(5), "id", "stratum", 100).collect()}
    assert got1 == got2
    # a stratum smaller than n keeps all its rows
    small = spark.createDataFrame([(i, "x") for i in range(7)], ["id", "stratum"])
    assert sampling.take_per_stratum(small, "id", "stratum", 100).count() == 7


# ---------------------------------------------------------------------------
# corpus CLI subcommands
# ---------------------------------------------------------------------------


def test_cli_corpus_sample_and_pack(spark, tmp_path, capsys):
    import json

    from unify_spark import cli

    src = str(tmp_path / "docs")
    rows = [(i, " ".join(f"w{j}" for j in range(10)), "a" if i % 2 else "b")
            for i in range(1000)]
    spark.createDataFrame(rows, ["doc_id", "text", "lang"]).write.parquet(src)

    out1 = str(tmp_path / "sampled")
    rc = cli.main(["corpus-sample", "--table", src, "--out", out1, "--rate", "0.2"])
    r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and abs(r["n_sampled"] / 1000 - 0.2) < 0.05

    out2 = str(tmp_path / "quota")
    rc = cli.main(["corpus-sample", "--table", src, "--out", out2,
                   "--stratum", "lang", "--quota", "50"])
    capsys.readouterr()
    assert rc == 0 and spark.read.parquet(out2).count() == 100

    out3 = str(tmp_path / "packed")
    rc = cli.main(["corpus-pack", "--table", src, "--out", out3, "--budget", "100"])
    r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and r["n_docs"] == 1000 and r["total_tokens"] == 10000
    assert r["n_chunks"] == 100  # 10k tokens / 100-token budget

    # missing mode flags → usage error
    assert cli.main(["corpus-sample", "--table", src, "--out", out1]) == 2


def test_cli_corpus_clean(spark, tmp_path, capsys):
    import json

    from unify_spark import cli

    src = str(tmp_path / "docs")
    base = " ".join(f"tok{j}" for j in range(30))
    rows = [(1, base), (2, base + " extra"), (3, "short"),  # near-dups + low-quality
            (4, " ".join(f"other{j}" for j in range(30)))]
    spark.createDataFrame(rows, ["doc_id", "text"]).write.parquet(src)

    out = str(tmp_path / "clean")
    rc = cli.main(["corpus-clean", "--table", src, "--out", out, "--min-tokens", "6"])
    r = json.loads((o := capsys.readouterr().out)[o.index("{"):])
    assert rc == 0
    assert r["n_input"] == 4 and r["removed_quality"] == 1
    kept = {x["doc_id"] for x in spark.read.parquet(out).collect()}
    assert kept == {2, 4}  # doc 2 wins its cluster (more tokens than doc 1)


def test_cli_corpus_clean_decontaminates(spark, tmp_path, capsys):
    """End-to-end decontamination stage inside corpus-clean: a planted
    eval-set leak passes the quality gate but is provably absent from the
    kept output, counted under removed_decontaminated (not as a dup)."""
    import json

    from unify_spark import cli

    q = " ".join(f"eval{j}" for j in range(12))
    src = str(tmp_path / "docs")
    bench = str(tmp_path / "bench")
    rows = [
        (1, "intro " + q + " outro"),                      # leaked
        (2, " ".join(f"clean{j}" for j in range(30))),     # clean
        (3, "short"),                                      # quality-gated
    ]
    spark.createDataFrame(rows, ["doc_id", "text"]).write.parquet(src)
    spark.createDataFrame([(9, q)], ["qid", "question"]).write.parquet(bench)

    out = str(tmp_path / "clean")
    rc = cli.main([
        "corpus-clean", "--table", src, "--out", out, "--min-tokens", "6",
        "--benchmark", bench, "--bench-id-col", "qid",
        "--bench-text-col", "question",
    ])
    r = json.loads((o := capsys.readouterr().out)[o.index("{"):])
    assert rc == 0
    assert r["n_input"] == 3 and r["removed_quality"] == 1
    assert r["removed_decontaminated"] == 1 and r["removed_duplicates"] == 0
    kept = {x["doc_id"] for x in spark.read.parquet(out).collect()}
    assert kept == {2}  # the leak is gone, the clean doc survives


def test_cli_corpus_decontaminate(spark, tmp_path, capsys):
    """Leakage screen from the CLI: a corpus doc quoting a benchmark item
    is flagged and written; summary JSON counts pairs and distinct docs."""
    import json

    from unify_spark import cli

    q = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = str(tmp_path / "corpus")
    bench = str(tmp_path / "bench")
    spark.createDataFrame(
        [(1, "prefix " + q), (2, "totally unrelated words here for filler")],
        ["doc_id", "text"],
    ).write.parquet(corpus)
    spark.createDataFrame([(9, q)], ["doc_id", "text"]).write.parquet(bench)

    out = str(tmp_path / "flags")
    rc = cli.main(["corpus-decontaminate", "--table", corpus, "--benchmark", bench,
                   "--out", out, "--ngram", "8"])
    o = capsys.readouterr().out
    r = json.loads(o[o.index("{"):])
    assert rc == 0 and r["n_pairs"] == 1 and r["n_docs_flagged"] == 1
    row = spark.read.parquet(out).first()
    assert row["doc_id"] == 1 and row["bench_id"] == 9


def test_cli_audio_features_sidecars(spark, tmp_path, capsys):
    """The multimodal family end-to-end from the CLI: feature + activity-
    segment sidecars written for the fixture clips, knobs honored from a
    corpus.audio config section."""
    import json

    from unify_spark import cli
    from unify_spark.fixtures import generate_fixture

    data = str(tmp_path / "data")
    generate_fixture(data, n_rows=1000, n_parts=2)

    cfg = tmp_path / "corpus.yaml"
    cfg.write_text(
        "corpus:\n  audio:\n    threshold_dbfs: -45.0\n    min_dur_ms: 40\n"
    )
    out = str(tmp_path / "audio")
    rc = cli.main(
        ["audio-features", "--table", f"{data}/clips", "--out", out,
         "--config", str(cfg)]
    )
    o = capsys.readouterr().out
    r = json.loads(o[o.index("{"):])
    assert rc == 0
    # the fixture holds n_rows clean clips plus injected-defect rows
    assert r["n_clips"] >= 1000 and r["total_speech_ms"] > 0
    feats = spark.read.parquet(r["features"])
    segs = spark.read.parquet(r["segments"])
    assert feats.count() == r["n_clips"] and segs.count() == r["n_clips"]
    assert {"rms_db", "peak", "zcr", "clipping_ratio", "silence_ratio",
            "dc_offset"} <= set(feats.columns)
    assert {"segments", "n_segments", "speech_ms"} <= set(segs.columns)


def test_cli_embed_dedup_config_driven(spark, tmp_path, capsys):
    """Semantic dedup runnable with zero Python: knobs from the
    corpus.embed_dedup config section; planted duplicate directions must
    cluster together."""
    import json

    import numpy as np

    from unify_spark import cli

    rng = np.random.Generator(np.random.PCG64(9))
    base = rng.normal(size=(40, 16)).astype("float64")
    rows = [(i, base[i].tolist()) for i in range(40)]
    # ids 100..104 duplicate directions of 0..4 (scaled → cosine 1.0)
    rows += [(100 + i, (base[i] * 2.0).tolist()) for i in range(5)]
    src = str(tmp_path / "emb")
    spark.createDataFrame(rows, "vec_id long, embedding array<double>").write.parquet(src)

    cfg = tmp_path / "corpus.yaml"
    cfg.write_text(
        "corpus:\n  embed_dedup:\n    dim: 16\n    threshold: 0.98\n"
        "    n_planes: 40\n    n_bands: 8\n    max_bucket_size: 10000\n"
    )
    out = str(tmp_path / "clusters")
    rc = cli.main(
        ["corpus-embed-dedup", "--table", src, "--out", out, "--config", str(cfg)]
    )
    o = capsys.readouterr().out
    r = json.loads(o[o.index("{"):])
    assert rc == 0 and r["n_vectors"] == 45 and r["n_duplicates"] == 5
    cl = {x["vec_id"]: x["cluster"] for x in spark.read.parquet(out).collect()}
    for i in range(5):
        assert cl[i] == cl[100 + i]

    # a typo'd knob must error, not silently fall back
    bad = tmp_path / "bad.yaml"
    bad.write_text("corpus:\n  embed_dedup:\n    treshold: 0.9\n")
    import pytest as _pytest

    from unify_spark.plans.config import load_corpus_config

    with _pytest.raises(ValueError, match="unknown keys"):
        load_corpus_config(str(bad))


def test_pack_chunks_grouped(spark):
    """Each group gets an independent chunk stream; within a group the
    semantics match the global form restricted to that group."""
    rows = [(i, 100, "a" if i % 2 else "b") for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tok", "grp"])
    out = packing.pack_chunks_grouped(df, "doc_id", "n_tok", budget=256, group_col="grp")
    rows_by = {(r["grp"], r["doc_id"]): r for r in out.collect()}
    # group "b" holds even ids 0,2,4,6,8 — its stream restarts at 0
    assert rows_by[("b", 0)]["tok_before"] == 0
    assert rows_by[("b", 4)]["tok_before"] == 200 and rows_by[("b", 4)]["chunk_id"] == 0
    assert rows_by[("b", 6)]["tok_before"] == 300 and rows_by[("b", 6)]["chunk_id"] == 1
    assert rows_by[("a", 1)]["tok_before"] == 0  # "a" stream independent
    # per-group equivalence with the global two-phase form
    only_a = df.filter(F.col("grp") == "a")
    glob = {r["doc_id"]: r["tok_before"]
            for r in packing.pack_chunks(only_a, "doc_id", "n_tok", budget=256).collect()}
    grp = {r["doc_id"]: r["tok_before"]
           for r in out.filter(F.col("grp") == "a").collect()}
    assert glob == grp


def test_pack_spans_partition_docs_and_fill_chunks(spark):
    """Span rows must (a) partition each document's token range — per doc,
    slices are contiguous from 0 and sum to n_tokens; (b) fill every chunk
    except the last to exactly the budget; (c) give zero-token docs no
    span."""
    import random

    rng = random.Random(11)
    rows = [(i, rng.choice([0, 3, 50, 120, 700])) for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tok"])
    packed = packing.pack_chunks(df, "doc_id", "n_tok", budget=256, num_shards=5)
    spans = packing.pack_spans(packed, "doc_id", budget=256).collect()

    by_doc: dict[int, list] = {}
    by_chunk: dict[int, int] = {}
    for r in spans:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_id"], r["slice_start"], r["slice_len"]))
        by_chunk[r["chunk_id"]] = by_chunk.get(r["chunk_id"], 0) + r["slice_len"]
    n_by_id = dict(rows)
    total = sum(n_by_id.values())
    for doc, ss in by_doc.items():
        ss.sort()
        assert ss[0][1] == 0  # starts at offset 0
        pos = 0
        for chunk, start, ln in ss:
            assert start == pos and ln > 0
            pos += ln
        assert pos == n_by_id[doc]
    assert set(by_doc) == {i for i, n in rows if n > 0}
    last_chunk = max(by_chunk)
    for chunk, filled in by_chunk.items():
        assert filled == (256 if chunk < last_chunk else total - 256 * last_chunk)


def test_pack_grouped_exact_division_large_counts(spark):
    """chunk_id must use EXACT integer division: near a chunk boundary with
    large cumulative token counts (here tok_before = 256*2^45 - 1, where a
    double's ulp exceeds 1/budget) the bare float quotient rounds UP,
    yielding a chunk_id inconsistent with chunk_offset and with the numpy
    `//` in the global pack_chunks form."""
    k = 2**45
    rows = [(1, "g", 256 * k - 1), (2, "g", 1)]
    df = spark.createDataFrame(rows, "doc_id long, g string, n long")
    out = {
        r["doc_id"]: (r["chunk_id"], r["chunk_offset"])
        for r in packing.pack_chunks_grouped(
            df, "doc_id", "n", budget=256, group_col="g"
        ).collect()
    }
    assert out[1] == (0, 0)
    assert out[2] == (k - 1, 255)  # float division would report chunk k


def test_cli_audio_clean(spark, tmp_path, capsys):
    """The audio corpus gate end-to-end from the CLI on the fixture."""
    import json

    from unify_spark import cli
    from unify_spark.fixtures import generate_fixture

    data = str(tmp_path / "data")
    generate_fixture(data, n_rows=1000, n_parts=2)
    out = str(tmp_path / "kept")
    rc = cli.main(["audio-clean", "--table", f"{data}/clips", "--out", out,
                   "--max-silence-ratio", "0.99"])
    o = capsys.readouterr().out
    r = json.loads(o[o.index("{"):])
    assert rc == 0
    assert r["n_kept"] > 0 and r["removed_quality"] > 0
    kept = spark.read.parquet(out)
    assert kept.count() == r["n_kept"]
    assert {"rms_db", "silence_ratio", "speech_ms"} <= set(kept.columns)


def test_pack_chunks_length_ordered(spark):
    """order_col packs the stream by (length, id): token counts are
    monotone in stream order, totals and chunk arithmetic are unchanged,
    and the result is shard-invariant like the id-ordered form."""
    import random

    rng = random.Random(3)
    rows = [(i, rng.randrange(1, 500)) for i in range(2000)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tok"])
    out = packing.pack_chunks(df, "doc_id", "n_tok", budget=256,
                              num_shards=6, order_col="n_tok").collect()
    by_pos = sorted(out, key=lambda r: r["tok_before"])
    lens = [r["n_tokens"] for r in by_pos]
    assert lens == sorted(lens)                       # stream ordered by length
    assert sum(lens) == sum(n for _, n in rows)       # nothing lost
    for r in by_pos:                                  # arithmetic holds
        assert r["chunk_id"] == r["tok_before"] // 256
        assert r["chunk_offset"] == r["tok_before"] % 256
    out2 = packing.pack_chunks(df, "doc_id", "n_tok", budget=256,
                               num_shards=17, order_col="n_tok")
    a = {(r["doc_id"], r["tok_before"]) for r in out}
    b = {(r["doc_id"], r["tok_before"]) for r in out2.collect()}
    assert a == b                                     # shard-invariant
