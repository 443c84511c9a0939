"""End-to-end corpus-curation pipeline (operators/curation_pipeline.py).

The per-stage registry queries are oracle-verified; these tests pin the
composed pipeline: funnel monotonicity, determinism, stage semantics on
constructed corpora, and the one-plan/no-driver-collect posture.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from medallion_data_lake_spark.operators.curation_pipeline import (
    CurationConfig,
    blocklist_scrub,
    curate_corpus,
    decontaminate,
    exact_dedup,
    near_dup_dedup,
    pack_sequences,
    stratified_sample,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_exact_dedup_keeps_min_id_per_content(spark):
    df = spark.createDataFrame(
        [
            (1, "the same  text", "a"),
            (2, "THE SAME TEXT", "a"),   # case-normalized dup of 1
            (3, "the same text", "a"),   # whitespace-normalized dup of 1
            (4, "other text", "b"),
        ],
        "doc_id int, text string, source string",
    )
    out = exact_dedup(df)
    kept = {r.doc_id for r in out.collect()}
    assert kept == {1, 4}
    # full row survives (schema preserved)
    assert set(out.columns) == {"doc_id", "text", "source"}


def test_near_dup_dedup_collapses_groups_keeps_distinct(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base + " lambda"),            # near-dup of 1
            (3, "completely different words none shared with others at all"),
        ],
        "doc_id int, text string",
    )
    out = near_dup_dedup(df, min_est_jaccard=0.3)
    kept = {r.doc_id for r in out.collect()}
    assert 3 in kept and 1 in kept and 2 not in kept


def test_decontaminate_drops_overlapping_docs(spark):
    df = spark.createDataFrame(
        [
            (1, "one two three four five"),
            (2, "six seven eight nine ten"),
        ],
        "doc_id int, text string",
    )
    bench = spark.createDataFrame(
        [("held out eval one two three probe",)], "text string"
    )
    out = decontaminate(df, bench)
    assert {r.doc_id for r in out.collect()} == {2}
    # threshold relaxation keeps low-overlap docs
    out2 = decontaminate(df, bench, max_contamination=0.9)
    assert {r.doc_id for r in out2.collect()} == {1, 2}


def test_stratified_sample_rate_zero_and_full(spark):
    d = _docs(spark)
    none_kept = stratified_sample(d, {}, default_rate_per_mille=0)
    all_kept = stratified_sample(d, {}, default_rate_per_mille=1000)
    assert none_kept.count() == 0
    assert all_kept.count() == d.count()
    # map-side: no shuffle in the sampling filter plan
    plan = all_kept._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_blocklist_scrub_rewrites_text(spark):
    df = spark.createDataFrame(
        [(1, "good words only here"), (2, "bad bad bad one ok")],
        "doc_id int, text string",
    )
    out = blocklist_scrub(df, ["bad"], max_hit_ratio=0.5)
    rows = {r.doc_id: r.text for r in out.collect()}
    assert rows == {1: "good words only here"}  # doc 2 above density cap
    out2 = {r.doc_id: r.text for r in
            blocklist_scrub(df, ["bad"], max_hit_ratio=0.9).collect()}
    assert out2[2] == "one ok"  # survives, scrubbed


def test_full_pipeline_funnel_and_manifest(spark):
    d = _docs(spark)
    bench = d.filter(F.col("source") == "src0").select("text")
    corpus = d.filter(F.col("source") != "src0")
    stages = curate_corpus(
        corpus,
        bench,
        CurationConfig(
            rates_per_mille={"en": 300},
            default_rate_per_mille=800,
            blocklist=("slow",),
            max_hit_ratio=0.2,
        ),
    )
    order = ["exact_deduped", "near_deduped", "decontaminated", "sampled",
             "scrubbed"]
    counts = {k: stages[k].count() for k in order}
    n0 = corpus.count()
    prev = n0
    for k in order:
        assert counts[k] <= prev, (k, counts, n0)
        prev = counts[k]
    assert counts["scrubbed"] > 0
    # manifest conserves the curated docs exactly, and sequence token
    # loads never exceed budget by more than one document's overhang
    manifest = stages["manifest"]
    assert manifest.count() == counts["scrubbed"]
    assert stages["curated"].join(
        manifest.select("doc_id"), "doc_id", "left_anti"
    ).count() == 0
    seq = manifest.groupBy("source", "seq_id").agg(
        F.sum("n_tok").alias("load"), F.count(F.lit(1)).alias("n")
    )
    over = seq.filter((F.col("load") >= 512 + 200) & (F.col("n") > 1))
    assert over.count() == 0


def test_production_hash_path_agrees_on_clear_cut_dups(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, "nothing in common with the pair above")],
        "doc_id int, text string",
    )
    # identical docs collide under any hash family; xxhash64 path must
    # find the same group structure as the oracle-reproducible md5 path
    md5_kept = {r.doc_id for r in near_dup_dedup(df).collect()}
    xx_kept = {r.doc_id for r in
               near_dup_dedup(df, production_hash=True).collect()}
    assert md5_kept == xx_kept == {1, 3}
    # and the production plan contains no md5 expression
    sigs_plan = near_dup_dedup(df, production_hash=True)._jdf.queryExecution() \
        .analyzed().toString()
    assert "md5" not in sigs_plan.lower() or "xxhash64" in sigs_plan


def test_redact_pii_planted_patterns(spark):
    from medallion_data_lake_spark.operators.curation_pipeline import redact_pii

    df = spark.createDataFrame(
        [
            (1, "contact me at jane.doe+x@example.org or 555-123-4567 ok"),
            (2, "server 10.0.255.3 holds ssn 123-45-6789 in logs"),
            (3, "no sensitive content here at all"),
        ],
        "doc_id int, text string",
    )
    out = {r.doc_id: r.text for r in redact_pii(df).collect()}
    assert out[1] == "contact me at <EMAIL> or <PHONE> ok"
    assert out[2] == "server <IPV4> holds ssn <SSN> in logs"
    assert out[3] == "no sensitive content here at all"


def test_shuffle_assignment_is_a_permutation(spark):
    from medallion_data_lake_spark.operators.curation_pipeline import (
        shuffle_assignment,
    )

    d = _docs(spark)
    out = shuffle_assignment(d, n_shards=4, seed=1).cache()
    n = d.count()
    assert out.count() == n
    assert out.select("doc_id").distinct().count() == n  # every doc once
    # dense per-shard positions
    per = out.groupBy("shard").agg(
        F.count(F.lit(1)).alias("c"), F.max("pos").alias("m"), F.min("pos").alias("lo")
    ).collect()
    assert {r.shard for r in per} <= set(range(4))
    for r in per:
        assert (r.lo, r.m) == (1, r.c)
    # different seed -> different order (not the identity re-labeling)
    other = shuffle_assignment(d, n_shards=4, seed=2)
    joined = out.alias("a").join(other.alias("b"), "doc_id").filter(
        (F.col("a.shard") != F.col("b.shard")) | (F.col("a.pos") != F.col("b.pos"))
    )
    assert joined.count() > 0


def test_mix_corpus_hits_token_targets(spark):
    from medallion_data_lake_spark.operators.curation_pipeline import mix_corpus
    from medallion_data_lake_spark.queries.text import tokens as tok

    d = _docs(spark)
    per_src = {
        r.source: r.toks
        for r in d.groupBy("source")
        .agg(F.sum(F.size(tok(F.col("text")))).alias("toks"))
        .collect()
    }
    big = max(per_src, key=per_src.get)
    target = per_src[big] // 3
    out = mix_corpus(d, {big: target})
    got = {
        r.source: r.toks
        for r in out.groupBy("source")
        .agg(F.sum(F.size(tok(F.col("text")))).alias("toks"))
        .collect()
    }
    # capped source lands near its target (hash gate is binomial);
    # untargeted sources are untouched
    assert got[big] < per_src[big]
    assert abs(got[big] - target) / target < 0.35
    for s, t in per_src.items():
        if s != big:
            assert got[s] == t
    # deterministic
    assert out.count() == mix_corpus(d, {big: target}).count()


def test_assign_splits_deterministic_partition(spark):
    from medallion_data_lake_spark.operators.curation_pipeline import assign_splits

    d = _docs(spark)
    out = assign_splits(d, {"train": 0.9, "val": 0.05, "test": 0.05}).cache()
    n = d.count()
    counts = {r.split: r.c for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert sum(counts.values()) == n
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] > 0.8 * n
    # stability: same assignment on a rebuilt subset (no split migration)
    sub = assign_splits(d.limit(100), {"train": 0.9, "val": 0.05, "test": 0.05})
    full = {r.doc_id: r.split for r in out.collect()}
    for r in sub.collect():
        assert full[r.doc_id] == r.split


def test_pipeline_deterministic_across_runs(spark):
    d = _docs(spark)
    cfg = CurationConfig(rates_per_mille={"en": 250}, default_rate_per_mille=600)
    a = curate_corpus(d, config=cfg)["curated"]
    b = curate_corpus(d, config=cfg)["curated"]
    ids_a = sorted(r.doc_id for r in a.select("doc_id").collect())
    ids_b = sorted(r.doc_id for r in b.select("doc_id").collect())
    assert ids_a == ids_b and len(ids_a) > 0


def test_semantic_dedup_stage_drops_planted_near_dups(spark):
    import numpy as np

    from medallion_data_lake_spark.operators.curation_pipeline import (
        semantic_dedup_docs,
    )

    rng = np.random.default_rng(11)
    base = rng.standard_normal((40, 16))
    docs = spark.createDataFrame(
        [(i, f"text {i}", "en", "web") for i in range(44)],
        "doc_id long, text string, lang string, source string",
    )
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    # ids 40..43 are near-copies of ids 0..3
    for j in range(4):
        rows.append((40 + j, [float(x) for x in base[j] + 0.01 * rng.standard_normal(16)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cfg = CurationConfig(semantic_cluster_size=8)
    out = semantic_dedup_docs(docs, emb, cfg)
    kept = {r.doc_id for r in out.select("doc_id").collect()}
    assert kept == set(range(40))  # originals kept, planted copies dropped


def test_quality_filter_stage_and_full_composition(spark):
    from medallion_data_lake_spark.operators.classifier import (
        train_quality_classifier,
        weak_quality_labels,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    model = train_quality_classifier(weak_quality_labels(docs))
    stages = curate_corpus(docs, quality_model=model)
    assert "quality_filtered" in stages
    n_before = stages["near_deduped"].count()
    n_after = stages["quality_filtered"].count()
    assert 0 < n_after <= n_before
    # composition stays lazy end-to-end and the curated set flows through
    assert stages["curated"].count() <= n_after


def test_chunk_documents_windows_and_reconstruction(spark):
    from medallion_data_lake_spark.operators.curation_pipeline import chunk_documents

    text = " ".join(f"w{i}" for i in range(100))  # 100 tokens
    df = spark.createDataFrame(
        [(1, text), (2, "only three tokens")], "doc_id int, text string"
    )
    out = chunk_documents(df, chunk_tokens=64, chunk_stride=48).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # 100 tokens @ stride 48 -> starts 0, 48, 96 = 3 chunks; 3 tokens -> 1
    assert len(by_doc[1]) == 3 and len(by_doc[2]) == 1
    c0, c1, c2 = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    assert (c0.chunk_start, c1.chunk_start, c2.chunk_start) == (0, 48, 96)
    assert (c0.chunk_tokens, c1.chunk_tokens, c2.chunk_tokens) == (64, 52, 4)
    # overlap: chunk 1 starts inside chunk 0's window (48 < 64)
    toks0, toks1 = c0.chunk_text.split(" "), c1.chunk_text.split(" ")
    assert toks0[48:] == toks1[:16]
    # lossless: stride-prefixes + final chunk reconstruct the document
    recon = toks0[:48] + toks1[:48] + c2.chunk_text.split(" ")
    assert recon == text.split(" ")


def test_chunk_documents_covers_null_and_empty_text(spark):
    """NULL/empty text must not vanish from the chunk output: posexplode
    over a null sequence emits no rows, so chunk_documents coalesces to
    '' — every input doc gets at least one chunk row."""
    from medallion_data_lake_spark.operators.curation_pipeline import chunk_documents

    df = spark.createDataFrame(
        [(1, "a few real tokens"), (2, None), (3, "")],
        "doc_id int, text string",
    )
    out = chunk_documents(df, chunk_tokens=8, chunk_stride=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {1, 2, 3}
    for d in (2, 3):
        (row,) = by_doc[d]
        assert (row.chunk_idx, row.chunk_start) == (0, 0)
        assert row.chunk_text == ""


def test_pipeline_chunks_stage_covers_curated_docs_only(spark):
    stages = curate_corpus(_docs(spark), config=CurationConfig(chunk_tokens=32,
                                                               chunk_stride=24))
    curated_ids = {r.doc_id for r in stages["curated"].select("doc_id").collect()}
    chunk_rows = stages["chunks"].collect()
    assert {r.doc_id for r in chunk_rows} == curated_ids
    assert all(1 <= r.chunk_tokens <= 32 for r in chunk_rows)
    # every doc contributes a chunk at start 0, and consecutive chunk
    # starts step by exactly the stride
    starts = {}
    for r in chunk_rows:
        starts.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_start))
    for doc, s in starts.items():
        s = [st for _, st in sorted(s)]
        assert s[0] == 0
        assert all(b - a == 24 for a, b in zip(s, s[1:]))


def test_temperature_targets_math():
    from medallion_data_lake_spark.operators.curation_pipeline import (
        temperature_targets,
    )

    totals = {"web": 900_000, "code": 90_000, "ref": 10_000}
    # alpha=1: natural proportions
    nat = temperature_targets(totals, 1.0, 100_000)
    assert nat["web"] == 90_000 and nat["code"] == 9_000 and nat["ref"] == 1_000
    # alpha=0: uniform
    uni = temperature_targets(totals, 0.0, 99_999)
    assert len({uni["web"], uni["code"], uni["ref"]}) == 1
    # flattening is monotone in alpha: the tail's share only grows as
    # alpha drops
    shares = [
        temperature_targets(totals, a, 100_000)["ref"]
        for a in (1.0, 0.7, 0.3, 0.0)
    ]
    assert shares == sorted(shares)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        temperature_targets(totals, 1.5, 100)


def test_mix_corpus_temperature_flattens_sources(spark):
    from medallion_data_lake_spark.operators.curation_pipeline import (
        mix_corpus_temperature,
        temperature_targets,
    )
    from medallion_data_lake_spark.queries.text import tokens as tok

    d = _docs(spark)

    def per_src(df):
        return {
            r.source: r.toks
            for r in df.groupBy("source")
            .agg(F.sum(F.size(tok(F.col("text")))).alias("toks"))
            .collect()
        }

    before = per_src(d)
    budget = sum(before.values()) // 2
    out = mix_corpus_temperature(d, alpha=0.3, total_token_budget=budget)
    got = per_src(out)
    targets = temperature_targets(before, 0.3, budget)
    for s, t in targets.items():
        kept = got.get(s, 0)
        # downsampled sources land near their temperature target; the
        # hash gate is binomial over few docs per source, so per-source
        # tolerance is loose and the aggregate check below is the tight
        # one (independent errors average out across sources)
        want = min(t, before[s])
        assert abs(kept - want) <= max(0.6 * want, 100), (s, kept, want)
    want_total = sum(min(t, before[s]) for s, t in targets.items())
    assert abs(sum(got.values()) - want_total) <= 0.2 * want_total
    # deterministic
    assert out.count() == mix_corpus_temperature(
        d, alpha=0.3, total_token_budget=budget).count()


def test_pipeline_mixing_stage_composes(spark):
    from medallion_data_lake_spark.operators.curation_pipeline import (
        CurationConfig,
        curate_corpus,
    )
    from medallion_data_lake_spark.queries.text import tokens as tok

    d = _docs(spark)
    total = d.agg(F.sum(F.size(tok(F.col("text"))))).first()[0]
    out = curate_corpus(
        d, config=CurationConfig(mix_alpha=0.3, mix_token_budget=total // 2)
    )
    assert "mixed" in out
    kept = out["curated"].agg(
        F.sum(F.size(tok(F.col("text"))))
    ).first()[0]
    assert kept < total                      # mixing actually downsampled
    # the stage sits between dedup and sampling: every kept doc is one
    # of the deduped docs
    assert out["curated"].join(
        out["near_deduped"].select("doc_id"), "doc_id", "left_anti"
    ).count() == 0


def test_pii_redaction_stage(spark):
    """redact_pii: span-level scrub (email/phone/long-id -> [REDACTED])
    as a codegen map pass, and the pipeline stage drops documents whose
    redaction count exceeds max_pii_hits."""
    from medallion_data_lake_spark.operators.curation_pipeline import (
        CurationConfig,
        curate_corpus,
    )
    from medallion_data_lake_spark.operators.text import redact_pii

    docs = spark.createDataFrame(
        [
            (1, "contact a@b.example.org please the the a a of of", "en", "web"),
            # word-separated so each id is its own span (adjacent digit runs
            # merge into ONE phone-shaped span — also correct redaction)
            (2, "ids 123456789 then 987654321 also 111222333 and 444555666", "en", "web"),
            (3, "perfectly clean document text the a of in is", "en", "web"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    out = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    assert out[1]["n_pii_redactions"] == 1 and "[REDACTED]" in out[1]["text"]
    assert "a@b" not in out[1]["text"]
    assert out[2]["n_pii_redactions"] == 4
    assert out[3]["n_pii_redactions"] == 0
    assert out[3]["text"].startswith("perfectly clean")

    # JVM-only: the scrub must not leave codegen
    from medallion_data_lake_spark.plans import explain_str

    plan = explain_str(redact_pii(docs))
    # (the createDataFrame source RDD's name contains "PythonRDD";
    # what must be absent is any Python EVALUATION node)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    cfg = CurationConfig(redact_pii=True, max_pii_hits=2)
    stages = curate_corpus(docs, config=cfg)
    kept = {r["doc_id"]: r["text"] for r in stages["curated"].collect()}
    assert 2 not in kept            # 4 hits > max_pii_hits
    assert set(kept) == {1, 3}
    assert "[REDACTED]" in kept[1] and "@" not in kept[1]


def test_remove_common_segments_line_dedup(spark):
    """CCNet-style cross-document line dedup: boilerplate segments
    appearing in >= min_docs documents vanish, unique segments survive
    IN ORDER, fully-boilerplate documents drop entirely."""
    from medallion_data_lake_spark.operators.curation_pipeline import (
        remove_common_segments,
    )
    from medallion_data_lake_spark.plans import explain_str

    boiler = "subscribe to our newsletter"
    footer = "all rights reserved"
    rows = []
    for i in range(12):
        rows.append((i, f"unique opening {i}\n{boiler}\nunique body {i}\n{footer}"))
    rows.append((100, f"{boiler}\n{footer}"))     # nothing but boilerplate
    rows.append((101, "rare line a\nrare line b"))  # untouched
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    out = {r["doc_id"]: r["text"]
           for r in remove_common_segments(docs, min_docs=10).collect()}
    assert 100 not in out                       # fully boilerplate -> dropped
    assert out[101] == "rare line a\nrare line b"
    for i in range(12):
        assert out[i] == f"unique opening {i}\nunique body {i}", out[i]

    # plan hygiene: no Python evaluation, no cartesian
    plan = explain_str(remove_common_segments(docs, min_docs=10))
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan


def test_remove_common_segments_threshold(spark):
    """A segment in min_docs-1 documents survives; at min_docs it goes."""
    from medallion_data_lake_spark.operators.curation_pipeline import (
        remove_common_segments,
    )

    shared = "shared but not quite boilerplate"
    docs = spark.createDataFrame(
        [(i, f"{shared}\nown {i}") for i in range(4)],
        "doc_id long, text string",
    )
    out4 = {r["doc_id"]: r["text"]
            for r in remove_common_segments(docs, min_docs=5).collect()}
    assert all(t.startswith(shared) for t in out4.values())
    out3 = {r["doc_id"]: r["text"]
            for r in remove_common_segments(docs, min_docs=4).collect()}
    assert all(t == f"own {i}" for i, t in out3.items())


def test_fuzzy_decontaminate_catches_paraphrase(spark):
    """r7: the LSH near-match stage drops a document that shares most
    (not all) shingles with a benchmark doc — the paraphrase leak the
    exact join misses at max_contamination thresholds above the
    overlap — while unrelated docs survive."""
    from medallion_data_lake_spark.operators.curation_pipeline import (
        fuzzy_decontaminate,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = base.rsplit(" ", 1)[0] + " OMEGA"   # one word changed at the end
    df = spark.createDataFrame(
        [(1, near), (2, "totally different words nothing shared here at all")],
        "doc_id int, text string",
    )
    bench = spark.createDataFrame([(base,)], "text string")
    out = fuzzy_decontaminate(df, bench, min_est_jaccard=0.5)
    assert {r.doc_id for r in out.collect()} == {2}
    # raising tau past the similarity keeps both
    out2 = fuzzy_decontaminate(df, bench, min_est_jaccard=0.99)
    assert {r.doc_id for r in out2.collect()} == {1, 2}


def test_pipeline_fuzzy_stage_in_funnel(spark):
    """fuzzy_decontaminate=True adds its stage to the observed funnel
    and composes with the exact stage."""
    from medallion_data_lake_spark.catalog import load_star_table
    from medallion_data_lake_spark.operators.curation_pipeline import (
        CurationConfig,
        curate_corpus,
    )

    d = load_star_table(spark, "/root/testdata/sf0.001", "documents")
    bench = d.filter(F.col("source") == "src0").select("text")
    obs: dict = {}
    stages = curate_corpus(
        d.filter(F.col("source") != "src0"),
        bench=bench,
        config=CurationConfig(fuzzy_decontaminate=True),
        observations=obs,
    )
    final = stages["packed"] if "packed" in stages else list(stages.values())[-1]
    final.count()  # drive the funnel observers
    assert "fuzzy_decontaminated" in stages
    n_exact = stages["decontaminated"].count()
    n_fuzzy = stages["fuzzy_decontaminated"].count()
    assert n_fuzzy <= n_exact  # the fuzzy stage only removes further


def test_persisted_benchmark_decon_equals_raw_bench(spark, tmp_path):
    """materialize_benchmark_decon + benchmark_decon_table must produce
    the SAME curated output as passing the raw bench frame — for both
    the exact n-gram stage and the fuzzy LSH stage (r14 funnel-floor
    lever: the bench side is static per suite)."""
    from medallion_data_lake_spark.operators.curation_pipeline import (
        CurationConfig,
        curate_corpus,
        materialize_benchmark_decon,
    )

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today", "en", "web"),
         (2, "completely unrelated text about cooking pasta dishes", "en", "web"),
         (3, "the quick brown fox jumps over the lazy dog tonight", "en", "web"),
         (4, "another unique document describing mountain hiking trails", "en", "web")],
        "doc_id long, text string, lang string, source string")
    bench = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog today",)],
        "text string")

    root = str(tmp_path / "bench_decon")
    rep = materialize_benchmark_decon(spark, bench, root)
    assert rep["n_ngrams"] > 0 and rep["n_band_rows"] > 0

    cfgs = dict(min_est_jaccard=1.01, fuzzy_decontaminate=True,
                fuzzy_tau=0.4)
    raw = curate_corpus(docs, bench=bench,
                        config=CurationConfig(**cfgs))["curated"]
    via = curate_corpus(docs, config=CurationConfig(
        benchmark_decon_table=root, **cfgs))["curated"]
    raw_ids = sorted(r["doc_id"] for r in raw.collect())
    via_ids = sorted(r["doc_id"] for r in via.collect())
    assert raw_ids == via_ids
    assert 1 not in via_ids          # exact contamination dropped
    assert {2, 4} <= set(via_ids)    # clean docs survive


def test_benchmark_decon_table_guards(spark, tmp_path):
    import pytest

    from medallion_data_lake_spark.operators.curation_pipeline import (
        CurationConfig,
        curate_corpus,
        materialize_benchmark_decon,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon", "en", "web")],
        "doc_id long, text string, lang string, source string")
    bench = spark.createDataFrame([("zeta eta theta",)], "text string")
    root = str(tmp_path / "bd")
    materialize_benchmark_decon(spark, bench, root, production_hash=False)

    # hash-family mismatch refuses (band keys would never collide)
    with pytest.raises(ValueError, match="production_hash"):
        curate_corpus(docs, config=CurationConfig(
            benchmark_decon_table=root, production_hash=True,
            fuzzy_decontaminate=True))

    # ambiguity refuses
    with pytest.raises(ValueError, match="both configured"):
        curate_corpus(docs, bench=bench, config=CurationConfig(
            benchmark_decon_table=root))

    # missing sidecar refuses
    import os
    os.remove(os.path.join(root, "_bench_decon.json"))
    with pytest.raises(ValueError, match="_bench_decon.json"):
        curate_corpus(docs, config=CurationConfig(
            benchmark_decon_table=root))


def test_decon_verdict_route_equals_recompute(spark, tmp_path):
    """r16 (r15 verdict #3): materialize_decon_verdict +
    decon_verdict_table must produce the SAME curated output as the
    recompute route (raw bench= / benchmark_decon_table) for both decon
    stages, including after an INCREMENT (appended docs + a changed
    text under a stable id), with the verdicts computed only for the
    delta."""
    from medallion_data_lake_spark.operators.curation_pipeline import (
        CurationConfig,
        curate_corpus,
        materialize_benchmark_decon,
        materialize_decon_verdict,
    )
    from medallion_data_lake_spark.operators.versioned import read_table

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today", "en", "web"),
         (2, "completely unrelated text about cooking pasta dishes", "en", "web"),
         (3, "the quick brown fox jumps over the lazy dog tonight", "en", "web"),
         (4, "another unique document describing mountain hiking trails", "en", "web")],
        "doc_id long, text string, lang string, source string")
    bench = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog today",)],
        "text string")

    root = str(tmp_path / "bench_decon")
    materialize_benchmark_decon(spark, bench, root)
    vt = str(tmp_path / "decon_verdict")
    rep = materialize_decon_verdict(spark, docs, root, vt)
    assert rep["n_new"] == 4 and rep["n_total"] == 4

    cfgs = dict(min_est_jaccard=1.01, fuzzy_decontaminate=True,
                fuzzy_tau=0.4)
    raw = curate_corpus(docs, bench=bench,
                        config=CurationConfig(**cfgs))["curated"]
    via = curate_corpus(docs, config=CurationConfig(
        decon_verdict_table=vt, **cfgs))["curated"]
    raw_ids = sorted(r["doc_id"] for r in raw.collect())
    via_ids = sorted(r["doc_id"] for r in via.collect())
    assert raw_ids == via_ids
    assert 1 not in via_ids

    # same verdicts serve a DIFFERENT threshold config (thresholds are
    # read-time, not baked into the table)
    loose = dict(min_est_jaccard=1.01, fuzzy_decontaminate=True,
                 fuzzy_tau=0.99, max_contamination=0.9)
    raw2 = curate_corpus(docs, bench=bench,
                         config=CurationConfig(**loose))["curated"]
    via2 = curate_corpus(docs, config=CurationConfig(
        decon_verdict_table=vt, **loose))["curated"]
    assert sorted(r["doc_id"] for r in raw2.collect()) == \
        sorted(r["doc_id"] for r in via2.collect())

    # increment: one appended near-paraphrase + one changed text
    docs2 = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today", "en", "web"),
         (2, "completely unrelated text about cooking pasta dishes", "en", "web"),
         # doc 3's text CHANGED under its stable id — now clean
         (3, "rewritten clean text mentioning neither fox nor dog", "en", "web"),
         (4, "another unique document describing mountain hiking trails", "en", "web"),
         (5, "the quick brown fox jumps over the lazy dog yesterday", "en", "web")],
        "doc_id long, text string, lang string, source string")
    rep2 = materialize_decon_verdict(spark, docs2, root, vt)
    assert rep2["n_new"] == 2          # only the delta was re-shingled
    assert rep2["n_total"] == 5        # doc 3 upserted, not duplicated

    raw3 = curate_corpus(docs2, bench=bench,
                         config=CurationConfig(**cfgs))["curated"]
    via3 = curate_corpus(docs2, config=CurationConfig(
        decon_verdict_table=vt, **cfgs))["curated"]
    assert sorted(r["doc_id"] for r in raw3.collect()) == \
        sorted(r["doc_id"] for r in via3.collect())
    # the changed doc 3 now survives; the appended paraphrase 5 is
    # caught by the fuzzy stage
    ids3 = sorted(r["doc_id"] for r in via3.collect())
    assert 3 in ids3 and 5 not in ids3

    # idempotent re-run: nothing new
    rep3 = materialize_decon_verdict(spark, docs2, root, vt)
    assert rep3["n_new"] == 0
    assert read_table(spark, vt).count() == 5


def test_decon_verdict_guards(spark, tmp_path):
    import pytest

    from medallion_data_lake_spark.operators.curation_pipeline import (
        CurationConfig,
        curate_corpus,
        materialize_benchmark_decon,
        materialize_decon_verdict,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta", "en", "web")],
        "doc_id long, text string, lang string, source string")
    bench = spark.createDataFrame([("zeta eta theta iota kappa",)],
                                  "text string")
    root = str(tmp_path / "bd")
    materialize_benchmark_decon(spark, bench, root, production_hash=False)
    vt = str(tmp_path / "dv")
    materialize_decon_verdict(spark, docs, root, vt)

    # hash-family mismatch refuses (fuzzy measures from another family)
    with pytest.raises(ValueError, match="production_hash"):
        curate_corpus(docs, config=CurationConfig(
            decon_verdict_table=vt, production_hash=True))

    # ambiguity refuses (verdicts + a recompute route)
    with pytest.raises(ValueError, match="both configured"):
        curate_corpus(docs, bench=bench, config=CurationConfig(
            decon_verdict_table=vt))
    with pytest.raises(ValueError, match="both configured"):
        curate_corpus(docs, config=CurationConfig(
            decon_verdict_table=vt, benchmark_decon_table=root))

    # uncovered docs refuse — a NEW id and a CHANGED text both count
    extra = spark.createDataFrame(
        [(9, "never seen before", "en", "web")],
        "doc_id long, text string, lang string, source string")
    with pytest.raises(ValueError, match="missing verdicts for 1"):
        curate_corpus(docs.unionByName(extra), config=CurationConfig(
            decon_verdict_table=vt))
    changed = spark.createDataFrame(
        [(1, "same id but edited text now", "en", "web")],
        "doc_id long, text string, lang string, source string")
    with pytest.raises(ValueError, match="missing verdicts for 1"):
        curate_corpus(changed, config=CurationConfig(
            decon_verdict_table=vt))

    # stale verdicts refuse after the bench set advances
    bench2 = spark.createDataFrame([("lambda mu nu xi omicron",)],
                                   "text string")
    materialize_benchmark_decon(spark, bench2, root,
                                production_hash=False)
    with pytest.raises(ValueError, match="predate the current"):
        curate_corpus(docs, config=CurationConfig(
            decon_verdict_table=vt))
    # ... and the materializer refuses to extend them too
    with pytest.raises(ValueError, match="superseded"):
        materialize_decon_verdict(spark, docs, root, vt)

    # missing sidecar refuses
    import os
    os.remove(os.path.join(vt, "_decon_verdict.json"))
    with pytest.raises(ValueError, match="_decon_verdict.json"):
        curate_corpus(docs, config=CurationConfig(
            decon_verdict_table=vt))
