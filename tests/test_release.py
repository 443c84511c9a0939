"""Release manifests: the receipt must accept the exact corpus it was
cut from and name precisely what drifted otherwise."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from medallion_data_lake_spark.catalog import load_star_table
from medallion_data_lake_spark.operators.curation_pipeline import (
    CurationConfig,
    curate_corpus,
)
from medallion_data_lake_spark.operators.release import (
    build_release_manifest,
    config_fingerprint,
    read_release_manifest,
    verify_release,
    write_release_manifest,
)

SF_DIR = "/root/testdata/sf0.001"


def test_manifest_roundtrip_and_verify(spark, tmp_path):
    docs = load_star_table(spark, SF_DIR, "documents")
    cfg = CurationConfig()
    stages = curate_corpus(docs, config=cfg)
    manifest = build_release_manifest(stages, cfg, "r1")
    assert manifest["funnel"]["exact_deduped"] >= manifest["funnel"]["curated"]
    assert manifest["n_docs"] == stages["curated"].count()
    assert manifest["n_tokens"] > 0

    path = str(tmp_path / "manifest.json")
    write_release_manifest(manifest, path)
    loaded = read_release_manifest(path)
    assert loaded["config_fingerprint"] == manifest["config_fingerprint"]

    # the exact corpus passes its own receipt
    assert verify_release(stages["curated"], loaded) == {
        "ok": True, "problems": [],
    }


def test_verify_names_the_drift(spark, tmp_path):
    docs = load_star_table(spark, SF_DIR, "documents")
    cfg = CurationConfig()
    stages = curate_corpus(docs, config=cfg)
    manifest = build_release_manifest(stages, cfg, "r1")
    curated = stages["curated"]

    # one document silently edited -> its stratum's checksum flips,
    # counts stay equal (token count preserved by same-length edit)
    first = curated.orderBy("doc_id").first()
    tampered = curated.withColumn(
        "text",
        F.when(F.col("doc_id") == first["doc_id"],
               F.concat(F.lit("X"), F.expr("substr(text, 2)"))
               ).otherwise(F.col("text")),
    )
    report = verify_release(tampered, manifest)
    assert not report["ok"]
    assert any("content_checksum drifted" in p for p in report["problems"])
    assert not any("n_docs" in p for p in report["problems"])

    # a dropped stratum is named
    gone = curated.filter(F.col("lang") != first["lang"])
    report2 = verify_release(gone, manifest)
    assert any("missing from corpus" in p for p in report2["problems"])


def test_funnel_via_observations_is_single_pass(spark):
    """The observe() funnel: per-stage counts must come from accumulators
    fired during the stratum summary's ONE pipeline execution, not from
    per-stage count() calls that replay the shared plan prefix. An
    accumulator-ticking pandas UDF on the input counts actual source-row
    evaluations (the old shape paid ~#stages corpus scans)."""
    from pyspark.sql.functions import pandas_udf

    docs = load_star_table(spark, SF_DIR, "documents")
    total = docs.count()
    acc = spark.sparkContext.accumulator(0)

    @pandas_udf("string")
    def tick(s: pd.Series) -> pd.Series:
        acc.add(len(s))
        return s

    ticked = docs.withColumn("text", tick(F.col("text")))
    cfg = CurationConfig()
    obs: dict = {}
    stages = curate_corpus(ticked, config=cfg, observations=obs)
    manifest = build_release_manifest(stages, cfg, "r1", observations=obs)

    # funnel values equal the (expensive) per-stage recount ground truth
    plain = curate_corpus(docs, config=cfg)
    for name, got in manifest["funnel"].items():
        assert got == plain[name].count(), name
    assert manifest["funnel"]["exact_deduped"] >= manifest["funnel"]["curated"]
    # ~one evaluation of the input, decisively below #funnel-stages passes
    assert acc.value <= 2 * total, (acc.value, total)


def test_checksum_is_multiplicity_sensitive(spark):
    """bit_xor cancels even multiplicities (x^x=0): adding the same row
    twice left the old checksum unchanged. The additive hash must flip."""
    from medallion_data_lake_spark.operators.release import stratum_summary

    base = spark.createDataFrame(
        [(1, "alpha beta", "en", "s"), (2, "gamma", "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    dup = base.limit(1)
    doubled = base.union(dup).union(dup)  # same row twice more

    ck = lambda df: stratum_summary(df).collect()[0]["content_checksum"]
    assert ck(doubled) != ck(base)
    # still order-independent: a shuffled multiset gives the same receipt
    assert ck(base.orderBy(F.desc("doc_id"))) == ck(base)


def test_config_fingerprint_tracks_knobs():
    a = config_fingerprint(CurationConfig())
    b = config_fingerprint(CurationConfig(min_est_jaccard=0.7))
    c = config_fingerprint(CurationConfig())
    assert a == c != b
    assert config_fingerprint({"x": 1}) == config_fingerprint({"x": 1})
    assert config_fingerprint({"x": 1}) != config_fingerprint({"x": 2})


def test_null_text_strata_do_not_poison_counts(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, None, "xx", "s1"), (2, None, "xx", "s1"),
         (3, "real words here", "en", "s2")],
        "doc_id long, text string, lang string, source string",
    )
    from medallion_data_lake_spark.operators.release import stratum_summary

    rows = {(r["source"], r["lang"]): r for r in
            stratum_summary(docs).collect()}
    assert rows[("s1", "xx")]["n_tokens"] == 0      # not NULL
    assert rows[("s2", "en")]["n_tokens"] == 3
    # and the full manifest/verify path survives
    manifest = {
        "strata": ["source", "lang"],
        "summary": [r.asDict() for r in stratum_summary(docs).collect()],
    }
    report = verify_release(docs, manifest)
    assert report == {"ok": True, "problems": []}
