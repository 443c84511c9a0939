"""Release manifests: the receipt must accept the exact corpus it was
cut from and name precisely what drifted otherwise."""

from __future__ import annotations

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
