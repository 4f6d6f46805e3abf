"""End-to-end training-data pipeline: the composition story the extension
operators exist for. Raw documents → quality filter → exact dedup →
near-dup removal (MinHash-LSH) → fingerprint → build a served KV domain →
point-read it back. Every stage is the real operator; the final domain is
verified against an independently computed expectation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elephantdb_spark import DomainSpec, Engine, build_domain
from elephantdb_spark.functions.text import fingerprint_rolling_col, token_count_col
from elephantdb_spark.operators.dedup import exact_dedup, minhash_lsh_pairs

SF = "/root/testdata/sf0.001"
MIN_TOKENS = 30


@pytest.fixture(scope="module")
def corpus(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    # plant exact dups (ids+100000) and near-dups (ids+200000, prefix cut)
    exact = docs.filter(F.col("doc_id") < 30).select(
        (F.col("doc_id") + 100_000).alias("doc_id"), "text"
    )
    near = docs.filter(F.col("doc_id") < 15).select(
        (F.col("doc_id") + 200_000).alias("doc_id"),
        F.expr("substring(text, 12)").alias("text"),
    )
    return docs.unionByName(exact).unionByName(near).cache()


def test_full_pipeline_to_served_domain(spark, corpus, tmp_path):
    # 1. quality gate: drop short docs (JVM-side token count)
    quality = corpus.filter(token_count_col(F.col("text")) >= MIN_TOKENS)

    # 2. exact dedup: canonical id per identical text
    survivors = exact_dedup(quality, ["text"], "doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    deduped = quality.join(survivors, "doc_id")

    # 3. near-dup removal: drop the higher id of each LSH-confirmed pair
    pairs = minhash_lsh_pairs(
        deduped, "doc_id", "text", num_perm=32, bands=8, threshold=0.5
    )
    losers = pairs.select(F.greatest("a", "b").alias("doc_id")).distinct()
    clean = deduped.join(losers, "doc_id", "left_anti")

    # 4. fingerprint + build a served domain: key=doc_id, value=fingerprint
    kv = clean.select(
        F.col("doc_id").cast("string").cast("binary").alias("key"),
        fingerprint_rolling_col(F.col("text")).cast("string").cast("binary").alias("value"),
    )
    eng = Engine(spark, str(tmp_path / "domains"))
    build_domain(spark, kv, eng.domain_root("clean_docs"), DomainSpec(num_shards=4), version=1)

    # --- verification ------------------------------------------------------
    dom = eng.domain("clean_docs")
    clean_rows = clean.collect()
    assert dom.count() == len(clean_rows)

    # no planted exact duplicate may survive alongside its original
    served_ids = {int(bytes(r.key)) for r in dom.scan().select("key").collect()}
    originals = {i for i in served_ids if i < 100_000}
    assert not {i - 100_000 for i in served_ids if 100_000 <= i < 200_000} & originals

    # near-dups: every planted (orig, orig+200000) pair lost its higher id
    # when LSH confirmed it; verify none of the planted CONFIRMED pairs survive
    confirmed = {r["b"] for r in pairs.filter(F.col("b") >= 200_000).collect()}
    assert confirmed, "LSH found no planted near-dups — test corpus broken"
    assert not confirmed & served_ids

    # served values are the true fingerprints (cross-checked in Python)
    from elephantdb_spark.functions.text import python_fingerprint

    sample = {r["doc_id"]: r["text"] for r in clean_rows[:10]}
    got = dom.multi_get([str(i).encode() for i in sample])
    for i, text in sample.items():
        assert int(got[str(i).encode()]) == python_fingerprint(text)


def test_clean_corpus_matches_hand_rolled(spark, corpus):
    """The packaged pipeline reproduces the hand-rolled stage composition
    above on the same planted corpus."""
    from elephantdb_spark.pipeline import clean_corpus

    # hand-rolled (mirrors test_full_pipeline_to_served_domain's stages,
    # same detector parameters)
    quality = corpus.filter(token_count_col(F.col("text")) >= MIN_TOKENS)
    survivors = exact_dedup(quality, ["text"], "doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    deduped = quality.join(survivors, "doc_id")
    pairs = minhash_lsh_pairs(
        deduped, "doc_id", "text", num_perm=32, bands=8, threshold=0.5
    )
    losers = pairs.select(F.greatest("a", "b").alias("doc_id")).distinct()
    expected = {r.doc_id for r in deduped.join(losers, "doc_id", "left_anti").collect()}

    got = {
        r.doc_id
        for r in clean_corpus(
            corpus, min_tokens=MIN_TOKENS, neardup="minhash",
            num_perm=32, bands=8, neardup_threshold=0.5,
            neardup_scope="pairs",
        ).collect()
    }
    assert got == expected
    # planted exact dups (ids+100000) must all be gone
    assert not {i for i in got if 100_000 <= i < 200_000}


def test_clean_corpus_components_scope_keeps_one_per_cluster(spark):
    """neardup_scope='components' (the default) keeps exactly one doc per
    near-dup cluster; 'pairs' keeps every local minimum. The planted
    cluster {1, 3, 5} is detected via pairs (1,5) and (3,5) only — text 1
    and 3 share nothing pairwise — so 'pairs' keeps both 1 and 3 while
    components keeps only 1."""
    from elephantdb_spark.pipeline import clean_corpus

    # chain: 1~5 (5 = 1 + tail, jaccard .583), 3~5 (3 = 5's tail + fresh
    # suffix, jaccard .296), 1 !~ 3 (zero shared shingles)
    other = "one two three four five six seven eight nine ten eleven"
    t1 = "a b c d e f g h i j k l m n o p"
    t5 = t1 + " q r s t u v w x y z"
    t3 = "q r s t u v w x y z a2 b2 c2"
    rows = [(1, t1), (5, t5), (3, t3), (9, other)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def run(scope):
        return {
            r.doc_id
            for r in clean_corpus(
                docs, min_tokens=0, drop_exact_dups=False,
                neardup="jaccard", neardup_threshold=0.25,
                shingle_len=3, neardup_scope=scope,
            ).collect()
        }

    pairs_kept = run("pairs")
    comp_kept = run("components")
    assert pairs_kept == {1, 3, 9}  # both local minima survive
    assert comp_kept == {1, 9}  # one rep per cluster
    with pytest.raises(ValueError, match="unknown neardup_scope"):
        clean_corpus(docs, neardup_scope="bogus")


def test_clean_corpus_stage_toggles(spark, corpus):
    from elephantdb_spark.pipeline import clean_corpus

    everything = clean_corpus(corpus, min_tokens=None, drop_exact_dups=False,
                              neardup=None)
    assert everything.count() == corpus.count()
    import pytest

    with pytest.raises(ValueError, match="unknown neardup"):
        clean_corpus(corpus, neardup="bogus")
