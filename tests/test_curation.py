"""Curation operators: python replays + the cap_per_source exactness
fallback. The SQL-oracle equivalence of the driver queries (q81-q86) is
covered by test_parity."""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from elephantdb_spark.operators.curation import (
    GOPHER_DEFAULTS,
    NORMALIZATION_STEPS,
    build_vocab,
    cap_per_source,
    encode_documents,
    gopher_filter,
    normalize_text,
)

HASH_SPACE = 1 << 32


def md5_u32(v, salt: str) -> int:
    return int(hashlib.md5((str(v) + salt).encode()).hexdigest()[:8], 16)


def py_normalize(s: str) -> str:
    for pat, rep in NORMALIZATION_STEPS:
        s = re.sub(pat, rep, s)
    return s


NASTY = [
    "",
    "   ",
    "a\r\nb",
    "a\rb\rc\r",
    "x\x00y\x07z\x1f.",
    "a\t\tb   c",
    " a \n b ",
    "l1\n\n\n\n\nl2",
    "tab\t\n \ttabs\t \t.",
    "\x0b\x0cvtab-ff\x7f",
    "already clean",
    "sp  ace\ren d ",
]


class TestNormalize:
    def test_matches_python_replay(self, spark):
        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(NASTY)], "id long, text string"
        )
        got = {
            r["id"]: r["text"]
            for r in normalize_text(df, "text").collect()
        }
        for i, s in enumerate(NASTY):
            assert got[i] == py_normalize(s), repr(s)

    def test_null_stays_null(self, spark):
        df = spark.createDataFrame([(1, None)], "id long, text string")
        assert normalize_text(df, "text").collect()[0]["text"] is None

    def test_out_col(self, spark):
        df = spark.createDataFrame([(1, " x ")], "id long, text string")
        row = normalize_text(df, "text", out_col="clean").collect()[0]
        assert row["text"] == " x " and row["clean"] == "x"

    def test_idempotent(self, spark):
        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(NASTY)], "id long, text string"
        )
        once = normalize_text(df, "text")
        twice = normalize_text(once, "text")
        assert [r["text"] for r in once.orderBy("id").collect()] == [
            r["text"] for r in twice.orderBy("id").collect()
        ]


def naive_cap(df, id_col, source_col, cap, salt):
    h = F.conv(
        F.substring(
            F.md5(F.encode(F.concat(F.col(id_col).cast("string"), F.lit(salt)), "UTF-8")),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    w = Window.partitionBy(source_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= cap)
        .drop("__rk")
    )


class TestCapPerSource:
    def _rows(self, df):
        return sorted(tuple(r) for r in df.collect())

    def test_matches_naive_ranking(self, spark):
        rows = (
            [(i, "hot") for i in range(200)]
            + [(1000 + i, "small") for i in range(3)]
            + [(2000 + i, "mid") for i in range(10)]
        )
        df = spark.createDataFrame(rows, "doc_id long, source string")
        got = cap_per_source(df, "doc_id", "source", cap=5, salt="t")
        want = naive_cap(df, "doc_id", "source", 5, "t")
        assert self._rows(got) == self._rows(want)
        per_src = {}
        for _, s in self._rows(got):
            per_src[s] = per_src.get(s, 0) + 1
        assert per_src == {"hot": 5, "small": 3, "mid": 5}

    def test_under_cap_passes_through(self, spark):
        rows = [(i, "only") for i in range(4)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        got = cap_per_source(df, "doc_id", "source", cap=10, salt="x")
        assert self._rows(got) == sorted(rows)

    def test_threshold_fallback_is_exact(self, spark):
        # Adversarial: a source whose rows ALL hash above the prefilter
        # threshold, so the thinned set is empty and the fallback path must
        # rank the full source. cap=3, margin=1.05, n=4 -> t = 0.7875*2^32.
        cap, margin, salt, n = 3, 1.05, "fb", 4
        t = margin * cap / n * HASH_SPACE
        ids = [i for i in range(100_000) if md5_u32(i, salt) >= t][:n]
        assert len(ids) == n
        df = spark.createDataFrame(
            [(i, "adv") for i in ids], "doc_id long, source string"
        )
        got = cap_per_source(df, "doc_id", "source", cap=cap, salt=salt, margin=margin)
        want = sorted(ids, key=lambda i: (md5_u32(i, salt), i))[:cap]
        assert sorted(r["doc_id"] for r in got.collect()) == sorted(want)

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, "s")], "doc_id long, source string")
        with pytest.raises(ValueError):
            cap_per_source(df, "doc_id", "source", cap=0)
        with pytest.raises(ValueError):
            cap_per_source(df, "doc_id", "source", cap=1, margin=1.0)

    def test_materialize_input_identical_and_single_scan(self, spark, tmp_path):
        """r19: materialize_input=True pins the input (lazy localCheckpoint)
        so the four consumer subtrees read blocks instead of re-executing
        the input lineage — selected rows must be identical, and a parquet
        input must stop appearing as one scan node per consumer (>= 4
        without the pin, <= 1 with it; the one real scan lives inside the
        checkpoint RDD)."""
        import io
        from contextlib import redirect_stdout

        rows = (
            [(i, "hot") for i in range(200)]
            + [(1000 + i, "small") for i in range(3)]
        )
        pq = str(tmp_path / "cap_input.parquet")
        spark.createDataFrame(rows, "doc_id long, source string").write.parquet(pq)
        df = spark.read.parquet(pq)
        plain = cap_per_source(df, "doc_id", "source", cap=5, salt="m")
        pinned = cap_per_source(
            df, "doc_id", "source", cap=5, salt="m", materialize_input=True
        )
        assert self._rows(pinned) == self._rows(plain)

        def n_input_scans(d):
            buf = io.StringIO()
            with redirect_stdout(buf):
                d.explain("formatted")
            return sum(
                "cap_input.parquet" in ln
                for ln in buf.getvalue().splitlines()
                if "Location" in ln
            )

        assert n_input_scans(plain) >= 4
        assert n_input_scans(pinned) <= 1


DOCS = [
    (1, "b b a a c"),
    (2, "a c c d"),
    (3, "a b e"),
    (4, ""),
    (5, None),
]


class TestVocabEncode:
    def test_vocab_ids_deterministic(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        vocab = {
            r["token"]: (r["token_id"], r["count"])
            for r in build_vocab(df, "text").collect()
        }
        # counts: a=4, b=3, c=3, d=1, e=1 -> ids by (count desc, token asc)
        assert vocab == {
            "a": (1, 4),
            "b": (2, 3),
            "c": (3, 3),
            "d": (4, 1),
            "e": (5, 1),
        }

    def test_min_count_and_max_size(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        v2 = {r["token"] for r in build_vocab(df, "text", min_count=2).collect()}
        assert v2 == {"a", "b", "c"}
        top2 = [
            (r["token"], r["token_id"])
            for r in build_vocab(df, "text", max_size=2).orderBy("token_id").collect()
        ]
        assert top2 == [("a", 1), ("b", 2)]

    def test_encode_with_oov(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        vocab = build_vocab(df, "text", min_count=2)  # a,b,c only
        enc = encode_documents(df, "doc_id", "text", vocab, oov_id=0)
        got = {
            (r["doc_id"], r["pos"]): r["token_id"] for r in enc.collect()
        }
        # doc 2: a c c d -> 1 3 3 OOV
        assert [got[(2, p)] for p in range(4)] == [1, 3, 3, 0]
        # empty/null docs produce no rows
        assert not [k for k in got if k[0] in (4, 5)]

    def test_validation(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        with pytest.raises(ValueError):
            build_vocab(df, "text", min_count=0)
        with pytest.raises(ValueError):
            build_vocab(df, "text", max_size=0)


def py_gopher(text, cfg=GOPHER_DEFAULTS, stop=("the", "a", "of", "and", "in")):
    toks = [t for t in re.split(r"\s+", (text or "").strip()) if t]
    n = len(toks)
    out = {"n_words": n}
    mean = sum(len(t) for t in toks) / n if n else None
    sym = sum(1 for t in toks if t.startswith("#") or "..." in t) / n if n else None
    alpha = sum(1 for t in toks if re.search("[A-Za-z]", t)) / n if n else None
    nstop = sum(1 for t in toks if t.lower() in stop)
    out["rule_word_count"] = cfg["min_words"] <= n <= cfg["max_words"]
    out["rule_mean_word_len"] = (
        n > 0 and cfg["min_mean_word_len"] <= mean <= cfg["max_mean_word_len"]
    )
    out["rule_symbol_ratio"] = n > 0 and sym <= cfg["max_symbol_ratio"]
    out["rule_alpha_words"] = n > 0 and alpha >= cfg["min_alpha_word_ratio"]
    out["rule_stopwords"] = nstop >= cfg["min_stopword_hits"]
    out["kept"] = all(
        out[k]
        for k in (
            "rule_word_count",
            "rule_mean_word_len",
            "rule_symbol_ratio",
            "rule_alpha_words",
            "rule_stopwords",
        )
    )
    return out


GOPHER_DOCS = [
    (1, "the quick brown fox jumps over a lazy dog " * 5),  # kept
    (2, ""),  # empty: every rule fails
    (3, None),  # NULL == empty
    (4, "word " * 39),  # word count one under the floor
    (5, ("the a of " + "#tag ... " * 30)),  # symbol ratio fail
    (6, ("1 2 3 4 5 6 7 8 9 0 " * 10 + "the a")),  # alpha-ratio fail
    (7, ("abcdefghijklmnop " * 45 + "the a")),  # mean word len fail (high)
    (8, "the of and in a " * 10),  # all-stopword doc: kept iff others pass
]


class TestGopher:
    def test_matches_python_replay(self, spark):
        df = spark.createDataFrame(GOPHER_DOCS, "doc_id long, text string")
        got = {r["doc_id"]: r.asDict() for r in gopher_filter(df, "doc_id", "text").collect()}
        for doc_id, text in GOPHER_DOCS:
            want = py_gopher(text)
            row = got[doc_id]
            for k, v in want.items():
                assert row[k] == v, (doc_id, k, row, want)

    def test_threshold_override_and_validation(self, spark):
        df = spark.createDataFrame(GOPHER_DOCS, "doc_id long, text string")
        loose = gopher_filter(df, "doc_id", "text", min_words=1)
        assert {
            r["doc_id"] for r in loose.filter("rule_word_count").collect()
        } >= {1, 4, 8}
        with pytest.raises(ValueError):
            gopher_filter(df, "doc_id", "text", bogus=1)


class TestRepeatedSpans:
    """dedup.repeated_span_profile vs a python replay (raw grams — the
    digest path must be invisible in the output)."""

    def _replay(self, docs, gram=8, stride=4, max_docs=1):
        spans = {}
        for did, text in docs:
            t = text or ""
            offs = range(0, max(len(t) - gram, 0) + 1, stride)
            spans[did] = [t[o:o + gram] for o in offs]
        from collections import defaultdict

        grams = defaultdict(set)
        for did, gs in spans.items():
            for g in gs:
                grams[g].add(did)
        hot = {g for g, ds in grams.items() if len(ds) > max_docs}
        return {
            did: (len(gs), sum(1 for g in gs if g in hot))
            for did, gs in spans.items()
        }

    def test_matches_python_replay(self, spark):
        from elephantdb_spark.operators.dedup import repeated_span_profile

        shared = "0123456789abcdefghij"  # shared 20-char passage
        docs = [
            (1, "xx" + shared + "yy unique tail one"),
            (2, "completely different body " + shared),
            (3, "no overlap at all in this document"),
            (4, "short"),            # shorter than gram: single whole-text span
            (5, None),               # NULL text: single empty span
            (6, "no overlap at all in this document"),  # exact dup of 3
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_spans"], r["n_hot_spans"], r["hot_frac"])
            for r in repeated_span_profile(
                df, "doc_id", "text", gram_chars=8, stride=4, max_gram_docs=1
            ).collect()
        }
        want = self._replay(docs, gram=8, stride=4)
        assert set(got) == set(want)
        for did, (n, hotn) in want.items():
            gn, ghot, frac = got[did]
            assert (gn, ghot) == (n, hotn), (did, got[did], want[did])
            assert frac == hotn / n
        # every doc got a verdict row, incl. short and NULL
        assert got[4][0] == 1 and got[5][0] == 1
        # the exact-dup pair is fully hot; doc 3's spans all shared with 6
        assert got[3][1] == got[3][0]

    def test_validation(self, spark):
        from elephantdb_spark.operators.dedup import repeated_span_profile

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        import pytest as _pt
        with _pt.raises(ValueError):
            repeated_span_profile(df, "doc_id", "text", gram_chars=0)
        with _pt.raises(ValueError):
            repeated_span_profile(df, "doc_id", "text", max_gram_docs=0)

    def test_spans_materialized_once(self, spark, tmp_path):
        """r19: the digests-only spans frame is pinned (lazy
        localCheckpoint), so a parquet input must not be re-scanned per
        consumer — at most one visible scan, with the checkpoint RDD in
        the plan."""
        import io
        from contextlib import redirect_stdout

        from elephantdb_spark.operators.dedup import repeated_span_profile

        pq = str(tmp_path / "span_input.parquet")
        spark.createDataFrame(
            [(1, "abcdefghij" * 4), (2, "abcdefghij" * 4)],
            "doc_id long, text string",
        ).write.parquet(pq)
        out = repeated_span_profile(
            spark.read.parquet(pq), "doc_id", "text",
            gram_chars=8, stride=4, max_gram_docs=1,
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            out.explain("formatted")
        plan = buf.getvalue()
        n_scans = sum(
            "span_input.parquet" in ln
            for ln in plan.splitlines() if "Location" in ln
        )
        assert n_scans <= 1, plan
        assert "Scan ExistingRDD" in plan, plan


def test_cap_per_source_randomized_equivalence(spark):
    """Seeded random corpora (skewed source distribution, random caps and
    margins) always match the naive ROW_NUMBER formulation — covers
    threshold/fallback path mixes the handcrafted cases can't."""
    import random

    rng = random.Random(20260814)
    for trial in range(4):
        n = rng.randrange(50, 400)
        n_src = rng.randrange(1, 8)
        rows = [
            (rng.randrange(1_000_000), f"s{int(rng.random() ** 2 * n_src)}")
            for _ in range(n)
        ]
        rows = list({r[0]: r for r in rows}.values())  # unique ids
        cap = rng.randrange(1, 40)
        margin = rng.choice([1.001, 1.05, 1.3, 2.0])
        df = spark.createDataFrame(rows, "doc_id long, source string")
        got = sorted(
            tuple(r)
            for r in cap_per_source(
                df, "doc_id", "source", cap=cap, salt=f"t{trial}", margin=margin
            ).collect()
        )
        want = sorted(
            tuple(r) for r in naive_cap(df, "doc_id", "source", cap, f"t{trial}").collect()
        )
        assert got == want, (trial, n, cap, margin)
