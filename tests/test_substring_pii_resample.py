"""Round-5 operators: exact substring (repeated n-gram span) dedup, PII
scrubbing, and domain-temperature resampling.

The substring ops are pinned against an independent plain-Python
reimplementation (dict/list, no Spark) on a crafted corpus with planted
cross-document spans; PII regexes are asserted to behave identically in
Spark (Java regex) and DuckDB (RE2) on torture strings, since the oracle
pairing depends on the two dialects agreeing; resampling is checked for
determinism, partition independence, and the temperature-rate algebra.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from promhouse_spark.operators import dedup as D
from promhouse_spark.operators import sampling as SP
from promhouse_spark.operators import text as X

# doc 1 and 3 share a planted 10-token span (→ three 8-gram hits each);
# doc 2 is unrelated; doc 4 repeats the span INSIDE doc 1's tail to check
# within-doc occurrences count toward n_occ but not n_docs.
SPAN = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
CORPUS = [
    (1, f"start one {SPAN} end one"),
    (2, "totally unrelated words with no overlap at all here now"),
    (3, f"prefix words {SPAN} suffix"),
    (4, f"{SPAN} mid {SPAN}"),
]


def _py_grams(text: str, n: int) -> list[tuple[int, str]]:
    t = text.split(" ")
    if len(t) < n:
        return [(1, " ".join(t))]
    return [(i + 1, " ".join(t[i : i + n])) for i in range(len(t) - n + 1)]


def _py_repeated(corpus, n: int, min_docs: int):
    occ: dict[str, list[tuple[int, int]]] = {}
    for doc_id, text in corpus:
        for pos, g in _py_grams(text, n):
            occ.setdefault(g, []).append((doc_id, pos))
    return {
        g: v for g, v in occ.items() if len({d for d, _ in v}) >= min_docs
    }


def _py_removed(corpus, n: int, min_docs: int):
    """Independent span removal: keep min (doc,pos) occurrence per gram."""
    rep = _py_repeated(corpus, n, min_docs)
    starts: dict[int, set[int]] = {d: set() for d, _ in corpus}
    for g, v in rep.items():
        keeper = min(v)
        for d, p in v:
            if (d, p) != keeper:
                starts[d].add(p)
    out = {}
    for doc_id, text in corpus:
        toks = text.split(" ")
        kept = [
            t
            for i, t in enumerate(toks)
            if not any(s - 1 <= i < s - 1 + n for s in starts[doc_id])
        ]
        out[doc_id] = (" ".join(kept), len(toks) - len(kept))
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string").repartition(3)


def test_repeated_ngrams_matches_python(spark, docs):
    got = {
        r["gram"]: (r["n_docs"], r["n_occ"])
        for r in D.repeated_ngrams(docs, n=8, min_docs=2).collect()
    }
    rep = _py_repeated(CORPUS, 8, 2)
    want = {g: (len({d for d, _ in v}), len(v)) for g, v in rep.items()}
    assert got == want
    # the 10-token planted span yields exactly its 3 cross-doc 8-gram windows
    span_toks = set(SPAN.split(" "))
    assert sum(1 for g in got if set(g.split(" ")) <= span_toks) == 3


def test_repeated_ngram_spans_positions(spark, docs):
    got = {
        (r["doc_id"], r["pos"], r["gram"])
        for r in D.repeated_ngram_spans(docs, n=8, min_docs=2).collect()
    }
    rep = _py_repeated(CORPUS, 8, 2)
    want = {(d, p, g) for g, v in rep.items() for d, p in v}
    assert got == want


def test_remove_repeated_spans_matches_python(spark, docs):
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed_tokens"])
        for r in D.remove_repeated_spans(docs, n=8, min_docs=2).collect()
    }
    assert got == _py_removed(CORPUS, 8, 2)
    # the globally-first occurrence (doc 1) keeps its span verbatim
    assert SPAN in got[1][0]
    # doc 3's copy is gone
    assert SPAN not in got[3][0]
    # the unrelated doc is untouched
    assert got[2] == (CORPUS[1][1], 0)


def test_remove_repeated_spans_partition_independent(spark, docs):
    a = {tuple(r) for r in D.remove_repeated_spans(docs, n=8).collect()}
    b = {
        tuple(r)
        for r in D.remove_repeated_spans(docs.repartition(7), n=8).collect()
    }
    assert a == b


def test_span_completeness_long_span(spark):
    """A repeated span of length L ≥ n is covered end-to-end: every one of
    its tokens is removed from the non-keeper copy (n-gram detection is
    complete for spans ≥ n)."""
    span = " ".join(f"w{i}" for i in range(20))
    df = spark.createDataFrame(
        [(1, f"a b c {span}"), (2, f"{span} x y z")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in D.remove_repeated_spans(df, n=8).collect()}
    assert out[1]["n_removed_tokens"] == 0  # keeper is min (doc,pos)
    assert out[2]["clean_text"] == "x y z"
    assert out[2]["n_removed_tokens"] == 20


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

PII_TORTURE = [
    "plain words no pii",
    "mail bob.smith+tag@sub.example.org end",
    "two mails a@b.io c_d%e@f-g.co and ip 192.168.0.1",
    "acct 123456789012 short 12345678 long 123456789012345678",
    "edge 999.999.999.999 still matches shape 1.2.3.4.5 partial",
    "mixed 12345678901@host.com is an email not a number",
    "",
]


def test_scrub_pii_spark_duckdb_agree(spark):
    """The oracle pairing depends on Java regex and RE2 replacing the same
    spans — assert byte-identical scrub output and counts on torture rows."""
    df = spark.createDataFrame([(i, s) for i, s in enumerate(PII_TORTURE)], "i long, s string")
    got = {
        r["i"]: (r["clean"], r["n_email"], r["n_ipv4"], r["n_longnum"])
        for r in df.select(
            "i", X.scrub_pii("s").alias("clean"), *X.pii_counts("s")
        ).collect()
    }
    con = duckdb.connect()
    for i, s in enumerate(PII_TORTURE):
        # counts are per-class over the RAW text (as pii_counts computes
        # them); the scrub itself chains class by class
        counts = [
            con.execute(
                "SELECT len(regexp_extract_all(?, ?))", [s, pat]
            ).fetchone()[0]
            for _, pat, _ in X.PII_PATTERNS
        ]
        clean = s
        for _, pat, token in X.PII_PATTERNS:
            clean = con.execute(
                "SELECT regexp_replace(?, ?, ?, 'g')", [clean, pat, token]
            ).fetchone()[0]
        assert got[i] == (clean, *counts), f"row {i}: {got[i]} vs duck {clean}"


def test_scrub_pii_semantics(spark):
    df = spark.createDataFrame(
        [(1, "email 12345678901@host.com then bare 12345678901 done")],
        "i long, s string",
    )
    r = df.select(X.scrub_pii("s").alias("c"), *X.pii_counts("s")).first()
    # the digits inside the email scrub as <EMAIL>, the bare run as <NUM>;
    # counts are per-class on the raw text, so the email's local part also
    # counts as a longnum match (2) even though it never scrubs as one
    assert r["c"] == "email <EMAIL> then bare <NUM> done"
    assert (r["n_email"], r["n_longnum"]) == (1, 2)


# ---------------------------------------------------------------------------
# Domain-temperature resampling
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def skewed(spark):
    rows = [(i, "big") for i in range(900)] + [
        (i + 900, "mid") for i in range(90)
    ] + [(i + 990, "small") for i in range(10)]
    return spark.createDataFrame(rows, "doc_id long, source string").repartition(5)


def test_domain_rates_algebra(spark, skewed):
    rates = {r["source"]: r["rate"] for r in SP.domain_rates(skewed, alpha=0.7).collect()}
    # smallest domain keeps everything; rates strictly decrease with size
    assert rates["small"] == 1.0
    assert rates["small"] > rates["mid"] > rates["big"]
    # alpha = 1 is a no-op: every rate is 1
    flat = {r["source"]: r["rate"] for r in SP.domain_rates(skewed, alpha=1.0).collect()}
    assert set(flat.values()) == {1.0}
    # closed form: rate_g = (n_g/n_min)^(alpha-1)
    assert rates["big"] == pytest.approx((900 / 10) ** (0.7 - 1.0), abs=1e-6)


def test_domain_resample_deterministic_and_partition_independent(spark, skewed):
    a = {r["doc_id"] for r in SP.domain_resample(skewed).collect()}
    b = {r["doc_id"] for r in SP.domain_resample(skewed.repartition(13)).collect()}
    assert a == b and len(a) > 0
    # every small-domain row survives; big domain is downsampled near rate
    kept_small = [i for i in a if i >= 990]
    assert len(kept_small) == 10
    n_big = sum(1 for i in a if i < 900)
    rate_big = (900 / 10) ** (0.7 - 1.0)
    assert abs(n_big / 900 - rate_big) < 0.1


def test_domain_resample_plan_broadcasts_rates(spark, skewed):
    plan = SP.domain_resample(skewed)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


# ---------------------------------------------------------------------------
# Character-trigram LM scoring
# ---------------------------------------------------------------------------


def test_charlm_hand_computed(spark):
    import math

    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "aaab")], "doc_id long, text string"
    )
    model = X.char_ngram_model(docs, "text", n=3)
    got = {
        r["doc_id"]: (r["n_grams"], r["avg_nll"])
        for r in X.charlm_score(docs, model, n=3).collect()
    }
    # grams: doc1 → aaa, aaa; doc2 → aaa, aab; counts aaa=3, aab=1, tot=4
    nll1 = -math.log(3 / 4)
    nll2 = -(math.log(3 / 4) + math.log(1 / 4)) / 2
    assert got == {1: (2, round(nll1, 4)), 2: (2, round(nll2, 4))}
    # the doc with the rarer gram is less fluent under the model
    assert got[2][1] > got[1][1]


def test_charlm_unseen_floor(spark):
    train = spark.createDataFrame([(1, "aaaa")], "doc_id long, text string")
    test = spark.createDataFrame([(9, "zzzz")], "doc_id long, text string")
    model = X.char_ngram_model(train, "text", n=3)
    r = X.charlm_score(test, model, n=3, unseen_logp=-20.0).first()
    assert (r["doc_id"], r["n_grams"], r["avg_nll"]) == (9, 2, 20.0)


# ---------------------------------------------------------------------------
# Winnowing fingerprints
# ---------------------------------------------------------------------------


def _py_winnow(text: str, k: int, w: int) -> set[int]:
    n = len(text)
    grams = (
        [text[i : i + k] for i in range(max(n - k + 1, 1))]
        if n >= k
        else [text]
    )
    hs = []
    for g in grams:
        h = 0
        for ch in g:
            h = (h * 257 + ord(ch)) % 2147483647
        hs.append(h)
    m = len(hs)
    return {min(hs[i : i + w]) for i in range(max(m - w + 1, 1))}


def test_winnowing_matches_python_model(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "pack my box with five dozen liquor jugs"),
        (3, "hi"),  # shorter than k: single truncated gram
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(2)
    got: dict[int, set[int]] = {}
    for r in D.winnowing_fingerprints(df, k=5, w=4).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    want = {i: _py_winnow(t, 5, 4) for i, t in rows}
    assert got == want


def test_winnowing_horner_matches_per_gram_fold(spark):
    """The r11 Horner-over-shifted-slices hash path must produce the
    exact per-position hash longs of the per-gram fold it replaced —
    including the truncated-gram arm for docs shorter than k and the
    single NULL-hash row a NULL text keeps."""
    from pyspark.sql import functions as F

    rows = [
        (1, ""),
        (2, "ab"),
        (3, None),
        (4, "exactly16charsXY"),
        (5, "seventeen chars!!"),
        (6, "the quick brown fox jumps over the lazy dog" * 3),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(2)
    for k in (16, 5):
        c = F.col("text")
        grams = F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(c) - (k - 1), F.lit(1))),
            lambda i: c.substr(i, F.lit(k)),
        )
        old = (
            df.select(F.col("doc_id"), F.posexplode(grams).alias("__i", "__gram"))
            .select("doc_id", "__i", D._gram_hash(F.col("__gram")).alias("__h"))
        )
        codes = F.transform(
            F.sequence(F.lit(1), F.length(c)),
            lambda j: F.ascii(c.substr(j, F.lit(1))).cast("long"),
        )
        staged = df.select(F.col("doc_id"), c.alias("__t"), codes.alias("__cd"))
        tc = F.col("__t")
        npos = F.greatest(F.length(tc) - (k - 1), F.lit(1))
        acc = F.slice(F.col("__cd"), 1, npos)
        for j in range(1, k):
            acc = F.zip_with(
                F.slice(F.col("__cd"), j + 1, npos),
                acc,
                lambda cj, a: (a * D._WINNOW_BASE + cj) % D._WINNOW_MOD,
            )
        hashes = F.when(
            tc.isNull() | (F.length(tc) < k), F.array(D._gram_hash(tc))
        ).otherwise(acc)
        new = staged.select(F.col("doc_id"), F.posexplode(hashes).alias("__i", "__h"))
        assert sorted(map(tuple, old.collect())) == sorted(
            map(tuple, new.collect())
        ), f"hash mismatch at k={k}"


def test_winnowing_shared_substring_guarantee(spark):
    """Schleimer et al. guarantee: a shared substring of length ≥ w+k-1
    forces at least one identical selected fingerprint in both docs."""
    k, w = 5, 4
    shared = "zqxjkvbwpfmgydl_shared_block"  # length 28 ≥ w+k-1 = 8
    df = spark.createDataFrame(
        [(1, f"aaa {shared} bbb"), (2, f"ccccc {shared} d")],
        "doc_id long, text string",
    )
    pairs = D.winnowing_overlap_pairs(df, k=k, w=w, min_shared=1).collect()
    assert len(pairs) == 1 and pairs[0]["n_shared"] >= 1


def test_winnowing_hot_fingerprint_cap(spark):
    """Adversarial hot key (r11 verdict): one boilerplate block present in
    EVERY document makes its fingerprints n_docs-hot — f docs sharing a
    fingerprint produce f² join rows. With ``max_df`` the hot fingerprints
    are dropped before the self-join and the job completes with only the
    genuinely-shared (rare) overlaps; without it the semantics stay exact
    (the default, used by the declared oracle query)."""
    k, w = 5, 4
    boiler = "this_boilerplate_footer_appears_in_every_single_document"
    rare = "zqxjkvbwpfmgydl_rare_shared_block"
    rows = [
        (i, f"doc {i} unique words {i * 7919} {boiler}") for i in range(40)
    ]
    # docs 0 and 1 additionally share a rare block
    rows[0] = (0, f"{rare} {rows[0][1]}")
    rows[1] = (1, f"{rare} {rows[1][1]}")
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(4)
    # min_shared=6 ignores the up-to-4-fingerprint accidental overlaps the
    # short "doc N" prefixes create between a handful of docs; the
    # boilerplate block alone still clears it for EVERY pair in exact mode
    capped = D.winnowing_overlap_pairs(
        df, k=k, w=w, min_shared=6, max_df=0.5
    ).collect()
    # the all-docs boilerplate fingerprints are gone: the only surviving
    # pair is the rare shared block
    assert {(r["doc_a"], r["doc_b"]) for r in capped} == {(0, 1)}
    # exact mode still counts boilerplate overlap for every pair
    exact = D.winnowing_overlap_pairs(df, k=k, w=w, min_shared=6)
    assert exact.count() == 40 * 39 // 2


def test_pack_sequences_partition_independent(spark):
    from promhouse_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame(
        [(i, 10 + (i * 7) % 50) for i in range(200)], "doc_id long, n_tokens long"
    )
    a = {tuple(r) for r in pack_sequences(df, seq_len=64).collect()}
    b = {tuple(r) for r in pack_sequences(df.repartition(11), seq_len=64).collect()}
    assert a == b and len(a) > 0


def test_charlm_partition_independent(spark):
    docs = spark.createDataFrame(
        [(i, f"word{i % 7} text sample number {i}") for i in range(60)],
        "doc_id long, text string",
    )
    m1 = X.char_ngram_model(docs, "text")
    m2 = X.char_ngram_model(docs.repartition(9), "text")
    a = {tuple(r) for r in X.charlm_score(docs, m1).collect()}
    b = {tuple(r) for r in X.charlm_score(docs.repartition(5), m2).collect()}
    assert a == b and len(a) == 60
