"""Text-analysis operators for training-data pipelines (beyond-reference,
driver north star): token stats, quality scoring, language ID, document
fingerprinting.

All kernels are built-in-function compositions (JVM-side, whole-stage
codegen) — no Python UDFs — so they scale linearly with executors at 100 TB.
Tokenization is a plain single-space split to stay bit-identical with the
DuckDB oracle; swap ``tokens`` for a regex/BPE splitter in real pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Tiny per-language stopword lexicons for the n-gram/stopword-vote language
# ID heuristic. Deliberately minimal + deterministic.
LANG_STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "fr": ("le", "la", "les", "et", "est", "une"),
    "es": ("el", "la", "los", "y", "es", "una"),
}


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("long")


# GPT-2-style pre-tokenizer pattern, restricted to the RE2-compatible subset
# (no lookarounds) so Spark's Java regex and the DuckDB/RE2 oracle split
# text IDENTICALLY: contraction suffixes, optional-leading-space letter runs,
# digit runs, symbol runs, residual whitespace. This is the unit a BPE
# tokenizer merges within — counting these matches approximates real token
# counts far better than whitespace words (punctuation and numbers split off).
BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_pretokens(col: Column | str) -> Column:
    """All BPE pre-token matches (whitespace runs filtered out)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.regexp_extract_all(c, F.lit(BPE_PRETOKEN_RE), 0),
        lambda t: F.trim(t) != "",
    )


def bpe_pretoken_count(col: Column | str) -> Column:
    return F.size(bpe_pretokens(col)).cast("long")


def distinct_token_count(col: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(col))).cast("long")


def stopword_count(col: Column | str, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(tokens(col), lambda t: t.isin(*words))).cast("long")


def type_token_ratio(col: Column | str) -> Column:
    return F.round(distinct_token_count(col) / token_count(col), 4)


def quality_flag(
    text_col: Column | str,
    n_chars_col: Column | str,
    min_chars: int = 100,
    max_chars: int = 10_000,
    min_stop_ratio: float = 0.001,
) -> Column:
    """Boolean quality gate: length window + minimum stopword density —
    the C4/Gopher-style cheap filters, SQL-expressible."""
    nc = F.col(n_chars_col) if isinstance(n_chars_col, str) else n_chars_col
    stop_ratio = stopword_count(text_col, LANG_STOPWORDS["en"]) / token_count(text_col)
    return (
        (nc >= min_chars) & (nc <= max_chars) & (stop_ratio >= min_stop_ratio)
    ).cast("int")


def lang_id(col: Column | str) -> Column:
    """Stopword-vote language ID: the language with the highest stopword hit
    count wins; ties break by fixed language order; zero hits → 'unk'."""
    scores = [(lang, stopword_count(col, words)) for lang, words in LANG_STOPWORDS.items()]
    best = F.greatest(*[s for _, s in scores])
    expr = F.lit("unk")
    for lang, score in reversed(scores):
        expr = F.when((score == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def doc_fingerprint(col: Column | str) -> Column:
    """Order-insensitive bag-of-words fingerprint: md5 over the sorted
    distinct token list — the cheap document-identity hash for
    near-exact dedup."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(col)))))


def text_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return df.select(
        id_col,
        token_count(text_col).alias("n_tokens"),
        distinct_token_count(text_col).alias("n_distinct"),
        type_token_ratio(text_col).alias("ttr"),
    )


# ---------------------------------------------------------------------------
# PII scrubbing (beyond-reference): redaction of the mechanically-matchable
# identifier classes a pre-training corpus pass removes (emails, IPv4s, long
# account-style digit runs). Patterns are written in the common subset of
# Java regex (Spark) and RE2 (DuckDB/Go): no backrefs, no lookaround, ASCII
# word boundaries only — so the same pattern string drives both the engine
# and the oracle.
# ---------------------------------------------------------------------------

PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("longnum", r"\b[0-9]{9,18}\b", "<NUM>"),
)


def pii_counts(col: Column | str) -> list[Column]:
    """One match-count column per PII class (``n_<class>``)."""
    c = F.col(col) if isinstance(col, str) else col
    return [
        F.regexp_count(c, F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]


def scrub_pii(col: Column | str) -> Column:
    """Replace every PII match with its class token. Order matters: emails
    are scrubbed before long digit runs so an address like
    ``12345678901@host.com`` redacts as one ``<EMAIL>``, not a ``<NUM>``
    inside an email."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, token in PII_PATTERNS:
        c = F.regexp_replace(c, pat, token)
    return c


# ---------------------------------------------------------------------------
# Character-n-gram language-model scoring (beyond-reference): the
# CCNet/KenLM-shaped quality signal — score each document by the mean log
# probability of its character n-grams under a corpus-level model, and
# filter the tail. (CCNet: Wenzek et al. 2020, arXiv:1911.00359 — there a
# 5-gram KenLM; here the distributed-friendly char-trigram variant.)
# ---------------------------------------------------------------------------


def char_ngrams(col: Column | str, n: int = 3) -> Column:
    """All overlapping character n-grams of a string (shorter strings yield
    the string itself)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(c) - (n - 1), F.lit(1))),
        lambda i: c.substr(i, F.lit(n)),
    )


def char_ngram_model(
    df: DataFrame, text_col: str = "text", n: int = 3
) -> DataFrame:
    """Corpus-level character-n-gram unigram model: (gram, logp) with
    logp = ln(count / total). One explode + one keyed aggregation; the
    total is a 1-row aggregate joined back by cross join (broadcast by
    construction)."""
    grams = df.select(F.explode(char_ngrams(text_col, n)).alias("gram"))
    counts = grams.groupBy("gram").agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("tot"))
    return counts.crossJoin(F.broadcast(total)).select(
        "gram", (F.log(F.col("cnt") / F.col("tot"))).alias("logp")
    )


def charlm_score(
    df: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    unseen_logp: float = -20.0,
) -> DataFrame:
    """Per-document mean negative log probability (lower = more fluent
    under the corpus model — the CCNet head/middle/tail split key):
    (id, n_grams, avg_nll).

    The doc-side gram stream joins the model on the gram key — at corpus
    scale the model is |alphabet|^n-bounded (tiny for chars) and
    broadcastable; unseen grams take the floor ``unseen_logp``."""
    grams = df.select(
        F.col(id_col), F.explode(char_ngrams(text_col, n)).alias("gram")
    )
    scored = grams.join(F.broadcast(model), "gram", "left")
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.round(
                -F.avg(F.coalesce(F.col("logp"), F.lit(unseen_logp))), 4
            ).alias("avg_nll"),
        )
    )


def adjacent_pair_counts(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Corpus-wide adjacent-token-pair frequencies — the counting step of a
    BPE merge round (Sennrich et al. 2016), at corpus scale: one per-row
    pair expansion (no shuffle) + one keyed aggregation. (left, right,
    cnt)."""
    toks = tokens(text_col)
    # zip_with over shifted slices, not element_at(toks, i) in a transform
    # lambda: `toks` is a computed split and lambda bodies get no
    # common-subexpression elimination, so an inner reference re-splits
    # per element — O(tokens²) per document (same defect measured on the
    # DSIR featurizer at sf10)
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.struct(a.alias("left"), b.alias("right")),
    )
    return (
        df.select(F.explode(pairs).alias("p"))
        .select("p.left", "p.right")
        .groupBy("left", "right")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Per-document top-``k`` terms by tf·idf (idf = ln(N/df), raw tf) —
    the classic retrieval/keyword signal. Shape: one keyed aggregation for
    per-(doc, term) tf, one for document frequency (both map-side
    combinable), a broadcast of the 1-row corpus size, then a per-doc
    window top-k ordered (score desc, term) for a total order."""
    from pyspark.sql import Window as W

    term_rows = df.select(
        F.col(id_col), F.explode(F.array_distinct(tokens(text_col))).alias("term"),
    )
    # df counts: each (doc, term) once via the distinct explode above
    dfreq = term_rows.groupBy("term").agg(F.count("*").alias("df"))
    tf = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    n_docs = df.select(F.countDistinct(id_col).alias("n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n") / F.col("df")), 6
            ).alias("score"),
        )
    )
    w = W.partitionBy(id_col).orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "term", "score")
    )


def merge_pair_expr(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right BPE merge of one (left, right) symbol pair in a
    symbol array — Sennrich et al. 2016 semantics: [a,a,a] with pair (a,a)
    becomes [aa,a] (a merged element never re-merges in the same round).
    One JVM-side array fold per row, no Python."""
    lr = left + right
    merged_tail = lambda acc: F.concat(  # noqa: E731
        F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(lr))
    )
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            merged_tail(acc),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_vocab(
    df: DataFrame, text_col: str = "text", word_counts: DataFrame | None = None
) -> DataFrame:
    """The BPE training state: distinct words with corpus counts and their
    initial symbol arrays (characters + a final ``</w>`` end-of-word
    marker). Training iterates over THIS frame, never the corpus — the
    word-frequency table is Zipf-bounded (millions of rows at 100 TB, vs
    trillions of tokens), which is what makes driver-looped BPE tractable
    at scale (the fastBPE/Sennrich formulation).

    ``word_counts`` (a ``(w, cnt)`` frame) lets a caller that already
    aggregated the corpus's word frequencies — e.g. a pipeline that needs
    per-source counts anyway — hand them in, skipping this function's
    token explode (one full corpus tokenize+shuffle). Counts must be the
    same integers the explode would produce; downstream merges depend on
    nothing else."""
    words = word_counts if word_counts is not None else (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    chars = F.transform(
        F.sequence(F.lit(1), F.length("w")),
        lambda i: F.col("w").substr(i, F.lit(1)),
    )
    return words.select(
        "w", "cnt", F.concat(chars, F.array(F.lit("</w>"))).alias("syms")
    )


def bpe_pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent symbol-pair counts over the weighted word vocabulary — the
    argmax input of one BPE merge round. (left, right, cnt), exact BIGINT
    counts so the argmax is engine-deterministic."""
    pairs = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("syms") - 1, F.lit(0))),
        lambda i: F.struct(
            F.element_at("syms", i).alias("left"),
            F.element_at("syms", i + 1).alias("right"),
        ),
    )
    return (
        vocab.select(F.explode(pairs).alias("p"), "cnt")
        .groupBy("p.left", "p.right")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    checkpoint_every: int = 8,
    word_counts: DataFrame | None = None,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Iterative BPE tokenizer induction (Sennrich et al. 2016): K driver
    iterations, each one keyed pair-count aggregation + a 1-row argmax
    collect + a distributed symbol-array merge fold. Ties on the count
    break (left, right) lexicographically so the merges list is
    deterministic across engines and partitionings.

    Returns (merges, final_vocab): merges as (step, left, right, count)
    with the count measured BEFORE that merge was applied; final_vocab is
    the symbolized word frame after all merges (the tokenizer's word
    segmentation), materialized. Lineage is truncated (and the frame
    re-anchored) every ``checkpoint_every`` rounds — K nested folds would
    otherwise grow the plan unboundedly. Between anchors the merge folds
    stay LAZY: each step's argmax action re-derives ≤ ``checkpoint_every``
    array folds from the persisted anchor, which is cheaper than the
    previous per-step ``persist()+count()`` materialization — that shape
    ran a SECOND action and a full cache write of the word table every
    step for folds the next aggregation re-runs in-line anyway (r12,
    measured: the 8-step loop spent ~half its wall time in those
    materialization jobs). ``word_counts`` is forwarded to
    :func:`bpe_vocab` (pre-aggregated ``(w, cnt)`` — skips the corpus
    tokenize when the caller has one)."""
    vocab = bpe_vocab(df, text_col, word_counts=word_counts).persist()
    anchor = vocab  # the persisted frame the lazy fold chain re-derives from
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        top = (
            bpe_pair_counts(vocab)
            .orderBy(F.desc("cnt"), "left", "right")
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, c = top[0]["left"], top[0]["right"], top[0]["cnt"]
        merges.append((step, l, r, c))
        vocab = vocab.select(
            "w", "cnt", merge_pair_expr(F.col("syms"), l, r).alias("syms")
        )
        if step % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=True)
            anchor.unpersist()
            anchor = vocab
    if vocab is not anchor:
        # preserve the return contract: final_vocab is materialized and
        # self-contained (callers iterate/join it repeatedly)
        vocab = vocab.localCheckpoint(eager=True)
        anchor.unpersist()
    return merges, vocab


# ---- learned quality classifier (model-based curation filtering) ----------


def quality_features(text_col="text", n_chars_col="n_chars") -> list:
    """The feature vector for model-based quality scoring, as EXACT column
    expressions a SQL engine reproduces bit-for-bit from the same rows:
    scaled length, scaled token count, type-token ratio, and English
    stopword density — all integer-derived rationals, no floating noise.
    Order is the model's coefficient order."""
    nc = F.col(n_chars_col) if isinstance(n_chars_col, str) else n_chars_col
    return [
        (nc / F.lit(1000.0)),
        (token_count(text_col) / F.lit(100.0)),
        (distinct_token_count(text_col) / token_count(text_col)),
        (
            stopword_count(text_col, LANG_STOPWORDS["en"])
            / token_count(text_col)
        ),
    ]


def train_quality_model(
    df: DataFrame,
    text_col: str = "text",
    n_chars_col: str = "n_chars",
    max_iter: int = 25,
    reg_param: float = 0.1,
) -> tuple[float, list[float]]:
    """Fit a logistic regression that LEARNS the cheap heuristic quality
    gate (quality_flag) from the corpus — the model-based stand-in
    production pipelines use where the teacher is human/LLM labels. The
    fit is MLlib (distributed, deterministic LBFGS); scoring is plain
    column arithmetic over :func:`quality_features`, so a persisted
    (intercept, weights) row set makes the scorer replayable by any SQL
    engine. Returns (intercept, [w_0..w_3])."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    feats = quality_features(text_col, n_chars_col)
    data = df.select(
        quality_flag(text_col, n_chars_col).cast("double").alias("label"),
        array_to_vector(
            F.array(*[f.cast("double") for f in feats])
        ).alias("features"),
    )
    model = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, standardization=True
    ).fit(data)
    return float(model.intercept), [float(w) for w in model.coefficients]


def quality_score(
    intercept: float,
    weights: list[float],
    text_col: str = "text",
    n_chars_col: str = "n_chars",
) -> tuple:
    """(linear_term, probability) columns for the fitted model — the linear
    term is the replayable decision value (p >= 0.5 ⇔ linear >= 0, exact
    on both engines; the sigmoid itself can differ in the final ulp of
    exp)."""
    feats = quality_features(text_col, n_chars_col)
    linear = F.lit(float(intercept))
    for w, f in zip(weights, feats):
        linear = linear + F.lit(float(w)) * f
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-linear))
    return linear, prob


# --------------------------------------------------- Gopher quality rules

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_signals(
    df: DataFrame, text_col: str = "text", id_cols: Sequence[str] = ("doc_id",)
) -> DataFrame:
    """The Gopher corpus-filtering rule set (Rae et al. 2021, Appendix A)
    as pure column expressions — one projection, no shuffle, no UDF; each
    signal is a per-document rational so a SQL engine reproduces it
    bit-for-bit.

    Signals: word count, mean word length, symbol-to-word ratio
    (``#``/ellipsis), bullet-start and ellipsis-end line fractions,
    alphabetic-word fraction, Gopher-stopword hits, duplicate line /
    paragraph fractions, duplicate-line character fraction. ``gopher_pass``
    applies the paper's thresholds."""
    t = F.col(text_col)
    words = F.filter(F.split(t, r"\s+"), lambda w: F.length(w) > 0)
    n_words = F.size(words)
    word_chars = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    mean_word_len = word_chars / n_words
    n_symbols = (
        F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    ) + F.floor(
        (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3
    ).cast("int")
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    # count stopwords PRESENT (filter+contains, not array_intersect, so a
    # SQL replay needs no engine-specific dedup semantics)
    lower_words = F.transform(words, F.lower)
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
            lambda s: F.array_contains(lower_words, s),
        )
    )
    lines = F.filter(F.split(t, "\n"), lambda l: F.length(F.trim(l)) > 0)
    n_lines = F.size(lines)
    bullet_lines = F.size(
        F.filter(
            lines,
            lambda l: F.trim(l).startswith("- ")
            | F.trim(l).startswith("* ")
            | F.trim(l).startswith("•"),
        )
    )
    ellipsis_lines = F.size(F.filter(lines, lambda l: F.trim(l).endswith("...")))
    line_chars = F.aggregate(lines, F.lit(0), lambda acc, l: acc + F.length(l))
    dist_lines = F.array_distinct(lines)
    dist_line_chars = F.aggregate(
        dist_lines, F.lit(0), lambda acc, l: acc + F.length(l)
    )
    paras = F.filter(F.split(t, r"\n\n+"), lambda p: F.length(F.trim(p)) > 0)
    n_paras = F.size(paras)
    dup_para_frac = (n_paras - F.size(F.array_distinct(paras))) / n_paras

    sig = df.select(
        *id_cols,
        n_words.alias("n_words"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(n_symbols / n_words, 6).alias("symbol_ratio"),
        F.round(bullet_lines / n_lines, 6).alias("bullet_line_frac"),
        F.round(ellipsis_lines / n_lines, 6).alias("ellipsis_line_frac"),
        F.round(alpha_words / n_words, 6).alias("alpha_word_frac"),
        stop_hits.alias("stop_hits"),
        F.round((n_lines - F.size(dist_lines)) / n_lines, 6).alias(
            "dup_line_frac"
        ),
        F.round(dup_para_frac, 6).alias("dup_para_frac"),
        F.round((line_chars - dist_line_chars) / line_chars, 6).alias(
            "dup_line_char_frac"
        ),
    )
    passes = (
        (F.col("n_words") >= 50)
        & (F.col("n_words") <= 100_000)
        & (F.col("mean_word_len") >= 3)
        & (F.col("mean_word_len") <= 10)
        & (F.col("symbol_ratio") <= 0.1)
        & (F.col("bullet_line_frac") <= 0.9)
        & (F.col("ellipsis_line_frac") <= 0.3)
        & (F.col("alpha_word_frac") >= 0.8)
        & (F.col("stop_hits") >= 2)
        & (F.col("dup_line_frac") <= 0.3)
        & (F.col("dup_para_frac") <= 0.3)
        & (F.col("dup_line_char_frac") <= 0.2)
    )
    return sig.withColumn("gopher_pass", passes)
