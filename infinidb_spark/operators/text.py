"""Text-analysis operators for training-data pipelines.

Language ID (stopword-hit heuristic), quality scoring (length/punct/
stopword/word-shape ratios), token counting (whitespace + BPE-ish
subword estimate), and document fingerprinting (rolling hash).  All pure
Column expressions — per-row, codegen, embarrassingly parallel; at
100 TB these are single-scan map stages with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from infinidb_spark.operators.dedup import (
    md5_hash56,
    _shingle_hash_expr,
    fan_out,
    normalize_text,
    shingle_array,
)

# Tiny stopword inventories — enough for a scoring heuristic; a real
# deployment swaps in fastText-style models via mapInPandas (see
# operators.multimodal for the batched-UDF plumbing pattern).
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "nicht"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "pour", "que"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "un", "una", "es"],
}


def tokens(col: Column) -> Column:
    return F.split(normalize_text(col), r"\s+")


def token_count(col: Column) -> Column:
    """Whitespace token count.  An empty or whitespace-only document
    counts 0 tokens: F.split('') yields [''], which must not count as
    one (the classifiers already filter _tok != '' — the counters have
    to agree with them or joined signal relations disagree per doc)."""
    return F.size(F.filter(tokens(col), lambda t: t != F.lit(""))).cast("bigint")


def subword_count(col: Column) -> Column:
    """BPE-ish subword estimate: word-boundary pieces + intra-word splits
    every ~4 chars (the empirical BPE fertility for English), plus one
    extra unit per sentence-punctuation/bracket CHARACTER (digits get
    no special handling — they count through the word path like
    letters; a '...' run costs 3, matching byte-level BPE's tendency to
    split punctuation runs)."""
    t = normalize_text(col)
    # same empty-token rule as token_count: '' contributes 0 subwords
    words = F.filter(F.split(t, r"\s+"), lambda w: w != F.lit(""))
    per_word = F.transform(
        words, lambda w: F.greatest(F.ceil(F.length(w) / 4.0), F.lit(1).cast("long"))
    )
    punct = F.length(F.regexp_replace(t, r"[^\.,;:!\?\(\)\[\]]", ""))
    return (
        F.aggregate(per_word, F.lit(0).cast("long"), lambda a, x: a + x) + punct
    ).cast("bigint")


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    sw = F.array(*[F.lit(w) for w in _STOPWORDS[lang]])
    toks = tokens(col)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def lang_id(col: Column) -> Column:
    """N-gram/stopword-heuristic language guess over the inventory above;
    'und' (undetermined) when no language clears the floor."""
    toks = tokens(col)
    n = F.greatest(F.size(toks), F.lit(1))
    scores = []
    for lang, words in _STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        scores.append(
            F.struct(
                (F.size(F.filter(toks, lambda t: F.array_contains(sw, t))) / n).alias("score"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scores))
    return F.when(best.getField("score") >= 0.05, best.getField("lang")).otherwise(F.lit("und"))


def quality_score(col: Column) -> Column:
    """Composite quality in [0,1]: length band + punctuation sanity +
    stopword presence + mean-word-length sanity.  The standard cheap
    pre-filter before expensive model-based scoring."""
    t = normalize_text(col)
    n_chars = F.length(t)
    toks = tokens(col)
    n_tok = F.greatest(F.size(toks), F.lit(1))
    mean_wlen = n_chars / n_tok
    punct_ratio = F.length(F.regexp_replace(t, r"[^\.,;:!\?]", "")) / F.greatest(n_chars, F.lit(1))
    sw_ratio = stopword_ratio(col)
    len_score = F.when(n_chars.between(100, 20000), 1.0).when(n_chars.between(20, 100), 0.5).otherwise(0.1)
    punct_score = F.when(punct_ratio.between(0.0, 0.1), 1.0).otherwise(0.3)
    sw_score = F.when(sw_ratio >= 0.05, 1.0).when(sw_ratio > 0.0, 0.5).otherwise(0.1)
    wlen_score = F.when(mean_wlen.between(2.5, 9.0), 1.0).otherwise(0.3)
    return F.round((len_score + punct_score + sw_score + wlen_score) / 4.0, 6)


def fingerprint(
    col: Column, window: int = 8, pre_normalized: bool = False, portable_hash: bool = False
) -> Column:
    """Rolling-hash document fingerprint: min xxhash64 over character
    windows (winnowing's min-selection, single window size).  Robust to
    local edits; used for cheap containment checks.

    As with shingles: pass a materialized normalized column
    (``pre_normalized=True``) or the normalization regex re-runs per
    window inside the transform.

    ``portable_hash=True``: md5-derived 56-bit window hashes instead of
    xxhash64 — reproducible as plain SQL (the oracle mode; see
    operators.dedup.minhash_lsh_pairs for the contract)."""
    t = col if pre_normalized else normalize_text(col)
    # ONE O(len) regex pass extracts every window (operators.dedup.
    # shingle_array); the per-position substring form was O(len²) per
    # doc (UTF8String substring re-walks the UTF-8 prefix per call)
    h = md5_hash56 if portable_hash else F.xxhash64
    return F.array_min(F.transform(shingle_array(t, window), lambda s: h(s)))


def analyze(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable_hash: bool = False,
) -> DataFrame:
    """One-scan text-analysis projection: all metrics per document.

    Normalized text is materialized once (``_t``); every metric reads
    the attribute, so no regex re-evaluation inside array lambdas.
    Fan-out: the per-row metric lambdas are the heavy part — spread a
    single-file corpus across cores (no-op on multi-partition input).
    """
    pre = fan_out(df).select(F.col(id_col), normalize_text(F.col(text_col)).alias("_t"))
    c = F.col("_t")
    return pre.select(
        F.col(id_col),
        token_count(c).alias("n_tokens"),
        subword_count(c).alias("n_subwords"),
        F.round(stopword_ratio(c), 6).alias("stopword_ratio"),
        lang_id(c).alias("lang_guess"),
        quality_score(c).alias("quality"),
        fingerprint(c, pre_normalized=True, portable_hash=portable_hash).alias("fingerprint"),
    )


#: PII redaction rules applied IN ORDER (email first: its pattern spans
#: dots and digits that the later numeric rules would otherwise bite
#: into).  Patterns restrict to RE2-compatible syntax (no lookaround)
#: so the same rule set runs in Spark (Java regex), DuckDB (RE2), and
#: any downstream engine.
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def scrub_pii(col: Column) -> Column:
    """Redact PII spans with typed placeholder tokens — the corpus
    sanitization stage every training-data pipeline runs before
    tokenization.  Sequential ``regexp_replace`` per rule: pure Column
    expressions, single-scan map stage, zero shuffle at any scale."""
    out = col
    for _, pat, token in PII_RULES:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_counts(col: Column) -> list[Column]:
    """Per-category redaction counts (matched on the ORIGINAL text) —
    the audit relation that goes to the pipeline's data-governance
    sink.  One ``regexp_count`` per rule, aliased ``n_<category>``."""
    return [
        F.regexp_count(col, F.lit(pat)).alias(f"n_{name}")
        for name, pat, _ in PII_RULES
    ]


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """Repetition-based quality signals per document — the
    duplicate-content filters a large-corpus curation pipeline applies
    before training (the top-ngram-share / duplicate-ngram-fraction
    family popularized by the Gopher/MassiveText quality rules):

    * ``top_ngram_share`` — occurrences of the single most frequent
      word n-gram over all n-gram occurrences (boilerplate and chant
      pages score high);
    * ``distinct_ngram_frac`` — distinct n-grams over total (templated
      or looping text scores low);
    * ``n_ngrams`` — total n-gram occurrences (the denominator, kept
      for downstream thresholding).

    Exploded formulation: n-grams become rows, both signals fall out of
    ONE ``groupBy(doc, gram)`` + ONE ``groupBy(doc)`` — two codegen'd
    aggregations with map-side partials, no window over the corpus, no
    per-row Python.  Scales as a word-count job.
    """
    # docs with fewer than n (non-empty) tokens have NO n-grams and emit
    # no row — a partial gram would score every short doc as maximally
    # repetitive (top_ngram_share 1.0) and a Gopher-style filter would
    # drop it as boilerplate despite containing no repetition
    words = F.filter(
        F.split(normalize_text(F.col(text_col)), r"\s+"),
        lambda w: w != F.lit(""),
    )
    n_pos = F.size(words) - (n - 1)
    grams = F.when(
        n_pos >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_pos, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    per_gram = (
        fan_out(df)
        .select(F.col(id_col), F.explode(grams).alias("_g"))
        .groupBy(id_col, "_g")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    return (
        per_gram.groupBy(id_col)
        .agg(
            F.sum("_c").alias("n_ngrams"),
            F.max("_c").alias("_top"),
            F.count(F.lit(1)).alias("_distinct"),
        )
        .select(
            F.col(id_col),
            "n_ngrams",
            F.round(F.col("_top") / F.col("n_ngrams"), 6).alias("top_ngram_share"),
            F.round(F.col("_distinct") / F.col("n_ngrams"), 6).alias(
                "distinct_ngram_frac"
            ),
        )
    )


def window_dup_fraction(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    portable_hash: bool = False,
):
    """Approximate SUBSTRING-level dedup signal: the fraction of each
    document's token windows (``window`` consecutive tokens) that also
    appear in ANOTHER document.

    The cleaning tier between exact dedup (whole doc) and MinHash
    (whole-doc similarity): boilerplate passages duplicated ACROSS
    otherwise-distinct documents (license headers, navigation text,
    templated paragraphs) show up here and nowhere else.  Scale shape:
    explode token windows as rows, ONE groupBy over window hashes
    collecting the distinct-doc count per window (codegen, map-side
    partial agg), join back the tiny duplicated-window set, one
    groupBy(doc) for the fraction — no text leaves the scan stage, the
    shuffles carry (hash, id) pairs.

    Returns one row for EVERY input doc: (id, n_windows, dup_windows,
    dup_fraction); docs shorter than ``window`` tokens report zero
    windows and fraction 0.0 (never omitted — a cleaning pipeline
    joining the signal back must not misread short docs as NULL).
    """
    n_win = F.greatest(F.size(F.col("_w")) - (window - 1), F.lit(0))
    # short docs emit an EMPTY array (no window rows) instead of a
    # sentinel row dropped by a `_n > 0` filter afterwards: predicate
    # pushdown inlined that filter's whole tokens() expression into the
    # scan-stage Filter below the fan_out exchange — one extra
    # normalize+split pass per row at raw-scan parallelism (same
    # pushdown-inlining disease as the ngram_jaccard inferred filter).
    # Row-for-row identical: n_win ≥ 1 docs explode to the same
    # positions, n_win = 0 docs contribute no rows either way (they
    # re-enter through the all_ids spine below).
    base = (
        fan_out(df)
        .select(F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_w"))
        .select(
            "_id",
            F.explode(
                F.when(n_win >= 1, F.sequence(F.lit(1), n_win)).otherwise(
                    F.array().cast("array<int>")
                )
            ).alias("_i"),
            "_w",
        )
    )
    win_text = F.concat_ws(" ", F.slice(F.col("_w"), F.col("_i"), window))
    h = (
        md5_hash56(win_text)
        if portable_hash
        else F.xxhash64(win_text)
    )
    hashed = base.select("_id", h.alias("_h"))
    # windows seen in >1 DISTINCT doc = cross-document boilerplate.
    # NO forced broadcast: the duplicated-window set grows with corpus
    # size on exactly the template-heavy web data this signal targets —
    # at 100 TB it can exceed the broadcast hard cap and OOM the
    # driver.  AQE still picks a broadcast join when the set really is
    # small; a shuffled marker join stays linear when it is not.
    dup_windows = (
        hashed.groupBy("_h")
        .agg(F.count_distinct("_id").alias("_docs"))
        .filter(F.col("_docs") > 1)
        .select("_h", F.lit(True).alias("_dup"))
    )
    per_doc = (
        hashed.join(dup_windows, "_h", "left")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.count("_dup").alias("dup_windows"),
        )
    )
    # every input doc gets a row; short docs → 0 windows, fraction 0.0.
    # distinct: a duplicated input id (e.g. mixture_sample epochs) must
    # not multiply the joined rows — same spine rule as classify_quality
    all_ids = df.select(F.col(id_col).alias("_id")).distinct()
    return (
        all_ids.join(per_doc, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
            F.coalesce("dup_windows", F.lit(0)).alias("dup_windows"),
            F.round(
                F.coalesce("dup_windows", F.lit(0))
                / F.greatest(F.coalesce("n_windows", F.lit(0)), F.lit(1)),
                6,
            ).alias("dup_fraction"),
        )
    )


def classifier_weights(n_buckets: int = 64) -> list[float]:
    """Deterministic demo weights for the hashed bag-of-words quality
    classifier: w[j] ∈ [-1, 1] in EXACT 1/1024 steps (binary fractions,
    so per-document weight sums are exact in float64 — no cross-engine
    accumulation drift).  A real deployment swaps in trained fastText /
    logistic-regression weights of the same shape; nothing else in the
    scoring plan changes."""
    from infinidb_spark.functions.prng import lcg_next

    out = []
    state = 0x9E3779B97F4A7C15
    for _ in range(n_buckets):
        state = lcg_next(state)
        out.append(((state % 2049) - 1024) / 1024.0)
    return out


def lang_classifier_weights(
    n_buckets: int = 256, bucket_of=None
) -> dict[str, list[float]]:
    """Per-LANGUAGE weight tables for the hashed-BoW lang-id classifier:
    deterministic LCG noise in EXACT 1/1024 steps (binary fractions, so
    per-doc sums are bit-stable across engines) plus a +0.5 boost on
    each language's stopword buckets.  ``bucket_of(word) -> int`` MUST
    be the same bucket function the scorer uses — boosts placed with
    one hash and looked up with another are pure noise; the default is
    the portable md5 bucket (replicated here in Python).  Training-free
    but genuinely discriminative; a real deployment swaps in trained
    fastText language-head weights of the same shape."""
    import hashlib

    if bucket_of is None:
        def bucket_of(word: str) -> int:
            return int(hashlib.md5(word.encode()).hexdigest()[:7], 16) % n_buckets

    out: dict[str, list[float]] = {}
    from infinidb_spark.functions.prng import LCG_MOD, lcg_next

    for li, (lang, words) in enumerate(sorted(_STOPWORDS.items())):
        state = (0xA5A5A5A5 + 7919 * li) % LCG_MOD
        w = []
        for _ in range(n_buckets):
            state = lcg_next(state)
            # noise in [-51/1024, 51/1024] (max 0.0498): STRICTLY under
            # classify_lang's default 0.05 'und' floor, so even a
            # 1-token gibberish doc whose bucket drew maximal noise
            # cannot clear the floor — only a real stopword boost
            # (+0.5) can label a language
            w.append(((state % 103) - 51) / 1024.0)
        for sw in words:
            w[bucket_of(sw)] = min(1.0, w[bucket_of(sw)] + 0.5)
        out[lang] = w
    return out


def classify_lang(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    weights: dict[str, list[float]] | None = None,
    portable_hash: bool = False,
    floor: float = 0.05,
) -> DataFrame:
    """Classifier-grade language ID: hashed bag-of-words with PER-
    LANGUAGE weight tables, argmax over languages — the same linear
    machinery as classify_quality, promoted from the stopword-hit
    heuristic (``lang_id``) to the fastText-style model shape.

    Scoring plan (all codegen, ONE shuffle): explode tokens, bucket
    each token once, look up every language's weight from its literal
    array, and mean-pool per document — the groupBy carries one partial
    sum PER LANGUAGE next to the token count, so adding languages
    widens the aggregation row, it never adds shuffles.  Argmax ties
    break to the lexicographically FIRST language (struct-max over
    (score, -rank) with ranks in sorted-language order); a best score
    under ``floor`` yields 'und'.  One row per input doc (the module's
    spine contract): an empty-token doc gets ('und', 0.0, 0)."""
    if weights is None:
        if portable_hash:
            weights = lang_classifier_weights()
        else:
            # xxhash64 buckets are JVM-only: resolve the stopword
            # buckets with ONE bounded Spark job (≤ tens of literal
            # rows — the centroid-collect contract) so the boosts land
            # where the scorer will look them up
            n_b0 = 256
            all_sw = sorted({w for ws in _STOPWORDS.values() for w in ws})
            bdf = df.sparkSession.createDataFrame(
                [(w,) for w in all_sw], "_tok string"
            )
            mapping = {
                r["_tok"]: int(r["b"])
                for r in bdf.select(
                    "_tok",
                    F.pmod(
                        _shingle_hash_expr(F.col("_tok"), False), F.lit(n_b0)
                    ).alias("b"),
                ).collect()
            }
            weights = lang_classifier_weights(n_b0, bucket_of=mapping.__getitem__)
    langs = sorted(weights)
    n_b = len(weights[langs[0]])
    bucket = F.pmod(_shingle_hash_expr(F.col("_tok"), portable_hash), F.lit(n_b))
    ex = (
        fan_out(df)
        .select(
            F.col(id_col).alias("_id"),
            F.explode(tokens(F.col(text_col))).alias("_tok"),
        )
        .filter(F.col("_tok") != "")
        .select("_id", (bucket + 1).cast("int").alias("_b"))
    )
    # INTEGER weight tables (every weight is a multiple of 1/1024, so
    # w*1024 is exact): the per-doc mean and its 6-dp rounding run in
    # exact integer arithmetic — score6 = floor((2*s*10^6 + d) / (2*d))
    # with d = 1024*n_tokens implements half-up on the TRUE rational,
    # so a genuine decimal tie (e.g. 0.0653125) rounds identically in
    # every engine (Spark's BigDecimal half-up and a binary-double
    # round() disagree on exactly those ties).  All intermediates stay
    # under 2^53, so the double division is exact and floor is safe.
    on_grid = all(
        abs(x * 1024 - round(x * 1024)) < 1e-9
        for lang in langs
        for x in weights[lang]
    )
    if on_grid:
        iw = {
            lang: [int(round(x * 1024)) for x in weights[lang]]
            for lang in langs
        }
        sums = [
            F.sum(
                F.element_at(F.array(*[F.lit(x) for x in iw[lang]]), F.col("_b"))
            ).alias(f"_s_{lang}")
            for lang in langs
        ]
        per = ex.groupBy("_id").agg(F.count(F.lit(1)).alias("n_tokens"), *sums)
        d = F.col("n_tokens") * F.lit(1024)
        scores = {
            lang: F.floor(
                (F.col(f"_s_{lang}") * F.lit(2000000) + d) / (d * F.lit(2))
            ).cast("double")
            / F.lit(1000000.0)
            for lang in langs
        }
    else:
        # CALLER-supplied weight table off the 1/1024 grid (trained
        # heads): the integer-exactness trick would QUANTIZE it —
        # small-magnitude weights collapsed to all-zero scores, every
        # doc 'und'.  Score in plain doubles like classify_quality;
        # the exact-tie-rounding guarantee applies only to the
        # built-in grid tables (document portability accordingly).
        sums = [
            F.sum(
                F.element_at(
                    F.array(*[F.lit(float(x)) for x in weights[lang]]),
                    F.col("_b"),
                )
            ).alias(f"_s_{lang}")
            for lang in langs
        ]
        per = ex.groupBy("_id").agg(F.count(F.lit(1)).alias("n_tokens"), *sums)
        scores = {
            lang: F.round(F.col(f"_s_{lang}") / F.col("n_tokens"), 6)
            for lang in langs
        }
    entries = [
        F.struct(scores[lang].alias("s"), F.lit(-rank).alias("nr"))
        for rank, lang in enumerate(langs)
    ]
    best = F.array_max(F.array(*entries))
    lang_arr = F.array(*[F.lit(lang) for lang in langs])
    per = per.select(
        "_id",
        "n_tokens",
        F.when(
            best["s"] >= floor, F.element_at(lang_arr, (-best["nr"] + 1).cast("int"))
        ).otherwise(F.lit("und")).alias("lang"),
        best["s"].alias("score"),
    )
    spine = df.select(F.col(id_col).alias("_id")).distinct()
    return (
        spine.join(per, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("lang", F.lit("und")).alias("lang"),
            F.coalesce("score", F.lit(0.0)).alias("score"),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        )
    )


def classify_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    weights: list[float] | None = None,
    portable_hash: bool = False,
) -> DataFrame:
    """Hashed bag-of-words linear quality classifier — the fastText /
    CCNet-style model-based quality filter every LLM data pipeline runs
    after the heuristic rules.

    Scoring plan (all codegen, ONE shuffle): explode tokens to rows,
    hash each token into one of ``len(weights)`` buckets, look its
    weight up in a literal array, and mean-pool per document:
    ``score = Σ w[bucket(tok)] / n_tokens``.  The output is the LINEAR
    score (monotone with the sigmoid probability) so the keep/drop
    decision ``score >= 0`` is identical to ``sigmoid(score) >= 0.5`` —
    and the comparison stays exact across engines (no transcendental).

    At 100 TB: map-side explode + hash + array lookup, one groupBy(id)
    shuffle carrying (id, partial-sum, partial-count) after partial
    aggregation — the same shape as the MinHash signature aggregation
    (operators/dedup.py), which is the proven scale path.

    ``portable_hash=True`` buckets via md5 (reproducible in any SQL
    engine — the DuckDB oracle mode); the default is xxhash64 (JVM
    codegen, the 100 TB path).  Same plan shape either way.
    """
    if weights is None:
        weights = classifier_weights()
    if not weights:
        raise ValueError("classify_quality requires a non-empty weight table")
    n_b = len(weights)
    # On the built-in 1/1024 grid the mean and its 6-dp rounding run in
    # EXACT integer arithmetic — score6 = floor((2*s*10^6 + d) / (2*d)),
    # d = 1024*n_tokens — the same formula classify_lang uses: a per-doc
    # mean landing exactly on a .5 six-decimal boundary rounds
    # IDENTICALLY in every engine, where Spark's BigDecimal half-up and
    # a multiply-by-1e6 double round() disagree (caught live at sf1:
    # doc with sw=-1640/1024, n=25 scored -0.064063 here, -0.064062 in
    # the replay).  Off-grid caller weights keep the double path.
    on_grid = all(abs(x * 1024 - round(x * 1024)) < 1e-9 for x in weights)
    if on_grid:
        w_arr = F.array(*[F.lit(int(round(x * 1024))) for x in weights])
        d = F.count(F.lit(1)) * F.lit(1024)
        score = (
            F.floor((F.sum("_w") * F.lit(2000000) + d) / (d * F.lit(2)))
            .cast("double") / F.lit(1000000.0)
        )
    else:
        w_arr = F.array(*[F.lit(float(w)) for w in weights])
        score = F.round(F.sum("_w") / F.count(F.lit(1)), 6)
    tok = F.col("_tok")
    # ONE source of truth for the portable/fast hash family
    # (dedup._shingle_hash_expr); pmod == % here since the md5-derived
    # value is non-negative, and pmod is required for xxhash64
    bucket = F.pmod(_shingle_hash_expr(tok, portable_hash), F.lit(n_b))
    scored = (
        fan_out(df)
        .select(
            F.col(id_col).alias("_id"),
            F.explode(tokens(F.col(text_col))).alias("_tok"),
        )
        .filter(tok != "")
        .select("_id", F.element_at(w_arr, (bucket + 1).cast("int")).alias("_w"))
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            score.alias("score"),
        )
    )
    # ONE ROW PER INPUT DOC (window_dup_fraction keeps the same spine
    # contract; repetition_signals is the documented EXCEPTION — docs
    # with fewer than n tokens have no n-grams and emit no row, a rule
    # its oracle replays): a doc whose normalized text tokenizes to
    # nothing still gets an explicit verdict (n_tokens=0, neutral score
    # 0.0) instead of silently vanishing, which a joining pipeline
    # would misread as NULL/unknown
    spine = df.select(F.col(id_col).alias("_id")).distinct()
    return (
        spine.join(scored, "_id", "left")
        .select(
            F.col("_id"),
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            F.coalesce(F.col("score"), F.lit(0.0)).alias("score"),
        )
        # keep derives from the ROUNDED score, so keep == (score >= 0)
        # holds exactly in the output (a raw-sum keep could disagree
        # when a tiny negative mean rounds to -0.0); the decision only
        # differs for |mean| < 5e-7 — immaterial to filtering
        .withColumn("keep", F.col("score") >= 0)
        .select(F.col("_id").alias(id_col), "n_tokens", "score", "keep")
    )
