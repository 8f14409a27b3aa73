"""Text-analysis operators over the documents table — all JVM-side
column expressions (whole-stage codegen; zero Python in the hot path).

Operators a 100 TB training-data pipeline runs per document:
  token_counts   — whitespace tokens + BPE-ish regex piece count
  token_length_percentiles — per-group exact token-count percentiles
                   (value→count map state: tiny for integer domains)
  quality_scores — length / punctuation / stopword / upper ratios + score
  lang_id        — marker-n-gram language guess (deterministic heuristic)
  fingerprints   — md5 fingerprint of whitespace/punct-normalized text
                   (md5 chosen for engine-portable oracles)
  chunk_documents — sliding context-window chunks (max_tokens, overlap)
                   of every doc: the step before embedding/packing;
                   pure explode of a per-row index sequence, no shuffle
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")

# BPE-ish pieces: runs of letters, runs of digits, single other non-space
BPE_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "ist"),
    "fr": ("le", "et", "est"),
    "es": ("el", "y", "es"),
    "zh": ("de", "shi", "le"),
}


def _null_safe_size(arr, text_col="text"):
    """size() of a split over a NULL text must be NULL, not Spark's
    sizeOfNull=-1 — the -1 corrupts downstream ratios and diverges from
    SQL engines (DuckDB len(string_split(NULL)) IS NULL)."""
    return F.when(F.col(text_col).isNotNull(), F.size(arr))


def token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_pieces): whitespace tokens and regex pieces."""
    return docs.select(
        "doc_id",
        _null_safe_size(F.split(F.trim("text"), "\\s+")).alias("n_tokens"),
        F.regexp_count("text", F.lit(BPE_PATTERN)).alias("n_pieces"),
    )


def token_length_percentiles(
    docs: DataFrame,
    probs: tuple = (0.1, 0.25, 0.5, 0.75, 0.9),
    group_col: str = "lang",
    approx: bool = False,
) -> DataFrame:
    """(group, p10..p90, n_docs): per-group EXACT linear-interpolation
    percentiles of the whitespace token count — the corpus
    length-distribution report a pipeline checks before fixing context
    lengths and packing windows ("what's the p90 doc length per
    language?").

    Exact (not approx) percentile is deliberately scale-sane HERE:
    Spark's ``percentile`` aggregates a value→count map, so per-group
    state is O(distinct values) — token counts are small integers, so
    the map stays tiny no matter how many rows stream through (100 TB
    of docs with counts < 10^6 is a <10^6-entry map per group,
    map-side combined).  ``approx=True`` makes the unbounded-domain
    trade: ``approx_percentile`` (KLL-style bounded sketch, accuracy
    10000) — per-group state is O(sketch) regardless of the value
    domain, at the cost of estimate (not interpolated-exact) outputs;
    use it when the percentile column is an unbounded double.
    NULL-text docs have NULL counts and are excluded by the aggregate
    (both engines), but still show in ``n_docs`` (COUNT(*) row count).
    Interpolation is the shared a + (b−a)·frac definition, bit-exact
    vs DuckDB ``quantile_cont`` (gated by q:length_percentiles)."""
    n_tok = _null_safe_size(F.split(F.trim("text"), "\\s+")).cast("double")
    tc = docs.select(F.col(group_col), n_tok.alias("__nt"))
    pfn = (
        (lambda c, p: F.approx_percentile(c, F.lit(p), F.lit(10000)).cast("double"))
        if approx
        else (lambda c, p: F.percentile(c, F.lit(p)))
    )
    aggs = [
        pfn("__nt", p).alias(f"p{int(round(p * 100))}") for p in probs
    ]
    return tc.groupBy(group_col).agg(*aggs, F.count("*").alias("n_docs"))


def quality_scores(docs: DataFrame) -> DataFrame:
    """Per-doc quality features + a combined [0,1]-ish score.

    score = 0.4·len_norm + 0.3·(1−punct_ratio) + 0.3·stop_ratio — a
    deterministic heuristic in the spirit of C4/Gopher quality rules.
    """
    # stacked projections so the tokenization runs ONCE per row: the
    # higher-order filter() blocks whole-stage codegen (and with it
    # runtime subexpression elimination), so a flat select would
    # re-split the text for every column that references the tokens —
    # CollapseProject correctly keeps non-cheap aliased expressions
    # un-inlined across these stages
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    toked = docs.select(
        "doc_id",
        F.length("text").alias("n_chars_m"),
        F.regexp_count("text", F.lit("[^a-zA-Z0-9\\s]")).alias("__n_punct"),
        F.col("text").isNull().alias("__null_text"),
        F.split(F.lower(F.trim("text")), "\\s+").alias("__toks"),
    )
    counts = toked.select(
        "doc_id",
        "n_chars_m",
        "__n_punct",
        F.when(~F.col("__null_text"), F.size("__toks")).alias("n_tokens"),
        F.when(
            ~F.col("__null_text"),
            F.size(F.filter("__toks", lambda x: F.array_contains(stop_arr, x))),
        ).alias("__n_stop"),
    )
    len_norm = F.least(F.col("n_chars_m") / F.lit(500.0), F.lit(1.0))
    punct_ratio = F.col("__n_punct") / F.greatest(F.col("n_chars_m"), F.lit(1))
    stop_ratio = F.col("__n_stop") / F.greatest(F.col("n_tokens"), F.lit(1))
    return counts.select(
        "doc_id",
        "n_chars_m",
        "n_tokens",
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(
            0.4 * len_norm + 0.3 * (1 - punct_ratio) + 0.3 * stop_ratio, 6
        ).alias("quality"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-word language guess: argmax of per-language marker counts,
    deterministic tie-break by language code order; 'und' when no marker
    fires."""
    scores = [
        (
            lang,
            sum(
                (F.regexp_count(F.lower("text"), F.lit(f"\\b{m}\\b")) for m in marks),
                F.lit(0),
            ),
        )
        for lang, marks in sorted(LANG_MARKERS.items())
    ]
    best = F.greatest(*[s for _, s in scores])
    guess = F.lit("und")
    # first language (in sorted order) achieving the max wins
    for lang, s in reversed(scores):
        guess = F.when(s == best, F.lit(lang)).otherwise(guess)
    guess = F.when(best == 0, F.lit("und")).otherwise(guess)
    return docs.select("doc_id", guess.alias("lang_guess"))


def fingerprint_col(text_col: str = "text"):
    """The fingerprint as a Column — md5 of lowercase text with
    punctuation stripped and whitespace collapsed — so consumers can
    attach it in-scan instead of joining the corpus back to itself."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(text_col), "[^a-z0-9 ]", ""), " +", " "
        )
    )
    return F.md5(norm)


def fingerprints(docs: DataFrame) -> DataFrame:
    """md5 of lowercase text with punctuation stripped and whitespace
    collapsed — the canonical near-exact-dedup key."""
    return docs.select("doc_id", fingerprint_col("text").alias("fingerprint"))

def _word_ngrams(n: int):
    """array<string> Column of a doc's word n-grams — ONE definition
    shared by ``top_ngrams`` and ``repetition_scores``.  Guarded by a
    ``when`` so a doc shorter than n contributes an EMPTY array (never
    a descending ``sequence``)."""
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_scores(docs: DataFrame, n: int = 2) -> DataFrame:
    """(doc_id, n_grams, n_distinct, rep_ratio): the fraction of a
    doc's word n-grams that are repeats of an earlier n-gram in the
    same doc — the Gopher-style repetition quality signal (a high
    rep_ratio marks boilerplate/spam for filtering).  rep_ratio is 0.0
    for docs with fewer than n tokens.

    Per-row JVM higher-order expressions: no explode, no shuffle — the
    n-gram array never leaves its row.  Built as THREE stacked
    projections so the gram transform and the two counts each evaluate
    ONCE per row: a single flat select would inline the (non-cheap)
    transform into every one of its ~8 references, and Catalyst's
    CollapseProject correctly declines to merge projects when that
    would duplicate expensive expressions."""
    g = docs.select("doc_id", _word_ngrams(n).alias("__grams"))
    c = g.select(
        "doc_id",
        F.size("__grams").alias("n_grams"),
        F.size(F.array_distinct("__grams")).alias("n_distinct"),
    )
    return c.select(
        "doc_id",
        "n_grams",
        "n_distinct",
        F.round(
            F.when(
                F.col("n_grams") > 0,
                (F.col("n_grams") - F.col("n_distinct")) / F.col("n_grams"),
            ).otherwise(0.0),
            6,
        ).alias("rep_ratio"),
    )


def top_ngrams(docs: DataFrame, n: int = 2, k: int = 20) -> DataFrame:
    """(ngram, cnt, rank): the k most frequent word n-grams of the
    corpus — the vocabulary/phrase-stats pass of a training-data
    pipeline.  Ties break on the n-gram string so top-k is
    deterministic.

    All JVM-side: tokens via split+filter, n-grams via a higher-order
    transform over start indices (guarded by a ``when`` so a doc
    shorter than n contributes an EMPTY array — never a descending
    ``sequence``), counts via map-side-combined groupBy, and the global
    top-k compiles to TakeOrderedAndProject (per-partition partial
    top-k; no single-partition sort)."""
    return (
        docs.select(F.explode(_word_ngrams(n)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "ngram")
        .limit(k)
        # the window runs over k rows only (post-limit) — its single
        # partition is k rows, not the corpus
        .withColumn(
            "rank", F.row_number().over(Window.orderBy(F.desc("cnt"), "ngram"))
        )
    )


def chunk_documents(
    docs: DataFrame,
    max_tokens: int = 512,
    overlap: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, chunk_index, chunk_text, n_tokens): sliding
    context-window chunks of every document — the mandatory step before
    embedding or fixed-window training when documents exceed the model
    context.  Chunk ``i`` covers whitespace tokens
    ``[i*stride, i*stride + max_tokens)`` with ``stride = max_tokens -
    overlap``; the last chunk is the first one whose window reaches the
    end of the doc, so every token lands in ≥1 chunk and consecutive
    chunks share exactly ``overlap`` tokens (except a shorter tail).

    Determinism/parity: tokens are ``split(trim(text), '\\s+')`` — the
    same tokenizer as ``token_counts`` — and the chunk count uses
    integer-exact arithmetic (``floor((n - max_tokens + stride - 1) /
    stride) + 1``), so the DuckDB oracle reproduces chunks
    bit-for-bit.  NULL and whitespace-only texts produce NO chunks (a
    chunker has nothing to embed; documented, tested).

    Scale: one scan, zero shuffle — the index sequence is a per-row
    array explode (rows multiply by ~n/stride, bytes by ~max/stride
    due to overlap); everything is JVM expression work.  Chunk output
    is bigger than its input by construction — land it, don't
    recompute it per consumer."""
    if not (0 <= overlap < max_tokens):
        raise ValueError(
            f"chunk_documents: need 0 <= overlap < max_tokens, got "
            f"overlap={overlap}, max_tokens={max_tokens}"
        )
    stride = max_tokens - overlap
    toks = F.split(F.trim("text"), r"\s+")
    base = docs.where(
        F.col("text").isNotNull() & (F.trim("text") != F.lit(""))
    ).select(id_col, toks.alias("__toks"))
    n = F.size("__toks")
    # exact for any real doc length (double division is exact < 2^52)
    n_chunks = F.when(n <= F.lit(max_tokens), F.lit(1).cast("long")).otherwise(
        F.floor((n - F.lit(max_tokens) + F.lit(stride - 1)) / F.lit(stride))
        + F.lit(1)
    )
    idx = base.select(
        id_col,
        "__toks",
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
            "chunk_index"
        ),
    )
    piece = F.slice(
        "__toks", (F.col("chunk_index") * stride + 1).cast("int"), max_tokens
    )
    return idx.select(
        F.col(id_col),
        "chunk_index",
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).alias("n_tokens"),
    )


# (name, pattern, replacement) — applied in ORDER: emails first so an
# address's dotted domain can't be half-eaten by the IP rule.  Patterns
# stay inside the regex subset Java (Spark) and RE2 (DuckDB oracle)
# implement identically: character classes, bounded repeats, \b ASCII
# word boundaries; no lookaround, no backrefs.
PII_RULES = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
)


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``text_redacted`` (every ``PII_RULES`` match replaced by its
    placeholder, rules applied in order) and ``n_pii`` (total matches,
    counted per rule on the ORIGINAL text — the audit number a
    compliance report wants, independent of replacement order).  The
    scrub-before-training step for emails / phone numbers / bare IPs.

    NULL text passes through (NULL out, 0 matches).  Idempotent: the
    placeholders contain no '@', '+d-' or dotted-quad shapes, so a
    second pass is a no-op (tested).

    Scale: pure per-row regexp expression work — one scan, zero
    shuffle, whole-stage codegen; counting re-reads the same string in
    cache.  Patterns are anchored to the Java∩RE2 common subset so the
    DuckDB oracle reproduces both columns bit-for-bit.
    """
    for c in ("text_redacted", "n_pii"):
        if c in docs.columns:
            raise ValueError(f"redact_pii: input already has column {c}")
    red = F.col(text_col)
    for _, pat, rep in PII_RULES:
        red = F.regexp_replace(red, F.lit(pat), F.lit(rep))
    n = None
    for _, pat, _ in PII_RULES:
        cnt = F.regexp_count(F.col(text_col), F.lit(pat))
        n = cnt if n is None else n + cnt
    n = F.when(F.col(text_col).isNull(), F.lit(0)).otherwise(n)
    return docs.withColumn("text_redacted", red).withColumn(
        "n_pii", n.cast("int")
    )


def adaptive_length_filter(
    docs: DataFrame, frac: float = 0.1, group_col: str = "lang"
) -> DataFrame:
    """Keep only docs whose whitespace token count is >= their group's
    exact ``frac`` percentile — "drop the shortest 10% per language",
    the adaptive form of a fixed min-length gate (a global floor
    over-prunes terse languages and under-prunes verbose ones).

    Adds ``n_tokens`` and the applied ``length_floor``.  NULL-text docs
    have NULL counts and are dropped (nothing to train on; same
    exclusion rule as ``token_length_percentiles``).  The threshold is
    the exact a+(b−a)·frac interpolated percentile, bit-identical to
    DuckDB ``quantile_cont`` (see token_length_percentiles for why
    EXACT percentile is scale-sane on bounded-integer token counts).

    Plan shape at 100 TB: the corpus aggregates map-side into one
    value→count map per group (groups = languages, a tiny frame), the
    per-group floor broadcast-joins back, and the filter is a column
    predicate — corpus shuffled zero times beyond the partial-agg
    exchange of group-count rows.
    """
    if not (0.0 <= frac < 1.0):
        raise ValueError(f"adaptive_length_filter: frac must be in [0,1), got {frac}")
    for c in ("n_tokens", "length_floor"):
        if c in docs.columns:
            raise ValueError(f"adaptive_length_filter: input already has column {c}")
    n_tok = _null_safe_size(F.split(F.trim("text"), "\\s+")).cast("double")
    withn = docs.withColumn("n_tokens", n_tok)
    floors = (
        withn.groupBy(group_col)
        .agg(F.percentile("n_tokens", F.lit(frac)).alias("length_floor"))
    )
    from pyspark.sql.functions import broadcast

    return withn.join(broadcast(floors), group_col).where(
        F.col("n_tokens") >= F.col("length_floor")
    )
