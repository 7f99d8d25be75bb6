"""Text analysis for training-data pipelines: token counting, quality scoring,
language-ID heuristic, document fingerprinting.

Everything except language-ID is pure Catalyst expressions (JVM-side,
whole-stage codegen). Language-ID scores stopword overlap per language with
built-in array functions — still no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword profiles (public common function words).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "von"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por", "con"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "pour", "dans", "ce"],
    "zh": [],  # CJK: detected by script range, not stopwords
}

TOKEN_SPLIT_RE = r"\s+"
# BPE-ish token estimator: word fragments of ≤4 chars, digits, punctuation runs
BPE_ISH_RE = r"[a-zA-Z]{1,4}|[0-9]+|[^\sa-zA-Z0-9]"


def token_count(col: Column | str) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(F.size(F.split(trimmed, TOKEN_SPLIT_RE)))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Rough BPE token estimate via regex fragment extraction (JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_RE), 0))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality signals: char/token lengths, punctuation & digit
    ratios, stopword ratio, mean word length — the usual web-corpus filters."""
    c = F.col(text_col)
    n_chars = F.length(c)
    toks = F.split(F.trim(c), TOKEN_SPLIT_RE)
    n_tokens = token_count(c)
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    return df.withColumns(
        {
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "punct_ratio": F.round(
                F.length(F.regexp_replace(c, r"[^\p{Punct}]", "")) / F.greatest(n_chars, F.lit(1)), 6
            ),
            "digit_ratio": F.round(F.length(F.regexp_replace(c, r"[^0-9]", "")) / F.greatest(n_chars, F.lit(1)), 6),
            "stopword_ratio": F.round(
                F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t))))
                / F.greatest(n_tokens, F.lit(1)),
                6,
            ),
            "mean_word_len": F.round(
                (n_chars - n_tokens + 1) / F.greatest(n_tokens, F.lit(1)), 6
            ),
        }
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite [0,1] quality score from the features (simple web-corpus
    heuristic: long enough, not punctuation/digit soup, some stopwords)."""
    feat = quality_features(df, text_col)
    len_ok = F.least(F.col("n_tokens") / F.lit(20.0), F.lit(1.0))
    punct_ok = F.lit(1.0) - F.least(F.col("punct_ratio") * 5, F.lit(1.0))
    digit_ok = F.lit(1.0) - F.least(F.col("digit_ratio") * 5, F.lit(1.0))
    return feat.withColumn(
        "quality_score", F.round((len_ok + punct_ok + digit_ok) / 3.0, 6)
    )


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Heuristic language ID: CJK script detection first, else argmax stopword
    overlap across language profiles; 'und' when nothing matches."""
    toks = F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), TOKEN_SPLIT_RE))
    scores = []
    for lang, words in STOPWORDS.items():
        if not words:
            continue
        arr = F.array(*[F.lit(w) for w in words])
        scores.append(F.struct(F.size(F.array_intersect(toks, arr)).alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    has_cjk = F.col(text_col).rlike(r"[一-鿿]")
    return df.withColumn(
        out_col,
        F.when(has_cjk, F.lit("zh")).otherwise(
            F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))
        ),
    )


def fingerprint(df: DataFrame, text_col: str = "text", shingle_k: int = 5, out_col: str = "fingerprint") -> DataFrame:
    """Deterministic 64-bit document fingerprint: min rolling-shingle hash.

    Normalizes whitespace/case, forms k-word shingles, hashes each with
    xxhash64, keeps the minimum — a 1-perm MinHash, stable under reordering of
    surrounding corpus and cheap enough for a 100 TB pass (pure codegen)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")

    # Token array bound once as a lambda variable (one-element transform =
    # Catalyst `let`); slicing a named split expression inside the
    # per-position lambda re-runs regexp+split per shingle (~8x slower).
    def min_hash(tk: Column) -> Column:
        n = F.size(tk)
        shingles = F.when(n >= shingle_k, F.transform(
            F.sequence(F.lit(0), n - shingle_k),
            lambda i: F.array_join(F.slice(tk, i + 1, shingle_k), " "),
        )).otherwise(F.array(F.array_join(tk, " ")))
        return F.array_min(F.transform(shingles, lambda s: F.xxhash64(s)))

    return df.withColumn(out_col, F.transform(F.array(F.split(norm, " ")), min_hash)[0])


# --- repetition & decontamination -------------------------------------------------
def _word_ngrams(text_col: str, n: int, distinct: bool = True) -> Column:
    """Word n-grams of the normalized text; EMPTY array for docs shorter than
    n words (a short doc cannot contain an n-gram — unlike word_shingles'
    whole-text fallback, which exists for MinHash signatures). Token array is
    bound once as a lambda variable (see dedup.word_shingles)."""
    def from_toks(tk: Column) -> Column:
        cnt = F.size(tk) - n + 1
        grams = F.transform(
            F.sequence(F.lit(0), cnt - 1),
            lambda i: F.array_join(F.slice(tk, i + 1, n), " "),
        )
        if distinct:
            grams = F.array_distinct(grams)
        return F.when(cnt >= 1, grams).otherwise(F.array().cast("array<string>"))

    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return F.transform(F.array(F.split(norm, " ")), from_toks)[0]


def repetition_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021,
    arXiv:2112.11446 §A1.1 "repetition removal", public): the fraction of
    n-gram occurrences that are repeats and the fraction taken by the single
    most frequent 2-gram. Boilerplate/looping generations score high.

    One explode + two-level hash aggregation (partial map-side combine does
    the heavy lifting; the shuffle key (doc, gram) is naturally well-spread —
    a hot DOCUMENT does not make a hot KEY). dup_3gram_frac rides the same
    shape. Rows with < n words carry no n-grams and are excluded, matching
    the usual filter semantics."""
    g2 = df.select(F.col(id_col), F.explode(_word_ngrams(text_col, 2, distinct=False)).alias("g"))
    g3 = df.select(F.col(id_col), F.explode(_word_ngrams(text_col, 3, distinct=False)).alias("g"))

    def frac(gr: DataFrame, prefix: str, with_top: bool) -> DataFrame:
        per_gram = gr.groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
        aggs = [
            F.sum("c").alias("total"),
            F.count(F.lit(1)).alias("distinct_"),
        ]
        if with_top:
            aggs.append(F.max("c").alias("top"))
        out = per_gram.groupBy(id_col).agg(*aggs)
        cols = [
            F.col(id_col),
            F.round((F.col("total") - F.col("distinct_")) / F.col("total"), 6).alias(
                f"dup_{prefix}_frac"
            ),
        ]
        if with_top:
            cols.append(F.round(F.col("top") / F.col("total"), 6).alias(f"top_{prefix}_frac"))
        return out.select(*cols)

    two = frac(g2, "2gram", with_top=True)
    three = frac(g3, "3gram", with_top=False)
    # LEFT join: a 2-word doc has defined 2-gram metrics but no 3-grams —
    # an inner join would drop maximally-repetitive short docs ("buy buy")
    # from the output entirely; its 3-gram frac is NULL (undefined), and the
    # flag treats the missing metric as not-exceeded rather than unknown
    return (
        two.join(three, id_col, "left")
        .withColumn(
            "flag_repetitive",
            (F.col("top_2gram_frac") > 0.18)
            | F.coalesce(F.col("dup_3gram_frac") > 0.30, F.lit(False)),
        )
    )


def ngram_overlap_pairs(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train/test DECONTAMINATION: (corpus doc, benchmark doc, shared n-gram
    count) for every corpus doc sharing at least one word n-gram with a
    benchmark doc — the public GPT-3 appendix-C / PaLM 13-gram overlap rule.

    Plan shape for 100 TB corpora: both sides explode their DISTINCT n-grams;
    the benchmark side (eval sets — thousands of docs) is broadcast, so the
    corpus side never shuffles — one map-side join pass over the corpus, then
    a (corpus_id, bench_id) count. Joining on the gram STRING keeps the op
    oracle-exact; at PB scale swap the key for xxhash64(gram) (collisions
    2^-64 — decontamination over-removal, never under-removal, if verified)."""
    cg = corpus.select(F.col(id_col), F.explode(_word_ngrams(text_col, n)).alias("gram"))
    bg = benchmark.select(
        F.col(id_col).alias("bench_id"), F.explode(_word_ngrams(text_col, n)).alias("gram")
    )
    return (
        cg.join(F.broadcast(bg), "gram")
        .groupBy(id_col, "bench_id")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
    )


# --- PII scrubbing -----------------------------------------------------------------
# Conservative patterns valid in BOTH Java regex (Spark) and RE2 (DuckDB
# oracle): no backreferences, no lookaround.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
}
# Opt-in extras (pass via ``patterns={**PII_PATTERNS, "phone": ...}``):
# E.164 international phone form — the '+' prefix requirement keeps the
# false-positive rate near zero (bare 7-15 digit runs are ids/serials far
# more often than phone numbers; for card numbers use scrub_card_numbers,
# whose Luhn gate handles the bare-digit case properly)
PHONE_E164_PATTERN = r"\+[1-9][0-9]{6,14}\b"


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
    token: str = "[REDACTED]",
) -> DataFrame:
    """Per-document PII detection counts + redacted text (the standard
    pre-training scrub pass: emails, IPv4s; extend via ``patterns``).

    Pure Catalyst regexp chains — map-only, codegen, no shuffle; at 100 TB
    this runs at scan speed alongside any other per-row pass."""
    pats = patterns or PII_PATTERNS
    c = F.col(text_col)
    out = df
    # Each pattern counts on the text AFTER the previous patterns' redaction,
    # mirroring the redaction chain exactly — otherwise an IPv4 inside an
    # already-redacted email address is counted twice for one [REDACTED],
    # and the counts stop describing what the scrub actually removed.
    cur = c
    for name, pat in pats.items():
        out = out.withColumn(
            f"n_{name}",
            F.when(c.isNull(), F.lit(0)).otherwise(
                F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
            ),
        )
        cur = F.regexp_replace(cur, pat, token)
    return out.withColumn(f"{text_col}_redacted", cur)


# --- URL / domain analysis ----------------------------------------------------------
# Conservative pattern valid in BOTH Java regex (Spark) and RE2 (DuckDB
# oracle): no backreferences, no lookaround. Hyphen last inside classes.
URL_PATTERN = r"https?://[A-Za-z0-9.-]+(?:/[A-Za-z0-9./?=&%_~#+-]*)?"


def extract_urls(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document URL extraction: (id, urls:array<string>, domains:
    array<string>, n_urls). Map-only Catalyst regexp — scan-speed at 100 TB.

    The domain is the authority component (host[:port]) lowercased; dedup
    within a doc is NOT applied here (n_urls counts occurrences), so
    domain_stats below can count both docs and mentions."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    urls = F.regexp_extract_all(c, F.lit(URL_PATTERN), 0)
    return df.select(
        F.col(id_col),
        urls.alias("urls"),
        F.transform(
            urls, lambda u: F.lower(F.regexp_extract(u, r"^https?://([^/]+)", 1))
        ).alias("domains"),
        F.size(urls).alias("n_urls"),
    )


def domain_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-domain corpus stats: (domain, n_docs, n_urls) — the aggregation a
    web pipeline runs before domain-level filtering (blocklists, per-domain
    caps a la C4/RefinedWeb). One exchange keyed on domain; only (id, domain)
    pairs shuffle, never text."""
    per_mention = extract_urls(df, text_col, id_col).select(
        F.col(id_col), F.explode("domains").alias("domain")
    )
    return per_mention.groupBy("domain").agg(
        F.countDistinct(id_col).alias("n_docs"),
        F.count(F.lit(1)).alias("n_urls"),
    )


def filter_blocked_domains(
    df: DataFrame,
    blocked,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop every document that links ANY blocked domain (the C4/RefinedWeb
    URL-blocklist pass). Two scale paths by blocklist size:

      * ``blocked`` as a Python list/set/tuple (≲ thousands): the lowercased
        domains inline as a literal array and the whole filter is map-only
        codegen (`arrays_overlap` on the per-doc extracted domain set) — zero
        shuffles, scan speed;
      * ``blocked`` as a DataFrame with a `domain` column (real blocklists run
        10⁵-10⁶ entries): (id, domain) mentions semi-join the BROADCAST
        blocklist, and the (small) blocked-id set subtracts from the corpus
        via anti-join — AQE picks broadcast for it at runtime when it fits;
        text never shuffles on either side.

    Documents with no URLs (or NULL text) always survive."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    if isinstance(blocked, (list, set, tuple, frozenset)):
        lit_arr = F.array(*[F.lit(d.lower()) for d in sorted(blocked)])
        domains = F.transform(
            F.regexp_extract_all(c, F.lit(URL_PATTERN), 0),
            lambda u: F.lower(F.regexp_extract(u, r"^https?://([^/]+)", 1)),
        )
        return df.filter(~F.arrays_overlap(domains, lit_arr))
    mentions = extract_urls(df, text_col, id_col).select(
        F.col(id_col), F.explode("domains").alias("domain")
    )
    bl = blocked.select(F.lower(F.col("domain")).alias("domain")).distinct()
    blocked_ids = (
        mentions.join(F.broadcast(bl), "domain", "left_semi").select(id_col).distinct()
    )
    return df.join(blocked_ids, id_col, "left_anti")


# conservative tag pattern shared by the engine and the DuckDB oracle: a '<'
# followed by a letter or '/' then anything up to the next '>' is markup;
# bare '<' (math, code) survives
_TAG_PATTERN = r"</?[A-Za-z][^>]*>"
# block-level closers/separators → newline (before the generic tag strip),
# so tag-only HTML layout still yields LINES for the line-level scrub
_BLOCK_TAG_PATTERN = r"(?i)</(?:p|div|li|ul|ol|h[1-6]|tr|table|blockquote|pre|section|article|header|footer)>|<br\s*/?>|<hr\s*/?>"
# &amp; decodes LAST: a double-escaped entity like '&amp;lt;' must come out as
# the single-decoded '&lt;', not be decoded twice into '<'
_ENTITIES = [("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]


def strip_markup(df: DataFrame, text_col: str = "text", out_col: str = "text_plain") -> DataFrame:
    """HTML/markup removal (the C4/WET extraction step for pages that arrive
    as raw HTML): drop tags, decode the six ubiquitous entities, collapse the
    resulting whitespace runs. Map-only codegen regexp chains — scan-speed at
    100 TB, zero shuffles; NULL text stays NULL.

    Deliberately conservative (a parser this is not): only `<letter…>` /
    `</…>` spans are treated as tags, so inequalities in prose/code survive.

    LINE STRUCTURE IS PRESERVED: horizontal whitespace runs collapse to one
    space and blank-line runs to one newline, but newlines survive — the
    line-level boilerplate scrub keys on lines, and collapsing '\\n' to ' '
    would fuse every page into one line and silently turn that stage into a
    no-op (clean_corpus runs strip_markup FIRST for exactly that pipeline).
    Block-level closers (</p>, </div>, <br>, ...) emit a newline so tag-only
    layout still yields lines.
    """
    c = F.col(text_col)
    out = F.regexp_replace(c, _BLOCK_TAG_PATTERN, "\n")
    out = F.regexp_replace(out, _TAG_PATTERN, " ")
    for ent, repl in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(repl))
    out = F.regexp_replace(out, r"[^\S\n]+", " ")  # collapse spaces/tabs, keep \n
    out = F.regexp_replace(out, r" ?\n ?", "\n")  # strip spaces hugging newlines
    out = F.regexp_replace(out, r"\n{2,}", "\n")
    # F.trim strips SPACES only — edge newlines (a trailing </p>) need regex
    out = F.regexp_replace(out, r"^\s+|\s+$", "")
    return df.withColumn(out_col, out)


def top_ngrams(
    df: DataFrame,
    n: int = 2,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Exact top-``k`` most frequent word ``n``-grams across the corpus —
    the vocabulary/boilerplate profile (the corpus-level companion of
    repetition_features' per-doc ratios: the same 20 header n-grams topping
    every crawl snapshot IS the boilerplate to scrub). Counts every
    OCCURRENCE (not per-doc distinct); normalization = lower + whitespace
    collapse, the corpus-wide convention (_word_ngrams). Deterministic
    tie-break: count DESC then ngram ASC, engine-portable.

    Returns (ngram, count, rank), rank 1-based, ≤ k rows.

    Scale: one map-side explode into occurrences, ONE exchange into the
    (ngram, count) grid (hot n-grams partially aggregate map-side —
    constant buffers), and a global top-k over the grid that Spark plans as
    TakeOrderedAndProject (per-task k-row partials, no full sort). The
    expensive case is the grid's cardinality — rows, not lists, spilling
    gracefully; every later step sees ≤ k rows.
    """
    from pyspark.sql import Window

    if n <= 0 or k <= 0:
        raise ValueError("n and k must be positive")
    grams = _word_ngrams(text_col, n, distinct=False)
    counts = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    order = [F.col("count").desc(), F.col("ngram").asc()]
    # rank windows over the ALREADY-limited k rows (a single tiny task),
    # never over the full grid
    return (
        counts.orderBy(*order)
        .limit(int(k))
        .withColumn("rank", F.row_number().over(Window.orderBy(*order)))
    )


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lm: DataFrame | None = None,
    floor_count: float = 0.5,
) -> DataFrame:
    """Per-document mean unigram log-probability — the corpus-statistical
    quality signal (the CCNet/KenLM language-model filter's unigram form):
    documents whose tokens are collectively improbable under the corpus's
    own unigram distribution (boilerplate symbol soup, alphabet spam,
    wrong-language fragments) score far below prose, without any of
    quality_score's hand-tuned ratio heuristics.

    ``lm`` (optional) is a reference language model as a (tok, cnt)
    DataFrame — e.g. ``unigram_lm(reference_corpus)`` — letting one clean
    corpus score another; tokens OUTSIDE the reference vocabulary get a
    floored pseudo-count of ``floor_count`` (< 1 ⇒ rarer than every
    in-vocab token). Default scores the corpus against itself (every token
    in-vocab by construction).

    Returns (id_col, n_tokens, logprob_per_token) — natural log, NULL-text
    and zero-token documents excluded (no defined score). Tokenization:
    lowercased runs of [a-z0-9] (engine-portable, replicated exactly by the
    DuckDB oracle).

    Scale: raw text never shuffles. Three constant-buffer hash-agg
    exchanges — the (id, token) term grid (well-spread key), the token
    vocabulary roll-up (hot tokens like 'the' collapse map-side), and the
    per-document score roll-up — plus one score join of the term grid
    against the vocabulary: broadcast when the vocabulary fits (usual even
    at web scale — vocab grows ~log corpus), AQE-skew-split otherwise. The
    LM total lands as one scalar on the driver (O(1), like every gate
    threshold here).
    """
    toks = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                    lambda x: x != F.lit(""),
                )
            ).alias("tok"),
        )
        # three consumers (the total collect, the doc_tf grid, the self-LM
        # vocab) would otherwise each re-scan and re-tokenize the text —
        # the duplicate_span_stats / containment_pairs caching pattern
        .localCheckpoint(eager=False)
    )
    # per-doc term counts FIRST: the join and everything after run on the
    # distinct (doc, token) grid, never on raw token occurrences
    doc_tf = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    vocab = (
        (lm if lm is not None else toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt")))
        .select("tok", F.col("cnt").cast("double").alias("cnt"))
        # read twice: the total below and the score join
        .localCheckpoint(eager=False)
    )
    total = vocab.agg(F.sum("cnt")).collect()[0][0] or 0.0
    if total <= 0:
        raise ValueError("empty language model: no tokens")
    scored = doc_tf.join(vocab, "tok", "left").withColumn(
        "logp", F.log(F.coalesce(F.col("cnt"), F.lit(float(floor_count))) / F.lit(float(total)))
    )
    return scored.groupBy(id_col).agg(
        F.sum("tf").alias("n_tokens"),
        (F.sum(F.col("tf") * F.col("logp")) / F.sum("tf")).alias("logprob_per_token"),
    )


def unigram_lm(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(tok, cnt) unigram counts of a corpus under unigram_logprob's exact
    tokenization — build once on a trusted reference corpus, persist, and
    pass as ``lm=`` to score candidate corpora against it."""
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                    lambda x: x != F.lit(""),
                )
            ).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def duplicate_span_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 13,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document CROSS-corpus span duplication: the fraction of a doc's
    distinct ``window``-word spans that also occur in ≥ ``min_docs``−1 OTHER
    documents — the Lee et al. 2022 ("Deduplicating Training Data Makes
    Language Models Better") duplicated-substring signal at word-window
    granularity. Catches what the neighbors miss: line dedup only sees
    newline-aligned repeats, repetition_features only sees WITHIN-doc
    repeats, doc-level dedup only sees whole-document similarity — a
    boilerplate paragraph pasted mid-document into thousands of pages is
    invisible to all three but dominates this fraction.

    Returns (id_col, n_spans, n_dup_spans, dup_span_fraction) for docs with
    ≥ 1 span (shorter docs have no defined fraction); spans are distinct per
    doc (within-doc repetition neither inflates a doc's own fraction nor
    double-counts in the corpus roll-up — n_docs counts DISTINCT docs).

    Scale: the line_dedup shape — only (id, xxhash64(span)) pairs ever
    shuffle (~16 bytes/span regardless of window width): one exchange into
    span doc-frequencies (map-side partials, constant buffers), a semi-join
    of the same grid against the ≥ min_docs hash set, one per-doc roll-up.
    Text never shuffles.
    """
    if window < 1 or min_docs < 2:
        raise ValueError("window must be >= 1 and min_docs >= 2")
    posts = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.explode(_word_ngrams(text_col, window, distinct=True)).alias("__g"),
        )
        .select(F.col(id_col), F.xxhash64("__g").alias("h"))
        # the dup-frequency aggregate and the per-doc semi-join both read
        # this ~16-byte/span grid; without the checkpoint each would re-scan
        # and re-explode the text
        .localCheckpoint(eager=False)
    )
    dup = (
        posts.groupBy("h")
        .agg(F.countDistinct(id_col).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("h")
    )
    flagged = posts.join(dup, "h", "left_semi").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_dup_spans")
    )
    totals = posts.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_spans"))
    return (
        totals.join(flagged, id_col, "left")
        .select(
            F.col(id_col),
            "n_spans",
            F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
            F.round(F.coalesce("n_dup_spans", F.lit(0)) / F.col("n_spans"), 6).alias(
                "dup_span_fraction"
            ),
        )
    )


# MAXIMAL digit runs with optional single space/dash separators (greedy *,
# so a 20-digit spaced serial is captured WHOLE and then rejected by the
# 13-19 length gate in luhn_valid — a bounded {12,18} pattern would instead
# backtrack to a Luhn-passing 16-digit PREFIX of the run and falsely redact
# it); \b instead of lookaround keeps the Java∩RE2 subset (oracle parity).
# Known trade: a real card embedded in a LARGER hyphenated token
# ('<card>-2024') is treated as that larger run and skipped — ambiguous
# spans are left alone rather than garbled.
CARD_CANDIDATE_PATTERN = r"\b\d(?:[ -]?\d)*\b"


def luhn_valid(cand: Column) -> Column:
    """Luhn checksum (ISO/IEC 7812, the public mod-10 construction) as a
    pure Catalyst boolean — doubling every second digit from the right,
    subtracting 9 on overflow, total ≡ 0 (mod 10). Built from nested
    higher-order array functions; no Python, no UDF."""
    digits = F.regexp_replace(cand, "[^0-9]", "")
    arr = F.filter(F.split(F.reverse(digits), ""), lambda x: x != F.lit(""))
    terms = F.transform(
        arr,
        lambda x, i: F.when(
            i % 2 == 1,
            F.when(x.cast("int") * 2 > 9, x.cast("int") * 2 - 9).otherwise(x.cast("int") * 2),
        ).otherwise(x.cast("int")),
    )
    total = F.aggregate(terms, F.lit(0), lambda acc, t: acc + t)
    return F.length(digits).between(13, 19) & (total % 10 == 0)


def scrub_card_numbers(
    df: DataFrame,
    text_col: str = "text",
    token: str = "[CARD]",
) -> DataFrame:
    """Detect and redact payment-card-shaped numbers that pass the Luhn
    checksum — the VERIFIED step a regex-only scrub (pii_scrub) cannot do:
    13-19-digit sequences are everywhere (ids, timestamps, serials), but
    only ~1 in 10 random ones satisfies mod-10, so checksum-gating cuts the
    false-redaction rate ~10x while never missing a real card number.

    Adds (n_card_numbers, <text_col>_redacted); NULL text passes through
    (count 0, redacted NULL). Map-only nested Catalyst array functions —
    scan-speed, zero shuffles, zero Python.
    """
    c = F.col(text_col)
    valid = F.filter(
        F.regexp_extract_all(c, F.lit(CARD_CANDIDATE_PATTERN), 0), luhn_valid
    )
    # \b-anchored regexp fold, NOT a raw substring replace: a validated card
    # that happens to be a SUBSTRING of some longer CONTIGUOUS digit run
    # elsewhere in the text must not mangle that run (candidates contain
    # only [0-9 -], so no regex escaping is needed). Scope: the no-mangle
    # guarantee covers contiguous runs ONLY — inside a longer space/dash-
    # SEPARATED run ('serial 99 4111 1111 1111 1111 77') the separators are
    # word boundaries, so an elsewhere-validated card embedded there IS
    # redacted. Deliberate: that direction is over-redaction, the safe
    # failure mode for a PII scrub, and the context guard that would skip it
    # needs lookaround (Java-only) or consuming context captures — outside
    # the Java∩RE2 subset the oracle-parity contract pins.
    redacted = F.aggregate(
        valid,
        c,
        lambda acc, cand: F.regexp_replace(
            acc, F.concat(F.lit(r"\b"), cand, F.lit(r"\b")), F.lit(token)
        ),
    )
    return df.withColumn(
        "n_card_numbers",
        F.when(c.isNull(), F.lit(0)).otherwise(F.size(valid)),
    ).withColumn(f"{text_col}_redacted", redacted)
