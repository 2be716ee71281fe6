"""Text column-expression library (pure pyspark.sql.functions — no
Python row path, everything stays inside whole-stage codegen).

Used by the training-data-pipeline operators: normalization,
tokenization, shingling, rolling hashes, quality features, and a
stopword-based language-ID heuristic. Where an expression feeds the
DuckDB oracle it is built from integer/string ops with identical
semantics in both engines (e.g. the Karp-Rabin char fold instead of
engine-specific hash functions).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Karp-Rabin parameters: h*B + code mod P. P fits in 31 bits so
# h*B + 255 < 2^36 never overflows a bigint.
KR_BASE = 31
KR_MOD = (1 << 31) - 1


def normalize(col) -> Column:
    """lower + collapse whitespace + trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def words(col) -> Column:
    """Whitespace tokens of the normalized text."""
    return F.split(normalize(col), " ")


def word_set(col) -> Column:
    return F.array_distinct(words(col))


def shingles_of(ws: Column, n: int = 3) -> Column:
    """Distinct n-word shingles from an ALREADY-MATERIALIZED word
    array column. Keep the tokenization in its own projection: inside
    an interpreted lambda there is no common-subexpression
    elimination, so referencing `words(text)` directly would re-run
    the regex+split chain on every element access (quadratic blowup).
    """
    mk = F.transform(
        F.sequence(F.lit(0), F.size(ws) - n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(ws, (i + j + 1).cast("int")) for j in range(n)]),
    )
    return F.when(F.size(ws) >= n, F.array_distinct(mk)) \
            .otherwise(F.array().cast("array<string>"))


def shingles(col, n: int = 3) -> Column:
    """Distinct n-word shingles (space-joined). Empty array when the
    document has fewer than n words. Prefer shingles_of(words-column)
    in hot paths (see note there)."""
    return shingles_of(words(col), n)


def kr_hash(col) -> Column:
    """Karp-Rabin rolling hash of a string: fold over character codes
    (h*31 + ascii) mod (2^31-1). Exact-integer and expressible
    identically in DuckDB for the oracle."""
    c = F.col(col) if isinstance(col, str) else col
    chars = F.split(c, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, ch: (acc * KR_BASE + F.ascii(ch)) % KR_MOD,
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two string arrays (set semantics)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))


# --- quality / language features ---------------------------------------

# Small built-in stopword lists (public, common function words).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "una", "es", "por"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "une", "est", "pour"],
    "de": ["der", "die", "das", "und", "zu", "in", "ist", "ein", "eine", "nicht"],
}


def stopword_ratio(col, lang: str = "en") -> Column:
    ws = words(col)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.array_intersect(F.array_distinct(ws), sw))
    n = F.size(F.array_distinct(ws))
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


def stopword_ratio_of(ws: Column, lang: str = "en") -> Column:
    """Stopword ratio from a materialized word-array column (hot-path
    variant — see shingles_of for why)."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    dws = F.array_distinct(ws)
    hits = F.size(F.array_intersect(dws, sw))
    n = F.size(dws)
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


def lang_id_of(text_col: Column, ws: Column) -> Column:
    """Heuristic language ID from raw text + a materialized word
    array: CJK characters -> zh; otherwise the language whose
    stopword list overlaps the distinct-token set most (ties broken
    by fixed priority en>es>fr>de; 'und' = no signal)."""
    has_cjk = F.regexp_count(text_col, F.lit(r"[一-鿿]")) > 0
    scores = {lang: stopword_ratio_of(ws, lang) for lang in STOPWORDS}
    best = F.greatest(*scores.values())
    pick = F.lit("und")
    for lang in ["de", "fr", "es", "en"]:  # reverse priority; later wins ties
        pick = F.when(scores[lang] == best, F.lit(lang)).otherwise(pick)
    return F.when(has_cjk, F.lit("zh")).when(best <= 0, F.lit("und")).otherwise(pick)


def lang_id(col) -> Column:
    """Heuristic language ID (single-expression variant; prefer
    lang_id_of with a materialized word column in hot paths).

    Note: the synthetic test corpus draws from one vocabulary for all
    lang labels, so accuracy there is meaningless — discrimination is
    unit-tested on real multilingual snippets instead.
    """
    c = F.col(col) if isinstance(col, str) else col
    return lang_id_of(c, words(col))


def quality_features(col) -> dict[str, Column]:
    """Deterministic quality features of raw text."""
    c = F.col(col) if isinstance(col, str) else col
    ws = words(col)
    n_words = F.size(ws)
    n_chars = F.length(c)
    n_punct = F.regexp_count(c, F.lit(r"[^\w\s]"))
    n_digit = F.regexp_count(c, F.lit(r"[0-9]"))
    avg_word_len = F.when(
        n_words > 0,
        F.aggregate(ws, F.lit(0).cast("bigint"),
                    lambda acc, w: acc + F.length(w)).cast("double") / n_words,
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(F.lit(0.0))
    digit_ratio = F.when(n_chars > 0, n_digit.cast("double") / n_chars).otherwise(F.lit(0.0))
    return {
        "n_words": n_words.cast("bigint"),
        "n_chars": n_chars.cast("bigint"),
        "avg_word_len": avg_word_len,
        "punct_ratio": punct_ratio,
        "digit_ratio": digit_ratio,
        "stopword_ratio_en": stopword_ratio(col, "en"),
    }


def quality_score(col) -> Column:
    """Composite quality score in [0,1]: rewards mid-length docs and
    stopword presence, penalizes punctuation/digit noise. Pure
    arithmetic over the features (identical in the oracle)."""
    f = quality_features(col)
    length_term = F.least(f["n_words"].cast("double") / 100.0, F.lit(1.0))
    return F.round(
        0.4 * length_term
        + 0.3 * F.least(f["stopword_ratio_en"] * 5.0, F.lit(1.0))
        + 0.3 * (1.0 - F.least(f["punct_ratio"] * 10.0 + f["digit_ratio"] * 5.0, F.lit(1.0))),
        6,
    )
