"""Text-analysis scalar functions for the training-data pipeline layer
(task brief: language-ID, quality scoring, token counting, fingerprinting).

All native Column expressions, each with an exact DuckDB SQL mirror used by
the oracle checks. Scores are rounded where they feed value-hash compares so
Spark/DuckDB double formatting cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword sets for the n-gram-free language heuristic.
# Deliberately small + deterministic; at 100 TB these live in one broadcast
# literal array (no shuffle, no dim join needed).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "is", "in", "it", "that", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour"],
    "es": ["el", "la", "los", "las", "es", "un", "una", "que", "de", "por"],
}


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def token_count(col: Column | str) -> Column:
    """Whitespace token count; 0 for empty/blank strings."""
    c = F.trim(_col(col))
    return F.when(c == "", F.lit(0)).otherwise(F.size(F.split(c, r"\s+")))


def regex_token_count(col: Column | str) -> Column:
    """BPE-ish token count: word runs + single non-space punctuation."""
    return F.regexp_count(_col(col), F.lit(r"[A-Za-z0-9_]+|[^\sA-Za-z0-9_]"))


def _word_hits(c: Column, words: list[str]) -> Column:
    """Count how many words of ``words`` appear (as whole tokens) in text."""
    padded = F.concat(F.lit(" "), F.lower(c), F.lit(" "))
    hits = F.lit(0)
    for w in words:
        hits = hits + F.when(padded.contains(f" {w} "), 1).otherwise(0)
    return hits


def language_id(col: Column | str) -> Column:
    """Heuristic language ID.

    CJK character share > 0.15 → 'zh'; otherwise the language whose stopword
    set has the most whole-token hits (ties broken en > de > fr > es by the
    CASE order); no hits → 'und'.
    """
    c = _col(col)
    cjk = F.length(F.regexp_replace(c, r"[^一-鿿]", ""))
    total = F.greatest(F.length(c), F.lit(1))
    hits = {lang: _word_hits(c, ws) for lang, ws in STOPWORDS.items()}
    best = F.greatest(*hits.values())
    lang = (
        F.when(cjk / total > 0.15, F.lit("zh"))
        .when(best == 0, F.lit("und"))
        .when(hits["en"] == best, F.lit("en"))
        .when(hits["de"] == best, F.lit("de"))
        .when(hits["fr"] == best, F.lit("fr"))
        .otherwise(F.lit("es"))
    )
    return lang


def quality_score(col: Column | str) -> Column:
    """Document quality in [0,1]: length band + alpha ratio + stopword ratio
    + mean token length band. Rounded to 4dp (oracle-hash safe)."""
    c = _col(col)
    n_chars = F.length(c)
    n_tokens = token_count(c)
    alpha = F.length(F.regexp_replace(c, r"[^A-Za-z一-鿿]", ""))
    alpha_ratio = alpha / F.greatest(n_chars, F.lit(1))
    stop_hits = _word_hits(c, STOPWORDS["en"])
    stop_ratio = stop_hits / F.greatest(n_tokens, F.lit(1))
    mean_tok = n_chars / F.greatest(n_tokens, F.lit(1))

    len_band = (
        F.when(n_chars < 20, 0.0)
        .when(n_chars < 100, 0.5)
        .when(n_chars <= 20000, 1.0)
        .otherwise(0.5)
    )
    tok_band = F.when((mean_tok >= 3.0) & (mean_tok <= 12.0), 1.0).otherwise(0.5)
    score = (
        len_band * 0.3
        + alpha_ratio * 0.3
        + F.least(stop_ratio * F.lit(4.0), F.lit(1.0)) * 0.2
        + tok_band * 0.2
    )
    return F.round(score, 4)


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the whitespace-collapsed,
    lowercased text (md5 matches bit-for-bit across Spark and DuckDB)."""
    c = F.regexp_replace(F.lower(F.trim(_col(col))), r"\s+", " ")
    return F.md5(c)


def shingles(col: Column | str, k: int = 3) -> Column:
    """Word k-gram shingle array (for MinHash / Jaccard dedup). Built with
    higher-order functions: tokens -> transform(index -> slice-join)."""
    toks = F.split(F.trim(_col(col)), r"\s+")
    n = F.size(toks)
    make = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.array_join(F.slice(toks, i, k), " "),
    )
    # sequence(1, m) counts DOWN when m < 1 — guard short docs to [].
    return F.when(n >= k, make).otherwise(F.array().cast("array<string>"))


# ---- DuckDB SQL mirrors ----------------------------------------------------

def duckdb_token_count(col: str) -> str:
    return (
        f"CASE WHEN trim({col}) = '' THEN 0 "
        f"ELSE len(regexp_split_to_array(trim({col}), '\\s+')) END"
    )


def duckdb_regex_token_count(col: str) -> str:
    return f"len(regexp_extract_all({col}, '[A-Za-z0-9_]+|[^\\sA-Za-z0-9_]'))"


def duckdb_word_hits(col: str, words: list[str]) -> str:
    padded = f"(' ' || lower({col}) || ' ')"
    terms = " + ".join(
        f"(CASE WHEN contains({padded}, ' {w} ') THEN 1 ELSE 0 END)" for w in words
    )
    return f"({terms})"


def duckdb_language_id(col: str) -> str:
    cjk = f"len(regexp_replace({col}, '[^一-鿿]', '', 'g'))"
    total = f"greatest(len({col}), 1)"
    hits = {l: duckdb_word_hits(col, ws) for l, ws in STOPWORDS.items()}
    best = f"greatest({hits['en']}, {hits['de']}, {hits['fr']}, {hits['es']})"
    return (
        f"CASE WHEN {cjk}::DOUBLE / {total} > 0.15 THEN 'zh' "
        f"WHEN {best} = 0 THEN 'und' "
        f"WHEN {hits['en']} = {best} THEN 'en' "
        f"WHEN {hits['de']} = {best} THEN 'de' "
        f"WHEN {hits['fr']} = {best} THEN 'fr' "
        f"ELSE 'es' END"
    )


def duckdb_quality_score(col: str) -> str:
    n_chars = f"len({col})"
    n_tokens = duckdb_token_count(col)
    alpha = f"len(regexp_replace({col}, '[^A-Za-z一-鿿]', '', 'g'))"
    stop_hits = duckdb_word_hits(col, STOPWORDS["en"])
    return (
        "round("
        f"(CASE WHEN {n_chars} < 20 THEN 0.0 WHEN {n_chars} < 100 THEN 0.5 "
        f" WHEN {n_chars} <= 20000 THEN 1.0 ELSE 0.5 END) * 0.3 "
        f"+ ({alpha}::DOUBLE / greatest({n_chars},1)) * 0.3 "
        f"+ least(({stop_hits}::DOUBLE / greatest({n_tokens},1)) * 4.0, 1.0) * 0.2 "
        f"+ (CASE WHEN {n_chars}::DOUBLE / greatest({n_tokens},1) BETWEEN 3.0 AND 12.0 "
        f"   THEN 1.0 ELSE 0.5 END) * 0.2"
        ", 4)"
    )


def duckdb_fingerprint(col: str) -> str:
    return f"md5(regexp_replace(lower(trim({col})), '\\s+', ' ', 'g'))"
