"""Text analysis over document tables: tokenization, quality scoring,
language ID, fingerprinting.

All of it is JVM-side built-ins (``F.split`` / ``F.filter`` / regex /
``F.md5``) — no Python in the hot path, so the scan → score pipeline stays
inside whole-stage codegen and scales linearly with executors. Designed for
the ``documents`` table (doc_id, text, lang, source, n_chars) but any
string column works.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: token = maximal run of lowercase alphanumerics (language-neutral,
#: BPE-ish pre-tokenization boundary). Keep in sync with the DuckDB oracle
#: expression `string_split_regex(lower(text), '[^a-z0-9]+')`.
TOKEN_SPLIT_RE = '[^a-z0-9]+'

#: small built-in stopword list used by quality scoring (English core).
STOPWORDS = ('the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'it',
             'on', 'for', 'with', 'as', 'by', 'at', 'this', 'that')


def tokens(col: Column | str) -> Column:
    """Array of lowercase tokens, empties removed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda x: x != '')


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def stopword_ratio(col: Column | str, stopwords=STOPWORDS) -> Column:
    """Fraction of tokens that are stopwords (0 for empty docs)."""
    t = tokens(col)
    sw = F.array(*[F.lit(s) for s in stopwords])
    hits = F.size(F.filter(t, lambda x: F.array_contains(sw, x)))
    return F.when(F.size(t) > 0, hits / F.size(t)).otherwise(F.lit(0.0))


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are not [a-z0-9 ] after lowercasing."""
    c = F.col(col) if isinstance(col, str) else col
    low = F.lower(c)
    kept = F.length(F.regexp_replace(low, '[^a-z0-9 ]', ''))
    return F.when(F.length(low) > 0,
                  (F.length(low) - kept) / F.length(low)).otherwise(F.lit(0.0))


def mean_token_len(col: Column | str) -> Column:
    t = tokens(col)
    total = F.aggregate(F.transform(t, F.length), F.lit(0), lambda acc, x: acc + x)
    return F.when(F.size(t) > 0, total / F.size(t)).otherwise(F.lit(0.0))


def quality_score(col: Column | str) -> Column:
    """Heuristic [0,1] quality score for training-data filtering, in the
    spirit of Gopher/C4 rules (published heuristics): prefer docs with
    20-1000 tokens, moderate stopword presence, low punctuation noise,
    mean token length 3-10. Pure JVM expression."""
    n = token_count(col).cast('double')
    length_ok = F.when((n >= 20) & (n <= 1000), F.lit(1.0)) \
                 .otherwise(F.least(n / F.lit(20.0), F.lit(1.0)))
    sw = stopword_ratio(col)
    sw_ok = F.when(sw > 0.01, F.lit(1.0)).otherwise(F.lit(0.5))
    p = punct_ratio(col)
    punct_ok = F.lit(1.0) - F.least(p * 2, F.lit(1.0))
    mtl = mean_token_len(col)
    mtl_ok = F.when((mtl >= 3) & (mtl <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    return (length_ok * 0.4 + sw_ok * 0.2 + punct_ok * 0.2 + mtl_ok * 0.2)


#: language marker stopwords: (lang, [markers]). Checked in order; the
#: language with the most distinct marker hits wins, ties broken by list
#: order; no hits -> 'und' (undetermined). Same contract as fastText-style
#: n-gram ID, reduced to a deterministic, SQL-expressible core.
LANG_MARKERS = [
    ('en', ['the', 'and', 'of', 'is', 'to']),
    ('de', ['der', 'die', 'das', 'und', 'ist']),
    ('fr', ['le', 'la', 'et', 'les', 'est']),
    ('es', ['el', 'los', 'las', 'es', 'una']),
]


def lang_id(col: Column | str) -> Column:
    """Marker-stopword language ID ('en'/'de'/'fr'/'es'/'und')."""
    t = tokens(col)
    scores = []
    for lang, markers in LANG_MARKERS:
        arr = F.array(*[F.lit(m) for m in markers])
        scores.append((lang, F.size(F.filter(F.array_distinct(t),
                                             lambda x: F.array_contains(arr, x)))))
    best = scores[0][1]
    for _, s in scores[1:]:
        best = F.greatest(best, s)
    expr = F.lit('und')
    for lang, s in reversed(scores):  # earlier langs win ties
        expr = F.when((s == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the whitespace-normalized
    lowercase text. The exact-dedup key."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.regexp_replace(F.trim(F.lower(c)), r'\s+', ' '))


def analyze(df: DataFrame, text_col: str = 'text') -> DataFrame:
    """Attach the full text-analysis column set in one projection."""
    c = F.col(text_col)
    return df.withColumns({
        'n_tokens': token_count(c),
        'stopword_ratio': stopword_ratio(c),
        'punct_ratio': punct_ratio(c),
        'mean_token_len': mean_token_len(c),
        'quality': quality_score(c),
        'lang_pred': lang_id(c),
        'fingerprint': fingerprint(c),
    })
