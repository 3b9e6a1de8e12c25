"""Text analysis as native column expressions.

Language-ID, quality scoring, token counting, normalization and
shingling for a web-text corpus — the training-data-pipeline layer on
top of the ER engine. All JVM-side; no UDFs here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _c(col: ColumnOrName) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_name(col: ColumnOrName) -> Column:
    """Canonical blocking form of a person name: lowercase, strip year
    ranges / digits / punctuation / date-qualifier words, collapse
    whitespace. The analogue of the reference's md5-of-string dedup
    identity applied to names (reference src/preprocessing.py:139-151
    lowercase + hash). Date qualifiers (approximately/circa/born/...)
    carry zero identity signal and would otherwise dominate n-gram
    similarity between unrelated names."""
    c = F.lower(_c(col))
    # 'b. 1840' / 'd. 1901' only count as born/died when followed by a
    # year — a bare 'B.' is somebody's initial and must survive
    c = F.regexp_replace(c, r"\b(b|d|born|died)\.?\s+(?=\d)", " ")
    c = F.regexp_replace(c, r"\b(approximately|circa|ca|active|fl|or)\b\.?", " ")
    c = F.regexp_replace(c, r"\d+", " ")
    c = F.regexp_replace(c, r"[^\p{L}\s]", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def tokens(col: ColumnOrName) -> Column:
    """Lowercased word tokens (array<string>), empty tokens removed.
    array_remove (codegen'd) instead of a filter() lambda: split's only
    degenerate outputs are empty strings, and interpreted higher-order
    functions contend under many executor threads."""
    arr = F.split(F.lower(_c(col)), r"\W+")
    return F.array_remove(arr, "")


def char_shingles(col: ColumnOrName, n: int = 3) -> Column:
    """Character n-gram shingle set (array<string>) via sequence +
    transform — fully codegen'd, no UDF. Strings shorter than n yield
    a single shingle (the whole string); NULL stays NULL."""
    c = _c(col)
    last_start = F.greatest(F.length(c) - (n - 1), F.lit(1))
    idx = F.sequence(F.lit(1), last_start)
    return F.array_distinct(F.transform(idx, lambda i: F.substring(c, i, F.lit(n))))


def whitespace_token_count(col: ColumnOrName) -> Column:
    return F.size(tokens(col)).cast("bigint")


def bpe_ish_token_count(col: ColumnOrName) -> Column:
    """Approximate subword token count: words + punctuation marks +
    digit runs, the usual 'BPE-ish' regex proxy."""
    c = _c(col)
    return (
        F.coalesce(F.regexp_count(c, F.lit(r"\w+|[^\w\s]")), F.lit(0))
    ).cast("bigint")


def punct_ratio(col: ColumnOrName) -> Column:
    c = _c(col)
    n = F.length(c)
    return F.when(n > 0, F.regexp_count(c, F.lit(r"[^\w\s]")).cast("double") / n).otherwise(F.lit(0.0))


def digit_ratio(col: ColumnOrName) -> Column:
    c = _c(col)
    n = F.length(c)
    return F.when(n > 0, F.regexp_count(c, F.lit(r"\d")).cast("double") / n).otherwise(F.lit(0.0))


def mean_word_len(col: ColumnOrName) -> Column:
    t = tokens(col)
    total = F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x))
    return F.when(F.size(t) > 0, total.cast("double") / F.size(t)).otherwise(F.lit(0.0))


_EN_STOPWORDS = (
    "the of and to in a is that it for on with as was at by an be this are from or "
    "which you not have has had but his her they we their"
).split()


def stopword_ratio(col: ColumnOrName, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or _EN_STOPWORDS
    t = tokens(col)
    hits = F.size(F.filter(t, lambda x: x.isin(sw)))
    return F.when(F.size(t) > 0, hits.cast("double") / F.size(t)).otherwise(F.lit(0.0))


def quality_score(col: ColumnOrName) -> Column:
    """Composite document-quality heuristic in [0,1]: rewards
    stopword presence and sane word lengths, penalizes punctuation and
    digit noise. Deterministic, fully expression-based."""
    q = (
        F.lit(0.25) * F.least(stopword_ratio(col) * 4.0, F.lit(1.0))
        + F.lit(0.25) * F.when((mean_word_len(col) >= 3) & (mean_word_len(col) <= 10), 1.0).otherwise(0.0)
        + F.lit(0.25) * (F.lit(1.0) - F.least(punct_ratio(col) * 5.0, F.lit(1.0)))
        + F.lit(0.25) * (F.lit(1.0) - F.least(digit_ratio(col) * 5.0, F.lit(1.0)))
    )
    return q


_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "was", "with"],
    "de": ["der", "die", "das", "und", "ist", "von"],
    "fr": ["le", "la", "les", "et", "est", "une"],
    "es": ["el", "los", "las", "es", "una", "y"],
}


def lang_id(col: ColumnOrName) -> Column:
    """Stopword-marker language ID: count marker hits per language,
    argmax with 'und' (undetermined) fallback; CJK codepoints short-
    circuit to 'zh'. A deterministic n-gram-heuristic stand-in for a
    real LID model — but the Spark plumbing is the real thing."""
    t = tokens(col)
    scores = [
        (lang, F.size(F.filter(t, lambda x: x.isin(markers))))
        for lang, markers in _LANG_MARKERS.items()
    ]
    best_score = F.greatest(*[s for _, s in scores])
    decision = F.lit("und")
    # reversed so earlier languages win ties (en first)
    for lang, s in reversed(scores):
        decision = F.when(s == best_score, F.lit(lang)).otherwise(decision)
    decision = F.when(best_score == 0, F.lit("und")).otherwise(decision)
    has_cjk = F.regexp_count(_c(col), F.lit(r"[一-鿿]")) > 0
    return F.when(has_cjk, F.lit("zh")).otherwise(decision)
