"""Substring query predicate (reference url_satisfies_query, pagerank.py:196-242).

Semantics (ported from the reference's doctests, pagerank.py:203-218):
  * query is whitespace-split into terms
  * a term starting with '-' is a negation; any negated term present in the
    url => False, overriding everything
  * otherwise True iff any positive term is a substring of the url
  * zero positive terms => True (empty query matches everything)

Implemented as a pure Column expression (no UDF): Catalyst folds it into the
scan filter. ``expand_terms`` optionally appends top-k similar words from an
embedding table (reference pagerank.py:224-227 uses gensim most_similar).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def parse_query(query: str) -> tuple[list[str], list[str]]:
    """Return (positive_terms, negated_terms)."""
    pos, neg = [], []
    for term in query.split():
        if term.startswith("-"):
            neg.append(term[1:])
        else:
            pos.append(term)
    return pos, neg


def url_satisfies_query_col(url_col: Column, query: str) -> Column:
    pos, neg = parse_query(query)
    if pos:
        sat = reduce(lambda a, b: a | b, [url_col.contains(t) for t in pos])
    else:
        sat = F.lit(True)
    for t in neg:
        sat = sat & ~url_col.contains(t)
    return sat


def url_satisfies_query_py(url: str, query: str) -> bool:
    """Pure-Python twin (must pass the reference's 9 doctests verbatim)."""
    pos, neg = parse_query(query)
    if any(t[0:] in url for t in neg):
        return False
    if not pos:
        return True
    return any(t in url for t in pos)


def url_satisfies_query_sql(url_expr: str, query: str) -> str:
    """ANSI-SQL twin for the DuckDB oracle."""
    pos, neg = parse_query(query)

    def lit(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    sat = (
        "(" + " OR ".join(f"contains({url_expr}, {lit(t)})" for t in pos) + ")"
        if pos
        else "TRUE"
    )
    for t in neg:
        sat += f" AND NOT contains({url_expr}, {lit(t)})"
    return sat


def most_similar(
    embeddings: DataFrame,
    term: str,
    topn: int = 5,
    word_col: str = "word",
    vec_col: str = "embedding",
) -> list[tuple[str, float]]:
    """Top-n (word, cosine) most similar to ``term`` — the engine's
    ``gensim most_similar`` twin (reference pagerank.py:224-227,
    pagerank2.py:267). Returns [] when the term is out of vocabulary
    (the reference would KeyError; lenient here).

    ``embeddings`` is a small word-vector table; the top-k is a
    TakeOrderedAndProject over one JVM-side cosine expression."""
    vocab = embeddings.select(word_col, vec_col)
    qrow = vocab.filter(F.col(word_col) == term).limit(1).collect()
    if not qrow:
        return []
    qvec = qrow[0][vec_col]
    qnorm = sum(x * x for x in qvec) ** 0.5 or 1.0
    qlit = F.array(*[F.lit(float(x)) for x in qvec])
    sim = (
        F.aggregate(
            F.zip_with(F.col(vec_col), qlit, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / (
            F.sqrt(F.aggregate(F.col(vec_col), F.lit(0.0), lambda acc, x: acc + x * x))
            * F.lit(qnorm)
        )
    )
    top = (
        vocab.filter(F.col(word_col) != term)
        .withColumn("sim", sim)
        .orderBy(F.desc("sim"), word_col)
        .limit(topn)
        .collect()
    )
    return [(r[word_col], float(r["sim"])) for r in top]


def expand_terms(
    query: str,
    embeddings: DataFrame | None = None,
    word_col: str = "word",
    vec_col: str = "embedding",
    topn: int = 5,
) -> str:
    """Append top-n cosine-similar words per positive term (op 22, SURVEY §2;
    reference pagerank.py:224-227 expands every query term with glove top-5
    inside url_satisfies_query). Returns the expanded query string; without
    an embedding table the query is returned unchanged."""
    if embeddings is None or not query.split():
        return query
    pos, neg = parse_query(query)
    extra: list[str] = []
    for term in pos:
        extra.extend(
            w for w, _ in most_similar(embeddings, term, topn, word_col, vec_col)
        )
    return " ".join(pos + extra + ["-" + t for t in neg])
