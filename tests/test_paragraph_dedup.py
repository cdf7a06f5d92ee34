"""CCNet-style paragraph dedup (dedup.paragraph_dedup) and bibliographic
coupling (linkpred.bibliographic_coupling) hand fixtures."""

from pagerank_spark.operators.dedup import paragraph_dedup
from pagerank_spark.operators.linkpred import bibliographic_coupling, cocitation


def test_paragraph_dedup_first_occurrence_wins(spark):
    docs = spark.createDataFrame(
        [
            (1, "same header\n\nunique one\n\nsame footer"),
            (2, "same header\n\nunique two\n\nsame footer"),
            (3, "unique three\n\nsame header"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in paragraph_dedup(docs).collect()}

    # doc 1 is the first occurrence of header and footer: keeps everything
    assert (got[1]["n_paras"], got[1]["n_kept"]) == (3, 3)
    assert got[1]["clean_text"] == "same header\n\nunique one\n\nsame footer"
    # doc 2 loses both boilerplate paragraphs, keeps original order
    assert (got[2]["n_paras"], got[2]["n_kept"]) == (3, 1)
    assert got[2]["clean_text"] == "unique two"
    # doc 3's header copy is at a later doc_id → dropped
    assert (got[3]["n_paras"], got[3]["n_kept"]) == (2, 1)
    assert got[3]["clean_text"] == "unique three"


def test_paragraph_dedup_normalized_matching_and_empties(spark):
    docs = spark.createDataFrame(
        [
            (1, "  The Same   Para  \n\n\n\nkeep me"),
            (2, "the same para"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in paragraph_dedup(docs).collect()}
    # whitespace/case-normalized match: doc 2's copy is a duplicate;
    # the empty paragraph between \n\n\n\n is dropped before counting
    assert (got[1]["n_paras"], got[1]["n_kept"]) == (2, 2)
    assert (got[2]["n_paras"], got[2]["n_kept"]) == (1, 0)
    assert got[2]["clean_text"] == ""


def test_bibliographic_coupling_is_reversed_cocitation(spark):
    edges = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"), ("c", "x"), ("h", "x")],
        ["src", "dst"],
    )
    got = {(r["a"], r["b"]): r["couplings"] for r in
           bibliographic_coupling(edges, max_cited_indeg=10, min_count=2).collect()}
    assert got == {("a", "b"): 2}

    # the in-degree cap drops hub references: x has in-degree 4
    capped = bibliographic_coupling(edges, max_cited_indeg=3, min_count=2).collect()
    assert capped == []

    # role-swap identity: coupling(E) == cocitation(reverse(E))
    rev = edges.selectExpr("dst AS src", "src AS dst")
    co = {(r["a"], r["b"]): r["cocitations"] for r in
          cocitation(rev, max_citing_outdeg=10, min_count=2).collect()}
    assert co == {("a", "b"): 2}


def test_paragraph_dedup_metacharacter_separator(spark):
    # round-5 ADVICE fix: sep is regex-quoted for the split side, so a
    # separator full of metacharacters splits on exactly the bytes it
    # rejoins with
    from pagerank_spark.operators.dedup import paragraph_dedup

    docs = spark.createDataFrame(
        [(1, "alpha|.|beta|.|gamma"), (2, "beta|.|delta")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in paragraph_dedup(docs, sep="|.|").collect()}
    assert got[1]["n_paras"] == 3 and got[1]["n_kept"] == 3
    assert got[1]["clean_text"] == "alpha|.|beta|.|gamma"
    # 'beta' already seen at (1,1): first occurrence wins
    assert got[2]["n_paras"] == 2 and got[2]["n_kept"] == 1
    assert got[2]["clean_text"] == "delta"
