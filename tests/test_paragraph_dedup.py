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


def test_host_boilerplate_host_conditional_removal(spark):
    from pagerank_spark.operators.dedup import host_boilerplate

    docs = spark.createDataFrame(
        [
            # host a: "nav menu" in 3/3 docs, "footer x" in 2/3, "promo" 1/3
            (1, "a", "nav menu\ncontent one\npromo"),
            (2, "a", "nav menu\ncontent two\nfooter x"),
            (3, "a", "nav menu\ncontent three\nfooter x"),
            # host b: "nav menu" only in ONE doc (twice within it) — a
            # within-doc repeat counts once, nd=1 < min_docs → kept
            (4, "b", "nav menu\nnav menu\ncontent four"),
        ],
        ["doc_id", "source", "text"],
    )
    got = {r["doc_id"]: r for r in host_boilerplate(docs).collect()}

    # host a: nav menu (3/3) and footer x (2/3 >= 0.5) stripped everywhere;
    # promo (1/3 < 0.5) survives despite repeating NOWHERE — frequency bar
    assert (got[1]["n_lines"], got[1]["n_kept"]) == (3, 2)
    assert got[1]["clean_text"] == "content one\npromo"
    assert (got[2]["n_lines"], got[2]["n_kept"]) == (3, 1)
    assert got[2]["clean_text"] == "content two"
    assert (got[3]["n_lines"], got[3]["n_kept"]) == (3, 1)
    assert got[3]["clean_text"] == "content three"
    # host b keeps its copies of the line host a scrubbed
    assert (got[4]["n_lines"], got[4]["n_kept"]) == (3, 3)
    assert got[4]["clean_text"] == "nav menu\nnav menu\ncontent four"


def test_host_boilerplate_normalized_match_and_blank_lines(spark):
    from pagerank_spark.operators.dedup import host_boilerplate

    docs = spark.createDataFrame(
        [
            (5, "c", " NAV  Menu \n\ncontent five"),
            (6, "c", "nav menu\ncontent six"),
        ],
        ["doc_id", "source", "text"],
    )
    got = {r["doc_id"]: r for r in host_boilerplate(docs).collect()}
    # case/whitespace-normalized key matches; blank line never counted
    assert (got[5]["n_lines"], got[5]["n_kept"]) == (2, 1)
    assert got[5]["clean_text"] == "content five"
    assert (got[6]["n_lines"], got[6]["n_kept"]) == (2, 1)
    assert got[6]["clean_text"] == "content six"
