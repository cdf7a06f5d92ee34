"""PII redaction (textops.pii_scrub) and duplicate-span statistics
(dedup.duplicate_span_stats) hand fixtures."""

from pagerank_spark.operators.dedup import duplicate_span_stats
from pagerank_spark.operators.textops import pii_scrub


def test_pii_scrub_counts_and_redaction(spark):
    docs = spark.createDataFrame(
        [
            (1, "write to John.Doe+x@sub.example.org or 10.0.0.1, call +1 (555) 123-4567 now"),
            (2, "no pii here at all"),
            (3, "two mails a@b.io c@d.net one ip 192.168.1.254"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in pii_scrub(docs).collect()}

    r1 = got[1]
    assert (r1["n_emails"], r1["n_ips"], r1["n_phones"]) == (1, 1, 1)
    assert "<EMAIL>" in r1["scrubbed"] and "<IP>" in r1["scrubbed"] and "<PHONE>" in r1["scrubbed"]
    assert "John.Doe" not in r1["scrubbed"]
    assert "10.0.0.1" not in r1["scrubbed"]
    assert "123-4567" not in r1["scrubbed"]

    r2 = got[2]
    assert (r2["n_emails"], r2["n_ips"], r2["n_phones"]) == (0, 0, 0)
    assert r2["scrubbed"] == "no pii here at all"

    r3 = got[3]
    assert (r3["n_emails"], r3["n_ips"]) == (2, 1)
    assert r3["scrubbed"].count("<EMAIL>") == 2


def test_pii_ip_not_double_matched_as_phone(spark):
    # the dot breaks the phone character class, and the IP is replaced
    # before the phone pass — the octets must never merge into a <PHONE>
    docs = spark.createDataFrame([(1, "server 10.20.30.40 port")], ["doc_id", "text"])
    r = pii_scrub(docs).collect()[0]
    assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (0, 1, 0)
    assert r["scrubbed"] == "server <IP> port"


def test_duplicate_span_stats_hand(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),   # grams: 'a b c', 'b c d', 'c d e'
            (2, "a b c x y"),   # grams: 'a b c', 'b c x', 'c x y'
            (3, "z z z z z"),   # grams: 'z z z' (distinct -> 1)
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in duplicate_span_stats(docs, n=3).collect()}
    assert (got[1]["n_grams"], got[1]["n_dup_grams"]) == (3, 1)
    assert got[1]["dup_fraction"] == round(1 / 3, 6)
    assert (got[2]["n_grams"], got[2]["n_dup_grams"]) == (3, 1)
    assert (got[3]["n_grams"], got[3]["n_dup_grams"]) == (1, 0)
    assert got[3]["dup_fraction"] == 0.0


def test_duplicate_span_stats_full_dup_pair(spark):
    # identical docs: every gram duplicated
    docs = spark.createDataFrame(
        [(1, "p q r s"), (2, "p q r s")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in duplicate_span_stats(docs, n=3).collect()}
    assert got[1]["dup_fraction"] == 1.0 and got[2]["dup_fraction"] == 1.0


def test_pii_phone_does_not_merge_across_newlines(spark):
    # round-5 ADVICE fix: the separator class is space-only and bounded, so
    # a date and a big number on ADJACENT LINES stay unredacted instead of
    # fusing into one giant <PHONE>
    docs = spark.createDataFrame(
        [
            (1, "released 2024 11 05\n10 000 000 units sold"),
            (2, "call +1 (555) 123-4567 today"),
            (3, "pi digits 3141592653589793238462643383279502884197169399375105"),
        ],
        ["doc_id", "text"],
    )
    from pagerank_spark.operators.textops import pii_scrub

    got = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert "\n" in got[1]["scrubbed"]  # never merged across the newline
    assert got[2]["n_phones"] == 1
    assert got[2]["scrubbed"] == "call <PHONE> today"
    # a 50+-digit run is not ONE phone number end-to-end: the bounded
    # pattern matches in <=21-char windows (several matches, never a single
    # run-length one)
    assert got[3]["n_phones"] >= 2
