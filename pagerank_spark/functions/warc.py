"""WARC (ISO 28500) record parsing — the Common Crawl interchange format.

Common Crawl ships crawls as concatenated gzip members, one WARC record
each; a distributed ingest first splits members (a record-aware reader —
gzip members are self-delimiting, so a binary-file scan plus a per-member
gunzip does it; env-blocked here the same way Iceberg is, see
sources/table_io.py), then parses each record. THIS module is the parse
half, and it is pure Column work: a WARC record is

    WARC/1.0\\r\\n
    <warc headers>\\r\\n
    \\r\\n
    <http headers>\\r\\n      (response records)
    \\r\\n
    <payload>

so header/payload splitting is two ``\\r\\n\\r\\n`` cuts and the header
fields are line-anchored regexes — one codegen'd scan, zero Python, zero
shuffle (plan-audited). The output lands directly in the engine's page
schema (url, warc_ts, html) and feeds functions/extract.py unchanged.

Spec subset (documented): WARC-Type / WARC-Target-URI / WARC-Date header
extraction (case-insensitive names, values trimmed), response-record
payload after the HTTP header block, non-response records (request,
metadata, warcinfo) pass through with a NULL payload. Header folding
(RFC-style continuation lines) is not interpreted — Common Crawl does not
emit folded headers for these three fields.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WARC_FIELD = r"(?mi)^{name}:[ \t]*([^\r\n]*?)[ \t]*$"
# media type only — parameters (";charset=...") stripped
_HTTP_CTYPE = r"(?mi)^Content-Type:[ \t]*([^;\r\n]*?)[ \t]*(?:;[^\r\n]*)?$"


def _warc_header(headers: Column, name: str) -> Column:
    return F.nullif(
        F.regexp_extract(headers, _WARC_FIELD.format(name=name), 1), F.lit("")
    )


def parse_warc_records(
    records: DataFrame, record_col: str = "record"
) -> DataFrame:
    """(url, warc_ts, warc_type, http_status, content_type, html) from
    one WARC record string per row. ``url`` = WARC-Target-URI,
    ``warc_ts`` = WARC-Date parsed to a timestamp (W3C/ISO-8601 Zulu,
    NULL when absent/malformed via try_to_timestamp); for response
    records ``http_status`` is the status-line code, ``content_type``
    the lowercased media type with parameters stripped (the
    ``status = 200 AND content_type = 'text/html'`` cut is the first
    filter every crawl ingest applies), and ``html`` the payload bytes
    after the HTTP header block; all three are NULL for non-response
    records. Rows that do not start with a WARC version line are
    dropped (a mis-split member is data corruption, not a record).
    """
    def after_first_blank(col: str) -> Column:
        # everything after the FIRST \r\n\r\n of `col` ('' when absent)
        return F.expr(
            f"substring({col}, length(substring_index({col},"
            f" '\\r\\n\\r\\n', 1)) + 5)"
        )

    base = records.select(F.col(record_col).cast("string").alias("_rec")).where(
        F.col("_rec").startswith("WARC/")
    )
    split1 = base.select(
        F.substring_index("_rec", "\r\n\r\n", 1).alias("_wh"),
        after_first_blank("_rec").alias("_rest"),
    )
    wtype = F.lower(_warc_header(F.col("_wh"), "WARC-Type"))
    http_headers = F.substring_index(F.col("_rest"), "\r\n\r\n", 1)
    status = F.nullif(
        F.regexp_extract(http_headers, r"(?m)\AHTTP/[0-9.]+ ([0-9]{3})", 1),
        F.lit(""),
    ).try_cast("int")
    ctype = F.lower(
        F.nullif(
            F.regexp_extract(http_headers, _HTTP_CTYPE, 1), F.lit("")
        )
    )
    is_resp = wtype == "response"
    return split1.select(
        _warc_header(F.col("_wh"), "WARC-Target-URI").alias("url"),
        F.try_to_timestamp(
            _warc_header(F.col("_wh"), "WARC-Date"),
            F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'"),
        ).alias("warc_ts"),
        wtype.alias("warc_type"),
        F.when(is_resp, status).alias("http_status"),
        F.when(is_resp, ctype).alias("content_type"),
        F.when(is_resp, F.encode(after_first_blank("_rest"), "UTF-8")).alias(
            "html"
        ),
    )
