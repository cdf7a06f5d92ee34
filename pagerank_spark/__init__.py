"""pagerank_spark — a from-scratch PySpark-native link-graph analytics engine.

Capabilities (reference: laurenleadbetter/Pagerank, surveyed in SURVEY.md):
  * link-edge extraction from Common-Crawl-style pages (url, warc_ts, html, text, lang)
  * partitioned edge-table construction with the reference's ingest semantics
    (regex filter, in-link-ratio filter, 1/outdeg weights, duplicate-edge summing)
  * power-iteration PageRank with damping + dangling-mass redistribution
    (pagerank.py:122-172 semantics: L2-normalized iterates, residual < epsilon)
  * personalization vectors + substring query search (pagerank.py:97-119,175-242)
  * connected components (star contraction), synchronous label propagation,
    degree-ordered triangle counting
  * training-data ops over a documents table: exact/MinHash-LSH/SimHash dedup,
    n-gram Jaccard, language-id, quality scoring, token counts, fingerprints
  * similarity search over embeddings (brute-force + LSH-bucketed cosine top-k)

Everything is DataFrame/SQL-first; Python crosses the boundary only through
Arrow-vectorized pandas UDFs (never per-row Python UDFs).
"""

from pagerank_spark.session import get_spark
from pagerank_spark.operators.graph_build import LinkGraph

__all__ = ["get_spark", "LinkGraph"]

__version__ = "0.1.0"
