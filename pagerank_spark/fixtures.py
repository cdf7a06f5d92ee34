"""Deterministic fixtures (FIXTURES.md): golden graph, synthetic pages, digraphs.

Everything is seeded; no wall-clock, no external data.
"""

from __future__ import annotations

import datetime
import hashlib

import numpy as np

# the 6-node / 10-edge graph from "Deeper Inside PageRank"
# (reference small.csv.gz; README.md:26-37). File order matters (sorted by source).
GOLDEN_SMALL_EDGES: list[tuple[str, str]] = [
    ("1", "2"), ("1", "3"),
    ("3", "1"), ("3", "2"), ("3", "5"),
    ("4", "5"), ("4", "6"),
    ("5", "6"), ("5", "4"),
    ("6", "4"),
]

# README.md:142-147 golden ranking (alpha=.85, eps=1e-6, 24 iterations: i=0..23)
GOLDEN_SMALL_RANKS = {
    "4": 6.6270e-01, "6": 5.2179e-01, "5": 4.1434e-01,
    "2": 2.3175e-01, "3": 1.8590e-01, "1": 1.6917e-01,
}

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu covid corona vaccine trump iran policy court law news "
    "senate house masthead about contact topics archive interrogation"
).split()


def synth_edges(
    n_vertices: int = 100,
    n_edges: int = 400,
    seed: int = 0,
    zipf_s: float = 1.2,
    dup_frac: float = 0.05,
    self_loop_frac: float = 0.02,
    url_style: bool = False,
) -> list[tuple[str, str]]:
    """Seeded random digraph with power-law in-degree, duplicates, self-loops,
    dangling nodes; returned sorted by source (the reference precondition)."""
    rng = np.random.default_rng(seed)
    # Zipf-ish target popularity
    ranks = np.arange(1, n_vertices + 1, dtype=np.float64)
    p = ranks ** (-zipf_s)
    p /= p.sum()
    perm = rng.permutation(n_vertices)

    def name(i: int) -> str:
        if url_style:
            w = _WORDS[i % len(_WORDS)]
            return f"www.example{i % 7}.test/{w}{i}"
        return f"v{i}"

    srcs = rng.integers(0, n_vertices, size=n_edges)
    dsts = perm[rng.choice(n_vertices, size=n_edges, p=p)]
    edges = []
    for s, t in zip(srcs, dsts):
        if rng.random() < self_loop_frac:
            t = s
        edges.append((name(int(s)), name(int(t))))
        if rng.random() < dup_frac:
            edges.append((name(int(s)), name(int(t))))
    edges.sort(key=lambda e: e[0])
    return edges


def _slug(rng: np.random.Generator) -> str:
    return _WORDS[int(rng.integers(0, len(_WORDS)))] + str(int(rng.integers(0, 1000)))


def synth_pages(
    n_pages: int = 64,
    n_domains: int = 4,
    seed: int = 7,
    zipf_s: float = 1.2,
    mean_links: float = 4.0,
):
    """Deterministic Common-Crawl-style pages (FIXTURES.md §1).

    Returns list of dict rows (url, warc_ts, html: bytes, lang). The golden
    ``text`` column is intentionally NOT generated here; tests derive expected
    text through the pure-Python reference extractor so byte-identity is a
    real invariant, not a tautology.
    """
    rng = np.random.default_rng(seed)
    urls = []
    for i in range(n_pages):
        d = i % n_domains
        base = f"www.example{d}.test"
        r = rng.random()
        if r < 0.15:
            u = f"{base}/topic/{_slug(rng)}"        # multi-segment -> regex-dropped
        elif r < 0.25:
            u = f"{base}/{_slug(rng)}/"             # trailing slash -> regex-dropped
        else:
            u = f"{base}/{_slug(rng)}"              # kept
        urls.append(u)
    # power-law link-target popularity => hub skew
    ranks = np.arange(1, n_pages + 1, dtype=np.float64)
    p = ranks ** (-zipf_s)
    p /= p.sum()
    perm = rng.permutation(n_pages)

    epoch = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
    rows = []
    for i, u in enumerate(urls):
        n_links = int(rng.poisson(mean_links))
        targets = [urls[int(perm[j])] for j in rng.choice(n_pages, size=n_links, p=p)]
        case = i % 8
        if case == 0:
            targets = []                              # no links
        elif case == 1 and targets:
            targets.append(targets[0])                # duplicate link
        elif case == 2:
            targets.append(u)                         # self-link
        body_parts = [f"<h1>Page {i}</h1>", f"<p>Deterministic body text for {u} "
                      f"with words {_slug(rng)} {_slug(rng)}.</p>"]
        for t in targets:
            body_parts.append(f'<a href="http://{t}">link to {t.split("/")[-1] or t}</a>')
        if case == 3:
            body_parts.append('<a href="/relative-path">relative</a>')
        if case == 4:
            body_parts.append("<p>entity &amp; test &#x263a; nested <b><i>tags</i></b></p>")
        if case == 5:
            body_parts.append("<script>var x = 1 &lt; 2;</script><style>p{}</style>")
        html = (
            f"<html><head><title>T{i}</title></head><body>"
            + "".join(body_parts)
            + "</body></html>"
        ).encode("utf-8")
        ts = epoch + datetime.timedelta(seconds=int(rng.integers(0, 10_000_000)))
        lang = "en" if i % 10 < 8 else ("de" if i % 10 == 8 else "fr")
        rows.append({"url": u, "warc_ts": ts, "html": html, "lang": lang})
    return rows


def stable_hash64(s: str) -> int:
    """Deterministic 63-bit hash (process-independent, unlike Python's hash)."""
    return int.from_bytes(hashlib.sha1(s.encode()).digest()[:8], "big") >> 1
