"""NumPy float64 oracle for the reference PageRank (pagerank.py:22-172).

Replicates, in order (citations are reference file:line):
  * regex edge filter  r'.*((/$)|(/.*/)).*'       (pagerank.py:42-45)
  * first-encounter URL interning                  (pagerank.py:81-87)
  * in-degree counted pre-ratio-filter, dup-incl.  (pagerank.py:48)
  * in-link-ratio filter, vertex set NOT shrunk    (pagerank.py:51-57)
  * run-length 1/outdeg weights (sorted-by-source) (pagerank.py:60-71)
  * duplicate COO entries SUM                      (pagerank.py:74-77)
  * power method: q = (a·xᵀa + (1-a))·v; x = aPᵀx + q; x /= ‖x‖₂;
    stop when ‖x - xprev‖₂ < eps                   (pagerank.py:122-172)

Session-verified (SURVEY.md §5.3): reproduces README.md:142-147 exactly
(23 iterations, node '4' top at 6.6270e-01).
"""

from __future__ import annotations

import math
import re
from collections import defaultdict

import numpy as np

EDGE_FILTER_REGEX = r".*((/$)|(/.*/)).*"
_edge_re = re.compile(EDGE_FILTER_REGEX)


def build_matrix(
    edges: list[tuple[str, str]],
    max_nnz: int | None = None,
    filter_ratio: float | None = None,
    apply_regex_filter: bool = True,
):
    """Return (P: csr-like dense float64 [n,n], url_dict: str->int).

    ``edges`` must be in file order (the reference assumes sorted-by-source).
    """
    url_dict: dict[str, int] = {}

    def intern(u: str) -> int:
        if u not in url_dict:
            url_dict[u] = len(url_dict)
        return url_dict[u]

    target_counts: dict[int, int] = defaultdict(int)
    indices: list[list[int]] = []
    for i, (s, t) in enumerate(edges):
        if max_nnz is not None and i > max_nnz:
            break
        if apply_regex_filter and (_edge_re.match(s) or _edge_re.match(t)):
            continue
        si, ti = intern(s), intern(t)
        target_counts[ti] += 1
        indices.append([si, ti])

    if filter_ratio is not None:
        n0 = len(url_dict)
        indices = [e for e in indices if target_counts[e[1]] < filter_ratio * n0]

    n = len(url_dict)
    P = np.zeros((n, n), dtype=np.float64)
    # run-length weights over file order (== 1/outdeg for sorted input);
    # duplicates SUM via +=
    i0 = 0
    while i0 < len(indices):
        j = i0
        while j < len(indices) and indices[j][0] == indices[i0][0]:
            j += 1
        w = 1.0 / (j - i0)
        for k in range(i0, j):
            P[indices[k][0], indices[k][1]] += w
        i0 = j
    return P, url_dict


def power_method_np(
    P: np.ndarray,
    v: np.ndarray | None = None,
    x0: np.ndarray | None = None,
    alpha: float = 0.85,
    max_iterations: int = 1000,
    epsilon: float = 1e-6,
):
    """Return (x: float64 [n], n_iterations, residuals: list)."""
    n = P.shape[0]
    a = (P.sum(axis=1) == 0).astype(np.float64)

    if v is None:
        v = np.full(n, 1.0 / n)
    v = v / np.linalg.norm(v)

    if x0 is None:
        x0 = np.full(n, 1.0 / math.sqrt(n))
    x0 = x0 / np.linalg.norm(x0)

    x = x0.copy()
    residuals = []
    iters = 0
    for _ in range(max_iterations):
        iters += 1
        xprev = x.copy()
        q = (alpha * (x @ a) + (1 - alpha)) * v
        x = alpha * (P.T @ x) + q
        x = x / np.linalg.norm(x)
        r = float(np.linalg.norm(x - xprev))
        residuals.append(r)
        if r < epsilon:
            break
    return x, iters, residuals


def pagerank_np(
    edges: list[tuple[str, str]],
    alpha: float = 0.85,
    max_iterations: int = 1000,
    epsilon: float = 1e-6,
    max_nnz: int | None = None,
    filter_ratio: float | None = None,
    personalization_urls: set[str] | None = None,
    apply_regex_filter: bool = True,
):
    """End-to-end oracle: edge list -> dict url -> L2-normalized rank."""
    P, url_dict = build_matrix(
        edges, max_nnz=max_nnz, filter_ratio=filter_ratio,
        apply_regex_filter=apply_regex_filter,
    )
    n = len(url_dict)
    v = None
    if personalization_urls is not None:
        v = np.zeros(n)
        for u, i in url_dict.items():
            if u in personalization_urls:
                v[i] = 1.0
        s = v.sum()
        assert s > 0, "personalization query matches no urls"
        v = v / s
    x, iters, residuals = power_method_np(
        P, v=v, alpha=alpha, max_iterations=max_iterations, epsilon=epsilon
    )
    return {u: float(x[i]) for u, i in url_dict.items()}, iters, residuals
