"""Grid-graph perfect-matching counting via permanents.

Parity: gridGraph2compressed + RunPermanForGridGraphs (reference
util.h:403-520, main.cu:250-323): the number of perfect matchings of an
m x n grid graph equals the permanent of the black/white biadjacency
matrix of its checkerboard bipartition (size mn/2).  The reference demands
one even dimension (odd x odd has no perfect matching) — same here.

Construction is our own: cells colored by (i+j) parity, indexed row-major
within each color; B[black, white] = 1 for 4-neighbour adjacency.  Any
row/column permutation of the reference's matrix has the same permanent.
"""

from __future__ import annotations

import numpy as np

from ..core.matrix import DenseMatrix


def grid_graph_matrix(m: int, n: int) -> DenseMatrix:
    if (m * n) % 2 == 1:
        raise ValueError(
            "one of the grid dimensions must be even (odd x odd grids have "
            "no perfect matching)")
    cells = [(i, j) for i in range(m) for j in range(n)]
    black = [c for c in cells if (c[0] + c[1]) % 2 == 0]
    white = [c for c in cells if (c[0] + c[1]) % 2 == 1]
    widx = {c: k for k, c in enumerate(white)}
    nov = m * n // 2
    a = np.zeros((nov, nov), dtype=np.int64)
    for bi, (i, j) in enumerate(black):
        for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            w = (i + di, j + dj)
            if w in widx:
                a[bi, widx[w]] = 1
    return DenseMatrix(a, "int")


# known perfect-matching counts of small grids, for tests
# (classic values: 2x2 -> 2, 2x3 -> 3, 4x4 -> 36, 2x4 -> 5, 3x4 -> 11;
# 8x8 and 12x12 are the classic dimer counts — the 8x8 value 12988816 was
# reproduced bit-exactly by the df64 engine on hardware, and the 12x12
# value matched by the scaling estimator to ~6% at 30k trials)
KNOWN_COUNTS = {(2, 2): 2, (2, 3): 3, (2, 4): 5, (3, 4): 11, (4, 4): 36,
                (6, 6): 6728, (8, 8): 12988816,
                (12, 12): 53060477521960000}


def kasteleyn_log2(m: int, n: int) -> float:
    """log2 of the exact perfect-matching count, by the Kasteleyn /
    Temperley-Fisher closed form:

        PM(m, n) = prod_{j=1..m} prod_{k=1..n}
                   (4 cos^2(j pi/(m+1)) + 4 cos^2(k pi/(n+1))) ^ (1/4)

    Closed-form ground truth for ANY feasible grid — the estimator
    validation at n = mn/2 >= 100 (e.g. the reference's flagship
    36 x 36 default, main.cu:250-323) checks against this, far beyond
    where the exact Ryser walk could reach.  Computed in log space
    (the 36 x 36 count is ~2^1068).
    """
    if (m * n) % 2 == 1:
        return float("-inf")
    j = np.arange(1, m + 1)[:, None]
    k = np.arange(1, n + 1)[None, :]
    t = (4 * np.cos(j * np.pi / (m + 1)) ** 2
         + 4 * np.cos(k * np.pi / (n + 1)) ** 2)
    # one factor may be exactly 0 only when m and n are both odd
    return float(np.sum(np.log2(t)) / 4.0)
