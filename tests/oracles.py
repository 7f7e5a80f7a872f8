"""Slow-but-obviously-correct CPU oracles for kernel parity tests.

These implement the textbook three-matrix affine-gap DP with no tricks, so
the device kernels' prefix-scan reformulation is validated against ground
truth (SURVEY.md §7 build order: 'kernels first, golden-tested ... with CPU
oracle implementations').
"""

import numpy as np

NEG = -(1 << 28)


def pair_score(a, b, match, mismatch):
    if a >= 5 or b >= 5:
        return NEG
    if a == 4 or b == 4:
        return 0
    return match if a == b else -mismatch


def sw_oracle(q, r, match=1, mismatch=1, gap_open=1, gap_extend=1):
    """Affine local alignment; returns (score, q_end, r_end) with ends
    inclusive, tie-break smallest r_end then smallest q_end; (0, -1, -1)
    when no positive cell."""
    n, m = len(q), len(r)
    H = np.zeros((n + 1, m + 1), np.int64)
    E = np.full((n + 1, m + 1), NEG, np.int64)
    F = np.full((n + 1, m + 1), NEG, np.int64)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            E[i][j] = max(E[i][j - 1] - gap_extend, H[i][j - 1] - gap_open)
            F[i][j] = max(F[i - 1][j] - gap_extend, H[i - 1][j] - gap_open)
            H[i][j] = max(0, H[i - 1][j - 1] + pair_score(q[i - 1], r[j - 1], match, mismatch),
                          E[i][j], F[i][j])
    best = int(H.max())
    if best <= 0:
        return 0, -1, -1
    cells = np.argwhere(H == best)
    cells = cells[np.lexsort((cells[:, 0], cells[:, 1]))]
    i_end, j_end = int(cells[0][0]), int(cells[0][1])
    return best, i_end - 1, j_end - 1


def nw_oracle(q, r, match=2, mismatch=4, gap_open=4, gap_extend=2):
    """Global affine alignment score."""
    n, m = len(q), len(r)
    H = np.full((n + 1, m + 1), NEG, np.int64)
    E = np.full((n + 1, m + 1), NEG, np.int64)
    F = np.full((n + 1, m + 1), NEG, np.int64)
    H[0][0] = 0
    for j in range(1, m + 1):
        E[0][j] = H[0][j] = -gap_open - (j - 1) * gap_extend
    for i in range(1, n + 1):
        F[i][0] = H[i][0] = -gap_open - (i - 1) * gap_extend
        for j in range(1, m + 1):
            E[i][j] = max(E[i][j - 1] - gap_extend, H[i][j - 1] - gap_open)
            F[i][j] = max(F[i - 1][j] - gap_extend, H[i - 1][j] - gap_open)
            H[i][j] = max(H[i - 1][j - 1] + pair_score(q[i - 1], r[j - 1], match, mismatch),
                          E[i][j], F[i][j])
    return int(H[n][m])


def edit_oracle(x, y):
    n, m = len(x), len(y)
    D = np.zeros((n + 1, m + 1), np.int64)
    D[:, 0] = np.arange(n + 1)
    D[0, :] = np.arange(m + 1)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            D[i][j] = min(D[i - 1][j - 1] + (x[i - 1] != y[j - 1]),
                          D[i - 1][j] + 1, D[i][j - 1] + 1)
    return int(D[n][m])


def apply_cigar_score(q, r, cigar, match, mismatch, gap_open, gap_extend,
                      q_start=0, r_start=0):
    """Independently re-score a cigar path; validates tracebacks."""
    score = 0
    i, j = q_start, r_start
    for length, op in cigar:
        if op == 0:
            for k in range(length):
                score += pair_score(q[i + k], r[j + k], match, mismatch)
            i += length
            j += length
        elif op == 1:
            score -= gap_open + (length - 1) * gap_extend
            i += length
        elif op in (2, 3):
            score -= gap_open + (length - 1) * gap_extend
            j += length
    return score, i, j
