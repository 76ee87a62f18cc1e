"""F14/F15: banded LCS char alignment + index interpolation.

Reimplements the semantics of the reference's MRC alignment
(``mrc_utils.py:152-230``): a banded longest-common-subsequence DP
aligns the processed/tokenized text back to the original chars; if the
LCS length is below ``0.8·n`` the band is doubled and retried once,
then the example is dropped (the P9 mismatch guard,
mrc_utils.py:214-230). ``convert_index`` interpolates positions across
alignment gaps (mrc_utils.py:43-78 shape).

Pure numpy — called inside a pandas UDF on the Spark side (a pure
function of one row, SURVEY.md §2.7 F14).
"""

from __future__ import annotations

import numpy as np


def banded_lcs(a: str, b: str, band: int) -> tuple[np.ndarray, dict[tuple[int, int], int]]:
    """LCS DP over |a|×|b| restricted to a diagonal band.

    Returns (f, g): f[i, j] = LCS length of a[:i+1] vs b[:j+1] within
    the band; g maps (i, j) → move (0=skip a, 1=skip b, 2=match) for
    backtracing.
    """
    n, m = len(a), len(b)
    f = np.zeros((n, m), dtype=np.int32)
    g: dict[tuple[int, int], int] = {}
    for i in range(n):
        # band center follows the length ratio
        center = int(round(i * m / max(n, 1)))
        lo, hi = max(0, center - band), min(m, center + band)
        for j in range(lo, hi):
            best = 0
            move = -1
            if i > 0 and f[i - 1, j] > best:
                best, move = f[i - 1, j], 0
            if j > 0 and f[i, j - 1] > best:
                best, move = f[i, j - 1], 1
            prev = f[i - 1, j - 1] if (i > 0 and j > 0) else 0
            if a[i] == b[j] and prev + 1 > best:
                best, move = prev + 1, 2
            f[i, j] = best
            if move >= 0:
                g[(i, j)] = move
    return f, g


def align_texts(
    orig: str, proc: str, init_band: int = 16, min_ratio: float = 0.8
) -> dict[int, int] | None:
    """→ mapping proc index → orig index for matched chars, or None.

    Band doubling retry then give-up below ``min_ratio``·len(proc)
    (mrc_utils.py:194-198, 214-230 semantics).
    """
    if not orig or not proc:
        return {} if not proc else None
    # the guard ratio is against the shorter side (the reference aligns
    # same-scale texts and uses its n; min() generalizes to asymmetric
    # lengths without changing the same-scale behavior)
    need = min_ratio * min(len(orig), len(proc))
    band = init_band
    f, g = banded_lcs(orig, proc, band)
    if f[-1, -1] < need:
        f, g = banded_lcs(orig, proc, band * 2)  # band-doubling retry
    if f[-1, -1] < need:
        return None

    mapping: dict[int, int] = {}
    i, j = len(orig) - 1, len(proc) - 1
    while i >= 0 and j >= 0:
        move = g.get((i, j))
        if move is None:
            break
        if move == 2:
            mapping[j] = i
            i, j = i - 1, j - 1
        elif move == 0:
            i -= 1
        else:
            j -= 1
    return mapping


def convert_index(mapping: dict[int, int], pos: int, n_proc: int) -> int | None:
    """Interpolate a proc position across alignment gaps: the nearest
    mapped position at-or-before ``pos`` (else at-or-after)."""
    if pos in mapping:
        return mapping[pos]
    for d in range(1, n_proc + 1):
        if pos - d in mapping:
            return mapping[pos - d]
        if pos + d in mapping:
            return mapping[pos + d]
    return None
