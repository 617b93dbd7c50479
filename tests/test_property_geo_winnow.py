"""Property tests for the round-5 continuation kernels, pure Python —
the algorithmic guarantees behind q_text_winnowing and
q_geo_radius_join hold on arbitrary random inputs, not just the
fixture. (The Spark implementations are pinned equal to these same
kernels by tests/test_llm_and_approx.py::test_winnowing_shared_run_guarantee
and tests/test_geo.py::test_radius_join_complete_vs_brute_force.)"""

from __future__ import annotations

import hashlib
import random

from steaminganalysis_spark.operators.geo import CELL, RADIUS2
from steaminganalysis_spark.operators.llm import _WIN_K, _WIN_W


def _winnow(words: list[str]) -> set[str]:
    hs = [
        hashlib.md5(" ".join(words[i : i + _WIN_K]).encode()).hexdigest()[:8]
        for i in range(len(words) - _WIN_K + 1)
    ]
    return {min(hs[i - _WIN_W + 1 : i + 1]) for i in range(_WIN_W - 1, len(hs))}


def test_winnowing_guarantee_random_corpora():
    """For 300 random doc pairs sharing a planted contiguous run of
    ≥ w+k-1 words, the winnowed fingerprint sets always intersect —
    the Schleimer guarantee, independent of surrounding noise."""
    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(50)]
    need = _WIN_W + _WIN_K - 1
    for trial in range(300):
        run = [rng.choice(vocab) for _ in range(rng.randint(need, need + 4))]
        pad = lambda n: [rng.choice(vocab) for _ in range(n)]  # noqa: E731
        a = pad(rng.randint(0, 8)) + run + pad(rng.randint(0, 8))
        b = pad(rng.randint(0, 8)) + run + pad(rng.randint(0, 8))
        assert _winnow(a) & _winnow(b), (trial, run)


def _grid_pairs(pts: dict[int, tuple[int, int]]) -> set[tuple[int, int]]:
    """The operator's candidate rule in pure Python: 3×3 neighborhood
    cell equi-join, exact squared-distance filter."""
    cells: dict[tuple[int, int], list[int]] = {}
    for i, (x, y) in pts.items():
        cells.setdefault((x // CELL, y // CELL), []).append(i)
    out = set()
    for i, (x, y) in pts.items():
        cx, cy = x // CELL, y // CELL
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for j in cells.get((cx + dx, cy + dy), ()):
                    if i != j:
                        xj, yj = pts[j]
                        if (x - xj) ** 2 + (y - yj) ** 2 <= RADIUS2:
                            out.add((i, j))
    return out


def test_grid_join_complete_random_points():
    """On 50 random point sets — including clusters straddling cell
    boundaries — the grid candidate rule finds EXACTLY the brute-force
    within-radius pair set (completeness is a theorem of cell pitch =
    radius; this checks it, and the no-false-positives direction, on
    adversarially boundary-heavy data)."""
    rng = random.Random(7)
    for trial in range(50):
        pts: dict[int, tuple[int, int]] = {}
        n = rng.randint(2, 60)
        for i in range(n):
            if i and rng.random() < 0.5:
                # half the points cluster near an existing one, right at
                # radius scale, to stress cell-boundary straddles
                bx, by = pts[rng.randrange(i)]
                pts[i] = (
                    bx + rng.randint(-CELL - 5, CELL + 5),
                    by + rng.randint(-CELL - 5, CELL + 5),
                )
            else:
                pts[i] = (rng.randint(0, 10 * CELL), rng.randint(0, 10 * CELL))
        brute = {
            (i, j)
            for i in pts
            for j in pts
            if i != j
            and (pts[i][0] - pts[j][0]) ** 2 + (pts[i][1] - pts[j][1]) ** 2
            <= RADIUS2
        }
        assert _grid_pairs(pts) == brute, trial
