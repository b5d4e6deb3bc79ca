"""LSH band/row auto-tuning from a target Jaccard threshold.

The banding S-curve P(candidate | jaccard = s) = 1 - (1 - s^r)^b has its
knee near (1/b)^(1/r); picking (b, r) by hand for a new threshold or
signature width is folklore-prone, so this module solves the standard
optimization (Leskovec/Rajaraman/Ullman, *Mining of Massive Datasets*
§3.4; the same criterion the public `datasketch` library ships): choose
the divisor split b*r = num_hashes that minimizes the weighted sum of
the false-positive integral of the curve below the threshold and the
false-negative integral above it.

Pure numpy on a fixed grid — deterministic, driver-side, O(divisors x
grid) — so the tuned config hash is reproducible everywhere.
"""

from __future__ import annotations

import numpy as np

_GRID = 1001  # fixed integration grid -> deterministic tuning

# numpy renamed trapz -> trapezoid in 2.0; support both
_trapz = getattr(np, "trapezoid", None) or np.trapz


def collision_probability(s: float | np.ndarray, bands: int, rows: int):
    """P(some band collides) for Jaccard similarity s under (b, r)."""
    return 1.0 - (1.0 - np.asarray(s, dtype=np.float64) ** rows) ** bands


def tune_lsh(
    threshold: float,
    num_hashes: int = 128,
    fp_weight: float = 0.5,
) -> tuple[int, int]:
    """The (bands, rows_per_band) divisor split of ``num_hashes`` that
    minimizes fp_weight * FP-area + (1 - fp_weight) * FN-area around
    ``threshold``. Raise fp_weight to penalize spurious candidates
    (verification cost), lower it to penalize missed pairs (recall)."""
    if not 0.0 < threshold < 1.0:
        raise ValueError("threshold must be in (0, 1)")
    if num_hashes < 2:
        raise ValueError("num_hashes must be >= 2")
    s = np.linspace(0.0, 1.0, _GRID)
    below = s < threshold
    best: tuple[float, int, int] | None = None
    for bands in range(1, num_hashes + 1):
        if num_hashes % bands:
            continue
        rows = num_hashes // bands
        p = collision_probability(s, bands, rows)
        fp = float(_trapz(np.where(below, p, 0.0), s))
        fn = float(_trapz(np.where(below, 0.0, 1.0 - p), s))
        err = fp_weight * fp + (1.0 - fp_weight) * fn
        if best is None or err < best[0]:
            best = (err, bands, rows)
    assert best is not None
    return best[1], best[2]


def curve_threshold(bands: int, rows: int) -> float:
    """The S-curve knee (1/b)^(1/r) — where collision probability
    crosses ~0.5ish; useful to sanity-check a tuned split."""
    return (1.0 / bands) ** (1.0 / rows)


def tuned_config(
    threshold: float = 0.7,
    num_hashes: int = 128,
    fp_weight: float = 0.5,
    **overrides,
):
    """A GDConfig whose band split is solved from the threshold instead
    of hand-picked. Tuning keys its own checkpoint tree automatically
    (bands participate in config_hash)."""
    from ..config import GDConfig

    bands, _rows = tune_lsh(threshold, num_hashes, fp_weight)
    return GDConfig(
        num_hashes=num_hashes,
        bands=bands,
        jaccard_threshold=threshold,
        **overrides,
    )
