#!/usr/bin/env python3
"""Dim-generalized sizing calibration for the verify-less embedding
gate (VERDICT r9 ask #1 — the r9 coefficient 1.27 was a dim=64 fit).

What is being measured
----------------------
The verify-less gate falsely drops a genuinely-new vector when its
``nbits``-plane sign signature collides with any stored vector's in
any table. For INDEPENDENT random vectors the per-plane sign-match
probability is exactly 1/2 (symmetry), but the JOINT m-plane collision
probability is NOT 2^-m: conditioned on a pair's angle θ, a random
Gaussian hyperplane separates the pair with probability θ/π (the
Goemans-Williamson identity the whole RHP-LSH family is built on), so

    p_col(m, d) = E_pairs[(1 - θ/π)^m]

and the expectation over the pair-angle distribution is STRICTLY above
2^-m by Jensen — the finite-dim angle fluctuation σ(cosθ) ≈ 1/√d is
what makes low dims collide far above the uniform rate (the r9 stress
measured the naive uniform model 4x under-predicted at dim=64). The
effective-bits ratio is r(m, d) = -log2(p_col)/m ≤ 1, and the sizing
coefficient is its inverse: nbits = ceil(coef(d) · log2(n·tables/ε)).

Two estimators, cross-validated where both can see
--------------------------------------------------
1. **exact bucket counting** (ground truth, small m only): N vectors
   drawn from the stress corpus's distribution (i.i.d. uniform [-1,1]
   coordinates, the quasi-random regime the sizing advice targets),
   signed against the repo's ACTUAL deterministic planes
   (pond_spark.similarity.lsh.hyperplanes — splitmix64 Box-Muller),
   colliding-pair fraction from the bucket histogram. Statistically
   dead above m≈30 (p_col ~ 2^-30 needs >10^10 pairs).
2. **angle Monte Carlo** (any m): sample pair angles from the same
   vector distribution, evaluate E[(1-θ/π)^m] directly. Exact in the
   plane-averaged model; validated against estimator 1 on the m range
   both can see, then trusted at the sizing-relevant m.

The fitted per-dim coefficients feed
``pond_spark.similarity.catalog.rhp_gate_coefficient`` (a measured
lookup, log-dim interpolated) and are validated end-to-end by the
DAILYSTRESS_EMB legs at --dim 256/1024 (tools/curate_run_stress.py):
advised size must hold ≤5% measured overshoot without gate_check
refusal.

Usage::

    python tools/gate_dim_calibration.py [--dims=16,64,256,1024]
        [--n=400000] [--pairs=4000000]

Prints one ``GATECAL`` JSON line per dim and a ``GATECAL_FIT`` summary.
Pure numpy — no Spark session (the physics lives in the signature
model, not the engine). ~2-4 min at defaults.
"""

from __future__ import annotations

import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pond_spark.similarity.lsh import hyperplanes  # noqa: E402

#: m values the exact bucket count can still resolve at n=400k
#: (expected colliding pairs >= ~50 at the smallest p_col)
_EXACT_MS = (8, 12, 16, 20, 24)
#: the sizing-relevant range: log2(n·tables/ε) for n = 1e5..1e10 at
#: ε=5% spans ~21..41 — evaluate the MC there
_SIZING_MS = (20, 24, 28, 32, 36, 40, 44)


def _uniform_vectors(rng: np.random.Generator, n: int, dim: int) -> np.ndarray:
    """The stress corpus's vector model: i.i.d. uniform [-1, 1]
    coordinates (tools/curate_run_stress.py with_vecs — xxhash-uniform
    there, statistically identical here)."""
    return rng.uniform(-1.0, 1.0, size=(n, dim)).astype(np.float32)


def exact_collision(
    rng: np.random.Generator, dim: int, n: int, ms, seed: int = 42
) -> dict[int, float]:
    """Ground-truth colliding-pair fraction via the repo's actual
    planes: sum c·(c-1) over buckets / n·(n-1)."""
    vecs = _uniform_vectors(rng, n, dim)
    m_max = max(ms)
    planes = np.asarray(hyperplanes(dim, m_max, seed), dtype=np.float64)
    bits = (vecs.astype(np.float64) @ planes.T) >= 0.0  # (n, m_max)
    out = {}
    total_pairs = float(n) * (n - 1)
    for m in ms:
        weights = (1 << np.arange(m, dtype=np.uint64))
        sigs = (bits[:, :m].astype(np.uint64) * weights).sum(axis=1)
        _, counts = np.unique(sigs, return_counts=True)
        colliding = float((counts.astype(np.float64) * (counts - 1)).sum())
        out[m] = colliding / total_pairs
    return out


def angle_mc_collision(
    rng: np.random.Generator, dim: int, n_pairs: int, ms,
    chunk: int = 500_000,
) -> dict[int, float]:
    """E[(1-θ/π)^m] over independent pairs of the same vector model —
    the plane-averaged collision probability, evaluable at any m."""
    acc = {m: 0.0 for m in ms}
    done = 0
    while done < n_pairs:
        k = min(chunk, n_pairs - done)
        a = _uniform_vectors(rng, k, dim).astype(np.float64)
        b = _uniform_vectors(rng, k, dim).astype(np.float64)
        cos = (a * b).sum(axis=1) / (
            np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
        )
        np.clip(cos, -1.0, 1.0, out=cos)
        agree = 1.0 - np.arccos(cos) / math.pi  # P(one plane agrees)
        for m in ms:
            acc[m] += float(np.power(agree, m).sum())
        done += k
    return {m: acc[m] / n_pairs for m in ms}


def main() -> int:
    dims = [16, 64, 256, 1024]
    n = 400_000
    n_pairs = 4_000_000
    for a in sys.argv[1:]:
        if a.startswith("--dims="):
            dims = [int(x) for x in a.split("=", 1)[1].split(",") if x]
        elif a.startswith("--n="):
            n = int(a.split("=", 1)[1])
        elif a.startswith("--pairs="):
            n_pairs = int(a.split("=", 1)[1])

    fit = {}
    for dim in dims:
        rng = np.random.default_rng(1234 + dim)
        exact = exact_collision(rng, dim, n, _EXACT_MS)
        mc = angle_mc_collision(
            rng, dim, n_pairs, tuple(_EXACT_MS) + _SIZING_MS
        )
        # cross-validation: MC vs ground truth where both resolve
        xval = {
            m: round(mc[m] / exact[m], 3)
            for m in _EXACT_MS
            if exact[m] > 0
        }
        # effective-bits ratio and its inverse (the sizing coefficient)
        # at each sizing m; the recommendation uses the coefficient at
        # the sizing point itself, so report the WORST (largest) over
        # the range as the conservative fit
        ratios = {
            m: round(-math.log2(mc[m]) / m, 4) for m in _SIZING_MS
        }
        coefs = {m: round(1.0 / r, 4) for m, r in ratios.items()}
        coef = max(coefs.values())
        fit[dim] = coef
        print(
            "GATECAL "
            + json.dumps(
                {
                    "dim": dim,
                    "n_vectors_exact": n,
                    "n_pairs_mc": n_pairs,
                    "p_col_exact": {
                        str(m): float(f"{v:.3e}") for m, v in exact.items()
                    },
                    "p_col_mc": {
                        str(m): float(f"{mc[m]:.3e}")
                        for m in tuple(_EXACT_MS) + _SIZING_MS
                    },
                    "mc_over_exact": {str(m): v for m, v in xval.items()},
                    "eff_bits_ratio": {str(m): v for m, v in ratios.items()},
                    "coefficient": {str(m): v for m, v in coefs.items()},
                    "coefficient_conservative": round(coef, 4),
                }
            )
        )
    print("GATECAL_FIT " + json.dumps({str(d): round(c, 4) for d, c in fit.items()}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
