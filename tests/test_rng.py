"""Statistical checks on the counter-based RNG (core/rng.py)."""

import numpy as np

from take_tpu.core import rng


def _u(seed, pix, samp, counter):
    s = rng.make_stream(seed, pix, samp)
    return np.asarray(rng.uniform(s, counter))


def test_uniform_range_and_moments():
    pix = np.arange(200_000)
    u = _u(0, pix, 0, 5)
    assert (u >= 0).all() and (u < 1).all()
    assert abs(u.mean() - 0.5) < 2e-3
    assert abs(u.var() - 1.0 / 12) < 2e-3


def test_dims_uncorrelated():
    pix = np.arange(100_000)
    s = rng.make_stream(3, pix, 0)
    us = [np.asarray(rng.uniform(s, c)) for c in range(8)]
    for i in range(8):
        for j in range(i + 1, 8):
            corr = np.corrcoef(us[i], us[j])[0, 1]
            assert abs(corr) < 0.01, (i, j, corr)


def test_streams_uncorrelated_across_samples():
    pix = np.arange(100_000)
    a = _u(0, pix, 0, 4)
    b = _u(0, pix, 1, 4)
    assert abs(np.corrcoef(a, b)[0, 1]) < 0.01


def test_deterministic():
    assert (_u(7, np.arange(100), 3, 9) == _u(7, np.arange(100), 3, 9)).all()


def test_seed_changes_everything():
    a = _u(1, np.arange(1000), 0, 0)
    b = _u(2, np.arange(1000), 0, 0)
    assert (a != b).mean() > 0.99


def test_equidistribution_chi2():
    """64-bin chi-square on a big sample — catches gross nonuniformity."""
    u = _u(11, np.arange(1_000_000), 2, 6)
    counts, _ = np.histogram(u, bins=64, range=(0, 1))
    expected = u.size / 64
    chi2 = ((counts - expected) ** 2 / expected).sum()
    # dof=63, mean 63, std ~11.2; accept within 6 sigma
    assert chi2 < 63 + 6 * np.sqrt(2 * 63), chi2
