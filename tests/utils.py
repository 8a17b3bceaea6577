"""Shared test helpers (golden-first pattern, SURVEY.md §4.1)."""

import numpy as np


def assert_close(actual, expected, rtol=1e-2, atol=1e-2, name=""):
    actual = np.asarray(actual, dtype=np.float32)
    expected = np.asarray(expected, dtype=np.float32)
    np.testing.assert_allclose(actual, expected, rtol=rtol, atol=atol, err_msg=name)


def calc_diff(x, y):
    """Relative cosine-style diff used by the reference's deepep tests
    (tests/python/deepep/utils.py)."""
    x = np.asarray(x, dtype=np.float64).ravel()
    y = np.asarray(y, dtype=np.float64).ravel()
    denom = (x * x).sum() + (y * y).sum()
    if denom == 0:
        return 0.0
    return 1 - 2 * float((x * y).sum()) / float(denom)
