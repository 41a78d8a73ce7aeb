"""Direct parity tests for alpha / bias interpolation / LC thresholds,
ported from `javatests/.../internal/hllplus/DataTest.java:33-92` (the
hand-derived kNN interpolation expectations)."""

from __future__ import annotations

import pytest

from zetasketch_spark.hll import alpha, estimate_bias, linear_counting_threshold

TOL = 0.0001


def test_alpha():
    assert alpha(14) == pytest.approx(0.7213, abs=TOL)
    assert alpha(4) == pytest.approx(0.673101517, abs=1e-9)
    assert alpha(5) == pytest.approx(0.697121585, abs=1e-9)
    assert alpha(6) == pytest.approx(0.709209798, abs=1e-9)


def test_estimate_bias_when_exactly_defined():
    assert estimate_bias(193.8044, 6) == pytest.approx(1.8044, abs=TOL)
    assert estimate_bias(738.1256, 10) == pytest.approx(737.1256, abs=TOL)
    assert estimate_bias(14573.7784, 14) == pytest.approx(9248.7784, abs=TOL)


def test_estimate_bias_when_interpolation_needed():
    # left edge, center, and right side of the tables (DataTest.java:47-63)
    assert estimate_bias(25, 5) == pytest.approx(19.5258, abs=TOL)
    assert estimate_bias(1490, 11) == pytest.approx(1456.8144, abs=TOL)
    assert estimate_bias(16300, 14) == pytest.approx(8005.2257, abs=TOL)
    assert estimate_bias(653000, 17) == pytest.approx(-411.7805, abs=TOL)


def test_estimate_bias_zero_when_mean_out_of_range():
    assert estimate_bias(78, 4) == 0
    assert estimate_bias(738, 10) == 0
    assert estimate_bias(1310000, 18) == 0


def test_estimate_bias_zero_when_precision_out_of_range():
    assert estimate_bias(1000, 3) == 0
    assert estimate_bias(1000, 19) == 0


def test_linear_counting_threshold():
    assert linear_counting_threshold(7) == 80
    assert linear_counting_threshold(14) == 11500
    assert linear_counting_threshold(19) == 1310720  # 5m/2 fallback
