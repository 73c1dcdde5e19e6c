"""Metric semantics (utils/math_utils.py quirks)."""

import numpy as np

from stemgnn_tpu import metrics


def test_mape_epsilon_and_cap():
    """MAPE = mean(min(|d|/|y| + 1e-5, 5)) — epsilon OUTSIDE the ratio,
    hard cap at 5 (math_utils.py:32-34)."""
    y = np.array([1.0, 1.0, 0.001])
    y_hat = np.array([1.1, 2.0, 100.0])
    vals = np.abs(y_hat - y) / np.abs(y) + 1e-5
    vals = np.where(vals > 5, 5, vals)
    np.testing.assert_allclose(metrics.MAPE(y, y_hat), vals.mean())
    # the third element (ape ~ 1e5) must be capped at exactly 5
    assert metrics.MAPE(np.array([0.001]), np.array([100.0])) == 5.0


def test_mae_rmse():
    y = np.array([[1.0, 2.0], [3.0, 4.0]])
    y_hat = np.array([[2.0, 2.0], [3.0, 2.0]])
    np.testing.assert_allclose(metrics.MAE(y, y_hat), (1 + 0 + 0 + 2) / 4)
    np.testing.assert_allclose(metrics.RMSE(y, y_hat), np.sqrt((1 + 0 + 0 + 4) / 4))
    assert metrics.MAE(y, y_hat).dtype == np.float64


def test_evaluate_axis_dispatch():
    rng = np.random.default_rng(0)
    y = rng.standard_normal((6, 3, 4)) + 10
    y_hat = y + rng.standard_normal((6, 3, 4)) * 0.1
    mape, mae, rmse = metrics.evaluate(y, y_hat)
    assert np.isscalar(mape) or mape.shape == ()
    _, mae_node, _ = metrics.evaluate(y, y_hat, by_node=True)
    assert mae_node.shape == (4,)
    _, mae_step, _ = metrics.evaluate(y, y_hat, by_step=True)
    assert mae_step.shape == (3,)
    _, mae_both, _ = metrics.evaluate(y, y_hat, by_step=True, by_node=True)
    assert mae_both.shape == (3, 4)


def test_masked_mape_dead_code_parity():
    y = np.array([0.0, 1.0, 2.0])
    y_hat = np.array([1.0, 1.0, 1.0])
    out = metrics.masked_MAPE(y, y_hat)
    np.testing.assert_allclose(out, (0.0 + 0.5) / 2)
