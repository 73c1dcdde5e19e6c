"""Data pipeline semantics (forecast_dataloader.py + main.py ingest/split)."""

import numpy as np
import pytest

from stemgnn_tpu.data import pipeline as dp
from stemgnn_tpu.data.synthetic import ensure_dataset, synthesize


def test_minmax_epsilon_asymmetry():
    """normalize uses +1e-5, de-normalize +1e-8 (forecast_dataloader.py:11,29)."""
    data = np.array([[0.0, 10.0], [5.0, 20.0], [10.0, 30.0]])
    stats = {"min": data.min(0), "max": data.max(0)}
    norm, _ = dp.normalized(data.copy(), "min_max", dict(stats))
    expected = np.clip((data - data.min(0)) / (data.max(0) - data.min(0) + 1e-5), 0, 1)
    np.testing.assert_allclose(norm, expected)
    denorm = dp.de_normalized(norm, "min_max", stats)
    expected_back = norm * (data.max(0) - data.min(0) + 1e-8) + data.min(0)
    np.testing.assert_allclose(denorm, expected_back)
    # round trip is NOT exact because of the epsilon mismatch — by design
    max_err = np.abs(denorm - data).max()
    assert 1e-8 < max_err < 1e-3


def test_minmax_clips_to_unit_interval():
    data = np.array([[0.0], [10.0]])
    stats = {"min": np.array([2.0]), "max": np.array([8.0])}
    norm, _ = dp.normalized(data.copy(), "min_max", stats)
    assert norm.min() >= 0.0 and norm.max() <= 1.0


def test_zscore_zero_std_replaced_by_one():
    """per-column std==0 -> divide by 1 (forecast_dataloader.py:19)."""
    data = np.array([[1.0, 5.0], [1.0, 7.0], [1.0, 9.0]])
    stats = {"mean": data.mean(0).tolist(), "std": data.std(0).tolist()}
    norm, stats_out = dp.normalized(data.copy(), "z_score", stats)
    np.testing.assert_allclose(norm[:, 0], 0.0)  # (1-1)/1
    assert stats_out["std"][0] == 1.0
    back = dp.de_normalized(norm, "z_score", stats_out)
    np.testing.assert_allclose(back, data)


def test_window_end_indices():
    """hi in [W, T-horizon] (forecast_dataloader.py:68-73)."""
    idx = dp.window_end_indices(df_length=20, window_size=5, horizon=3)
    assert idx[0] == 5 and idx[-1] == 17 and len(idx) == 13
    idx2 = dp.window_end_indices(20, 5, 3, interval=2)
    np.testing.assert_array_equal(idx2, [5, 7, 9, 11, 13, 15, 17][: len(idx2)])
    assert len(idx2) == 13 // 2


def test_ffill_bfill():
    data = np.array([[np.nan, 2.0], [1.0, np.nan], [np.nan, 4.0]])
    out = dp.ffill_bfill(data)
    np.testing.assert_allclose(out, [[1.0, 2.0], [1.0, 2.0], [1.0, 4.0]])


def test_split_ratios():
    """Row-truncation 7/2/1 split (main.py:45-50). Note the reference's
    float arithmetic: 7/10 + 2/10 = 0.8999... so int(0.9*100) == 89 and the
    valid split gets 19 rows, not 20 — replicated exactly."""
    data = np.arange(100 * 2).reshape(100, 2)
    tr, va, te = dp.split_by_ratio(data, 7, 2, 1)
    assert len(tr) == 70 and len(va) == 19 and len(te) == 11
    np.testing.assert_array_equal(np.concatenate([tr, va, te]), data)


def test_csv_header_row_consumed(tmp_path):
    """pd.read_csv default header=0 drops the first row (main.py:42)."""
    path = tmp_path / "t.csv"
    arr = np.arange(12.0).reshape(4, 3)
    np.savetxt(path, arr, delimiter=",")
    loaded = dp.load_csv(str(path))
    assert loaded.shape == (3, 3)  # first row eaten as header
    np.testing.assert_allclose(loaded, arr[1:])


def test_window_dataset_contract():
    rng = np.random.default_rng(0)
    raw = rng.standard_normal((50, 4))
    stats = dp.compute_norm_stats(raw, "z_score")
    ds = dp.WindowDataset(raw, window_size=8, horizon=3, normalize_method="z_score",
                          norm_statistic=stats)
    x, y = ds.get(0)
    assert x.shape == (8, 4) and y.shape == (3, 4)
    hi = ds.x_end_idx[0]
    np.testing.assert_allclose(x, ds.data[hi - 8 : hi])
    np.testing.assert_allclose(y, ds.data[hi : hi + 3])
    # batching: full coverage, ordered when not shuffled
    batches = ds.epoch_batches(16, shuffle=False)
    flat = np.concatenate(batches)
    np.testing.assert_array_equal(flat, ds.x_end_idx)
    # shuffled: same multiset, deterministic under seed
    b1 = ds.epoch_batches(16, shuffle=True, rng=np.random.default_rng(1))
    b2 = ds.epoch_batches(16, shuffle=True, rng=np.random.default_rng(1))
    np.testing.assert_array_equal(np.concatenate(b1), np.concatenate(b2))
    assert sorted(np.concatenate(b1).tolist()) == sorted(ds.x_end_idx.tolist())


def test_synthetic_deterministic(tmp_path):
    a = synthesize("ECG_data", T=100, N=8)
    b = synthesize("ECG_data", T=100, N=8)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (100, 8)
    path = ensure_dataset("COVID-19", str(tmp_path))
    loaded = dp.load_csv(path)
    assert loaded.shape[1] == 25


def test_real_csv_takes_precedence_over_synthesis(tmp_path):
    """VERDICT r3 item 8: ensure_dataset must load a user-dropped REAL CSV
    verbatim and never overwrite it with synthesis — the path the
    published-results table (BASELINE.md) will be validated through once
    real data is available (the bundled CSVs are stripped from the
    reference mount, /root/reference/.MISSING_LARGE_BLOBS:1-2)."""
    # hand-made "real" ECG_data.csv: tiny, with a header row like the
    # bundled originals (pd.read_csv consumes row 0 — main.py:42)
    rows = np.arange(12, dtype=np.float64).reshape(4, 3) * 1.5 + 7.0
    path = tmp_path / "ECG_data.csv"
    header = "a,b,c"
    np.savetxt(path, rows, delimiter=",", header=header, comments="")
    before = path.read_bytes()

    got = ensure_dataset("ECG_data", str(tmp_path))
    assert got == str(path)
    assert path.read_bytes() == before  # untouched — no re-synthesis
    loaded = dp.load_csv(got)
    # loaded verbatim (header consumed, data rows intact — NOT the
    # synthetic 5000x140 stand-in)
    np.testing.assert_allclose(loaded, rows)
