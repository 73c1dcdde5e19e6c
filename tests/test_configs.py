"""Config-surface coverage: the reference's non-default paths — COVID-19
(window 28 == horizon 28, the full-window autoregressive splice), min_max
normalization, Adam optimizer, early stopping, no-normalization mode."""

import dataclasses
import json
import os

import numpy as np
import pytest

from stemgnn_tpu.config import TrainConfig
from stemgnn_tpu.data import split_by_ratio, synthesize
from stemgnn_tpu.train import engine


@pytest.fixture(scope="module")
def covid_like():
    # COVID-19 shape regime: short T, 25 nodes (README.md:80). T=700 so
    # the 10% test split (70 rows) fits window 28 + horizon 28 windows
    # (the real COVID-19 T=335 leaves the test split too short for W=28
    # windows — the reference crashes there identically).
    return synthesize("COVID-19", T=700, N=25)


def test_covid_long_horizon(tmp_path_factory, covid_like):
    """window 28 / horizon 28: the model emits 28 steps at once and the
    splice replaces the ENTIRE window (handler.py:56-58 with W==len_out)."""
    cfg = TrainConfig(
        dataset="covid", window_size=28, horizon=28, epoch=1, batch_size=8,
        multi_layer=2, validate_freq=1, lr=1e-3,
    )
    tr, va, te = split_by_ratio(covid_like, 7, 2, 1)
    out = str(tmp_path_factory.mktemp("covid"))
    metrics, _ = engine.train(tr, va, cfg, out)
    assert np.isfinite(metrics["mae"])
    test_out = str(tmp_path_factory.mktemp("covid_test"))
    perf = engine.test(te, cfg, out, test_out)
    assert np.isfinite(perf["mae"])
    # 28 forecast steps per window
    pred = np.loadtxt(os.path.join(test_out, "predict.csv"), delimiter=",")
    assert pred.ndim == 2 and pred.shape[1] == 25


def test_min_max_normalization(tmp_path_factory, covid_like):
    cfg = TrainConfig(
        dataset="mm", window_size=8, horizon=3, epoch=1, batch_size=8,
        multi_layer=2, validate_freq=1, norm_method="min_max", lr=1e-3,
    )
    tr, va, _ = split_by_ratio(covid_like, 7, 2, 1)
    out = str(tmp_path_factory.mktemp("mm"))
    metrics, stats = engine.train(tr, va, cfg, out)
    assert set(stats) == {"min", "max"}
    with open(os.path.join(out, "norm_stat.json")) as f:
        loaded = json.load(f)
    np.testing.assert_allclose(loaded["min"], np.min(tr, axis=0))
    assert np.isfinite(metrics["mae"])


def test_no_normalization(tmp_path_factory, covid_like):
    cfg = TrainConfig(
        dataset="raw", window_size=8, horizon=3, epoch=1, batch_size=8,
        multi_layer=2, validate_freq=1, norm_method="", lr=1e-6,
    )
    tr, va, _ = split_by_ratio(covid_like, 7, 2, 1)
    out = str(tmp_path_factory.mktemp("raw"))
    metrics, stats = engine.train(tr, va, cfg, out)
    assert stats is None
    assert not os.path.exists(os.path.join(out, "norm_stat.json"))
    assert np.isfinite(metrics["mae"])


def test_adam_optimizer(tmp_path_factory, covid_like):
    cfg = TrainConfig(
        dataset="adam", window_size=8, horizon=3, epoch=2, batch_size=8,
        multi_layer=2, validate_freq=2, optimizer="Adam", lr=1e-3,
    )
    tr, va, _ = split_by_ratio(covid_like, 7, 2, 1)
    out = str(tmp_path_factory.mktemp("adam"))
    metrics, _ = engine.train(tr, va, cfg, out)
    assert np.isfinite(metrics["mae"])


def test_early_stop(tmp_path_factory, covid_like):
    """--early_stop with early_stop_step=1 halts after the first
    non-improving validation (handler.py:189 — the reference crashes here
    because early_stop_step was never declared; we fix that)."""
    cfg = TrainConfig(
        dataset="es", window_size=8, horizon=3, epoch=50, batch_size=8,
        multi_layer=2, validate_freq=1, early_stop=True, early_stop_step=1,
        lr=0.0,  # lr 0 -> no improvement -> stops at the 2nd validation
    )
    tr, va, _ = split_by_ratio(covid_like, 7, 2, 1)
    out = str(tmp_path_factory.mktemp("es"))
    engine.train(tr, va, cfg, out)
    epochs_run = [
        int(n.split("_")[0]) for n in os.listdir(out)
        if n.endswith("_stemgnn.ckpt") and n.split("_")[0].isdigit()
    ]
    assert max(epochs_run) <= 2  # stopped long before epoch 50
