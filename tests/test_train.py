"""End-to-end engine tests on a tiny synthetic dataset (SURVEY.md section 4:
loss-curve determinism + checkpoint/norm-stat file contract)."""

import dataclasses
import json
import os
from functools import partial

import numpy as np
import pytest

from stemgnn_tpu.config import TrainConfig
from stemgnn_tpu.data import split_by_ratio, synthesize
from stemgnn_tpu.train import engine
from stemgnn_tpu.train import checkpoint as ckpt


@pytest.fixture(scope="module")
def tiny_cfg():
    return TrainConfig(
        dataset="tiny",
        window_size=8,
        horizon=3,
        epoch=2,
        batch_size=16,
        multi_layer=2,
        validate_freq=1,
        lr=1e-3,
    )


@pytest.fixture(scope="module")
def tiny_data():
    return synthesize("tiny", T=220, N=6, seed=0)


def _split(data):
    return split_by_ratio(data, 7, 2, 1)


def test_train_end_to_end(tmp_path_factory, tiny_cfg, tiny_data):
    out = str(tmp_path_factory.mktemp("train_out"))
    train_data, valid_data, test_data = _split(tiny_data)
    metrics, stats = engine.train(train_data, valid_data, tiny_cfg, out)
    # contract: norm_stat.json written with train-split stats (handler.py:122-124)
    with open(os.path.join(out, "norm_stat.json")) as f:
        loaded = json.load(f)
    np.testing.assert_allclose(loaded["mean"], np.mean(train_data, axis=0))
    # checkpoints: one per epoch + best (handler.py:169,187)
    assert os.path.exists(os.path.join(out, "0_stemgnn.ckpt"))
    assert os.path.exists(os.path.join(out, "1_stemgnn.ckpt"))
    assert os.path.exists(os.path.join(out, "_stemgnn.ckpt"))
    assert set(metrics) == {"mae", "mae_node", "mape", "mape_node", "rmse", "rmse_node"}
    assert np.isfinite(metrics["mae"])
    assert metrics["mae_node"].shape == (6,)
    # metrics JSONL written
    with open(os.path.join(out, "metrics.jsonl")) as f:
        events = [json.loads(line) for line in f]
    assert any(e["event"] == "epoch" for e in events)
    assert any(e["event"] == "validate" for e in events)

    # test() restores the best checkpoint and writes CSV artifacts
    test_out = str(tmp_path_factory.mktemp("test_out"))
    perf = engine.test(test_data, tiny_cfg, out, test_out)
    for name in ("target.csv", "predict.csv", "predict_abs_error.csv", "predict_ape.csv"):
        assert os.path.exists(os.path.join(test_out, name))
    pred = np.loadtxt(os.path.join(test_out, "predict.csv"), delimiter=",")
    n_windows = len(test_data) - tiny_cfg.window_size - tiny_cfg.horizon + 1
    assert pred.shape == (n_windows, 6)
    assert np.isfinite(perf["mae"])


def test_train_determinism(tmp_path_factory, tiny_cfg, tiny_data):
    """Same seed -> identical loss curve and validation metrics."""
    train_data, valid_data, _ = _split(tiny_data)
    results = []
    for i in range(2):
        out = str(tmp_path_factory.mktemp(f"det{i}"))
        m, _ = engine.train(train_data, valid_data, tiny_cfg, out)
        with open(os.path.join(out, "metrics.jsonl")) as f:
            losses = [json.loads(l)["loss"] for l in f if json.loads(l)["event"] == "epoch"]
        results.append((losses, m["mae"]))
    np.testing.assert_allclose(results[0][0], results[1][0], rtol=1e-6)
    np.testing.assert_allclose(results[0][1], results[1][1], rtol=1e-6)


def test_resume(tmp_path_factory, tiny_cfg, tiny_data):
    """--resume restores params + opt state + epoch (framework addition)."""
    train_data, valid_data, _ = _split(tiny_data)
    out = str(tmp_path_factory.mktemp("resume"))
    cfg1 = dataclasses.replace(tiny_cfg, epoch=1)
    engine.train(train_data, valid_data, cfg1, out)
    assert ckpt.latest_epoch(out) == 0
    cfg2 = dataclasses.replace(tiny_cfg, epoch=3, resume=True)
    engine.train(train_data, valid_data, cfg2, out)
    assert ckpt.latest_epoch(out) == 2
    assert os.path.exists(os.path.join(out, "2_stemgnn.ckpt"))


def test_resume_trajectory_equals_uninterrupted(tmp_path_factory, tiny_cfg,
                                                tiny_data):
    """An interrupted-then-resumed run reproduces the uninterrupted run's
    loss trajectory and final metrics EXACTLY: per-epoch shuffle/dropout
    streams are derived statelessly from (seed, epoch), and the checkpoint
    restores params + optimizer state + best-MAE bookkeeping."""
    train_data, valid_data, _ = _split(tiny_data)

    def epoch_losses(out):
        with open(os.path.join(out, "metrics.jsonl")) as f:
            return [json.loads(l)["loss"] for l in f
                    if json.loads(l)["event"] == "epoch"]

    # golden: uninterrupted 4-epoch run
    gold = str(tmp_path_factory.mktemp("gold"))
    cfg4 = dataclasses.replace(tiny_cfg, epoch=4)
    m_gold, _ = engine.train(train_data, valid_data, cfg4, gold)

    # interrupted: 2 epochs, then resume to 4 in the same dir
    out = str(tmp_path_factory.mktemp("interrupted"))
    cfg2 = dataclasses.replace(tiny_cfg, epoch=2)
    engine.train(train_data, valid_data, cfg2, out)
    m_res, _ = engine.train(
        train_data, valid_data,
        dataclasses.replace(tiny_cfg, epoch=4, resume=True), out,
    )

    gold_losses = epoch_losses(gold)
    res_losses = epoch_losses(out)
    assert len(gold_losses) == 4 and len(res_losses) == 4
    np.testing.assert_allclose(res_losses, gold_losses, rtol=1e-6)
    np.testing.assert_allclose(m_res["mae"], m_gold["mae"], rtol=1e-6)
    np.testing.assert_allclose(m_res["rmse"], m_gold["rmse"], rtol=1e-6)


def test_loss_decreases(tmp_path_factory, tiny_data):
    """Sanity: 6 epochs on learnable synthetic data reduces train loss."""
    cfg = TrainConfig(
        dataset="tiny", window_size=8, horizon=3, epoch=6, batch_size=16,
        multi_layer=2, validate_freq=6, lr=1e-3,
    )
    train_data, valid_data, _ = _split(tiny_data)
    out = str(tmp_path_factory.mktemp("decrease"))
    engine.train(train_data, valid_data, cfg, out)
    with open(os.path.join(out, "metrics.jsonl")) as f:
        losses = [json.loads(l)["loss"] for l in f if json.loads(l)["event"] == "epoch"]
    assert losses[-1] < losses[0]


def test_inference_splice_multi_iteration():
    """The autoregressive splice (handler.py:51-61) with len_model_output <
    horizon: the window is shifted left and predictions written into the
    tail, iterating until horizon steps accumulate.

    Fake one-step model on data[t, n] = t: predict last value + 1. The
    3-step rollout must then reproduce the true continuation exactly.
    """
    from stemgnn_tpu.data.pipeline import WindowDataset

    w, h, n = 6, 3, 4
    data = np.tile(np.arange(40, dtype=np.float64)[:, None], (1, n))
    ds = WindowDataset(data, w, h, None, None)

    def one_step_eval(params, x):
        return np.asarray(x)[:, -1:, :] + 1.0

    forecast, target = engine.inference(one_step_eval, None, ds, 8, n, w, h)
    np.testing.assert_allclose(forecast, target)
    assert forecast.shape == (len(ds), h, n)


def test_inference_batched_matches_loop(tiny_data):
    """Device-side batched eval (one scan program + remainder batch) ==
    the per-batch splice loop, including the trailing partial batch."""
    import jax

    from stemgnn_tpu.config import StemGNNConfig
    from stemgnn_tpu.data.pipeline import WindowDataset
    from stemgnn_tpu.models import stemgnn
    from stemgnn_tpu.train.engine import (
        make_eval_epoch_fn, make_eval_step, inference, inference_batched,
    )

    w, h, n = 8, 3, 6
    cfg = StemGNNConfig(units=n, window_size=w, horizon=h, multi_layer=2)
    params = stemgnn.init_params(jax.random.PRNGKey(3), cfg)
    ds = WindowDataset(tiny_data[:80], w, h, "z_score", None)
    bs = 16  # len(ds) = 70 -> 4 full batches + remainder of 6
    assert len(ds) % bs != 0
    eval_step = make_eval_step(cfg, False)
    eval_epoch_fn = make_eval_epoch_fn(cfg, False)
    f_loop, t_loop = inference(eval_step, params, ds, bs, n, w, h)
    f_fast, t_fast = inference_batched(eval_epoch_fn, eval_step, params, ds, bs)
    np.testing.assert_allclose(t_fast, t_loop, rtol=1e-6)
    np.testing.assert_allclose(f_fast, f_loop, rtol=1e-5, atol=1e-6)


def test_empty_data_raises(tiny_cfg):
    with pytest.raises(Exception, match="Cannot organize enough training data"):
        engine.train(np.zeros((0, 4)), np.ones((50, 4)), tiny_cfg, None)
    with pytest.raises(Exception, match="Cannot organize enough validation data"):
        engine.train(np.ones((50, 4)), np.zeros((0, 4)), tiny_cfg, None)


def test_async_checkpointer_snapshots_before_mutation(tmp_path):
    """AsyncCheckpointer must copy the pytree at submit time: running a
    DONATING jitted step on the submitted params afterwards (the real
    hazard — the trainer donates its buffers to the next step) must not
    leak into the checkpoint file."""
    import jax
    import jax.numpy as jnp

    out = str(tmp_path)
    params = {"w": jnp.arange(4.0)}
    saver = ckpt.AsyncCheckpointer()
    saver.submit(out, params, epoch=0, meta={"epoch": 0})

    @partial(jax.jit, donate_argnums=(0,))
    def donating_step(p):
        return jax.tree.map(lambda a: a * 0.0, p)

    params = donating_step(params)  # invalidates the submitted buffers
    np.testing.assert_allclose(np.asarray(params["w"]), 0.0)
    saver.close()
    restored, _, meta = ckpt.load(out, {"w": jnp.zeros(4)}, epoch=0)
    np.testing.assert_allclose(np.asarray(restored["w"]), [0.0, 1.0, 2.0, 3.0])
    assert meta["epoch"] == 0


def test_async_checkpointer_close_surfaces_error_and_joins(tmp_path):
    """A failing write must raise from close() AND leave the worker thread
    stopped (the sentinel is enqueued before raising — advisor r1)."""
    saver = ckpt.AsyncCheckpointer()
    bad_dir = os.path.join(str(tmp_path), "file_not_dir")
    with open(bad_dir, "w") as f:
        f.write("x")  # makedirs inside save() will fail on this path
    import jax.numpy as jnp

    saver.submit(bad_dir, {"w": jnp.zeros(2)}, epoch=0)
    with pytest.raises(BaseException):
        saver.close()
    assert not saver._thread.is_alive()


def test_ckpt_cadence(tmp_path_factory, tiny_data):
    """ckpt_every=2 writes epochs 1, 3 (and always the final epoch)."""
    train_data, valid_data, _ = _split(tiny_data)
    out = str(tmp_path_factory.mktemp("cadence"))
    cfg = TrainConfig(
        dataset="tiny", window_size=8, horizon=3, epoch=4, batch_size=16,
        multi_layer=2, validate_freq=4, lr=1e-3, ckpt_every=2,
    )
    engine.train(train_data, valid_data, cfg, out)
    present = {e for e in range(4) if os.path.exists(os.path.join(out, f"{e}_stemgnn.ckpt"))}
    assert present == {1, 3}


def test_early_stop_checkpoints_final_epoch(tmp_path_factory, tiny_data):
    """With ckpt_every>1, the early-stop break must still checkpoint the
    epoch it stopped on so --resume sees the final state (advisor r1)."""
    train_data, valid_data, _ = _split(tiny_data)
    out = str(tmp_path_factory.mktemp("es_backstop"))
    cfg = TrainConfig(
        dataset="tiny", window_size=8, horizon=3, epoch=10, batch_size=16,
        multi_layer=2, validate_freq=1, lr=0.0,  # lr=0: MAE never improves
        ckpt_every=5, early_stop=True, early_stop_step=1,
    )
    engine.train(train_data, valid_data, cfg, out)
    # epoch 0 sets best; epoch 1 doesn't improve -> stop at epoch 1, which
    # the every-5 cadence would have skipped
    assert ckpt.latest_epoch(out) == 1


def test_sync_ckpt_mode_equivalent(tmp_path_factory, tiny_cfg, tiny_data):
    """ckpt_async=False writes the same files through the blocking path."""
    train_data, valid_data, _ = _split(tiny_data)
    out = str(tmp_path_factory.mktemp("sync_ckpt"))
    cfg = dataclasses.replace(tiny_cfg, ckpt_async=False, epoch=1)
    engine.train(train_data, valid_data, cfg, out)
    assert os.path.exists(os.path.join(out, "0_stemgnn.ckpt"))
    assert os.path.exists(os.path.join(out, "_stemgnn.ckpt"))


def test_dropout_seed_decouples_stream(tmp_path_factory, tiny_cfg, tiny_data):
    """--dropout_seed (variance-bisect knob, config.py): -1 (default)
    reproduces the coupled stream bitwise; >=0 changes ONLY the dropout
    bitstream (init/shuffle stay seed-derived), so the loss trajectory
    diverges from the default run."""
    train_data, valid_data, _ = _split(tiny_data)

    def losses_of(cfg):
        out = str(tmp_path_factory.mktemp("ds"))
        engine.train(train_data, valid_data, cfg, out)
        with open(os.path.join(out, "metrics.jsonl")) as f:
            return [json.loads(l)["loss"] for l in f
                    if json.loads(l)["event"] == "epoch"]

    base = losses_of(tiny_cfg)
    same = losses_of(dataclasses.replace(tiny_cfg, dropout_seed=-1))
    other = losses_of(dataclasses.replace(tiny_cfg, dropout_seed=1234))
    np.testing.assert_allclose(base, same, rtol=0)  # bitwise default
    assert not np.allclose(base, other, rtol=1e-6)  # stream decoupled


def test_shuffle_seed_decouples_stream(tmp_path_factory, tiny_cfg, tiny_data):
    """--shuffle_seed twin of test_dropout_seed_decouples_stream (round-4
    advisor low): -1 reproduces the coupled stream bitwise; >=0 changes
    ONLY the epoch batch order (init/dropout stay seed-derived)."""
    train_data, valid_data, _ = _split(tiny_data)

    def losses_of(cfg):
        out = str(tmp_path_factory.mktemp("ss"))
        engine.train(train_data, valid_data, cfg, out)
        with open(os.path.join(out, "metrics.jsonl")) as f:
            return [json.loads(l)["loss"] for l in f
                    if json.loads(l)["event"] == "epoch"]

    base = losses_of(tiny_cfg)
    same = losses_of(dataclasses.replace(tiny_cfg, shuffle_seed=-1))
    other = losses_of(dataclasses.replace(tiny_cfg, shuffle_seed=4321))
    np.testing.assert_allclose(base, same, rtol=0)  # bitwise default
    assert not np.allclose(base, other, rtol=1e-6)  # batch order decoupled


def test_init_stream_knob(tmp_path_factory, tiny_cfg, tiny_data):
    """--init_stream: 'torch' (default) == explicit torch bitwise;
    'threefry' draws a different init so the trajectory diverges;
    anything else raises."""
    train_data, valid_data, _ = _split(tiny_data)

    def losses_of(cfg):
        out = str(tmp_path_factory.mktemp("is"))
        engine.train(train_data, valid_data, cfg, out)
        with open(os.path.join(out, "metrics.jsonl")) as f:
            return [json.loads(l)["loss"] for l in f
                    if json.loads(l)["event"] == "epoch"]

    base = losses_of(tiny_cfg)
    same = losses_of(dataclasses.replace(tiny_cfg, init_stream="torch"))
    other = losses_of(dataclasses.replace(tiny_cfg, init_stream="threefry"))
    np.testing.assert_allclose(base, same, rtol=0)
    assert not np.allclose(base, other, rtol=1e-6)
    with pytest.raises(ValueError, match="init_stream"):
        engine.train(train_data, valid_data,
                     dataclasses.replace(tiny_cfg, init_stream="bogus"),
                     str(tmp_path_factory.mktemp("bad")))
