"""Distributed correctness on the 8-device virtual CPU mesh (SURVEY.md
section 4): the sharded program must equal the single-device program."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stemgnn_tpu.config import StemGNNConfig
from stemgnn_tpu.models import stemgnn
from stemgnn_tpu.parallel.mesh import auto_mesh_shape, make_mesh
from stemgnn_tpu.parallel.train import make_sharded_eval_step, make_sharded_train_step
from stemgnn_tpu.train.engine import make_train_step
from stemgnn_tpu.train.optim import make_optimizer

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual CPU devices"
)

CFG = StemGNNConfig(units=12, window_size=8, horizon=3, multi_layer=2)


def _setup():
    params = stemgnn.init_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.standard_normal((64, CFG.units)), dtype=jnp.float32)
    hi = jnp.asarray(rng.integers(8, 61, size=8), dtype=jnp.int32)
    return params, data, hi


@pytest.mark.parametrize("mesh_shape", [(8, 1), (1, 8), (2, 4)])
def test_sharded_forward_matches_single_device(mesh_shape):
    params, data, hi = _setup()
    x = data[np.asarray(hi)[:, None] + np.arange(-8, 0)[None, :]]
    f_single, _ = stemgnn.forward(params, CFG, x)
    mesh = make_mesh(*mesh_shape)
    eval_step = make_sharded_eval_step(CFG, mesh)
    f_sharded = eval_step(params, x)
    np.testing.assert_allclose(
        np.asarray(f_sharded), np.asarray(f_single), atol=1e-5, rtol=1e-5
    )


def test_sharded_train_step_matches_single_device():
    """One RMSProp step: sharded (2x4 mesh) grads/params == single-device."""
    params, data, hi = _setup()
    opt = make_optimizer("RMSProp", 1e-3)
    rng = jax.random.PRNGKey(1)

    p1, o1 = jax.tree.map(jnp.copy, params), opt.init(params)
    step_single = make_train_step(CFG, opt, use_pallas=False)
    p1, o1, loss1 = step_single(p1, o1, data, hi, rng)

    mesh = make_mesh(2, 4)
    p2, o2 = jax.tree.map(jnp.copy, params), opt.init(params)
    step_sharded = make_sharded_train_step(CFG, opt, mesh)
    p2, o2, loss2 = step_sharded(p2, o2, data, hi, rng)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4)


def test_engine_train_with_mesh_matches_single_device(tmp_path_factory):
    """The PRODUCTION path: engine.train() with --data_axis 2 --graph_axis 4
    must produce the same per-epoch losses and validation metrics as the
    single-device run (VERDICT r1 item 1 — the mesh is wired into the
    engine, not test-only code)."""
    import dataclasses
    import json
    import os

    from stemgnn_tpu.config import TrainConfig
    from stemgnn_tpu.data import split_by_ratio, synthesize
    from stemgnn_tpu.train import engine

    data = synthesize("tiny", T=220, N=6, seed=0)
    train_data, valid_data, _ = split_by_ratio(data, 7, 2, 1)
    base = TrainConfig(
        dataset="tiny", window_size=8, horizon=3, epoch=2, batch_size=16,
        multi_layer=2, validate_freq=1, lr=1e-3,
    )

    def run(cfg, out):
        metrics, _ = engine.train(train_data, valid_data, cfg, out)
        with open(os.path.join(out, "metrics.jsonl")) as f:
            losses = [
                json.loads(line)["loss"]
                for line in f
                if json.loads(line).get("event") == "epoch"
            ]
        return metrics, losses

    m1, l1 = run(base, str(tmp_path_factory.mktemp("single")))
    cfg_mesh = dataclasses.replace(base, data_axis=2, graph_axis=4)
    m2, l2 = run(cfg_mesh, str(tmp_path_factory.mktemp("mesh")))

    np.testing.assert_allclose(l2, l1, rtol=2e-4)
    np.testing.assert_allclose(m2["mae"], m1["mae"], rtol=2e-4)
    np.testing.assert_allclose(m2["rmse"], m1["rmse"], rtol=2e-4)


def test_engine_train_mesh_indivisible_batch(tmp_path_factory):
    """batch_size not divisible by data_axis falls back to replicated
    batches (graph partition still active) instead of crashing."""
    import dataclasses

    from stemgnn_tpu.config import TrainConfig
    from stemgnn_tpu.data import split_by_ratio, synthesize
    from stemgnn_tpu.train import engine

    data = synthesize("tiny", T=150, N=6, seed=1)
    train_data, valid_data, _ = split_by_ratio(data, 7, 2, 1)
    cfg = TrainConfig(
        dataset="tiny", window_size=8, horizon=3, epoch=1, batch_size=15,
        multi_layer=2, validate_freq=1, lr=1e-3, data_axis=2, graph_axis=2,
    )
    out = str(tmp_path_factory.mktemp("indiv"))
    metrics, _ = engine.train(train_data, valid_data, cfg, out)
    assert np.isfinite(metrics["mae"])


def test_auto_mesh_shape():
    assert auto_mesh_shape(8) == (2, 4)
    assert auto_mesh_shape(2) == (1, 2)
    assert auto_mesh_shape(1) == (1, 1)
    assert auto_mesh_shape(5) == (1, 5)


def test_dryrun_entrypoint():
    """The driver-facing dryrun path must run under the test mesh too."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
