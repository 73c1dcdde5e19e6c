"""Optimizer parity with torch (handler.py:126-130 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from stemgnn_tpu.train.optim import decayed_lr, make_optimizer


def _run_jax(opt_name, lr, grads_seq, p0):
    opt = make_optimizer(opt_name, lr)
    params = {"p": jnp.asarray(p0)}
    state = opt.init(params)
    for g in grads_seq:
        updates, state = opt.update({"p": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
    return np.asarray(params["p"])


def _run_torch(opt_cls, lr, grads_seq, p0, **kw):
    torch = pytest.importorskip("torch")
    p = torch.nn.Parameter(torch.tensor(p0))
    opt = opt_cls([p], lr=lr, **kw)
    for g in grads_seq:
        opt.zero_grad()
        p.grad = torch.tensor(g)
        opt.step()
    return p.detach().numpy()


@pytest.mark.parametrize("name", ["RMSProp", "Adam"])
def test_matches_torch(name):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    p0 = rng.standard_normal(7).astype(np.float32)
    grads = [rng.standard_normal(7).astype(np.float32) for _ in range(12)]
    got = _run_jax(name, 1e-3, grads, p0)
    if name == "RMSProp":
        expected = _run_torch(torch.optim.RMSprop, 1e-3, grads, p0, eps=1e-8)
    else:
        expected = _run_torch(torch.optim.Adam, 1e-3, grads, p0, betas=(0.9, 0.999))
    np.testing.assert_allclose(got, expected, atol=1e-6, rtol=1e-5)


def test_lr_decay_schedule():
    """gamma stepped every `decay_step` epochs (handler.py:170-171)."""
    assert decayed_lr(1e-4, 0, 5, 0.5) == 1e-4
    assert decayed_lr(1e-4, 4, 5, 0.5) == 1e-4
    assert decayed_lr(1e-4, 5, 5, 0.5) == 0.5e-4
    assert decayed_lr(1e-4, 14, 5, 0.5) == 0.25e-4


def test_dynamic_lr_no_reinit():
    """LR is a mutable hyperparameter on the opt state."""
    opt = make_optimizer("RMSProp", 1e-2)
    params = {"p": jnp.ones(3)}
    state = opt.init(params)
    state.hyperparams["learning_rate"] = jnp.asarray(5e-3)
    updates, _ = opt.update({"p": jnp.ones(3)}, state, params)
    # first step: nu = 0.01*g^2 -> update = -lr*g/(sqrt(0.01)+eps) ~ -lr*10
    np.testing.assert_allclose(np.asarray(updates["p"]), -5e-2, rtol=1e-4)
