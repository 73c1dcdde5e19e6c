"""Sharded training step: DP over 'data' x node-block graph partition over
'graph', compiled as one SPMD program (collectives inserted by XLA over
ICI/DCN; no reference counterpart — SURVEY.md section 2e)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from stemgnn_tpu.config import StemGNNConfig
from stemgnn_tpu.models import stemgnn
from stemgnn_tpu.parallel.mesh import DATA_AXIS
from stemgnn_tpu.train.engine import gather_windows


def make_sharded_train_step(
    mcfg: StemGNNConfig,
    opt,
    mesh,
    use_pallas: bool = False,
    precision: str = "float32",
    use_ring: bool = False,
):
    """A train step whose batch is sharded over 'data' and whose model
    internals are node-partitioned over 'graph' (via the sharding
    constraints inside stemgnn.forward; `use_ring` swaps the attention
    for the explicit ppermute ring of parallel/ring.py).

    Inputs: params/opt_state/data replicated, `hi` (window end indices,
    [B]) sharded over 'data'. Gradients are summed across 'data' by XLA
    automatically (the loss is a mean over the global batch).
    """
    w, h = mcfg.window_size, mcfg.horizon
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(DATA_AXIS))

    @partial(
        jax.jit,
        donate_argnums=(0, 1),
        in_shardings=(repl, repl, repl, batch_sh, repl),
        out_shardings=(repl, repl, repl),
    )
    def train_step(params, opt_state, data, hi, rng):
        x, y = gather_windows(data, hi, w, h)

        def loss_fn(p):
            forecast, _ = stemgnn.forward(
                p, mcfg, x, training=True, dropout_rng=rng,
                use_pallas=use_pallas, precision=precision, mesh=mesh,
                use_ring=use_ring,
            )
            return jnp.mean((forecast - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def make_sharded_eval_step(
    mcfg: StemGNNConfig, mesh, use_pallas: bool = False, precision: str = "float32"
):
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(DATA_AXIS))

    @partial(jax.jit, in_shardings=(repl, batch_sh), out_shardings=repl)
    def eval_step(params, x):
        forecast, _ = stemgnn.forward(
            params, mcfg, x, training=False, use_pallas=use_pallas,
            precision=precision, mesh=mesh,
        )
        return forecast

    return eval_step
