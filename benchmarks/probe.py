"""Hot-path latency decomposition on the attached device.

Times jitted sub-programs of the ECG flagship config to attribute step
latency (SURVEY.md §3.3 hot loops): the serial node-axis GRU scan, the
attention+Laplacian+cheb stack, one StemGNN block, the full forward, and
the full train step. Used to pick Pallas targets — the N-step GRU
recurrence is the only serial dependency chain in the model.

Usage: python benchmarks/probe.py [--batch 32] [--n 140] [--steps 50] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, args, steps):
    out = fn(*args)
    jax_block(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax_block(out)
    return (time.perf_counter() - t0) / steps * 1e3  # ms


def jax_block(out):
    import jax

    # force a real value transfer (tunneled backend; see bench.py)
    leaf = jax.tree.leaves(out)[0]
    float(leaf.reshape(-1)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--n", type=int, default=140)
    ap.add_argument("--window", type=int, default=12)
    ap.add_argument("--horizon", type=int, default=3)
    ap.add_argument("--multi", type=int, default=5)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--pallas_gru", action="store_true",
                    help="force the fused Pallas GRU kernel (ops/pallas_gru.py)")
    ap.add_argument("--kernels", action="store_true",
                    help="per-kernel timings: each Pallas kernel vs jnp twin")
    ap.add_argument("--bf16", action="store_true",
                    help="probe the bfloat16 compute path (the bench default)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from stemgnn_tpu.config import StemGNNConfig
    from stemgnn_tpu.models import stemgnn
    from stemgnn_tpu import ops
    from stemgnn_tpu.train.engine import make_train_step
    from stemgnn_tpu.train.optim import make_optimizer

    cfg = StemGNNConfig(units=args.n, window_size=args.window,
                        horizon=args.horizon, multi_layer=args.multi)
    params = stemgnn.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (args.batch, args.window, args.n))

    up = args.pallas
    prec = "bfloat16" if args.bf16 else "float32"
    rows = {}

    gru_impl = ops.select_gru(up, cfg.units, force_pallas_gru=args.pallas_gru)
    gru_fn = jax.jit(lambda p, xx: gru_impl(p["gru"], xx))
    rows["gru_scan_fwd"] = timeit(gru_fn, (params, x), args.steps)

    if args.kernels:
        # per-kernel timing (SURVEY §5): each Pallas kernel vs its jnp twin
        # as standalone jitted programs on identical inputs (CPU: interpret
        # mode — correctness smoke only, timings meaningful on TPU)
        import contextlib

        from jax.experimental.pallas import tpu as pltpu

        from stemgnn_tpu.ops import jnp_impl

        interp = (pltpu.force_tpu_interpret_mode() if args.cpu
                  else contextlib.nullcontext())
        interp.__enter__()

        k4 = jax.random.normal(jax.random.PRNGKey(4),
                               (args.batch, 4, args.n, args.window))
        glu = params["blocks"][0]["glu"]
        spe_p = jax.jit(ops.select_spe_seq_cell(True, prec),
                        static_argnums=(2,))
        spe_j = jax.jit(jnp_impl.spe_seq_cell, static_argnums=(2,))
        rows["kernel spe_seq pallas"] = timeit(spe_p, (k4, glu, args.multi), args.steps)
        rows["kernel spe_seq jnp"] = timeit(spe_j, (k4, glu, args.multi), args.steps)

        enc = jax.random.normal(jax.random.PRNGKey(5), (args.batch, args.n, args.n))
        att_p = jax.jit(ops.select_attention(True), static_argnums=(3,))
        att_j = jax.jit(jnp_impl.attention_adjacency, static_argnums=(3,))
        wk, wq = params["weight_key"], params["weight_query"]
        rows["kernel attention pallas"] = timeit(att_p, (enc, wk, wq, 0.2), args.steps)
        rows["kernel attention jnp"] = timeit(att_j, (enc, wk, wq, 0.2), args.steps)

        mul_l4 = jax.random.normal(jax.random.PRNGKey(6), (4, args.n, args.n))
        mul_l4 = mul_l4.at[0].set(0.0)
        xf = jax.random.normal(jax.random.PRNGKey(7), (args.batch, args.n, args.window))
        gc_p = jax.jit(ops.select_graph_conv(True, prec))
        gc_j = jax.jit(jnp_impl.cheb_graph_conv)
        rows["kernel cheb_conv pallas"] = timeit(gc_p, (mul_l4, xf), args.steps)
        rows["kernel cheb_conv jnp"] = timeit(gc_j, (mul_l4, xf), args.steps)
        interp.__exit__(None, None, None)

    lat_fn = jax.jit(lambda p, xx: stemgnn.latent_correlation_layer(
        p, cfg, xx, training=False, use_pallas=up))
    rows["latent_layer_fwd (gru+attn+lap+cheb)"] = timeit(lat_fn, (params, x), args.steps)

    mul_l, _ = lat_fn(params, x)
    feat = jnp.transpose(x, (0, 2, 1))
    blk_fn = jax.jit(lambda p, f, m: stemgnn.block_forward(
        p["blocks"][0], cfg, f, m, 0, use_pallas=up, precision=prec)[0])
    rows["block0_fwd"] = timeit(blk_fn, (params, feat, mul_l), args.steps)

    fwd_fn = jax.jit(lambda p, xx: stemgnn.forward(
        p, cfg, xx, use_pallas=up, precision=prec)[0])
    rows["full_forward"] = timeit(fwd_fn, (params, x), args.steps)

    grad_fn = jax.jit(lambda p, xx: jax.grad(
        lambda pp: jnp.sum(stemgnn.forward(
            pp, cfg, xx, use_pallas=up, precision=prec)[0] ** 2)
    )(p))
    rows["forward+backward"] = timeit(grad_fn, (params, x), args.steps)

    # GRU-only backward: isolates the reverse serial chain
    gru_grad = jax.jit(lambda p, xx: jax.grad(
        lambda pp: jnp.sum(gru_impl(pp["gru"], xx) ** 2))(p))
    rows["gru_scan_fwd+bwd"] = timeit(gru_grad, (params, x), args.steps)

    opt = make_optimizer("RMSProp", 1e-4)
    opt_state = opt.init(params)
    data = jax.random.normal(jax.random.PRNGKey(2), (1024, args.n))
    hi = jnp.arange(args.window, args.window + args.batch, dtype=jnp.int32)
    step = make_train_step(cfg, opt, up, prec)
    p2, o2 = params, opt_state

    def run_step(p, o):
        return step(p, o, data, hi, jax.random.PRNGKey(3))

    # donation: re-feed outputs
    out = run_step(p2, o2)
    jax_block(out[2])
    t0 = time.perf_counter()
    p2, o2, loss = out
    for _ in range(args.steps):
        p2, o2, loss = run_step(p2, o2)
    float(loss)
    rows["train_step (fwd+bwd+rmsprop)"] = (time.perf_counter() - t0) / args.steps * 1e3

    print(f"device={jax.devices()[0]} batch={args.batch} N={args.n} pallas={up}")
    for k, v in rows.items():
        print(f"{k:42s} {v:8.3f} ms")


if __name__ == "__main__":
    main()
