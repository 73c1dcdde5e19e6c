"""Fused Pallas GRU scan — the serial hot spot of the latent layer.

The reference runs `nn.GRU` over the NODE axis (base_model.py:137): N
sequential steps whose per-step work is three tiny [B,N]x[N,N] matmuls.
Probe on the attached v5e (benchmarks/probe.py): the XLA `lax.scan`
version costs ~0.7 ms fwd / ~1.0 ms fwd+bwd of a 2.65 ms train step —
the recurrence is latency-bound on per-iteration loop overhead, not
FLOPs.

Kernel design: ONE `pallas_call` whose grid is the time axis. TPU grids
execute sequentially, which is exactly a recurrence: the hidden state
lives in a VMEM scratch buffer across grid steps, the gate weights stay
VMEM-resident, and the pipeline double-buffers the per-step input
projection block HBM->VMEM while the previous step computes. The input
projection itself (x @ W_ih + b_ih, parallel over all N steps) stays in
XLA as one big MXU matmul.

Backward (v2): the forward EMITS its gate activations
(r, z, hpn, c, h_prev - c) as a second output, so the reverse-grid
backward kernel is pure elementwise math plus the three unavoidable
dgate @ A_g^T matmuls on the dh critical path — no gate-recompute
matmuls (halves the backward's MXU work: 6 -> 3 dots/step) and no
streamed h / previous-block inputs at all. Weight/bias gradients are
single XLA einsums over the saved forward states (better MXU shapes
than per-step accumulators).

Gate math (torch GRU, gate order r,z,n — matches models/stemgnn.py):
    r = sigmoid(x_r + h @ A_r + b_r)
    z = sigmoid(x_z + h @ A_z + b_z)
    hpn = h @ A_n + b_n
    c = tanh(x_n + r * hpn)
    h' = (1 - z) * c + z * h

VMEM budget: weights 3*N*N fp32 + the double-buffered per-step blocks
must fit in ~16 MB — the dispatch in ops/__init__.py uses this kernel
for N <= MAX_UNITS and falls back to the lax.scan twin above that (the
sparse stretch path keeps its own).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 3*N*N fp32 weights + double-buffered blocks must fit in ~16 MB VMEM
MAX_UNITS = 512
# time steps per grid iteration: amortizes per-step pipeline overhead
# (measured 2x slower at U=1 than the XLA scan; the recurrence math is
# identical — U only changes the grid/block granularity). The time axis
# is zero-padded to a multiple of U; padded steps compute garbage h that
# nothing reads, and in the backward the padded cotangents are zero so
# the dh carry stays exact (see _vjp_bwd).
# Round-5 in-step A/B (benchmarks/gru_ab.json, flagship pallas-bf16):
# U=16 1.131 ms / U=4 1.141 / U=8 1.149 vs lax.scan 1.196-1.25 — the
# kernel now WINS composed (~5%; round 2's composed loss predated the
# folded-DFT spectral kernel and chunked-epoch program), so it is the
# default GRU under --use_pallas (config.pallas_gru), with the unroll
# CAPPED by the VMEM budget below (round-5 follow-up: U=16 at B>=128
# put 20.1 MB of double-buffered blocks on the 16 MB scoped-VMEM stack
# and failed real-TPU compilation; _pick_unroll chooses the largest
# fitting U, and gru_over_nodes_pallas falls back to the lax.scan twin
# when even U=1 cannot fit).
UNROLL = 16
# saved forward activations per step: r, z, hpn, c, (h_prev - c)
N_SAVED = 5
# conservative per-kernel scoped-VMEM budget (hardware limit 16 MB; the
# margin covers Mosaic's own stack temporaries and sublane padding)
VMEM_BUDGET_BYTES = 14 * 2**20


def _pick_unroll(b: int, nh: int) -> int | None:
    """Largest grid unroll whose VMEM working set fits the budget.

    Per grid step the fwd kernel holds xp [U,3,B,H] + out [U,B,H] +
    sv [U,5,B,H] blocks (9·U·B·H floats), double-buffered by the
    pipeline, plus the resident fused weights [H,3H] and the h scratch
    [B,H]; the bwd kernel's set (sv + g + dxp) has the same 9·U·B·H
    shape. Deterministic in (b, nh) so the custom_vjp fwd and bwd pick
    the same U."""
    fixed = 4 * (3 * nh * nh + b * nh)
    for u in (UNROLL, 8, 4, 2, 1):
        if fixed + 2 * 4 * u * 9 * b * nh <= VMEM_BUDGET_BYTES:
            return u
    return None


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot_t(a, b):
    """a @ b.T on the MXU without materializing the transpose."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _fwd_kernel(xp_ref, a_ref, b_ref, out_ref, sv_ref, h_ref):
    """a_ref is the FUSED [H, 3H] recurrent matrix (gate-major columns):
    ONE [B,H]x[H,3H] MXU op per step — the same matmul shape XLA's scan
    uses — instead of three [B,H]x[H,H] dots (3x the MXU pass count)."""
    t = pl.program_id(0)
    h_dim = h_ref.shape[-1]

    @pl.when(t == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)

    h = h_ref[:]
    for u in range(xp_ref.shape[0]):  # UNROLL steps per grid iteration
        xp = xp_ref[u]  # [3, B, H]
        hp = _dot(h, a_ref[:]) + b_ref[:]  # [B, 3H]
        r = jax.nn.sigmoid(xp[0] + hp[:, :h_dim])
        z = jax.nn.sigmoid(xp[1] + hp[:, h_dim : 2 * h_dim])
        hpn = hp[:, 2 * h_dim :]
        c = jnp.tanh(xp[2] + r * hpn)
        sv_ref[u, 0] = r
        sv_ref[u, 1] = z
        sv_ref[u, 2] = hpn
        sv_ref[u, 3] = c
        sv_ref[u, 4] = h - c  # (h_prev - c), what the z-gradient needs
        h = (1.0 - z) * c + z * h
        out_ref[u] = h
    h_ref[:] = h


def _bwd_kernel(sv_ref, g_ref, a_ref, dxp_ref, dh_ref):
    """Reverse-grid backward over the saved activations — pure elementwise
    math plus ONE fused [B,3H]x[3H,H] dot per step on the dh chain."""
    t = pl.program_id(0)

    @pl.when(t == 0)  # reversed grid: first iteration is the LAST time block
    def _():
        dh_ref[:] = jnp.zeros_like(dh_ref)

    dh = dh_ref[:]
    for u in reversed(range(sv_ref.shape[0])):
        r, z, hpn, c, hmc = (sv_ref[u, i] for i in range(N_SAVED))
        dh_total = g_ref[u] + dh
        dz = dh_total * hmc * z * (1.0 - z)
        dn = dh_total * (1.0 - z) * (1.0 - c * c)
        dhpn = dn * r
        dr = dn * hpn * r * (1.0 - r)
        dxp_ref[u, 0] = dr
        dxp_ref[u, 1] = dz
        dxp_ref[u, 2] = dn
        dcat = jnp.concatenate([dr, dz, dhpn], axis=-1)  # [B, 3H]
        dh = dh_total * z + _dot_t(dcat, a_ref[:])  # dcat @ a_all^T
    dh_ref[:] = dh


def _full(shape):
    return pl.BlockSpec(shape, lambda t: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _pad_time(x, n_pad):
    n = x.shape[0]
    if n_pad == n:
        return x
    return jnp.pad(x, ((0, n_pad - n),) + ((0, 0),) * (x.ndim - 1))


def _fuse_weights(a3, bh3):
    """[3,H,H]/[3,1,H] -> gate-major fused [H,3H]/[1,3H] (one MXU op/step)."""
    a_all = jnp.concatenate([a3[0], a3[1], a3[2]], axis=1)
    b_all = jnp.concatenate([bh3[0], bh3[1], bh3[2]], axis=1)
    return a_all, b_all


def _run_forward(x_proj, a3, bh3):
    n, _, b, nh = x_proj.shape
    unroll = _pick_unroll(b, nh)
    if unroll is None:
        raise ValueError(
            f"gru_scan_pallas: no grid unroll fits VMEM at B={b}, H={nh} "
            "— call gru_over_nodes_pallas (which falls back to the scan) "
            "or use the lax.scan twin directly"
        )
    a_all, b_all = _fuse_weights(a3, bh3)
    n_pad = -(-n // unroll) * unroll
    xp = _pad_time(x_proj, n_pad)
    hs, saved = pl.pallas_call(
        _fwd_kernel,
        grid=(n_pad // unroll,),
        in_specs=[
            pl.BlockSpec((unroll, 3, b, nh), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            _full(a_all.shape),
            _full(b_all.shape),
        ],
        out_specs=[
            pl.BlockSpec((unroll, b, nh), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((unroll, N_SAVED, b, nh), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, b, nh), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, N_SAVED, b, nh), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((b, nh), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * 3 * b * nh * nh,
            bytes_accessed=4 * n_pad * b * nh * (4 + N_SAVED) + 4 * 3 * nh * nh,
            transcendentals=3 * n_pad * b * nh,
        ),
    )(xp, a_all, b_all)
    return hs[:n], saved[:n]


@functools.partial(jax.custom_vjp)
def gru_scan_pallas(x_proj, a3, bh3):
    """Fused GRU recurrence.

    x_proj: [N, 3, B, H] input projection x@W_ih + b_ih, gate-major.
    a3:     [3, H, H] recurrent matrices A_g = W_hh[g].T (h @ A_g).
    bh3:    [3, 1, H] recurrent biases.
    Returns hs [N, B, H] — the full output sequence.
    """
    hs, _ = _run_forward(x_proj, a3, bh3)
    return hs


def _vjp_fwd(x_proj, a3, bh3):
    hs, saved = _run_forward(x_proj, a3, bh3)
    return hs, (a3, hs, saved)


def _vjp_bwd(res, g):
    a3, hs, saved = res
    a_all, _ = _fuse_weights(a3, jnp.zeros((3, 1, a3.shape[-1]), a3.dtype))
    n, b, nh = hs.shape
    unroll = _pick_unroll(b, nh)  # deterministic in (b, nh): matches fwd
    n_pad = -(-n // unroll) * unroll
    nb = n_pad // unroll
    sv_p = _pad_time(saved, n_pad)
    g_p = _pad_time(g, n_pad)  # zero cotangents keep the padded dh exact
    # padded saved slots are zeros -> z=0 -> dh carries through unchanged
    rev4 = lambda t: (nb - 1 - t, 0, 0, 0)
    rev3 = lambda t: (nb - 1 - t, 0, 0)
    dxp = pl.pallas_call(
        _bwd_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((unroll, N_SAVED, b, nh), rev4,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((unroll, b, nh), rev3, memory_space=pltpu.VMEM),
            _full(a_all.shape),
        ],
        out_specs=pl.BlockSpec((unroll, 3, b, nh), rev4,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 3, b, nh), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, nh), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * 3 * b * nh * nh,
            bytes_accessed=4 * n_pad * b * nh * (N_SAVED + 4) + 4 * 3 * nh * nh,
            transcendentals=0,
        ),
    )(sv_p, g_p, a_all)[:n]

    dx_proj = dxp  # (dr, dz, dn) feed x_r, x_z, x_n directly
    # weight/bias grads as single XLA contractions over the saved states:
    # dA_g = sum_t h_{t-1}^T @ dgate_t, with dgate = (dr, dz, dhpn=dn*r)
    h_prev_seq = jnp.concatenate([jnp.zeros_like(hs[:1]), hs[:-1]], axis=0)
    dgates = jnp.stack(
        [dxp[:, 0], dxp[:, 1], dxp[:, 2] * saved[:, 0]], axis=0
    )  # [3, N, B, H]
    da3 = jnp.einsum("tbi,gtbj->gij", h_prev_seq, dgates)
    dbh3 = jnp.sum(dgates, axis=(1, 2))[:, None, :]  # [3, 1, H]
    return dx_proj, da3, dbh3


gru_scan_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def gru_over_nodes_pallas(gru, x):
    """Pallas twin of models.stemgnn.gru_over_nodes: x [B, W, N] -> [B, N, N].

    The hoisted input projection and the parameter-layout reshapes stay in
    XLA (differentiated automatically around the custom_vjp core).
    Falls back to the lax.scan twin when no grid unroll fits the VMEM
    budget (huge B*N — the kernel's win is latency amortization, which a
    shape that large no longer needs).
    """
    b, w, n = x.shape
    if _pick_unroll(b, n) is None:
        from stemgnn_tpu.models.stemgnn import gru_over_nodes

        return gru_over_nodes(gru, x)
    xs = jnp.transpose(x, (2, 0, 1))  # [N, B, W]
    x_proj = jnp.einsum("nbw,gw->nbg", xs, gru["w_ih"]) + gru["b_ih"]  # [N,B,3N]
    x_proj = jnp.transpose(x_proj.reshape(n, b, 3, n), (0, 2, 1, 3))  # [N,3,B,N]
    a3 = jnp.transpose(gru["w_hh"].reshape(3, n, n), (0, 2, 1))  # [3,N,N]
    bh3 = gru["b_hh"].reshape(3, 1, n)
    hs = gru_scan_pallas(x_proj, a3, bh3)  # [N, B, N]
    return jnp.transpose(hs, (1, 0, 2))
