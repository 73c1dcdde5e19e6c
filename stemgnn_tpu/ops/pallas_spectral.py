"""Fused Pallas kernel for the spectral-sequential cell.

Reference semantics: base_model.py:46-59 — full FFT along the window,
3 GLU layers on the flattened real/imag spectra, inverse FFT of the
widened spectrum, keep the real part.

TPU-first design: the window W is tiny (12-28), so the FFT is NOT a
butterfly — it is a matmul with a precomputed W x W DFT matrix, and the
forward DFT is FOLDED into the layer-0 GLU weights (VERDICT r3 item 2):
(x @ C) @ W0 == x @ (C @ W0) is exact linear composition, so the fold
(four [4W, 4Wm] matmuls, done once per step outside the kernel where
params change) removes both forward-DFT matmuls from the per-row chain —
matmuls whose 4W=48-wide operands padded to 128 lanes on BOTH dims and
were pure overhead on the MXU. The K=4 Chebyshev channels are handled
with block-diagonal DFT matrices over the flattened K*W axis, so the
kernel is a pure row-parallel map over B*N rows:

    rows [TR, 4W]:
    R = (rows@(Cf@Wl0)+bl0) * sigmoid(rows@(Cf@Wr0)+br0)   (folded DFT+GLU0)
    I = (rows@(Sf@Wl0')+bl0') * sigmoid(rows@(Sf@Wr0')+br0')
    2x: R = (R@Wl+bl) * sigmoid(R@Wr+br)  (even GLUs; odd GLUs for I)
    out [TR, 4Wm] = R @ Ci + I @ Si                         (inverse DFT)

Eight HBM round-trips in the jnp twin collapse into one read + one write.
Backward pass: fused Pallas bwd kernel over the same folded weights; the
layer-0 weight grads are un-folded outside (dW0 = Cf^T @ dAW0 — exact
chain rule through the constant fold).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stemgnn_tpu.ops import jnp_impl

ROW_TILE = 256


@functools.lru_cache(maxsize=16)
def _dft_matrices(w: int, k: int, wm: int):
    """Block-diagonal forward/inverse DFT matrices (numpy, cached).

    Forward (length w, k blocks):  R = x @ Cf,  I = x @ Sf
        Cf[n, j] = cos(2 pi n j / w),  Sf[n, j] = -sin(2 pi n j / w)
    Inverse (length wm, real part): y = R @ Ci + I @ Si
        Ci[j, n] = cos(2 pi j n / wm) / wm,  Si[j, n] = -sin(...) / wm
    """
    n_idx = np.arange(w)
    ang_f = 2.0 * np.pi * np.outer(n_idx, n_idx) / w
    cf = np.cos(ang_f)
    sf = -np.sin(ang_f)
    m_idx = np.arange(wm)
    ang_i = 2.0 * np.pi * np.outer(m_idx, m_idx) / wm
    ci = np.cos(ang_i) / wm
    si = -np.sin(ang_i) / wm

    def blockdiag(m, reps):
        d = m.shape[0]
        out = np.zeros((d * reps, d * reps), dtype=np.float32)
        for r in range(reps):
            out[r * d : (r + 1) * d, r * d : (r + 1) * d] = m
        return out

    # cache numpy (NOT jnp: device arrays created under a trace would leak
    # tracers through the cache)
    return (
        blockdiag(cf, k),
        blockdiag(sf, k),
        blockdiag(ci, k),
        blockdiag(si, k),
    )


def _kernel(x_ref, ci_ref, si_ref, *glu_refs):
    out_ref = glu_refs[-1]
    glu_refs = glu_refs[:-1]  # 24 refs: (wl, bl, wr, br) x 6 GLUs;
    # layer-0 wl/wr arrive PRE-FOLDED with the forward DFT (Cf@W / Sf@W)
    x = x_ref[:]
    # mixed precision: operands in the block dtype (bf16 on the fast path
    # halves HBM/VMEM traffic and runs the MXU at full rate), accumulation
    # always f32 via preferred_element_type
    cdtype = x_ref.dtype
    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    real = imag = x  # DFT folded into layer-0 weights
    for layer in range(3):
        # even GLU -> real, odd GLU -> imag (base_model.py:52-54)
        real, imag = real.astype(cdtype), imag.astype(cdtype)
        wl, bl, wr, br = (glu_refs[layer * 8 + j][:] for j in range(4))
        real = (dot(real, wl) + bl) * jax.nn.sigmoid(dot(real, wr) + br)
        wl, bl, wr, br = (glu_refs[layer * 8 + 4 + j][:] for j in range(4))
        imag = (dot(imag, wl) + bl) * jax.nn.sigmoid(dot(imag, wr) + br)
    out_ref[:] = dot(real.astype(cdtype), ci_ref[:]) + dot(
        imag.astype(cdtype), si_ref[:]
    )


def _kernel_save(x_ref, ci_ref, si_ref, *refs):
    """Forward twin of _kernel that additionally SAVES each GLU's linear
    output `a` and gate `s` for the reread backward (VERDICT r4 item 3 /
    ROADMAP 3: recompute-vs-reread A/B). refs = 24 GLU param refs, then
    outputs [out, a0, s0, ..., a5, s5] (acts in the compute dtype)."""
    glu_refs = refs[:24]
    out_ref = refs[24]
    act_refs = refs[25:]
    x = x_ref[:]
    cdtype = x_ref.dtype
    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    cur = [x, x]  # DFT folded into layer-0 weights
    for layer in range(3):
        for chain in range(2):  # 0 = real (even GLU), 1 = imag (odd GLU)
            wl, bl, wr, br = (
                glu_refs[layer * 8 + chain * 4 + j][:] for j in range(4)
            )
            u = cur[chain].astype(cdtype)
            a = dot(u, wl) + bl
            s = jax.nn.sigmoid(dot(u, wr) + br)
            gi = layer * 2 + chain
            act_refs[2 * gi][:] = a.astype(act_refs[2 * gi].dtype)
            act_refs[2 * gi + 1][:] = s.astype(act_refs[2 * gi + 1].dtype)
            cur[chain] = a * s
    out_ref[:] = dot(cur[0].astype(cdtype), ci_ref[:]) + dot(
        cur[1].astype(cdtype), si_ref[:]
    )


def _flat_glu_args(glu_params):
    args = []
    for p in glu_params:
        args.extend(
            [
                p["left"]["w"],
                p["left"]["b"][None, :],
                p["right"]["w"],
                p["right"]["b"][None, :],
            ]
        )
    return args


def _fold_dft(glu_args, cf, sf):
    """Fold the forward DFT into the layer-0 GLU weight matrices.

    Exact linear composition ((x@C)@W == x@(C@W), no bias on the DFT), so
    forward semantics are unchanged up to float reassociation. The fold is
    four [4W, 4Wm] f32 matmuls per step — trivial next to the per-row work
    it deletes. glu_args layout per _flat_glu_args: GLU 0 (real chain)
    at [0..3], GLU 1 (imag chain) at [4..7]; weights at offsets 0 and 2."""
    out = list(glu_args)
    out[0] = cf @ glu_args[0]
    out[2] = cf @ glu_args[2]
    out[4] = sf @ glu_args[4]
    out[6] = sf @ glu_args[6]
    return out


def _forward(x, glu_params, multi: int, compute_dtype=jnp.float32,
             save_acts: bool = False):
    b, k, n, w = x.shape
    wm = w * multi
    rows = b * n
    xr = jnp.transpose(x, (0, 2, 1, 3)).reshape(rows, k * w)
    pad_rows = -rows % ROW_TILE
    if pad_rows:
        xr = jnp.pad(xr, ((0, pad_rows), (0, 0)))
    total = rows + pad_rows
    cf, sf, ci, si = (jnp.asarray(m) for m in _dft_matrices(w, k, wm))
    # fold the forward DFT into layer-0 weights (f32, BEFORE the bf16 cast
    # so the fold itself never loses precision)
    glu_args = _fold_dft(_flat_glu_args(glu_params), cf, sf)
    if compute_dtype != jnp.float32:
        # bf16 matmul operands, f32 accumulation in-kernel; biases stay f32
        # (added to f32 accumulators)
        xr = xr.astype(compute_dtype)
        ci, si = (m.astype(compute_dtype) for m in (ci, si))
        glu_args = [
            a.astype(compute_dtype) if a.ndim == 2 and a.shape[0] > 1 else a
            for a in glu_args
        ]

    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((ROW_TILE, k * w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        full(ci), full(si),
        *[full(a) for a in glu_args],
    ]
    row_out = lambda dt: pl.BlockSpec(
        (ROW_TILE, k * wm), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    cost = pl.CostEstimate(
        flops=2 * total * (
            2 * (k * w) * (k * wm) * 2  # GLU layer 0 (DFT folded in)
            + 4 * (k * wm) ** 2 * 2  # GLU layers 1-2
            + 2 * (k * wm) ** 2  # inverse DFT
        ),
        bytes_accessed=4 * total * k * (w + wm),
        transcendentals=total * k * wm * 6,
    )
    if save_acts:
        # 12 extra outputs (a, s per GLU) — the reread backward's
        # residuals (one HBM write here + one read there, vs recomputing
        # 12 matmuls + 6 sigmoid sweeps in bwd). f32 storage makes the
        # reread grads BITWISE equal to the recompute kernel's (same
        # values, same contraction order); compute-dtype storage halves
        # the traffic at bf16-ulp grad drift (both A/B'd).
        act_dtype = jnp.float32 if SAVE_ACTS_F32 else compute_dtype
        outs = pl.pallas_call(
            _kernel_save,
            grid=(total // ROW_TILE,),
            in_specs=in_specs,
            out_specs=[row_out(None)] + [row_out(None)] * 12,
            out_shape=[jax.ShapeDtypeStruct((total, k * wm), jnp.float32)]
            + [jax.ShapeDtypeStruct((total, k * wm), act_dtype)] * 12,
            cost_estimate=cost,
        )(xr, ci, si, *glu_args)
        out, acts = outs[0], list(outs[1:])
        out = out[:rows].reshape(b, n, k, wm)
        return jnp.transpose(out, (0, 2, 1, 3)), acts
    out = pl.pallas_call(
        _kernel,
        grid=(total // ROW_TILE,),
        in_specs=in_specs,
        out_specs=row_out(None),
        out_shape=jax.ShapeDtypeStruct((total, k * wm), jnp.float32),
        cost_estimate=cost,
    )(xr, ci, si, *glu_args)
    out = out[:rows].reshape(b, n, k, wm)
    return jnp.transpose(out, (0, 2, 1, 3))


BWD_ROW_TILE = 128
# Round-5 in-step A/B (benchmarks/spectral_bwd_ab.json, v5e, same-run):
#   explicit-transpose tile=128 (this default) 1.172 ms | dot_general
#   "transpose-free" tile=128 1.208-1.213 | tile=256 1.24-1.26 either way.
# The dot_general row/out-axis contractions looked like they should save
# VPU transposes but measure 3% SLOWER composed — Mosaic already folds
# the u.T/wl.T forms into MXU operand layouts, and the dim-0-contraction
# dot_general forces a worse internal layout. Keep False; knob retained
# for re-measurement on other shapes.
TRANSPOSE_FREE_BWD = False


def _bwd_kernel(x_ref, g_ref, ci_ref, si_ref, *refs):
    """Fused backward: recompute the fwd chain in VMEM, then backprop the
    whole (folded-DFT GLU0)->2xGLU->iDFT chain in one pass.

    refs = 24 GLU param refs (layer-0 weights pre-folded with the DFT),
    dx_ref, 24 GLU grad refs. Layer-0 weight grads come out in FOLDED
    space (dAW = x^T @ da); the caller un-folds them (dW = C^T @ dAW).
    The grad refs map every grid step to the SAME block (constant index
    map): zeroed at step 0, then accumulated across row tiles (sequential
    TPU grid). With the DFT folded, dx falls directly out of the layer-0
    backward (d[0] + d[1]) — no Cf^T/Sf^T matmuls."""
    glu_refs = refs[:24]
    dx_ref = refs[24]
    dglu_refs = refs[25:]
    first = pl.program_id(0) == 0
    cdtype = x_ref.dtype
    dot = lambda a, b: jnp.dot(
        a.astype(cdtype), b.astype(cdtype), preferred_element_type=jnp.float32
    )

    # --- recompute forward, saving (input, linear, gate) per GLU ---
    x = x_ref[:]
    cur = [x, x]  # DFT folded into layer-0 weights
    saved = []
    for layer in range(3):
        for chain in range(2):  # 0 = real (even GLU), 1 = imag (odd GLU)
            wl, bl, wr, br = (
                glu_refs[layer * 8 + chain * 4 + j][:] for j in range(4)
            )
            u = cur[chain].astype(cdtype)  # matches fwd kernel's cast
            a = dot(u, wl) + bl
            s = jax.nn.sigmoid(dot(u, wr) + br)
            saved.append((u, a, s))
            cur[chain] = a * s

    # --- backward ---
    # transpose-free contractions (round-5 A/B): the original form
    # materialized u.T / wl.T / ci.T inside the kernel; dot_general with
    # explicit contracting dims feeds the MXU directly.
    #   rowdot: u [R,in] x da [R,out] -> [in,out]   (contract rows)
    #   tdot:   dy [R,out] x w [in,out] -> [R,in]   (contract out axis)
    if TRANSPOSE_FREE_BWD:
        rowdot = lambda a_, b_: jax.lax.dot_general(
            a_.astype(cdtype), b_.astype(cdtype),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        tdot = lambda a_, w_: jax.lax.dot_general(
            a_.astype(cdtype), w_.astype(cdtype),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
    else:  # original explicit-transpose forms
        rowdot = lambda a_, b_: dot(a_.T, b_)
        tdot = lambda a_, w_: dot(a_, w_.T)
    g = g_ref[:]
    d = [tdot(g, ci_ref[:]), tdot(g, si_ref[:])]  # dR3, dI3 (g @ ci.T)
    for layer in range(2, -1, -1):
        for chain in range(2):
            base = layer * 8 + chain * 4
            wl, wr = glu_refs[base][:], glu_refs[base + 2][:]
            u, a, s = saved[layer * 2 + chain]
            dy = d[chain]
            da = dy * s
            dspre = dy * a * (s * (1.0 - s))
            dwl = rowdot(u, da)
            dbl = jnp.sum(da, axis=0, keepdims=True)
            dwr = rowdot(u, dspre)
            dbr = jnp.sum(dspre, axis=0, keepdims=True)
            for off, grad in ((0, dwl), (1, dbl), (2, dwr), (3, dbr)):
                ref = dglu_refs[base + off]

                @pl.when(first)
                def _init(ref=ref, grad=grad):
                    ref[:] = grad

                @pl.when(jnp.logical_not(first))
                def _acc(ref=ref, grad=grad):
                    ref[:] += grad

            d[chain] = tdot(da, wl) + tdot(dspre, wr)
    dx_ref[:] = d[0] + d[1]


def _backward(x, glu_params, g, multi: int, compute_dtype=jnp.float32):
    """Pallas fused VJP of spe_seq_cell wrt (x, glu_params).

    One kernel reads (x, g) once and writes (dx, 24 weight/bias grads) —
    versus the jnp twin's VJP, which re-runs the forward and round-trips
    ~16 [rows, K*Wm] temporaries through HBM."""
    b, k, n, w = x.shape
    wm = w * multi
    rows = b * n
    xr = jnp.transpose(x, (0, 2, 1, 3)).reshape(rows, k * w)
    gr = jnp.transpose(g, (0, 2, 1, 3)).reshape(rows, k * wm)
    pad_rows = -rows % BWD_ROW_TILE
    if pad_rows:
        # zero rows contribute zero to every grad (dy = 0 there)
        xr = jnp.pad(xr, ((0, pad_rows), (0, 0)))
        gr = jnp.pad(gr, ((0, pad_rows), (0, 0)))
    total = rows + pad_rows
    cf, sf, ci, si = (jnp.asarray(m) for m in _dft_matrices(w, k, wm))
    # same folded layer-0 weights the forward ran with (f32 fold, then cast)
    glu_args = _fold_dft(_flat_glu_args(glu_params), cf, sf)
    if compute_dtype != jnp.float32:
        xr = xr.astype(compute_dtype)
        gr = gr.astype(compute_dtype)
        ci, si = (m.astype(compute_dtype) for m in (ci, si))
        glu_args = [
            a.astype(compute_dtype) if a.ndim == 2 and a.shape[0] > 1 else a
            for a in glu_args
        ]

    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    row_spec = lambda cols: pl.BlockSpec(
        (BWD_ROW_TILE, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        row_spec(k * w), row_spec(k * wm),
        full(ci), full(si),
        *[full(a) for a in glu_args],
    ]
    # grads accumulate in f32 across the whole grid
    out_shape = [jax.ShapeDtypeStruct((total, k * w), jnp.float32)] + [
        jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in glu_args
    ]
    out_specs = [row_spec(k * w)] + [
        pl.BlockSpec(a.shape, lambda i, nd=a.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for a in glu_args
    ]
    outs = pl.pallas_call(
        _bwd_kernel,
        grid=(total // BWD_ROW_TILE,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
    )(xr, gr, ci, si, *glu_args)
    dx = outs[0][:rows].reshape(b, n, k, w)
    dx = jnp.transpose(dx, (0, 2, 1, 3)).astype(x.dtype)
    flat = list(outs[1:])
    # un-fold the layer-0 weight grads: the kernel accumulated dAW = x^T@da
    # in folded space (AW = C@W), so dW = C^T @ dAW — exact chain rule
    # through the constant DFT fold (the bf16 cast backprops as identity,
    # matching jax's own convert_element_type VJP)
    flat[0] = cf.T @ flat[0]
    flat[2] = cf.T @ flat[2]
    flat[4] = sf.T @ flat[4]
    flat[6] = sf.T @ flat[6]
    # rebuild the exact glu_params pytree: leaf order per GLU is
    # [left.b, left.w, right.b, right.w] (dict keys iterate sorted),
    # while the kernel outputs follow _flat_glu_args order (wl,bl,wr,br)
    leaves = []
    for li in range(6):
        dwl, dbl, dwr, dbr = flat[li * 4 : li * 4 + 4]
        leaves.extend([dbl[0], dwl, dbr[0], dwr])
    dglu = jax.tree.unflatten(jax.tree.structure(glu_params), leaves)
    return dx, dglu


# Round-5 A/B knob (VERDICT r4 item 3 / ROADMAP 3): True = the forward
# kernel saves each GLU's (a, s) activations and the backward REREADS
# them instead of recomputing the chain (12 matmuls + 6 sigmoid sweeps
# per call traded for ~2x12 row-tiled HBM round-trips). Read at trace
# time; benchmarks/spectral_bwd_ab.py measures both in-step.
SAVE_ACTS_BWD = False
# f32 act storage (bitwise-equal grads to the recompute kernel) vs
# compute-dtype storage (half the act traffic, bf16-ulp grad drift).
SAVE_ACTS_F32 = True


def _bwd_kernel_reread(x_ref, g_ref, ci_ref, si_ref, *refs):
    """Reread backward: consumes the forward's saved (a, s) per GLU.

    refs = 24 GLU param refs + 12 act refs (a0, s0, ..., a5, s5), then
    dx_ref + 24 GLU grad refs. Identical backward math to _bwd_kernel;
    only the recompute sweep is replaced by reads. Each GLU's input `u`
    is rebuilt elementwise from the previous layer's a*s (layer 0's is
    the x tile itself) — no matmuls, no transcendentals."""
    glu_refs = refs[:24]
    act_refs = refs[24:36]
    dx_ref = refs[36]
    dglu_refs = refs[37:]
    first = pl.program_id(0) == 0
    cdtype = x_ref.dtype
    dot = lambda a, b: jnp.dot(
        a.astype(cdtype), b.astype(cdtype), preferred_element_type=jnp.float32
    )

    # --- rebuild (u, a, s) per GLU from the saved activations ---
    saved = []
    cur = [x_ref[:], x_ref[:]]
    for layer in range(3):
        for chain in range(2):
            gi = layer * 2 + chain
            a = act_refs[2 * gi][:].astype(jnp.float32)
            s = act_refs[2 * gi + 1][:].astype(jnp.float32)
            saved.append((cur[chain].astype(cdtype), a, s))
            cur[chain] = a * s

    # --- backward (same contraction forms as _bwd_kernel's default) ---
    rowdot = lambda a_, b_: dot(a_.T, b_)
    tdot = lambda a_, w_: dot(a_, w_.T)
    g = g_ref[:]
    d = [tdot(g, ci_ref[:]), tdot(g, si_ref[:])]
    for layer in range(2, -1, -1):
        for chain in range(2):
            base = layer * 8 + chain * 4
            wl, wr = glu_refs[base][:], glu_refs[base + 2][:]
            u, a, s = saved[layer * 2 + chain]
            dy = d[chain]
            da = dy * s
            dspre = dy * a * (s * (1.0 - s))
            dwl = rowdot(u, da)
            dbl = jnp.sum(da, axis=0, keepdims=True)
            dwr = rowdot(u, dspre)
            dbr = jnp.sum(dspre, axis=0, keepdims=True)
            for off, grad in ((0, dwl), (1, dbl), (2, dwr), (3, dbr)):
                ref = dglu_refs[base + off]

                @pl.when(first)
                def _init(ref=ref, grad=grad):
                    ref[:] = grad

                @pl.when(jnp.logical_not(first))
                def _acc(ref=ref, grad=grad):
                    ref[:] += grad

            d[chain] = tdot(da, wl) + tdot(dspre, wr)
    dx_ref[:] = d[0] + d[1]


def _backward_reread(x, glu_params, g, acts, multi: int,
                     compute_dtype=jnp.float32):
    """Reread variant of _backward: feeds the forward's saved activations
    into _bwd_kernel_reread. The act arrays are padded to the FORWARD's
    row tile (>= the bwd's padding since ROW_TILE is a multiple of
    BWD_ROW_TILE's granularity); padded rows carry g == 0 so they
    contribute nothing to any gradient."""
    b, k, n, w = x.shape
    wm = w * multi
    rows = b * n
    xr = jnp.transpose(x, (0, 2, 1, 3)).reshape(rows, k * w)
    gr = jnp.transpose(g, (0, 2, 1, 3)).reshape(rows, k * wm)
    pad_rows = -rows % BWD_ROW_TILE
    if pad_rows:
        xr = jnp.pad(xr, ((0, pad_rows), (0, 0)))
        gr = jnp.pad(gr, ((0, pad_rows), (0, 0)))
    total = rows + pad_rows
    cf, sf, ci, si = (jnp.asarray(m) for m in _dft_matrices(w, k, wm))
    glu_args = _fold_dft(_flat_glu_args(glu_params), cf, sf)
    if compute_dtype != jnp.float32:
        xr = xr.astype(compute_dtype)
        gr = gr.astype(compute_dtype)
        ci, si = (m.astype(compute_dtype) for m in (ci, si))
        glu_args = [
            a.astype(compute_dtype) if a.ndim == 2 and a.shape[0] > 1 else a
            for a in glu_args
        ]

    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    row_spec = lambda cols: pl.BlockSpec(
        (BWD_ROW_TILE, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        row_spec(k * w), row_spec(k * wm),
        full(ci), full(si),
        *[full(a) for a in glu_args],
        *[row_spec(k * wm) for _ in acts],
    ]
    out_shape = [jax.ShapeDtypeStruct((total, k * w), jnp.float32)] + [
        jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in glu_args
    ]
    out_specs = [row_spec(k * w)] + [
        pl.BlockSpec(a.shape, lambda i, nd=a.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for a in glu_args
    ]
    outs = pl.pallas_call(
        _bwd_kernel_reread,
        grid=(total // BWD_ROW_TILE,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
    )(xr, gr, ci, si, *glu_args, *acts)
    dx = outs[0][:rows].reshape(b, n, k, w)
    dx = jnp.transpose(dx, (0, 2, 1, 3)).astype(x.dtype)
    flat = list(outs[1:])
    flat[0] = cf.T @ flat[0]
    flat[2] = cf.T @ flat[2]
    flat[4] = sf.T @ flat[4]
    flat[6] = sf.T @ flat[6]
    leaves = []
    for li in range(6):
        dwl, dbl, dwr, dbr = flat[li * 4 : li * 4 + 4]
        leaves.extend([dbl[0], dwl, dbr[0], dwr])
    dglu = jax.tree.unflatten(jax.tree.structure(glu_params), leaves)
    return dx, dglu


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def spe_seq_cell_pallas(x, glu_params, multi: int, compute_dtype=jnp.float32):
    """Pallas twin of jnp_impl.spe_seq_cell: [B,K,N,W] -> [B,K,N,W*multi].

    compute_dtype=bfloat16: bf16 MXU operands with f32 accumulation (the
    full-rate path; numerics pinned vs the f32 twin at bf16 tolerance)."""
    return _forward(x, glu_params, multi, compute_dtype)


def _fwd(x, glu_params, multi, compute_dtype):
    if SAVE_ACTS_BWD:
        out, acts = _forward(x, glu_params, multi, compute_dtype,
                             save_acts=True)
        return out, (x, glu_params, acts)
    return _forward(x, glu_params, multi, compute_dtype), (x, glu_params, None)


def _bwd(multi, compute_dtype, res, g):
    x, glu_params, acts = res
    if acts is not None:
        return _backward_reread(x, glu_params, g, acts, multi, compute_dtype)
    return _backward(x, glu_params, g, multi, compute_dtype)


spe_seq_cell_pallas.defvjp(_fwd, _bwd)
