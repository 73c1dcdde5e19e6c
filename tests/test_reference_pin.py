"""Pin the torch replica against the ACTUAL reference code (VERDICT r3 #4).

The whole parity chain (per-layer goldens, composed f64 forward/grad/
optimizer tests, outcome-level 50-epoch runs) bottoms out in
`_TorchStemGNN` — a hand transcription of
/root/reference/models/base_model.py. A transcription error that
systematically matched on both sides would be invisible. This file closes
that hole: it imports the reference `Model` class itself from
/root/reference/models/base_model.py (read-only mount), shims the two
legacy torch-1.7 calls it makes — `torch.rfft(x, 1, onesided=False)` ==
`view_as_real(torch.fft.fft(x))` and `torch.irfft(y, 1, onesided=False)`
== `torch.fft.ifft(view_as_complex(y)).real` (base_model.py:49,58; the
same shims the replica embeds) — loads IDENTICAL parameters into both,
and asserts f64 forward equality.

The comparison runs in eval mode so the reference's registered attention
dropout (base_model.py:103,161) is inactive, matching the replica (which
omits the module; dropout_rate=0 semantics).
"""

import os
import sys

import numpy as np
import pytest
import torch

from stemgnn_tpu.config import StemGNNConfig
from tests.test_torch_parity import _TorchStemGNN

REFERENCE_ROOT = "/root/reference"


def _import_reference_model():
    """Import the reference Model with legacy-fft shims installed.

    The path insert is scoped: /root/reference/models shadows nothing in
    this repo (our package is stemgnn_tpu.models), but it is removed right
    after import anyway."""
    if not os.path.isdir(os.path.join(REFERENCE_ROOT, "models")):
        pytest.skip("reference mount not available")
    # legacy torch.rfft/irfft (removed in torch>=1.8) — reference calls
    # them with signal_ndim=1, onesided=False (base_model.py:49,58)
    if not hasattr(torch, "rfft"):
        torch.rfft = lambda x, signal_ndim, onesided=True: torch.view_as_real(
            torch.fft.fft(x, dim=-1)
        )
    if not hasattr(torch, "irfft"):
        torch.irfft = lambda y, signal_ndim, onesided=True: torch.fft.ifft(
            torch.view_as_complex(y.contiguous()), dim=-1
        ).real
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        from models.base_model import Model  # the reference class itself
    finally:
        sys.path.remove(REFERENCE_ROOT)
    return Model


def _copy_reference_params_into_replica(ref_model, replica):
    """state_dict key mapping reference -> replica (name differences only;
    every tensor layout is identical by construction)."""
    sd = ref_model.state_dict()
    mapped = {}
    for k, v in sd.items():
        nk = k
        nk = nk.replace("GRU.", "gru.")
        nk = nk.replace("stock_block.", "blocks.")
        nk = nk.replace("GLUs.", "glus.")
        nk = nk.replace("linear_left.", "left.")
        nk = nk.replace("linear_right.", "right.")
        nk = nk.replace("fc.0.", "fc1.")
        nk = nk.replace("fc.2.", "fc2.")
        mapped[nk] = v
    missing, unexpected = replica.load_state_dict(mapped, strict=True)
    assert not missing and not unexpected
    return replica


@pytest.mark.parametrize("horizon", [3, 1])
def test_replica_forward_equals_reference_code(horizon):
    """f64 forward (forecast + attention) of _TorchStemGNN == the actual
    reference Model on shared params — including the horizon==1 squeeze/
    unsqueeze output path (base_model.py:176-177)."""
    Model = _import_reference_model()
    cfg = StemGNNConfig(units=12, window_size=8, horizon=horizon,
                        multi_layer=2, dropout_rate=0.0)
    torch.manual_seed(11)
    ref = Model(units=cfg.units, stack_cnt=2, time_step=cfg.window_size,
                multi_layer=cfg.multi_layer, horizon=cfg.horizon,
                dropout_rate=0.5, leaky_rate=cfg.leaky_rate,
                device="cpu").double()
    replica = _copy_reference_params_into_replica(
        ref, _TorchStemGNN(cfg).double()
    )
    ref.eval()  # disables the registered attention dropout (:103)
    replica.eval()
    rng = np.random.default_rng(5)
    x = torch.from_numpy(
        rng.standard_normal((4, cfg.window_size, cfg.units))
    )
    with torch.no_grad():
        f_ref, a_ref = ref(x)
        f_rep, a_rep = replica(x)
    assert f_ref.shape == f_rep.shape
    np.testing.assert_allclose(a_rep.numpy(), a_ref.numpy(), atol=1e-14)
    np.testing.assert_allclose(f_rep.numpy(), f_ref.numpy(), atol=1e-12)


def test_replica_grads_equal_reference_code():
    """f64 loss + every parameter gradient match between the replica and
    the actual reference code (same params, same batch, training-mode
    graph with dropout_rate=0 so dropout is identity on both sides)."""
    Model = _import_reference_model()
    cfg = StemGNNConfig(units=12, window_size=8, horizon=3,
                        multi_layer=2, dropout_rate=0.0)
    torch.manual_seed(12)
    ref = Model(units=cfg.units, stack_cnt=2, time_step=cfg.window_size,
                multi_layer=cfg.multi_layer, horizon=cfg.horizon,
                dropout_rate=0.0, leaky_rate=cfg.leaky_rate,
                device="cpu").double()
    replica = _copy_reference_params_into_replica(
        ref, _TorchStemGNN(cfg).double()
    )
    rng = np.random.default_rng(6)
    x = torch.from_numpy(rng.standard_normal((4, cfg.window_size, cfg.units)))
    y = torch.from_numpy(rng.standard_normal((4, cfg.horizon, cfg.units)))
    loss_fn = torch.nn.MSELoss()

    ref.zero_grad()
    f_ref, _ = ref(x)
    l_ref = loss_fn(f_ref, y)
    l_ref.backward()

    replica.zero_grad()
    f_rep, _ = replica(x)
    l_rep = loss_fn(f_rep, y)
    l_rep.backward()

    np.testing.assert_allclose(float(l_rep), float(l_ref), rtol=1e-13)
    ref_named = dict(ref.named_parameters())
    n_checked = 0
    for k, p in ref_named.items():
        nk = (k.replace("GRU.", "gru.").replace("stock_block.", "blocks.")
              .replace("GLUs.", "glus.").replace("linear_left.", "left.")
              .replace("linear_right.", "right.")
              .replace("fc.0.", "fc1.").replace("fc.2.", "fc2."))
        q = dict(replica.named_parameters())[nk]
        g_ref = p.grad if p.grad is not None else torch.zeros_like(p)
        g_rep = q.grad if q.grad is not None else torch.zeros_like(q)
        np.testing.assert_allclose(g_rep.numpy(), g_ref.numpy(),
                                   atol=1e-11, err_msg=k)
        n_checked += 1
    assert n_checked == len(list(replica.parameters()))
