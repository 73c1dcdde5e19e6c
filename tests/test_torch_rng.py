"""Pin utils/torch_rng.py + initializers.torch_stream_init against the
REAL torch CPU generator (torch is in-image), leaf by leaf.

The round-5 bad-basin mitigation (config.init_stream='torch' default)
rests on these draws being the torch stream — uniform fills bit-exact,
the one normal fill (block contraction weight) <=2 ulp (Sleef vs numpy
transcendentals; the u32 consumption stays synchronized either way).
"""

import numpy as np
import pytest
import torch

from stemgnn_tpu.config import StemGNNConfig, TrainConfig
from stemgnn_tpu.models import initializers
from stemgnn_tpu.utils.torch_rng import MT19937Engine

from tests.test_torch_parity import _TorchStemGNN, params_from_torch

CFG = StemGNNConfig(units=12, window_size=8, horizon=3, multi_layer=2,
                    dropout_rate=0.0)


@pytest.mark.parametrize("seed", [0, 1, 1234])
def test_uniform_bitexact(seed):
    torch.manual_seed(seed)
    t = torch.empty(137).uniform_(-0.25, 0.75).numpy()
    mine = MT19937Engine(seed).uniform_(137, -0.25, 0.75)
    assert np.array_equal(t, mine)


@pytest.mark.parametrize("numel", [32, 37])  # multiple-of-16 and tail path
def test_normal_fill(numel):
    torch.manual_seed(42)
    t = torch.empty(numel).normal_(0.0, 2.5).numpy()
    eng = MT19937Engine(42)
    mine = eng.normal_(numel, 0.0, 2.5)
    np.testing.assert_allclose(t, mine, rtol=0, atol=1e-6)
    # stream stays bit-synchronized after the normal fill (incl. the
    # tail's 16 extra uniforms)
    torch.manual_seed(42)
    torch.empty(numel).normal_(0.0, 2.5)
    after = torch.empty(8).uniform_().numpy()
    assert np.array_equal(after, eng.uniform_(8, 0.0, 1.0))


@pytest.mark.parametrize("seed", [0, 3])
def test_torch_stream_init_matches_reference_draw(seed):
    """torch_stream_init == params_from_torch(Model built under
    torch.manual_seed(seed)), exact except the xavier_normal weight."""
    torch.manual_seed(seed)
    ref = params_from_torch(_TorchStemGNN(CFG), CFG)
    mine = initializers.torch_stream_init(seed, CFG)

    import jax

    ref_leaves, ref_tree = jax.tree.flatten_with_path(ref)
    my_leaves, my_tree = jax.tree.flatten_with_path(mine)
    assert ref_tree == my_tree
    for (path_r, leaf_r), (_, leaf_m) in zip(ref_leaves, my_leaves):
        name = jax.tree_util.keystr(path_r)
        a, b = np.asarray(leaf_r), np.asarray(leaf_m)
        assert a.shape == b.shape, name
        if "'weight'" in name and "blocks" in name:
            np.testing.assert_allclose(a, b, rtol=0, atol=1e-6, err_msg=name)
        else:
            assert np.array_equal(a, b), f"{name} not bit-equal"


def test_default_init_stream_is_torch():
    assert TrainConfig().init_stream == "torch"


def test_stream_generalizes_to_stretch_shapes():
    """Decoupled-GRU stretch config: same order/stream, stretch shapes."""
    cfg = StemGNNConfig(units=64, window_size=8, horizon=3, multi_layer=2,
                        sparse_k=8, gru_hidden=16)
    p = initializers.torch_stream_init(0, cfg)
    assert p["gru"]["w_hh"].shape == (48, 16)
    assert p["weight_key"].shape == (16, 1)
    assert np.isfinite(p["blocks"][0]["weight"]).all()
