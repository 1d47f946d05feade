"""Model substrate tests: shape ladders, parameter counts vs a torch twin,
and bit-level forward parity with torch (conv padding, BN eps, deconv
geometry all covered by the numeric check)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from pytorch_pose_estimation_tpu.models import SBP, SPM, darknet19
from pytorch_pose_estimation_tpu.models.summary import count_params, summarize

from golden.torch_models import TorchSBP, torch_params_to_flax


def test_darknet19_feature_shape():
    model = darknet19(features_only=True)
    x = jnp.zeros((1, 256, 192, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 8, 6, 1024)


def test_darknet19_out_indices():
    model = darknet19(features_only=True, out_indices=[4, 5])
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(variables, x)
    assert [o.shape for o in outs] == [(1, 4, 4, 512), (1, 2, 2, 1024)]


def test_darknet19_classifier():
    model = darknet19(pretrained="tiny-imagenet")
    assert model.num_classes == 200
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (2, 200)


def test_sbp_shape_ladder():
    info = summarize(SBP(num_keypoints=17), (1, 256, 192, 3))
    assert info["output_shape"] == (1, 64, 48, 17)


def test_spm_shape():
    info = summarize(SPM(num_keypoints=17), (1, 512, 512, 3))
    assert info["output_shape"] == (1, 128, 128, 35)


def test_sbp_param_count_matches_torch():
    tm = TorchSBP(num_keypoints=17)
    torch_total = sum(p.numel() for p in tm.parameters())

    model = SBP(num_keypoints=17)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 192, 3)))
    )
    assert count_params(variables["params"]) == torch_total


@pytest.mark.parametrize("train", [False])
def test_sbp_forward_matches_torch(train):
    torch.manual_seed(0)
    tm = TorchSBP(num_keypoints=17).eval()
    # randomize BN stats so eval-mode normalization is non-trivial
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.5, 1.5)

    params, stats = torch_params_to_flax(tm)
    variables = {"params": params, "batch_stats": stats}

    x = np.random.RandomState(1).rand(2, 3, 64, 48).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    model = SBP(num_keypoints=17)
    with jax.default_matmul_precision("highest"):
        out = model.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                          train=train)
    out_nchw = np.transpose(np.asarray(out), (0, 3, 1, 2))
    assert ref.shape == out_nchw.shape
    np.testing.assert_allclose(out_nchw, ref, rtol=1e-4, atol=1e-4)


def test_hourglass_blocks():
    from pytorch_pose_estimation_tpu.models.hourglass import Hourglass, Residual

    x = jnp.zeros((1, 32, 32, 16))
    res = Residual(features=32)
    v = res.init(jax.random.PRNGKey(0), x)
    assert res.apply(v, x).shape == (1, 32, 32, 32)

    hg = Hourglass(depth=3, features=16)
    v = hg.init(jax.random.PRNGKey(0), x)
    assert hg.apply(v, x).shape == (1, 32, 32, 16)


def test_make_divisible():
    from pytorch_pose_estimation_tpu.utility import make_divisible

    assert make_divisible(16) == 16
    assert make_divisible(17) == 16
    assert make_divisible(23) == 24
    assert make_divisible(7, 8) == 8


def test_weight_initialize():
    from pytorch_pose_estimation_tpu.models.initialize import weight_initialize

    model = SBP(num_keypoints=3)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    re_init = weight_initialize(variables["params"], jax.random.PRNGKey(7))
    # BN scale exactly 1, bias exactly 0
    bn = re_init["deconv_1"]["bn"]
    assert (np.asarray(bn["scale"]) == 1).all()
    assert (np.asarray(bn["bias"]) == 0).all()
    # conv kernels within xavier bounds and actually re-drawn
    k = np.asarray(re_init["head"]["kernel"])
    rf = k.shape[0] * k.shape[1]
    limit = np.sqrt(6.0 / (rf * k.shape[2] + rf * k.shape[3]))
    assert np.abs(k).max() <= limit + 1e-6
    assert not np.allclose(k, np.asarray(variables["params"]["head"]["kernel"]))
    # tree structure unchanged
    import jax as _jax
    assert _jax.tree_util.tree_structure(re_init) == \
        _jax.tree_util.tree_structure(dict(variables["params"]))


def test_remat_matches_plain():
    import jax as _jax

    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3)
                    .astype(np.float32))
    plain = SBP(num_keypoints=3, remat=False)
    rem = SBP(num_keypoints=3, remat=True)
    v = plain.init(_jax.random.PRNGKey(0), x)
    out_plain = plain.apply(v, x)
    out_remat = rem.apply(v, x)
    np.testing.assert_allclose(np.asarray(out_plain), np.asarray(out_remat),
                               rtol=1e-6, atol=1e-6)
    # grads flow through the rematerialized backbone
    g = _jax.grad(lambda p: float(0) + jnp.sum(
        rem.apply({"params": p, "batch_stats": v["batch_stats"]}, x)))(
            v["params"])
    assert float(sum(jnp.abs(l).sum() for l in _jax.tree_util.tree_leaves(g))) > 0
