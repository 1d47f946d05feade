"""Torch-checkpoint importer test: build a torch model with the REFERENCE's
module/key naming (backbone_features_module.<i>.<j>.conv.weight, deconv_N,
sbp_head), import its state_dict, and check numeric forward parity."""

import numpy as np
import torch
from torch import nn

import jax
import jax.numpy as jnp

from pytorch_pose_estimation_tpu.models import SBP
from pytorch_pose_estimation_tpu.models.darknet import STAGES
from pytorch_pose_estimation_tpu.models.torch_import import (
    import_torch_state_dict,
)


class _ConvBnRelu(nn.Module):
    """Named .conv/.bn children -> reference-style keys."""

    def __init__(self, c_in, c_out, k):
        super().__init__()
        self.conv = nn.Conv2d(c_in, c_out, k, 1, (k - 1) // 2, bias=False)
        self.bn = nn.BatchNorm2d(c_out)
        self.relu = nn.ReLU()

    def forward(self, x):
        return self.relu(self.bn(self.conv(x)))


def _ref_style_sbp(num_keypoints=17):
    stages = nn.ModuleList()
    c_in = 3
    for table in STAGES:
        mods = []
        for entry in table:
            if entry == "M":
                mods.append(nn.MaxPool2d(2, 2))
            else:
                c_out, k = entry
                mods.append(_ConvBnRelu(c_in, c_out, k))
                c_in = c_out
        stages.append(nn.Sequential(*mods))

    class RefSBP(nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone_features_module = stages
            for i, cin in enumerate((1024, 512, 512), start=1):
                setattr(self, f"deconv_{i}", nn.Sequential(
                    nn.ConvTranspose2d(cin, 512, 4, 2, 1, bias=False),
                    nn.BatchNorm2d(512), nn.ReLU()))
            self.sbp_head = nn.Sequential(
                nn.Conv2d(512, num_keypoints, 1, 1, bias=False))

        def forward(self, x):
            for m in self.backbone_features_module:
                x = m(x)
            x = self.deconv_1(x)
            x = self.deconv_2(x)
            x = self.deconv_3(x)
            return self.sbp_head(x)

    return RefSBP()


def test_import_reference_state_dict_forward_parity():
    torch.manual_seed(0)
    tm = _ref_style_sbp().eval()
    for m in tm.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.5, 1.5)

    # Lightning prefixes everything with "model."
    state_dict = {f"model.{k}": v for k, v in tm.state_dict().items()}
    variables = import_torch_state_dict(state_dict)

    x = np.random.RandomState(0).rand(1, 3, 64, 48).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    model = SBP(num_keypoints=17)
    with jax.default_matmul_precision("highest"):
        got = model.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_import_covers_all_sbp_params():
    tm = _ref_style_sbp()
    variables = import_torch_state_dict(tm.state_dict())

    model = SBP(num_keypoints=17)
    ref = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 48, 3))))

    def paths(tree, prefix=()):
        if isinstance(tree, dict):
            out = []
            for k, v in tree.items():
                out += paths(v, prefix + (k,))
            return out
        return [prefix]

    assert sorted(paths(variables["params"])) == \
        sorted(paths(dict(ref["params"])))
    assert sorted(paths(variables["batch_stats"])) == \
        sorted(paths(dict(ref["batch_stats"])))


def test_import_cli_roundtrip(tmp_path):
    """Convert a reference-style torch state_dict to orbax, restore via the
    flexible path, verify forward parity end-to-end."""
    import torch as _torch

    from pytorch_pose_estimation_tpu.train.checkpoint import (
        restore_checkpoint_flexible, save_params)
    from pytorch_pose_estimation_tpu.optim import get_optimizer
    from pytorch_pose_estimation_tpu.train import create_train_state

    _torch.manual_seed(1)
    tm = _ref_style_sbp().eval()
    variables = import_torch_state_dict(
        {f"model.{k}": v for k, v in tm.state_dict().items()})
    out = save_params(str(tmp_path / "imported"), variables)

    model = SBP(num_keypoints=17)
    state = create_train_state(model, get_optimizer("sgd", lr=1e-3),
                               (1, 64, 48, 3))
    state = restore_checkpoint_flexible(out, state)

    x = np.random.RandomState(3).rand(1, 3, 64, 48).astype(np.float32)
    with _torch.no_grad():
        want = tm(_torch.from_numpy(x)).numpy()
    with jax.default_matmul_precision("highest"):
        got = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               want, rtol=1e-3, atol=2e-4)
