"""Torch twins of the flax models, built from the same stage tables, used as
numerical oracles (torch runs on CPU here).  Also provides the param-name
mapping used to port weights between the two, which doubles as the
torch-checkpoint importer's test fixture.
"""

from __future__ import annotations

import numpy as np
import torch
from torch import nn

from pytorch_pose_estimation_tpu.models.darknet import STAGES, STAGE_NAMES


def _conv_bn_relu(c_in, c_out, k):
    pad = (k - 1) // 2
    return nn.Sequential(
        nn.Conv2d(c_in, c_out, k, 1, pad, bias=False),
        nn.BatchNorm2d(c_out),
        nn.ReLU(),
    )


def build_torch_backbone() -> nn.ModuleDict:
    stages = {}
    c_in = 3
    for name, table in zip(STAGE_NAMES, STAGES):
        mods = []
        for entry in table:
            if entry == "M":
                mods.append(nn.MaxPool2d(2, 2))
            else:
                c_out, k = entry
                mods.append(_conv_bn_relu(c_in, c_out, k))
                c_in = c_out
        stages[name] = nn.Sequential(*mods)
    return nn.ModuleDict(stages)


class TorchSBP(nn.Module):
    def __init__(self, num_keypoints=17):
        super().__init__()
        self.backbone = build_torch_backbone()
        def deconv(c_in):
            return nn.Sequential(
                nn.ConvTranspose2d(c_in, 512, 4, 2, 1, bias=False),
                nn.BatchNorm2d(512),
                nn.ReLU(),
            )
        self.deconv_1 = deconv(1024)
        self.deconv_2 = deconv(512)
        self.deconv_3 = deconv(512)
        self.head = nn.Conv2d(512, num_keypoints, 1, 1, bias=False)

    def forward(self, x):
        for name in STAGE_NAMES:
            x = self.backbone[name](x)
        x = self.deconv_1(x)
        x = self.deconv_2(x)
        x = self.deconv_3(x)
        return self.head(x)


def torch_params_to_flax(model: TorchSBP):
    """Map a TorchSBP state to flax {params, batch_stats} pytrees."""
    params = {"backbone": {}, }
    stats = {"backbone": {}, }

    def conv_w(w):
        return np.transpose(w.detach().numpy(), (2, 3, 1, 0))

    def deconv_w(w):
        # torch (in, out, kh, kw) -> flax transpose_kernel layout (kh, kw, out, in)
        return np.transpose(w.detach().numpy(), (2, 3, 1, 0))

    def bn(b):
        p = {"scale": b.weight.detach().numpy(),
             "bias": b.bias.detach().numpy()}
        s = {"mean": b.running_mean.detach().numpy(),
             "var": b.running_var.detach().numpy()}
        return p, s

    for name in STAGE_NAMES:
        stage_p, stage_s = {}, {}
        conv_idx = 0
        for mod in model.backbone[name]:
            if isinstance(mod, nn.Sequential):
                p, s = bn(mod[1])
                stage_p[f"conv{conv_idx}"] = {
                    "conv": {"kernel": conv_w(mod[0].weight)},
                    "bn": p,
                }
                stage_s[f"conv{conv_idx}"] = {"bn": s}
                conv_idx += 1
        params["backbone"][name] = stage_p
        stats["backbone"][name] = stage_s

    for name in ("deconv_1", "deconv_2", "deconv_3"):
        mod = getattr(model, name)
        p, s = bn(mod[1])
        params[name] = {"deconv": {"kernel": deconv_w(mod[0].weight)}, "bn": p}
        stats[name] = {"bn": s}

    params["head"] = {"kernel": conv_w(model.head.weight)}
    return params, stats
