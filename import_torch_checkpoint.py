"""Convert a reference PyTorch/Lightning checkpoint into an orbax
checkpoint usable by test_sbp.py / inference_sbp.py, for decode-level
parity evaluation with reference-trained weights.

    python import_torch_checkpoint.py --ckpt epoch=194-step=113879.ckpt \
        --out ./imported_weights
    python test_sbp.py --cfg configs/sbp_coco.yaml --ckpt ./imported_weights
"""

import argparse

from pytorch_pose_estimation_tpu.models.torch_import import (
    import_torch_checkpoint,
)
from pytorch_pose_estimation_tpu.train.checkpoint import save_params

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", required=True, type=str,
                        help="reference .ckpt/.pt file")
    parser.add_argument("--out", required=True, type=str,
                        help="output orbax checkpoint dir")
    args = parser.parse_args()
    variables = import_torch_checkpoint(args.ckpt)
    out = save_params(args.out, variables)
    print(f"imported {args.ckpt} -> {out}")
