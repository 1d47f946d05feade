"""Weight surgery: extract backbone-only weights from a full checkpoint for
warm-starting the PIS model (reference: saving_weights.py:22-42, consumed
via sbp_pis.yaml model_pretrained).

    python saving_weights.py --ckpt CKPT_DIR [--out pretrained_weights]
"""

import argparse

from pytorch_pose_estimation_tpu.train.checkpoint import extract_backbone

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", required=True, type=str,
                        help="source checkpoint dir")
    parser.add_argument("--out", type=str, default="pretrained_weights",
                        help="output checkpoint dir")
    args = parser.parse_args()
    out = extract_backbone(args.ckpt, args.out)
    print(f"saved backbone weights to {out}")
