"""The reference's own self-consistency invariant as a real test
(reference: dataset/sbp_coco_dataset.py:280-346 __main__ loop): encode GT
joints to heatmaps, push them through the metric as if they were
predictions, and the OKS AP ceiling must be ~1.0."""

import numpy as np
import jax.numpy as jnp
import pytest

from pytorch_pose_estimation_tpu.data import CocoAnnotations, SBPCOCODataModule
from pytorch_pose_estimation_tpu.eval import SBPmAPCOCO
from pytorch_pose_estimation_tpu.ops import sbp_heatmaps

from synth_fixture import make_dataset


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("rt"))
    return root, make_dataset(root, "val2017", 8, seed=42)


def test_encode_metric_roundtrip_ap(synth):
    root, json_path = synth
    input_size = [256, 192]
    output_size = [64, 48]
    dm = SBPCOCODataModule(
        train_path=json_path, val_path=json_path, img_dir=root,
        input_size=input_size, output_size=output_size, num_keypoints=17,
        sigma=2, workers=2, batch_size=4,
        class_labels=[str(i) for i in range(17)])
    dm.setup()
    metric = SBPmAPCOCO(json_path, input_size, conf_threshold=0.25)
    metric.reset_states()

    ratio = output_size[0] / input_size[0]
    for batch in dm.val_loader():
        joints = batch["joints"] * ratio
        joints[batch["joints_vis"] < 1] = -1
        hms = np.stack([np.asarray(sbp_heatmaps(j, tuple(output_size), 17,
                                                2.0)) for j in joints])
        # metric expects logits (it applies sigmoid): inverse-sigmoid the
        # GT heatmaps, clamped away from {0, 1}
        p = np.clip(hms, 1e-6, 1 - 1e-6)
        logits = np.log(p / (1 - p))
        nhwk = jnp.asarray(np.transpose(logits, (0, 2, 3, 1)))
        metric.update_state(batch, nhwk)

    ap50 = metric.result(verbose=False)
    assert ap50 > 0.95, ap50


def test_roundtrip_results_json_format(synth):
    """results.json entries carry the COCO result schema."""
    import json
    import os

    _, json_path = synth
    coco = CocoAnnotations(json_path)
    with open(os.path.join(os.getcwd(), "results.json")) as f:
        res = json.load(f)
    assert res, "previous test wrote results"
    entry = res[0]
    assert set(entry) == {"image_id", "category_id", "keypoints", "score"}
    assert len(entry["keypoints"]) == 17 * 3
    assert entry["image_id"] in coco.imgs
