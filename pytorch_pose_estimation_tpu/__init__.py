"""TPU-native pose-estimation framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
myungsanglee/PyTorch-Pose-Estimation (see SURVEY.md):

* SBP  -- "Simple Baselines" top-down single-person heatmap regression
          (reference: models/detector/sbp.py).
* SPM  -- "Single-Stage Multi-Person Pose Machines" bottom-up root-joint
          heatmaps + displacement fields (reference: models/detector/spm.py).
* PIS  -- 11-keypoint upper-body domain variant plus handle-grip /
          falling-down behaviour classifiers (reference: utils/sbp_pis_utils.py).

Design: NHWC Flax modules jitted onto the MXU, device-side fused
preprocessing/augmentation, vectorized/Pallas target generation and decoding,
`jax.sharding.Mesh` data parallelism over ICI, orbax checkpoints, and a
pure-NumPy (optionally C++-accelerated) COCO OKS evaluator replacing
pycocotools.
"""

__version__ = "0.1.0"
