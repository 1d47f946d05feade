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

# Persistent XLA compile cache for every process importing the framework
# (CLIs, bench, embedding users).  Compiles of the fused train/predict
# graphs cost 30-150+ s on a TPU backend; with the cache a given
# (graph, shapes) pair compiles once per machine, not once per process.
# Opt out / redirect with JAX_COMPILATION_CACHE_DIR.


def _enable_compile_cache():
    import os

    import jax

    if jax.config.jax_compilation_cache_dir:  # explicit setting wins
        return
    path = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "jax_comp_cache"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that takes >1s to compile (default 60s would
        # skip most of our kernels)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except (OSError, AttributeError):  # read-only home / old jax: skip
        pass


_enable_compile_cache()
del _enable_compile_cache
