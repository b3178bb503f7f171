"""vit_cnn_tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework for multimodal
remote-sensing classification (hyperspectral + LiDAR), with the full capability
surface of the reference PyTorch harness (lmwdhr/ViT-CNN):

- dataset registry + .mat loaders + per-band normalization (ref: datasets.py)
- ground-truth samplers, class balancing, PCA (ref: utils.py)
- model zoo with a uniform ``apply(variables, hsi, lidar) -> logits`` API
  (ref: model/ + model_utils.py:get_model)
- jitted patch-based training with best-val checkpointing
  (ref: model_utils.py:train/val/save_model)
- one-program full-scene sliding-window inference sharded over a device mesh
  (ref: model_utils.py:test)
- OA/AA/Kappa/F1 metrics + text reports (ref: utils.py:metrics/show_results)

Everything compute-heavy runs under ``jax.jit`` on TPU; the hot Mamba
selective-scan is a Pallas kernel (ops/selective_scan.py).
"""

__version__ = "0.1.0"
