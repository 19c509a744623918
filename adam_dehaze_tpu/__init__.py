"""ADAM-Dehaze TPU: a TPU-native adaptive dehazing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
ADAM-Dehaze reference system (fog-intensity classification, three
intensity-specialised dehazing branches, adaptive routing, detection-in-fog,
joint training, and comprehensive evaluation), built TPU-first:

- NHWC layouts, bfloat16 compute on the MXU, static shapes under ``jit``.
- Adaptive routing stays on device (``lax.switch`` / fused soft blends)
  instead of host-side boolean-mask scatter.
- Scaling via ``jax.sharding.Mesh`` + ``shard_map`` (data / spatial / model
  axes) rather than any single-device assumption.
- Pallas kernels for memory-bound hot ops (CBAM-style attention gating,
  fused residual blends).

The public surface mirrors the reference CLI and config schema
(reference: ``main.py:36-39``, ``config/config.yaml``) so users of the
reference can switch without relearning the workflow.
"""

__version__ = "0.1.0"
