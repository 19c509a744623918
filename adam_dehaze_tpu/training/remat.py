"""Rematerialisation modes for the training forwards (config `tpu.remat`).

- ``False``: save everything (XLA default AD residuals).
- ``True`` / ``"full"``: `jax.checkpoint` the whole forward — recompute all
  activations in the backward (max HBM savings, ~2x forward FLOPs).
- ``"fullres"``: SELECTIVE, and STRUCTURAL rather than step-level: branch
  models built from a config with `tpu.remat: fullres` wrap their
  full-resolution blocks in nn.remat twins (models/branches.py:
  _fullres_blocks, nn/blocks.py:remat_twin — identical parameter tree).
  At the step level this mode is identity. MEASURED on v5e: it reduces AD
  residuals but INCREASES peak HBM (see remat_twin's docstring — XLA's
  scheduler-level remat already covered these buffers); kept opt-in as a
  compiler-version-dependent knob, not a recommendation.

  Why not a checkpoint_name policy: `save_anything_except_these_names` on
  tagged full-res activations was MEASURED not to shed chain residuals —
  partial-eval simply saves the excluded value's unnamed neighbor (same
  full-res byte count; DESIGN.md §15) — and the anchor-style
  `save_only_these_names` recomputes every untagged interior, i.e. full
  remat's FLOP bill. Structural wrapping bounds the recompute to exactly
  the blocks whose memory it frees.

No reference counterpart: the reference relies on torch's implicit
caching-allocator behavior and documents no checkpointing
(/root/reference/training/train_joint.py).
"""
from __future__ import annotations

import jax


def apply_remat(fwd, remat, img_size=None):
    """Wrap a forward per the remat mode; identity when remat is falsy or
    'fullres' (structural — the model itself carries the remat twins)."""
    del img_size  # kept for call-site stability; fullres is structural now
    if remat == "fullres":
        return fwd
    if remat:
        return jax.checkpoint(fwd)
    return fwd
