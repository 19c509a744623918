"""Int8 quantized inference for the dehazing branches (serving path).

Dynamic post-training quantization via AQT: inside `quantized_inference()`,
every ConvBlock convolution runs as int8 x int8 -> int32 on the MXU with
per-tensor dynamic scales (v5e int8 peak is ~2x bf16). Parameters are the
UNCHANGED float32 trees — quantization happens at trace time, so any trained
checkpoint serves quantized with zero conversion.

Scope: ConvBlock convs only (the FLOPs carriers). Output heads, ConvTranspose
upsamples, attention MLPs, and BatchNorm stay in the compute dtype, which
keeps the [0,1] output fidelity high (see tests/test_quant.py for the
measured int8-vs-f32 PSNR).

Usage (the context must be active while the function TRACES, so wrap the
body, not the jit):

    def apply(x):
        with quantized_inference():
            return model.apply(variables, x)
    fast = jax.jit(apply)
"""
from __future__ import annotations

import contextlib
import threading
from typing import Callable, Optional

_STATE = threading.local()


def _active_conv() -> Optional[Callable]:
    return getattr(_STATE, "conv_fn", None)


def _make_int8_conv() -> Callable:
    from aqt.jax.v2 import aqt_conv_general as aqt_conv
    return aqt_conv.make_conv_general_dilated(
        aqt_conv.conv_general_dilated_make(2, lhs_bits=8, rhs_bits=8))


@contextlib.contextmanager
def quantized_inference(bits: int = 8):
    """Route ConvBlock convolutions through AQT int8 while tracing."""
    if bits not in (8,):
        raise ValueError(f"Unsupported quantization bits: {bits}")
    prev = _active_conv()
    _STATE.conv_fn = _make_int8_conv()
    try:
        yield
    finally:
        _STATE.conv_fn = prev


def conv_kwargs() -> dict:
    """Extra nn.Conv kwargs for the active quantization mode (empty when
    quantization is off). Consulted by ConvBlock at trace time."""
    fn = _active_conv()
    return {"conv_general_dilated": fn} if fn is not None else {}


def quantize_apply(fn: Callable, bits: int = 8) -> Callable:
    """Wrap an apply fn so its body traces inside quantized_inference —
    robust to retraces (the context re-enters on every trace)."""
    def wrapped(*args, **kwargs):
        with quantized_inference(bits):
            return fn(*args, **kwargs)
    return wrapped
