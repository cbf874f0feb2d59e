"""ctypes binding for the native Turner evaluator.

The library is initialised with the calibrated tables from
rafft_tpu.energy.params, so Python and native evaluation share one
parameter source.  `native_oracle(temperature)` returns a fast
eval(codes, pt) -> int callable, or None if the toolchain/library is
unavailable (callers fall back to the pure-Python evaluator).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_INIT_TEMP = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    from rafft_tpu.native.build import build, LIB

    try:
        path = build()
    except Exception:
        if not os.path.exists(LIB):
            return None
        path = LIB
    lib = ctypes.CDLL(path)
    lib.turner_eval.restype = ctypes.c_int32
    lib.turner_eval.argtypes = [
        ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32]
    _LIB = lib
    return lib


def _init_tables(lib, temperature: float):
    global _INIT_TEMP
    if _INIT_TEMP == temperature:
        return
    from rafft_tpu.energy.params import get_params
    from rafft_tpu.energy.eval_jax import _dense_special

    p = get_params(temperature)
    hp_len = len(p.hairpin_ext)

    def arr(a):
        a = np.ascontiguousarray(a, dtype=np.int32)
        return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    keep = []  # prevent GC during the call

    def ptr(a):
        a, pp = arr(a)
        keep.append(a)
        return pp

    lib.turner_init(
        ptr(p.stack), ptr(p.hairpin_ext), ptr(p.bulge_ext),
        ptr(p.internal_ext), ctypes.c_int32(hp_len),
        ptr(p.mismatch_h), ptr(p.mismatch_i), ptr(p.mismatch_1n),
        ptr(p.mismatch_23), ptr(p.mismatch_m), ptr(p.mismatch_ext),
        ptr(p.dangle5), ptr(p.dangle3),
        ptr(p.int11), ptr(p.int21), ptr(p.int22),
        ptr(_dense_special(p.tetraloops, 6)),
        ptr(_dense_special(p.triloops, 5)),
        ptr(_dense_special(p.hexaloops, 8)),
        ctypes.c_int32(p.terminal_au), ctypes.c_int32(p.ml_closing),
        ctypes.c_int32(p.ml_intern), ctypes.c_int32(p.ml_base),
        ctypes.c_int32(p.ninio_m), ctypes.c_int32(p.ninio_max))
    _INIT_TEMP = temperature


def native_oracle(temperature: float = 37.0):
    """Returns eval(codes_int8_np, pt_int32_np) -> int, or None."""
    lib = _load()
    if lib is None:
        return None
    _init_tables(lib, temperature)

    c_int8_p = ctypes.POINTER(ctypes.c_int8)
    c_int32_p = ctypes.POINTER(ctypes.c_int32)

    def ev(codes: np.ndarray, pt: np.ndarray) -> int:
        return lib.turner_eval(
            codes.ctypes.data_as(c_int8_p),
            pt.ctypes.data_as(c_int32_p),
            ctypes.c_int32(len(codes)))

    return ev
