"""Profiling and speed-of-light accounting.

The reference has no profiling beyond wall-clock prints
(``sim2real/run.py:347-351``, ``run_robot.py:263``).  This module provides
the BASELINE-mandated per-kernel accounting for the TPU engine:

* :func:`trace` — context manager around ``jax.profiler`` producing a
  Perfetto/XPlane trace directory viewable in TensorBoard.
* :func:`count_flops` — static arithmetic-op count of a jittable function
  via its jaxpr (elementwise ops weighted by output size, dots by 2mnk).
* :func:`roofline` — compares a measured runtime against the
  arithmetic-bound and HBM-bound lower limits for a given chip.
"""
from __future__ import annotations

import contextlib
from dataclasses import dataclass
from typing import Any, Dict

import numpy as np
import jax

# f32 vector-unit and HBM peaks; MXU f32 throughput is not the relevant
# bound for the scalarized kernel (pure VPU math).
CHIP_PEAKS = {
    "v5e": dict(vpu_flops=0.9e12, mxu_bf16_flops=197e12, hbm_bytes=819e9),
}

_ELEMENTWISE_1 = {
    "add", "sub", "mul", "div", "max", "min", "neg", "abs", "sign",
    "floor", "ceil", "round", "and", "or", "xor", "not", "select_n",
}
_ELEMENTWISE_N = {
    "sqrt": 4, "rsqrt": 4, "exp": 8, "log": 8, "sin": 8, "cos": 8,
    "tanh": 10, "logistic": 10, "pow": 10, "erf": 10,
}


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace("/tmp/prof"): run_workload()`` then inspect with
    TensorBoard's profile plugin / Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _count_jaxpr(jaxpr) -> float:
    flops = 0.0
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        out_size = sum(
            int(np.prod(v.aval.shape)) for v in eqn.outvars
            if hasattr(v.aval, "shape")
        )
        if prim in _ELEMENTWISE_1:
            flops += out_size
        elif prim in _ELEMENTWISE_N:
            flops += _ELEMENTWISE_N[prim] * out_size
        elif prim == "dot_general":
            a, b = eqn.invars[0].aval, eqn.invars[1].aval
            dims = eqn.params["dimension_numbers"][0][0]
            k = int(np.prod([a.shape[d] for d in dims])) or 1
            flops += 2.0 * out_size * k
        elif prim in ("pjit", "closed_call", "custom_jvp_call",
                      "custom_vjp_call", "remat"):
            inner = eqn.params.get("jaxpr")
            if inner is not None:
                flops += _count_jaxpr(
                    inner.jaxpr if hasattr(inner, "jaxpr") else inner
                )
        elif prim in ("scan", "while"):
            inner = eqn.params.get("jaxpr") or eqn.params.get("body_jaxpr")
            n = eqn.params.get("length", 1)
            if inner is not None:
                flops += n * _count_jaxpr(
                    inner.jaxpr if hasattr(inner, "jaxpr") else inner
                )
    return flops


def count_flops(fn, *args, **kwargs) -> float:
    """Static flop estimate of ``fn(*args)`` from its jaxpr."""
    return _count_jaxpr(jax.make_jaxpr(fn, **kwargs)(*args).jaxpr)


@dataclass
class Roofline:
    measured_s: float
    flops: float
    bytes_moved: float
    flops_bound_s: float
    hbm_bound_s: float
    pct_of_compute_sol: float
    pct_of_hbm_sol: float

    def report(self) -> str:
        return (
            f"measured {self.measured_s*1e6:.1f} us | "
            f"compute-bound floor {self.flops_bound_s*1e6:.1f} us "
            f"({self.pct_of_compute_sol:.1f}% of SoL) | "
            f"HBM floor {self.hbm_bound_s*1e6:.1f} us "
            f"({self.pct_of_hbm_sol:.1f}% of SoL)"
        )


def roofline(measured_s: float, flops: float, bytes_moved: float,
             chip: str = "v5e",
             compute_key: str = "vpu_flops") -> Roofline:
    peaks: Dict[str, Any] = CHIP_PEAKS[chip]
    fb = flops / peaks[compute_key]
    hb = bytes_moved / peaks["hbm_bytes"]
    return Roofline(
        measured_s=measured_s, flops=flops, bytes_moved=bytes_moved,
        flops_bound_s=fb, hbm_bound_s=hb,
        pct_of_compute_sol=100.0 * fb / max(measured_s, 1e-12),
        pct_of_hbm_sol=100.0 * hb / max(measured_s, 1e-12),
    )
