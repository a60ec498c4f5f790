#!/usr/bin/env python
"""Per-mode op-count extraction for docs/ROOFLINE.md (CPU-only; VERDICT
r4 #3: 'write the 444/422 rows of ROOFLINE.md so the remaining mode gap
is provably floor or provably not').

Traces the production device program for each subsampling mode at 4K,
walks the jaxpr to each pallas_call, and counts the kernel-body ops by
class, vreg-weighted (elements / (8*128) for 32-bit, /(16*128) for
16-bit), per grid step and per frame. Multiplying by the measured
machine rates (scripts/tpu_calibrate_roofline.py: elementwise 31.4 ns /
64-vreg pass = 0.49 ns/vreg; roll ~5x; gather ~9x; dots MXU-parallel)
gives the serial-issue model to put next to measured in-context times.

Usage: python scripts/bp_opcount.py [mode ...]   (default: 420 444 422 gray)
"""

import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

EW = {"add", "sub", "mul", "and", "or", "xor", "shift_left",
      "shift_right_logical", "shift_right_arithmetic", "max", "min",
      "select_n", "eq", "ne", "lt", "le", "gt", "ge", "convert_element_type",
      "sign", "floor", "abs", "neg", "rem", "div", "integer_pow", "not"}
GATHER = {"gather", "dynamic_gather"}
ROLL = {"dynamic_rotate", "rotate", "roll"}
DOT = {"dot_general"}


def _vregs(aval):
    try:
        n = int(np.prod(aval.shape)) if aval.shape else 1
        bits = np.dtype(aval.dtype).itemsize * 8
    except Exception:
        return 0.0
    lanes_per_vreg = 8 * 128 * (32 // max(bits, 8))
    return n / lanes_per_vreg


def _walk(jaxpr, counts, depth=0):
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        for param in eqn.params.values():
            sub = getattr(param, "jaxpr", None)
            if sub is not None:
                _walk(sub, counts, depth + 1)
            if isinstance(param, (list, tuple)):
                for p in param:
                    sub = getattr(p, "jaxpr", None)
                    if sub is not None:
                        _walk(sub, counts, depth + 1)
        out_v = sum(_vregs(v.aval) for v in eqn.outvars)
        if name in EW:
            counts["ew"] += out_v
            counts["ew_ops"] += 1
        elif name in GATHER or "gather" in name:
            counts["gather"] += out_v
            counts["gather_ops"] += 1
        elif "rotate" in name or name in ROLL:
            counts["roll"] += out_v
            counts["roll_ops"] += 1
        elif name in DOT:
            counts["dot_ops"] += 1
        elif name in ("while", "scan", "cond"):
            counts["ctrl_ops"] += 1


def _find_pallas(jaxpr, found):
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "pallas_call":
            inner = eqn.params.get("jaxpr")
            grid = eqn.params.get("grid_mapping")
            gshape = getattr(grid, "grid", None) if grid else None
            outs = tuple(tuple(v.aval.shape) for v in eqn.outvars)
            found.append((inner, gshape, outs))
        for param in eqn.params.values():
            sub = getattr(param, "jaxpr", None)
            if sub is not None:
                _find_pallas(sub, found)
            if isinstance(param, (list, tuple)):
                for p in param:
                    sub = getattr(p, "jaxpr", None)
                    if sub is not None:
                        _find_pallas(sub, found)


def main():
    from jpegtpu import encoder as enc_mod
    from jpegtpu.config import EncoderConfig
    from jpegtpu.kernels import entropy_pack as epk
    from jpegtpu.kernels import fused_dctq as fdq

    # Trace the PRODUCTION (Pallas) program on the CPU backend: the same
    # interpret-mode switches the test suite uses.
    enc_mod.jax.default_backend = lambda: "tpu"
    epk._interpret = lambda: True
    fdq._interpret = lambda: True

    modes = sys.argv[1:] or ["420", "444", "422", "gray"]
    h, w = 2160, 3840
    for sub in modes:
        cfg = EncoderConfig(quality=90, subsampling=sub,
                            restart_interval="rows")
        shape = (h, w)
        fn, kind, _ = enc_mod._jitted_encode(shape, cfg)
        arg_shape = (h, w * 3) if sub != "gray" else (h, w)
        x = jax.ShapeDtypeStruct(arg_shape, jnp.uint8)
        closed = jax.make_jaxpr(fn)(x)
        found = []
        _find_pallas(closed.jaxpr, found)
        print(f"=== mode {sub}: {len(found)} pallas kernels ===")
        for inner, gshape, outs in found:
            counts = defaultdict(float)
            _walk(inner.jaxpr if hasattr(inner, "jaxpr") else inner, counts)
            steps = int(np.prod(gshape)) if gshape else 1
            label = ",".join(str(o) for o in outs[:2])
            ew, ro, ga = counts["ew"], counts["roll"], counts["gather"]
            # serial-issue model @ measured rates (ns): ew 0.49/vreg,
            # roll 5x, gather 9x; dots are MXU-parallel (excluded)
            model_ns = (ew * 0.49 + ro * 0.49 * 5 + ga * 0.49 * 9)
            print(f"  kernel out={label[:70]} grid={gshape}")
            print(f"    per-step vregs: ew {ew:8.0f}  roll {ro:6.0f} "
                  f"gather {ga:6.0f}  dots {counts['dot_ops']:3.0f} "
                  f"ctrl {counts['ctrl_ops']:2.0f}")
            print(f"    serial-issue model: {model_ns / 1e3:7.1f} us/step "
                  f"x {steps} steps = {model_ns * steps / 1e6:7.3f} ms/frame")
    return 0


if __name__ == "__main__":
    sys.exit(main())
