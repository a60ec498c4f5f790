"""Shared helpers for the TPU stage-timing probes."""

import time


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def sync_time(fn, *args, iters=10):
    """Amortized chained timing (see bench.py for the methodology)."""
    import jax
    import jax.numpy as jnp
    probe = jax.jit(lambda o: sum(jnp.sum(x.reshape(-1)[::4099]
                                          .astype(jnp.int32))
                                  for x in jax.tree.leaves(o)))
    float(probe(fn(*args)))

    def chain(k):
        t0 = time.perf_counter()
        for _ in range(k):
            o = fn(*args)
        float(probe(o))
        return time.perf_counter() - t0

    d1 = min(chain(1) for _ in range(3))
    dk = min(chain(iters + 1) for _ in range(2))
    return max((dk - d1) / iters, 1e-9)
