"""Quick TPU-relay liveness probe: prints OK + round-trip time or FAIL.

Run with `timeout 300 python experiments/probe_tpu.py`; exits 0 iff a jitted
op round-trips through the axon relay and a scalar fetch completes."""
import sys
import time

t0 = time.time()
try:
    import jax
    import jax.numpy as jnp

    d = jax.devices()
    x = jax.jit(lambda a: a * 2 + 1)(jnp.ones((8, 128)))
    s = float(jnp.sum(x))
    print(f"OK devices={d} scalar={s} t={time.time()-t0:.1f}s", flush=True)
except Exception as e:  # noqa: BLE001
    print(f"FAIL {type(e).__name__}: {e} t={time.time()-t0:.1f}s", flush=True)
    sys.exit(1)
