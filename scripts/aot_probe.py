"""Probe: does explicit executable serialization work on the axon backend?

If the persistent compile cache misses across driver sessions (r3: 979 s
compile+warmup despite a 712 MB cache), the fallback is to serialize the
compiled executable ourselves and reload it in later processes —
`jax.experimental.serialize_executable.{serialize, deserialize_and_load}`.
This probe compiles a small jitted function, serializes it, reloads it in
THIS process, and (second invocation) reloads from disk in a FRESH process.

Usage: python scripts/aot_probe.py save   # compile + serialize to /tmp
       python scripts/aot_probe.py load   # fresh process: deserialize + run
"""
from __future__ import annotations

import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PATH = "/tmp/aot_probe.bin"


def make_fn():
    import jax
    import jax.numpy as jnp

    def f(x, y):
        for _ in range(4):
            x = jnp.tanh(x @ y) + x
        return x.sum(axis=-1)

    return jax.jit(f)


def args():
    import jax.numpy as jnp
    import numpy as np

    r = np.random.RandomState(0)
    return (jnp.asarray(r.randn(256, 256), jnp.float32),
            jnp.asarray(r.randn(256, 256), jnp.float32))


def save():
    import time

    import numpy as np
    from jax.experimental.serialize_executable import serialize

    f = make_fn()
    x, y = args()
    t0 = time.perf_counter()
    lowered = f.lower(x, y)
    compiled = lowered.compile()
    print(f"compile: {time.perf_counter()-t0:.2f}s")
    out = compiled(x, y)
    print("out sum:", float(np.asarray(out).sum()))
    t0 = time.perf_counter()
    payload, in_tree, out_tree = serialize(compiled)
    with open(PATH, "wb") as fh:
        pickle.dump((payload, in_tree, out_tree), fh)
    print(f"serialized {os.path.getsize(PATH)} bytes in {time.perf_counter()-t0:.2f}s")


def load():
    import time

    import numpy as np
    from jax.experimental.serialize_executable import deserialize_and_load

    x, y = args()
    t0 = time.perf_counter()
    with open(PATH, "rb") as fh:
        payload, in_tree, out_tree = pickle.load(fh)
    compiled = deserialize_and_load(payload, in_tree, out_tree)
    print(f"deserialize: {time.perf_counter()-t0:.2f}s")
    t0 = time.perf_counter()
    out = compiled(x, y)
    s = float(np.asarray(out).sum())
    print(f"run: {time.perf_counter()-t0:.2f}s  out sum: {s}")


if __name__ == "__main__":
    {"save": save, "load": load}[sys.argv[1]]()
