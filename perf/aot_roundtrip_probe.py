"""Can compiled TPU executables be serialized/deserialized under axon?

Serve-start pays 3-7 min of remote compiles per program and the XLA
persistent cache does not hit through the axon tunnel. If
jax.experimental.serialize_executable round-trips, a second serve start
can skip compilation entirely.

Usage:
  python aot_test.py save   # compile a program, serialize to /tmp/aot.bin
  python aot_test.py load   # fresh process: deserialize and run (no compile)
"""
import pickle
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def make_fn():
    def fn(x, w):
        def body(carry, _):
            y = jnp.tanh(carry @ w)
            return y, y.sum()
        out, sums = jax.lax.scan(body, x, None, length=32)
        return out.mean() + sums.mean()
    return jax.jit(fn)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "save"
    x = jnp.ones((256, 512), jnp.float32)
    w = jnp.ones((512, 512), jnp.float32)
    print("device:", jax.devices()[0])

    if mode == "save":
        fn = make_fn()
        t0 = time.time()
        lowered = fn.lower(x, w)
        compiled = lowered.compile()
        print(f"compile: {time.time() - t0:.1f}s")
        t0 = time.time()
        from jax.experimental import serialize_executable as se

        payload, in_tree, out_tree = se.serialize(compiled)
        with open("/tmp/aot.bin", "wb") as f:
            pickle.dump((payload, in_tree, out_tree), f)
        print(f"serialize: {time.time() - t0:.1f}s, "
              f"{len(payload) / 1e6:.1f} MB")
        t0 = time.time()
        print("result:", float(compiled(x, w)))
        print(f"run: {time.time() - t0:.2f}s")
    else:
        from jax.experimental import serialize_executable as se

        with open("/tmp/aot.bin", "rb") as f:
            payload, in_tree, out_tree = pickle.load(f)
        t0 = time.time()
        compiled = se.deserialize_and_load(payload, in_tree, out_tree)
        print(f"deserialize_and_load: {time.time() - t0:.1f}s")
        t0 = time.time()
        print("result:", float(compiled(x, w)))
        print(f"run: {time.time() - t0:.2f}s")


if __name__ == "__main__":
    main()
