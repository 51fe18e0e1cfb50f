"""Does closing over a big device array (vs passing it as a jit argument)
blow up XLA compile time for the walk's gather loop?"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

R = 350_000


def walk(table, ptr0):
    def cond(s):
        return jnp.any(s[0] < R - 1)

    def body(s):
        ptr, acc = s
        rows = table[ptr]
        nxt = ptr + lax.bitcast_convert_type(rows[:, 6],
                                             jnp.int32) % 3 + 1
        nxt = jnp.minimum(nxt, R - 1)
        return nxt, acc + rows[:, 0]

    _, acc = lax.while_loop(cond, body, (ptr0, jnp.zeros(ptr0.shape[0])))
    return acc


def main():
    table_np = np.random.randn(R, 16).astype(np.float32)
    table = jnp.asarray(table_np)
    ptr0 = jnp.zeros(4096, jnp.int32)

    # variant 1: closure constant
    f1 = jax.jit(lambda p: walk(table, p))
    t0 = time.monotonic()
    jax.block_until_ready(f1(ptr0))
    print(f"closure-constant compile+run: {time.monotonic()-t0:.2f}s",
          flush=True)

    # variant 2: explicit argument
    f2 = jax.jit(walk)
    t0 = time.monotonic()
    jax.block_until_ready(f2(table, ptr0))
    print(f"argument compile+run: {time.monotonic()-t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
