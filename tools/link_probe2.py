"""Follow-up probe: is the tunneled runtime strictly in-order?

If a device_put issued after an enqueued compute completes only after the
compute does (completion ~= burn_s + transfer_s), the runtime serializes all
ops on one stream and upload/compute overlap is impossible — the optimal
schedule is then phase separation (all uploads at full link speed, then all
computes). Run: python tools/link_probe2.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

MIB = 1 << 20
BUF_MIB = 16


def main() -> None:
    out = {}
    buf = np.cumsum(np.random.RandomState(0).randint(-300, 300, BUF_MIB * MIB // 2)).astype(
        np.int16
    )
    jax.block_until_ready(jax.device_put(buf))

    @jax.jit
    def burn(x):
        def body(_, acc):
            return jnp.tanh(acc @ acc)

        return jax.lax.fori_loop(0, 400, body, x)

    x = jnp.ones((2048, 2048), jnp.float32)
    jax.block_until_ready(burn(x))

    # burn alone
    t0 = time.time()
    jax.block_until_ready(burn(x))
    out["burn_s"] = round(time.time() - t0, 4)

    # put alone
    t0 = time.time()
    jax.block_until_ready(jax.device_put(buf))
    out["put_alone_s"] = round(time.time() - t0, 4)

    # put right after burn enqueue
    b = burn(x)
    t0 = time.time()
    jax.block_until_ready(jax.device_put(buf))
    out["put_after_burn_enqueue_s"] = round(time.time() - t0, 4)
    jax.block_until_ready(b)

    # in-order test the other way: enqueue put, then short compute — does the
    # compute result wait for the put?
    @jax.jit
    def tiny(x):
        return x * 2.0

    y = jnp.ones((8,), jnp.float32)
    jax.block_until_ready(tiny(y))
    h = jax.device_put(buf)
    t0 = time.time()
    jax.block_until_ready(tiny(y))
    out["tiny_after_put_s"] = round(time.time() - t0, 4)
    jax.block_until_ready(h)

    out["in_order"] = out["put_after_burn_enqueue_s"] > 0.8 * (
        out["burn_s"] + out["put_alone_s"]
    )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
