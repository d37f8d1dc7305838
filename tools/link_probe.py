"""Measure the host->device link's concurrency behavior (tunneled runtime).

Answers the questions that decide whether single-stream transcription can be
de-link-bound (VERDICT r3 weak #1):

  1. Is `jax.device_put` async (returns before the bytes land) or does the
     caller block for the transfer?
  2. Do N concurrent device_put calls (from N threads) move more aggregate
     bytes/s than one — i.e. does the tunnel multiplex RPC streams?
  3. Does an in-flight device computation slow a concurrent upload (shared
     stream) or not (separate DMA/RPC lanes)?

Run on the real chip:  python tools/link_probe.py
Prints one JSON dict and writes LINK_PROBE.json at the repo root.

Measured findings (v5e behind the axon tunnel, 2026-08-18). STABLE across
runs: device_put is synchronous (the calling thread blocks for the
transfer); `block_until_ready` does NOT await enqueued computation (only a
device_get of a dependent value does); a transfer with a novel SHAPE costs
a ~40-66 ms layout round trip while seen shapes stream at link speed.
WEATHER-DEPENDENT (same probe, minutes apart): absolute bandwidth swings
25 -> 1400 MiB/s, and under congestion concurrent device_puts collapse
(573 -> 42 MiB/s with 2 threads) and an in-flight compute slows an upload
~19x, while at fast weather neither effect appears. The robust schedule
under all weather is therefore "few, large, same-shaped transfers" —
overlap via upload threads is unreliable and can invert into a 14-19x
loss — which is what the pipeline does.
"""

from __future__ import annotations

import json
import time
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

MIB = 1 << 20
BUF_MIB = 16  # per-buffer payload


def canned(i: int) -> np.ndarray:
    rng = np.random.RandomState(i)
    return np.cumsum(rng.randint(-300, 300, BUF_MIB * MIB // 2)).astype(np.int16)


def main() -> None:
    out = {"device": str(jax.devices()[0])}
    bufs = [canned(i) for i in range(8)]

    # warm the transfer path
    jax.block_until_ready(jax.device_put(bufs[0]))

    # 1) async-ness of device_put
    t0 = time.time()
    h = jax.device_put(bufs[1])
    t_return = time.time() - t0
    jax.block_until_ready(h)
    t_ready = time.time() - t0
    out["put_return_s"] = round(t_return, 4)
    out["put_ready_s"] = round(t_ready, 4)
    out["put_is_async"] = t_return < 0.5 * t_ready

    # 2) sequential vs concurrent aggregate throughput
    def put_all(buffers, workers):
        t0 = time.time()
        if workers == 1:
            handles = [jax.device_put(b) for b in buffers]
        else:
            with ThreadPoolExecutor(workers) as pool:
                handles = list(pool.map(jax.device_put, buffers))
        jax.block_until_ready(handles)
        return len(buffers) * BUF_MIB / (time.time() - t0)

    for workers in (1, 2, 4):
        rates = [put_all(bufs, workers) for _ in range(3)]
        out[f"mib_s_{workers}thread"] = round(max(rates), 1)

    # 3) upload speed while the device is busy computing
    @jax.jit
    def burn(x):
        def body(_, acc):
            return jnp.tanh(acc @ acc)

        return jax.lax.fori_loop(0, 400, body, x)

    x = jnp.ones((2048, 2048), jnp.float32)
    jax.block_until_ready(burn(x))  # compile
    busy = burn(x)  # enqueue long compute
    t0 = time.time()
    handles = [jax.device_put(b) for b in bufs[:4]]
    jax.block_until_ready(handles)
    busy_rate = 4 * BUF_MIB / (time.time() - t0)
    jax.block_until_ready(busy)
    out["mib_s_while_computing"] = round(busy_rate, 1)

    # novel-shape vs seen-shape transfer cost (layout round trip)
    base = bufs[0]
    t0 = time.time()
    jax.block_until_ready(jax.device_put(base))
    out["seen_shape_16mib_ms"] = round((time.time() - t0) * 1000, 1)
    novel = base[: len(base) - 1017].copy()
    t0 = time.time()
    jax.block_until_ready(jax.device_put(novel))
    out["novel_shape_16mib_ms"] = round((time.time() - t0) * 1000, 1)

    # does block_until_ready await enqueued compute? (device_get does)
    big = jnp.ones((2048, 2048), jnp.float32)
    jax.block_until_ready(burn(big))
    t0 = time.time()
    jax.block_until_ready(burn(big))
    t_block = time.time() - t0
    t0 = time.time()
    jax.device_get(burn(big)[0, 0])
    t_get = time.time() - t0
    out["burn_block_until_ready_s"] = round(t_block, 4)
    out["burn_device_get_s"] = round(t_get, 4)
    out["block_until_ready_awaits_compute"] = t_block > 0.5 * t_get

    import pathlib

    pathlib.Path("LINK_PROBE.json").write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
