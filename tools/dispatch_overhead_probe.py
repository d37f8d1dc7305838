"""Name the fixed ~29 ms per train/eval step (VERDICT r4 weak #4 / next #3).

TRAIN_BENCH r4 measured fwd_ms ~= 29 at batch 16 AND batch 64 — a fixed
per-step cost, not compute. Hypothesis: per-execution dispatch latency of
the tunneled PJRT runtime (every `step(...)` call is an execute RPC), which
chained host-side calls cannot hide. Falsifier: run the SAME k steps inside
ONE executable (`lax.scan` over the step body, batch resident in HBM) — if
per-step time collapses, the 29 ms is dispatch, and the fix is a device-side
multi-step program, not kernel work.

Usage: python tools/dispatch_overhead_probe.py [--batch 16] [--k 16]
Writes tools/dispatch_overhead.json.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--k", type=int, default=16)
    parser.add_argument("--tracks", type=int, default=12)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from train_bench import build_corpus_and_shards

    from basic_pitch_tpu.data import loader
    from basic_pitch_tpu.models import nmp
    from basic_pitch_tpu.train import loop as train_loop

    workdir = pathlib.Path(tempfile.mkdtemp(prefix="dispatch_probe_"))
    _, shards, _ = build_corpus_and_shards(workdir, args.tracks, 30.0)
    train_iter, _ = loader.prepare_datasets(
        str(shards), 0, args.batch, 2, ["guitarset"], [1.0], seed=0,
        device_targets=True,
    )
    batch, _ = train_loop.upload_batch(next(train_iter))
    batch = train_loop.materialize_batch(batch)
    # keep only what the step consumes, as plain dense device arrays
    batch = {k: batch[k] for k in ("audio", "targets", "weights") if k in batch}

    config = train_loop.TrainConfig()
    optimizer = train_loop.make_optimizer(config)
    params = nmp.init_params(jax.random.PRNGKey(0))
    opt_state = optimizer.init(params)
    step = train_loop.build_train_step(optimizer, config)
    eval_step = train_loop.build_eval_step(config)
    k = args.k

    # --- fused: the same k steps inside ONE executable -----------------
    def scan_eval(params, batch):
        def body(carry, _):
            m = nmp.forward(params, batch["audio"], train=False)[0]
            # consume the outputs so no iteration is dead code
            s = sum(jnp.sum(v) for v in m.values())
            return carry + s, None

        total, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
        return total

    def scan_train(params, opt_state, batch):
        def body(carry, _):
            p, o = carry
            p, o, m = train_loop.train_step_body(p, o, batch, optimizer, config)
            return (p, o), m["loss"]

        (p, o), losses_ = jax.lax.scan(body, (params, opt_state), None, length=k)
        return p, o, losses_[-1]

    scan_eval_j = jax.jit(scan_eval)
    scan_train_j = jax.jit(scan_train)

    def timed(fn, n=3):
        best = float("inf")
        for _ in range(n):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        return best * 1e3

    # warm everything
    p, o, m = step(params, opt_state, batch)
    float(jax.device_get(m["loss"]))
    float(jax.device_get(eval_step(p, batch)["loss"]))
    float(jax.device_get(scan_eval_j(p, batch)))
    p2, o2, last = scan_train_j(p, o, batch)
    float(jax.device_get(last))

    def run_chain_eval():
        for _ in range(k):
            m = eval_step(p, batch)
        float(jax.device_get(m["loss"]))

    def run_chain_train():
        nonlocal p, o
        for _ in range(k):
            p, o, m = step(p, o, batch)
        float(jax.device_get(m["loss"]))

    def run_scan_eval():
        float(jax.device_get(scan_eval_j(p, batch)))

    def run_scan_train():
        nonlocal p, o
        p, o, last = scan_train_j(p, o, batch)
        float(jax.device_get(last))

    # single dispatch of a trivial program: the floor any execute pays
    trivial = jax.jit(lambda x: x + 1)
    x0 = jax.device_put(jnp.float32(0))
    float(jax.device_get(trivial(x0)))

    def run_trivial():
        float(jax.device_get(trivial(x0)))

    out = {
        "batch_size": args.batch,
        "k": k,
        "chained_eval_ms_per_step": round(timed(run_chain_eval) / k, 2),
        "scan_eval_ms_per_step": round(timed(run_scan_eval) / k, 2),
        "chained_train_ms_per_step": round(timed(run_chain_train) / k, 2),
        "scan_train_ms_per_step": round(timed(run_scan_train) / k, 2),
        "trivial_dispatch_ms": round(timed(run_trivial, n=5), 2),
        "device": str(jax.devices()[0].device_kind),
    }
    print(json.dumps(out, indent=1))
    path = pathlib.Path(__file__).parent / "dispatch_overhead.json"
    path.write_text(json.dumps(out, indent=1))
    return out


if __name__ == "__main__":
    main()
