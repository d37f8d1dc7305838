#!/usr/bin/env python
"""Measured A/B of MXU precision for the TRAINING step (round 5).

Inference pins HIGHEST for exact event parity (tools/precision_ab.json);
training's acceptance gate is held-out convergence, so the faster MXU
passes are candidates there. This measures the scan-fused fwd+bwd step
(the honest device number, no per-dispatch RPC) at batch 64/128 for
Precision.{HIGHEST,HIGH,DEFAULT}, on synthetic batches.

Convergence is judged separately by tools/train_bench.py's held-out
comparator with --train-precision.

Run on the real chip:  python tools/train_precision_ab.py
Writes tools/train_precision_ab.json.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, ".")

REPO = pathlib.Path(__file__).resolve().parent.parent


def main() -> None:
    import jax
    import jax.numpy as jnp

    from basic_pitch_tpu import constants
    from basic_pitch_tpu.models import nmp, params as params_io
    from basic_pitch_tpu.train import loop as train_loop

    params = params_io.load_params()
    frames = constants.ANNOT_N_FRAMES
    rng = np.random.RandomState(0)
    k = 8
    report = {"device": jax.devices()[0].device_kind, "k_steps": k, "arms": []}

    for batch in (64, 128):
        stacked = {
            "audio": jnp.asarray(
                rng.randn(k, batch, constants.AUDIO_N_SAMPLES).astype(np.float32)
                * 0.1
            ),
            "targets": {
                "contour": jnp.asarray(
                    rng.rand(k, batch, frames, 264).astype(np.float32)
                ),
                "note": jnp.asarray(rng.rand(k, batch, frames, 88).astype(np.float32)),
                "onset": jnp.asarray(
                    (rng.rand(k, batch, frames, 88) > 0.95).astype(np.float32)
                ),
            },
            "weights": {
                kk: jnp.ones((k, batch), np.float32)
                for kk in ("contour", "note", "onset")
            },
        }
        for prec in ("highest", "high", "default"):
            config = train_loop.TrainConfig(precision=prec)
            optimizer = train_loop.make_optimizer(config)
            step = train_loop.build_multi_step(optimizer, config)
            # the jitted step donates (params, opt_state): give each arm
            # fresh device copies so donation can't free the shared tree
            p = jax.tree.map(jnp.array, params)
            s = optimizer.init(p)
            p, s, m = step(p, s, stacked)  # compile + warm
            jax.block_until_ready(m["loss"])
            reps = 3
            t0 = time.perf_counter()
            for _ in range(reps):
                p, s, m = step(p, s, stacked)
            jax.block_until_ready(m["loss"])
            dt = (time.perf_counter() - t0) / (reps * k)
            loss0 = float(np.asarray(m["loss"])[0])
            arm = {
                "batch_size": batch,
                "precision": prec,
                "fwd_bwd_scan_ms": round(dt * 1e3, 2),
                "windows_per_s_device_only": round(batch / dt, 1),
                "loss_sample": round(loss0, 4),
                "loss_finite": bool(np.isfinite(loss0)),
            }
            report["arms"].append(arm)
            print(arm, file=sys.stderr)
            del p, s, step

    out = REPO / "tools" / "train_precision_ab.json"
    out.write_text(json.dumps(report, indent=1))
    print(json.dumps(report))


if __name__ == "__main__":
    main()
