"""Inside-the-step attribution of the train step's device time.

tools/dispatch_overhead.json showed: forward = 3 ms (batch 16), chained
dispatch floor = 23 ms, but fwd+bwd = 114 ms device time — backward is
~37x forward, far beyond the 2-3x a conv net's backward should cost.
This breaks the step into cumulative scan-fused arms so the anomaly has a
name; each arm is ONE executable scanning k iterations (dispatch amortized
away), device_get-forced.

Usage: python tools/train_step_anatomy2.py [--batch 16] [--k 16]
Writes tools/train_step_anatomy2.json.
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
    import optax

    from train_bench import build_corpus_and_shards

    from basic_pitch_tpu.data import loader
    from basic_pitch_tpu.models import nmp
    from basic_pitch_tpu.train import loop as train_loop
    from basic_pitch_tpu.train import losses

    workdir = pathlib.Path(tempfile.mkdtemp(prefix="anatomy2_"))
    _, shards, _ = build_corpus_and_shards(workdir, args.tracks, 30.0)
    train_iter, _ = loader.prepare_datasets(
        str(shards), 0, args.batch, 2, ["guitarset"], [1.0], seed=0,
        device_targets=True,
    )
    batch, _ = train_loop.upload_batch(next(train_iter))

    config = train_loop.TrainConfig()
    optimizer = train_loop.make_optimizer(config)
    params = nmp.init_params(jax.random.PRNGKey(0))
    opt_state = optimizer.init(params)
    k = args.k

    def loss_of(p, dense):
        outputs, batch_stats = nmp.forward(p, dense["audio"], train=True)
        total, per_head = losses.total_loss(
            outputs, dense["targets"], dense.get("weights"),
            label_smoothing=config.label_smoothing,
            weighted_onset=config.weighted_onset_loss,
            positive_weight=config.positive_onset_weight,
        )
        return total, (per_head, batch_stats)

    def scan(body):
        def run(params, opt_state, batch):
            def step(carry, _):
                return body(carry, batch), None

            carry, _ = jax.lax.scan(step, (params, opt_state, jnp.float32(0)), None, length=k)
            return carry

        return jax.jit(run)

    def arm_materialize(carry, batch):
        p, o, acc = carry
        dense = train_loop.materialize_batch(batch)
        acc = acc + sum(jnp.sum(v) for v in dense["targets"].values()) + jnp.sum(dense["audio"])
        return p, o, acc

    def arm_fwd_loss(carry, batch):
        p, o, acc = carry
        dense = train_loop.materialize_batch(batch)
        total, _ = loss_of(p, dense)
        return p, o, acc + total

    def arm_fwd_eval_mode(carry, batch):
        p, o, acc = carry
        dense = train_loop.materialize_batch(batch)
        outputs = nmp.forward(p, dense["audio"], train=False)[0]
        return p, o, acc + sum(jnp.sum(v) for v in outputs.values())

    def arm_grad(carry, batch):
        p, o, acc = carry
        dense = train_loop.materialize_batch(batch)
        (total, _), grads = jax.value_and_grad(loss_of, has_aux=True)(p, dense)
        acc = acc + total + sum(jnp.sum(g) for g in jax.tree.leaves(grads))
        return p, o, acc

    def arm_full(carry, batch):
        p, o, acc = carry
        p, o, m = train_loop.train_step_body(p, o, batch, optimizer, config)
        return p, o, acc + m["loss"]

    arms = {
        "materialize": arm_materialize,
        "fwd_eval_mode": arm_fwd_eval_mode,
        "fwd_loss_train_mode": arm_fwd_loss,
        "grad": arm_grad,
        "full_step": arm_full,
    }

    out = {"batch_size": args.batch, "k": k, "device": str(jax.devices()[0].device_kind)}
    for name, body in arms.items():
        fn = scan(body)
        # warm (compile)
        t0 = time.time()
        carry = fn(params, opt_state, batch)
        float(jax.device_get(carry[2]))
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            carry = fn(params, opt_state, batch)
            float(jax.device_get(carry[2]))
            best = min(best, time.time() - t0)
        out[name + "_ms_per_step"] = round(best / k * 1e3, 2)
        out[name + "_compile_s"] = round(compile_s, 1)
        print(name, out[name + "_ms_per_step"], "ms/step", flush=True)

    print(json.dumps(out, indent=1))
    (pathlib.Path(__file__).parent / "train_step_anatomy2.json").write_text(
        json.dumps(out, indent=1)
    )
    return out


if __name__ == "__main__":
    main()
