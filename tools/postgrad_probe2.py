"""Backward vs optimizer attribution with loop-invariant hoisting DEFEATED.

postgrad_probe round 1 was confounded: in scan arms whose params never
change, XLA hoists the whole forward/backward out of the loop, so
"grad = 8.7 ms/step" measured one gradient, not k. Here every iteration's
params depend on the previous iteration's result (p + 0*f(prev)), forcing
real per-iteration work while keeping values identical.

Usage: python tools/postgrad_probe2.py; writes tools/postgrad_probe2.json.
"""

from __future__ import annotations

import json
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent))


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import optax

    from train_bench import build_corpus_and_shards

    from basic_pitch_tpu.data import loader
    from basic_pitch_tpu.models import nmp
    from basic_pitch_tpu.train import loop as train_loop
    from basic_pitch_tpu.train import losses

    k, batch_size = 16, 16
    workdir = pathlib.Path(tempfile.mkdtemp(prefix="postgrad2_"))
    _, shards, _ = build_corpus_and_shards(workdir, 12, 30.0)
    train_iter, _ = loader.prepare_datasets(
        str(shards), 0, batch_size, 2, ["guitarset"], [1.0], seed=0,
        device_targets=True,
    )
    batch, _ = train_loop.upload_batch(next(train_iter))

    config = train_loop.TrainConfig()
    adam = optax.adam(config.learning_rate)
    params = nmp.init_params(jax.random.PRNGKey(0))
    opt_state = adam.init(params)

    def loss_of(p, dense):
        outputs, batch_stats = nmp.forward(p, dense["audio"], train=True)
        total, _ = losses.total_loss(
            outputs, dense["targets"], dense.get("weights"),
            label_smoothing=config.label_smoothing,
            weighted_onset=config.weighted_onset_loss,
            positive_weight=config.positive_onset_weight,
        )
        return total

    def jitter(p, acc):
        # value-preserving data dependency on the previous iteration:
        # 0 * acc is exactly 0.0f for finite acc, but XLA cannot hoist
        zero = acc * 0.0
        return jax.tree.map(lambda x: x + zero, p)

    def arm_fwd(carry, batch):
        p, o, acc = carry
        dense = train_loop.materialize_batch(batch)
        total = loss_of(jitter(p, acc), dense)
        return (p, o, acc + total)

    def arm_grad(carry, batch):
        p, o, acc = carry
        dense = train_loop.materialize_batch(batch)
        total, grads = jax.value_and_grad(loss_of)(jitter(p, acc), dense)
        acc = acc + total + sum(jnp.sum(g) for g in jax.tree.leaves(grads))
        return (p, o, acc)

    def arm_grad_adam(carry, batch):
        p, o, acc = carry
        dense = train_loop.materialize_batch(batch)
        total, grads = jax.value_and_grad(loss_of)(p, dense)
        updates, o = adam.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        return (p, o, acc + total)

    arms = {
        "fwd": arm_fwd,
        "grad": arm_grad,
        "grad_adam": arm_grad_adam,
    }

    out = {"batch_size": batch_size, "k": k}
    for name, body in arms.items():
        def run(params, o, batch, body=body):
            def step(carry, _):
                return body(carry, batch), None

            carry, _ = jax.lax.scan(step, (params, o, jnp.float32(0)), None, length=k)
            return carry

        fn = jax.jit(run)
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
    (pathlib.Path(__file__).parent / "postgrad_probe2.json").write_text(
        json.dumps(out, indent=1)
    )


if __name__ == "__main__":
    main()
