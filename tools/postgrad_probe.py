"""Which post-gradient op costs 106 ms? (follow-up to train_step_anatomy2)

grad arm = 8.7 ms/step, full step = 115 ms/step at batch 16 — the gap is
optimizer.update + apply_updates + unit-norm constraint + BN-stat fold +
the metrics dict. Cumulative arms isolate it.

Usage: python tools/postgrad_probe.py; writes tools/postgrad_probe.json.
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
    workdir = pathlib.Path(tempfile.mkdtemp(prefix="postgrad_"))
    _, shards, _ = build_corpus_and_shards(workdir, 12, 30.0)
    train_iter, _ = loader.prepare_datasets(
        str(shards), 0, batch_size, 2, ["guitarset"], [1.0], seed=0,
        device_targets=True,
    )
    batch, _ = train_loop.upload_batch(next(train_iter))

    config = train_loop.TrainConfig()
    optimizer = train_loop.make_optimizer(config)
    adam_plain = optax.adam(config.learning_rate)
    params = nmp.init_params(jax.random.PRNGKey(0))
    opt_state = optimizer.init(params)
    opt_state_plain = adam_plain.init(params)

    def loss_of(p, dense):
        outputs, batch_stats = nmp.forward(p, dense["audio"], train=True)
        total, _ = losses.total_loss(
            outputs, dense["targets"], dense.get("weights"),
            label_smoothing=config.label_smoothing,
            weighted_onset=config.weighted_onset_loss,
            positive_weight=config.positive_onset_weight,
        )
        return total, batch_stats

    def graded(p, batch):
        dense = train_loop.materialize_batch(batch)
        (total, batch_stats), grads = jax.value_and_grad(loss_of, has_aux=True)(p, dense)
        return total, batch_stats, grads

    def arm_adam_inject(carry, batch):
        p, o, _po, acc = carry
        total, _stats, grads = graded(p, batch)
        updates, o = optimizer.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        return (p, o, _po, acc + total)

    def arm_adam_plain(carry, batch):
        p, _o, po, acc = carry
        total, _stats, grads = graded(p, batch)
        updates, po = adam_plain.update(grads, po, p)
        p = optax.apply_updates(p, updates)
        return (p, _o, po, acc + total)

    def arm_adam_norm(carry, batch):
        p, o, _po, acc = carry
        total, _stats, grads = graded(p, batch)
        updates, o = optimizer.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        p = nmp.apply_unit_norm_constraint(p)
        return (p, o, _po, acc + total)

    def arm_adam_norm_bn(carry, batch):
        p, o, _po, acc = carry
        total, stats, grads = graded(p, batch)
        updates, o = optimizer.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        p = nmp.apply_unit_norm_constraint(p)
        p = train_loop._update_bn_stats(p, stats, config.bn_momentum)
        return (p, o, _po, acc + total)

    arms = {
        "grad_adam_inject": arm_adam_inject,
        "grad_adam_plain": arm_adam_plain,
        "grad_adam_inject_norm": arm_adam_norm,
        "grad_adam_inject_norm_bn": arm_adam_norm_bn,
    }

    out = {"batch_size": batch_size, "k": k}
    for name, body in arms.items():
        def run(params, o, po, batch, body=body):
            def step(carry, _):
                return body(carry, batch), None

            carry, _ = jax.lax.scan(
                step, (params, o, po, jnp.float32(0)), None, length=k
            )
            return carry

        fn = jax.jit(run)
        t0 = time.time()
        carry = fn(params, opt_state, opt_state_plain, batch)
        float(jax.device_get(carry[3]))
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            carry = fn(params, opt_state, opt_state_plain, batch)
            float(jax.device_get(carry[3]))
            best = min(best, time.time() - t0)
        out[name + "_ms_per_step"] = round(best / k * 1e3, 2)
        out[name + "_compile_s"] = round(compile_s, 1)
        print(name, out[name + "_ms_per_step"], "ms/step", flush=True)

    print(json.dumps(out, indent=1))
    (pathlib.Path(__file__).parent / "postgrad_probe.json").write_text(
        json.dumps(out, indent=1)
    )


if __name__ == "__main__":
    main()
