"""Dispatch-aggregation experiment: is the model stage dispatch-bound?

The layout sweep (tools/layout_ab.json) rejected every matmul
reformulation of the head convs — XLA's native conv lowering wins — yet
the model stage runs at ~5% of the fp32-HIGHEST effective peak, and two
independent data points smell like FIXED PER-DISPATCH COST, not compute:

  * chunk sweep (DESIGN §2e): w=384 (half the dispatches) is 18% faster
    device-only than w=192;
  * train step anatomy (TRAIN_BENCH r4): forward is ~29 ms at batch 16
    AND batch 64.

This harness separates the two directly on the 20-min stream:

  arm A  baseline          one piece_fn dispatch per 192-window piece
  arm B  stacked program   ONE jitted program consumes k pieces (stacks
                           them on device, one unfold+model+decode-prep),
                           k in {2, 4} — upload granularity unchanged
  arm C  empty dispatch    a trivial jitted fn round-tripped, measuring
                           pure dispatch+fetch latency on this runtime

If B(k=4) ≈ A - 3*overhead(C), the stage is dispatch-bound and the
pipeline should decouple upload granularity from compute granularity.

Run: python tools/dispatch_ab.py       (writes tools/dispatch_ab.json)
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    import jax
    import jax.numpy as jnp

    import bench

    from basic_pitch_tpu import pipeline
    from basic_pitch_tpu.models import nmp

    single = bench.synth_audio(1200.0, seed=7)
    single_pcm = np.clip(np.round(single * 32768.0), -32768, 32767).astype(np.int16)

    tr = pipeline.StreamingTranscriber(
        windows_per_chunk=192, decode_backend="auto", pcm_transport="raw"
    )
    pad_front = pipeline.OVERLAP // 2
    n_windows = max(1, -(-(len(single_pcm) + pad_front) // pipeline.HOP))
    n_chunks = -(-n_windows // tr.w)
    pieces = list(tr._pieces(single_pcm, False, n_chunks))
    dev_pieces = [jax.device_put(p) for p in pieces]
    probe = jax.jit(lambda x: jnp.sum(x[-1]))
    jax.device_get(probe(dev_pieces[-1]))
    piece_fn = tr._piece_fn(False)
    print(f"{n_chunks} pieces of {tr.w} windows", file=sys.stderr)

    report: dict = {"n_pieces": n_chunks, "windows_per_piece": tr.w}

    # --- arm C: pure dispatch+fetch latency --------------------------------
    tiny = jax.device_put(np.zeros(8, np.float32))
    trivial = jax.jit(lambda x: x * 2.0 + 1.0)
    jax.device_get(trivial(tiny))
    laps = []
    for _ in range(20):
        t0 = time.time()
        jax.device_get(trivial(tiny))
        laps.append(time.time() - t0)
    report["dispatch_roundtrip_ms"] = {
        "median": round(float(np.median(laps)) * 1e3, 2),
        "min": round(min(laps) * 1e3, 2),
    }
    # enqueue-only cost: N dispatches, one forced fetch at the end
    for n in (1, 4, 16):
        t0 = time.time()
        out = tiny
        for _ in range(n):
            out = trivial(out)
        jax.device_get(out)
        report[f"chained_{n}_dispatches_ms"] = round((time.time() - t0) * 1e3, 2)

    # --- arm B programs: one jit consumes k pieces -------------------------
    config = tr.config
    precision = tr.precision

    from basic_pitch_tpu.decode import device as device_decode

    def stacked_fn(k: int):
        w_total = tr.w * k

        def run(params, *ps):
            # pieces carry their own halo rows, so each unfolds
            # independently and the window axes concatenate
            windows = jnp.concatenate(
                [
                    pipeline._unfold_windows(
                        p.astype(jnp.float32) * (1.0 / 32768.0), tr.w
                    )
                    for p in ps
                ]
            )
            out = nmp.predict_fn(params, windows, config, precision=precision)
            out = {
                kk: v[:, pipeline.TRIM : v.shape[1] - pipeline.TRIM, :].reshape(
                    w_total * pipeline.FRAMES_PER_WINDOW, v.shape[2]
                )
                for kk, v in out.items()
            }
            # same per-chunk work as piece_fn: bend matrix, contour dropped
            contour = out.pop("contour")
            out["bends"] = device_decode.bend_matrix(contour)
            return out

        return jax.jit(run)

    def time_arm(fn, groups, label):
        # warm
        for grp in groups:
            fn(tr.params, *grp)
        out = fn(tr.params, *groups[-1])
        jax.device_get(probe(out["note"]))
        laps = []
        for _ in range(5):
            t0 = time.time()
            outs = [fn(tr.params, *grp) for grp in groups]
            jax.device_get(probe(outs[-1]["note"]))
            laps.append(time.time() - t0)
        med = float(np.median(laps))
        report[label] = {
            "median_s": round(med, 4),
            "rounds": [round(x, 4) for x in laps],
        }
        print(f"{label}: {med:.4f}s", file=sys.stderr)
        return med

    base = time_arm(piece_fn, [(p,) for p in dev_pieces], "A_per_piece")
    for k in (2, 4):
        if n_chunks % k:
            continue
        groups = [tuple(dev_pieces[i : i + k]) for i in range(0, n_chunks, k)]
        med = time_arm(stacked_fn(k), groups, f"B_stacked_k{k}")
        report[f"B_stacked_k{k}"]["speedup_over_A"] = round(base / med, 3)

    out = json.dumps(report, indent=1)
    with open("tools/dispatch_ab.json", "w") as f:
        f.write(out + "\n")
    print(out)


if __name__ == "__main__":
    main()
