"""Record XLA-loop vs Pallas per-note decode cost into a JSON artifact.

The Pallas decode kernel (decode/pallas_kernel.py) is exact but its per-note
cost is DMA-latency-bound, which varies by runtime: through this repo's
tunneled remote device it measures several times slower than the XLA
while-loop decoder, while on local-PCIe production v5e the same DMA pattern
is projected faster (DESIGN §4d). Rather than carry that claim as prose,
this tool measures both backends on the current runtime — across a few
workload sizes — and writes ``tools/decoder_bench.json`` so the
`decode_backend="auto"` selection (decode/select.py) is auditable.

Run on real hardware: ``python tools/decoder_microbench.py``
(on the CPU backend it records the XLA number and documents why the Pallas
side is unmeasurable there — interpret mode times the interpreter, not DMA).
"""

from __future__ import annotations

import json
import pathlib
import sys

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))


def main() -> None:
    import jax

    from basic_pitch_tpu.decode import select

    platform = jax.devices()[0].platform
    rows = []
    for n_frames in (300, 600, 1200):
        rows.append(select.probe(n_frames=n_frames, force=True))
        print(rows[-1])

    chosen = rows[1]["backend"]  # the 600-frame point is what auto uses
    report = {
        "device": str(jax.devices()[0]),
        "platform": platform,
        "measurements": rows,
        "auto_selects": chosen,
        "interpretation": (
            "per-note cost of the two exact decode backends on THIS runtime; "
            "the auto backend picks the measured winner at transcriber init. "
            "DMA-latency-bound Pallas numbers through a tunneled/remote device "
            "do not transfer to local-PCIe parts — re-run this tool there."
            if platform != "cpu"
            else "cpu backend: pallas is interpret-only here, so only the XLA "
            "number is a hardware measurement; auto selects xla without a race"
        ),
    }
    out = REPO_ROOT / "tools" / "decoder_bench.json"
    out.write_text(json.dumps(report, indent=2))
    print(f"wrote {out} (auto selects: {chosen})")


if __name__ == "__main__":
    main()
