"""Device-resident streaming transcription pipeline.

This is the throughput engine of the framework. Where the reference loops
over windows one at a time on the host (`/root/reference/basic_pitch/
inference.py:308-310`), here a long recording is processed in fixed-size
chunks of W windows, and EVERYTHING between raw audio samples and trimmed
posteriorgram frames happens inside a single jitted program:

    raw audio chunk (optionally 44.1 kHz)
      -> [device] anti-aliased decimation to 22.05 kHz  (block matmul)
      -> [device] unfold into W overlapping model windows (static gather)
      -> [device] CQT -> harmonic stack -> CNN heads
      -> [device] 15-frame overlap trim per window, reshape to frames
    -> host: concatenate chunks, trim to expected frame count

Chunk shape is fixed, so any length of audio reuses ONE compiled executable
with constant device memory — the TPU-native analogue of the reference's
streaming windowed inference (SURVEY §5 "long-context"). Output semantics
are identical to `inference.run_inference` + `unwrap_output`.

Multi-chip: pass a `jax.sharding.Mesh`; the window batch axis is sharded
across it, sharding the gather, the model convs, and the trim — XLA inserts
the (trivial) collectives. One chunk then spans W windows across all chips.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from basic_pitch_tpu import constants
from basic_pitch_tpu.models import nmp
from basic_pitch_tpu.models import params as params_io
from basic_pitch_tpu.ops import resample as resample_ops

HOP = constants.WINDOW_HOP_SAMPLES  # 36164
OVERLAP = constants.OVERLAP_LENGTH_SAMPLES  # 7680
WINDOW = constants.AUDIO_N_SAMPLES  # 43844
TRIM = constants.N_OVERLAPPING_FRAMES // 2  # 15
FRAMES_PER_WINDOW = constants.N_FRAMES_PER_WINDOW_TRIMMED  # 142
_DEC_HALO = 128  # left context the 257-tap decimator needs


class StreamingTranscriber:
    """Chunked device pipeline producing reference-identical posteriorgrams.

    Args:
        model_or_params: checkpoint path or parameter pytree.
        windows_per_chunk: W, the window batch per device dispatch.
        precision: jax matmul precision for the whole pipeline. HIGHEST keeps
            posteriorgrams within 1e-4 of the float32 reference; DEFAULT
            (bf16 inputs) roughly doubles throughput at reduced fidelity.
        mesh: optional Mesh with a "data" axis to shard the window batch.
    """

    def __init__(
        self,
        model_or_params: Union[str, Dict] = params_io.ICASSP_2022_WEIGHTS_PATH,
        config: nmp.ModelConfig = nmp.DEFAULT_CONFIG,
        windows_per_chunk: int = 128,
        precision=jax.lax.Precision.HIGHEST,
        mesh: Optional[jax.sharding.Mesh] = None,
    ):
        if isinstance(model_or_params, dict):
            self.params = model_or_params
        else:
            self.params = params_io.load_params(model_or_params)
        self.config = config
        self.w = windows_per_chunk
        self.precision = precision
        self.mesh = mesh
        self.chunk_len = HOP * self.w + OVERLAP  # samples @22.05k per chunk

        if mesh is not None:
            assert self.w % mesh.devices.size == 0, (
                "windows_per_chunk must divide evenly across the mesh"
            )
            replicated = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
            self.params = jax.device_put(self.params, replicated)

        # static unfold indices: window w covers [w*HOP, w*HOP + WINDOW)
        self._window_idx = (
            HOP * np.arange(self.w)[:, None] + np.arange(WINDOW)[None, :]
        )

        self._chunk_fn_22k = self._build(chunk_is_44k=False)
        self._chunk_fn_44k = self._build(chunk_is_44k=True)

    # ------------------------------------------------------------------

    def _build(self, chunk_is_44k: bool):
        idx = self._window_idx
        precision = self.precision
        config = self.config

        def run(params, chunk):
            if chunk_is_44k:
                chunk = resample_ops.decimate2(
                    chunk, precision=precision, halo=True, n_out=self.chunk_len
                )
            windows = chunk[idx]  # (W, WINDOW) static gather
            out = nmp.predict_fn(params, windows, config, precision=precision)
            # overlap trim + fold windows into the time axis
            return {
                k: v[:, TRIM : v.shape[1] - TRIM, :].reshape(
                    self.w * FRAMES_PER_WINDOW, v.shape[2]
                )
                for k, v in out.items()
            }

        if self.mesh is None:
            return jax.jit(run)

        pspec = jax.sharding.PartitionSpec
        shard_frames = jax.sharding.NamedSharding(self.mesh, pspec("data"))
        replicated = jax.sharding.NamedSharding(self.mesh, pspec())
        return jax.jit(
            run,
            in_shardings=(replicated, replicated),
            out_shardings={"note": shard_frames, "onset": shard_frames, "contour": shard_frames},
        )

    # ------------------------------------------------------------------

    def posteriorgrams(self, audio: np.ndarray, sample_rate: int) -> Dict[str, np.ndarray]:
        """Transcribe a full recording to posteriorgrams.

        Args:
            audio: mono float32 samples at `sample_rate` (22050 or 44100 —
                44.1 kHz audio is decimated on device).

        Returns:
            {"note", "onset", "contour"} matrices with exactly the frame
            count `inference.unwrap_output` would produce.
        """
        audio = np.ascontiguousarray(audio, dtype=np.float32)
        if sample_rate == constants.AUDIO_SAMPLE_RATE:
            is_44k = False
            original_length = len(audio)
        elif sample_rate == 2 * constants.AUDIO_SAMPLE_RATE:
            is_44k = True
            original_length = resample_ops.decimate2_output_length(len(audio))
        else:
            raise ValueError(
                f"StreamingTranscriber accepts 22050 or 44100 Hz input, got {sample_rate}; "
                "resample on host first (basic_pitch_tpu.utils.audio.resample)"
            )

        pad_front = OVERLAP // 2  # the reference's half-overlap pre-pad
        padded_length = original_length + pad_front
        n_windows = max(1, -(-padded_length // HOP))
        n_chunks = -(-n_windows // self.w)

        outputs = {"note": [], "onset": [], "contour": []}
        for c in range(n_chunks):
            start22 = c * self.w * HOP - pad_front  # in original 22k coords
            if is_44k:
                # seg[m] = x44[2*start22 - 128 + m]; the device computes
                # y[t] = sum_j h[j] seg[2t + j], j < 257, t < chunk_len
                lo = 2 * start22 - _DEC_HALO
                hi = lo + 2 * self.chunk_len + 2 * _DEC_HALO
                chunk = _padded_slice(audio, lo, hi)
            else:
                chunk = _padded_slice(audio, start22, start22 + self.chunk_len)
            fn = self._chunk_fn_44k if is_44k else self._chunk_fn_22k
            out = fn(self.params, jnp.asarray(chunk))
            for k, v in out.items():
                outputs[k].append(np.asarray(v))

        # reference frame-count convention uses the ORIGINAL length
        n_frames = int(original_length / HOP * FRAMES_PER_WINDOW)
        return {k: np.concatenate(v)[:n_frames] for k, v in outputs.items()}

    def transcribe_file(self, audio_path) -> Dict[str, np.ndarray]:
        """Decode a WAV on host and transcribe. 44.1 kHz and 22.05 kHz files
        take the all-device path; other rates resample on host first."""
        from basic_pitch_tpu.utils import audio as audio_io

        samples, sr = audio_io.read_wav(audio_path)
        mono = audio_io.to_mono(samples)
        if sr in (constants.AUDIO_SAMPLE_RATE, 2 * constants.AUDIO_SAMPLE_RATE):
            return self.posteriorgrams(mono, sr)
        mono = audio_io.resample(mono, sr, constants.AUDIO_SAMPLE_RATE)
        return self.posteriorgrams(mono, constants.AUDIO_SAMPLE_RATE)


def _padded_slice(x: np.ndarray, lo: int, hi: int) -> np.ndarray:
    """x[lo:hi] with zero padding for out-of-range indices."""
    out = np.zeros(hi - lo, dtype=x.dtype)
    src_lo, src_hi = max(lo, 0), min(hi, len(x))
    if src_hi > src_lo:
        out[src_lo - lo : src_hi - lo] = x[src_lo:src_hi]
    return out
