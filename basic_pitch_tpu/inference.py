"""Inference orchestration: audio file -> posteriorgrams -> MIDI.

API surface mirrors the reference (`/root/reference/basic_pitch/inference.py`):
``Model``, ``window_audio_file``, ``unwrap_output``, ``run_inference``,
``predict``, ``predict_and_save``, ``build_output_path``, ``OutputExtensions``.

TPU-first differences:
  * All windows of a file (and, via ``predict_batch``, of many files) run as
    ONE batched jitted forward pass instead of the reference's per-window
    python loop with batch size 1 (`inference.py:308-310`).
  * Window extraction and overlap-trim reassembly are array ops around a
    fixed-shape device computation; batch sizes are bucketed to powers of two
    so XLA compiles a handful of graphs regardless of file length.
"""

from __future__ import annotations

import csv
import enum
import json
import pathlib
from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from basic_pitch_tpu import constants
from basic_pitch_tpu.decode import export as decode_export
from basic_pitch_tpu.models import nmp
from basic_pitch_tpu.models import params as params_io
from basic_pitch_tpu.utils import audio as audio_io
from basic_pitch_tpu.utils.printing import (
    failed_to_save,
    file_saved_confirmation,
    generating_file_message,
)

PathLike = Union[str, pathlib.Path]

DEFAULT_ONSET_THRESHOLD = 0.5
DEFAULT_FRAME_THRESHOLD = 0.3
DEFAULT_MINIMUM_NOTE_LENGTH_MS = 127.7
DEFAULT_MIDI_TEMPO = 120
# reference name for the same constant (`inference.py:188`)
DEFAULT_MINIMUM_MIDI_TEMPO = DEFAULT_MIDI_TEMPO
DEFAULT_SONIFICATION_SAMPLERATE = 44100
DEFAULT_OVERLAPPING_FRAMES = constants.N_OVERLAPPING_FRAMES
DEFAULT_MIDI_VELOCITY_SCALE = 127

_MAX_DEVICE_BATCH = 128  # windows per device dispatch


class Model:
    """Loads a checkpoint and exposes batched jitted prediction.

    Accepts ALL FOUR of the reference's serializations — TF SavedModel
    directory, `.onnx`, `.tflite`, `.mlpackage`/`.mlmodel` — plus our
    flat-npz checkpoints and already-constructed parameter pytrees. Unlike
    the reference's `Model` (`/root/reference/basic_pitch/inference.py:78-154`),
    which trial-loads each format with its own native runtime (TF, CoreML,
    tflite-runtime, onnxruntime), every format here is parsed by this
    repo's own readers (`models/{savedmodel,onnx_import,tflite_import,
    coreml_import}.py`) with zero engine dependencies, and the weights
    always execute on the one XLA compute path. The jitted forward is
    compiled per power-of-two batch bucket, so arbitrary window counts
    reuse a handful of executables.
    """

    def __init__(
        self,
        model_or_path: Union[PathLike, Dict] = params_io.ICASSP_2022_WEIGHTS_PATH,
        config: nmp.ModelConfig = nmp.DEFAULT_CONFIG,
    ):
        from basic_pitch_tpu.utils import runtime

        runtime.enable_compilation_cache()
        if isinstance(model_or_path, (str, pathlib.Path)):
            self.params = self._load_checkpoint(model_or_path)
        elif isinstance(model_or_path, dict):
            self.params = model_or_path
        else:
            raise ValueError(
                f"cannot load model from {model_or_path!r}: expected a checkpoint "
                "path (.npz / TF SavedModel directory) or a parameter pytree"
            )
        self.config = config
        self._forward = jax.jit(lambda p, a: nmp.predict_fn(p, a, config))

    @staticmethod
    def _load_checkpoint(path: PathLike) -> Dict:
        """Format-sniffing loader over the four reference serializations.

        Mirrors the reference's runtime-selection chain
        (`/root/reference/basic_pitch/inference.py:78-154`) but with
        first-party parsers instead of per-format native engines.
        """
        from basic_pitch_tpu.models import coreml_import, onnx_import, savedmodel, tflite_import

        p = pathlib.Path(path)
        suffix = p.suffix.lower()
        if savedmodel.looks_like_savedmodel(p):
            return savedmodel.load_nmp_savedmodel(p)
        if suffix in (".mlpackage", ".mlmodel") or coreml_import.looks_like_mlpackage(p):
            return coreml_import.load_nmp_coreml(p)
        if suffix == ".tflite" or tflite_import.looks_like_tflite(p):
            return tflite_import.load_nmp_tflite(p)
        if suffix == ".onnx" or onnx_import.looks_like_onnx(p):
            return onnx_import.load_nmp_onnx(p)
        return params_io.load_params(p)

    def predict(self, audio_windows: np.ndarray) -> Dict[str, np.ndarray]:
        """Run the model over (n_windows, AUDIO_N_SAMPLES [, 1]) audio.

        Pads the batch up to a power-of-two bucket, runs on device, and trims.
        Returns numpy arrays keyed "note" / "onset" / "contour".
        """
        x = np.asarray(audio_windows, dtype=np.float32)
        if x.ndim == 3:  # tolerate the reference's trailing channel dim
            x = x[..., 0]
        if x.ndim == 1:
            x = x[None]
        n = x.shape[0]
        if n == 0:  # zero windows: empty posteriorgrams, correct frame/bin dims
            t = constants.ANNOT_N_FRAMES
            return {
                "note": np.zeros((0, t, constants.N_FREQ_BINS_NOTES), np.float32),
                "onset": np.zeros((0, t, constants.N_FREQ_BINS_NOTES), np.float32),
                "contour": np.zeros((0, t, constants.N_FREQ_BINS_CONTOURS), np.float32),
            }

        chunks: List[Dict[str, np.ndarray]] = []
        for start in range(0, n, _MAX_DEVICE_BATCH):
            chunk = x[start : start + _MAX_DEVICE_BATCH]
            bucket = _bucket_size(chunk.shape[0])
            padded = np.pad(chunk, ((0, bucket - chunk.shape[0]), (0, 0)))
            out = self._forward(self.params, jnp.asarray(padded))
            chunks.append({k: np.asarray(v)[: chunk.shape[0]] for k, v in out.items()})
        return {k: np.concatenate([c[k] for c in chunks]) for k in chunks[0]}


def _bucket_size(n: int) -> int:
    """Smallest power of two >= n (capped at _MAX_DEVICE_BATCH)."""
    bucket = 1
    while bucket < n:
        bucket *= 2
    return min(bucket, _MAX_DEVICE_BATCH)


def window_audio_file(
    audio: np.ndarray, hop_size: int
) -> Tuple[np.ndarray, List[Dict[str, float]]]:
    """Slice (pre-padded) audio into fixed AUDIO_N_SAMPLES windows.

    Returns the stacked windows (n_windows, AUDIO_N_SAMPLES) and their
    start/end times in seconds (`inference.py:194-219` semantics, vectorized).
    """
    n_windows = max(1, -(-len(audio) // hop_size))
    padded_len = hop_size * (n_windows - 1) + constants.AUDIO_N_SAMPLES
    padded = np.pad(audio, (0, max(0, padded_len - len(audio))))
    idx = hop_size * np.arange(n_windows)[:, None] + np.arange(constants.AUDIO_N_SAMPLES)[None, :]
    windows = padded[idx]
    times = [
        {
            "start": float(i * hop_size) / constants.AUDIO_SAMPLE_RATE,
            "end": float(i * hop_size + constants.AUDIO_N_SAMPLES) / constants.AUDIO_SAMPLE_RATE,
        }
        for i in range(n_windows)
    ]
    return windows.astype(np.float32), times


def get_audio_input(
    audio_path: PathLike, overlap_len: int, hop_size: int
) -> Tuple[np.ndarray, List[Dict[str, float]], int]:
    """Load audio (mono, 22050 Hz), pre-pad half an overlap, window it.

    Returns (windows, window_times, original_length_samples) —
    `inference.py:222-245` semantics with the window loop vectorized.
    """
    assert overlap_len % 2 == 0, f"overlap_length must be even, got {overlap_len}"
    audio, _ = audio_io.load_audio(audio_path, constants.AUDIO_SAMPLE_RATE)
    original_length = len(audio)
    audio = np.concatenate([np.zeros(overlap_len // 2, dtype=np.float32), audio])
    windows, times = window_audio_file(audio, hop_size)
    return windows, times, original_length


def unwrap_output(
    output: np.ndarray,
    audio_original_length: int,
    n_overlapping_frames: int,
    hop_size: Optional[int] = None,
) -> np.ndarray:
    """Overlap-trim windowed outputs back into one (n_times, n_freqs) matrix.

    Drops half the overlapping frames from each edge of every window,
    concatenates along time, and trims to the expected total length
    (`inference.py:247-279`).
    """
    if output.ndim != 3:
        raise ValueError(f"expected (n_windows, n_frames, n_freqs), got {output.shape}")
    if hop_size is None:
        hop_size = constants.AUDIO_N_SAMPLES - n_overlapping_frames * constants.FFT_HOP
    n_olap = n_overlapping_frames // 2
    if n_olap > 0:
        output = output[:, n_olap:-n_olap, :]
    n_windows, n_frames, n_freqs = output.shape
    unwrapped = output.reshape(n_windows * n_frames, n_freqs)
    n_expected_windows = audio_original_length / hop_size
    frames_per_window = constants.AUDIO_WINDOW_LENGTH * constants.ANNOTATIONS_FPS - n_overlapping_frames
    return unwrapped[: int(n_expected_windows * frames_per_window), :]


def run_inference(
    audio_path: PathLike,
    model_or_model_path: Union[Model, PathLike],
    debug_file: Optional[pathlib.Path] = None,
) -> Dict[str, np.ndarray]:
    """File -> full-length posteriorgrams (`inference.py:282-330`)."""
    model = model_or_model_path if isinstance(model_or_model_path, Model) else Model(model_or_model_path)

    n_overlapping_frames = DEFAULT_OVERLAPPING_FRAMES
    overlap_len = n_overlapping_frames * constants.FFT_HOP
    hop_size = constants.AUDIO_N_SAMPLES - overlap_len

    windows, _, original_length = get_audio_input(audio_path, overlap_len, hop_size)
    raw = model.predict(windows)
    unwrapped = {
        k: unwrap_output(raw[k], original_length, n_overlapping_frames, hop_size) for k in raw
    }

    if debug_file:
        with open(debug_file, "w") as fh:
            json.dump(
                {
                    # the reference dumps its loop variable after the window
                    # loop, i.e. ONLY the last (1, samples, 1) window
                    # (`inference.py:308-321`) — matched exactly; dumping all
                    # windows would also blow up memory on long recordings
                    "audio_windowed": windows[-1:, :, None].tolist(),
                    "audio_original_length": original_length,
                    "hop_size_samples": hop_size,
                    "overlap_length_samples": overlap_len,
                    "unwrapped_output": {k: v.tolist() for k, v in unwrapped.items()},
                },
                fh,
            )
    return unwrapped


class OutputExtensions(enum.Enum):
    MIDI = "mid"
    MODEL_OUTPUT_NPZ = "npz"
    MIDI_SONIFICATION = "wav"
    NOTE_EVENTS = "csv"


def verify_input_path(audio_path: PathLike) -> None:
    path = pathlib.Path(audio_path)
    if not path.exists():
        raise ValueError(f"🚨 {audio_path} does not exist.")
    if not path.is_file():
        raise ValueError(f"🚨 {audio_path} is not a file path.")


def verify_output_dir(output_dir: PathLike) -> None:
    path = pathlib.Path(output_dir)
    if not path.exists():
        raise ValueError(f"🚨 {output_dir} does not exist.")
    if not path.is_dir():
        raise ValueError(f"🚨 {output_dir} is not a directory.")


def build_output_path(
    audio_path: PathLike, output_directory: PathLike, output_type: OutputExtensions
) -> pathlib.Path:
    """Derive <output_dir>/<stem>_basic_pitch.<ext>, refusing collisions
    (`inference.py:372-406`)."""
    output_directory = pathlib.Path(output_directory)
    basename = pathlib.Path(str(audio_path)).stem
    output_path = output_directory / f"{basename}_basic_pitch.{output_type.value}"
    generating_file_message(output_type.name)
    if output_path.exists():
        raise IOError(
            f"  🚨 {output_path} already exists and would be overwritten. "
            f"Skipping output files for {audio_path}."
        )
    return output_path


def save_note_events(
    note_events: List[Tuple[float, float, int, float, Optional[List[int]]]],
    save_path: PathLike,
) -> None:
    """CSV export with velocity scaling (`inference.py:409-428`)."""
    with open(save_path, "w", newline="") as fh:
        writer = csv.writer(fh, delimiter=",")
        writer.writerow(["start_time_s", "end_time_s", "pitch_midi", "velocity", "pitch_bend"])
        for start_time, end_time, pitch, amplitude, bends in note_events:
            row = [start_time, end_time, pitch, int(np.round(DEFAULT_MIDI_VELOCITY_SCALE * amplitude))]
            if bends:
                row.extend(bends)
            writer.writerow(row)


def predict(
    audio_path: PathLike,
    model_or_model_path: Union[Model, PathLike] = params_io.ICASSP_2022_WEIGHTS_PATH,
    onset_threshold: float = DEFAULT_ONSET_THRESHOLD,
    frame_threshold: float = DEFAULT_FRAME_THRESHOLD,
    minimum_note_length: float = DEFAULT_MINIMUM_NOTE_LENGTH_MS,
    minimum_frequency: Optional[float] = None,
    maximum_frequency: Optional[float] = None,
    multiple_pitch_bends: bool = False,
    melodia_trick: bool = True,
    debug_file: Optional[pathlib.Path] = None,
    midi_tempo: float = DEFAULT_MIDI_TEMPO,
) -> "Tuple[Dict[str, np.ndarray], object, list]":
    """Transcribe one audio file.

    Returns (model_output, MidiFile, note_events) — the reference's flagship
    entry point (`inference.py:431-506`) with identical defaults.
    """
    print(f"Predicting MIDI for {audio_path}...")

    model_output = run_inference(audio_path, model_or_model_path, debug_file)
    min_note_len = int(
        np.round(minimum_note_length / 1000 * (constants.AUDIO_SAMPLE_RATE / constants.FFT_HOP))
    )
    midi_data, note_events = decode_export.model_output_to_notes(
        model_output,
        onset_thresh=onset_threshold,
        frame_thresh=frame_threshold,
        min_note_len=min_note_len,
        min_freq=minimum_frequency,
        max_freq=maximum_frequency,
        multiple_pitch_bends=multiple_pitch_bends,
        melodia_trick=melodia_trick,
        midi_tempo=midi_tempo,
    )

    if debug_file:
        with open(debug_file) as fh:
            debug_data = json.load(fh)
        with open(debug_file, "w") as fh:
            json.dump(
                {
                    **debug_data,
                    "min_note_length": min_note_len,
                    "onset_thresh": onset_threshold,
                    "frame_thresh": frame_threshold,
                    "estimated_notes": [
                        (
                            float(s),
                            float(e),
                            int(p),
                            float(a),
                            [int(b) for b in bends] if bends else None,
                        )
                        for s, e, p, a, bends in note_events
                    ],
                },
                fh,
            )

    return model_output, midi_data, note_events


def predict_and_save(
    audio_path_list: Sequence[PathLike],
    output_directory: PathLike,
    save_midi: bool,
    sonify_midi: bool,
    save_model_outputs: bool,
    save_notes: bool,
    model_or_model_path: Union[Model, PathLike] = params_io.ICASSP_2022_WEIGHTS_PATH,
    onset_threshold: float = DEFAULT_ONSET_THRESHOLD,
    frame_threshold: float = DEFAULT_FRAME_THRESHOLD,
    minimum_note_length: float = DEFAULT_MINIMUM_NOTE_LENGTH_MS,
    minimum_frequency: Optional[float] = None,
    maximum_frequency: Optional[float] = None,
    multiple_pitch_bends: bool = False,
    melodia_trick: bool = True,
    debug_file: Optional[pathlib.Path] = None,
    sonification_samplerate: int = DEFAULT_SONIFICATION_SAMPLERATE,
    midi_tempo: float = DEFAULT_MIDI_TEMPO,
) -> None:
    """Transcribe files and write the selected artifacts
    (`inference.py:509-613`). Loads the model once for the whole batch."""
    model = (
        model_or_model_path
        if isinstance(model_or_model_path, Model)
        else Model(model_or_model_path)
    )
    for audio_path in audio_path_list:
        print("")
        model_output, midi_data, note_events = predict(
            pathlib.Path(audio_path),
            model,
            onset_threshold,
            frame_threshold,
            minimum_note_length,
            minimum_frequency,
            maximum_frequency,
            multiple_pitch_bends,
            melodia_trick,
            debug_file,
            midi_tempo,
        )

        _write_artifacts(
            audio_path,
            output_directory,
            model_output,
            midi_data,
            note_events,
            save_midi,
            sonify_midi,
            save_model_outputs,
            save_notes,
            sonification_samplerate,
        )


def _write_artifacts(
    audio_path: PathLike,
    output_directory: PathLike,
    model_output,
    midi_data,
    note_events,
    save_midi: bool,
    sonify_midi: bool,
    save_model_outputs: bool,
    save_notes: bool,
    sonification_samplerate: int,
) -> None:
    """Write the selected artifact set for one transcribed file
    (`/root/reference/basic_pitch/inference.py:565-602` semantics)."""
    if save_model_outputs:
        output_path = build_output_path(audio_path, output_directory, OutputExtensions.MODEL_OUTPUT_NPZ)
        try:
            np.savez(output_path, basic_pitch_model_output=model_output)
            file_saved_confirmation(OutputExtensions.MODEL_OUTPUT_NPZ.name, output_path)
        except Exception:
            failed_to_save(OutputExtensions.MODEL_OUTPUT_NPZ.name, output_path)
            raise

    if save_midi:
        output_path = build_output_path(audio_path, output_directory, OutputExtensions.MIDI)
        try:
            midi_data.write(output_path)
            file_saved_confirmation(OutputExtensions.MIDI.name, output_path)
        except Exception:
            failed_to_save(OutputExtensions.MIDI.name, output_path)
            raise

    if sonify_midi:
        output_path = build_output_path(audio_path, output_directory, OutputExtensions.MIDI_SONIFICATION)
        try:
            decode_export.sonify_midi(midi_data, output_path, sr=sonification_samplerate)
            file_saved_confirmation(OutputExtensions.MIDI_SONIFICATION.name, output_path)
        except Exception:
            failed_to_save(OutputExtensions.MIDI_SONIFICATION.name, output_path)
            raise

    if save_notes:
        output_path = build_output_path(audio_path, output_directory, OutputExtensions.NOTE_EVENTS)
        try:
            save_note_events(note_events, output_path)
            file_saved_confirmation(OutputExtensions.NOTE_EVENTS.name, output_path)
        except Exception:
            failed_to_save(OutputExtensions.NOTE_EVENTS.name, output_path)
            raise


def predict_and_save_streaming(
    audio_path_list: Sequence[PathLike],
    output_directory: PathLike,
    save_midi: bool,
    sonify_midi: bool,
    save_model_outputs: bool,
    save_notes: bool,
    model_or_model_path: Union[Model, PathLike] = params_io.ICASSP_2022_WEIGHTS_PATH,
    onset_threshold: float = DEFAULT_ONSET_THRESHOLD,
    frame_threshold: float = DEFAULT_FRAME_THRESHOLD,
    minimum_note_length: float = DEFAULT_MINIMUM_NOTE_LENGTH_MS,
    minimum_frequency: Optional[float] = None,
    maximum_frequency: Optional[float] = None,
    multiple_pitch_bends: bool = False,
    melodia_trick: bool = True,
    sonification_samplerate: int = DEFAULT_SONIFICATION_SAMPLERATE,
    midi_tempo: float = DEFAULT_MIDI_TEMPO,
    windows_per_chunk: int = 128,
) -> None:
    """Batched fast path: all files through one `StreamingTranscriber`.

    Same artifacts as `predict_and_save`, but every recording's uploads,
    model chunks, and on-device decodes are enqueued before anything is
    collected (BASELINE config 2: windows of N files packed into device
    batches), and PCM16 WAVs ride the lossless residual codec. Note events
    are identical to the windowed path's (`tests/test_pipeline.py`);
    posteriorgram NPZs are computed per file only when requested.
    """
    from basic_pitch_tpu import pipeline

    model = (
        model_or_model_path
        if isinstance(model_or_model_path, Model)
        else Model(model_or_model_path)
    )
    transcriber = pipeline.StreamingTranscriber(
        model.params,
        config=model.config,
        windows_per_chunk=windows_per_chunk,
        # measured per process: the codec wins on slow links, raw device_put
        # on fast ones (ops/transport.py) — either way events are identical
        pcm_transport="auto",
    )

    min_note_len = int(
        np.round(minimum_note_length / 1000 * (constants.AUDIO_SAMPLE_RATE / constants.FFT_HOP))
    )
    # dispatch in groups so host memory stays bounded: decoded audio for a
    # group is freed before the next group loads (cross-recording compute
    # overlap happens within a group — 16 files is plenty to hide latency)
    group = 16
    results = []
    for start in range(0, len(audio_path_list), group):
        recordings = []
        for audio_path in audio_path_list[start : start + group]:
            pcm = None
            if audio_io._is_wav(audio_path):
                pcm = audio_io.read_wav_pcm16_mono(audio_path)
            if pcm is None:  # not losslessly int16-transportable: float path
                samples, sr = audio_io.load_audio(audio_path, constants.AUDIO_SAMPLE_RATE)
                recordings.append((samples, sr))
            else:
                recordings.append(pcm)
        results.extend(
            transcriber.transcribe_batch(
                recordings,
                onset_threshold=onset_threshold,
                frame_threshold=frame_threshold,
                min_note_length=min_note_len,
                min_freq=minimum_frequency,
                max_freq=maximum_frequency,
                melodia_trick=melodia_trick,
                include_pitch_bends=True,
                # posteriorgrams ride the same batched fetch — the model runs
                # ONCE per file whether or not NPZs are requested
                return_model_outputs=save_model_outputs,
            )
        )
    transcriber.close()

    for audio_path, result in zip(audio_path_list, results):
        if save_model_outputs:
            note_events, model_output = result
        else:
            note_events, model_output = result, None
        print(f"\nPredicting MIDI for {audio_path}...")
        midi_data = decode_export.note_events_to_midi(
            note_events, multiple_pitch_bends, midi_tempo
        )
        _write_artifacts(
            audio_path,
            output_directory,
            model_output,
            midi_data,
            note_events,
            save_midi,
            sonify_midi,
            save_model_outputs,
            save_notes,
            sonification_samplerate,
        )
