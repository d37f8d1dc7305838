"""``basic-pitch`` command-line interface.

Flag surface mirrors the reference CLI (`/root/reference/basic_pitch/predict.py:36-137`).
"""

from __future__ import annotations

import argparse
import pathlib
import traceback

from basic_pitch_tpu.models.params import ICASSP_2022_WEIGHTS_PATH


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Predict MIDI from audio using the TPU-native basic-pitch model."
    )
    parser.add_argument("output_dir", type=str, help="directory for output files")
    parser.add_argument("audio_paths", type=str, nargs="+", help="audio files to transcribe")
    parser.add_argument(
        "--model-path",
        type=str,
        default=str(ICASSP_2022_WEIGHTS_PATH),
        help="checkpoint to use: a flat-npz parameter archive or a stock TF "
        "SavedModel directory (loaded without TensorFlow)",
    )
    parser.add_argument(
        "--model-serialization",
        type=str,
        choices=["tf", "coreml", "tflite", "onnx"],
        help="If used, --model-path is ignored and the checkpoint for this "
        "serialization is resolved instead ('tf' = the bundled npz weights; "
        "coreml/tflite/onnx resolve to a reference saved_models checkout "
        "when locatable). Every format loads through this framework's own "
        "readers — no TF/CoreML/TFLite/ONNX runtime needed",
    )
    parser.add_argument(
        "--streaming",
        action="store_true",
        help="batched fast path: pack all input files' windows into device "
        "batches through the StreamingTranscriber (identical note events; "
        "~an order of magnitude faster on many/long files)",
    )
    parser.add_argument("--save-midi", action="store_true", default=True, help=argparse.SUPPRESS)
    parser.add_argument("--no-save-midi", dest="save_midi", action="store_false", help="do not save midi")
    parser.add_argument("--sonify-midi", action="store_true", help="render the MIDI to a WAV file")
    parser.add_argument("--save-model-outputs", action="store_true", help="save posteriorgrams as NPZ")
    parser.add_argument("--save-note-events", action="store_true", help="save note events as CSV")
    parser.add_argument("--onset-threshold", type=float, default=0.5,
                        help="onset activation threshold in [0, 1]; higher = fewer notes")
    parser.add_argument("--frame-threshold", type=float, default=0.3,
                        help="frame activation threshold in [0, 1]; higher = shorter notes")
    parser.add_argument("--minimum-note-length", type=float, default=127.70,
                        help="minimum note length in milliseconds")
    parser.add_argument("--minimum-frequency", type=float, default=None, help="minimum output frequency (Hz)")
    parser.add_argument("--maximum-frequency", type=float, default=None, help="maximum output frequency (Hz)")
    parser.add_argument("--multiple-pitch-bends", action="store_true",
                        help="allow overlapping notes to have independent pitch bends (one instrument per pitch)")
    parser.add_argument("--no-melodia", dest="melodia_trick", action="store_false",
                        help="disable the melodia residual-energy post-processing")
    parser.add_argument("--sonification-samplerate", type=int, default=44100,
                        help="sample rate for MIDI sonification")
    parser.add_argument("--midi-tempo", type=float, default=120, help="MIDI file tempo (BPM)")
    parser.add_argument("--debug-file", type=pathlib.Path, default=None,
                        help="dump intermediate inference data to this JSON file")
    return parser


def main() -> None:
    parser = build_parser()
    args = parser.parse_args()
    if args.streaming and args.debug_file:
        # argument validation belongs to the parser (one-line usage error,
        # exit 2), not the runtime crash banner
        parser.error("--debug-file is only supported without --streaming")

    # deferred import keeps `--help` fast (no JAX/XLA startup)
    from basic_pitch_tpu import FilenameSuffix, build_icassp_2022_model_path
    from basic_pitch_tpu import inference

    model_path = args.model_path
    if args.model_serialization:
        model_path = build_icassp_2022_model_path(FilenameSuffix[args.model_serialization])

    inference.verify_output_dir(args.output_dir)
    for audio_path in args.audio_paths:
        inference.verify_input_path(audio_path)

    print(
        "\n✨✨✨✨✨✨✨✨✨\n"
        "✨ basic-pitch-tpu ✨\n"
        "✨✨✨✨✨✨✨✨✨\n"
    )

    # match the reference's error UX (`predict.py:167-194`): IOError prints
    # its message; anything else prints a banner + traceback, never a bare crash
    try:
        if args.streaming:
            inference.predict_and_save_streaming(
                args.audio_paths,
                args.output_dir,
                args.save_midi,
                args.sonify_midi,
                args.save_model_outputs,
                args.save_note_events,
                model_path,
                args.onset_threshold,
                args.frame_threshold,
                args.minimum_note_length,
                args.minimum_frequency,
                args.maximum_frequency,
                args.multiple_pitch_bends,
                args.melodia_trick,
                args.sonification_samplerate,
                args.midi_tempo,
            )
        else:
            inference.predict_and_save(
                args.audio_paths,
                args.output_dir,
                args.save_midi,
                args.sonify_midi,
                args.save_model_outputs,
                args.save_note_events,
                model_path,
                args.onset_threshold,
                args.frame_threshold,
                args.minimum_note_length,
                args.minimum_frequency,
                args.maximum_frequency,
                args.multiple_pitch_bends,
                args.melodia_trick,
                args.debug_file,
                args.sonification_samplerate,
                args.midi_tempo,
            )
        print("\n✨ Done ✨\n")
    except IOError as ioe:
        print(ioe)
    except Exception as e:
        print("🚨 Something went wrong 😔 - see the traceback below for details.")
        print("")
        print(e)
        print(traceback.format_exc())


if __name__ == "__main__":
    main()
