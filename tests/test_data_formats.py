"""Wire formats: protobuf Example codec, TensorProto, TFRecord framing.

Includes byte-level round trips against TensorFlow when it is installed
(the reference toolchain), so our readers/writers are provably
TFRecord-compatible; pure-python round trips otherwise.
"""

import importlib.util

import numpy as np
import pytest

from basic_pitch_tpu.data import proto, serialization, tfrecord

HAS_TF = importlib.util.find_spec("tensorflow") is not None


def test_varint_roundtrip():
    for value in [0, 1, 127, 128, 300, 2**32, 2**63 - 1]:
        data = proto.encode_varint(value)
        decoded, pos = proto.decode_varint(data, 0)
        assert decoded == value and pos == len(data)


def test_tensor_roundtrip():
    for array in [
        np.arange(12, dtype=np.int64).reshape(3, 4),
        np.random.RandomState(0).randn(5).astype(np.float32),
        np.zeros((0, 2), np.int64),
        np.int64([[7]]),
    ]:
        out = proto.decode_tensor(proto.encode_tensor(array))
        assert out.dtype == array.dtype and out.shape == array.shape
        np.testing.assert_array_equal(out, array)


def test_example_roundtrip():
    features = {
        "name": b"hello",
        "ints": [1, 2, 3],
        "floats": [0.5, -1.25],
        "blob": [b"a", b"bc"],
    }
    decoded = proto.decode_example(proto.encode_example(features))
    assert decoded["name"] == [b"hello"]
    np.testing.assert_array_equal(decoded["ints"], [1, 2, 3])
    np.testing.assert_allclose(decoded["floats"], [0.5, -1.25])
    assert decoded["blob"] == [b"a", b"bc"]


def test_crc32c_known_values():
    # RFC 3720 test vector: 32 bytes of zeros
    assert tfrecord.crc32c(b"\x00" * 32) == 0x8A9136AA
    assert tfrecord.crc32c(b"123456789") == 0xE3069283


def test_tfrecord_roundtrip(tmp_path):
    path = tmp_path / "t.tfrecord"
    records = [b"first", b"second" * 100, b""]
    with tfrecord.TFRecordWriter(path) as writer:
        for r in records:
            writer.write(r)
    assert list(tfrecord.read_tfrecords(path, verify=True)) == records


def test_tfrecord_truncated_raises_ioerror(tmp_path):
    """A file cut mid-record must raise the truncation IOError (not a bare
    struct.error from unpacking a short CRC read)."""
    path = tmp_path / "t.tfrecord"
    with tfrecord.TFRecordWriter(path) as writer:
        writer.write(b"payload" * 50)
    whole = path.read_bytes()
    for cut in (len(whole) - 2, len(whole) - 6, 10):  # mid-CRC, mid-record, mid-header-CRC
        trunc = tmp_path / f"cut{cut}.tfrecord"
        trunc.write_bytes(whole[:cut])
        with pytest.raises(IOError, match="truncated record"):
            list(tfrecord.read_tfrecords(trunc))


@pytest.mark.skipif(not HAS_TF, reason="tensorflow unavailable")
def test_tf_reads_our_tfrecords(tmp_path):
    import tensorflow as tf

    path = str(tmp_path / "ours.tfrecord")
    with tfrecord.TFRecordWriter(path) as writer:
        writer.write(b"payload-1")
        writer.write(b"payload-2")
    got = [r.numpy() for r in tf.data.TFRecordDataset(path)]
    assert got == [b"payload-1", b"payload-2"]


@pytest.mark.skipif(not HAS_TF, reason="tensorflow unavailable")
def test_we_read_tf_tfrecords(tmp_path):
    import tensorflow as tf

    path = str(tmp_path / "theirs.tfrecord")
    with tf.io.TFRecordWriter(path) as writer:
        writer.write(b"alpha")
        writer.write(b"beta")
    assert list(tfrecord.read_tfrecords(path, verify=True)) == [b"alpha", b"beta"]


@pytest.mark.skipif(not HAS_TF, reason="tensorflow unavailable")
def test_tensorproto_matches_tf():
    import tensorflow as tf

    for array in [
        np.arange(6, dtype=np.int64).reshape(2, 3),
        np.random.RandomState(1).randn(4).astype(np.float32),
    ]:
        theirs = tf.io.serialize_tensor(array).numpy()
        ours = proto.encode_tensor(array)
        # parse each other's bytes
        np.testing.assert_array_equal(
            tf.io.parse_tensor(ours, out_type=tf.as_dtype(array.dtype)).numpy(), array
        )
        np.testing.assert_array_equal(proto.decode_tensor(theirs), array)


@pytest.mark.skipif(not HAS_TF, reason="tensorflow unavailable")
def test_example_matches_tf():
    import tensorflow as tf

    ours = proto.encode_example({"a": b"xyz", "b": [1, 2], "c": [1.5]})
    parsed = tf.io.parse_single_example(
        ours,
        {
            "a": tf.io.FixedLenFeature((), tf.string),
            "b": tf.io.FixedLenFeature((2,), tf.int64),
            "c": tf.io.FixedLenFeature((1,), tf.float32),
        },
    )
    assert parsed["a"].numpy() == b"xyz"
    np.testing.assert_array_equal(parsed["b"].numpy(), [1, 2])
    np.testing.assert_allclose(parsed["c"].numpy(), [1.5])


def _make_example(tmp_path, file_id="track1", n_frames=172, empty_contours=False):
    from basic_pitch_tpu.utils import audio as audio_io

    rng = np.random.RandomState(0)
    wav_path = tmp_path / f"{file_id}.wav"
    audio_io.write_wav(wav_path, rng.randn(22050 * 3) * 0.1, 22050)
    with open(wav_path, "rb") as fh:
        wav_bytes = fh.read()
    notes_idx = [(5, 40), (6, 40), (7, 41)]
    notes_val = [1.0, 0.8, 0.5]
    contours_idx = [] if empty_contours else [(5, 120)]
    contours_val = [] if empty_contours else [1.0]
    return serialization.to_transcription_example(
        file_id,
        "testset",
        wav_bytes,
        notes_indices=notes_idx,
        notes_values=notes_val,
        onsets_indices=[(5, 40)],
        onsets_values=[1.0],
        contours_indices=contours_idx,
        contours_values=contours_val,
        notes_onsets_shape=(n_frames, 88),
        contours_shape=(n_frames, 264) if not empty_contours else (0, 0),
    )


def test_transcription_example_roundtrip(tmp_path):
    record = _make_example(tmp_path)
    parsed = serialization.parse_transcription_example(record)
    assert parsed.file_id == "track1"
    assert parsed.source == "testset"
    assert parsed.audio.shape == (22050 * 3,)
    assert parsed.notes.shape == (172, 88)
    assert parsed.notes[5, 40] == 1.0 and parsed.notes[7, 41] == 0.5
    assert parsed.onsets[5, 40] == 1.0
    assert parsed.contours[5, 120] == 1.0


def test_transcription_example_empty_annotation(tmp_path):
    parsed = serialization.parse_transcription_example(
        _make_example(tmp_path, empty_contours=True)
    )
    assert parsed.contours.shape == (0, 0)
    assert parsed.notes.shape == (172, 88)
