"""Lossless PCM transport codec: wire format, exactness, pipeline parity.

The codec (ops/pcmcodec.py + native pack_pcm16_residual) must be BIT-EXACT:
the device-reconstructed float32 samples have to equal pcm/32768 exactly,
or transcription output would silently diverge from the raw-int16 path.
"""

import numpy as np
import pytest

from basic_pitch_tpu.ops import pcmcodec


def _signals():
    rng = np.random.RandomState(7)
    sine = (np.sin(np.arange(60000) * 0.07) * 18000).astype(np.int16)
    return {
        "random": (rng.randn(50000) * 4000).clip(-32768, 32767).astype(np.int16),
        "extremes": np.tile(np.array([-32768, 32767, 0, -1], np.int16), 300),
        "silence": np.zeros(4096, np.int16),
        "sine": sine,
        "mixed": np.concatenate([np.zeros(1000, np.int16), sine[:3000],
                                 (rng.randn(2000) * 30000).clip(-32768, 32767).astype(np.int16)]),
        "tiny": np.array([5], np.int16),
        "exact_blocks": (rng.randn(256 * 3) * 900).astype(np.int16),
    }


@pytest.mark.parametrize("name", list(_signals()))
def test_roundtrip_bit_exact(name):
    pcm = _signals()[name]
    out = np.asarray(pcmcodec.encode_decode(pcm))
    np.testing.assert_array_equal(out, pcm.astype(np.float32) / 32768.0)


@pytest.mark.parametrize("order", [1, 2, 3])
def test_numpy_and_native_packers_agree(order):
    if not pcmcodec.available():
        pytest.skip("native packer unavailable")
    for name, pcm in _signals().items():
        padded = np.pad(pcm, (0, (-len(pcm)) % pcmcodec.BLOCK))
        w_n, t_n, c_n, i_n, h_n = pcmcodec._native_pack(
            np.ascontiguousarray(padded), order
        )
        w_p, t_p, c_p, i_p, h_p = pcmcodec.pack_numpy(padded, order)
        assert t_n == t_p, name
        np.testing.assert_array_equal(w_n[:t_n], w_p[:t_p], err_msg=name)
        np.testing.assert_array_equal(c_n, c_p, err_msg=name)
        np.testing.assert_array_equal(i_n, i_p, err_msg=name)
        np.testing.assert_array_equal(h_n, h_p, err_msg=name)


@pytest.mark.parametrize("order", [1, 2, 3])
def test_roundtrip_bit_exact_forced_order(order):
    for name, pcm in _signals().items():
        out = np.asarray(pcmcodec.decode_to_device(pcmcodec.pack(pcm, order)))
        np.testing.assert_array_equal(
            out, pcm.astype(np.float32) / 32768.0, err_msg=f"{name} order={order}"
        )


def test_order_choosers_agree():
    if not pcmcodec.available():
        pytest.skip("native packer unavailable")
    for name, pcm in _signals().items():
        padded = np.ascontiguousarray(np.pad(pcm, (0, (-len(pcm)) % pcmcodec.BLOCK)))
        assert pcmcodec._native_choose_order(padded) == pcmcodec.choose_order_numpy(
            padded
        ), name


def test_short_sparse_piece_does_not_expand():
    """Regression: the sparse-group merge must not cascade an all-sparse
    short piece to the widest ladder width — a 0.5 s quiet clip has to
    pack SMALLER than raw int16, not 19 bits/sample."""
    t = np.arange(12000) / 22050.0
    pcm = (np.sin(2 * np.pi * 220.0 * t) * 500).astype(np.int16)  # ~quiet tone
    packed = pcmcodec.pack(pcm)
    assert packed.packed_bytes < pcm.nbytes, (packed.packed_bytes, pcm.nbytes)
    out = np.asarray(pcmcodec.decode_to_device(packed))
    np.testing.assert_array_equal(out, pcm.astype(np.float32) / 32768.0)


def test_pack_rejects_bad_order():
    with pytest.raises(ValueError, match="order"):
        pcmcodec.pack(np.zeros(512, np.int16), order=4)


def test_numpy_fallback_roundtrip(monkeypatch):
    monkeypatch.setattr(pcmcodec, "_native_pack", lambda pcm, order: None)
    monkeypatch.setattr(pcmcodec, "_native_choose_order", lambda pcm: None)
    pcm = _signals()["mixed"]
    out = np.asarray(pcmcodec.encode_decode(pcm))
    np.testing.assert_array_equal(out, pcm.astype(np.float32) / 32768.0)


def test_compresses_real_music():
    import pathlib

    clip = pathlib.Path("/root/reference/tests/resources/vocadito_10.wav")
    if not clip.exists():
        pytest.skip("reference clip not present")
    from basic_pitch_tpu.utils import audio as audio_io

    samples, sr = audio_io.read_wav(str(clip))
    pcm = np.clip(np.round(audio_io.to_mono(samples) * 32768.0), -32768, 32767).astype(np.int16)
    packed = pcmcodec.pack(pcm)
    assert packed.packed_bytes < 0.85 * pcm.nbytes  # ~1.4x on real vocals
    out = np.asarray(pcmcodec.decode_to_device(packed, len(pcm)))
    np.testing.assert_array_equal(out, pcm.astype(np.float32) / 32768.0)


def test_pipeline_codec_path_matches_raw_44k(monkeypatch):
    """44.1 kHz int16 input: codec-packed pieces must decode to the exact
    samples the on-device decimator would have seen from raw transport."""
    from basic_pitch_tpu import constants, pipeline

    rng = np.random.RandomState(11)
    sr = 2 * constants.AUDIO_SAMPLE_RATE
    n = int(3.2 * sr)
    t = np.arange(n) / sr
    y = (0.5 * np.sin(2 * np.pi * 196.0 * t) * (t < 1.5)).astype(np.float32)
    y += rng.randn(n).astype(np.float32) * 0.002
    pcm = np.clip(np.round(y * 32768.0), -32768, 32767).astype(np.int16)

    tr = pipeline.StreamingTranscriber(windows_per_chunk=8)
    monkeypatch.setattr(pcmcodec, "available", lambda: False)
    ev_raw = tr.transcribe(pcm, sr)
    monkeypatch.undo()
    if not pcmcodec.available():
        pytest.skip("native packer unavailable")
    ev_codec = tr.transcribe(pcm, sr)
    assert ev_codec == ev_raw
    assert len(ev_raw) >= 1


# --------------------------------------------------------------------------
# LPC mode (per-block adaptive prediction) — the round-4 regression surface:
# decode_to_device must dispatch on PackedPCM.mode, the numpy and native
# analyzers/packers must agree on the wire, and full-scale/clipped audio
# (which auto-selects LPC) must stay bit-exact through the DEFAULT path.
# --------------------------------------------------------------------------


def _lpc_signals():
    """The shared signals plus LPC-favoring content (tonal, full-scale)."""
    rng = np.random.RandomState(13)
    t = np.arange(60000)
    sigs = dict(_signals())
    sigs["two_sines"] = (
        np.sin(t * 0.031) * 12000 + np.sin(t * 0.173) * 9000
    ).astype(np.int16)
    sigs["clipped_loud"] = np.clip(
        np.sin(t[:30000] * 0.011) * 60000, -32768, 32767
    ).astype(np.int16)
    sigs["hf_tonal"] = (np.sin(t[:20000] * 2.9) * 30000).astype(np.int16)
    sigs["fullscale_noise"] = rng.randint(
        -32768, 32768, 25000
    ).astype(np.int16)
    return sigs


@pytest.mark.parametrize("name", list(_lpc_signals()))
def test_roundtrip_bit_exact_forced_lpc(name):
    pcm = _lpc_signals()[name]
    packed = pcmcodec.pack(pcm, mode="lpc")
    assert packed.mode == "lpc" and packed.coeffs is not None
    out = np.asarray(pcmcodec.decode_to_device(packed))
    np.testing.assert_array_equal(out, pcm.astype(np.float32) / 32768.0)


@pytest.mark.parametrize("name", list(_lpc_signals()))
def test_roundtrip_bit_exact_default_mode(name):
    """DEFAULT pack() (mode auto-selected) is bit-exact on every signal —
    including ones where LPC wins (two_sines auto-picks lpc, VERDICT r4)."""
    pcm = _lpc_signals()[name]
    packed = pcmcodec.pack(pcm)
    out = np.asarray(pcmcodec.decode_to_device(packed))
    np.testing.assert_array_equal(
        out, pcm.astype(np.float32) / 32768.0, err_msg=f"{name} mode={packed.mode}"
    )


def test_default_mode_picks_lpc_on_tonal_content():
    packed = pcmcodec.pack(_lpc_signals()["hf_tonal"])
    assert packed.mode == "lpc"
    fixed = pcmcodec.pack(_lpc_signals()["hf_tonal"], mode="fixed")
    assert packed.packed_bytes < fixed.packed_bytes


def test_numpy_and_native_lpc_packers_agree():
    """Given the SAME coefficients, the numpy and C++ LPC packers must emit
    identical wire bytes (mirrors test_numpy_and_native_packers_agree)."""
    if not pcmcodec.available():
        pytest.skip("native packer unavailable")
    for name, pcm in _lpc_signals().items():
        padded = np.ascontiguousarray(
            np.pad(pcm, (0, (-len(pcm)) % pcmcodec.BLOCK))
        )
        coeffs, shifts, _ = pcmcodec.lpc_analyze_numpy(padded)
        nat = pcmcodec._native_lpc_pack(padded, coeffs, shifts)
        if nat is None:
            pytest.skip("native pack_pcm16_lpc unavailable")
        w_n, t_n, c_n, i_n, h_n = nat
        w_p, t_p, c_p, i_p, h_p = pcmcodec.pack_numpy_lpc(padded, coeffs, shifts)
        assert t_n == t_p, name
        np.testing.assert_array_equal(w_n[:t_n], w_p[:t_p], err_msg=name)
        np.testing.assert_array_equal(c_n, c_p, err_msg=name)
        np.testing.assert_array_equal(i_n, i_p, err_msg=name)
        np.testing.assert_array_equal(h_n, h_p, err_msg=name)


def test_native_lpc_analysis_roundtrips():
    """The C++ analyzer's coefficients (which may differ in float detail from
    numpy's) must still round-trip exactly — the wire is self-describing."""
    if not pcmcodec.available():
        pytest.skip("native packer unavailable")
    for name, pcm in _lpc_signals().items():
        padded = np.ascontiguousarray(
            np.pad(pcm, (0, (-len(pcm)) % pcmcodec.BLOCK))
        )
        res = pcmcodec._native_lpc_analyze(padded)
        if res is None:
            pytest.skip("native lpc_analyze_pcm16 unavailable")
        coeffs, shifts, bits = res
        assert bits > 0
        assert np.abs(coeffs.astype(np.int64)).sum(axis=1).max() <= 32767
        w, t, c, i, h = pcmcodec.pack_numpy_lpc(padded, coeffs, shifts)
        r = pcmcodec._lpc_residuals(
            padded.astype(np.int32).reshape(-1, pcmcodec.BLOCK), coeffs, shifts
        )
        assert pcmcodec._signed_widths(r).max() <= pcmcodec.KSET[0], name


def test_lpc_numpy_fallback_roundtrip(monkeypatch):
    monkeypatch.setattr(pcmcodec, "_native_lpc_analyze", lambda pcm, p=8: None)
    monkeypatch.setattr(pcmcodec, "_native_lpc_pack", lambda pcm, c, s: None)
    monkeypatch.setattr(pcmcodec, "_native_fixed_costs", lambda pcm: None)
    for name in ("two_sines", "extremes", "clipped_loud"):
        pcm = _lpc_signals()[name]
        packed = pcmcodec.pack(pcm, mode="lpc")
        out = np.asarray(pcmcodec.decode_to_device(packed))
        np.testing.assert_array_equal(
            out, pcm.astype(np.float32) / 32768.0, err_msg=name
        )


def test_lpc_fuzz_adversarial():
    """Fuzz both modes with adversarial content: full-scale alternation,
    clipped masters, step edges, tonal sweeps — every piece bit-exact."""
    rng = np.random.RandomState(99)
    for trial in range(12):
        n = int(rng.randint(300, 20000))
        kind = trial % 4
        if kind == 0:  # clipped loud tonal
            x = np.clip(
                np.sin(np.arange(n) * rng.uniform(0.005, 0.4)) * 50000,
                -32768, 32767,
            )
        elif kind == 1:  # full-scale square-ish
            x = np.where(rng.randn(n) > 0, 32767, -32768)
        elif kind == 2:  # steps + tone
            x = np.sin(np.arange(n) * 0.07) * 15000
            x[rng.randint(0, n, 5)] = 32767
        else:  # chirp
            ph = np.cumsum(np.linspace(0.001, 1.2, n))
            x = np.sin(ph) * rng.uniform(1000, 32000)
        pcm = x.astype(np.int16)
        for mode in (None, "lpc", "fixed"):
            packed = pcmcodec.pack(pcm, mode=mode)
            out = np.asarray(pcmcodec.decode_to_device(packed))
            np.testing.assert_array_equal(
                out,
                pcm.astype(np.float32) / 32768.0,
                err_msg=f"trial={trial} mode={mode} -> {packed.mode}",
            )


def test_wire_is_deterministic():
    """Packing the same PCM twice must produce identical wire bytes — the
    quantized words tail is zeroed, never uninitialized heap (ADVICE r4)."""
    for name, pcm in _lpc_signals().items():
        a = pcmcodec.pack(pcm)
        b = pcmcodec.pack(pcm)
        np.testing.assert_array_equal(a.words, b.words, err_msg=name)
        tail_a = pcmcodec.pack(pcm, mode="fixed")
        tail_b = pcmcodec.pack(pcm, mode="fixed")
        np.testing.assert_array_equal(tail_a.words, tail_b.words, err_msg=name)


def test_train_transport_bitexact_on_tonal_audio():
    """upload_batch on LPC-favoring audio (ADVICE r4: the train transport
    packs with defaults, which auto-select LPC on tonal recordings)."""
    from basic_pitch_tpu import constants
    from basic_pitch_tpu.train import loop as train_loop

    if not pcmcodec.available():
        pytest.skip("native packer not built")
    t = np.arange(constants.AUDIO_N_SAMPLES)
    audio = np.stack(
        [(np.sin(t * (2.7 + 0.1 * i)) * 28000) for i in range(4)]
    ).astype(np.int16)
    batch = {"audio": audio}
    packed = train_loop.pack_batch_audio(batch, pcm_transport="codec")
    assert "audio_packed" in packed
    assert packed["audio_packed"][0].mode == "lpc"
    dev, _ = train_loop.upload_batch(packed)
    np.testing.assert_array_equal(
        np.asarray(dev["audio"]), audio.astype(np.float32) / 32768.0
    )


def test_pipeline_codec_path_matches_raw_int16_path(monkeypatch):
    """transcribe() must yield identical events with the codec on and off."""
    from basic_pitch_tpu import constants, pipeline

    rng = np.random.RandomState(3)
    n = int(4.5 * constants.AUDIO_SAMPLE_RATE)
    t = np.arange(n) / constants.AUDIO_SAMPLE_RATE
    y = np.zeros(n, np.float32)
    for f0, s in ((220.0, 0.0), (330.0, 1.5), (262.0, 3.0)):
        seg = (t >= s) & (t < s + 1.2)
        y[seg] += 0.4 * np.sin(2 * np.pi * f0 * t[seg])
    y += rng.randn(n).astype(np.float32) * 0.003
    pcm = np.clip(np.round(y * 32768.0), -32768, 32767).astype(np.int16)

    tr = pipeline.StreamingTranscriber(windows_per_chunk=8)
    monkeypatch.setattr(pcmcodec, "available", lambda: False)
    ev_raw = tr.transcribe(pcm, constants.AUDIO_SAMPLE_RATE)
    monkeypatch.undo()
    if not pcmcodec.available():
        pytest.skip("native packer unavailable")
    ev_codec = tr.transcribe(pcm, constants.AUDIO_SAMPLE_RATE)
    assert ev_codec == ev_raw
    assert len(ev_raw) >= 3
