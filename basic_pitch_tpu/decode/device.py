"""On-device (jittable) note-event decoder.

Re-expresses the reference's sequential greedy decoders
(`/root/reference/basic_pitch/note_creation.py:360-509`) as fixed-shape JAX
programs so posteriorgrams NEVER leave the device — only compact note-event
buffers (a few KB) and an optional int8 bend matrix are transferred. This is
what makes >>500x-real-time end-to-end throughput possible: the host-side
python decode and the posteriorgram device->host transfer are both removed
from the hot path.

Key reformulations:

  * Onset ordering (backward in time, then descending frequency) becomes a
    single `top_k` over masked flattened indices.
  * "Walk forward until `tol` consecutive sub-threshold frames" becomes a
    cumulative-max run-length computation: with `last_above[t]` the latest
    above-threshold position <= t, the walk's gap counter at t is
    `t - last_above[t]`, so the stopping position is the first index where
    that reaches `tol` — one `cummax` + one masked `argmin` per note instead
    of a python loop over frames.
  * The melodia trick's data-dependent `while max(energy) > thresh` loop maps
    onto `lax.while_loop` with the same run-length trick in both directions;
    the residual-energy matrix is updated in place with 3-row dynamic slices.
  * Per-note gaussian-weighted pitch-bend argmax becomes one dense
    (T, 88, 51) weighted argmax over all possible note pitches at once.

Emission order (onset notes backward in time, then melodia notes by
descending residual energy) matches the reference exactly, as do all edge
conditions; `tests/test_device_decode.py` fuzzes this against the host
decoder oracle.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from basic_pitch_tpu import constants
from basic_pitch_tpu.decode import notes as host_decode

F = constants.N_FREQ_BINS_NOTES  # 88
MAX_FREQ_IDX = host_decode.MAX_FREQ_IDX
N_BEND_TOLERANCE = 25
BEND_WINDOW = 2 * N_BEND_TOLERANCE + 1

# scans/zeroing operate on a window of this many frames around each note
# seed (with an exact full-length fallback for notes that outgrow it);
# per-note cost is then independent of recording length. 1024 frames covers
# notes up to ~12 s; measured 172 ms vs 194 ms at 4096 for a 600 s recording
# (the loop is iteration-latency-bound, so smaller slabs help only a little)
SCAN_WINDOW = 1024


class DecodedNotes(NamedTuple):
    """Fixed-size note buffers (valid entries: index < n_notes)."""

    starts: jnp.ndarray  # (max_notes,) int32
    ends: jnp.ndarray  # (max_notes,) int32
    pitches: jnp.ndarray  # (max_notes,) int32 — MIDI numbers
    amplitudes: jnp.ndarray  # (max_notes,) float32
    n_notes: jnp.ndarray  # () int32
    overflow: jnp.ndarray  # () bool — buffers or iteration caps were hit


def _forward_scan(col, t0, thresh, tol, t_end):
    """End bookkeeping of the reference's forward walk from t0+1.

    `t_end` is the (possibly traced) logical frame count — the array may be
    zero-padded beyond it so one executable serves any file length.

    Returns (end, i_final): `end` is the exclusive end of above-threshold
    frames (walk position minus trailing gap); `i_final` the exclusive end of
    VISITED frames (used by melodia's zeroing).
    """
    n = col.shape[0]
    pos = jnp.arange(n)
    above = (col >= thresh) | (pos <= t0)
    last_above = jax.lax.cummax(jnp.where(above, pos, -1))
    consec = pos - last_above
    in_range = (consec >= tol) & (pos >= t0 + 1) & (pos <= t_end - 2)
    cand = jnp.where(in_range, pos, n)
    t_stop = jnp.min(cand)
    found = t_stop < n
    consec_tail = jnp.take(consec, jnp.clip(t_end - 2, 0, n - 1))
    k_nostop = jnp.where(t_end - 2 >= t0 + 1, consec_tail, 0)
    i_final = jnp.where(found, t_stop + 1, jnp.maximum(t0 + 1, t_end - 1))
    k_final = jnp.where(found, tol, k_nostop)
    return i_final - k_final, i_final, found


def _backward_scan(col, t0, thresh, tol):
    """Start bookkeeping of the melodia backward walk from t0-1.

    Only depends on positions <= t0, so zero padding beyond the logical frame
    count needs no special handling here.

    Returns (start, i_final, found): `start` is the inclusive start of
    above-threshold frames; `i_final` the inclusive end of the walk (frames
    (i_final, t0) were visited).
    """
    n_frames = col.shape[0]
    pos = jnp.arange(n_frames)
    above = (col >= thresh) | (pos >= t0)
    rev = jnp.where(above, pos, n_frames + 1)[::-1]
    next_above = jax.lax.cummin(rev)[::-1]
    consec = next_above - pos
    in_range = (consec >= tol) & (pos <= t0 - 1) & (pos >= 1)
    cand = jnp.where(in_range, pos, -1)
    t_stop = jnp.max(cand)
    found = t_stop >= 0
    k_nostop = jnp.where(t0 - 1 >= 1, consec[1], 0)
    i_final = jnp.where(found, t_stop - 1, jnp.minimum(t0 - 1, 0))
    k_final = jnp.where(found, tol, k_nostop)
    return i_final + 1 + k_final, i_final, found


def _zero_rows(matrix_ft, freq, time_mask_center, time_mask_neighbors):
    """Zero energy around `freq`: center row under one mask, the +/-1
    neighbor rows under another. matrix_ft is (F, T)."""
    start = jnp.clip(freq - 1, 0, F - 3)
    rows = jax.lax.dynamic_slice(matrix_ft, (start, 0), (3, matrix_ft.shape[1]))
    row_ids = start + jnp.arange(3)[:, None]
    is_center = row_ids == freq
    is_neighbor = jnp.abs(row_ids - freq) == 1
    mask = jnp.where(
        is_center, time_mask_center[None, :], jnp.where(is_neighbor, time_mask_neighbors[None, :], False)
    )
    return jax.lax.dynamic_update_slice(matrix_ft, jnp.where(mask, 0.0, rows), (start, 0))


def _zero_rows_window(matrix_ft, freq, wstart, time_mask_center, time_mask_neighbors):
    """`_zero_rows` restricted to a SCAN_WINDOW-wide slab at `wstart`;
    the masks are window-relative."""
    window = time_mask_center.shape[0]
    start = jnp.clip(freq - 1, 0, F - 3)
    rows = jax.lax.dynamic_slice(matrix_ft, (start, wstart), (3, window))
    row_ids = start + jnp.arange(3)[:, None]
    mask = jnp.where(
        row_ids == freq,
        time_mask_center[None, :],
        jnp.where(jnp.abs(row_ids - freq) == 1, time_mask_neighbors[None, :], False),
    )
    return jax.lax.dynamic_update_slice(
        matrix_ft, jnp.where(mask, 0.0, rows), (start, wstart)
    )


class PackedNotes(NamedTuple):
    """Loop-carried note buffer: one (max_notes, 4) int32 matrix holding
    [start, end, midi pitch, bitcast(amplitude)] per row. Emitting a note is
    one dynamic row read + blend + write instead of four separate guarded
    scatters — the emission happens inside per-note while_loops that are
    iteration-latency-bound, so op count matters more than bytes."""

    data: jnp.ndarray  # (max_notes, 4) int32
    n_notes: jnp.ndarray  # () int32
    overflow: jnp.ndarray  # () bool


def _empty_packed(max_notes: int, overflow) -> PackedNotes:
    return PackedNotes(
        data=jnp.zeros((max_notes, 4), jnp.int32),
        n_notes=jnp.asarray(0, jnp.int32),
        overflow=jnp.asarray(False) | overflow,
    )


def _unpack(buffers: PackedNotes) -> DecodedNotes:
    return DecodedNotes(
        starts=buffers.data[:, 0],
        ends=buffers.data[:, 1],
        pitches=buffers.data[:, 2],
        amplitudes=jax.lax.bitcast_convert_type(buffers.data[:, 3], jnp.float32),
        n_notes=buffers.n_notes,
        overflow=buffers.overflow,
    )


def _emit(buffers: PackedNotes, start, end, pitch, amplitude, keep) -> PackedNotes:
    max_notes = buffers.data.shape[0]
    slot = buffers.n_notes
    fits = slot < max_notes
    write = keep & fits
    idx = jnp.where(write, slot, 0)

    row = jnp.stack(
        [
            start.astype(jnp.int32),
            end.astype(jnp.int32),
            (pitch + host_decode.MIDI_PITCH_OFFSET).astype(jnp.int32),
            jax.lax.bitcast_convert_type(amplitude.astype(jnp.float32), jnp.int32),
        ]
    )[None, :]
    old = jax.lax.dynamic_slice(buffers.data, (idx, 0), (1, 4))
    blended = jnp.where(write, row, old)
    return PackedNotes(
        data=jax.lax.dynamic_update_slice(buffers.data, blended, (idx, 0)),
        n_notes=buffers.n_notes + write.astype(jnp.int32),
        overflow=buffers.overflow | (keep & ~fits),
    )


def preprocess(
    frames: jnp.ndarray,
    onsets: jnp.ndarray,
    freq_mask: Optional[jnp.ndarray],
    infer_onsets: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Frequency constraining + onset inference (`note_creation.py:289-335`)."""
    if freq_mask is not None:
        frames = frames * freq_mask[None, :]
        onsets = onsets * freq_mask[None, :]
    if infer_onsets:
        diffs = []
        for lag in (1, 2):
            padded = jnp.concatenate([jnp.zeros((lag, F), frames.dtype), frames])
            diffs.append(padded[lag:] - padded[:-lag])
        frame_diff = jnp.maximum(jnp.minimum(diffs[0], diffs[1]), 0.0)
        frame_diff = frame_diff.at[:2].set(0.0)
        peak = jnp.max(frame_diff)
        # ratio pinned to exactly 1 at the peak: TPU lowers f32 division to
        # reciprocal-multiply, so x/x can land 1 ulp off 1.0 — which breaks
        # the STRUCTURAL tie scaled[argmax(frame_diff)] == max(onsets) that
        # the reference's rescale creates (`note_creation.py:289-311`) and
        # flips onset peak-picking by a frame on real material
        ratio = jnp.where(frame_diff == peak, 1.0, frame_diff / peak)
        scaled = jnp.where(peak > 0, jnp.max(onsets) * ratio, 0.0)
        onsets = jnp.maximum(onsets, scaled)
    return frames, onsets


def onset_peak_mask(
    onsets: jnp.ndarray,
    t_end: "jnp.ndarray | int",
    onset_thresh: "jnp.ndarray | float",
) -> jnp.ndarray:
    """Strict time-local onset maxima, thresholded with >= — including the
    reference's quirk that threshold 0 admits non-peaks
    (`note_creation.py:396-404`) — with every frame past t_end excluded.
    Shared by the XLA decoder and the Pallas wrapper."""
    n_frames = onsets.shape[0]
    interior = (onsets[1:-1] > onsets[:-2]) & (onsets[1:-1] > onsets[2:])
    peak_mask = jnp.pad(interior, ((1, 1), (0, 0)))
    pos_t = jnp.arange(n_frames)[:, None]
    peak_mask = peak_mask & (pos_t <= t_end - 2)  # padded region has no peaks
    peak_values = jnp.where(peak_mask, onsets, 0.0)
    return (peak_values >= onset_thresh) & (pos_t < t_end)


def onset_candidate_order(
    onset_mask: jnp.ndarray, k: int, buf_len: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Onset candidates in the reference's order (time desc, then freq desc
    == descending flattened index), stream-compacted into a (buf_len,) int32
    buffer of flat ids (-1 padded); candidates past the LOGICAL cap `k` are
    dropped. Returns (order buffer, total candidate count).

    Stable cumsum+scatter compaction — a top_k over T*88 elements compiles
    and runs far worse at long-file scale. NOT jnp.arange(total-1, -1, -1):
    a negative-step arange materializes a CONCRETE (T*88,) array into the
    program as a literal — 150+ MB of constants in the hour-scale
    executable, which then costs minutes to compile/serialize and to ship
    to the device; the iota difference stays symbolic."""
    total = onset_mask.size
    mask_desc = onset_mask.reshape(-1)[::-1]
    positions = jnp.cumsum(mask_desc.astype(jnp.int32)) - 1
    # out-of-cap candidates scatter to index buf_len -> mode="drop"
    dest = jnp.where(mask_desc & (positions < k), positions, buf_len)
    flat_ids_desc = (total - 1) - jnp.arange(total, dtype=jnp.int32)
    order = jnp.full((buf_len,), -1, jnp.int32).at[dest].set(
        flat_ids_desc, mode="drop"
    )
    return order, jnp.sum(onset_mask).astype(jnp.int32)


def decode(
    frames: jnp.ndarray,
    onsets: jnp.ndarray,
    onset_thresh: "jnp.ndarray | float",
    frame_thresh: "jnp.ndarray | float",
    min_note_len: "jnp.ndarray | int",
    freq_mask: Optional[jnp.ndarray] = None,
    infer_onsets: bool = True,
    melodia_trick: bool = True,
    energy_tol: int = host_decode.DEFAULT_ENERGY_TOLERANCE,
    max_notes: int = 4096,
    max_melodia_iters: int = 8192,
    valid_frames: "jnp.ndarray | int | None" = None,
) -> DecodedNotes:
    """Jittable equivalent of `output_to_notes_polyphonic`.

    Args:
        frames / onsets: (T, 88) float32 posteriorgrams (device).
        onset_thresh / frame_thresh / min_note_len / energy_tol: may be
            traced scalars — threshold sweeps reuse one executable.
        freq_mask: optional (88,) 0/1 mask (frequency constraining).
        max_notes / max_melodia_iters: static buffer/iteration bounds; the
            `overflow` flag reports truncation (callers fall back to the host
            decoder in that rare case).
        valid_frames: optional traced logical frame count when the arrays are
            zero-padded to a bucketed length — decoding then behaves exactly
            as if the arrays were `valid_frames` long.

    Returns:
        DecodedNotes in the reference's emission order.
    """
    orig_frames = frames.shape[0]
    t_end = orig_frames if valid_frames is None else valid_frames
    # windowed mode: per-note scans/zeroing touch SCAN_WINDOW frames instead
    # of the whole timeline (full-length fallback keeps exactness for notes
    # that outgrow the window). No block padding needed: every windowed
    # access is a dynamic_slice whose start is clipped to n_frames - W.
    windowed = orig_frames > SCAN_WINDOW
    n_frames = frames.shape[0]
    if valid_frames is not None:
        # zero the padded tail so BOTH stages behave exactly as if the
        # arrays ended at t_end — stage 1 also guards via its masks, but the
        # melodia seed search scans the whole residual matrix
        pad_mask = (jnp.arange(n_frames)[:, None] < t_end).astype(frames.dtype)
        frames = frames * pad_mask
        onsets = onsets * pad_mask
    frames, onsets = preprocess(frames, onsets, freq_mask, infer_onsets)

    onset_mask = onset_peak_mask(onsets, t_end, onset_thresh)

    # candidate capacity must scale with recording length, independent of the
    # note-buffer size: real material carries ~20-25 onset candidates per
    # audio second (~0.25/frame), so a fixed max_notes-sized list spuriously
    # overflows (-> slow host fallback) past ~10 minutes. The onset loop
    # iterates n_onsets times regardless of k, so headroom costs only a
    # (k,) int32 buffer.
    k = min(max(max_notes, n_frames), n_frames * F)
    onset_order, full_count = onset_candidate_order(onset_mask, k, k)
    n_onsets = full_count
    onset_overflow = full_count > k

    frames_ft = frames.T  # (F, T): row slice = one frequency's timeline
    remaining0 = frames_ft
    pos = jnp.arange(n_frames)

    empty = _empty_packed(max_notes, onset_overflow)

    # ---- stage 1: onset-anchored notes, backward in time -----------------
    W = SCAN_WINDOW
    pos_w = jnp.arange(W)

    def onset_body(state):
        i, remaining, buffers = state
        flat = onset_order[i]
        t0 = flat // F
        freq = flat % F
        valid = (flat >= 0) & (t0 < t_end - 1)

        if not windowed:
            col = jax.lax.dynamic_slice(remaining, (freq, 0), (1, n_frames))[0]
            end, _, _ = _forward_scan(col, t0, frame_thresh, energy_tol, t_end)
            keep = valid & (end - t0 > min_note_len)
            time_mask = (pos >= t0) & (pos < end) & keep
            remaining = _zero_rows(remaining, freq, time_mask, time_mask)
            frames_col = jax.lax.dynamic_slice(frames_ft, (freq, 0), (1, n_frames))[0]
            span = jnp.maximum(end - t0, 1).astype(jnp.float32)
            amplitude = jnp.sum(jnp.where((pos >= t0) & (pos < end), frames_col, 0.0)) / span
            buffers = _emit(buffers, t0, end, freq, amplitude, keep)
            return i + 1, remaining, buffers

        wstart = jnp.minimum(t0, n_frames - W)
        t0r = t0 - wstart
        col_w = jax.lax.dynamic_slice(remaining, (freq, wstart), (1, W))[0]
        end_r, _, found = _forward_scan(col_w, t0r, frame_thresh, energy_tol, t_end - wstart)
        sufficient = found | (t_end - wstart <= W)

        def window_branch(args):
            rem, valid_ = args
            end = wstart + end_r
            keep = valid_ & (end - t0 > min_note_len)
            mask = (pos_w >= t0r) & (pos_w < end_r) & keep
            rem = _zero_rows_window(rem, freq, wstart, mask, mask)
            frames_w = jax.lax.dynamic_slice(frames_ft, (freq, wstart), (1, W))[0]
            amp_sum = jnp.sum(jnp.where((pos_w >= t0r) & (pos_w < end_r), frames_w, 0.0))
            return rem, end, amp_sum

        def full_branch(args):
            rem, valid_ = args
            col = jax.lax.dynamic_slice(rem, (freq, 0), (1, n_frames))[0]
            end, _, _ = _forward_scan(col, t0, frame_thresh, energy_tol, t_end)
            keep = valid_ & (end - t0 > min_note_len)
            mask = (pos >= t0) & (pos < end) & keep
            rem = _zero_rows(rem, freq, mask, mask)
            frames_col = jax.lax.dynamic_slice(frames_ft, (freq, 0), (1, n_frames))[0]
            amp_sum = jnp.sum(jnp.where((pos >= t0) & (pos < end), frames_col, 0.0))
            return rem, end, amp_sum

        remaining, end, amp_sum = jax.lax.cond(
            sufficient, window_branch, full_branch, (remaining, valid)
        )
        keep = valid & (end - t0 > min_note_len)
        amplitude = amp_sum / jnp.maximum(end - t0, 1).astype(jnp.float32)
        buffers = _emit(buffers, t0, end, freq, amplitude, keep)
        return i + 1, remaining, buffers

    def onset_cond(state):
        i, _, _ = state
        return i < jnp.minimum(n_onsets, k)

    _, remaining, buffers = jax.lax.while_loop(
        onset_cond, onset_body, (jnp.asarray(0, jnp.int32), remaining0, empty)
    )

    if not melodia_trick:
        return _unpack(buffers)

    # ---- stage 2: melodia trick — residual-energy region growing ---------
    # The global argmax is maintained INCREMENTALLY: per-frequency maxima and
    # their first-occurrence times are stored in (F,) vectors, and each
    # iteration only rescans the 3 rows it zeroed — ~600 KB of HBM traffic
    # per note instead of a full-matrix reduction (~36 MB), while still
    # reproducing np.argmax's row-major (t, then f) tie-breaking.

    def row_stats(rows):
        rmax = jnp.max(rows, axis=1)
        tfirst = jnp.argmax(rows == rmax[:, None], axis=1).astype(jnp.int32)
        return rmax, tfirst

    def melodia_cond(state):
        it, _, rowmax, _, _ = state
        return (jnp.max(rowmax) > frame_thresh) & (it < max_melodia_iters)

    def _apply_note(remaining, freq, t_mid):
        """Scan both directions from the seed, zero the claimed region, and
        return (remaining', i_start, i_end) — windowed with an
        exact full-length fallback."""

        def full_branch(rem):
            col = jax.lax.dynamic_slice(rem, (freq, 0), (1, n_frames))[0]
            col = jnp.where(pos == t_mid, 0.0, col)
            fwd_end, fwd_final, _ = _forward_scan(col, t_mid, frame_thresh, energy_tol, t_end)
            bwd_start, bwd_final, _ = _backward_scan(col, t_mid, frame_thresh, energy_tol)
            visited = ((pos >= bwd_final + 1) & (pos < t_mid)) | (
                (pos >= t_mid + 1) & (pos < fwd_final)
            )
            center = visited | (pos == t_mid)
            rem = _zero_rows(rem, freq, center, visited)
            return rem, bwd_start, fwd_end - 1

        if not windowed:
            return full_branch(remaining)

        wstart = jnp.clip(t_mid - W // 2, 0, n_frames - W)
        t_mid_r = t_mid - wstart
        col_w = jax.lax.dynamic_slice(remaining, (freq, wstart), (1, W))[0]
        col_w = jnp.where(pos_w == t_mid_r, 0.0, col_w)
        fwd_end_r, fwd_final_r, ffound = _forward_scan(
            col_w, t_mid_r, frame_thresh, energy_tol, t_end - wstart
        )
        bwd_start_r, bwd_final_r, bfound = _backward_scan(
            col_w, t_mid_r, frame_thresh, energy_tol
        )
        sufficient = (ffound | (t_end - wstart <= W)) & (bfound | (wstart == 0))

        def window_branch(rem):
            visited = ((pos_w >= bwd_final_r + 1) & (pos_w < t_mid_r)) | (
                (pos_w >= t_mid_r + 1) & (pos_w < fwd_final_r)
            )
            center = visited | (pos_w == t_mid_r)
            rem = _zero_rows_window(rem, freq, wstart, center, visited)
            return rem, wstart + bwd_start_r, wstart + fwd_end_r - 1

        return jax.lax.cond(sufficient, window_branch, full_branch, remaining)

    def _refresh_stats(remaining, freq):
        """Recompute row max + first-occurrence time for the 3 touched rows.

        One contiguous (3, T) slice + reductions (~650 KB of HBM traffic).
        A finer block-maxima scheme that rescanned only the zeroed slab was
        measured at the same speed — the loop is per-iteration-latency-bound
        in `_apply_note`'s scans, not here — so the simpler exact form stays.
        """
        row0 = jnp.clip(freq - 1, 0, F - 3)
        rows = jax.lax.dynamic_slice(remaining, (row0, 0), (3, n_frames))
        rmax3, tfirst3 = row_stats(rows)
        return rmax3, tfirst3, row0

    def melodia_body(state):
        it, remaining, rowmax, t_first, buffers = state
        peak = jnp.max(rowmax)
        # np.argmax((T, F)) tie order: smallest t, then smallest f
        key = jnp.where(rowmax == peak, t_first * F + jnp.arange(F, dtype=jnp.int32), jnp.iinfo(jnp.int32).max)
        first = jnp.min(key)
        t_mid = first // F
        freq = first % F

        remaining, i_start, i_end = _apply_note(remaining, freq, t_mid)
        rmax3, tfirst3, row0 = _refresh_stats(remaining, freq)
        rowmax = jax.lax.dynamic_update_slice(rowmax, rmax3, (row0,))
        t_first = jax.lax.dynamic_update_slice(t_first, tfirst3, (row0,))

        keep = (i_end - i_start) > min_note_len
        span = jnp.maximum(i_end - i_start, 1).astype(jnp.float32)
        if windowed:
            astart = jnp.clip(i_start, 0, n_frames - W)
            frames_w = jax.lax.dynamic_slice(frames_ft, (freq, astart), (1, W))[0]
            in_note = (pos_w + astart >= i_start) & (pos_w + astart < i_end)
            amp_sum_w = jnp.sum(jnp.where(in_note, frames_w, 0.0))

            def amp_full(_):
                frames_col = jax.lax.dynamic_slice(frames_ft, (freq, 0), (1, n_frames))[0]
                return jnp.sum(jnp.where((pos >= i_start) & (pos < i_end), frames_col, 0.0))

            amp_sum = jax.lax.cond(
                i_end - i_start <= W, lambda _: amp_sum_w, amp_full, None
            )
        else:
            frames_col = jax.lax.dynamic_slice(frames_ft, (freq, 0), (1, n_frames))[0]
            amp_sum = jnp.sum(jnp.where((pos >= i_start) & (pos < i_end), frames_col, 0.0))
        amplitude = amp_sum / span

        buffers = _emit(buffers, i_start, i_end, freq, amplitude, keep)
        return it + 1, remaining, rowmax, t_first, buffers

    rowmax0, t_first0 = row_stats(remaining)

    it, remaining, rowmax, _, buffers = jax.lax.while_loop(
        melodia_cond,
        melodia_body,
        (jnp.asarray(0, jnp.int32), remaining, rowmax0, t_first0, buffers),
    )
    melodia_truncated = (it >= max_melodia_iters) & (jnp.max(rowmax) > frame_thresh)
    return _unpack(buffers._replace(overflow=buffers.overflow | melodia_truncated))


# ---------------------------------------------------------------------------
# pitch bends
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=1)
def _bend_tables() -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Static gather tables for all 88 possible note pitches.

    Returns (indices (88, 51) into the contour bins, validity (88, 51),
    gaussian (51,))."""
    centers = np.round(
        [host_decode.midi_pitch_to_contour_bin(p + host_decode.MIDI_PITCH_OFFSET) for p in range(F)]
    ).astype(np.int32)
    offsets = np.arange(BEND_WINDOW) - N_BEND_TOLERANCE
    idx = centers[:, None] + offsets[None, :]
    valid = (idx >= 0) & (idx < constants.N_FREQ_BINS_CONTOURS)
    gaussian = np.exp(-0.5 * ((np.arange(BEND_WINDOW) - N_BEND_TOLERANCE) / 5.0) ** 2)
    return np.clip(idx, 0, constants.N_FREQ_BINS_CONTOURS - 1), valid, gaussian.astype(np.float32)


BEND_INLINE_FRAMES = 256  # per-note bend frames shipped in the compact buffer


def gather_note_bends(bends_all: jnp.ndarray, decoded: DecodedNotes) -> jnp.ndarray:
    """(T, 88) bend matrix -> per-note (max_notes, BEND_INLINE_FRAMES) int8.

    Only the first `n_notes` rows are meaningful; notes longer than
    BEND_INLINE_FRAMES fall back to slicing `bends_all` host-side (rare).
    Shrinks the device->host bend traffic from O(T * 88) to O(notes * 256).

    Implemented as a fori_loop of dynamic slices bounded by the REAL note
    count — a dense (max_notes, 256) gather measured ~3.6 s on TPU (int8
    gathers scalarize), while this loop is linear in actual notes.
    """
    max_notes = decoded.starts.shape[0]
    padded = jnp.pad(bends_all, ((0, BEND_INLINE_FRAMES), (0, 0)))
    buf = jnp.zeros((max_notes, BEND_INLINE_FRAMES), jnp.int8)

    def body(i, acc):
        start = decoded.starts[i]
        pitch = jnp.clip(decoded.pitches[i] - host_decode.MIDI_PITCH_OFFSET, 0, F - 1)
        row = jax.lax.dynamic_slice(padded, (start, pitch), (BEND_INLINE_FRAMES, 1))
        return jax.lax.dynamic_update_slice(acc, row.T, (i, 0))

    return jax.lax.fori_loop(0, decoded.n_notes, body, buf)


def bend_matrix(contours: jnp.ndarray) -> jnp.ndarray:
    """(T, 264) contours -> (T, 88) int8 per-frame bend for every pitch.

    bend[t, p] = argmax_j(contours[t, window_p] * gaussian) - 25, in
    1/3-semitone units — the dense form of `get_pitch_bends`
    (`note_creation.py:182-220`); the host slices [start:end, pitch] per note.
    """
    idx, valid, gaussian = _bend_tables()
    windows = contours[:, jnp.asarray(idx)]  # (T, 88, 51)
    weighted = jnp.where(jnp.asarray(valid)[None], windows * jnp.asarray(gaussian), -1.0)
    return (jnp.argmax(weighted, axis=-1) - N_BEND_TOLERANCE).astype(jnp.int8)


# ---------------------------------------------------------------------------
# host-facing wrapper
# ---------------------------------------------------------------------------


def notes_to_events(
    decoded: DecodedNotes, bends: Optional[np.ndarray]
) -> "list[tuple]":
    """Device buffers -> the host event-tuple format (frame domain)."""
    # one batched fetch: per-field np.asarray would pay a full device round
    # trip per buffer when `decoded` is still device-resident (free when the
    # caller already fetched it, as pipeline._collect does)
    decoded = jax.device_get(decoded)
    n = int(decoded.n_notes)
    starts = np.asarray(decoded.starts[:n]).tolist()
    ends = np.asarray(decoded.ends[:n]).tolist()
    pitches = np.asarray(decoded.pitches[:n]).tolist()
    amps = np.asarray(decoded.amplitudes[:n]).astype(np.float64).tolist()
    if bends is None:
        return [(s, e, p, a, None) for s, e, p, a in zip(starts, ends, pitches, amps)]
    bends64 = bends.astype(np.int64)
    return [
        (s, e, p, a, list(bends64[s:e, p - host_decode.MIDI_PITCH_OFFSET]))
        for s, e, p, a in zip(starts, ends, pitches, amps)
    ]


def notes_to_events_packed(
    decoded: DecodedNotes,
    bends_inline: np.ndarray,
    bends_all_device: jnp.ndarray,
) -> "list[tuple]":
    """Like `notes_to_events` but from the compact per-note bend buffer.

    `bends_inline` is the host copy of `gather_note_bends`' output; notes
    longer than BEND_INLINE_FRAMES pull their full row from the
    device-resident matrix (one tiny transfer per long note).
    """
    decoded = jax.device_get(decoded)  # one fetch, free if already on host
    n = int(decoded.n_notes)
    starts = np.asarray(decoded.starts[:n]).tolist()
    ends = np.asarray(decoded.ends[:n]).tolist()
    pitches = np.asarray(decoded.pitches[:n]).tolist()
    amps = np.asarray(decoded.amplitudes[:n]).astype(np.float64).tolist()
    inline64 = bends_inline[:n].astype(np.int64)
    # notes longer than the inline buffer pull their full bend column from
    # the device matrix — batched into ONE device gather + transfer (an
    # eager slice per note costs a full tunnel round trip each)
    long_cols = {}
    long_idx = [
        i for i, (s, e) in enumerate(zip(starts, ends)) if e - s > BEND_INLINE_FRAMES
    ]
    if long_idx:
        cols = np.unique(
            [pitches[i] - host_decode.MIDI_PITCH_OFFSET for i in long_idx]
        )
        fetched = np.asarray(jax.device_get(bends_all_device[:, cols])).astype(np.int64)
        long_cols = {int(c): fetched[:, j] for j, c in enumerate(cols)}
    events = []
    for i, (s, e, p, a) in enumerate(zip(starts, ends, pitches, amps)):
        length = e - s
        if length <= BEND_INLINE_FRAMES:
            bend = list(inline64[i, :length])
        else:
            bend = list(long_cols[p - host_decode.MIDI_PITCH_OFFSET][s:e])
        events.append((s, e, p, a, bend))
    return events
