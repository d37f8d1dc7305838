"""Pallas TPU kernel for the sequential note-decode loops.

The XLA `lax.while_loop` decoder (`decode/device.py`) is per-iteration
latency-bound: ~36 us per onset note and ~270 us per melodia note of pure
op-scheduling overhead (DESIGN.md §4). This kernel runs BOTH greedy stages
inside one `pallas_call`, where each iteration is a handful of DMAs and VPU
ops on VMEM-resident slabs — the per-note cost drops toward the hardware
floor.

Exactness contract: the scan mathematics (`_forward_scan`/`_backward_scan`
run-length formulas), emission order, zeroing regions, amplitude sums, and
tie-breaking are formula-identical to `decode/device.py`, which is itself
fuzz-pinned to the host oracle and the reference decoder
(`/root/reference/basic_pitch/note_creation.py:360-509`). The kernel is
fuzz-tested against the XLA decoder in `tests/test_pallas_decode.py`.

Layout notes (see /opt/skills/guides/pallas_guide.md):
  * `remaining` (F_PAD=96, T) f32 stays in HBM/ANY (19 MB for 10 min of
    audio, exceeding VMEM); per note the kernel DMAs 16-row slabs in, scans,
    zeroes, and DMAs them back. F is padded to 96 rows so the +/-1-row
    zeroing slab of the top frequency stays in bounds.
  * run-length scans use log-doubling max/min over lanes (`pltpu.roll`
    with iota masks) — a (1, SLAB) cummax in 10 steps. Scans longer than
    one slab carry their run-length state slab-to-slab (the cummax/cummin
    algebra is associative), so NO scratch scales with the timeline and the
    kernel serves hour-scale recordings.
  * melodia's global argmax is maintained via per-(row, slab-block) maxima
    and first-occurrence times in VMEM ((96, T/SLAB) tables, ~250 KB/hour):
    each zeroing pass refreshes the touched blocks from the slab it already
    holds, and the per-row aggregates reduce over the tables without
    touching HBM — the analogue of the XLA decoder's incremental
    `_refresh_stats` (device.py:468-479) at constant VMEM.
  * the onset candidate order (k ~ n_frames ids at hour scale) lives in
    HBM/ANY and is DMA-staged 128 lanes at a time.
  * notes are emitted field-per-row into a (8, max_notes) int32 VMEM
    buffer [start; end; midi pitch; bitcast(amp); ...pad] — lane-major so
    the tile padding stays small.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from basic_pitch_tpu import constants
from basic_pitch_tpu.decode import notes as host_decode

F = constants.N_FREQ_BINS_NOTES  # 88
F_PAD = 96  # 88 rounded up so row slabs (freq-1 .. freq+2) never clip
SLAB = 1024  # scan window, frames (= device.SCAN_WINDOW)
NEG = -3.4e38  # python literals: jnp constants would be captured tracers
INT_MAX = 2**31 - 1


def _lane_iota(n: int) -> jnp.ndarray:
    return jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)


def _row_iota16() -> jnp.ndarray:
    return jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)


def _cummax_lanes(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cummax along lanes of a (1, n) int32 array (log-doubling)."""
    n = x.shape[1]
    shift = 1
    while shift < n:
        rolled = pltpu.roll(x, shift, axis=1)
        x = jnp.maximum(x, jnp.where(_lane_iota(n) >= shift, rolled, -INT_MAX))
        shift *= 2
    return x


def _cummin_rev_lanes(x: jnp.ndarray) -> jnp.ndarray:
    """Reverse (suffix) cummin along lanes of a (1, n) int32 array."""
    n = x.shape[1]
    shift = 1
    while shift < n:
        # left-roll by `shift` == right-roll by n - shift (roll must be >= 0)
        rolled = pltpu.roll(x, n - shift, axis=1)
        x = jnp.minimum(x, jnp.where(_lane_iota(n) < n - shift, rolled, INT_MAX))
        shift *= 2
    return x


def _decode_kernel(
    # scalar-prefetch
    iparams_ref,  # SMEM (6,): n_onsets, t_end, min_note_len, energy_tol, max_melodia_iters, melodia_on
    fparams_ref,  # SMEM (1,): frame_thresh
    # inputs
    order_hbm,  # ANY (8, k_pad) int32 — row 0 holds flat onset ids (-1 pad)
    frames_hbm,  # ANY (F_PAD, T) f32 original frames (rows 88.. zero)
    # outputs
    notes_ref,  # VMEM (8, max_notes) int32: rows start/end/pitch/amp-bits
    meta_ref,  # SMEM (4,) int32: n_notes, overflow, melodia_iters, unused
    remaining,  # ANY (F_PAD, T) f32 — the mutable residual-energy matrix
    # scratch
    slab,  # VMEM (16, SLAB) f32 — 8-aligned band containing freq-1..freq+1
    fslab,  # VMEM (16, SLAB) f32 — frames slab for amplitudes
    order_slab,  # VMEM (8, 128) i32 — staged onset-order block
    sem,  # DMA semaphores (4,)
    rowmax_ref,  # VMEM (8, 128) f32 melodia row maxima (sublane 0, lanes 0..F)
    tfirst_ref,  # VMEM (8, 128) i32
    bmax_ref,  # VMEM (96, NB_PAD) f32 — per-(row, block) max of `remaining`
    btf_ref,  # VMEM (96, NB_PAD) i32 — first abs position achieving block max
):
    T = frames_hbm.shape[1]
    slab_w = slab.shape[1]  # min(SLAB, T): small inputs degenerate to full rows
    nb_total = T // slab_w  # T is always a multiple of slab_w
    nb_pad = bmax_ref.shape[1]
    max_notes = notes_ref.shape[1]
    n_onsets = iparams_ref[0]
    t_end = iparams_ref[1]
    min_note_len = iparams_ref[2]
    energy_tol = iparams_ref[3]
    max_melodia_iters = iparams_ref[4]
    melodia_on = iparams_ref[5]
    frame_thresh = fparams_ref[0]

    pos_s = _lane_iota(slab_w)

    meta_ref[0] = 0  # n_notes
    meta_ref[1] = 0  # overflow
    meta_ref[2] = 0  # melodia iterations

    # the residual matrix starts as a copy of the frames (HBM -> HBM DMA)
    init_copy = pltpu.make_async_copy(frames_hbm, remaining, sem.at[3])
    init_copy.start()
    init_copy.wait()

    def dma_in(dst, src_hbm, row0, col0, width, slot):
        copy = pltpu.make_async_copy(
            src_hbm.at[pl.ds(row0, dst.shape[0]), pl.ds(col0, width)],
            dst.at[:, pl.ds(0, width)],
            sem.at[slot],
        )
        copy.start()
        copy.wait()

    def dma_out(src, dst_hbm, row0, col0, width, slot):
        copy = pltpu.make_async_copy(
            src.at[:, pl.ds(0, width)],
            dst_hbm.at[pl.ds(row0, src.shape[0]), pl.ds(col0, width)],
            sem.at[slot],
        )
        copy.start()
        copy.wait()

    def pick_row(buf4, center):
        """Select row `center` (0..15) of a (16, n) buffer as (1, n)."""
        return jnp.where(_row_iota16() == center, buf4, 0.0).sum(axis=0, keepdims=True)

    def emit(start, end, pitch, amplitude, keep):
        slot = meta_ref[0]
        fits = slot < max_notes
        write = keep & fits

        @pl.when(write)
        def _():
            # one (4, 1) vector store per note (scalar VMEM stores are
            # rejected by Mosaic)
            # scalar bitcast is rejected by Mosaic; bitcast a (1, 1) vector
            amp_bits = jax.lax.bitcast_convert_type(
                jnp.full((1, 1), amplitude, jnp.float32), jnp.int32
            )[0, 0]
            column = jnp.stack(
                [start, end, pitch + host_decode.MIDI_PITCH_OFFSET, amp_bits,
                 0, 0, 0, 0]
            ).reshape(8, 1)
            # lane-dim stores must be 128-aligned: read-modify-write the
            # aligned block containing this slot
            blk = pl.multiple_of((slot // 128) * 128, 128)
            cur = notes_ref[pl.ds(0, 8), pl.ds(blk, 128)]
            sel = _lane_iota(128) == slot % 128
            notes_ref[pl.ds(0, 8), pl.ds(blk, 128)] = jnp.where(sel, column, cur)
            meta_ref[0] = slot + 1

        @pl.when(keep & jnp.logical_not(fits))
        def _():
            meta_ref[1] = 1

    # ---------------- stage 1: onset notes ----------------
    def onset_body(i, _):
        # the order buffer lives in HBM (k ~ n_frames ids at hour scale blows
        # VMEM); DMA the 128-lane block containing element i and mask-extract
        # the scalar. Sequential consumption means each block is fetched ~128
        # times — a (8, 128) i32 DMA is ~1-2 us against the ~30 us iteration.
        blk_start = pl.multiple_of((i // 128) * 128, 128)
        dma_in(order_slab, order_hbm, 0, blk_start, 128, 3)
        blk = order_slab[pl.ds(0, 1), :]
        flat = jnp.sum(jnp.where(_lane_iota(128) == i % 128, blk, 0))
        t0 = flat // F
        freq = flat % F
        valid = (flat >= 0) & (t0 < t_end - 1)
        row0 = pl.multiple_of(jnp.clip(((freq - 1) // 8) * 8, 0, F_PAD - 16), 8)
        center = freq - row0
        row_ids = _row_iota16() + row0
        row_is_target = (jnp.abs(row_ids - freq) <= 1) & (row_ids < F)

        # --- forward scan: slab loop with carried run-length state ---
        # T is a multiple of slab_w, so slabs tile the timeline exactly; the
        # cummax run-length algebra is associative, making the slab-by-slab
        # walk EXACT. Every vector op below is unconditional — Mosaic
        # predicates lax.cond branches by executing both, so a full-length
        # fallback branch would run for every note (measured 15x slower).
        s0_first = pl.multiple_of(jnp.clip((t0 // slab_w) * slab_w, 0, T - slab_w), 128)

        def scan_cond(state):
            s0, _, _, t_stop = state
            return (t_stop == INT_MAX) & (s0 <= t_end - 2) & (s0 < T)

        def scan_body(state):
            s0, la_in, la_tail_in, _ = state
            s0 = pl.multiple_of(s0, 128)
            dma_in(slab, remaining, row0, s0, slab_w, 0)
            col = pick_row(slab[:, :], center)
            pos_abs = pos_s + s0
            above = (col >= frame_thresh) | (pos_abs <= t0)
            la_vec = jnp.maximum(
                _cummax_lanes(jnp.where(above, pos_abs, -1)), la_in
            )
            consec = pos_abs - la_vec
            in_range = (consec >= energy_tol) & (pos_abs >= t0 + 1) & (
                pos_abs <= t_end - 2
            )
            t_stop = jnp.min(jnp.where(in_range, pos_abs, INT_MAX))
            la_out = jnp.max(la_vec)  # la at slab end (nondecreasing)
            tail = t_end - 2
            la_tail = jnp.sum(jnp.where(pos_abs == tail, la_vec, 0))
            has_tail = (tail >= s0) & (tail < s0 + slab_w)
            la_tail_out = jnp.where(has_tail, la_tail, la_tail_in)
            return s0 + slab_w, la_out, la_tail_out, t_stop

        _, _, la_tail, t_stop = jax.lax.while_loop(
            scan_cond, scan_body, (s0_first, jnp.int32(-1), jnp.int32(-1), INT_MAX)
        )
        found = t_stop < INT_MAX
        k_nostop = jnp.where(t_end - 2 >= t0 + 1, (t_end - 2) - la_tail, 0)
        i_final = jnp.where(found, t_stop + 1, jnp.maximum(t0 + 1, t_end - 1))
        k_final = jnp.where(found, energy_tol, k_nostop)
        end = i_final - k_final
        keep = valid & (end - t0 > min_note_len)

        # --- zero [t0, end) on rows freq±1 + amplitude sum, slab by slab ---
        def za_cond(state):
            s0, _ = state
            return s0 < end

        def za_body(state):
            s0, amp = state
            s0 = pl.multiple_of(s0, 128)
            dma_in(slab, remaining, row0, s0, slab_w, 0)
            dma_in(fslab, frames_hbm, row0, s0, slab_w, 2)
            pos_abs = pos_s + s0
            in_note = (pos_abs >= t0) & (pos_abs < end)
            slab[:, :] = jnp.where(row_is_target & in_note, 0.0, slab[:, :])
            dma_out(slab, remaining, row0, s0, slab_w, 1)
            amp = amp + jnp.sum(
                jnp.where(in_note, pick_row(fslab[:, :], center), 0.0)
            )
            return s0 + slab_w, amp

        z0 = jnp.where(keep, s0_first, end)  # skip entirely when not kept
        _, amp_sum = jax.lax.while_loop(za_cond, za_body, (z0, jnp.float32(0.0)))

        amplitude = amp_sum / jnp.maximum(end - t0, 1).astype(jnp.float32)
        emit(t0, end, freq, amplitude, keep)
        return 0

    jax.lax.fori_loop(0, n_onsets, onset_body, 0)

    # ---------------- stage 2: melodia ----------------
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    live = (sub == 0) & (lane < F)
    blane = jax.lax.broadcasted_iota(jnp.int32, (16, nb_pad), 1)

    def update_block_stats(row0, nb):
        """Refresh bmax/btf for the 16-row band at `row0`, block `nb`, from
        the (freshly written) slab currently in VMEM. Rows the zeroing didn't
        touch recompute to their stored values — harmless."""
        rmax = jnp.max(slab[:, :], axis=1, keepdims=True)  # (16, 1)
        pos_abs = pos_s + nb * slab_w
        tfb = jnp.min(
            jnp.where(
                slab[:, :] == rmax, jnp.broadcast_to(pos_abs, slab.shape), INT_MAX
            ),
            axis=1,
            keepdims=True,
        ).astype(jnp.int32)
        blk = pl.multiple_of((nb // 128) * 128, 128)
        sel = _lane_iota(128) == nb % 128
        cur_b = bmax_ref[pl.ds(row0, 16), pl.ds(blk, 128)]
        bmax_ref[pl.ds(row0, 16), pl.ds(blk, 128)] = jnp.where(sel, rmax, cur_b)
        cur_t = btf_ref[pl.ds(row0, 16), pl.ds(blk, 128)]
        btf_ref[pl.ds(row0, 16), pl.ds(blk, 128)] = jnp.where(sel, tfb, cur_t)

    def refresh_band(row0):
        """Rowmax/tfirst lanes [row0, row0+16) from the block tables — pure
        VMEM reduces, no HBM traffic. tfirst = the first position achieving
        the row max: the first block whose block max equals it holds that
        position as its block tfirst (blocks are in time order)."""
        bb = bmax_ref[pl.ds(row0, 16), :]  # (16, NB_PAD)
        m = jnp.max(bb, axis=1, keepdims=True)  # (16, 1)
        bfirst = jnp.min(jnp.where(bb == m, blane, INT_MAX), axis=1, keepdims=True)
        tb = btf_ref[pl.ds(row0, 16), :]
        tfirst = jnp.min(
            jnp.where(blane == bfirst, tb, INT_MAX), axis=1, keepdims=True
        )
        for j in range(16):
            sel = live & (lane == row0 + j) & (row0 + j < F)
            rowmax_ref[:, :] = jnp.where(sel, m[j, 0], rowmax_ref[:, :])
            tfirst_ref[:, :] = jnp.where(sel, tfirst[j, 0], tfirst_ref[:, :])

    @pl.when(melodia_on > 0)
    def _():
        rowmax_ref[:, :] = jnp.full((8, 128), NEG, jnp.float32)
        tfirst_ref[:, :] = jnp.zeros((8, 128), jnp.int32)
        # padding block lanes must never win a reduce
        bmax_ref[:, :] = jnp.full((F_PAD, nb_pad), NEG, jnp.float32)
        btf_ref[:, :] = jnp.full((F_PAD, nb_pad), INT_MAX, jnp.int32)

        # build the block tables + per-row aggregates, band by band
        def init_band(band, _):
            row0 = pl.multiple_of(band * 16, 8)

            def init_blk(nb, _):
                dma_in(slab, remaining, row0, nb * slab_w, slab_w, 0)
                update_block_stats(row0, nb)
                return 0

            jax.lax.fori_loop(0, nb_total, init_blk, 0)
            refresh_band(row0)
            return 0

        jax.lax.fori_loop(0, F_PAD // 16, init_band, 0)

        def melodia_cond(it):
            peak = jnp.max(rowmax_ref[:, :])
            return (peak > frame_thresh) & (it < max_melodia_iters)

        def melodia_body(it):
            # np.argmax((T, F)) tie order: smallest t, then smallest f
            peak = jnp.max(rowmax_ref[:, :])
            key = jnp.where(
                (rowmax_ref[:, :] == peak) & live,
                tfirst_ref[:, :] * F + lane,
                INT_MAX,
            )
            first = jnp.min(key)
            t_mid = first // F
            freq = first % F
            row0 = pl.multiple_of(jnp.clip(((freq - 1) // 8) * 8, 0, F_PAD - 16), 8)
            center = freq - row0
            row_ids = _row_iota16() + row0
            is_center_row = row_ids == freq
            is_neighbor = (jnp.abs(row_ids - freq) == 1) & (row_ids < F)
            # NOTE: device.decode zeroes col[t_mid] before its scans; that is
            # a no-op for the run-length algebra (both scans' `above` terms
            # already include t_mid positionally), so the slab loops skip it.

            # --- forward scan from t_mid: slab loop, carried run lengths
            # (same associative cummax algebra as the onset stage) ---
            s0_first = pl.multiple_of(
                jnp.clip((t_mid // slab_w) * slab_w, 0, T - slab_w), 128
            )

            def fcond(state):
                s0, _, _, t_stop = state
                return (t_stop == INT_MAX) & (s0 <= t_end - 2) & (s0 < T)

            def fbody(state):
                s0, la_in, la_tail_in, _ = state
                s0 = pl.multiple_of(s0, 128)
                dma_in(slab, remaining, row0, s0, slab_w, 0)
                col = pick_row(slab[:, :], center)
                pos_abs = pos_s + s0
                above = (col >= frame_thresh) | (pos_abs <= t_mid)
                la_vec = jnp.maximum(
                    _cummax_lanes(jnp.where(above, pos_abs, -1)), la_in
                )
                consec = pos_abs - la_vec
                in_range = (consec >= energy_tol) & (pos_abs >= t_mid + 1) & (
                    pos_abs <= t_end - 2
                )
                t_stop = jnp.min(jnp.where(in_range, pos_abs, INT_MAX))
                la_out = jnp.max(la_vec)
                tail = t_end - 2
                la_tail = jnp.sum(jnp.where(pos_abs == tail, la_vec, 0))
                has_tail = (tail >= s0) & (tail < s0 + slab_w)
                la_tail_out = jnp.where(has_tail, la_tail, la_tail_in)
                return s0 + slab_w, la_out, la_tail_out, t_stop

            _, _, la_tail, t_stop = jax.lax.while_loop(
                fcond, fbody, (s0_first, jnp.int32(-1), jnp.int32(-1), INT_MAX)
            )
            ffound = t_stop < INT_MAX
            fk_nostop = jnp.where(t_end - 2 >= t_mid + 1, (t_end - 2) - la_tail, 0)
            fwd_final = jnp.where(
                ffound, t_stop + 1, jnp.maximum(t_mid + 1, t_end - 1)
            )
            fwd_end = fwd_final - jnp.where(ffound, energy_tol, fk_nostop)

            # --- backward scan from t_mid: slab loop high to low, carried
            # suffix cummin (next-above position) ---
            def bcond(state):
                s0, _, _, t_stop = state
                return (t_stop < 0) & (s0 >= 0)

            def bbody(state):
                s0, na_in, c1_in, _ = state
                s0 = pl.multiple_of(s0, 128)
                dma_in(slab, remaining, row0, s0, slab_w, 0)
                col = pick_row(slab[:, :], center)
                pos_abs = pos_s + s0
                above = (col >= frame_thresh) | (pos_abs >= t_mid)
                na_vec = jnp.minimum(
                    _cummin_rev_lanes(jnp.where(above, pos_abs, INT_MAX)), na_in
                )
                consec = na_vec - pos_abs
                in_range = (consec >= energy_tol) & (pos_abs <= t_mid - 1) & (
                    pos_abs >= 1
                )
                t_stop = jnp.max(jnp.where(in_range, pos_abs, -1))
                na_out = jnp.min(na_vec)
                c1 = jnp.sum(jnp.where(pos_abs == 1, consec, 0))
                c1_out = jnp.where(s0 == 0, c1, c1_in)
                return s0 - slab_w, na_out, c1_out, t_stop

            _, _, c1_final, bt_stop = jax.lax.while_loop(
                bcond, bbody, (s0_first, INT_MAX, jnp.int32(0), jnp.int32(-1))
            )
            bfound = bt_stop >= 0
            bk_nostop = jnp.where(t_mid - 1 >= 1, c1_final, 0)
            bwd_final = jnp.where(bfound, bt_stop - 1, jnp.minimum(t_mid - 1, 0))
            bwd_start = bwd_final + 1 + jnp.where(bfound, energy_tol, bk_nostop)

            i_start, i_end = bwd_start, fwd_end - 1
            lo, hi = bwd_final + 1, fwd_final  # zero region; contains t_mid

            # --- zero the claimed region slab by slab, refreshing the block
            # tables from each post-zero slab while it is still in VMEM ---
            def zcond(s0):
                return s0 < hi

            def zbody(s0):
                s0 = pl.multiple_of(s0, 128)
                dma_in(slab, remaining, row0, s0, slab_w, 0)
                pos_abs = pos_s + s0
                visited = ((pos_abs >= lo) & (pos_abs < t_mid)) | (
                    (pos_abs >= t_mid + 1) & (pos_abs < hi)
                )
                center_mask = visited | (pos_abs == t_mid)
                # boolean algebra instead of a bool-typed where (Mosaic
                # rejects i1 selects with mixed broadcast shapes)
                mask = (is_center_row & center_mask) | (is_neighbor & visited)
                slab[:, :] = jnp.where(mask, 0.0, slab[:, :])
                dma_out(slab, remaining, row0, s0, slab_w, 1)
                update_block_stats(row0, s0 // slab_w)
                return s0 + slab_w

            z0 = pl.multiple_of(
                jnp.clip((lo // slab_w) * slab_w, 0, T - slab_w), 128
            )
            jax.lax.while_loop(zcond, zbody, z0)
            refresh_band(row0)

            # --- amplitude over [i_start, i_end) from the ORIGINAL frames ---
            keep = (i_end - i_start) > min_note_len
            span = jnp.maximum(i_end - i_start, 1).astype(jnp.float32)

            def acond(state):
                s0, _ = state
                return s0 < i_end

            def abody(state):
                s0, amp = state
                s0 = pl.multiple_of(s0, 128)
                dma_in(fslab, frames_hbm, row0, s0, slab_w, 2)
                pos_abs = pos_s + s0
                in_note = (pos_abs >= i_start) & (pos_abs < i_end)
                amp = amp + jnp.sum(
                    jnp.where(in_note, pick_row(fslab[:, :], center), 0.0)
                )
                return s0 + slab_w, amp

            a0 = pl.multiple_of(
                jnp.clip((i_start // slab_w) * slab_w, 0, T - slab_w), 128
            )
            a0 = jnp.where(keep, a0, i_end)  # skip entirely when not kept
            _, amp_sum = jax.lax.while_loop(acond, abody, (a0, jnp.float32(0.0)))

            emit(i_start, i_end, freq, amp_sum / span, keep)
            return it + 1

        it = jax.lax.while_loop(melodia_cond, melodia_body, jnp.int32(0))
        meta_ref[2] = it
        truncated = (it >= max_melodia_iters) & (
            jnp.max(rowmax_ref[:, :]) > frame_thresh
        )

        @pl.when(truncated)
        def _():
            meta_ref[1] = 1


@functools.partial(
    jax.jit,
    static_argnames=("max_notes", "max_melodia_iters", "melodia_trick", "interpret"),
)
def pallas_greedy_stages(
    frames_ft: jnp.ndarray,  # (F, T) f32 original frames, transposed
    onset_order: jnp.ndarray,  # (max_notes,) int32 flat ids, -1 padded
    n_onsets: jnp.ndarray,
    t_end: jnp.ndarray,
    frame_thresh: "jnp.ndarray | float",
    min_note_len: "jnp.ndarray | int",
    energy_tol: int,
    max_notes: int,
    max_melodia_iters: int,
    melodia_trick: bool,
    interpret: bool = False,
) -> "tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]":
    """Run both greedy decode stages in one Pallas kernel.

    Returns (packed (max_notes, 4) int32 [start, end, pitch, amp-bits],
    n_notes, overflow) — the XLA decoder's packed layout.
    """
    T = frames_ft.shape[1]
    if T % 128 != 0:
        raise ValueError(f"frame count {T} must be a multiple of 128")
    if onset_order.shape[0] % 128 != 0:
        raise ValueError(
            f"onset_order length {onset_order.shape[0]} must be a multiple of "
            "128 (the kernel reads it in 128-lane aligned blocks)"
        )
    # the kernel's emit path read-modify-writes 128-lane aligned blocks of the
    # note buffer, so its width must be a lane multiple; run with a rounded-up
    # buffer and clamp back to the caller's cap afterwards
    notes_cap = -(-max_notes // 128) * 128
    # slabs must tile the timeline exactly for the carried scans
    if T > SLAB and T % SLAB != 0:
        frames_ft = jnp.pad(frames_ft, ((0, 0), (0, SLAB - T % SLAB)))
        T = frames_ft.shape[1]
    padded = jnp.zeros((F_PAD, T), frames_ft.dtype).at[:F].set(frames_ft)

    iparams = jnp.stack(
        [
            jnp.asarray(n_onsets, jnp.int32),
            jnp.asarray(t_end, jnp.int32),
            jnp.asarray(min_note_len, jnp.int32),
            jnp.asarray(energy_tol, jnp.int32),
            jnp.asarray(max_melodia_iters, jnp.int32),
            jnp.asarray(1 if melodia_trick else 0, jnp.int32),
        ]
    )
    fparams = jnp.asarray([frame_thresh], jnp.float32)
    order8 = jnp.zeros((8, onset_order.shape[0]), jnp.int32).at[0].set(onset_order)

    # block tables: one lane per SLAB-sized block of the timeline (padded to
    # a 128-lane multiple) — the only state that grows with T is ~500 KB/hour
    # of VMEM, so the kernel serves arbitrary recording lengths
    slab_w = min(SLAB, T)
    nb_pad = -(-(T // slab_w) // 128) * 128
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # order (HBM, DMA-staged)
            pl.BlockSpec(memory_space=pl.ANY),  # frames
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # notes
            pl.BlockSpec(memory_space=pltpu.SMEM),  # meta
            pl.BlockSpec(memory_space=pl.ANY),  # remaining (mutable state)
        ],
        scratch_shapes=[
            pltpu.VMEM((16, slab_w), jnp.float32),
            pltpu.VMEM((16, slab_w), jnp.float32),
            pltpu.VMEM((8, 128), jnp.int32),  # staged onset-order block
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.VMEM((8, 128), jnp.int32),
            pltpu.VMEM((F_PAD, nb_pad), jnp.float32),  # block maxima
            pltpu.VMEM((F_PAD, nb_pad), jnp.int32),  # block first-occurrence
        ],
    )

    notes8, meta, _ = pl.pallas_call(
        _decode_kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((8, notes_cap), jnp.int32),
            jax.ShapeDtypeStruct((4,), jnp.int32),
            jax.ShapeDtypeStruct((F_PAD, T), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(iparams, fparams, order8, padded)

    packed = notes8[:4, :max_notes].T  # (max_notes, 4): start, end, pitch, amp
    # the kernel filled the lane-rounded buffer; notes past the caller's cap
    # count as overflow exactly as the XLA decoder's fixed buffer would
    n_notes = jnp.minimum(meta[0], max_notes)
    overflow = (meta[1] > 0) | (meta[0] > max_notes)
    return packed, n_notes, overflow


def decode_pallas(
    frames: jnp.ndarray,
    onsets: jnp.ndarray,
    onset_thresh: "jnp.ndarray | float",
    frame_thresh: "jnp.ndarray | float",
    min_note_len: "jnp.ndarray | int",
    freq_mask: "jnp.ndarray | None" = None,
    infer_onsets: bool = True,
    melodia_trick: bool = True,
    energy_tol: int = host_decode.DEFAULT_ENERGY_TOLERANCE,
    max_notes: int = 4096,
    max_melodia_iters: int = 8192,
    valid_frames: "jnp.ndarray | int | None" = None,
    interpret: bool = False,
) -> "device_decode.DecodedNotes":
    """Drop-in equivalent of `device.decode` running the greedy stages in the
    Pallas kernel. Preprocessing (onset inference, peak picking, emission
    ordering) is the same XLA code as the reference path."""
    from basic_pitch_tpu.decode import device as device_decode

    n_frames = frames.shape[0]
    t_end = n_frames if valid_frames is None else valid_frames
    if valid_frames is not None:
        # zero the padded tail so the in-kernel melodia seed search never
        # sees residual energy past t_end (same guard as device.decode)
        pad_mask = (jnp.arange(n_frames)[:, None] < t_end).astype(frames.dtype)
        frames = frames * pad_mask
        onsets = onsets * pad_mask
    frames, onsets = device_decode.preprocess(frames, onsets, freq_mask, infer_onsets)

    # peak picking + descending-flat-index compaction: the SAME helpers as
    # device.decode (the exactness contract requires one implementation).
    # Candidate capacity scales with recording length exactly like the XLA
    # decoder; the buffer is lane-rounded for the kernel's aligned reads,
    # with truncation still at the logical cap k.
    onset_mask = device_decode.onset_peak_mask(onsets, t_end, onset_thresh)
    k = min(max(max_notes, n_frames), n_frames * F)  # logical cap
    k_pad = -(-k // 128) * 128  # buffer width (aligned kernel block reads)
    onset_order, full_count = device_decode.onset_candidate_order(onset_mask, k, k_pad)
    n_onsets = jnp.minimum(full_count, k)
    onset_overflow = full_count > k

    # pad time to a lane multiple AFTER preprocessing; the padded zeros are
    # beyond t_end, which every scan bound already respects
    frames_ft = frames.T
    if n_frames % 128 != 0:
        frames_ft = jnp.pad(frames_ft, ((0, 0), (0, 128 - n_frames % 128)))

    packed, n_notes, overflow = pallas_greedy_stages(
        frames_ft,
        onset_order,
        n_onsets,
        t_end,
        frame_thresh,
        min_note_len,
        energy_tol,
        max_notes=max_notes,
        max_melodia_iters=max_melodia_iters,
        melodia_trick=melodia_trick,
        interpret=interpret,
    )
    return device_decode.DecodedNotes(
        starts=packed[:, 0],
        ends=packed[:, 1],
        pitches=packed[:, 2],
        amplitudes=jax.lax.bitcast_convert_type(packed[:, 3], jnp.float32),
        n_notes=n_notes,
        overflow=overflow | onset_overflow,
    )
