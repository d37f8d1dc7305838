"""Lossless PCM16 transport codec, decoded ON DEVICE.

The tunneled host->device link is the transcription pipeline's bottleneck
(docs/DESIGN.md §2: ~35 MB/s, so a 600 s recording's 26.5 MB of int16 PCM
costs ~0.75 s — more than the model forward and decode combined). This
module cuts those bytes losslessly: the host packs fixed-predictor
residuals (FLAC-style finite differences, order 1-3 chosen per piece by
exact payload cost) at per-block adaptive bit widths, and a set of small
XLA programs reconstructs the exact int16 samples in HBM. Measured ratios:
~2.2x on polyphonic synthetic piano, ~1.4x on real vocals — a direct
multiplier on link-bound throughput.

Wire format (produced by `native/bp_native.cpp:pack_pcm16_residual` or the
numpy reference `pack_numpy` here):

- 256-sample blocks; one fixed-predictor order (1..3, FLAC-style) chosen
  per PIECE by exact payload cost; each block's first `order` samples ship
  verbatim in `heads` (int16, the integration constants), remaining
  256-order as k-bit two's-complement residuals, k = the smallest width in
  `KSET` that covers the block's residual range (k=19 always suffices).
- Blocks are grouped by k; each group's rows are laid out consecutively
  in one u32 buffer (KSET order, every row 32-bit aligned), so the device
  can unpack each group DENSELY — static column slices and shifts, no
  per-element gather (a gathered variant measured 6x slower on TPU).
- `idx` maps stream rows back to block positions; the unpack programs
  scatter each group's rows into a donated (nb+1, 256-order) buffer (row
  `nb` absorbs padding rows), and a final program integrates `order` times
  (int32 cumsums — exact) and rescales to float32.

Shape discipline (jit cache): row counts per group vary with content, so
each group is padded to a power-of-two row bucket. Padding rows cost no
upload bytes — the device program over-reads neighbouring stream data via
`dynamic_slice` and the garbage rows scatter to the dummy row. Executables
are therefore keyed only by (k, row bucket) and (nb, n_out): a bounded,
content-independent set.

Everything is integer arithmetic; round trips are bit-exact
(tests/test_pcmcodec.py fuzzes against the raw int16 path).
"""

from __future__ import annotations

import ctypes
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

BLOCK = 256
# Descending = stream layout order. 19 bits covers the order-3 residual of
# int16 (|Δ³x| < 2^18); 18 covers Δ², 17 covers Δ¹. Every width is present:
# rounding a block up to a coarser ladder wastes ~8% of payload bits
# (measured vs this dense ladder); per-(k, bucket) executables stay bounded
# because a given recording only populates the handful of widths its
# residual histogram spans.
KSET: Tuple[int, ...] = tuple(range(19, 1, -1))
_MIN_BUCKET = 8
_MERGE_MIN_ROWS = 64  # groups below this merge into the next wider width
_ORDERS = (1, 2, 3)  # FLAC-style fixed-predictor orders; best chosen per piece

# LPC mode: per-block adaptive prediction (FLAC's LPC subframes, where the
# fixed orders above are its "fixed" subframes). Coefficients are quantized
# so sum|c| <= 32767 — that bounds the device's int32 prediction accumulator
# |sum c_j*x[n-j]| < 2^30, making the lax.scan reconstruction exact integer
# arithmetic. The wire is SELF-DESCRIBING (reconstruction uses the shipped
# coefficients), so float analysis differences between the C++ and numpy
# analyzers can change the ratio but never correctness.
LPC_ORDER = 8
_LPC_MAX_SHIFT = 14
# LPC must beat the best fixed order's exact bit cost by this factor to be
# chosen: the scan reconstruction costs more device time than the cumsum
# integration, and near-ties should keep the cheaper decoder (margin
# calibrated against the measured scan cost — DESIGN.md §2f).
_LPC_MARGIN = 0.97


def payload_len(order: int) -> int:
    """Residual samples per block: the first `order` samples ship verbatim."""
    return BLOCK - order


def words_per_block(k: int, order: int) -> int:
    return (payload_len(order) * k + 31) // 32


@dataclass
class PackedPCM:
    """One packed piece: exact-size u32 payload + per-group placement."""

    words: np.ndarray  # (total_words,) uint32, all groups back to back
    groups: List[Tuple[int, int, int, np.ndarray]]  # (k, word_off, n_rows, idx)
    heads: np.ndarray  # (nb, order) int16 — per-block integration constants
    n_samples: int
    nb: int
    order: int = 2  # predictor order: fixed 1..3, or LPC_ORDER in lpc mode
    # lpc mode only: per-block quantized predictor (nb, order) int16 and the
    # per-block coefficient scale (nb,) int8 — absent (None) in fixed mode
    coeffs: Optional[np.ndarray] = None
    shifts: Optional[np.ndarray] = None

    @property
    def mode(self) -> str:
        return "lpc" if self.coeffs is not None else "fixed"

    @property
    def packed_bytes(self) -> int:
        extra = 0
        if self.coeffs is not None:
            extra = self.coeffs.nbytes + self.shifts.nbytes
        return self.words.nbytes + self.heads.nbytes + extra + sum(
            g[3].nbytes for g in self.groups
        )


# --------------------------------------------------------------------------
# host-side packing
# --------------------------------------------------------------------------

_kset_arr = np.asarray(KSET, np.int32)


def _native_choose_order(pcm: np.ndarray) -> Optional[int]:
    from basic_pitch_tpu import native

    lib = native.load()
    if lib is None or not hasattr(lib, "residual_order_costs"):
        return None
    bits = np.empty(3, np.int64)
    lib.residual_order_costs(
        native._as_ptr(pcm), ctypes.c_int64(len(pcm)), native._as_ptr(bits)
    )
    return _ORDERS[int(np.argmin(bits))]


def _signed_widths(residuals: np.ndarray) -> np.ndarray:
    """Per-block minimal signed two's-complement width (min 2 bits)."""
    maxabs = np.abs(residuals).max(axis=1)
    return np.maximum(
        2, np.ceil(np.log2(np.maximum(maxabs, 1) + 1)).astype(np.int64) + 1
    )


def choose_order_numpy(pcm: np.ndarray) -> int:
    """Cheapest fixed-predictor order by exact per-block signed widths."""
    return _ORDERS[int(np.argmin(fixed_costs_numpy(pcm)))]


def _native_pack(pcm: np.ndarray, order: int):
    from basic_pitch_tpu import native

    lib = native.load()
    if lib is None or not hasattr(lib, "pack_pcm16_residual"):
        return None
    nb = len(pcm) // BLOCK
    cap = nb * words_per_block(KSET[0], order) + 4
    words = np.empty(cap, np.uint32)
    idx = np.empty(nb, np.int32)
    heads = np.empty((nb, order), np.int16)
    counts = np.empty(len(KSET), np.int64)
    total = lib.pack_pcm16_residual(
        native._as_ptr(pcm),
        ctypes.c_int64(len(pcm)),
        ctypes.c_int32(order),
        native._as_ptr(_kset_arr),
        ctypes.c_int32(len(KSET)),
        native._as_ptr(words),
        ctypes.c_int64(cap),
        native._as_ptr(idx),
        native._as_ptr(heads),
        native._as_ptr(counts),
    )
    if total < 0:
        return None
    return words, int(total), counts, idx, heads


def pack_numpy(pcm: np.ndarray, order: int) -> "PackedPCM | None":
    """Pure-numpy reference packer (same wire format as the C++ one)."""
    nb = len(pcm) // BLOCK
    x = pcm.astype(np.int32).reshape(nb, BLOCK)
    r = np.diff(x, n=order, axis=1)
    heads = np.ascontiguousarray(x[:, :order].astype(np.int16))
    words, total, counts, idx = _pack_from_residuals(r, order)
    return words, total, counts, idx, heads


def _pack_from_residuals(r: np.ndarray, order: int):
    """Group residual rows by signed width and bit-pack (shared by the fixed
    and LPC numpy packers; mirrors the C++ pack_core layout exactly)."""
    nb = r.shape[0]
    pay = payload_len(order)
    need = _signed_widths(r)
    ks = np.sort(_kset_arr)
    cls_sorted = ks[np.searchsorted(ks, need)]  # smallest KSET width >= need
    order_of = {k: j for j, k in enumerate(KSET)}
    cls = np.asarray([order_of[int(c)] for c in cls_sorted], np.int64)

    counts = np.bincount(cls, minlength=len(KSET)).astype(np.int64)
    # merge sparse groups into the nearest wider POPULATED width (mirrors
    # the C++ packer): tiny groups multiply device-executable variants for
    # ~zero byte savings, but merging only into widths real content already
    # uses keeps short all-sparse pieces from cascading to the widest k.
    for j in range(len(KSET) - 1, 0, -1):
        if 0 < counts[j] < _MERGE_MIN_ROWS:
            populated = np.nonzero(counts[:j] > 0)[0]
            if len(populated) == 0:
                continue  # widest populated group: keep as-is
            dst = int(populated[-1])
            cls[cls == j] = dst
            counts[dst] += counts[j]
            counts[j] = 0
    total = int(sum(counts[j] * words_per_block(KSET[j], order) for j in range(len(KSET))))
    words = np.zeros(total + 4, np.uint32)
    idx = np.empty(nb, np.int32)

    word_off = row_off = 0
    words64 = np.zeros(total + 4, np.uint64)
    for j, k in enumerate(KSET):
        rows = np.nonzero(cls == j)[0]
        if len(rows) == 0:
            continue
        wpb = words_per_block(k, order)
        idx[row_off : row_off + len(rows)] = rows
        vals = (r[rows].astype(np.int64) & ((1 << k) - 1)).astype(np.uint64)
        pos = np.arange(pay, dtype=np.int64) * k
        w = (pos >> 5) + word_off + np.arange(len(rows))[:, None] * wpb
        sh = (pos & 31).astype(np.uint64)
        v64 = vals << sh[None, :]
        np.add.at(words64, w, v64 & 0xFFFFFFFF)
        np.add.at(words64, w + 1, v64 >> np.uint64(32))
        word_off += len(rows) * wpb
        row_off += len(rows)
    words[:] = (words64 & 0xFFFFFFFF).astype(np.uint32)
    return words, total, counts, idx


# --------------------------------------------------------------------------
# LPC analysis (numpy reference; fast path in native/bp_native.cpp)
# --------------------------------------------------------------------------


def _lpc_residuals(x_blocks: np.ndarray, coeffs: np.ndarray, shifts: np.ndarray) -> np.ndarray:
    """Exact integer LPC residuals: r[n] = x[n] - ((sum_j c_j*x[n-j]) >> s).

    Encoder prediction runs on the ORIGINAL samples; the decoder's recurrence
    on reconstructed samples sees identical values because the codec is
    lossless — so encode and decode agree bit-for-bit by construction.
    """
    p = coeffs.shape[1]
    x64 = x_blocks.astype(np.int64)
    acc = np.zeros((x_blocks.shape[0], BLOCK - p), np.int64)
    for j in range(1, p + 1):
        acc += coeffs[:, j - 1].astype(np.int64)[:, None] * x64[:, p - j : BLOCK - j]
    pred = acc >> shifts.astype(np.int64)[:, None]  # arithmetic (floor) shift
    return (x64[:, p:] - pred).astype(np.int32)


def lpc_analyze_numpy(
    pcm: np.ndarray, p: int = LPC_ORDER
) -> "tuple[np.ndarray, np.ndarray, int]":
    """Per-block LPC analysis: (coeffs (nb,p) int16, shifts (nb,) int8, bits).

    Autocorrelation + vectorized Levinson-Durbin per 256-sample block, then
    quantization under the sum|c| <= 32767 int32-safety contract. Blocks
    whose exact residual would exceed the 19-bit ladder cap fall back to an
    order-1 predictor (c=[1,0,...], shift 0 -> residual = delta-x <= 17 bits).
    `bits` is the exact payload cost + per-block header (16p heads + 16p
    coeffs + 8 shift) for mode selection against the fixed-order costs.
    """
    nb = len(pcm) // BLOCK
    x = pcm.astype(np.float64).reshape(nb, BLOCK)
    xi = pcm.astype(np.int32).reshape(nb, BLOCK)
    ac = np.empty((nb, p + 1))
    for lag in range(p + 1):
        ac[:, lag] = np.einsum("ij,ij->i", x[:, lag:], x[:, : BLOCK - lag])
    ac[:, 0] = ac[:, 0] * (1.0 + 1e-10) + 1e-10  # ridge: never singular

    # Levinson-Durbin over all blocks at once; a block that goes unstable
    # (|reflection| >= 1, vanished error) freezes at its lower-order
    # coefficients — any coefficients are VALID (the wire is self-describing)
    a = np.zeros((nb, p))
    err = ac[:, 0].copy()
    alive = err > 0
    safe_err = np.where(err > 0, err, 1.0)
    for m in range(1, p + 1):
        acc = ac[:, m].copy()
        for j in range(1, m):
            acc = acc - a[:, j - 1] * ac[:, m - j]
        k = acc / safe_err
        ok = alive & np.isfinite(k) & (np.abs(k) < 1.0)
        k = np.where(ok, k, 0.0)
        new_a = a.copy()
        if m > 1:
            new_a[:, : m - 1] = a[:, : m - 1] - k[:, None] * a[:, m - 2 :: -1]
        new_a[:, m - 1] = k
        a = np.where(ok[:, None], new_a, a)
        err = np.where(ok, err * (1.0 - k * k), err)
        alive = ok & (err > 0)
        safe_err = np.where(err > 0, err, 1.0)

    # quantize: largest shift <= _LPC_MAX_SHIFT with sum|c| <= 32767
    asum = np.abs(a).sum(axis=1)
    with np.errstate(divide="ignore"):
        s = np.floor(np.log2(32767.0 / np.maximum(asum, 1e-300)))
    s = np.clip(np.where(np.isfinite(s), s, _LPC_MAX_SHIFT), 0, _LPC_MAX_SHIFT)
    s = s.astype(np.int64)

    def quant(shift):
        c = np.rint(a * np.power(2.0, shift)[:, None])
        return np.clip(c, -32768, 32767).astype(np.int16)

    c = quant(s)
    for _ in range(_LPC_MAX_SHIFT + 1):
        over = (np.abs(c.astype(np.int64)).sum(axis=1) > 32767) & (s > 0)
        if not over.any():
            break
        s = np.where(over, s - 1, s)
        c = np.where(over[:, None], quant(s), c)

    fallback = np.zeros(p, np.int16)
    fallback[0] = 1
    bad = np.abs(c.astype(np.int64)).sum(axis=1) > 32767  # degenerate at s=0
    if bad.any():
        c[bad] = fallback
        s[bad] = 0
    r = _lpc_residuals(xi, c, s)
    need = _signed_widths(r)
    overcap = need > KSET[0]
    if overcap.any():  # exceeds the ladder: order-1 inside the LPC frame
        c[overcap] = fallback
        s[overcap] = 0
        r = _lpc_residuals(xi, c, s)
        need = _signed_widths(r)
    bits = int((need * (BLOCK - p)).sum()) + nb * (16 * p + 16 * p + 8)
    return np.ascontiguousarray(c), s.astype(np.int8), bits


def pack_numpy_lpc(
    pcm: np.ndarray, coeffs: np.ndarray, shifts: np.ndarray
) -> "PackedPCM | None":
    """Pure-numpy LPC packer (same wire format as native pack_pcm16_lpc)."""
    p = coeffs.shape[1]
    nb = len(pcm) // BLOCK
    xi = pcm.astype(np.int32).reshape(nb, BLOCK)
    r = _lpc_residuals(xi, coeffs, shifts)
    heads = np.ascontiguousarray(xi[:, :p].astype(np.int16))
    words, total, counts, idx = _pack_from_residuals(r, p)
    return words, total, counts, idx, heads


def _native_lpc_analyze(pcm: np.ndarray, p: int = LPC_ORDER):
    from basic_pitch_tpu import native

    lib = native.load()
    if lib is None or not hasattr(lib, "lpc_analyze_pcm16"):
        return None
    nb = len(pcm) // BLOCK
    coeffs = np.empty((nb, p), np.int16)
    shifts = np.empty(nb, np.int8)
    bits = lib.lpc_analyze_pcm16(
        native._as_ptr(pcm), ctypes.c_int64(len(pcm)), ctypes.c_int32(p),
        native._as_ptr(coeffs), native._as_ptr(shifts),
    )
    if bits < 0:
        return None
    return coeffs, shifts, int(bits)


def _native_lpc_pack(pcm: np.ndarray, coeffs: np.ndarray, shifts: np.ndarray):
    from basic_pitch_tpu import native

    lib = native.load()
    if lib is None or not hasattr(lib, "pack_pcm16_lpc"):
        return None
    p = coeffs.shape[1]
    nb = len(pcm) // BLOCK
    cap = nb * words_per_block(KSET[0], p) + 4
    words = np.empty(cap, np.uint32)
    idx = np.empty(nb, np.int32)
    heads = np.empty((nb, p), np.int16)
    counts = np.empty(len(KSET), np.int64)
    total = lib.pack_pcm16_lpc(
        native._as_ptr(pcm), ctypes.c_int64(len(pcm)), ctypes.c_int32(p),
        native._as_ptr(coeffs), native._as_ptr(shifts),
        native._as_ptr(_kset_arr), ctypes.c_int32(len(KSET)),
        native._as_ptr(words), ctypes.c_int64(cap),
        native._as_ptr(idx), native._as_ptr(heads), native._as_ptr(counts),
    )
    if total < 0:
        return None
    return words, int(total), counts, idx, heads


def _native_fixed_costs(pcm: np.ndarray) -> Optional[np.ndarray]:
    from basic_pitch_tpu import native

    lib = native.load()
    if lib is None or not hasattr(lib, "residual_order_costs"):
        return None
    bits = np.empty(3, np.int64)
    lib.residual_order_costs(
        native._as_ptr(pcm), ctypes.c_int64(len(pcm)), native._as_ptr(bits)
    )
    return bits


def fixed_costs_numpy(pcm: np.ndarray) -> np.ndarray:
    """Exact per-order payload+head bit costs for the fixed predictors."""
    nb = len(pcm) // BLOCK
    x = pcm[: nb * BLOCK].astype(np.int32).reshape(nb, BLOCK)
    bits = np.empty(3, np.int64)
    for i, order in enumerate(_ORDERS):
        need = _signed_widths(np.diff(x, n=order, axis=1))
        bits[i] = int((need * payload_len(order)).sum()) + 16 * order * nb
    return bits


def _bucket(n: int) -> int:
    b = _MIN_BUCKET
    while b < n:
        b *= 2
    return b


# Words-buffer length quantization: transfers of a NOVEL shape cost a
# ~40-55 ms layout round trip on the tunneled runtime (measured,
# tools/link_probe.py), and the exact packed length is content-dependent —
# i.e. novel every piece. Rounding the length up so only its top 5 bits are
# set makes the transfer shape recur (<=32 size classes per octave, <=3.1%
# extra wire bytes at any size) — one layout cost per size class, then the
# fast path.
_WORDS_SIG_BITS = 5


def _quantize_words(n: int) -> int:
    if n <= (1 << _WORDS_SIG_BITS):
        return max(n, 1)
    quantum = 1 << (n.bit_length() - _WORDS_SIG_BITS)
    return -(-n // quantum) * quantum


def pack(
    pcm: np.ndarray, order: Optional[int] = None, mode: Optional[str] = None
) -> PackedPCM:
    """int16 PCM -> PackedPCM (native packer when available, numpy otherwise).

    Input length is padded up to a whole number of blocks with zeros. With
    everything defaulted, the predictor is chosen per piece by exact packed
    bit cost: the cheapest FLAC-style fixed order (1..3), or per-block LPC
    (``mode="lpc"``) when it beats the best fixed order by >= the
    scan-decode margin (_LPC_MARGIN). Passing ``order`` pins a fixed order
    (the pre-LPC behavior, unchanged); passing ``mode`` pins the mode.
    """
    assert pcm.dtype == np.int16 and pcm.ndim == 1
    if order is not None and order not in _ORDERS:
        raise ValueError(f"order must be one of {_ORDERS}, got {order}")
    if mode not in (None, "fixed", "lpc"):
        raise ValueError(f"mode must be None|'fixed'|'lpc', got {mode!r}")
    if order is not None and mode == "lpc":
        raise ValueError("order pins a FIXED predictor; do not combine with mode='lpc'")
    n = len(pcm)
    nb = -(-n // BLOCK)
    if nb * BLOCK != n:
        padded = np.zeros(nb * BLOCK, np.int16)
        padded[:n] = pcm
        pcm = padded
    pcm = np.ascontiguousarray(pcm)

    analysis = None
    if order is not None:
        mode = "fixed"
    elif mode == "lpc" or mode is None:
        analysis = _native_lpc_analyze(pcm)
        if analysis is None:
            analysis = lpc_analyze_numpy(pcm)
        if mode is None:
            fixed_bits = _native_fixed_costs(pcm)
            if fixed_bits is None:
                fixed_bits = fixed_costs_numpy(pcm)
            mode = "lpc" if analysis[2] < _LPC_MARGIN * int(fixed_bits.min()) else "fixed"

    coeffs = shifts = None
    if mode == "lpc":
        coeffs, shifts, _ = analysis
        packed = _native_lpc_pack(pcm, coeffs, shifts)
        if packed is None:
            packed = pack_numpy_lpc(pcm, coeffs, shifts)
        order = LPC_ORDER
    else:
        if order is None:
            order = _native_choose_order(pcm)
            if order is None:
                order = choose_order_numpy(pcm)
        packed = _native_pack(pcm, order)
        if packed is None:
            packed = pack_numpy(pcm, order)
    words, total, counts, idx, heads = packed

    groups: List[Tuple[int, int, int, np.ndarray]] = []
    word_off = row_off = 0
    needed = total
    for j, k in enumerate(KSET):
        rows = int(counts[j])
        if rows:
            bucket = _bucket(rows)
            gidx = np.full(bucket, nb, np.int32)
            gidx[:rows] = idx[row_off : row_off + rows]
            groups.append((k, word_off, rows, gidx))
            # dynamic_slice must not clamp: the buffer has to cover the
            # bucket-padded over-read of every group
            needed = max(needed, word_off + bucket * words_per_block(k, order))
        word_off += rows * words_per_block(k, order)
        row_off += rows
    needed = _quantize_words(needed)
    # the native packers allocate with np.empty: zero the slack between the
    # real payload and the quantized/over-read length so the wire is
    # deterministic (no uninitialized heap bytes shipped to a server)
    words[total : min(needed, len(words))] = 0
    if needed > len(words):
        words = np.concatenate([words, np.zeros(needed - len(words), np.uint32)])
    return PackedPCM(words[:needed], groups, heads, n, nb, order, coeffs, shifts)


# --------------------------------------------------------------------------
# device-side unpacking
# --------------------------------------------------------------------------

_jit_cache: Dict = {}


def _init_fn(nb: int, order: int, device=None):
    key = ("init", nb, order, device)
    if key not in _jit_cache:
        pay = payload_len(order)
        fn = lambda: jnp.zeros((nb + 1, pay), jnp.int32)  # noqa: E731
        if device is not None:
            # pin the zero buffer to the target chip so the whole decode
            # chain (which follows committed inputs) runs there — used by
            # the mesh pipeline's per-shard uploads
            sharding = jax.sharding.SingleDeviceSharding(device)
            _jit_cache[key] = jax.jit(fn, out_shardings=sharding)
        else:
            _jit_cache[key] = jax.jit(fn)
    return _jit_cache[key]


def _unpack_scatter_fn(k: int, rows_bucket: int, order: int):
    """(buf, words, word_off, idx) -> buf with this group's residual rows set.

    Dense unpack: every sample's word index / shift is static for a fixed k,
    so the stream decodes with column slices + shifts; `buf` is donated so
    the scatter updates in place across the group chain.
    """
    key = ("unpack", k, rows_bucket, order)
    if key in _jit_cache:
        return _jit_cache[key]

    wpb = words_per_block(k, order)
    pos = np.arange(payload_len(order)) * k
    cols0 = (pos >> 5).astype(np.int32)
    cols1 = np.minimum(cols0 + 1, wpb - 1)
    # NUMPY closure constants, never jnp: a captured device array becomes an
    # MLIR constant whose VALUE is fetched from the device at lowering time —
    # a blocking d2h round trip (~1 s through the tunnel) per novel
    # (width, bucket, order) executable (measured 539 s over an hour-scale
    # recording's 166 codec compiles before this fix)
    shifts = (pos & 31).astype(np.uint32)
    mask = np.uint32((1 << k) - 1)
    sign = np.int32(1 << (k - 1))

    def run(buf, words, word_off, idx):
        stream = lax.dynamic_slice(words, (word_off,), (rows_bucket * wpb,))
        stream = stream.reshape(rows_bucket, wpb)
        w0 = stream[:, cols0]
        w1 = stream[:, cols1]
        hi = jnp.where(shifts == 0, jnp.uint32(0), w1 << (jnp.uint32(32) - shifts))
        v = (((w0 >> shifts) | hi) & mask).astype(jnp.int32)
        r = v - ((v & sign) << 1)  # two's-complement sign extension
        return buf.at[idx].set(r)

    fn = jax.jit(run, donate_argnums=(0,))
    _jit_cache[key] = fn
    return fn


def _finish_fn(nb: int, n_out: int, order: int):
    """(buf, heads) -> float32 samples: `order` integer cumsums + rescale."""
    key = ("finish", nb, n_out, order)
    if key in _jit_cache:
        return _jit_cache[key]

    def run(buf, heads):
        r = buf[:nb]
        h = heads.astype(jnp.int32)
        if order == 1:
            # r = Δx  =>  x = x0 + cumsum(r)
            xs = h[:, 0][:, None] + jnp.cumsum(r, axis=1)
        elif order == 2:
            x0, x1 = h[:, 0], h[:, 1]
            # r = Δ²x  =>  Δx = (x1-x0) + cumsum(r),  x = x1 + cumsum(Δx)
            dx = (x1 - x0)[:, None] + jnp.cumsum(r, axis=1)
            xs = x1[:, None] + jnp.cumsum(dx, axis=1)
        else:
            x0, x1, x2 = h[:, 0], h[:, 1], h[:, 2]
            # r = Δ³x: three nested first differences
            d2 = (x2 - 2 * x1 + x0)[:, None] + jnp.cumsum(r, axis=1)
            dx = (x2 - x1)[:, None] + jnp.cumsum(d2, axis=1)
            xs = x2[:, None] + jnp.cumsum(dx, axis=1)
        x = jnp.concatenate([h, xs], axis=1)
        return x.reshape(-1)[:n_out].astype(jnp.float32) * (1.0 / 32768.0)

    # no donation: the f32 output cannot alias the int32 residual buffer
    fn = jax.jit(run)
    _jit_cache[key] = fn
    return fn


def _finish_lpc_fn(nb: int, n_out: int, p: int):
    """(buf, heads, coeffs, shifts) -> float32 samples via the LPC recurrence.

    x[n] = r[n] + ((sum_j c_j * x[n-j]) >> s), a per-block int32 linear
    recurrence on RECONSTRUCTED samples — sequential in n (a lax.scan of
    BLOCK-p steps), parallel across the nb blocks (the scan state is p
    (nb,)-vectors). The quantizer's sum|c| <= 32767 contract bounds every
    partial accumulator under 2^30, so int32 arithmetic is exact; the scan
    reproduces the encoder's original-sample predictions bit-for-bit
    because reconstruction is lossless.
    """
    key = ("finish_lpc", nb, n_out, p)
    if key in _jit_cache:
        return _jit_cache[key]

    def run(buf, heads, coeffs, shifts):
        r = buf[:nb]  # (nb, pay) int32 residuals
        h = heads.astype(jnp.int32)  # (nb, p) first samples, oldest first
        c = coeffs.astype(jnp.int32)  # c[:, j-1] multiplies x[n-j]
        s = shifts.astype(jnp.int32)
        c_cols = [c[:, j] for j in range(p)]
        state0 = tuple(h[:, j] for j in range(p))  # x[n-p] .. x[n-1]

        def step(state, rcol):
            acc = c_cols[0] * state[p - 1]
            for j in range(1, p):
                acc = acc + c_cols[j] * state[p - 1 - j]
            x = rcol + lax.shift_right_arithmetic(acc, s)
            return state[1:] + (x,), x

        _, xs = lax.scan(step, state0, r.T)  # xs: (pay, nb)
        x = jnp.concatenate([h, xs.T], axis=1)
        return x.reshape(-1)[:n_out].astype(jnp.float32) * (1.0 / 32768.0)

    fn = jax.jit(run)
    _jit_cache[key] = fn
    return fn


def decode_to_device(
    packed: PackedPCM, n_out: Optional[int] = None, device: "jax.Device | None" = None
) -> jax.Array:
    """Upload a PackedPCM and reconstruct float32 samples in HBM.

    Returns a device array equal to `pcm.astype(float32)/32768` for the
    packed samples (bit-exact; verified in tests). All transfers are
    started async; nothing here blocks. ``device`` pins the transfers and
    the decode to one chip (committed arrays) — the mesh pipeline decodes
    each shard's packed bytes on its own device this way.
    """
    n_out = packed.n_samples if n_out is None else n_out
    put = jax.device_put if device is None else (lambda x: jax.device_put(x, device))
    words = put(packed.words)
    heads = put(packed.heads)
    buf = _init_fn(packed.nb, packed.order, device)()
    for k, word_off, n_rows, idx in packed.groups:
        fn = _unpack_scatter_fn(k, len(idx), packed.order)
        buf = fn(buf, words, put(np.int32(word_off)), put(idx))
    if packed.mode == "lpc":
        coeffs = put(packed.coeffs)
        shifts = put(packed.shifts)
        return _finish_lpc_fn(packed.nb, n_out, packed.order)(buf, heads, coeffs, shifts)
    return _finish_fn(packed.nb, n_out, packed.order)(buf, heads)


def available() -> bool:
    """True when the fast native packer is present (the numpy packer is too
    slow for the throughput path; callers should transport raw int16 then)."""
    from basic_pitch_tpu import native

    lib = native.load()
    return lib is not None and hasattr(lib, "pack_pcm16_residual")


def encode_decode(pcm: np.ndarray) -> jax.Array:
    """pack + decode_to_device in one call (the pipeline's entry point)."""
    return decode_to_device(pack(pcm))
