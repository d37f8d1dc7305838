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
    order: int = 2  # fixed-predictor order shared by the whole piece

    @property
    def packed_bytes(self) -> int:
        return self.words.nbytes + self.heads.nbytes + sum(
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
    nb = len(pcm) // BLOCK
    x = pcm[: nb * BLOCK].astype(np.int32).reshape(nb, BLOCK)
    best_order, best_bits = 2, None
    for order in _ORDERS:
        need = _signed_widths(np.diff(x, n=order, axis=1))
        bits = int((need * payload_len(order)).sum()) + 16 * order * nb
        if best_bits is None or bits < best_bits:
            best_order, best_bits = order, bits
    return best_order


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


def pack_numpy(pcm: np.ndarray, order: int):
    """Pure-numpy reference packer (same wire format as the C++ one)."""
    nb = len(pcm) // BLOCK
    pay = payload_len(order)
    x = pcm.astype(np.int32).reshape(nb, BLOCK)
    r = np.diff(x, n=order, axis=1)
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
    heads = np.ascontiguousarray(x[:, :order].astype(np.int16))

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
    return words, total, counts, idx, heads


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


def pack(pcm: np.ndarray, order: Optional[int] = None) -> PackedPCM:
    """int16 PCM -> PackedPCM (native packer when available, numpy otherwise).

    Input length is padded up to a whole number of blocks with zeros. The
    fixed-predictor order (1..3) is chosen per piece by exact payload cost
    when not given — FLAC-style order selection, one order per piece so the
    device integration program stays uniform.
    """
    assert pcm.dtype == np.int16 and pcm.ndim == 1
    if order is not None and order not in _ORDERS:
        raise ValueError(f"order must be one of {_ORDERS}, got {order}")
    n = len(pcm)
    nb = -(-n // BLOCK)
    if nb * BLOCK != n:
        padded = np.zeros(nb * BLOCK, np.int16)
        padded[:n] = pcm
        pcm = padded
    pcm = np.ascontiguousarray(pcm)

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
    if needed > len(words):
        words = np.concatenate([words, np.zeros(needed - len(words), np.uint32)])
    return PackedPCM(words[:needed], groups, heads, n, nb, order)


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


def decode_to_device(
    packed: PackedPCM, n_out: Optional[int] = None, device=None
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
