"""One-compile charm-layer codec: the whole AR chain as a single lax.scan.

The unrolled codec protocol (``crc_codec._CharmLayerDriver``) compiles one
program per slice per direction — ctx_slices grows to 24 for the CRC
families, and over a remote-TPU tunnel those compiles dominate warmup
(BENCH_MATRIX_r03: stf13 445 s, czigzag 231 s; the reference pays the
analogous cost as per-slice Python dispatch, ``stf13.py:467-535``).

``ZigzagScanWire`` compiles the ENTIRE autoregressive chain — context
convolutions (stacked per-slice weights), scale bucketing, and the
on-device lane rANS (``coding/device_rans.py``) — as ONE ``lax.scan``
program. The program is shared verbatim by encoder and decoder: a traced
``is_encode`` flag selects the symbol source with ``lax.cond`` (quantize
from the true latent vs. pull from the rANS streams), while the float
context math sits OUTSIDE the cond. Both directions therefore execute the
same compiled executable, so the AR context is bit-identical by
construction — a stronger guarantee than the shared-jitted-function
invariant the unrolled protocol relies on, and the reason the streams
cannot desync.

Scan-vs-unrolled float caveat: the stacked fixed-width first conv reduces
in a different order than the unrolled variable-width one (see
``zigzag_coder.stack_zigzag_params``), so scan-wire bitstreams are
self-consistent but NOT interchangeable with unrolled-protocol streams.
One wire per serving fleet, as with the device/host wire split.

Reference parity note: this coder covers the same models as the unrolled
drivers (stf9/11/12/14 machine layers, stf13 machine+seg, oj/seg_oj); the
reference never shipped a working coder for most of them (SURVEY.md §0).
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..coding.device_rans import decode_lanes, fix_escapes, init_lanes
from ..entropy import build_indexes
from .cnn import stack_charm_params
from .device_codec import WIRE_SCAN
from .codec import enc_round
from .zigzag_coder import stack_zigzag_params

_WORD_BUCKET = 1 << 16  # scan-program words bucket (uint16 words)


def _cc_apply(p: dict, x: jax.Array) -> jax.Array:
    """ShallowCC forward from raw stacked-slice params (conv 3x3 s1 SAME
    + exact gelu between, linear last — nn/factories.py:177)."""
    names = sorted(p.keys(), key=lambda n: int(n.split("_")[1]))
    for j, ln in enumerate(names):
        k, b = p[ln]["kernel"], p[ln]["bias"]
        x = jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        if j + 1 < len(names):
            x = jax.nn.gelu(x, approximate=False)
    return x


def _round_up(n: int, q: int) -> int:
    return ((max(n, 1) + q - 1) // q) * q


# --------------------------------------------------------------------------
# Static program signatures
# --------------------------------------------------------------------------
# The scan program is executed VERBATIM by encoder and decoder — that shared
# executable is what makes the AR float context bit-identical on both sides
# (module docstring). An executable is keyed by its input SHAPES, so every
# shape in the program signature must be a function of the STATIC problem
# shape (N, B, h, w, sc) only, never of the data:
#
#   - words: the encoder emits at most ONE 16-bit word per symbol (32-bit
#     state, 16-bit renorm: state < 2^32 implies one shift reaches
#     state < freq<<16 — coding/device_rans.py) plus a 2-word flushed
#     state per lane, so ``n_syms + 2 * lanes`` is a hard bound. The
#     decoder places the real words into a zero buffer of that static
#     size; the encoder passes zeros of the same shape (its branch never
#     reads them).
#   - escape side channel: padded to a STATIC TIER cap (1/64, 1/8, or all
#     of a segment). Both sides derive the tier from the same per-segment
#     escape counts — the encoder from its first-pass wire (re-encoding
#     at the higher tier when the base cap overflows; rare beyond
#     untrained-weight statistics), the decoder from the received wire —
#     so no header bytes are needed and the executables stay paired.
#
# Before this, the encoder ran with one-bucket/cap-64 dummies while the
# decoder's shapes followed the data: at production scale the two sides
# silently compiled SEPARATE executables of the "shared" program
# (verified equal in practice, but only by the accident of XLA compiling
# the identical float subgraph identically — tools/verify_roundtrip.py),
# and every new escape-count bucket recompiled the decoder (~30-60 s over
# the tunnel). Static signatures restore the invariant by construction
# and pin warm-cache warmup to one program per (model, shape).

_ESC_TIER_SHIFTS = (6, 3, 0)  # cap = seg_size >> shift (min 64)


def _esc_tier_cap(seg_size: int, tier: int) -> int:
    return max(1, min(seg_size, max(64, seg_size >> _ESC_TIER_SHIFTS[tier])))


def _tier_for(max_seg_count: int, seg_size: int) -> int:
    for t in range(len(_ESC_TIER_SHIFTS)):
        if max_seg_count <= _esc_tier_cap(seg_size, t):
            return t
    return len(_ESC_TIER_SHIFTS) - 1  # unreachable: last cap == seg_size


def _static_word_cap(n_syms: int, lanes: int) -> int:
    return _round_up(n_syms + 2 * lanes, _WORD_BUCKET)


@functools.partial(jax.jit, static_argnums=(1,))
def _place_words(words16, w_cap: int):
    """Real (host-pow2-padded) uint16 words -> static (w_cap,) int32
    buffer. Integer-only: recompiles per pow2 upload size without
    touching any float executable."""
    return (
        jnp.zeros((w_cap,), jnp.int32)
        .at[: words16.shape[0]]
        .set(words16.astype(jnp.int32))
    )


def _seg_esc_counts(blobs, n_l_img: int, steps_per_seg: int, n_segs: int):
    """Per-segment escape counts of a multi-image wire, from the blobs
    alone (host, no device work). Wire-local escape positions are
    ``t * n_l + lane``; the global segment of step ``t`` is
    ``t // steps_per_seg``. Encoder and decoder run this SAME function on
    the SAME bytes, so both pick the same tier."""
    from .device_codec import WIRE_SCAN, _unpack_wire

    counts = np.zeros((n_segs,), np.int64)
    for blob in blobs:
        _, _, dest, _ = _unpack_wire(blob, WIRE_SCAN)
        if dest.shape[0]:
            seg = (dest // n_l_img) // steps_per_seg
            counts += np.bincount(seg, minlength=n_segs)[:n_segs]
    return counts


def _wrap_tier(blobs: List[bytes], tier: int) -> List[bytes]:
    """Scan-wire framing: one tier byte per blob after the 4-byte wire
    tag (the escape-cap tier the stream was ENCODED under — the decoder
    must build its program inputs at the same tier to run the same
    executable)."""
    return [b[:4] + bytes([tier]) + b[4:] for b in blobs]


def _wire_inputs(kit, blobs, n_segs: int, seg_size: int,
                 lanes: int, n_syms: int):
    """Decode-side wire prep with a fully STATIC program signature:
    -> (words32 (w_cap,), off (lanes,), esc_d/esc_r (n_segs, cap))."""
    from ..coding.device_rans import lane_offsets
    from .device_codec import WIRE_SCAN, _unpack_wire, _wire_offset

    _wire_offset(blobs[0], WIRE_SCAN)
    tier = blobs[0][4]
    offs, words, dests, raws = [], [], [], []
    base = 0
    B = len(blobs)
    for b, blob in enumerate(blobs):
        lengths, w, dest, raw = _unpack_wire(blob, WIRE_SCAN, skip=1)
        n_l_img = lengths.shape[0]
        offs.append(lane_offsets(lengths) + base)
        base += int(w.shape[0])
        words.append(w)
        t = dest // n_l_img
        l = dest - t * n_l_img
        dests.append(t * (B * n_l_img) + b * n_l_img + l)
        raws.append(raw)
    flat = np.concatenate(words)
    dest = np.concatenate(dests).astype(np.int64)
    raw = np.concatenate(raws).astype(np.int32)
    order = np.argsort(dest, kind="stable")
    dest, raw = dest[order], raw[order]

    cap = _esc_tier_cap(seg_size, tier)
    esc_d = np.full((n_segs, cap), seg_size, np.int32)
    esc_r = np.zeros((n_segs, cap), np.int32)
    for i in range(n_segs):
        a = np.searchsorted(dest, i * seg_size, side="left")
        b2 = np.searchsorted(dest, (i + 1) * seg_size, side="left")
        esc_d[i, : b2 - a] = dest[a:b2] - i * seg_size
        esc_r[i, : b2 - a] = raw[a:b2]

    w_cap = _static_word_cap(n_syms, lanes)
    p2 = min(1 << max(int(flat.shape[0]) - 1, 1).bit_length(), w_cap)
    flat16 = np.zeros((p2,), np.uint16)
    flat16[: flat.shape[0]] = flat
    words32 = _place_words(jnp.asarray(flat16), w_cap)
    off = jnp.asarray(np.concatenate(offs).astype(np.int32))
    return words32, off, jnp.asarray(esc_d), jnp.asarray(esc_r)


class _StaticScanIO:
    """Encode-side static-signature plumbing shared by every scan wire.

    ``sharding``: optional batch ``NamedSharding`` (set by codecs running
    under a mesh). The shared scan program is only bit-identical between
    coder sides if BOTH call it with identical input shardings — under
    SPMD the encoder's floats arrive batch-sharded while the decoder's
    are derived from the replicated wire upload, and per-sharding
    executable twins reduce in different float orders (desync caught by
    dryrun_multichip's sharded scan roundtrip). ``_shard_batch`` and
    ``_replicated`` canonicalize both sides onto one signature.

    ``_encode_tiered`` runs the shared program with tier-0 escape-cap
    dummies, checks the emitted wire's per-segment escape counts against
    the tier cap, and — only on overflow — re-runs at the smallest
    sufficient tier so the executable the stream's indexes came from is
    the one the decoder will run (the tier byte on the wire names it).
    The loop is monotone over a 3-tier ladder whose last cap is the full
    segment, so it terminates in <= 3 runs; tier > 0 only occurs at
    escape rates beyond ~1.5% of symbols (untrained-weight statistics)."""

    sharding = None  # batch NamedSharding, set by the owning codec

    def _shard_batch(self, a, batch_axis: int):
        """Pin a float program input's sharding: batch axis over the
        mesh's data axis, everything else replicated. No-op without a
        mesh."""
        sh = self.sharding
        if sh is None:
            return a
        from jax.sharding import NamedSharding, PartitionSpec

        spec = [None] * a.ndim
        names = list(sh.spec)
        spec[batch_axis] = names[0] if names else None
        return jax.device_put(a, NamedSharding(sh.mesh, PartitionSpec(*spec)))

    def _replicated(self, arrs):
        """Pin the integer wire inputs fully replicated on both sides."""
        sh = self.sharding
        if sh is None:
            return arrs
        from jax.sharding import NamedSharding, PartitionSpec

        rep = NamedSharding(sh.mesh, PartitionSpec())
        return tuple(jax.device_put(a, rep) for a in arrs)

    def _enc_inputs(self, lanes: int, n_syms: int, seg_size: int,
                    tier: int):
        cache = getattr(self, "_enc_zero_cache", None)
        if cache is None:
            cache = self._enc_zero_cache = {}
        key = (lanes, n_syms, seg_size, tier)
        if key not in cache:
            cap = _esc_tier_cap(seg_size, tier)
            cache[key] = (
                jnp.zeros((_static_word_cap(n_syms, lanes),), jnp.int32),
                jnp.zeros((lanes,), jnp.int32),
                jnp.zeros((self.N, cap), jnp.int32),
                jnp.zeros((self.N, cap), jnp.int32),
            )
        return cache[key]

    def _encode_tiered(self, run_pack, lanes: int, n_syms: int,
                       seg_size: int, n_l_img: int, steps_per_seg: int):
        """run_pack(static_inputs) -> (outs, blobs); returns
        (tier-framed blobs, outs of the run that produced them)."""
        tier = 0
        while True:
            outs, blobs = run_pack(
                self._enc_inputs(lanes, n_syms, seg_size, tier)
            )
            counts = _seg_esc_counts(blobs, n_l_img, steps_per_seg, self.N)
            need = _tier_for(int(counts.max()), seg_size)
            if need <= tier:
                return _wrap_tier(blobs, tier), outs
            tier = need


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _zigzag_scan_program(Wc, ms, lrp, narrow, lanes_per_image,
                         gdev, scale_table_dev, p_xs,
                         means_stack, scales_stack, y_stack,
                         words, off, esc_d, esc_r, is_enc):
    """The shared zigzag scan executable (see ZigzagScanWire). Module
    scope so distinct wire instances with equal statics+shapes reuse ONE
    compiled program — stf13's machine and seg layers, and the machine
    layers of stf9/11/12/14/oj/seg_oj across codecs."""
    N_, B, h, w, sc_ = y_stack.shape
    n_l = min(lanes_per_image, h * w)
    while (h * w) % n_l:
        n_l -= 1
    L = B * n_l
    ppl = (h * w) // n_l
    buf0 = jnp.zeros((B, h, w, ms * sc_), y_stack.dtype)
    state0, ptr0 = init_lanes(words, off)

    def step(carry, xs):
        i, buf, st, pt = carry
        p_i, y_i, ed, er = xs
        s = jnp.minimum(i, N_ - Wc)
        win_m = jax.lax.dynamic_slice_in_dim(means_stack, s, Wc, 0)
        win_s = jax.lax.dynamic_slice_in_dim(scales_stack, s, Wc, 0)
        cm = jnp.moveaxis(win_m, 0, 3).reshape(B, h, w, Wc * sc_)
        cs = jnp.moveaxis(win_s, 0, 3).reshape(B, h, w, Wc * sc_)
        mean_support = jnp.concatenate([cm, buf], axis=-1)
        mu = _cc_apply(p_i["cc_mean"], mean_support)
        scale = _cc_apply(
            p_i["cc_scale"], jnp.concatenate([cs, buf], axis=-1)
        )
        index = build_indexes(scale, scale_table_dev)
        rows = (
            index.reshape(B, n_l, ppl, sc_)
            .transpose(2, 3, 0, 1)
            .reshape(ppl * sc_, L)
        )

        def enc_fn(op):
            st, pt = op
            sym = enc_round(y_i - mu, narrow).astype(jnp.int32)
            return sym, st, pt

        def dec_fn(op):
            st, pt = op
            vals, st2, pt2 = decode_lanes(
                words, off, rows, gdev, state=st, ptr=pt
            )
            vals = fix_escapes(vals, ed, er)
            sym = (
                vals.reshape(ppl, sc_, B, n_l)
                .transpose(2, 3, 0, 1)
                .reshape(B, h, w, sc_)
            )
            return sym, st2, pt2

        sym, st, pt = jax.lax.cond(is_enc, enc_fn, dec_fn, (st, pt))
        y_hat = sym.astype(mu.dtype) + mu
        if lrp:
            lrp_in = jnp.concatenate([mean_support, y_hat], axis=-1)
            y_hat = y_hat + 0.5 * jnp.tanh(
                _cc_apply(p_i["lrp"], lrp_in)
            )
        buf = jnp.concatenate([buf[..., sc_:], y_hat], axis=-1)
        return (i + 1, buf, st, pt), (
            y_hat, sym, index.astype(jnp.uint8)
        )

    (_, _, st, pt), (y_hats, syms, idxs) = jax.lax.scan(
        step,
        (jnp.int32(0), buf0, state0, ptr0),
        (p_xs, y_stack, esc_d, esc_r),
    )
    return y_hats, syms, idxs


class ZigzagScanWire(_StaticScanIO):
    """Scan-codec driver for one ``ZigzagCharmCoder`` layer.

    ``param_path``: key path of the coder subtree inside
    ``variables['params']`` (e.g. ``('machine', 'coder')``).
    """

    def __init__(self, model, variables, getter, param_path, kit,
                 scale_table_dev, narrow: float = 1.0):
        self.kit = kit
        # static layer config, read through one apply (the coder instance
        # only exists inside setup)
        N, sc, max_sup, sup_num, apply_lrp = model.apply(
            variables,
            method=lambda m: (
                getter(m).ctx_slices,
                getter(m).slice_ch,
                getter(m).max_support,
                getter(m).support_num,
                getter(m).apply_lrp,
            ),
        )
        self.N, self.sc = int(N), int(sc)
        Wc = min(int(sup_num), self.N)
        self.Wc = Wc
        p = variables["params"]
        for k in param_path:
            p = p[k]
        cond_width = Wc * self.sc
        self._stacked = jax.device_put(
            stack_zigzag_params(
                p, self.N, self.sc, int(max_sup), cond_width,
                apply_lrp=bool(apply_lrp),
            )["zz_scan"]
        )
        # ONE jit callable at module scope for every ZigzagScanWire
        # instance: layers with equal statics and shapes (e.g. stf13's
        # machine and seg coders) share a single executable instead of
        # compiling/loading per-instance twins (round-5 warmup cut;
        # NOTES_ROUND4.md budget: ~2-3 s per extra program over the
        # remote-TPU tunnel even on a warm persistent cache).
        self._program = functools.partial(
            _zigzag_scan_program,
            self.Wc, int(max_sup), bool(apply_lrp), float(narrow),
            int(kit.lanes_per_image), kit.gauss_dev, scale_table_dev,
        )

    # --- helpers -----------------------------------------------------------
    def _layout(self, B: int, h: int, w: int, sc: int):
        """(n_l per image, lanes, steps/segment, segment symbols)."""
        n_l = self.kit.n_lanes(h, w)
        L = B * n_l
        Ts = ((h * w) // n_l) * sc
        return n_l, L, Ts, Ts * L

    # --- public API --------------------------------------------------------
    def encode(self, means, scales, y_stack):
        """Stacked (N, B, h, w, sc) conditioning + latent slices (the
        merged driver programs emit them stacked — crc_codec.py
        ``scan_enc_front``/``scan_state``); returns (wire blobs per
        image, stacked y_hat (N, B, h, w, sc))."""
        _, B, h, w, sc = y_stack.shape
        n_l, L, Ts, seg = self._layout(B, h, w, sc)

        def run_pack(inputs):
            y_hats, syms, idxs = self._program(
                self._stacked, means, scales, y_stack,
                *inputs, jnp.bool_(True),
            )
            return y_hats, self.kit.encode_y_stack(syms, idxs, fmt=WIRE_SCAN)

        blobs, y_hats = self._encode_tiered(
            run_pack, L, self.N * seg, seg, n_l, Ts
        )
        return blobs, y_hats

    def decode(self, blobs: List[bytes], means, scales):
        """-> stacked y_hat (the scan consumes the same wire format
        :meth:`encode` emits; see DeviceWireKit.encode_y_slices)."""
        N_, B, h, w, sc = means.shape
        _, L, _, seg = self._layout(B, h, w, sc)
        words32, off, esc_d, esc_r = _wire_inputs(
            self.kit, blobs, self.N, seg, L, self.N * seg
        )
        y_stack = jnp.zeros((self.N, B, h, w, sc), means.dtype)
        y_hats, _, _ = self._program(
            self._stacked, means, scales, y_stack,
            words32, off, esc_d, esc_r, jnp.bool_(False),
        )
        return y_hats


class ZigzagSwinScanWire(_StaticScanIO):
    """Scan-codec driver for the stf5-8 family (``ZigzagSwinCodec``):
    the per-slice context includes residual Swin refiner stacks
    (reference ``stf5.py:484-570``), so the step applies the model's own
    ``_ZigzagCodeCtx`` flax module against the stacked ``zigzag_scan``
    parameter subtree instead of the raw-conv ``_cc_apply`` the plain
    wires use. Covers all four reference configs: prefix/sliding
    support x full/window conditioning. Same shared-program design and
    wire format as the other scan wires."""

    def __init__(self, model, variables, kit, scale_table_dev,
                 narrow: float = 1.0):
        from .stf_family import _ZigzagCodeCtx, stack_zigzag_params

        self.kit = kit
        N = int(model.ctx_slices)
        sc = int(model.slice_ch)
        self.N, self.sc = N, sc
        self.full_cond = model.mean_mode == "full"
        Wc = int(model.mean_window) if not self.full_cond else 0
        max_sup = int(model.max_support)
        prefix = model.support_mode == "prefix"
        self._stacked = jax.device_put(
            stack_zigzag_params(variables["params"], model)["zigzag_scan"]
        )
        ctx_mod = _ZigzagCodeCtx(
            slice_ch=sc,
            cc_widths=tuple(model.cc_widths),
            mu_depths=tuple(model.mu_refine),
            scale_depths=tuple(model.scale_refine),
            lrp_depths=tuple(model.lrp_refine),
            refine_window=int(model.refine_window),
            refine_heads=int(model.refine_heads),
            drop_path_rate=float(model.drop_path_rate),
        )
        gdev = kit.gauss_dev
        full_cond = self.full_cond

        @jax.jit
        def program(gdev, p_xs, cond_m, cond_s, y_stack,
                    words, off, esc_d, esc_r, is_enc):
            N_, B, h, w, sc_ = y_stack.shape
            n_l = kit.n_lanes(h, w)
            L = B * n_l
            ppl = (h * w) // n_l
            buf0 = jnp.zeros((B, h, w, max_sup * sc_), y_stack.dtype)
            state0, ptr0 = init_lanes(words, off)

            def step(carry, xs):
                i, buf, st, pt = carry
                p_i, y_i, ed, er = xs
                if full_cond:
                    cm, cs = cond_m, cond_s
                else:
                    s = jnp.minimum(i, N_ - Wc)

                    def win(t):
                        v = jax.lax.dynamic_slice_in_dim(t, s, Wc, 0)
                        return jnp.moveaxis(v, 0, 3).reshape(
                            B, h, w, Wc * sc_
                        )

                    cm, cs = win(cond_m), win(cond_s)
                mean_support = jnp.concatenate([cm, buf], axis=-1)
                scale_support = jnp.concatenate([cs, buf], axis=-1)
                mu, scale = ctx_mod.apply(
                    {"params": p_i}, mean_support, scale_support,
                    method="context",
                )
                index = build_indexes(scale, scale_table_dev)
                rows = (
                    index.reshape(B, n_l, ppl, sc_)
                    .transpose(2, 3, 0, 1)
                    .reshape(ppl * sc_, L)
                )

                def enc_fn(op):
                    st, pt = op
                    sym = enc_round(y_i - mu, narrow).astype(jnp.int32)
                    return sym, st, pt

                def dec_fn(op):
                    st, pt = op
                    vals, st2, pt2 = decode_lanes(
                        words, off, rows, gdev, state=st, ptr=pt
                    )
                    vals = fix_escapes(vals, ed, er)
                    sym = (
                        vals.reshape(ppl, sc_, B, n_l)
                        .transpose(2, 3, 0, 1)
                        .reshape(B, h, w, sc_)
                    )
                    return sym, st2, pt2

                sym, st, pt = jax.lax.cond(is_enc, enc_fn, dec_fn, (st, pt))
                y_hat = sym.astype(mu.dtype) + mu
                y_hat = y_hat + ctx_mod.apply(
                    {"params": p_i},
                    jnp.concatenate([mean_support, y_hat], axis=-1),
                    method="lrp_res",
                )
                if prefix:
                    slot = jnp.minimum(i, max_sup - 1) * sc_
                    updated = jax.lax.dynamic_update_slice(
                        buf, y_hat, (0, 0, 0, slot)
                    )
                    buf = jnp.where(i < max_sup, updated, buf)
                else:
                    buf = jnp.concatenate([buf[..., sc_:], y_hat], axis=-1)
                return (i + 1, buf, st, pt), (
                    y_hat, sym, index.astype(jnp.uint8)
                )

            (_, _, st, pt), (y_hats, syms, idxs) = jax.lax.scan(
                step,
                (jnp.int32(0), buf0, state0, ptr0),
                (p_xs, y_stack, esc_d, esc_r),
            )
            return y_hats, syms, idxs

        self._program = functools.partial(program, kit.gauss_dev)

    _layout = ZigzagScanWire._layout

    def _cond(self, state):
        if self.full_cond:
            return state["means"][0], state["scales"][0]
        return (
            jnp.stack(state["means"], axis=0),
            jnp.stack(state["scales"], axis=0),
        )

    def encode(self, state: dict, y_slices: List[jax.Array]):
        cond_m, cond_s = self._cond(state)
        y_stack = jnp.stack(y_slices, axis=0)
        _, B, h, w, sc = y_stack.shape
        n_l, L, Ts, seg = self._layout(B, h, w, sc)

        def run_pack(inputs):
            y_hats, syms, idxs = self._program(
                self._stacked, cond_m, cond_s, y_stack,
                *inputs, jnp.bool_(True),
            )
            return y_hats, self.kit.encode_y_stack(syms, idxs, fmt=WIRE_SCAN)

        blobs, y_hats = self._encode_tiered(
            run_pack, L, self.N * seg, seg, n_l, Ts
        )
        return blobs, [y_hats[i] for i in range(self.N)]

    def decode(self, blobs: List[bytes], state: dict):
        cond_m, cond_s = self._cond(state)
        if self.full_cond:
            B, h, w = cond_m.shape[0], cond_m.shape[1], cond_m.shape[2]
        else:
            B, h, w = cond_m.shape[1], cond_m.shape[2], cond_m.shape[3]
        _, L, _, seg = self._layout(B, h, w, self.sc)
        words32, off, esc_d, esc_r = _wire_inputs(
            self.kit, blobs, self.N, seg, L, self.N * seg
        )
        y_stack = jnp.zeros((self.N, B, h, w, self.sc), cond_m.dtype)
        y_hats, _, _ = self._program(
            self._stacked, cond_m, cond_s, y_stack,
            words32, off, esc_d, esc_r, jnp.bool_(False),
        )
        return [y_hats[i] for i in range(self.N)]


class Stf2ScanWire(_StaticScanIO):
    """Scan-codec driver for stf2's windowed-token AR loop: the shared
    attention context (``token_context_traced``), scale bucketing, lane
    rANS, and LRP run as ONE ``lax.scan`` executed verbatim by both
    coder sides. Unlike stf3/4 (one-shot teacher-forced encode), stf2's
    encoder already iterates the same per-token step as its decoder, so
    the shared-program invariant costs encode nothing. Lane = (image,
    window position); serial depth = token count."""

    def __init__(self, model, variables, kit, scale_table_dev,
                 narrow: float = 1.0):
        self.kit = kit
        self.model = model
        ws = int(model.mask_win_size)
        Cp = int(model.slice_ch)
        s = int(model.num_sliding)
        self.D = ws * ws * Cp
        gdev = kit.gauss_dev
        mdl = model

        @jax.jit
        def program(gdev, v, m_win, s_win, y_tok, words, off,
                    esc_d, esc_r, is_enc):
            B, N, D = y_tok.shape
            L = B * D
            state0, ptr0 = init_lanes(words, off)
            prev0 = jnp.zeros((B, s, D), m_win.dtype)
            xs = (
                jnp.moveaxis(m_win, 1, 0),
                jnp.moveaxis(s_win, 1, 0),
                jnp.moveaxis(y_tok, 1, 0),
                esc_d,
                esc_r,
            )

            def step(carry, xs):
                prev, st, pt, i = carry
                m_i, s_i, y_i, ed, er = xs
                mu, scale, ctx_sp = mdl.apply(
                    v, m_i, s_i, prev, i == 0,
                    method=mdl.token_context_traced,
                )
                index = build_indexes(scale, scale_table_dev)
                rows = index.reshape(1, L)

                def enc_fn(op):
                    st, pt = op
                    y_slice = y_i.reshape(B, Cp, ws, ws).transpose(
                        0, 2, 3, 1
                    )
                    sym = enc_round(y_slice - mu, narrow).astype(jnp.int32)
                    return sym, st, pt

                def dec_fn(op):
                    st, pt = op
                    vals, st2, pt2 = decode_lanes(
                        words, off, rows, gdev, state=st, ptr=pt
                    )
                    vals = fix_escapes(vals, ed, er)
                    return vals.reshape(B, ws, ws, Cp), st2, pt2

                sym, st, pt = jax.lax.cond(is_enc, enc_fn, dec_fn, (st, pt))
                y_hat = sym.astype(mu.dtype) + mu
                y_hat = y_hat + mdl.apply(
                    v, ctx_sp, y_hat, method=mdl.token_lrp
                )
                tok = y_hat.transpose(0, 3, 1, 2).reshape(B, D)
                prev = jnp.concatenate([prev[:, 1:], tok[:, None]], axis=1)
                return (prev, st, pt, i + 1), (
                    tok, sym, index.astype(jnp.uint8)
                )

            (_, st, pt, _), (toks, syms, idxs) = jax.lax.scan(
                step, (prev0, state0, ptr0, jnp.int32(0)), xs
            )
            return toks, syms, idxs

        @jax.jit
        def lane_layout(syms, idxs):
            N, B = syms.shape[0], syms.shape[1]
            return (
                syms.reshape(N, -1),
                idxs.astype(jnp.int32).reshape(N, -1),
            )

        self._program = functools.partial(program, kit.gauss_dev)
        self._lane_layout = lane_layout

    def encode(self, variables, m_win, s_win, y_tok):
        """-> (wire blobs per image, token list for assembly)."""
        from .device_codec import WIRE_SCAN, _pack_wire

        B, N, D = y_tok.shape
        self.N = N  # _enc_inputs/_encode_tiered key on the segment count
        L = B * D

        def run_pack(inputs):
            toks, syms, idxs = self._program(
                variables, m_win, s_win, y_tok,
                *inputs, jnp.bool_(True),
            )
            vals_T, rows_T = self._lane_layout(syms, idxs)
            enc = self.kit._encode_y(vals_T, rows_T)
            return toks, [
                _pack_wire(*p, fmt=WIRE_SCAN)
                for p in self.kit.fetch_encoded(enc, B)
            ]

        blobs, toks = self._encode_tiered(run_pack, L, N * L, L, D, 1)
        return blobs, [toks[i] for i in range(N)]

    def decode(self, blobs: List[bytes], variables, m_win, s_win, N: int):
        B = len(blobs)
        L = B * self.D
        words32, off, esc_d, esc_r = _wire_inputs(
            self.kit, blobs, N, L, L, N * L
        )
        y_tok = jnp.zeros((B, N, self.D), m_win.dtype)
        toks, _, _ = self._program(
            variables, m_win, s_win, y_tok,
            words32, off, esc_d, esc_r, jnp.bool_(False),
        )
        return [toks[i] for i in range(N)]


class CzigzagScanWire(_StaticScanIO):
    """Scan-codec driver for czigzag's conditioned zigzag AR chain:
    sliding decoded-slice support plus look-ahead windows of BOTH the
    hyper means/scales and the up_x4-derived hyper-context blocks
    (reference ``czigzag.py:1102-1110``). Same one-compile shared-program
    design as :class:`ZigzagScanWire`; mirrors the training-side
    ``czigzag._CzigzagScanStep`` exactly."""

    def __init__(self, model, variables, kit, scale_table_dev,
                 narrow: float = 1.0):
        from .czigzag import _czigzag_dims, stack_czigzag_params

        self.kit = kit
        N, sc, cond_w, max_sup = _czigzag_dims(model)
        self.N, self.sc = int(N), int(sc)
        Wc = cond_w // sc
        self.Wc = Wc
        self._stacked = jax.device_put(
            stack_czigzag_params(variables["params"], model)["czigzag_scan"]
        )
        gdev = kit.gauss_dev
        n_cap = self.N

        @jax.jit
        def program(gdev, p_xs, means_stack, scales_stack, hctx_stack, y_stack,
                    words, off, esc_d, esc_r, is_enc):
            N_, B, h, w, sc_ = y_stack.shape
            n_l = kit.n_lanes(h, w)
            L = B * n_l
            ppl = (h * w) // n_l
            buf0 = jnp.zeros((B, h, w, max_sup * sc_), y_stack.dtype)
            state0, ptr0 = init_lanes(words, off)

            def win(t, s):
                v = jax.lax.dynamic_slice_in_dim(t, s, Wc, 0)
                return jnp.moveaxis(v, 0, 3).reshape(B, h, w, Wc * sc_)

            def step(carry, xs):
                i, buf, st, pt = carry
                p_i, y_i, ed, er = xs
                s = jnp.minimum(i, N_ - Wc)
                cm, cs, hc = (
                    win(means_stack, s), win(scales_stack, s),
                    win(hctx_stack, s),
                )
                mean_support = jnp.concatenate([cm, buf, hc], axis=-1)
                mu = _cc_apply(p_i["cc_mean"], mean_support)
                scale = _cc_apply(
                    p_i["cc_scale"],
                    jnp.concatenate([cs, buf, hc], axis=-1),
                )
                index = build_indexes(scale, scale_table_dev)
                rows = (
                    index.reshape(B, n_l, ppl, sc_)
                    .transpose(2, 3, 0, 1)
                    .reshape(ppl * sc_, L)
                )

                def enc_fn(op):
                    st, pt = op
                    sym = enc_round(y_i - mu, narrow).astype(jnp.int32)
                    return sym, st, pt

                def dec_fn(op):
                    st, pt = op
                    vals, st2, pt2 = decode_lanes(
                        words, off, rows, gdev, state=st, ptr=pt
                    )
                    vals = fix_escapes(vals, ed, er)
                    sym = (
                        vals.reshape(ppl, sc_, B, n_l)
                        .transpose(2, 3, 0, 1)
                        .reshape(B, h, w, sc_)
                    )
                    return sym, st2, pt2

                sym, st, pt = jax.lax.cond(is_enc, enc_fn, dec_fn, (st, pt))
                y_hat = sym.astype(mu.dtype) + mu
                lrp_in = jnp.concatenate([mean_support, y_hat], axis=-1)
                y_hat = y_hat + 0.5 * jnp.tanh(_cc_apply(p_i["lrp"], lrp_in))
                buf = jnp.concatenate([buf[..., sc_:], y_hat], axis=-1)
                return (i + 1, buf, st, pt), (
                    y_hat, sym, index.astype(jnp.uint8)
                )

            (_, _, st, pt), (y_hats, syms, idxs) = jax.lax.scan(
                step,
                (jnp.int32(0), buf0, state0, ptr0),
                (p_xs, y_stack, esc_d, esc_r),
            )
            return y_hats, syms, idxs

        self._program = functools.partial(program, kit.gauss_dev)

    _layout = ZigzagScanWire._layout

    def encode(self, means, scales, hctx, y_stack):
        """Stacked (N, B, h, w, sc) conditioning + latents (the codec's
        merged ``scan_enc_front``/``scan_state`` programs emit them
        stacked); returns (wire blobs per image, stacked y_hat)."""
        _, B, h, w, sc = y_stack.shape
        n_l, L, Ts, seg = self._layout(B, h, w, sc)

        def run_pack(inputs):
            y_hats, syms, idxs = self._program(
                self._stacked, means, scales, hctx, y_stack,
                *inputs, jnp.bool_(True),
            )
            return y_hats, self.kit.encode_y_stack(syms, idxs, fmt=WIRE_SCAN)

        blobs, y_hats = self._encode_tiered(
            run_pack, L, self.N * seg, seg, n_l, Ts
        )
        return blobs, y_hats

    def decode(self, blobs: List[bytes], means, scales, hctx):
        N_, B, h, w, sc = means.shape
        _, L, _, seg = self._layout(B, h, w, sc)
        words32, off, esc_d, esc_r = _wire_inputs(
            self.kit, blobs, self.N, seg, L, self.N * seg
        )
        y_stack = jnp.zeros((self.N, B, h, w, sc), means.dtype)
        y_hats, _, _ = self._program(
            self._stacked, means, scales, hctx, y_stack,
            words32, off, esc_d, esc_r, jnp.bool_(False),
        )
        return y_hats


class CharmScanWire(_StaticScanIO):
    """Scan-codec driver for the classic ChARM protocol (cnn/cnn2/stf):
    PREFIX slice support (the first ``max_support_slices`` reconstructed
    slices condition every later one — reference ``cnn.py:244-249``) and
    CONSTANT hyper conditioning (the full-width h_mean_s/h_scale_s outputs
    enter every slice's context, unlike the zigzag families' sliding
    look-ahead windows).

    Same design as :class:`ZigzagScanWire`: the whole AR chain — context
    convs over stacked per-slice weights (``cnn.stack_charm_params``),
    scale bucketing, and the on-device lane rANS — compiles as ONE
    ``lax.scan`` executed verbatim by both coder sides (a traced
    ``is_encode`` flag picks the symbol source), so the context is
    bit-identical by construction. Scan-wire streams are self-consistent
    but NOT interchangeable with the unrolled per-slice wire (the padded
    fixed-width first conv reduces in a different float order)."""

    def __init__(self, model, variables, kit, scale_table_dev,
                 narrow: float = 1.0):
        self.kit = kit
        if not hasattr(model, "max_support_slices"):
            raise ValueError(
                "CharmScanWire drives prefix-support ChARM models "
                "(cnn/cnn2/stf); sliding-support families use "
                "ZigzagScanWire"
            )
        S = int(model.ctx_slices)
        max_sup = int(model.max_support_slices)
        p = variables["params"]
        last_conv = sorted(
            p["cc_mean_0"], key=lambda n: int(n.split("_")[1])
        )[-1]
        sc = int(p["cc_mean_0"][last_conv]["kernel"].shape[3])
        cond_width = int(p["cc_mean_0"]["Conv_0"]["kernel"].shape[2])
        self.N, self.sc, self.max_sup = S, sc, max_sup
        self._stacked = jax.device_put(
            stack_charm_params(p, S, sc, max_sup, cond_width)["charm_scan"]
        )
        gdev = kit.gauss_dev

        @jax.jit
        def program(gdev, p_xs, means, scales, y_stack,
                    words, off, esc_d, esc_r, is_enc):
            N_, B, h, w, sc_ = y_stack.shape
            n_l = kit.n_lanes(h, w)
            L = B * n_l
            ppl = (h * w) // n_l
            buf0 = jnp.zeros((B, h, w, max_sup * sc_), y_stack.dtype)
            state0, ptr0 = init_lanes(words, off)

            def step(carry, xs):
                i, buf, st, pt = carry
                p_i, y_i, ed, er = xs
                mean_support = jnp.concatenate([means, buf], axis=-1)
                mu = _cc_apply(p_i["cc_mean"], mean_support)
                scale = _cc_apply(
                    p_i["cc_scale"], jnp.concatenate([scales, buf], axis=-1)
                )
                index = build_indexes(scale, scale_table_dev)
                rows = (
                    index.reshape(B, n_l, ppl, sc_)
                    .transpose(2, 3, 0, 1)
                    .reshape(ppl * sc_, L)
                )

                def enc_fn(op):
                    st, pt = op
                    sym = enc_round(y_i - mu, narrow).astype(jnp.int32)
                    return sym, st, pt

                def dec_fn(op):
                    st, pt = op
                    vals, st2, pt2 = decode_lanes(
                        words, off, rows, gdev, state=st, ptr=pt
                    )
                    vals = fix_escapes(vals, ed, er)
                    sym = (
                        vals.reshape(ppl, sc_, B, n_l)
                        .transpose(2, 3, 0, 1)
                        .reshape(B, h, w, sc_)
                    )
                    return sym, st2, pt2

                sym, st, pt = jax.lax.cond(is_enc, enc_fn, dec_fn, (st, pt))
                y_hat = sym.astype(mu.dtype) + mu
                lrp_in = jnp.concatenate([mean_support, y_hat], axis=-1)
                y_hat = y_hat + 0.5 * jnp.tanh(_cc_apply(p_i["lrp"], lrp_in))
                # prefix support: write slot i while i < max_sup, freeze
                slot = jnp.minimum(i, max_sup - 1) * sc_
                updated = jax.lax.dynamic_update_slice(
                    buf, y_hat, (0, 0, 0, slot)
                )
                buf = jnp.where(i < max_sup, updated, buf)
                return (i + 1, buf, st, pt), (
                    y_hat, sym, index.astype(jnp.uint8)
                )

            (_, _, st, pt), (y_hats, syms, idxs) = jax.lax.scan(
                step,
                (jnp.int32(0), buf0, state0, ptr0),
                (p_xs, y_stack, esc_d, esc_r),
            )
            return y_hats, syms, idxs

        self._program = functools.partial(program, kit.gauss_dev)

    _layout = ZigzagScanWire._layout

    def encode(self, state: dict, y_slices: List[jax.Array]):
        """state: ``ctx_prepare`` output (full-width means/scales arrays);
        returns (wire blobs per image, y_hat slice list)."""
        y_stack = self._shard_batch(jnp.stack(y_slices, axis=0), 1)
        means = self._shard_batch(state["means"], 0)
        scales = self._shard_batch(state["scales"], 0)
        _, B, h, w, sc = y_stack.shape
        n_l, L, Ts, seg = self._layout(B, h, w, sc)

        def run_pack(inputs):
            y_hats, syms, idxs = self._program(
                self._stacked, means, scales, y_stack,
                *self._replicated(inputs), jnp.bool_(True),
            )
            return y_hats, self.kit.encode_y_stack(syms, idxs, fmt=WIRE_SCAN)

        blobs, y_hats = self._encode_tiered(
            run_pack, L, self.N * seg, seg, n_l, Ts
        )
        return blobs, [y_hats[i] for i in range(self.N)]

    def decode(self, blobs: List[bytes], state: dict):
        """-> y_hat slice list. The latent grid comes from the
        conditioning: ``ctx_prepare``'s means live at y's resolution."""
        B = len(blobs)
        means = self._shard_batch(state["means"], 0)
        scales = self._shard_batch(state["scales"], 0)
        h, w = means.shape[1], means.shape[2]
        _, L, _, seg = self._layout(B, h, w, self.sc)
        words32, off, esc_d, esc_r = self._replicated(_wire_inputs(
            self.kit, blobs, self.N, seg, L, self.N * seg
        ))
        y_stack = self._shard_batch(
            jnp.zeros((self.N, B, h, w, self.sc), means.dtype), 1
        )
        y_hats, _, _ = self._program(
            self._stacked, means, scales, y_stack,
            words32, off, esc_d, esc_r, jnp.bool_(False),
        )
        return [y_hats[i] for i in range(self.N)]
