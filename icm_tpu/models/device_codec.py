"""Zero-round-trip codec: entropy coding ON the device.

``CharmCodec`` (``codec.py``) mirrors the reference's coder split — float
context on the accelerator, rANS on the host (reference ``cnn.py:306-327``
crosses that boundary once per slice on decode). On a remote-TPU link the
10-24 serial device->host index fetches dominate decode wall-clock
(BASELINE.md: decode MFU 1.9-6.7%). ``DeviceWireCodec`` eliminates the
boundary: symbols are entropy-decoded by the lane-parallel integer rANS in
``coding/device_rans.py`` inside the device queue, so

  - decompress() = one bitstream upload + a chain of ASYNC device
    dispatches (context conv, rANS decode, context conv, ...) + one final
    x_hat fetch — zero intermediate round-trips;
  - compress()   = async forward/quantize dispatches + on-device rANS
    encode + small fetches (lengths/escape counts, then exactly the
    stream words).

Bitexactness: the float context programs are the PARENT's jitted
per-slice functions, shared verbatim between encoder and decoder (the
framework's standing invariant), and the device coder is pure integer
arithmetic — so encoder and decoder derive identical scale rows by
construction and the streams cannot desync.

The wire format is this framework's TPU-native one (per-lane rANS32
streams + an escape side channel; see device_rans.py), NOT the
reference-interoperable host format — use ``CharmCodec(ref_layout=True)``
for reference interchange.

Wire layout per image, one bytes object per stream list entry:
  magic "\\x93IW" | uint8 format | [uint8 tier — scan format only] |
  uint32 n_lanes | uint32 n_words | uint32 n_esc |
  uint16 lengths[n_lanes] | uint16 words[n_words] |
  int32 dest[n_esc] | int32 raw[n_esc]
``dest`` is the flat step-major position (t * n_lanes + lane) in the
image-local decode grid of an escaped symbol whose raw 32-bit value is
``raw`` (see device_rans.fix_escapes).

The leading 4 bytes tag the CONTEXT PROTOCOL the symbols were produced
under, because streams from different protocols are not interchangeable
even though the payload layout is shared: the scan wire's stacked
fixed-width context reduces in a different float order than the unrolled
per-slice programs (scan_codec.py module docstring), so cross-feeding
decodes to silent garbage. The tag turns that into a loud
``WireFormatError``. Host/reference rANS streams stay UNTAGGED — they
must remain byte-identical to the reference coder's output
(tests/test_reference_parity.py asserts cross-decodability against
reference-format streams, reference entropy_models.py:203-290).
"""

from __future__ import annotations

import functools
import struct
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..coding.device_rans import (
    assemble_streams,
    build_device_tables,
    decode_lanes,
    encode_lanes,
    fix_escapes,
    lane_offsets,
)
from ..coding.wire import (  # noqa: F401  (re-exported for the wire users)
    WIRE_DEVICE,
    WIRE_MAGIC,
    WIRE_SCAN,
    WireFormatError,
    reject_framework_wire,
    wire_offset as _wire_offset,
)
from .codec import CharmCodec, enc_round


def _pack_wire(
    lengths: np.ndarray,
    words: np.ndarray,
    dest: np.ndarray,
    raw: np.ndarray,
    fmt: int = WIRE_DEVICE,
) -> bytes:
    head = WIRE_MAGIC + bytes([fmt]) + struct.pack(
        "<III", lengths.shape[0], words.shape[0], dest.shape[0]
    )
    return (
        head
        + lengths.astype("<u2").tobytes()
        + words.astype("<u2").tobytes()
        + dest.astype("<i4").tobytes()
        + raw.astype("<i4").tobytes()
    )


def _unpack_wire(blob, expect: int = WIRE_DEVICE, skip: int = 0):
    o = _wire_offset(blob, expect) + skip
    n_lanes, n_words, n_esc = struct.unpack_from("<III", blob, o)
    o += 12
    lengths = np.frombuffer(blob, "<u2", count=n_lanes, offset=o).astype(
        np.int64
    )
    o += 2 * n_lanes
    words = np.frombuffer(blob, "<u2", count=n_words, offset=o)
    o += 2 * n_words
    dest = np.frombuffer(blob, "<i4", count=n_esc, offset=o)
    o += 4 * n_esc
    raw = np.frombuffer(blob, "<i4", count=n_esc, offset=o)
    return lengths, words, dest, raw


def _round_up(n: int, q: int = 4096) -> int:
    return ((n + q - 1) // q) * q


def _pad_to(a: np.ndarray, n: int, fill) -> np.ndarray:
    out = np.full((n,), fill, a.dtype)
    out[: a.shape[0]] = a
    return out


class DeviceWireKit:
    """Reusable on-device entropy-coding stage bundle.

    Owns the jitted lane-layout/encode/decode programs over one Gaussian
    scale-table and any number of named EntropyBottleneck tables, plus the
    host-side wire assembly. ``DeviceWireCodec`` (ChARM protocol) and the
    device-wire modes of the CRC/czigzag codecs all drive their entropy
    coding through one kit, so the wire format and its measured gather
    economics (see coding/device_rans.py) are defined in exactly one
    place.

    ``lanes_per_image``: independent rANS streams per image for Gaussian-
    coded tensors; ``z_lane_groups``: channel groups for bottleneck-coded
    tensors (lane = pixel x group, serial depth C/groups).
    """

    def __init__(
        self,
        tables,
        lanes_per_image: int = 1024,
        z_lane_groups: int = 8,
    ):
        self.lanes_per_image = lanes_per_image
        self.z_lane_groups = z_lane_groups
        self.gauss_dev = build_device_tables(tables.gaussian)
        self.eb_dev = {
            k: build_device_tables(t) for k, t in tables.bottlenecks.items()
        }
        # the coder tables are ARGUMENTS of every jitted program below
        # (partial-bound so callers keep the old signatures): closed-over
        # tables would be baked into the executables as multi-MB constants
        # — see the pytree-registration note in coding/device_rans.py

        @functools.partial(jax.jit, static_argnums=(1,))
        def to_lanes(a, n_l):
            """(B, h, w, C) -> (ppl*C, B*n_l) step-major lane layout."""
            B, h, w, C = a.shape
            ppl = (h * w) // n_l
            a = a.reshape(B, n_l, ppl, C).transpose(2, 3, 0, 1)
            return a.reshape(ppl * C, B * n_l)

        @functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
        def from_lanes(vals, B, h, w, C):
            """(ppl*C, B*n_l) decoded values -> (B, h, w, C)."""
            n_l = vals.shape[1] // B
            ppl = (h * w) // n_l
            a = vals.reshape(ppl, C, B, n_l).transpose(2, 3, 0, 1)
            return a.reshape(B, h, w, C)

        @jax.jit
        def encode_y(gdev, vals_T, rows_T):
            return encode_lanes(vals_T, rows_T, gdev)

        @functools.partial(jax.jit, static_argnums=(4,))
        def decode_y_slice(
            gdev, words, off, index_u8, n_l, state, ptr, dest, raw
        ):
            B, h, w, C = index_u8.shape
            rows = to_lanes(index_u8.astype(jnp.int32), n_l)
            vals, state, ptr = decode_lanes(
                words, off, rows, gdev, state=state, ptr=ptr
            )
            vals = fix_escapes(vals, dest, raw)
            return from_lanes(vals, B, h, w, C), state, ptr

        def _z_rows(edev, G, n_px):
            """(C/G, n_px*G) row map: lane (px, g) decodes channels
            g*C/G .. (g+1)*C/G-1 in order."""
            C = edev.num_rows
            r = (
                jnp.arange(C, dtype=jnp.int32)
                .reshape(G, C // G)
                .T[:, None, :]
            )  # (C/G, 1, G)
            return jnp.broadcast_to(r, (C // G, n_px, G)).reshape(
                C // G, n_px * G
            )

        @jax.jit
        def encode_z(edev, z_sym):
            B, zh, zw, C = z_sym.shape
            G = self._groups(edev)
            v = z_sym.reshape(B * zh * zw, G, C // G).transpose(2, 0, 1)
            vals = v.reshape(C // G, B * zh * zw * G)
            return encode_lanes(vals, _z_rows(edev, G, B * zh * zw), edev)

        @functools.partial(jax.jit, static_argnums=(3, 4, 5))
        def decode_z(edev, words, off, B, zh, zw, dest, raw):
            C = edev.num_rows
            G = self._groups(edev)
            vals, _, _ = decode_lanes(
                words, off, _z_rows(edev, G, B * zh * zw), edev
            )
            vals = fix_escapes(vals, dest, raw)
            v = vals.reshape(C // G, B * zh * zw, G).transpose(1, 2, 0)
            return v.reshape(B, zh, zw, C)

        self._encode_z_fns = {
            k: functools.partial(encode_z, e) for k, e in self.eb_dev.items()
        }
        self._decode_z_fns = {
            k: functools.partial(decode_z, e) for k, e in self.eb_dev.items()
        }

        @functools.partial(jax.jit, static_argnums=(3,))
        def encode_y_stack(gdev, syms, idxs, n_l):
            """(N, B, h, w, sc) stacked slices -> the same lane layout
            encode_y_slices builds from per-slice lists."""
            N, B, h, w, sc = syms.shape
            ppl = (h * w) // n_l

            def lay(a):
                return (
                    a.reshape(N, B, n_l, ppl, sc)
                    .transpose(0, 3, 4, 1, 2)
                    .reshape(N * ppl * sc, B * n_l)
                )

            return encode_lanes(lay(syms), lay(idxs.astype(jnp.int32)), gdev)

        self.to_lanes = to_lanes
        self.from_lanes = from_lanes
        self._encode_y = functools.partial(encode_y, self.gauss_dev)
        self._encode_y_stack = functools.partial(
            encode_y_stack, self.gauss_dev
        )
        self._decode_y_slice = functools.partial(
            decode_y_slice, self.gauss_dev
        )

    # --- layout ---------------------------------------------------------
    def n_lanes(self, h: int, w: int) -> int:
        n_l = min(self.lanes_per_image, h * w)
        while (h * w) % n_l:
            n_l -= 1
        return n_l

    def _groups(self, edev) -> int:
        C = edev.num_rows
        G = min(self.z_lane_groups, C)
        while C % G:
            G -= 1
        return G

    # --- encode side ------------------------------------------------------
    @staticmethod
    def fetch_encoded(enc_out, B: int):
        """(buf, lengths, dest, raw, n_esc) from encode_lanes -> per-image
        (lengths, decode-order words, image-local dest, raw) host arrays.

        Fetch order: scalars/lengths first (tiny), then the word buffer
        sliced to the actual maximum and the escape arrays sliced to the
        actual count — ~the bitstream size, not the worst-case bound.
        """
        buf, lengths, dest, raw, n_esc = enc_out
        lanes = buf.shape[0]
        n_l = lanes // B
        len_h, n_esc_h = jax.device_get((lengths, n_esc))
        len_h = np.asarray(len_h)
        ne = int(n_esc_h)
        # uint16 on the wire: words are 16-bit; halves the bulk fetch
        buf_h = np.asarray(
            jax.device_get(buf[:, : int(len_h.max())].astype(jnp.uint16))
        )
        if ne:
            dest_h, raw_h = map(
                np.asarray, jax.device_get((dest[:ne], raw[:ne]))
            )
        else:
            dest_h = np.zeros(0, np.int32)
            raw_h = np.zeros(0, np.int32)
        # global flat dest = t * (B*n_l) + b*n_l + l  ->  per-image local
        t = dest_h // lanes
        lane = dest_h - t * lanes
        img = lane // n_l
        local = t * n_l + (lane - img * n_l)
        out = []
        for b in range(B):
            sel = img == b
            out.append(
                (
                    len_h[b * n_l : (b + 1) * n_l],
                    assemble_streams(
                        buf_h[b * n_l : (b + 1) * n_l],
                        len_h[b * n_l : (b + 1) * n_l],
                    ),
                    local[sel].astype(np.int32),
                    raw_h[sel].astype(np.int32),
                )
            )
        return out

    def encode_y_slices(self, sym32s, idxs) -> List[bytes]:
        """Gaussian-coded AR tensor: per-slice (B, h, w, sc) int32 symbols
        + uint8 scale indexes, concatenated step-major in slice order, one
        device encode, one wire blob per image."""
        B, h, w, _ = sym32s[0].shape
        n_l = self.n_lanes(h, w)
        vals_T = jnp.concatenate(
            [self.to_lanes(s, n_l) for s in sym32s], axis=0
        )
        rows_T = jnp.concatenate(
            [self.to_lanes(i.astype(jnp.int32), n_l) for i in idxs], axis=0
        )
        enc = self._encode_y(vals_T, rows_T)
        return [_pack_wire(*p) for p in self.fetch_encoded(enc, B)]

    def encode_z(self, z_sym, key: str) -> List[bytes]:
        """Bottleneck-coded tensor (device int32 (B, zh, zw, C))."""
        enc = self._encode_z_fns[key](z_sym)
        return [_pack_wire(*p) for p in self.fetch_encoded(enc, z_sym.shape[0])]

    def encode_y_stack(self, syms, idxs, fmt: int = WIRE_DEVICE) -> List[bytes]:
        """Stacked (N, B, h, w, sc) device symbols + scale indexes (the
        scan codec's outputs) -> the standard y wire, one blob/image.
        Scan wires pass ``fmt=WIRE_SCAN`` so their streams are tagged
        with the context protocol that produced the symbols."""
        N, B, h, w, sc = syms.shape
        enc = self._encode_y_stack(syms, idxs, self.n_lanes(h, w))
        return [_pack_wire(*p, fmt=fmt) for p in self.fetch_encoded(enc, B)]

    def encode_gaussian(self, sym, index) -> List[bytes]:
        """One-shot Gaussian-coded tensor: (B, h, w, C) int32 symbols +
        same-shape scale indexes (any int dtype), one wire per image.
        Decode side: :meth:`decode_gaussian`."""
        return self.encode_y_slices([sym], [index])

    # --- decode side ------------------------------------------------------
    @staticmethod
    def upload_words(blobs: List[bytes]):
        """Concatenate per-image wires into one flat padded word array +
        per-lane offsets + merged global escape arrays (host numpy).
        Bucketed padding: only the integer decode programs see the words
        shape, so recompiles per bucket cannot perturb the float context."""
        lens, words, offs, dests, raws = [], [], [], [], []
        base = 0
        B = len(blobs)
        n_l = None
        for b, blob in enumerate(blobs):
            lengths, w, dest, raw = _unpack_wire(blob)
            n_l = lengths.shape[0]
            offs.append(lane_offsets(lengths) + base)
            base += int(w.shape[0])
            lens.append(lengths)
            words.append(w)
            # image-local (t*n_l + l) -> global (t*(B*n_l) + b*n_l + l)
            t = dest // n_l
            l = dest - t * n_l
            dests.append(t * (B * n_l) + b * n_l + l)
            raws.append(raw)
        flat = np.concatenate(words)
        pad = _round_up(max(flat.shape[0], 1))
        flat = np.pad(flat, (0, pad - flat.shape[0]))
        dev_words = jnp.asarray(flat)  # uint16 upload; widened on device
        dev_off = jnp.asarray(np.concatenate(offs).astype(np.int32))
        dest = np.concatenate(dests).astype(np.int64)
        raw = np.concatenate(raws).astype(np.int32)
        order = np.argsort(dest, kind="stable")  # step-major across images
        return dev_words, dev_off, dest[order], raw[order]

    @staticmethod
    def esc_segment(dest, raw, lo: int, hi: int, cap: int | None = None):
        """Escapes with global flat position in [lo, hi) -> device arrays
        rebased to the segment grid, padded to a bucket (drop-scatter
        ignores the padding).

        ``cap``: pad size. Callers decoding several segments of one wire
        pass ONE cap for all of them (the segment shape is part of the
        jitted decode program's signature — per-segment caps would
        recompile per slice, ~30 s of tunnel compiles per new batch)."""
        a = np.searchsorted(dest, lo, side="left")
        b = np.searchsorted(dest, hi, side="left")
        seg = (dest[a:b] - lo).astype(np.int32)
        n = max(int(b - a), 1)
        if cap is None:
            cap = max(64, 1 << (n - 1).bit_length())
        fill = hi - lo  # out of grid -> dropped
        return (
            jnp.asarray(_pad_to(seg, cap, np.int32(fill))),
            jnp.asarray(_pad_to(raw[a:b].astype(np.int32), cap, 0)),
        )

    @staticmethod
    def esc_cap(dest, n_segs: int, seg_size: int) -> int:
        """One shared pad size: the largest per-segment escape count of
        this wire, bucketed to a power of two."""
        if dest.shape[0] == 0:
            return 64
        counts = np.bincount(
            (dest // seg_size).astype(np.int64), minlength=n_segs
        )
        n = int(counts.max())
        return max(64, 1 << max(n - 1, 1).bit_length())

    def decode_z(self, blobs: List[bytes], zh: int, zw: int, key: str):
        """-> device int32 symbols (B, zh, zw, C)."""
        words, off, dest, raw = self.upload_words(blobs)
        edev = self.eb_dev[key]
        B = len(blobs)
        G = self._groups(edev)
        n_lz = B * zh * zw * G
        Tz = edev.num_rows // G
        zd, zr = self.esc_segment(
            dest, raw, 0, Tz * n_lz, cap=self.esc_cap(dest, 1, Tz * n_lz)
        )
        return self._decode_z_fns[key](
            words.astype(jnp.int32), off, B, zh, zw, zd, zr
        )

    def decode_gaussian(self, blobs: List[bytes], index_u8):
        """One-shot Gaussian-coded tensor: index (B, h, w, C) device
        uint8 -> device int32 symbols of the same shape."""
        words, off, dest, raw = self.upload_words(blobs)
        B, h, w, C = index_u8.shape
        n_l = self.n_lanes(h, w)
        total = ((h * w) // n_l) * C * B * n_l
        d, r = self.esc_segment(
            dest, raw, 0, total, cap=self.esc_cap(dest, 1, total)
        )
        sym, _, _ = self._decode_y_slice(
            words.astype(jnp.int32), off, index_u8, n_l, None, None, d, r
        )
        return sym

    def y_stream_decoder(self, blobs: List[bytes], n_slices: int):
        """Stateful per-wire chain decoder for slice-AR tensors (symbols
        were encoded with :meth:`encode_y_slices`)."""
        return _YStreamDecoder(self, blobs, n_slices)


class _YStreamDecoder:
    """Carries the lane decode state across the AR slice chain: every
    ``decode_slice`` is ONE async device dispatch (no round-trips)."""

    def __init__(self, kit: DeviceWireKit, blobs: List[bytes], n_slices: int):
        self.kit = kit
        self.n_slices = n_slices
        self.B = len(blobs)
        words, off, self.dest, self.raw = kit.upload_words(blobs)
        self.words32 = words.astype(jnp.int32)
        self.off = off
        self.state = self.ptr = None
        self.i = 0
        self._n_l = self._cap = self._Ts = self._L = None

    def decode_slice(self, index_u8):
        kit = self.kit
        if self._n_l is None:
            _, h, w, C = index_u8.shape
            self._n_l = kit.n_lanes(h, w)
            self._L = self.B * self._n_l
            self._Ts = ((h * w) // self._n_l) * C
            self._cap = kit.esc_cap(
                self.dest, self.n_slices, self._Ts * self._L
            )
        lo = self.i * self._Ts * self._L
        d, r = kit.esc_segment(
            self.dest, self.raw, lo, lo + self._Ts * self._L, cap=self._cap
        )
        sym, self.state, self.ptr = kit._decode_y_slice(
            self.words32, self.off, index_u8, self._n_l,
            self.state, self.ptr, d, r,
        )
        self.i += 1
        return sym


class DeviceWireCodec(CharmCodec):
    """ChARM codec with on-device entropy coding.

    ``lanes_per_image``: independent rANS streams per image for the y
    latent (more lanes = wider decode vectorization but +4 B/lane flush
    overhead; the per-slice serial depth is ``h*w/lanes * C_slice``).
    z lanes split both hyper-pixels and channel groups.
    """

    def __init__(
        self,
        *args,
        lanes_per_image: int = 1024,
        z_lane_groups: int = 8,
        scan_wire: bool = False,
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        if self.ref_layout:
            raise ValueError(
                "DeviceWireCodec defines its own wire; ref_layout applies "
                "to the host coder only"
            )
        self._wants_packed = False  # the packed HOST wire is never fetched
        self.lanes_per_image = lanes_per_image
        # z symbols are fully independent (factorized prior), so lanes can
        # split the channel axis too: z lanes = pixels x channel groups,
        # serial depth C/groups instead of C (the z scan was 192 steps at
        # only B*zh*zw lanes — a measured decode hot spot at 512px)
        self.z_lane_groups = z_lane_groups
        self.kit = DeviceWireKit(
            self.tables,
            lanes_per_image=lanes_per_image,
            z_lane_groups=z_lane_groups,
        )
        # scan_wire: the whole AR chain as ONE lax.scan shared by both
        # coder sides — one compile per direction instead of ~3 programs
        # x ctx_slices. CharmScanWire drives the classic prefix-support
        # families (cnn/cnn2/stf); ZigzagSwinScanWire drives the stf5-8
        # zigzag family (per-slice Swin refiners in the context).
        from .stf_family import ZigzagSwinCodec

        self.scan_wire = scan_wire
        if scan_wire and not (
            hasattr(self.model, "max_support_slices")
            or isinstance(self.model, ZigzagSwinCodec)
        ):
            # sliding-support charm-protocol models without the CRC
            # driver structure (stf10's prompt-conditioned coder,
            # oj_ICM): their conditioning mixes model-level adapters
            # into the coder context, which the one-scan wires do not
            # model — serve them over the protocol-generic unrolled
            # device wire instead of failing.
            self.scan_wire = scan_wire = False
        if scan_wire:
            from .scan_codec import CharmScanWire, ZigzagSwinScanWire

            wire_cls = (
                ZigzagSwinScanWire
                if isinstance(self.model, ZigzagSwinCodec)
                else CharmScanWire
            )
            self._scan = wire_cls(
                self.model, self.variables, self.kit,
                self._scale_table_dev, narrow=self.narrow,
            )
            # SPMD: the wire canonicalizes its program inputs' shardings
            # so both coder sides run ONE executable (scan_codec
            # _StaticScanIO._shard_batch rationale)
            self._scan.sharding = self.data_sharding
            mdl = self.model
            narrow_f = self.narrow

            # merged scan-path stages (see crc_codec._CharmLayerDriver
            # scan_* rationale): ONE encode-front program and ONE
            # conditioning program SHARED verbatim by both coder sides
            @jax.jit
            def scan_enc_front(v, x):
                def f(m):
                    y, z = m.analyze(x)
                    med = m.eb_medians()
                    z_sym = enc_round(z - med, narrow_f).astype(jnp.int32)
                    return z_sym, m.latent_slices(y)

                return mdl.apply(v, method=f)

            @jax.jit
            def scan_state(v, z_sym):
                def f(m):
                    z_hat = z_sym.astype(jnp.float32) + m.eb_medians()
                    return m.ctx_prepare(z_hat)

                return mdl.apply(v, method=f)

            self._scan_enc_front = scan_enc_front
            self._scan_state = scan_state

    def _compress_group(self, x, return_debug: bool = False) -> Dict[str, Any]:
        if self.scan_wire:
            return self._compress_group_scan(x, return_debug)
        pend = self._compress_dispatch(x)
        v = self.variables
        B = x.shape[0]
        y_strings = self.kit.encode_y_slices(pend["sym32s"], pend["idxs"])
        z_strings = self.kit.encode_z(pend["z_sym"], "entropy_bottleneck")

        out = {"strings": [y_strings, z_strings], "shape": pend["shape"]}
        if return_debug:
            y_hat, x_hat = self._step_assemble(
                v, self.model.ctx_slices - 1, pend["y_hat_slices"],
                *pend["last_args"],
            )
            out["y_hat"] = y_hat
            out["z_hat"] = pend["z_hat"]
        return out

    def _put_data(self, a):
        """Canonicalize a (B, ...) array to the codec's data sharding.
        Under SPMD the encoder derives z_sym from the sharded input while
        the decoder's comes from the (replicated) wire upload — without
        this, the shared conditioning program compiles per-sharding twins
        whose float outputs differ between coder sides and the scan
        desyncs (caught by dryrun_multichip's sharded scan roundtrip)."""
        if self.data_sharding is None:
            return a
        return jax.device_put(a, self.data_sharding)

    def _compress_group_scan(
        self, x, return_debug: bool = False
    ) -> Dict[str, Any]:
        """Scan-wire encode: one merged front program (analyze + z
        quantize + latent slices), the shared conditioning program, then
        the whole AR loop as the shared one-compile scan program."""
        v = self.variables
        z_sym, y_slices = self._scan_enc_front(v, x)
        z_sym = self._put_data(z_sym)
        z_strings = self.kit.encode_z(z_sym, "entropy_bottleneck")
        state = self._scan_state(v, z_sym)
        y_strings, y_hat_slices = self._scan.encode(state, y_slices)
        out = {
            "strings": [y_strings, z_strings],
            "shape": (int(z_sym.shape[1]), int(z_sym.shape[2])),
        }
        if return_debug:
            y_hat, x_hat = self._assemble_synthesize(v, y_hat_slices)
            out["y_hat"] = y_hat
            out["z_hat"] = self._z_dequant(v, z_sym)
            out["x_hat"] = x_hat
        return out

    # --- decompress ---------------------------------------------------------
    def _decompress_group(self, y_strings, z_strings, shape) -> Dict[str, Any]:
        if self.scan_wire:
            return self._decompress_group_scan(y_strings, z_strings, shape)
        v = self.variables
        zh, zw = shape
        S = self.model.ctx_slices

        # enqueue the (big) y upload first: it rides the transfer engine
        # while the z decode and context-prepare programs run
        ydec = self.kit.y_stream_decoder(y_strings, S)
        z_sym = self.kit.decode_z(z_strings, zh, zw, "entropy_bottleneck")
        z_hat = self._z_dequant(v, z_sym)
        state = self._ctx_prepare(v, z_hat)

        y_hat_slices: List[jax.Array] = []
        mu, _, index, mean_support = self._slice_context(v, 0, state, [])
        for i in range(S):
            sym = ydec.decode_slice(index)
            if i + 1 < S:
                out = self._step(
                    v, i, state, y_hat_slices, sym, mu, mean_support
                )
                y_hat_slices.append(out[0])
                mu, index, mean_support = out[1], out[2], out[3]
            else:
                y_hat, x_hat = self._step_assemble(
                    v, i, y_hat_slices, sym, mu, mean_support
                )
        return {"x_hat": x_hat, "y_hat": y_hat}

    def _decompress_group_scan(
        self, y_strings, z_strings, shape
    ) -> Dict[str, Any]:
        v = self.variables
        zh, zw = shape
        z_sym = self._put_data(
            self.kit.decode_z(z_strings, zh, zw, "entropy_bottleneck")
        )
        state = self._scan_state(v, z_sym)
        y_hat_slices = self._scan.decode(y_strings, state)
        y_hat, x_hat = self._assemble_synthesize(v, y_hat_slices)
        return {"x_hat": x_hat, "y_hat": y_hat}
