"""Real-bitstream coder for the layered CRC models (stf9/stf11).

The reference never shipped working compress/decompress for the CRC
family (SURVEY.md §0: only cnn and stf have sound coder paths); this is a
new, self-consistent design:

  strings = [machine_y, machine_z, human_y, human_z]

  - machine layer: the zigzag ChARM coder, coded exactly like
    ``CharmCodec`` (shared jitted per-slice functions on both sides);
  - human layer: one-shot conditional Gaussian — indexes from the
    hyper-decoded scales, means as quantization offsets (the decoder
    reproduces the conditioning image ``human_g_s2(y_hat)`` and the
    context decoders from the machine latent, so only the residual layer
    bitstreams are transmitted).

Everything device-side is jitted; symbols cross to the host once per
stage into the threaded rANS.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from .. import coding
from ..entropy import build_indexes
from .base import CodecTables
from .codec import _eb_indexes, build_codec_tables, enc_round
from .pipelining import group_bounds, merge_outputs, run_groups, split_strings


@functools.partial(jax.jit, static_argnums=(2,))
def _q_sym(t, offset, narrow):
    """Device-side symbol quantization (int32, stays on device)."""
    return enc_round(t - offset, narrow).astype(jnp.int32)


@jax.jit
def _dq_sym(sym, offset):
    return sym.astype(jnp.float32) + offset


def _device_charm_loop(driver, v, state, ctx_slices, support_fn,
                       y_slices=None, ydec=None):
    """The charm layer AR loop against the DEVICE wire: encode keeps
    symbols/indexes on device (no per-slice fetch at all); decode pulls
    each slice's symbols from a ``_YStreamDecoder`` — one async device
    dispatch per slice, zero round-trips (the host codec path crosses the
    link once per slice on decode, reference cnn.py:306-327)."""
    slices, sym32s, idxs = [], [], []
    mu, _, index, ms = driver.slice_context(v, 0, state, support_fn(0, []))
    for i in range(ctx_slices):
        if ydec is None:
            _, _, sym = driver.quantize(v, i, y_slices[i], mu)
        else:
            sym = ydec.decode_slice(index)
        out = driver.step(
            v, i, support_fn, state, slices, sym, mu, ms, ctx_slices
        )
        sym32s.append(sym)
        idxs.append(index)
        slices.append(out[0])
        if len(out) > 1:
            mu, index, ms = out[1], out[2], out[3]
    return slices, sym32s, idxs


def _device_encode_layer(codec, driver, v, y, z_key, ctx_slices, support_fn,
                         z=None):
    """Charm layer encode over the device wire: z + y coded by the
    lane-parallel on-device rANS (DeviceWireKit)."""
    kit = codec.kit
    if z is None:
        z = driver.h_a(v, y)
    med = driver.eb_medians(v)
    z_sym = _q_sym(z, med, codec.narrow)
    z_strings = kit.encode_z(z_sym, z_key)
    z_hat = _dq_sym(z_sym, med)
    state = driver.ctx_prepare(v, z_hat)
    y_slices = driver.latent_slices(v, y)
    slices, sym32s, idxs = _device_charm_loop(
        driver, v, state, ctx_slices, support_fn, y_slices=y_slices
    )
    y_strings = kit.encode_y_slices(sym32s, idxs)
    return y_strings, z_strings, driver.assemble(v, slices), z.shape[1:3]


def _device_decode_layer(codec, driver, v, y_strings, z_strings, shape_hw,
                         z_key, ctx_slices, support_fn):
    kit = codec.kit
    # y upload first: it rides the transfer engine under the z decode
    ydec = kit.y_stream_decoder(y_strings, ctx_slices)
    zh, zw = shape_hw
    z_sym = kit.decode_z(z_strings, zh, zw, z_key)
    med = driver.eb_medians(v)
    z_hat = _dq_sym(z_sym, med)
    state = driver.ctx_prepare(v, z_hat)
    slices, _, _ = _device_charm_loop(
        driver, v, state, ctx_slices, support_fn, ydec=ydec
    )
    return driver.assemble(v, slices)


def _scan_encode_layer(codec, driver, scanw, v, y, z_key):
    """Charm layer encode over the SCAN wire (models/scan_codec.py): z on
    the kit lanes, the whole y AR chain as one lax.scan program. Four
    device programs total (enc front, shared conditioning, the scan,
    assembly) — the conditioning program is the SAME executable
    ``_scan_decode_layer`` runs, so the scan's float inputs match the
    decoder's bit-for-bit."""
    kit = codec.kit
    z_sym, y_stack = driver.scan_enc_front(v, y)
    z_strings = kit.encode_z(z_sym, z_key)
    means, scales = driver.scan_state(v, z_sym)
    y_strings, y_hats = scanw.encode(means, scales, y_stack)
    return (
        y_strings, z_strings, driver.scan_assemble(v, y_hats),
        (int(z_sym.shape[1]), int(z_sym.shape[2])),
    )


def _scan_decode_layer(codec, driver, scanw, v, y_strings, z_strings,
                       shape_hw, z_key):
    kit = codec.kit
    z_sym = kit.decode_z(z_strings, shape_hw[0], shape_hw[1], z_key)
    means, scales = driver.scan_state(v, z_sym)
    return driver.scan_assemble(v, scanw.decode(y_strings, means, scales))


def _make_kit(codec, wire: str):
    """Attach a DeviceWireKit when ``wire='device'``; the host wire needs
    none. The device wire is this framework's TPU-native format (NOT
    reference-interoperable — see device_codec.py docstring)."""
    if wire not in ("host", "device"):
        raise ValueError(f"wire must be 'host' or 'device', got {wire!r}")
    codec.wire = wire
    if wire == "device":
        from .device_codec import DeviceWireKit

        codec.kit = DeviceWireKit(codec.tables)


def _make_scans(codec, scan_wire: bool, scale_table_dev, layers: dict):
    """Attach per-layer ``ZigzagScanWire`` drivers (scan_codec.py) keyed
    by the `_CharmLayerDriver` name; ``layers[name] = (getter, path)``."""
    codec.scan_wire = scan_wire
    if not scan_wire:
        return
    if codec.wire != "device":
        raise ValueError("scan_wire requires wire='device'")
    from .scan_codec import ZigzagScanWire

    codec._scans = {
        name: ZigzagScanWire(
            codec.model, codec.variables, getter, path, codec.kit,
            scale_table_dev, narrow=codec.narrow,
        )
        for name, (getter, path) in layers.items()
    }


class CRCCodec:
    """compress/decompress for ``ConditionalResidualCoding`` (stf9/stf11)."""

    def __init__(self, model, variables,
                 tables: CodecTables | None = None,
                 narrow: float = 1.0,
                 wire: str = "host",
                 scan_wire: bool = False):
        self.narrow = narrow  # see codec.enc_round
        self.model = model
        self.variables = variables
        self.tables = tables or build_codec_tables(model, variables)
        self._scale_table_dev = jnp.asarray(self.tables.scale_table)
        _make_kit(self, wire)
        _make_scans(
            self, scan_wire, self._scale_table_dev,
            {"machine": (lambda m: m.machine.coder, ("machine", "coder"))},
        )
        mdl = model

        # --- machine layer stages (delegating into model.machine.coder) ---
        def _coder(m):
            return m.machine.coder

        @jax.jit
        def m_analyze(v, x):
            def f(m):
                y = m.machine.g_a(x)
                return y, _coder(m).h_a(y)

            return mdl.apply(v, method=f)

        # machine charm layer: shared stage driver (uint8 indexes, fused
        # reconstruct+next-context step, async encode loop)
        from .base import sliding_support

        self._machine = _CharmLayerDriver(
            model, self._scale_table_dev, _coder, "machine", narrow=narrow,
            variables=variables, param_path=("machine", "coder"),
        )
        self._support = sliding_support(model.max_support)

        # --- human layer stages (merged — see CRC3Codec rationale) --------
        @jax.jit
        def human_enc_front(v, x, y_hat):
            """-> (human_y, hz_sym) (reference stf9.py:1132-1136
            semantics; h_a + medians + quantize folded in)."""
            def f(m):
                hy, hz = m.human_encode(x, y_hat)
                med = m.human_eb_medians()
                return hy, enc_round(hz - med, narrow).astype(jnp.int32)

            return mdl.apply(v, method=f)

        @jax.jit
        def human_hyper(v, hz_sym):
            """SHARED by compress and decompress (one executable)."""
            def f(m):
                z_hat = hz_sym.astype(jnp.float32) + m.human_eb_medians()
                return (
                    m.human_hyper.h_mean_s(z_hat),
                    m.human_hyper.h_scale_s(z_hat),
                )

            means, scales = mdl.apply(v, method=f)
            return means, build_indexes(scales, self._scale_table_dev)

        @jax.jit
        def human_decode(v, sym, means, y_hat):
            human_y_hat = sym.astype(jnp.float32) + means
            return jnp.clip(
                mdl.apply(
                    v, human_y_hat, y_hat, method=mdl.human_synthesize
                ),
                0.0, 1.0,
            )

        self._m_analyze = m_analyze
        self._human_enc_front = human_enc_front
        self._human_hyper = human_hyper
        self._human_decode = human_decode

    # --- z coding shared ----------------------------------------------------
    def _code_z(self, sym: np.ndarray, table_key: str) -> List[bytes]:
        t = self.tables.bottlenecks[table_key]
        B, h, w, C = sym.shape
        idx = np.broadcast_to(_eb_indexes((h, w), C), (B, h * w * C))
        return coding.encode_batch(
            sym.reshape(B, -1), idx, t.quantized_cdf, t.cdf_length, t.offset
        )

    def _decode_z(self, strings, shape_hw, table_key: str) -> np.ndarray:
        t = self.tables.bottlenecks[table_key]
        h, w = shape_hw
        C = t.num_distributions
        B = len(strings)
        idx = np.broadcast_to(_eb_indexes((h, w), C), (B, h * w * C))
        sym = coding.decode_batch(
            strings, idx, t.quantized_cdf, t.cdf_length, t.offset
        )
        return sym.reshape(B, h, w, C)

    # --- machine layer charm loop (shared by both directions) ---------------
    def _machine_decode_loop(self, v, state, decoder=None, y_slices=None):
        gt = self.tables.gaussian
        lut = gt.symbol_lut() if decoder is not None else None
        return self._machine.run_loop(
            v, state, self.model.num_slices * 4, self._support, gt,
            decoder=decoder, y_slices=y_slices, lut=lut,
        )

    # --- public API ----------------------------------------------------------
    def compress(
        self, x, return_debug: bool = False, pipeline_groups: int = 1
    ) -> Dict[str, Any]:
        """``pipeline_groups``: see ``CharmCodec.compress`` — symmetric
        stream-group pipelining (groups run on threads; the blocking
        index fetches and native rANS release the GIL, overlapping with
        the other groups' device work). MUST match decompress."""
        bounds = group_bounds(x.shape[0], pipeline_groups)
        if len(bounds) > 2:
            outs = run_groups(
                lambda a, b: self._compress_group(x[a:b], return_debug),
                list(zip(bounds[:-1], bounds[1:])),
            )
            return merge_outputs(outs, ("y_hat", "x_hat"))
        return self._compress_group(x, return_debug)

    def _compress_group(self, x, return_debug: bool = False) -> Dict[str, Any]:
        v = self.variables
        y, z = self._m_analyze(v, x)
        B = x.shape[0]
        zh, zw = z.shape[1], z.shape[2]

        if self.wire == "device" and self.scan_wire:
            y_strings, z_strings, y_hat, _ = _scan_encode_layer(
                self, self._machine, self._scans["machine"], v, y,
                "entropy_bottleneck",
            )
        elif self.wire == "device":
            y_strings, z_strings, y_hat, _ = _device_encode_layer(
                self, self._machine, v, y, "entropy_bottleneck",
                self.model.num_slices * 4, self._support, z=z,
            )
        else:
            z_sym = np.asarray(jax.device_get(
                enc_round(z - self._machine.eb_medians(v), self.narrow)
                .astype(jnp.int32)
            ))
            z_strings = self._code_z(z_sym, "entropy_bottleneck")
            z_hat = (
                jnp.asarray(z_sym, jnp.float32) + self._machine.eb_medians(v)
            )

            state = self._machine.ctx_prepare(v, z_hat)
            y_slices = self._machine.latent_slices(v, y)
            slices, sym_list, idx_list = self._machine_decode_loop(
                v, state, decoder=None, y_slices=y_slices
            )
            gt = self.tables.gaussian
            y_strings = coding.encode_batch(
                np.concatenate(sym_list, axis=1),
                np.concatenate(idx_list, axis=1),
                gt.quantized_cdf, gt.cdf_length, gt.offset,
            )
            y_hat = self._machine.assemble(v, slices)

        # human layer (one-shot hyperprior; reference stf9.py:1132-1160)
        human_y, hz_sym_dev = self._human_enc_front(v, x, y_hat)
        if self.wire == "device":
            hz_strings = self.kit.encode_z(
                hz_sym_dev, "entropy_bottleneck_human"
            )
        else:
            hz_sym = np.asarray(jax.device_get(hz_sym_dev))
            hz_strings = self._code_z(hz_sym, "entropy_bottleneck_human")
        means, index = self._human_hyper(v, hz_sym_dev)
        hy_sym_dev = _q_sym(human_y, means, self.narrow)
        if self.wire == "device":
            hy_strings = self.kit.encode_gaussian(hy_sym_dev, index)
        else:
            gt = self.tables.gaussian
            hy_sym = np.asarray(jax.device_get(hy_sym_dev))
            hy_idx = np.asarray(jax.device_get(index))
            hy_strings = coding.encode_batch(
                hy_sym.reshape(B, -1), hy_idx.reshape(B, -1),
                gt.quantized_cdf, gt.cdf_length, gt.offset,
            )

        out = {
            "strings": [y_strings, z_strings, hy_strings, hz_strings],
            "shape": (zh, zw),
            "human_shape": (
                int(hz_sym_dev.shape[1]), int(hz_sym_dev.shape[2])
            ),
        }
        if return_debug:
            out["y_hat"] = y_hat
            out["x_hat"] = self._human_decode(v, hy_sym_dev, means, y_hat)
        return out

    def decompress(
        self, strings, shape, human_shape, pipeline_groups: int = 1
    ) -> Dict[str, Any]:
        bounds = group_bounds(len(strings[0]), pipeline_groups)
        if len(bounds) > 2:
            outs = run_groups(
                lambda g: self._decompress_group(g, shape, human_shape),
                [(g,) for g in split_strings(strings, bounds)],
            )
            return merge_outputs(outs, ("x_hat", "y_hat"))
        return self._decompress_group(strings, shape, human_shape)

    def _decompress_group(self, strings, shape, human_shape) -> Dict[str, Any]:
        v = self.variables
        y_strings, z_strings, hy_strings, hz_strings = strings
        if self.wire == "device" and self.scan_wire:
            y_hat = _scan_decode_layer(
                self, self._machine, self._scans["machine"], v, y_strings,
                z_strings, shape, "entropy_bottleneck",
            )
        elif self.wire == "device":
            y_hat = _device_decode_layer(
                self, self._machine, v, y_strings, z_strings, shape,
                "entropy_bottleneck", self.model.num_slices * 4,
                self._support,
            )
        else:
            z_sym = self._decode_z(z_strings, shape, "entropy_bottleneck")
            z_hat = (
                jnp.asarray(z_sym, jnp.float32) + self._machine.eb_medians(v)
            )
            state = self._machine.ctx_prepare(v, z_hat)
            decoder = coding.BatchRansDecoder(y_strings)
            slices, _, _ = self._machine_decode_loop(v, state, decoder=decoder)
            y_hat = self._machine.assemble(v, slices)

        if self.wire == "device":
            hz_sym = self.kit.decode_z(
                hz_strings, human_shape[0], human_shape[1],
                "entropy_bottleneck_human",
            )
            means, index = self._human_hyper(v, hz_sym)
            hy_sym = self.kit.decode_gaussian(hy_strings, index)
        else:
            hz_sym = jnp.asarray(
                self._decode_z(
                    hz_strings, human_shape, "entropy_bottleneck_human"
                ),
                jnp.int32,
            )
            means, index = self._human_hyper(v, hz_sym)
            gt = self.tables.gaussian
            idx_np = np.asarray(jax.device_get(index))
            B = len(hy_strings)
            hy_sym = jnp.asarray(coding.decode_batch(
                hy_strings, idx_np.reshape(B, -1),
                gt.quantized_cdf, gt.cdf_length, gt.offset,
            ).reshape(idx_np.shape))
        x_hat = self._human_decode(v, hy_sym, means, y_hat)
        return {"x_hat": x_hat, "y_hat": y_hat}


def _coder_spec(model, variables, getter):
    """(class, hashable field tuple) of the coder submodule. A twin
    module rebuilt from this spec applies directly on the coder's param
    SUBTREE, so the jitted stage functions below can live at module
    scope: two layers with equal specs and shapes (stf13's machine and
    seg; every stf9/11/12/14/oj machine layer across codecs) then share
    ONE compiled executable per stage instead of per-driver twins —
    the round-5 warmup cut (WARM_WARMUP_r04: stf13's residual was ~30
    program loads at 2-3 s each over the remote-TPU tunnel)."""

    def probe(m):
        c = getter(m)
        cfg = tuple(
            (f, getattr(c, f))
            for f in sorted(c.__dataclass_fields__)
            if f not in ("parent", "name")
        )
        return type(c), cfg

    return model.apply(variables, method=probe)


def _subtree(variables, path):
    p = variables["params"]
    for k in path:
        p = p[k]
    return p


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _coder_scan_enc_front(cls, cfg, narrow, sub, y):
    def f(m):
        z = m.h_a(y)
        med = m.eb_medians()
        z_sym = enc_round(z - med, narrow).astype(jnp.int32)
        return z_sym, jnp.stack(m.latent_slices(y), axis=0)

    return cls(**dict(cfg)).apply({"params": sub}, method=f)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _coder_scan_state(cls, cfg, sub, z_sym):
    def f(m):
        z_hat = z_sym.astype(jnp.float32) + m.eb_medians()
        st = m.ctx_prepare(z_hat)
        return (
            jnp.stack(st["means"], axis=0),
            jnp.stack(st["scales"], axis=0),
        )

    return cls(**dict(cfg)).apply({"params": sub}, method=f)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _coder_scan_assemble(cls, cfg, sub, y_hats):
    return cls(**dict(cfg)).apply(
        {"params": sub}, method=lambda m: m.ctx_assemble(list(y_hats))
    )


class _CharmLayerDriver:
    """Jitted stage functions for one ZigzagCharmCoder-backed layer
    reachable as ``getter(model)`` (e.g. ``lambda m: m.seg_coder``).

    When ``variables``+``param_path`` are given, the scan-wire stage
    programs (scan_enc_front / scan_state / scan_assemble) dispatch to
    the module-scope shared functions above (one executable per coder
    spec, not per driver). The unrolled-protocol stages keep per-driver
    closures — they are not on the warm-serving path."""

    def __init__(self, model, scale_table_dev, getter, name: str,
                 narrow: float = 1.0, variables=None, param_path=None):
        import functools

        self.model = model
        self.name = name

        @jax.jit
        def eb_medians(v):
            return model.apply(v, method=lambda m: getter(m).eb_medians())

        @jax.jit
        def h_a(v, y):
            return model.apply(v, method=lambda m: getter(m).h_a(y))

        @jax.jit
        def ctx_prepare(v, z_hat):
            return model.apply(v, method=lambda m: getter(m).ctx_prepare(z_hat))

        @jax.jit
        def latent_slices(v, y):
            return model.apply(v, method=lambda m: getter(m).latent_slices(y))

        @functools.partial(jax.jit, static_argnums=(1,))
        def slice_context(v, i, state, support):
            mu, scale, ms = model.apply(
                v, method=lambda m: getter(m).slice_context(i, state, support)
            )
            # uint8 on the wire (64 scale levels): 4x less link traffic
            index = build_indexes(scale, scale_table_dev).astype(jnp.uint8)
            return mu, scale, index, ms

        @functools.partial(jax.jit, static_argnums=(1, 5))
        def slice_code(v, i, sym_or_y, mu, mean_support, encode):
            def f(m):
                c = getter(m)
                if encode:
                    sym = enc_round(sym_or_y - mu, narrow).astype(jnp.int32)
                else:
                    sym = sym_or_y
                y_hat = sym.astype(mu.dtype) + mu
                if c.apply_lrp:
                    y_hat = y_hat + c.slice_lrp(i, mean_support, y_hat)
                return sym, y_hat

            return model.apply(v, method=f)

        @functools.partial(jax.jit, static_argnums=(1,))
        def quantize(v, i, y_slice, mu):
            sym = enc_round(y_slice - mu, narrow).astype(jnp.int32)
            return sym.astype(jnp.int16), jnp.any(jnp.abs(sym) > 32767), sym

        @functools.partial(jax.jit, static_argnums=(1, 2, 8))
        def step(v, i, support_fn, state, decoded, sym, mu, ms, n_slices):
            """Reconstruct slice i + compute slice i+1's context in one
            dispatch; shared by encode and decode so the AR float context
            is bit-identical on both sides (see CharmCodec.step)."""

            def f(m):
                c = getter(m)
                y_hat = sym.astype(mu.dtype) + mu
                if c.apply_lrp:
                    y_hat = y_hat + c.slice_lrp(i, ms, y_hat)
                if i + 1 >= n_slices:
                    return (y_hat,)
                support = support_fn(i + 1, list(decoded) + [y_hat])
                mu2, scale2, ms2 = c.slice_context(i + 1, state, support)
                idx2 = build_indexes(scale2, scale_table_dev).astype(
                    jnp.uint8
                )
                return y_hat, mu2, idx2, ms2

            return model.apply(v, method=f)

        @jax.jit
        def assemble(v, slices):
            return model.apply(v, method=lambda m: getter(m).ctx_assemble(slices))

        # --- merged scan-wire stages --------------------------------------
        # One program per pipeline half instead of five: over a remote-TPU
        # tunnel every distinct executable costs a serial load (~0.4-3 s
        # per program per process — NOTES_ROUND4.md warmup budget), so the
        # scan path folds h_a + medians + quantize + slice-stacking into
        # ONE encode-front program and keeps the z_sym -> stacked
        # conditioning in ONE program SHARED verbatim by both coder sides
        # (same executable -> the scan program's float conditioning is
        # bit-identical on encode and decode by construction).
        @jax.jit
        def scan_enc_front(v, y):
            def f(m):
                c = getter(m)
                z = c.h_a(y)
                med = c.eb_medians()
                z_sym = enc_round(z - med, narrow).astype(jnp.int32)
                return z_sym, jnp.stack(c.latent_slices(y), axis=0)

            return model.apply(v, method=f)

        @jax.jit
        def scan_state(v, z_sym):
            def f(m):
                c = getter(m)
                z_hat = z_sym.astype(jnp.float32) + c.eb_medians()
                st = c.ctx_prepare(z_hat)
                return (
                    jnp.stack(st["means"], axis=0),
                    jnp.stack(st["scales"], axis=0),
                )

            return model.apply(v, method=f)

        @jax.jit
        def scan_assemble(v, y_hats):
            return model.apply(
                v, method=lambda m: getter(m).ctx_assemble(list(y_hats))
            )

        if variables is not None and param_path is not None:
            cls, cfg = _coder_spec(model, variables, getter)
            path = tuple(param_path)
            nar = float(narrow)
            self.scan_enc_front = lambda v, y: _coder_scan_enc_front(
                cls, cfg, nar, _subtree(v, path), y
            )
            self.scan_state = lambda v, z_sym: _coder_scan_state(
                cls, cfg, _subtree(v, path), z_sym
            )
            self.scan_assemble = lambda v, y_hats: _coder_scan_assemble(
                cls, cfg, _subtree(v, path), y_hats
            )
        else:
            self.scan_enc_front = scan_enc_front
            self.scan_state = scan_state
            self.scan_assemble = scan_assemble
        self.eb_medians = eb_medians
        self.h_a = h_a
        self.ctx_prepare = ctx_prepare
        self.latent_slices = latent_slices
        self.slice_context = slice_context
        self.slice_code = slice_code
        self.quantize = quantize
        self.step = step
        self.assemble = assemble

    def run_loop(self, v, state, ctx_slices, support_fn, gaussian,
                 decoder=None, y_slices=None, lut=None):
        sym_list, idx_list, slices = [], [], []
        mu, _, index, ms = self.slice_context(v, 0, state, support_fn(0, []))
        if decoder is None:
            # encode: pure async dispatch, one batched fetch at the end
            sym16s, ovfs, sym32s, idxs = [], [], [], []
            for i in range(ctx_slices):
                sym16, ovf, sym32 = self.quantize(v, i, y_slices[i], mu)
                out = self.step(
                    v, i, support_fn, state, slices, sym32, mu, ms,
                    ctx_slices,
                )
                sym16s.append(sym16)
                ovfs.append(ovf)
                sym32s.append(sym32)
                idxs.append(index)
                slices.append(out[0])
                if len(out) > 1:
                    mu, index, ms = out[1], out[2], out[3]
            sym_h, ovf_h, idx_h = jax.device_get((sym16s, ovfs, idxs))
            for i, o in enumerate(ovf_h):
                if bool(o):  # bypass symbol beyond int16: exact refetch
                    sym_h[i] = jax.device_get(sym32s[i])
            B = idx_h[0].shape[0]
            sym_list = [
                np.asarray(s).astype(np.int32).reshape(B, -1) for s in sym_h
            ]
            idx_list = [np.asarray(ii).reshape(B, -1) for ii in idx_h]
        else:
            for i in range(ctx_slices):
                idx_np = np.asarray(jax.device_get(index))
                sym = decoder.decode_stream(
                    idx_np, gaussian.quantized_cdf, gaussian.cdf_length,
                    gaussian.offset, lut=lut,
                )
                if sym.size and np.abs(sym).max() < 32768:
                    sym = sym.astype(np.int16)
                out = self.step(
                    v, i, support_fn, state, slices, jnp.asarray(sym), mu,
                    ms, ctx_slices,
                )
                slices.append(out[0])
                if len(out) > 1:
                    mu, index, ms = out[1], out[2], out[3]
        return slices, sym_list, idx_list


class SegOjCodec:
    """Real coder for seg_oj_ICM: machine charm layer + segmentation charm
    layer (strings = [y, z, seg_y, seg_z]); the seg layer's conditioning
    (cat(x_hat, x)) is encoder-side only — the decoder needs just the seg
    bitstreams plus the machine reconstruction for the residual add."""

    def __init__(self, model, variables,
                 tables: CodecTables | None = None,
                 narrow: float = 1.0,
                 wire: str = "host",
                 scan_wire: bool = False):
        from .base import sliding_support

        self.narrow = narrow  # see codec.enc_round
        self.model = model
        self.variables = variables
        self.tables = tables or build_codec_tables(model, variables)
        _make_kit(self, wire)
        st = jnp.asarray(self.tables.scale_table)
        _make_scans(
            self, scan_wire, st,
            {
                "machine": (lambda m: m.coder, ("coder",)),
                "seg": (lambda m: m.seg_coder, ("seg_coder",)),
            },
        )
        self.machine = _CharmLayerDriver(
            model, st, lambda m: m.coder, "machine", narrow=narrow,
            variables=variables, param_path=("coder",),
        )
        self.seg = _CharmLayerDriver(
            model, st, lambda m: m.seg_coder, "seg", narrow=narrow,
            variables=variables, param_path=("seg_coder",),
        )
        self._support = sliding_support(model.max_support)
        mdl = model

        @jax.jit
        def m_analyze(v, x):
            return mdl.apply(v, method=lambda m: m.g_a(x))

        @jax.jit
        def m_synth(v, y_hat):
            return mdl.apply(v, method=lambda m: m.g_s(y_hat))

        @jax.jit
        def seg_analyze(v, x, x_hat):
            return mdl.apply(
                v, method=lambda m: m.seg_g_a(
                    jnp.concatenate([x_hat, x], axis=-1)
                )
            )

        @jax.jit
        def seg_synth(v, seg_y_hat, x_hat):
            return mdl.apply(
                v, method=lambda m: m.seg_g_s(seg_y_hat) + x_hat
            )

        self._m_analyze = m_analyze
        self._m_synth = m_synth
        self._seg_analyze = seg_analyze
        self._seg_synth = seg_synth

    def _code_z(self, sym, key):
        t = self.tables.bottlenecks[key]
        B, h, w, C = sym.shape
        idx = np.broadcast_to(_eb_indexes((h, w), C), (B, h * w * C))
        return coding.encode_batch(
            sym.reshape(B, -1), idx, t.quantized_cdf, t.cdf_length, t.offset
        )

    def _decode_z(self, strings, shape_hw, key):
        t = self.tables.bottlenecks[key]
        h, w = shape_hw
        C = t.num_distributions
        B = len(strings)
        idx = np.broadcast_to(_eb_indexes((h, w), C), (B, h * w * C))
        sym = coding.decode_batch(
            strings, idx, t.quantized_cdf, t.cdf_length, t.offset
        )
        return sym.reshape(B, h, w, C)

    def _encode_layer(self, driver, v, y, z_key):
        if self.wire == "device" and self.scan_wire:
            return _scan_encode_layer(
                self, driver, self._scans[driver.name], v, y, z_key
            )
        if self.wire == "device":
            return _device_encode_layer(
                self, driver, v, y, z_key, self.model.num_slices * 4,
                self._support,
            )
        z = driver.h_a(v, y)
        med = driver.eb_medians(v)
        z_sym = np.asarray(
            jax.device_get(enc_round(z - med, self.narrow).astype(jnp.int32))
        )
        z_strings = self._code_z(z_sym, z_key)
        z_hat = jnp.asarray(z_sym, jnp.float32) + med
        state = driver.ctx_prepare(v, z_hat)
        y_slices = driver.latent_slices(v, y)
        gt = self.tables.gaussian
        slices, sym_list, idx_list = driver.run_loop(
            v, state, self.model.num_slices * 4, self._support, gt,
            decoder=None, y_slices=y_slices,
        )
        y_strings = coding.encode_batch(
            np.concatenate(sym_list, axis=1),
            np.concatenate(idx_list, axis=1),
            gt.quantized_cdf, gt.cdf_length, gt.offset,
        )
        return y_strings, z_strings, driver.assemble(v, slices), z.shape[1:3]

    def _decode_layer(self, driver, v, y_strings, z_strings, shape_hw, z_key):
        if self.wire == "device" and self.scan_wire:
            return _scan_decode_layer(
                self, driver, self._scans[driver.name], v, y_strings,
                z_strings, shape_hw, z_key,
            )
        if self.wire == "device":
            return _device_decode_layer(
                self, driver, v, y_strings, z_strings, shape_hw, z_key,
                self.model.num_slices * 4, self._support,
            )
        z_sym = self._decode_z(z_strings, shape_hw, z_key)
        med = driver.eb_medians(v)
        z_hat = jnp.asarray(z_sym, jnp.float32) + med
        state = driver.ctx_prepare(v, z_hat)
        gt = self.tables.gaussian
        decoder = coding.BatchRansDecoder(y_strings)
        slices, _, _ = driver.run_loop(
            v, state, self.model.num_slices * 4, self._support, gt,
            decoder=decoder, lut=gt.symbol_lut(),
        )
        return driver.assemble(v, slices)

    def compress(
        self, x, return_debug: bool = False, pipeline_groups: int = 1
    ):
        bounds = group_bounds(x.shape[0], pipeline_groups)
        if len(bounds) > 2:
            outs = run_groups(
                lambda a, b: self._compress_group(x[a:b], return_debug),
                list(zip(bounds[:-1], bounds[1:])),
            )
            return merge_outputs(outs, ("y_hat", "seg_y_hat", "x_hat"))
        return self._compress_group(x, return_debug)

    def _compress_group(self, x, return_debug: bool = False):
        v = self.variables
        y = self._m_analyze(v, x)
        y_strings, z_strings, y_hat, m_shape = self._encode_layer(
            self.machine, v, y, "entropy_bottleneck"
        )
        x_hat = self._m_synth(v, y_hat)
        seg_y = self._seg_analyze(v, x, x_hat)
        sy_strings, sz_strings, seg_y_hat, s_shape = self._encode_layer(
            self.seg, v, seg_y, "seg_entropy_bottleneck"
        )
        out = {
            "strings": [y_strings, z_strings, sy_strings, sz_strings],
            "shape": tuple(int(d) for d in m_shape),
            "seg_shape": tuple(int(d) for d in s_shape),
        }
        if return_debug:
            out["y_hat"] = y_hat
            out["seg_y_hat"] = seg_y_hat
            out["x_hat"] = self._seg_synth(v, seg_y_hat, x_hat)
        return out

    def decompress(self, strings, shape, seg_shape, pipeline_groups: int = 1):
        bounds = group_bounds(len(strings[0]), pipeline_groups)
        if len(bounds) > 2:
            outs = run_groups(
                lambda g: self._decompress_group(g, shape, seg_shape),
                [(g,) for g in split_strings(strings, bounds)],
            )
            return merge_outputs(outs, ("x_hat", "y_hat", "seg_y_hat"))
        return self._decompress_group(strings, shape, seg_shape)

    def _decompress_group(self, strings, shape, seg_shape):
        v = self.variables
        y_strings, z_strings, sy_strings, sz_strings = strings
        y_hat = self._decode_layer(
            self.machine, v, y_strings, z_strings, shape, "entropy_bottleneck"
        )
        x_hat_m = self._m_synth(v, y_hat)
        seg_y_hat = self._decode_layer(
            self.seg, v, sy_strings, sz_strings, seg_shape,
            "seg_entropy_bottleneck",
        )
        x_hat = self._seg_synth(v, seg_y_hat, x_hat_m)
        return {
            "x_hat": jnp.clip(x_hat, 0.0, 1.0),
            "y_hat": y_hat,
            "seg_y_hat": seg_y_hat,
        }


class CRC3Codec:
    """Real coder for stf13 (three layers): machine charm + segmentation
    charm + human one-shot; strings = [y, z, seg_y, seg_z, human_y,
    human_z]. All conditioning (masks, context decoders) derives from the
    decoded machine/seg latents, so the human layer needs no side info."""

    def __init__(self, model, variables,
                 tables: CodecTables | None = None,
                 narrow: float = 1.0,
                 wire: str = "host",
                 scan_wire: bool = False):
        from .base import sliding_support

        self.narrow = narrow  # see codec.enc_round
        self.model = model
        self.variables = variables
        self.tables = tables or build_codec_tables(model, variables)
        _make_kit(self, wire)
        st = jnp.asarray(self.tables.scale_table)
        _make_scans(
            self, scan_wire, st,
            {
                "machine": (lambda m: m.machine.coder, ("machine", "coder")),
                "seg": (lambda m: m.seg_coder, ("seg_coder",)),
            },
        )
        self.machine = _CharmLayerDriver(
            model, st, lambda m: m.machine.coder, "machine", narrow=narrow,
            variables=variables, param_path=("machine", "coder"),
        )
        self.seg = _CharmLayerDriver(
            model, st, lambda m: m.seg_coder, "seg", narrow=narrow,
            variables=variables, param_path=("seg_coder",),
        )
        self._support = sliding_support(model.max_support)
        mdl = model

        @jax.jit
        def m_analyze(v, x):
            return mdl.apply(v, method=lambda m: m.machine.g_a(x))

        @jax.jit
        def seg_encode(v, x, y_hat):
            return mdl.apply(v, x, y_hat, method=mdl.seg_encode)

        # merged human-layer stages (same program-count rationale as the
        # driver's scan_* programs): the encode front folds human_encode +
        # h_a + medians + quantize into one program; ``human_hyper`` (z
        # dequant + hyper synthesis + scale bucketing) is SHARED verbatim
        # by compress and decompress so the mu/index the symbols were
        # coded under are the ones the decoder reconstructs with.
        @jax.jit
        def human_enc_front(v, x, y_hat, seg_y_hat):
            def f(m):
                hy = m.human_encode(x, y_hat, seg_y_hat)
                hz = m.human_hyper.h_a(hy)
                med = m.human_eb_medians()
                return hy, enc_round(hz - med, narrow).astype(jnp.int32)

            return mdl.apply(v, method=f)

        @jax.jit
        def human_hyper(v, hz_sym):
            def f(m):
                z_hat = hz_sym.astype(jnp.float32) + m.human_eb_medians()
                return (
                    m.human_hyper.h_mean_s(z_hat),
                    m.human_hyper.h_scale_s(z_hat),
                )

            means, scales = mdl.apply(v, method=f)
            return means, build_indexes(scales, st)

        @jax.jit
        def human_synth(v, sym, means, y_hat, seg_y_hat):
            hy_hat = sym.astype(jnp.float32) + means
            return jnp.clip(
                mdl.apply(
                    v, hy_hat, y_hat, seg_y_hat, method=mdl.human_synthesize
                ),
                0.0, 1.0,
            )

        self._m_analyze = m_analyze
        self._seg_encode = seg_encode
        self._human_enc_front = human_enc_front
        self._human_hyper = human_hyper
        self._human_synth = human_synth

    _code_z = SegOjCodec._code_z
    _decode_z = SegOjCodec._decode_z
    _encode_layer = SegOjCodec._encode_layer
    _decode_layer = SegOjCodec._decode_layer

    def compress(
        self, x, return_debug: bool = False, pipeline_groups: int = 1
    ):
        bounds = group_bounds(x.shape[0], pipeline_groups)
        if len(bounds) > 2:
            outs = run_groups(
                lambda a, b: self._compress_group(x[a:b], return_debug),
                list(zip(bounds[:-1], bounds[1:])),
            )
            return merge_outputs(outs, ("y_hat", "seg_y_hat", "x_hat"))
        return self._compress_group(x, return_debug)

    def _compress_group(self, x, return_debug: bool = False):
        v = self.variables
        y = self._m_analyze(v, x)
        y_s, z_s, y_hat, m_shape = self._encode_layer(
            self.machine, v, y, "entropy_bottleneck"
        )
        seg_y = self._seg_encode(v, x, y_hat)
        sy_s, sz_s, seg_y_hat, s_shape = self._encode_layer(
            self.seg, v, seg_y, "entropy_bottleneck_seg"
        )
        human_y, hz_sym_dev = self._human_enc_front(v, x, y_hat, seg_y_hat)
        if self.wire == "device":
            hz_s = self.kit.encode_z(hz_sym_dev, "entropy_bottleneck_human")
        else:
            hz_sym = np.asarray(jax.device_get(hz_sym_dev))
            hz_s = self._code_z(hz_sym, "entropy_bottleneck_human")
        means, index = self._human_hyper(v, hz_sym_dev)
        hy_sym_dev = _q_sym(human_y, means, self.narrow)
        if self.wire == "device":
            hy_s = self.kit.encode_gaussian(hy_sym_dev, index)
        else:
            hy_sym = np.asarray(jax.device_get(hy_sym_dev))
            gt = self.tables.gaussian
            B = x.shape[0]
            hy_s = coding.encode_batch(
                hy_sym.reshape(B, -1),
                np.asarray(jax.device_get(index)).reshape(B, -1),
                gt.quantized_cdf, gt.cdf_length, gt.offset,
            )
        out = {
            "strings": [y_s, z_s, sy_s, sz_s, hy_s, hz_s],
            "shape": tuple(int(d) for d in m_shape),
            "seg_shape": tuple(int(d) for d in s_shape),
            "human_shape": (
                int(hz_sym_dev.shape[1]), int(hz_sym_dev.shape[2])
            ),
        }
        if return_debug:
            out["y_hat"] = y_hat
            out["seg_y_hat"] = seg_y_hat
            out["x_hat"] = self._human_synth(
                v, hy_sym_dev, means, y_hat, seg_y_hat
            )
        return out

    def decompress(
        self, strings, shape, seg_shape, human_shape, pipeline_groups: int = 1
    ):
        bounds = group_bounds(len(strings[0]), pipeline_groups)
        if len(bounds) > 2:
            outs = run_groups(
                lambda g: self._decompress_group(
                    g, shape, seg_shape, human_shape
                ),
                [(g,) for g in split_strings(strings, bounds)],
            )
            return merge_outputs(outs, ("x_hat", "y_hat", "seg_y_hat"))
        return self._decompress_group(strings, shape, seg_shape, human_shape)

    def _decompress_group(self, strings, shape, seg_shape, human_shape):
        v = self.variables
        y_s, z_s, sy_s, sz_s, hy_s, hz_s = strings
        y_hat = self._decode_layer(
            self.machine, v, y_s, z_s, shape, "entropy_bottleneck"
        )
        seg_y_hat = self._decode_layer(
            self.seg, v, sy_s, sz_s, seg_shape, "entropy_bottleneck_seg"
        )
        if self.wire == "device":
            hz_sym = self.kit.decode_z(
                hz_s, human_shape[0], human_shape[1],
                "entropy_bottleneck_human",
            )
            means, index = self._human_hyper(v, hz_sym)
            hy_sym = self.kit.decode_gaussian(hy_s, index)
        else:
            hz_sym = jnp.asarray(
                self._decode_z(hz_s, human_shape, "entropy_bottleneck_human"),
                jnp.int32,
            )
            means, index = self._human_hyper(v, hz_sym)
            gt = self.tables.gaussian
            idx_np = np.asarray(jax.device_get(index))
            B = len(hy_s)
            hy_sym = jnp.asarray(coding.decode_batch(
                hy_s, idx_np.reshape(B, -1),
                gt.quantized_cdf, gt.cdf_length, gt.offset,
            ).reshape(idx_np.shape))
        x_hat = self._human_synth(v, hy_sym, means, y_hat, seg_y_hat)
        return {
            "x_hat": x_hat,
            "y_hat": y_hat,
            "seg_y_hat": seg_y_hat,
        }


class CzigzagCodec:
    """Real coder for the cross-attention conditional codec (czigzag).
    ``up_x4`` is decoder-side conditioning (a GAN-upsampled base-layer
    reconstruction), so both sides derive the context pyramids from it;
    strings = [y, z]. New design — the reference ships no working coder
    for this model (SURVEY.md §0)."""

    def __init__(self, model, variables,
                 tables: CodecTables | None = None,
                 narrow: float = 1.0,
                 wire: str = "host",
                 scan_wire: bool = False):
        import functools

        from .base import sliding_support

        self.narrow = narrow  # see codec.enc_round
        self.model = model
        self.variables = variables
        self.tables = tables or build_codec_tables(model, variables)
        _make_kit(self, wire)
        st = jnp.asarray(self.tables.scale_table)
        self._support = sliding_support(model.max_support)
        self.scan_wire = scan_wire
        if scan_wire:
            if wire != "device":
                raise ValueError("scan_wire requires wire='device'")
            from .scan_codec import CzigzagScanWire

            self._scanw = CzigzagScanWire(
                model, variables, self.kit, st, narrow=narrow
            )
        mdl = model

        @jax.jit
        def pyramids(v, up):
            return mdl.apply(v, up, method=mdl.ctx_pyramids)

        @jax.jit
        def analyze(v, x, ctx_list):
            return mdl.apply(v, x, ctx_list, method=mdl.analyze_cond)

        @jax.jit
        def hyper_encode(v, y, hctx, hctx2):
            return mdl.apply(v, y, hctx, hctx2, method=mdl.hyper_encode)

        @jax.jit
        def eb_medians(v):
            return mdl.apply(v, method=mdl.eb_medians)

        @jax.jit
        def ctx_prepare(v, z_hat, hctx, hctx2):
            return mdl.apply(
                v, z_hat, hctx, hctx2, method=mdl.ctx_prepare_cond
            )

        @jax.jit
        def latent_slices(v, y):
            return mdl.apply(v, y, method=mdl.latent_slices)

        @functools.partial(jax.jit, static_argnums=(1,))
        def slice_context(v, i, state, support):
            mu, scale, ms = mdl.apply(
                v, i, state, support, method=mdl.slice_context
            )
            return mu, scale, build_indexes(scale, st), ms

        @functools.partial(jax.jit, static_argnums=(1, 5))
        def slice_code(v, i, sym_or_y, mu, mean_support, encode):
            if encode:
                sym = enc_round(sym_or_y - mu, narrow).astype(jnp.int32)
            else:
                sym = sym_or_y
            y_hat = sym.astype(mu.dtype) + mu
            lrp = mdl.apply(v, i, mean_support, y_hat, method=mdl.slice_lrp)
            return sym, y_hat + lrp

        @jax.jit
        def assemble_synthesize(v, slices, decoder_contexts):
            # accepts a per-slice list (unrolled paths) or a stacked
            # (N, B, h, w, sc) array (scan path) — list() unstacks it
            y_hat = mdl.apply(v, list(slices), method=mdl.ctx_assemble)
            x_hat = mdl.apply(
                v, y_hat, decoder_contexts, method=mdl.synthesize_cond
            )
            return y_hat, jnp.clip(x_hat, 0.0, 1.0)

        # merged scan-path stages (same program-count rationale as
        # _CharmLayerDriver.scan_*): one encode front, one conditioning
        # program SHARED verbatim by both coder sides
        @jax.jit
        def scan_enc_front(v, x, ctx_list, hctx, hctx2):
            def f(m):
                y = m.analyze_cond(x, ctx_list)
                z = m.hyper_encode(y, hctx, hctx2)
                z_sym = enc_round(z - m.eb_medians(), narrow).astype(
                    jnp.int32
                )
                return z_sym, jnp.stack(m.latent_slices(y), axis=0)

            return mdl.apply(v, method=f)

        @jax.jit
        def scan_state(v, z_sym, hctx, hctx2):
            def f(m):
                z_hat = z_sym.astype(jnp.float32) + m.eb_medians()
                stt = m.ctx_prepare_cond(z_hat, hctx, hctx2)
                return (
                    jnp.stack(stt["means"], axis=0),
                    jnp.stack(stt["scales"], axis=0),
                    jnp.stack(stt["hctx"], axis=0),
                )

            return mdl.apply(v, method=f)

        self._scan_enc_front = scan_enc_front
        self._scan_state = scan_state
        self._pyramids = pyramids
        self._analyze = analyze
        self._hyper_encode = hyper_encode
        self._eb_medians = eb_medians
        self._ctx_prepare = ctx_prepare
        self._latent_slices = latent_slices
        self._slice_context = slice_context
        self._slice_code = slice_code
        self._assemble_synthesize = assemble_synthesize

    _code_z = SegOjCodec._code_z
    _decode_z = SegOjCodec._decode_z

    def _loop(self, v, state, decoder=None, y_slices=None):
        gt = self.tables.gaussian
        lut = gt.symbol_lut() if decoder is not None else None
        sym_list, idx_list, slices = [], [], []
        for i in range(self.model.ctx_slices):
            support = self._support(i, slices)
            mu, scale, index, ms = self._slice_context(v, i, state, support)
            if decoder is None:
                sym, y_hat = self._slice_code(v, i, y_slices[i], mu, ms, True)
                sym_list.append(
                    np.asarray(jax.device_get(sym)).reshape(sym.shape[0], -1)
                )
                idx_list.append(
                    np.asarray(jax.device_get(index)).reshape(index.shape[0], -1)
                )
            else:
                idx_np = np.asarray(jax.device_get(index))
                sym = decoder.decode_stream(
                    idx_np, gt.quantized_cdf, gt.cdf_length, gt.offset, lut=lut
                )
                _, y_hat = self._slice_code(v, i, jnp.asarray(sym), mu, ms, False)
            slices.append(y_hat)
        return slices, sym_list, idx_list

    def _loop_device(self, v, state, ydec=None, y_slices=None):
        """The AR loop against the device wire: symbols never touch the
        host (encode buffers them for one batched device encode; decode
        pulls each slice from the stateful stream decoder)."""
        sym32s, idxs, slices = [], [], []
        for i in range(self.model.ctx_slices):
            support = self._support(i, slices)
            mu, scale, index, ms = self._slice_context(v, i, state, support)
            if ydec is None:
                sym, y_hat = self._slice_code(v, i, y_slices[i], mu, ms, True)
            else:
                sym = ydec.decode_slice(index)
                _, y_hat = self._slice_code(v, i, sym, mu, ms, False)
            sym32s.append(sym)
            idxs.append(index)
            slices.append(y_hat)
        return slices, sym32s, idxs

    def compress(
        self, x, up_x4, return_debug: bool = False, pipeline_groups: int = 1
    ):
        bounds = group_bounds(x.shape[0], pipeline_groups)
        if len(bounds) > 2:
            outs = run_groups(
                lambda a, b: self._compress_group(
                    x[a:b], up_x4[a:b], return_debug
                ),
                list(zip(bounds[:-1], bounds[1:])),
            )
            return merge_outputs(outs, ("y_hat", "x_hat"))
        return self._compress_group(x, up_x4, return_debug)

    def _compress_group(self, x, up_x4, return_debug: bool = False):
        v = self.variables
        ctx_list, hctx, hctx2, dec_ctx = self._pyramids(v, up_x4)
        if self.wire == "device" and self.scan_wire:
            z_sym_dev, y_stack = self._scan_enc_front(
                v, x, ctx_list, hctx, hctx2
            )
            z_strings = self.kit.encode_z(z_sym_dev, "entropy_bottleneck")
            means, scales, hctx_s = self._scan_state(
                v, z_sym_dev, hctx, hctx2
            )
            y_strings, slices = self._scanw.encode(
                means, scales, hctx_s, y_stack
            )
            out = {
                "strings": [y_strings, z_strings],
                "shape": (int(z_sym_dev.shape[1]), int(z_sym_dev.shape[2])),
            }
            if return_debug:
                y_hat, x_hat = self._assemble_synthesize(v, slices, dec_ctx)
                out["y_hat"] = y_hat
                out["x_hat"] = x_hat
            return out
        y = self._analyze(v, x, ctx_list)
        z = self._hyper_encode(v, y, hctx, hctx2)
        med = self._eb_medians(v)
        if self.wire == "device":
            z_sym_dev = _q_sym(z, med, self.narrow)
            z_strings = self.kit.encode_z(z_sym_dev, "entropy_bottleneck")
            z_hat = _dq_sym(z_sym_dev, med)
            state = self._ctx_prepare(v, z_hat, hctx, hctx2)
            y_slices = self._latent_slices(v, y)
            slices, sym32s, idxs = self._loop_device(
                v, state, y_slices=y_slices
            )
            y_strings = self.kit.encode_y_slices(sym32s, idxs)
        else:
            z_sym = np.asarray(
                jax.device_get(
                    enc_round(z - med, self.narrow).astype(jnp.int32)
                )
            )
            z_strings = self._code_z(z_sym, "entropy_bottleneck")
            z_hat = jnp.asarray(z_sym, jnp.float32) + med
            state = self._ctx_prepare(v, z_hat, hctx, hctx2)
            y_slices = self._latent_slices(v, y)
            slices, sym_list, idx_list = self._loop(
                v, state, decoder=None, y_slices=y_slices
            )
            gt = self.tables.gaussian
            y_strings = coding.encode_batch(
                np.concatenate(sym_list, axis=1),
                np.concatenate(idx_list, axis=1),
                gt.quantized_cdf, gt.cdf_length, gt.offset,
            )
        out = {
            "strings": [y_strings, z_strings],
            "shape": (int(z.shape[1]), int(z.shape[2])),
        }
        if return_debug:
            y_hat, x_hat = self._assemble_synthesize(v, slices, dec_ctx)
            out["y_hat"] = y_hat
            out["x_hat"] = x_hat
        return out

    def decompress(self, strings, shape, up_x4, pipeline_groups: int = 1):
        bounds = group_bounds(len(strings[0]), pipeline_groups)
        if len(bounds) > 2:
            outs = run_groups(
                lambda g, a, b: self._decompress_group(g, shape, up_x4[a:b]),
                [
                    (g, a, b)
                    for g, (a, b) in zip(
                        split_strings(strings, bounds),
                        zip(bounds[:-1], bounds[1:]),
                    )
                ],
            )
            return merge_outputs(outs, ("x_hat", "y_hat"))
        return self._decompress_group(strings, shape, up_x4)

    def _decompress_group(self, strings, shape, up_x4):
        v = self.variables
        y_strings, z_strings = strings
        _, hctx, hctx2, dec_ctx = self._pyramids(v, up_x4)
        if self.wire == "device" and self.scan_wire:
            z_sym = self.kit.decode_z(
                z_strings, shape[0], shape[1], "entropy_bottleneck"
            )
            means, scales, hctx_s = self._scan_state(v, z_sym, hctx, hctx2)
            slices = self._scanw.decode(y_strings, means, scales, hctx_s)
            y_hat, x_hat = self._assemble_synthesize(v, slices, dec_ctx)
            return {"x_hat": x_hat, "y_hat": y_hat}
        med = self._eb_medians(v)
        if self.wire == "device":
            ydec = self.kit.y_stream_decoder(
                y_strings, self.model.ctx_slices
            )
            z_sym = self.kit.decode_z(
                z_strings, shape[0], shape[1], "entropy_bottleneck"
            )
            z_hat = _dq_sym(z_sym, med)
            state = self._ctx_prepare(v, z_hat, hctx, hctx2)
            slices, _, _ = self._loop_device(v, state, ydec=ydec)
        else:
            z_sym = self._decode_z(z_strings, shape, "entropy_bottleneck")
            z_hat = jnp.asarray(z_sym, jnp.float32) + med
            state = self._ctx_prepare(v, z_hat, hctx, hctx2)
            decoder = coding.BatchRansDecoder(y_strings)
            slices, _, _ = self._loop(v, state, decoder=decoder)
        y_hat, x_hat = self._assemble_synthesize(v, slices, dec_ctx)
        return {"x_hat": x_hat, "y_hat": y_hat}

class Stf2Codec:
    """Real coder for stf2 (AR attention context over window tokens).
    The reference's own compress/decompress for this family is stale
    (SURVEY.md §0); this is a self-consistent design with one jitted step
    function shared by encoder and decoder; strings = [y, z]."""

    def __init__(self, model, variables,
                 tables: CodecTables | None = None,
                 narrow: float = 1.0,
                 wire: str = "host"):
        self.narrow = narrow  # see codec.enc_round
        self.model = model
        self.variables = variables
        self.tables = tables or build_codec_tables(model, variables)
        _make_kit(self, wire)
        st = jnp.asarray(self.tables.scale_table)
        if wire == "device":
            from .scan_codec import Stf2ScanWire

            self._scanw = Stf2ScanWire(
                model, variables, self.kit, st, narrow=narrow
            )
        mdl = model

        @jax.jit
        def analyze(v, x):
            return mdl.apply(v, x, method=mdl.analyze_tokens)

        @jax.jit
        def eb_medians(v):
            return mdl.apply(v, method=mdl.eb_medians)

        @jax.jit
        def token_windows(v, y, z_hat):
            return mdl.apply(v, y, z_hat, method=mdl.token_windows)

        @functools.partial(jax.jit, static_argnums=(4,))
        def token_context(v, m_i, s_i, prev, first_step):
            mu, scale, ctx_sp = mdl.apply(
                v, m_i, s_i, prev, first_step, method=mdl.token_context
            )
            return mu, scale, build_indexes(scale, st), ctx_sp

        @jax.jit
        def token_code_enc(v, y_token, mu, ctx_sp):
            sym = enc_round(y_token - mu, narrow).astype(jnp.int32)
            y_hat = sym.astype(mu.dtype) + mu
            lrp = mdl.apply(v, ctx_sp, y_hat, method=mdl.token_lrp)
            return sym, y_hat + lrp

        @jax.jit
        def token_code_dec(v, sym, mu, ctx_sp):
            y_hat = sym.astype(mu.dtype) + mu
            lrp = mdl.apply(v, ctx_sp, y_hat, method=mdl.token_lrp)
            return y_hat + lrp

        @functools.partial(jax.jit, static_argnums=(2, 3))
        def assemble_synthesize(v, toks, lattice, out_hw):
            y_hat = mdl.apply(v, toks, lattice, out_hw,
                              method=mdl.tokens_assemble)
            x_hat = mdl.apply(v, y_hat, method=mdl.synthesize)
            return y_hat, jnp.clip(x_hat, 0.0, 1.0)

        self._analyze = analyze
        self._eb_medians = eb_medians
        self._token_windows = token_windows
        self._token_context = token_context
        self._token_code_enc = token_code_enc
        self._token_code_dec = token_code_dec
        self._assemble_synthesize = assemble_synthesize

    _code_z = SegOjCodec._code_z
    _decode_z = SegOjCodec._decode_z

    def _prev(self, toks, B, s, D, dtype):
        if not toks:
            return jnp.zeros((B, s, D), dtype)
        have = min(len(toks), s)
        stack = jnp.stack(toks[-have:], axis=1)
        if have < s:
            stack = jnp.pad(stack, ((0, 0), (s - have, 0), (0, 0)))
        return stack

    def _loop(self, v, y_tok, m_win, s_win, decoder=None):
        gt = self.tables.gaussian
        lut = gt.symbol_lut() if decoder is not None else None
        s = self.model.num_sliding
        ws = self.model.mask_win_size
        Cp = self.model.slice_ch
        B, N, D = m_win.shape[0], m_win.shape[1], m_win.shape[-1]
        toks, sym_list, idx_list = [], [], []
        for i in range(N):
            prev = self._prev(toks, B, s, D, m_win.dtype)
            mu, scale, index, ctx_sp = self._token_context(
                v, m_win[:, i], s_win[:, i], prev, i == 0
            )
            if decoder is None:
                # c-major token vector -> NHWC window block
                y_token = (
                    y_tok[:, i].reshape(B, Cp, ws, ws).transpose(0, 2, 3, 1)
                )
                sym, y_hat = self._token_code_enc(v, y_token, mu, ctx_sp)
                sym_list.append(
                    np.asarray(jax.device_get(sym)).reshape(B, -1)
                )
                idx_list.append(
                    np.asarray(jax.device_get(index)).reshape(B, -1)
                )
            else:
                idx_np = np.asarray(jax.device_get(index))
                sym = decoder.decode_stream(
                    idx_np, gt.quantized_cdf, gt.cdf_length, gt.offset, lut=lut
                )
                y_hat = self._token_code_dec(v, jnp.asarray(sym), mu, ctx_sp)
            # NHWC window block -> c-major token vector
            toks.append(y_hat.transpose(0, 3, 1, 2).reshape(B, D))
        return toks, sym_list, idx_list

    def compress(
        self, x, return_debug: bool = False, pipeline_groups: int = 1
    ):
        bounds = group_bounds(x.shape[0], pipeline_groups)
        if len(bounds) > 2:
            outs = run_groups(
                lambda a, b: self._compress_group(x[a:b], return_debug),
                list(zip(bounds[:-1], bounds[1:])),
            )
            return merge_outputs(outs, ("y_hat", "x_hat"))
        return self._compress_group(x, return_debug)

    def _compress_group(self, x, return_debug: bool = False):
        v = self.variables
        y, z = self._analyze(v, x)
        med = self._eb_medians(v)
        if self.wire == "device":
            z_sym_dev = _q_sym(z, med, self.narrow)
            z_strings = self.kit.encode_z(z_sym_dev, "entropy_bottleneck")
            z_hat = _dq_sym(z_sym_dev, med)
            y_tok, m_win, s_win, lattice = self._token_windows(v, y, z_hat)
            y_strings, toks = self._scanw.encode(v, m_win, s_win, y_tok)
        else:
            z_sym = np.asarray(
                jax.device_get(
                    enc_round(z - med, self.narrow).astype(jnp.int32)
                )
            )
            z_strings = self._code_z(z_sym, "entropy_bottleneck")
            z_hat = jnp.asarray(z_sym, jnp.float32) + med
            y_tok, m_win, s_win, lattice = self._token_windows(v, y, z_hat)
            toks, sym_list, idx_list = self._loop(v, y_tok, m_win, s_win)
            gt = self.tables.gaussian
            y_strings = coding.encode_batch(
                np.concatenate(sym_list, axis=1),
                np.concatenate(idx_list, axis=1),
                gt.quantized_cdf, gt.cdf_length, gt.offset,
            )
        out = {
            "strings": [y_strings, z_strings],
            "shape": (int(z.shape[1]), int(z.shape[2])),
            "out_hw": (int(y.shape[1]), int(y.shape[2])),
            "lattice": tuple(int(d) for d in lattice),
        }
        if return_debug:
            y_hat, x_hat = self._assemble_synthesize(
                v, toks, out["lattice"], out["out_hw"]
            )
            out["y_hat"] = y_hat
            out["x_hat"] = x_hat
        return out

    def decompress(
        self, strings, shape, out_hw, lattice, pipeline_groups: int = 1
    ):
        bounds = group_bounds(len(strings[0]), pipeline_groups)
        if len(bounds) > 2:
            outs = run_groups(
                lambda g: self._decompress_group(g, shape, out_hw, lattice),
                [(g,) for g in split_strings(strings, bounds)],
            )
            return merge_outputs(outs, ("x_hat", "y_hat"))
        return self._decompress_group(strings, shape, out_hw, lattice)

    def _decompress_group(self, strings, shape, out_hw, lattice):
        v = self.variables
        y_strings, z_strings = strings
        med = self._eb_medians(v)
        if self.wire == "device":
            z_sym = self.kit.decode_z(
                z_strings, shape[0], shape[1], "entropy_bottleneck"
            )
            z_hat = _dq_sym(z_sym, med)
        else:
            z_sym = self._decode_z(z_strings, shape, "entropy_bottleneck")
            z_hat = jnp.asarray(z_sym, jnp.float32) + med
        # decoder-side windows: y unknown — token_windows only needs y for
        # y_tok; pass zeros of the right latent shape
        B = z_hat.shape[0]
        H, W = out_hw
        y_zero = jnp.zeros((B, H, W, self.model.latent_dim), jnp.float32)
        _, m_win, s_win, _ = self._token_windows(v, y_zero, z_hat)
        if self.wire == "device":
            toks = self._scanw.decode(
                y_strings, v, m_win, s_win, int(m_win.shape[1])
            )
        else:
            decoder = coding.BatchRansDecoder(y_strings)
            toks, _, _ = self._loop(v, None, m_win, s_win, decoder=decoder)
        y_hat, x_hat = self._assemble_synthesize(v, toks, lattice, out_hw)
        return {"x_hat": x_hat, "y_hat": y_hat}
