"""Bitexact round-trip tests for the causal stf3/stf4 coders.

The reference has NO sound coder for these models (teacher-forced
unmasked context, stf3.py:565-618); these test the causal completion
(ClipEncoder3/4 with causal=True + masked_codec.Stf3Codec/Stf4Codec):
decoded y_hat must equal the encoder's reconstruction BIT-exactly (the
AR context diverges otherwise) and x_hat must match.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icm_tpu.models import ClipEncoder3, ClipEncoder4, Stf3Codec, Stf4Codec

pytestmark = pytest.mark.slow

TINY = dict(
    embed_dim=8,
    depths=(1, 1),
    num_heads=(1, 2),
    window_size=4,
    patch_size=2,
    drop_path_rate=0.0,
    num_slices=4,
    mask_win_size=2,
    hyper_enc_widths=(16, 14, 12, 10, 8),
    hyper_dec_widths=(10, 12, 14, 16, 16),
    causal=True,
)


def _roundtrip(model_cls, extra=()):
    model = model_cls(**{**TINY, **dict(extra)})
    x = jnp.asarray(
        np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32
    )
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        x,
    )
    codec = (Stf3Codec if model_cls is ClipEncoder3 else Stf4Codec)(
        model, variables
    )
    enc = codec.compress(x, return_debug=True)
    dec = codec.decompress(enc["strings"], enc["shape"])
    assert np.array_equal(
        np.asarray(enc["y_hat"]), np.asarray(dec["y_hat"])
    ), "AR context diverged between encoder and decoder"
    np.testing.assert_array_equal(
        np.asarray(enc["x_hat"]), np.asarray(dec["x_hat"])
    )
    nbytes = sum(len(s) for ss in enc["strings"] for s in ss)
    assert nbytes > 0


def test_stf3_causal_roundtrip():
    _roundtrip(ClipEncoder3)


def test_stf4_causal_roundtrip():
    _roundtrip(ClipEncoder4, extra=(("sliding", 8),))


def test_stf3_causal_forward_matches_noncausal_shape():
    """causal=True is a drop-in training mode: same outputs structure."""
    model = ClipEncoder3(**TINY)
    x = jnp.zeros((1, 32, 32, 3))
    v = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        x,
    )
    out = model.apply(v, x, training=False)
    assert out["x_hat"].shape == x.shape
    assert np.isfinite(np.asarray(out["likelihoods"]["y"])).all()


@pytest.mark.parametrize("model_cls", [ClipEncoder3, ClipEncoder4])
def test_token_ar_device_wire_roundtrip(model_cls):
    """stf3/stf4 over the on-device wire: encode is the one-shot causal
    pass into lane rANS (lane = image x token-dim); decode is ONE scan
    program with zero intermediate round-trips. y_hat must match the
    encoder's reconstruction bitexactly, and the device wire must agree
    with the host wire (same symbols, different transport)."""
    model = model_cls(**TINY)
    x = jnp.asarray(
        np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32
    )
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        x,
    )
    cls = Stf3Codec if model_cls is ClipEncoder3 else Stf4Codec
    dev = cls(model, variables, wire="device")
    enc = dev.compress(x, return_debug=True)
    dec = dev.decompress(enc["strings"], enc["shape"])
    np.testing.assert_array_equal(
        np.asarray(enc["y_hat"]), np.asarray(dec["y_hat"])
    )
    np.testing.assert_array_equal(
        np.asarray(enc["x_hat"]), np.asarray(dec["x_hat"])
    )

    host = cls(model, variables, tables=dev.tables)
    hdec = host.decompress(
        host.compress(x)["strings"], enc["shape"]
    )
    np.testing.assert_array_equal(
        np.asarray(hdec["y_hat"]), np.asarray(dec["y_hat"])
    )
