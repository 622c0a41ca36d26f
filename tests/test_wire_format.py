"""Wire-format tags: cross-fed streams fail loudly, not silently.

Three wire formats exist (coding/wire.py): untagged host/reference rANS,
device-v2 (unrolled protocol), and scan. Scan-wire streams reduce the AR
float context in a different order than unrolled-protocol streams
(scan_codec.py module docstring), so decoding one with the other's
programs would produce garbage y_hat without any coder error — the tag
turns every such cross-feed into a WireFormatError. Host streams must
stay untagged (byte-identical reference interchange,
tests/test_reference_parity.py), so the host decoder uses an
exact-length sniff instead of requiring a tag.
"""

import jax
import numpy as np
import pytest

from icm_tpu.coding.wire import (
    WIRE_DEVICE,
    WIRE_MAGIC,
    WIRE_SCAN,
    WireFormatError,
    looks_like_framework_wire,
)
from icm_tpu.models import CharmCodec, WACNN
from icm_tpu.models.device_codec import DeviceWireCodec

pytestmark = pytest.mark.slow

TINY = dict(
    N=16,
    M=24,
    num_slices=6,
    max_support_slices=5,
    hyper_enc_widths=(24, 20, 16, 14, 12),
    hyper_dec_widths=(12, 14, 16, 20, 24),
    cc_widths=(16, 12, 10, 8),
)


@pytest.fixture(scope="module")
def setup():
    model = WACNN(**TINY)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 64, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}, x
    )
    dev = DeviceWireCodec(model, variables, lanes_per_image=4)
    scan = DeviceWireCodec(
        model, variables, lanes_per_image=4, scan_wire=True,
        tables=dev.tables,
    )
    host = CharmCodec(model, variables, tables=dev.tables)
    return dev, scan, host, x


def test_tags_present_and_distinct(setup):
    dev, scan, host, x = setup
    e_dev = dev.compress(x)
    e_scan = scan.compress(x)
    e_host = host.compress(x)
    for s in e_dev["strings"][0]:
        assert s[:3] == WIRE_MAGIC and s[3] == WIRE_DEVICE
        assert looks_like_framework_wire(s) == WIRE_DEVICE
    for s in e_scan["strings"][0]:
        assert s[:3] == WIRE_MAGIC and s[3] == WIRE_SCAN
        assert looks_like_framework_wire(s) == WIRE_SCAN
    # host streams: untagged reference-format bytes
    for s in e_host["strings"][0]:
        assert looks_like_framework_wire(s) is None


def test_scan_stream_into_device_decoder_raises(setup):
    dev, scan, host, x = setup
    e_scan = scan.compress(x)
    with pytest.raises(WireFormatError, match="expects device-v2"):
        dev.decompress(e_scan["strings"], e_scan["shape"])


def test_device_stream_into_scan_decoder_raises(setup):
    dev, scan, host, x = setup
    e_dev = dev.compress(x)
    with pytest.raises(WireFormatError, match="expects scan-wire"):
        scan.decompress(e_dev["strings"], e_dev["shape"])


def test_device_stream_into_host_decoder_raises(setup):
    dev, scan, host, x = setup
    e_dev = dev.compress(x)
    with pytest.raises(WireFormatError, match="host rANS"):
        host.decompress(e_dev["strings"], e_dev["shape"])


def test_host_stream_into_device_decoder_raises(setup):
    dev, scan, host, x = setup
    e_host = host.compress(x)
    with pytest.raises(WireFormatError, match="untagged"):
        dev.decompress(e_host["strings"], e_host["shape"])
