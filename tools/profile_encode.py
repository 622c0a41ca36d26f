"""Encode-time breakdown: device dispatch chain, the single batched
device fetch, and the host rANS passes (decode counterpart:
tools/profile_decode.py).

Usage: python tools/profile_encode.py [--size 512] [--batch 4]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=4)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from icm_tpu import coding
    from icm_tpu.models import CharmCodec, WACNN
    from icm_tpu.nn import set_use_pallas

    set_use_pallas(None)
    model = WACNN()
    x = jnp.clip(
        0.5 + 0.08 * jax.random.normal(
            jax.random.PRNGKey(0), (args.batch, args.size, args.size, 3)
        ), 0.0, 1.0,
    )
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}, x
    )
    jax.block_until_ready(variables)
    codec = CharmCodec(model, variables)
    enc = codec.compress(x)  # warm every jit

    def timed_encode():
        t = {}
        t0 = time.time()
        pend = codec._compress_dispatch(x)
        t["dispatch"] = time.time() - t0  # pure async queueing
        t0 = time.time()
        fetched = jax.device_get(
            (pend["z16"], pend["z_ovf"], pend["sym16s"], pend["ovfs"],
             pend["idxs"])
        )
        t["device_wait_fetch"] = time.time() - t0  # device chain + transfer
        z16, _, sym16s, _, idxs = fetched
        gt = codec.tables.gaussian
        t0 = time.time()
        z_strings = codec._encode_z_host(np.asarray(z16))
        symbols = np.concatenate(
            [codec._flat(s).astype(np.int32) for s in sym16s], axis=1
        )
        indexes = np.concatenate([codec._flat(i) for i in idxs], axis=1)
        y_strings = coding.encode_batch(
            symbols, indexes, gt.quantized_cdf, gt.cdf_length, gt.offset
        )
        t["host_rans"] = time.time() - t0
        return t, y_strings, z_strings

    t, ys, zs = timed_encode()
    total = sum(t.values())
    # device->host payload: 10x (int8 symbols + uint8 indexes) + z int8
    sym_bytes = args.batch * (args.size // 16) ** 2 * 320 * 1
    idx_bytes = args.batch * (args.size // 16) ** 2 * 320 * 1
    z_bytes = args.batch * (args.size // 64) ** 2 * 192 * 1
    report = {
        "backend": jax.default_backend(),
        "batch": args.batch,
        "size": args.size,
        "total_s": round(total, 3),
        "phases_s": {k: round(v, 4) for k, v in t.items()},
        "phase_share": {k: round(v / total, 3) for k, v in t.items()},
        "fetch_payload_mb": round((sym_bytes + idx_bytes + z_bytes) / 1e6, 2),
        "stream_mb": round(
            (sum(len(s) for s in ys) + sum(len(s) for s in zs)) / 1e6, 2
        ),
        "note": (
            "dispatch = queueing the analysis + 10 AR slice steps "
            "(async); device_wait_fetch = wait for the device chain + "
            "one batched device->host copy of all symbols/indexes; "
            "host_rans = layout flatten + threaded rANS encode"
        ),
    }
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
