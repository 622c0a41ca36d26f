"""Trained-model evidence: overfit a WACNN on a handful of synthetic
natural-statistics images and record the bpp/PSNR trajectory.

Answers the "does training actually work" question end-to-end: RD loss
must fall, bpp must fall, PSNR must rise, and at the end the REAL coder
(CharmCodec) must produce a bitstream whose bpp tracks the entropy
estimate on the trained weights.

Usage: python tools/overfit_demo.py [--steps 400] [--json overfit_demo.json]
Runs on whatever backend JAX selects (TPU under axon; CPU with
JAX_PLATFORMS=cpu).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_images(n: int, size: int, seed: int = 0):
    """Smooth gradient + blob + low-frequency texture images: compressible
    (unlike white noise) so rate actually has structure to learn."""
    import numpy as np

    rng = np.random.default_rng(seed)
    ys, xs = np.mgrid[0:size, 0:size] / size
    imgs = []
    for _ in range(n):
        img = np.zeros((size, size, 3), np.float32)
        for c in range(3):
            g = rng.random() * xs + rng.random() * ys
            for _ in range(4):
                cx, cy, s = rng.random(), rng.random(), 0.05 + 0.2 * rng.random()
                g = g + rng.normal() * np.exp(
                    -((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * s * s)
                )
            for _ in range(3):
                fx, fy = rng.integers(1, 6, 2)
                g = g + 0.1 * rng.normal() * np.sin(
                    2 * np.pi * (fx * xs + fy * ys) + rng.random() * 6.28
                )
            img[..., c] = g
        img -= img.min()
        img /= max(img.max(), 1e-6)
        imgs.append(img)
    return np.stack(imgs)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--lmbda", type=float, default=0.01)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--json", default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from icm_tpu.models import CharmCodec, WACNN
    from icm_tpu.train import RateDistortionLoss, compute_bpp
    from icm_tpu.train.optim import TrainState, make_optimizer
    from icm_tpu.train.steps import make_eval_step, make_train_step

    # mid-size model: big enough that learning is non-trivial, small
    # enough to overfit in a few hundred steps
    # scan_charm: the AR slice loop compiles ONCE as a lax.scan (the
    # unrolled loop's backward is compile-prohibitive over the tunnel)
    model = WACNN(
        N=64, M=96, num_slices=6, max_support_slices=5,
        hyper_enc_widths=(96, 80, 64, 56, 48),
        hyper_dec_widths=(48, 56, 64, 80, 96),
        cc_widths=(64, 48, 40, 32),
        scan_charm=True,
    )
    x_np = synth_images(args.batch, args.size)
    x = jnp.asarray(x_np)

    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}, x
    )
    criterion = RateDistortionLoss(lmbda=args.lmbda)
    tx = make_optimizer(learning_rate=args.lr)
    state = TrainState.create(variables["params"], tx)

    train_step = jax.jit(make_train_step(model, criterion))
    eval_step = jax.jit(make_eval_step(model, criterion))

    num_pixels = args.batch * args.size * args.size
    history = []
    t0 = time.time()
    rng = jax.random.PRNGKey(3)
    for step in range(args.steps + 1):
        if step % max(args.steps // 8, 1) == 0:
            m = eval_step(state.params, x)
            rec = {
                "step": step,
                "loss": round(float(m["loss"]), 4),
                "bpp": round(float(m["bpp_loss"]), 4),
                "psnr": round(float(m["psnr"]), 2),
            }
            history.append(rec)
            print(json.dumps(rec), flush=True)
        if step < args.steps:
            state, _ = train_step(state, x, rng)

    wall = time.time() - t0

    # real-coder check on the trained weights: the codec drives the
    # unrolled per-slice protocol, so unstack the scan-trained params
    from icm_tpu.models.cnn import unstack_charm_params

    unrolled = model.clone(scan_charm=False)
    p = dict(state.params)
    p.update(
        unstack_charm_params(
            p, model.num_slices, model.M // model.num_slices,
            model.max_support_slices, model.hyper_dec_widths[-1],
        )
    )
    p.pop("charm_scan")
    trained = {"params": p}
    codec = CharmCodec(unrolled, trained)
    enc = codec.compress(x)
    dec = codec.decompress(enc["strings"], enc["shape"])
    bits = sum(len(s) * 8 for ss in enc["strings"] for s in ss)
    coder_bpp = bits / num_pixels
    mse = float(jnp.mean((jnp.clip(dec["x_hat"], 0, 1) - x) ** 2))
    coder_psnr = -10.0 * np.log10(mse)

    out = unrolled.apply(trained, x, training=False)
    est_bpp = float(compute_bpp(out["likelihoods"], num_pixels))

    result = {
        "history": history,
        "first": history[0],
        "last": history[-1],
        "coder_bpp": round(coder_bpp, 4),
        "estimate_bpp": round(est_bpp, 4),
        "coder_psnr": round(float(coder_psnr), 2),
        "steps": args.steps,
        "wall_s": round(wall, 1),
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f, indent=1)
    ok = (
        history[-1]["bpp"] < history[0]["bpp"]
        and history[-1]["psnr"] > history[0]["psnr"]
    )
    print("TRAINING", "CONVERGES" if ok else "DID NOT CONVERGE")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
