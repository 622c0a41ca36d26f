#!/usr/bin/env python
"""Model evaluation harness (reference
``compressai/utils/eval_model/__main__.py``): three modes switched on the
architecture/task —

  image      : bpp + PSNR + MS-SSIM per image, real coder
               (compress/decompress, images padded to x64 like the
               reference, __main__.py:96-139) or entropy estimation
               (--entropy-estimation, __main__.py:142-247)
  detection  : run the codec, decode detections from the reconstruction
               with the RetinaNet head, COCO-protocol bbox mAP
               (__main__.py:256-381)
  segmentation: DeepLab student output vs masks -> mIoU/pixAcc
               (__main__.py:383-440)

Example:
  python tools/eval_model.py image -m cnn -d /data/kodak --checkpoint ckpt
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools._common import model_kwargs  # noqa: E402


def parse_args(argv=None):
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("task", choices=["image", "detection", "segmentation"])
    p.add_argument("-m", "--model", default="cnn")
    p.add_argument("-d", "--dataset", required=True)
    p.add_argument("--split", default="val2017")
    p.add_argument(
        "--dataset-type", choices=["coco", "csv"], default="coco",
        help="detection only: 'csv' evaluates a CSVDataset with the "
        "reference's standalone per-class-AP protocol "
        "(retinanet/csv_eval.py:152-259); --dataset is then the "
        "annotations CSV and --class-list the class-map CSV",
    )
    p.add_argument("--class-list", default=None,
                   help="class-map CSV for --dataset-type csv")
    p.add_argument("--csv-root", default="",
                   help="image root prefix for --dataset-type csv")
    p.add_argument("--csv-min-side", type=int, default=256)
    p.add_argument("--csv-max-side", type=int, default=256)
    p.add_argument("--iou-threshold", type=float, default=0.5,
                   help="csv eval match IoU (csv_eval.py evaluate default)")
    p.add_argument(
        "--pair-dir", default=None,
        help="image mode, czigzag only: directory of same-named "
        "conditioning images (the reference's paired-dataset convention, "
        "datasets/utils.py:92-157); relative names resolve under the "
        "dataset root",
    )
    p.add_argument("--checkpoint", default=None)
    p.add_argument(
        "--torch-checkpoint", default=None,
        help="reference .pth/.pth.tar checkpoint: converted in place via "
        "icm_tpu.zoo (all 19 registry names); codec CDF tables are "
        "rebuilt from the converted weights",
    )
    p.add_argument("--entropy-estimation", action="store_true")
    p.add_argument(
        "--real-coder", action="store_true",
        help="detection/segmentation: feed the task net from the ACTUAL "
        "compress->decompress reconstruction (bitstream-level task "
        "metrics, the reference's '__main__.py:256-381' promise) instead "
        "of the forward-path x_hat",
    )
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--model-kwargs", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--wire", choices=("host", "device"), default="host",
        help="entropy-coding transport: host = reference-interoperable "
        "coder; device = the TPU-native on-device lane rANS "
        "(DeviceWireKit; supported by every codable family)",
    )
    p.add_argument(
        "--scan-wire", action="store_true",
        help="slice-AR families: one-lax.scan AR codec "
        "(models/scan_codec.py); implies --wire device",
    )
    args = p.parse_args(argv)
    if args.scan_wire:
        args.wire = "device"
    return args


def resolve_model_kwargs(args) -> dict:
    kwargs = model_kwargs(args)
    if (
        args.model == "stf4"
        and not args.entropy_estimation
        and "causal" not in kwargs
    ):
        # stf4's real coder needs the causal context variant (same
        # params; the reference stf4 mask degenerates at token 0 — see
        # ClipEncoder4). stf3's reference mask is already causal, so its
        # default mode codes directly.
        kwargs["causal"] = True
    return kwargs


def load_model_and_params(args, example):
    import jax

    from icm_tpu.models import create_model
    from icm_tpu.train import load_checkpoint

    model = create_model(args.model, **resolve_model_kwargs(args))
    rngs = {
        "params": jax.random.PRNGKey(args.seed),
        "noise": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }
    variables = dict(jax.jit(model.init)(rngs, *example))
    if args.torch_checkpoint:
        from icm_tpu.zoo import load_reference_checkpoint

        converted = load_reference_checkpoint(args.model, args.torch_checkpoint)
        if isinstance(converted, dict) and "params" in converted:
            variables.update(converted)
        else:
            variables["params"] = converted
        print(f"converted reference checkpoint {args.torch_checkpoint}")
    if args.checkpoint:
        from icm_tpu.train import TrainState, make_optimizer

        state = TrainState.create(variables["params"], make_optimizer())
        state, _ = load_checkpoint(args.checkpoint, target=state)
        variables["params"] = state.params
        print(f"loaded checkpoint {args.checkpoint}")
    return model, variables


CODEC_KINDS = {
    "stf9": "crc", "stf11": "crc", "stf12": "crc", "stf14": "crc",
    "stf13": "crc3", "seg_oj_ICM": "segoj", "stf2": "stf2",
    "stf3": "masked", "stf4": "masked", "czigzag": "czigzag",
}


def descan_for_codec(model, variables):
    """Training checkpoints commonly hold the scan_charm parameterization
    (one lax.scan with stacked per-slice weights); the real coder drives
    the unrolled per-slice protocol. Convert transparently so a scanned
    checkpoint evaluates through the bitstream path unchanged."""
    params = variables.get("params", {})
    if "charm_scan" in params:
        from icm_tpu.models.cnn import unstack_charm_params

        latent = getattr(model, "M", None) or model.latent_dim  # stf: 384
        p = dict(params)
        p.update(
            unstack_charm_params(
                {"charm_scan": p.pop("charm_scan")},
                model.num_slices,
                latent // model.num_slices,
                model.max_support_slices,
                model.hyper_dec_widths[-1],
            )
        )
        variables = dict(variables)
        variables["params"] = p
        model = model.clone(scan_charm=False)
    elif "zigzag_scan" in params:
        from icm_tpu.models.stf_family import unstack_zigzag_params

        unrolled = model.clone(scan_charm=False)
        p = dict(params)
        p.update(unstack_zigzag_params(p.pop("zigzag_scan"), unrolled))
        variables = dict(variables)
        variables["params"] = p
        model = unrolled
    elif "czigzag_scan" in params:
        from icm_tpu.models.czigzag import unstack_czigzag_params

        unrolled = model.clone(scan_charm=False)
        p = dict(params)
        p.update(unstack_czigzag_params(p.pop("czigzag_scan"), unrolled))
        variables = dict(variables)
        variables["params"] = p
        model = unrolled
    import jax

    return model, jax.device_put(variables)


def build_codec(name, model, variables, wire: str = "host",
                scan_wire: bool = False):
    """Codec driver for a registry name (None if the model has none).

    ``wire='device'`` selects on-device entropy coding (DeviceWireKit)
    for EVERY codable family — slice-AR codecs ride the lane rANS
    per-slice, stf2 rides its one-program scan wire, stf3/stf4 decode
    against the encoder's exact full-context executable with zero
    intermediate round-trips. ``scan_wire=True`` (slice-AR kinds,
    requires wire='device') compiles each AR layer as ONE lax.scan
    program (models/scan_codec.py) instead of per-slice programs — the
    warm-up cost drops from ctx_slices compiles per direction to one."""
    model, variables = descan_for_codec(model, variables)
    kind = CODEC_KINDS.get(name, "charm")
    if scan_wire and kind not in ("crc", "crc3", "segoj", "charm",
                                  "czigzag"):
        raise ValueError(f"{name} ({kind}): no scan-wire codec")
    if kind == "crc":
        from icm_tpu.models import CRCCodec

        return CRCCodec(model, variables, wire=wire,
                        scan_wire=scan_wire), kind
    if kind == "crc3":
        from icm_tpu.models.crc_codec import CRC3Codec

        return CRC3Codec(model, variables, wire=wire,
                         scan_wire=scan_wire), kind
    if kind == "segoj":
        from icm_tpu.models import SegOjCodec

        return SegOjCodec(model, variables, wire=wire,
                          scan_wire=scan_wire), kind
    if kind == "stf2":
        from icm_tpu.models.crc_codec import Stf2Codec

        return Stf2Codec(model, variables, wire=wire), kind
    if kind == "masked":
        from icm_tpu.models import Stf3Codec

        return Stf3Codec(model, variables, wire=wire), kind
    if kind == "czigzag":
        from icm_tpu.models.crc_codec import CzigzagCodec

        return CzigzagCodec(model, variables, wire=wire,
                            scan_wire=scan_wire), kind
    if wire == "device":
        from icm_tpu.models.device_codec import DeviceWireCodec

        return DeviceWireCodec(model, variables, scan_wire=scan_wire), kind
    if scan_wire:
        raise ValueError("scan_wire requires wire='device'")
    from icm_tpu.models import CharmCodec

    return CharmCodec(model, variables), kind


def codec_roundtrip(codec, kind, x, up=None):
    """compress -> decompress; returns (x_hat, bits, t_enc, t_dec)."""
    t0 = time.time()
    enc = codec.compress(x, up) if kind == "czigzag" else codec.compress(x)
    t_enc = time.time() - t0
    t0 = time.time()
    if kind == "czigzag":
        dec = codec.decompress(enc["strings"], enc["shape"], up)
    elif kind == "crc":
        dec = codec.decompress(enc["strings"], enc["shape"], enc["human_shape"])
    elif kind == "crc3":
        dec = codec.decompress(
            enc["strings"], enc["shape"], enc["seg_shape"], enc["human_shape"]
        )
    elif kind == "segoj":
        dec = codec.decompress(enc["strings"], enc["shape"], enc["seg_shape"])
    elif kind == "stf2":
        dec = codec.decompress(
            enc["strings"], enc["shape"], enc["out_hw"], enc["lattice"]
        )
    else:
        dec = codec.decompress(enc["strings"], enc["shape"])
    t_dec = time.time() - t0
    bits = sum(len(s) * 8 for ss in enc["strings"] for s in ss)
    return dec["x_hat"], bits, t_enc, t_dec


def eval_image(args):
    import jax
    import jax.numpy as jnp

    from icm_tpu.data import ImageFolder
    from icm_tpu.data.transforms import pad_to_multiple
    from icm_tpu.eval import ms_ssim, psnr
    from icm_tpu.train.losses import compute_bpp

    paired = args.model == "czigzag"
    if paired:
        if not args.pair_dir:
            raise SystemExit(
                "czigzag conditions on a paired up_x4 image; pass "
                "--pair-dir (directory of same-named conditioning images, "
                "the reference's paired-dataset convention, "
                "datasets/utils.py:92-157)"
            )
        from icm_tpu.data import ImageFolderCzigzag

        ds = ImageFolderCzigzag(
            args.dataset, args.split, context_dirname=args.pair_dir
        )
        img0, ctx0 = ds[0]
        example = (
            jnp.asarray(pad_to_multiple(img0, 64)[0][None]),
            jnp.asarray(pad_to_multiple(ctx0, 64)[0][None]),
        )
    else:
        ds = ImageFolder(args.dataset, args.split)
        example = (jnp.asarray(pad_to_multiple(ds[0], 64)[0][None]),)
    model, variables = load_model_and_params(args, example)

    codec = None
    kind = CODEC_KINDS.get(args.model, "charm")
    if not args.entropy_estimation:
        try:
            codec, kind = build_codec(args.model, model, variables,
                                  wire=args.wire,
                                  scan_wire=args.scan_wire)
        except Exception as e:  # models without a coder path
            print(f"real coder unavailable for {args.model} ({e}); "
                  "falling back to entropy estimation")

    results = []
    n = min(len(ds), args.max_images or len(ds))
    for i in range(n):
        up = None
        if paired:
            img, ctx = ds[i]
            up = jnp.asarray(pad_to_multiple(ctx, 64)[0][None])
        else:
            img = ds[i]
        padded, (H, W) = pad_to_multiple(img, 64)
        x = jnp.asarray(padded[None])
        num_pixels = H * W
        if codec is not None:
            x_hat, bits, t_enc, t_dec = codec_roundtrip(codec, kind, x, up)
            bpp = bits / num_pixels
        else:
            fargs = (x, up) if paired else (x,)
            out = model.apply(variables, *fargs, training=False)
            bpp = float(compute_bpp(out["likelihoods"], num_pixels))
            x_hat = jnp.clip(out["x_hat"], 0, 1)
            t_enc = t_dec = 0.0
        x_hat = x_hat[:, :H, :W]
        xc = x[:, :H, :W]
        r = {
            "bpp": float(bpp),
            "psnr": float(psnr(xc, x_hat)),
            "ms_ssim": float(ms_ssim(xc, x_hat)) if min(H, W) >= 176 else None,
            "enc_time": t_enc,
            "dec_time": t_dec,
        }
        results.append(r)
        print(f"[{i + 1}/{n}] " + json.dumps(r))

    agg = {}
    for k in results[0]:
        vals = [r[k] for r in results if r[k] is not None]
        agg[k] = float(np.mean(vals)) if vals else None
    print("average:", json.dumps(agg))
    return agg


def eval_detection(args):
    import jax
    import jax.numpy as jnp

    from icm_tpu.data import CocoDetectionDataset
    from icm_tpu.data.transforms import pad_to_multiple
    from icm_tpu.eval import compute_map, csv_eval_ap
    from icm_tpu.tasks.retinanet import decode_detections

    if args.dataset_type == "csv":
        # reference standalone CSV eval loop (retinanet/csv_eval.py:152-259)
        from icm_tpu.data.csv_dataset import CSVDataset

        if not args.class_list:
            raise SystemExit("--dataset-type csv requires --class-list")
        ds = CSVDataset(
            args.dataset, args.class_list, root=args.csv_root,
            min_side=args.csv_min_side, max_side=args.csv_max_side,
        )
    else:
        ds = CocoDetectionDataset(args.dataset, args.split)
    s0 = ds[0]
    x0 = pad_to_multiple(s0["img"], 64)[0][None]
    model, variables = load_model_and_params(args, (jnp.asarray(x0),))

    codec = kind = None
    total_bits = total_pixels = 0
    if args.real_coder:
        codec, kind = build_codec(args.model, model, variables,
                                  wire=args.wire,
                                  scan_wire=args.scan_wire)

        def student_detect(v, x_hat):
            return model.apply(
                v, x_hat, method=lambda mdl, xx: mdl.studentNet(xx)
            )

    dets, gts = {}, {}
    n = min(len(ds), args.max_images or len(ds))
    for i in range(n):
        s = ds[i]
        padded, (H, W) = pad_to_multiple(s["img"], 64)
        if codec is not None:
            # bitstream-level mAP: detections on the DECODED image
            # (reference __main__.py:256-381 promise)
            x_hat, bits, _, _ = codec_roundtrip(
                codec, kind, jnp.asarray(padded[None])
            )
            total_bits += bits
            total_pixels += H * W
            _, _, cls, reg, anchors = student_detect(variables, x_hat)
        else:
            out = model.apply(
                variables, jnp.asarray(padded[None]), training=False,
            )
            if out.get("Student_classification") is None:
                raise SystemExit(
                    f"model {args.model} does not produce detection outputs"
                )
            cls = out["Student_classification"]
            reg = out["Student_regression"]
            anchors = out["Student_anchors"]
        scores, labels, boxes = decode_detections(cls, reg, anchors, (H, W))
        iid = s["name"] if args.dataset_type == "csv" else int(s["image_id"])
        dets[iid] = {
            "boxes": boxes / s["scale"],
            "scores": scores,
            "labels": labels,
        }
        a = s["annot"]
        gts[iid] = {"boxes": a[:, :4] / s["scale"], "labels": a[:, 4]}
        print(f"[{i + 1}/{n}] {len(scores)} detections")

    if args.dataset_type == "csv":
        aps = csv_eval_ap(
            dets, gts, ds.num_classes, iou_threshold=args.iou_threshold
        )
        print("\nmAP:")
        per_class = {}
        for label, (ap, n_ann) in aps.items():
            name = ds.labels.get(label, str(label))
            per_class[name] = ap
            print(f"{name}: {ap}  ({n_ann} annotations)")
        with_ann = [ap for ap, n_ann in aps.values() if n_ann > 0]
        res = {
            "per_class_AP": per_class,
            "mAP": float(np.mean(with_ann)) if with_ann else 0.0,
        }
        if total_pixels:
            res["bpp"] = total_bits / total_pixels
        print("mAP:", json.dumps(res))
        return res

    res = compute_map(dets, gts, class_names=getattr(ds, "class_names", None))
    if total_pixels:
        res["bpp"] = total_bits / total_pixels
    # full COCOeval-style table (reference coco_eval.py summarize +
    # csv_eval.py per-class AP)
    for tag, label in (
        ("mAP", "AP @[.50:.95 | all | 100]"),
        ("AP50", "AP @[.50      | all | 100]"),
        ("AP75", "AP @[.75      | all | 100]"),
        ("AP_small", "AP @[.50:.95 | small]"),
        ("AP_medium", "AP @[.50:.95 | medium]"),
        ("AP_large", "AP @[.50:.95 | large]"),
        ("AR1", "AR @[.50:.95 | all | 1]"),
        ("AR10", "AR @[.50:.95 | all | 10]"),
        ("AR100", "AR @[.50:.95 | all | 100]"),
        ("AR_small", "AR @[.50:.95 | small]"),
        ("AR_medium", "AR @[.50:.95 | medium]"),
        ("AR_large", "AR @[.50:.95 | large]"),
    ):
        print(f"  {label:<28s} = {res[tag]:.3f}")
    for cname, ap in sorted(res["per_class_AP"].items(), key=str):
        print(f"  class {cname}: AP = {ap:.3f}")
    print("mAP:", json.dumps(res))
    return res


def eval_segmentation(args):
    import jax.numpy as jnp

    from icm_tpu.data import COCOSegmentation
    from icm_tpu.data.transforms import pad_to_multiple
    from icm_tpu.eval import SegmentationMetric

    ds = COCOSegmentation(args.dataset, split="val")
    img0, _ = ds[0]
    x0 = pad_to_multiple(img0, 64)[0][None]
    model, variables = load_model_and_params(args, (jnp.asarray(x0),))

    codec = kind = None
    total_bits = total_pixels = 0
    if args.real_coder:
        codec, kind = build_codec(args.model, model, variables,
                                  wire=args.wire,
                                  scan_wire=args.scan_wire)

        def student_seg(v, x_hat):
            return model.apply(
                v, x_hat, method=lambda mdl, xx: mdl.student_seg_Net(xx)
            )

    metric = SegmentationMetric(ds.NUM_CLASS)
    n = min(len(ds), args.max_images or len(ds))
    for i in range(n):
        img, mask = ds[i]
        padded, (H, W) = pad_to_multiple(img, 64)
        if codec is not None:
            # bitstream-level mIoU on the DECODED image
            x_hat, bits, _, _ = codec_roundtrip(
                codec, kind, jnp.asarray(padded[None])
            )
            total_bits += bits
            total_pixels += H * W
            logits = student_seg(variables, x_hat)
        else:
            out = model.apply(
                variables, jnp.asarray(padded[None]), training=False,
            )
            logits = out.get("Student_output")
            if logits is None:
                raise SystemExit(
                    f"model {args.model} does not produce segmentation outputs"
                )
        metric.update(np.asarray(logits[0, :H, :W]), mask)
        pix, miou = metric.get()
        print(f"[{i + 1}/{n}] pixAcc={pix:.4f} mIoU={miou:.4f}")

    pix, miou = metric.get()
    res = {"pixAcc": pix, "mIoU": miou}
    if total_pixels:
        res["bpp"] = total_bits / total_pixels
    print("final:", json.dumps(res))
    return res


def main(argv=None):
    args = parse_args(argv)
    if args.task == "image":
        return eval_image(args)
    if args.task == "detection":
        return eval_detection(args)
    return eval_segmentation(args)


if __name__ == "__main__":
    main()
