"""Command-line entry points.

The reference exposes its functionality as napari GUI commands
(empanada_napari/napari.yaml); the TPU-native build exposes the same
capabilities as terminal commands so they run headless on TPU hosts:

  empanada-tpu infer2d   <image> --model MitoNet_v1 [--tile-size 2048] ...
  empanada-tpu infer3d   <volume> [--orthoplane] [--store out.zarr] ...
  empanada-tpu train     <config.yaml>
  empanada-tpu finetune  <config.yaml>
  empanada-tpu evaluate  <gt.json> <pred.json>
  empanada-tpu models    [list|export|import|archive]
  empanada-tpu tiles     [chop|merge]

Usage: python -m empanada_tpu.cli <command> ... (also installed as
``empanada-tpu`` via the console-scripts entry point).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _load_array(path: str):
    from PIL import Image

    if path.endswith(".npy"):
        return np.load(path)
    if os.path.isdir(path) and os.path.exists(os.path.join(path, ".zarray")):
        from empanada_tpu.core.chunked import open_chunked

        return open_chunked(path)
    img = Image.open(path)
    if getattr(img, "n_frames", 1) > 1:
        frames = []
        for i in range(img.n_frames):
            img.seek(i)
            frames.append(np.asarray(img))
        return np.stack(frames)
    return np.asarray(img)


def _save_labels(path: str, labels: np.ndarray):
    """Write exactly the requested path (the printed path must be the file
    on disk): .npy via numpy, everything else as a (multipage) tiff/png via
    PIL under the requested extension."""
    labels = np.asarray(labels)
    if path.endswith(".npy"):
        np.save(path, labels)
        return
    from PIL import Image

    from empanada_tpu.curation.export import _to_saveable

    if labels.ndim == 2:
        Image.fromarray(_to_saveable(labels)).save(path)
    else:
        frames = [Image.fromarray(_to_saveable(sl)) for sl in labels]
        frames[0].save(path, save_all=True, append_images=frames[1:])


def _model_config(name_or_path: str) -> dict:
    from empanada_tpu.api import get_configs, read_yaml

    if os.path.isfile(name_or_path):
        config = read_yaml(name_or_path)
        name = os.path.splitext(os.path.basename(name_or_path))[0]
    else:
        configs = get_configs()
        if name_or_path not in configs:
            raise SystemExit(
                f"unknown model '{name_or_path}'; registered: {sorted(configs)}"
            )
        config = read_yaml(configs[name_or_path])
        name = name_or_path
    config.setdefault("model_name", name)
    return config


def _model_list(args) -> list:
    """``--model`` is appendable; default to the flagship when omitted."""
    models = args.model or ["MitoNet_v1"]
    if len(set(models)) != len(models):
        raise SystemExit(f"duplicate --model entries: {models}")
    return models


def _parse_roi(spec: str):
    """'y1:y2,x1:x2' -> ((y1, y2), (x1, x2))."""
    try:
        ys, xs = spec.split(",")
        y1, y2 = (int(v) for v in ys.split(":"))
        x1, x2 = (int(v) for v in xs.split(":"))
    except ValueError:
        raise SystemExit(f"bad --roi '{spec}'; expected y1:y2,x1:x2")
    if y2 <= y1 or x2 <= x1:
        raise SystemExit(f"bad --roi '{spec}'; empty extent")
    return (y1, y2), (x1, x2)


def cmd_infer2d(args):
    """2D inference; --roi / --roi-mask confine it to a window or polygon
    mask, the terminal analog of the reference widget's viewport- and
    ROI-confined modes (_slice_inference.py:187,278: crop to the region,
    zero pixels outside the mask, write the result back at the offset).
    Repeated --model runs each model on the same window and additionally
    writes a combined panoptic map (disjoint class-id spaces, first model
    wins on overlap — the headless analog of running one widget per model
    and stacking the napari layers)."""
    from empanada_tpu.api import Engine2d

    models = _model_list(args)
    image = np.asarray(_load_array(args.image))

    roi_mask = None
    if args.roi_mask is not None:
        roi_mask = np.asarray(_load_array(args.roi_mask)) > 0
        if roi_mask.shape != image.shape:
            raise SystemExit(
                f"--roi-mask shape {roi_mask.shape} != image shape {image.shape}"
            )
    if args.roi is not None:
        (y1, y2), (x1, x2) = _parse_roi(args.roi)
        if y1 < 0 or x1 < 0 or y2 > image.shape[0] or x2 > image.shape[1]:
            raise SystemExit(
                f"--roi {args.roi} outside image bounds {image.shape}"
            )
    elif roi_mask is not None:
        ys, xs = np.nonzero(roi_mask)
        if len(ys) == 0:
            raise SystemExit("--roi-mask has no foreground pixels")
        y1, y2, x1, x2 = ys.min(), ys.max() + 1, xs.min(), xs.max() + 1
    else:
        y1, y2, x1, x2 = 0, image.shape[0], 0, image.shape[1]

    window = image[y1:y2, x1:x2]
    if roi_mask is not None:
        window = np.where(roi_mask[y1:y2, x1:x2], window, 0).astype(image.dtype)

    def run_one(config):
        engine = Engine2d(
            config,
            inference_scale=args.downsampling,
            label_divisor=args.label_divisor,
            nms_threshold=args.center_confidence,
            nms_kernel=args.nms_kernel,
            confidence_thr=args.segment_confidence,
            semantic_only=args.semantic_only,
            fine_boundaries=args.fine_boundaries,
            tile_size=args.tile_size,
            shape_buckets=args.shape_buckets,
            spatial_shard=args.spatial_shard,
            spatial_halo=args.spatial_halo,
        )
        pan_window = engine.infer(window)
        if roi_mask is not None:
            pan_window = np.where(roi_mask[y1:y2, x1:x2], pan_window, 0)
        if (y2 - y1, x2 - x1) != image.shape:
            pan = np.zeros(image.shape, dtype=pan_window.dtype)
            pan[y1:y2, x1:x2] = pan_window
        else:
            pan = pan_window
        return pan

    configs = [_model_config(m) for m in models]
    pans = [run_one(c) for c in configs]

    if len(models) == 1:
        pan = pans[0]
    else:
        from empanada_tpu.api import combine_panoptic_maps

        pan, combined_names = combine_panoptic_maps(
            pans, configs, label_divisor=args.label_divisor
        )
        root, ext = os.path.splitext(args.output)
        for config, per_model in zip(configs, pans):
            out = f"{root}_{config['model_name']}{ext}"
            _save_labels(out, per_model)
            print(f"wrote {out}")
        for cid, cname in sorted(combined_names.items()):
            print(f"combined class {cid}: {cname}")

    _save_labels(args.output, pan)
    u = np.unique(pan)
    n = int((u % args.label_divisor > 0).sum())  # stuff ids are exact multiples
    print(f"wrote {args.output}: {pan.shape}, {n} instances")


def _init_multihost(args):
    """Multi-host launch: ``--coordinator/--num-processes/--process-id`` (or
    the ``EMPANADA_COORDINATOR``/``EMPANADA_NUM_PROCESSES``/
    ``EMPANADA_PROCESS_ID`` env vars) initialize ``jax.distributed`` BEFORE
    any engine or mesh touches the backend, so ``jax.devices()`` spans all
    hosts and the same mesh-sharded code runs unchanged.  This is the CLI
    surface of the reference's TCP-rendezvous launcher
    (``empanada_napari/multigpu.py:222-226``); on TPU pods the arguments
    are auto-detected and none of this is needed."""
    coord = getattr(args, "coordinator", None) or os.environ.get(
        "EMPANADA_COORDINATOR")
    if coord is None:
        return

    def _arg_or_env(attr, env):
        val = getattr(args, attr, None)
        if val is None and os.environ.get(env) is not None:
            val = int(os.environ[env])
        return val

    from empanada_tpu.parallel import initialize_multihost

    idx, count = initialize_multihost(
        coord,
        num_processes=_arg_or_env("num_processes", "EMPANADA_NUM_PROCESSES"),
        process_id=_arg_or_env("process_id", "EMPANADA_PROCESS_ID"),
    )
    import jax

    print(f"multihost: process {idx}/{count}, "
          f"{len(jax.devices())} global devices", file=sys.stderr)


def cmd_infer3d(args):
    """Repeated --model runs each model over the volume sequentially; each
    model's class volumes are written/stored under its own name."""
    _init_multihost(args)
    for name in _model_list(args):
        _infer3d_one(args, name, multi=len(_model_list(args)) > 1)


def _infer3d_one(args, model_name, multi=False):
    from empanada_tpu.api import Engine3d, stack_postprocessing, tracker_consensus
    from empanada_tpu.parallel import MultiChipEngine3d

    config = _model_config(model_name)
    model_name = config["model_name"]   # registry key / config basename
    store = args.store
    if multi and store is not None:
        root, ext = os.path.splitext(store)
        store = f"{root}_{model_name}{ext}"
    common = dict(
        inference_scale=args.downsampling,
        label_divisor=args.label_divisor,
        median_kernel_size=args.median_slices,
        nms_threshold=args.center_confidence,
        nms_kernel=args.nms_kernel,
        confidence_thr=args.segment_confidence,
        semantic_only=args.semantic_only,
        fine_boundaries=args.fine_boundaries,
        shape_buckets=args.shape_buckets,
        min_size=args.min_size,
        min_extent=args.min_extent,
        store_url=store,
        save_panoptic=args.save_panoptic,
    )
    if args.multichip:
        engine = MultiChipEngine3d(config, batch_size=args.batch_size, **common)
    else:
        engine = Engine3d(config, **common)

    ckpt_dir = args.checkpoint_dir
    if multi and ckpt_dir is not None:
        ckpt_dir = os.path.join(ckpt_dir, model_name)
    ckpt_kw = {} if ckpt_dir is None else dict(
        checkpoint_dir=ckpt_dir,
        checkpoint_every=args.checkpoint_every,
        resume=args.resume,
    )
    progress = args.progress
    if progress is None:
        progress = sys.stderr.isatty()
    ckpt_kw["progress"] = progress

    volume = _load_array(args.volume)
    if args.orthoplane:
        trackers = engine.infer_orthoplane(volume, **ckpt_kw)
        worker = tracker_consensus(
            trackers, store, config,
            label_divisor=args.label_divisor,
            pixel_vote_thr=args.pixel_vote_thr,
            cluster_iou_thr=args.cluster_iou_thr,
            allow_one_view=args.allow_one_view,
            min_size=args.min_size, min_extent=args.min_extent,
        )
    else:
        _, axis_trackers = engine.infer_on_axis(volume, args.axis, **ckpt_kw)
        worker = stack_postprocessing(
            {args.axis: axis_trackers}, store, config,
            label_divisor=args.label_divisor,
            min_size=args.min_size, min_extent=args.min_extent,
        )

    for vol, class_name, instances in worker:
        tag = f"{model_name}/{class_name}" if multi else class_name
        print(f"class {tag}: {len(instances)} instances")
        if store is None and args.output:
            out = args.output.replace("{class}", tag.replace("/", "_"))
            _save_labels(out, np.asarray(vol))
            print(f"wrote {out}")


def cmd_train(args):
    from empanada_tpu.api import load_config
    from empanada_tpu.train import main as train_main

    _init_multihost(args)
    config = load_config(args.config)
    if getattr(args, "multichip", False):
        config.setdefault("TRAIN", {})["multichip"] = True
    if getattr(args, "resume", False):
        config.setdefault("TRAIN", {})["resume"] = True
    train_main(config)


def cmd_finetune(args):
    from empanada_tpu.api import load_config
    from empanada_tpu.train import finetune_main

    config = load_config(args.config)
    if isinstance(config.get("model_config"), str):
        config["model_config"] = _model_config(config["model_config"])
    _, _, bundle = finetune_main(config)
    print(f"finetuned bundle: {bundle}")


def cmd_evaluate(args):
    from empanada_tpu.eval import default_evaluator

    results = default_evaluator()(args.gt, args.pred)
    print(json.dumps({k: float(v) for k, v in results.items()}, indent=2))


def _require(args, parser_hint: str, **needed):
    for flag, value in needed.items():
        if value is None:
            raise SystemExit(f"{parser_hint}: --{flag} is required")


def cmd_models(args):
    from empanada_tpu.api import archive_model, export_model, get_configs, import_model

    if args.action == "list":
        for name, path in sorted(get_configs().items()):
            print(f"{name}\t{path}")
    elif args.action == "info":
        # finetuning annotation instructions (reference _finetune.py:157)
        from empanada_tpu.api.utils import model_info_text

        _require(args, "models info", name=args.name)
        try:
            print(model_info_text(args.name))
        except KeyError as e:
            raise SystemExit(f"models info: {e.args[0]}")
    elif args.action == "export":
        _require(args, "models export", name=args.name, path=args.path)
        print(export_model(args.name, args.path, quantize=args.quantize))
    elif args.action == "import":
        _require(args, "models import", path=args.path)
        print(import_model(args.path, model_name=args.name))
    elif args.action == "archive":
        _require(args, "models archive", name=args.name, path=args.path)
        print(archive_model(args.name, args.path))
    elif args.action == "deploy":
        # self-contained StableHLO serving artifact (the reference's
        # TorchScript-deploy analog): weights + full pipeline in one file,
        # loadable with jax alone
        from empanada_tpu.api import export_serving_artifact

        _require(args, "models deploy", name=args.name, path=args.path)
        h, w = (int(s) for s in args.shape.split("x"))
        config = _model_config(args.name)
        print(export_serving_artifact(
            config, args.path, (h, w),
            platforms=tuple(args.platforms.split(",")),
            nms_threshold=args.center_confidence,
            nms_kernel=args.nms_kernel,
            confidence_thr=args.segment_confidence,
            fine_boundaries=args.fine_boundaries,
            max_centers=args.max_centers,
        ))


def cmd_serve(args):
    """Run a serving artifact on an image — no model code or registry."""
    from empanada_tpu.api import load_serving_artifact

    model = load_serving_artifact(args.artifact)
    image = _load_array(args.image)
    pan = model(np.asarray(image))
    _save_labels(args.output, pan.astype(np.int64))
    print(f"wrote {args.output} ({len(np.unique(pan)) - 1} labeled segments)")


def cmd_tiles(args):
    from empanada_tpu.curation import chop_into_tiles, merge_tiles

    if args.action == "chop":
        _require(args, "tiles chop", image=args.image)
        meta = chop_into_tiles(args.image, args.dir, patch_size=args.patch_size,
                               mask_path=args.mask)
        print(json.dumps(meta))
    else:
        print(json.dumps(merge_tiles(args.dir, args.out)))


def cmd_port(args):
    """Convert a reference torch checkpoint to a flax model bundle."""
    from empanada_tpu.api import save_model_bundle
    from empanada_tpu.port import (
        infer_arch_and_kwargs,
        load_torch_checkpoint,
        port_state_dict,
    )

    from empanada_tpu.port.torch_port import CheckpointReadError

    config = _model_config(args.model) if args.model else None
    arch = args.arch or (config and config.get("arch"))
    kwargs = (config or {}).get("model_kwargs", {})
    try:
        state_dict, ckpt_arch = load_torch_checkpoint(
            args.checkpoint, allow_pickle=args.allow_pickle)
    except CheckpointReadError as e:
        raise SystemExit(
            f"port: {e}\nport needs a readable checkpoint "
            "(TorchScript archive, training checkpoint, or raw state dict; "
            "raw state dicts also need --arch or --model)")
    if arch is None:
        # published artifacts (TorchScript archives) carry no arch metadata;
        # recover arch + kwargs from the weights themselves
        arch, kwargs = infer_arch_and_kwargs(state_dict)
        print(f"inferred arch={arch} kwargs={kwargs}")
    variables = port_state_dict(state_dict, arch, kwargs)
    out = save_model_bundle(args.output, arch, kwargs, variables,
                            quantize=args.quantize)
    print(f"ported {args.checkpoint} ({ckpt_arch or arch}) -> {out}")


def cmd_labels(args):
    """Headless label curation (reference _label_counter_widget.py /
    _filter_small_labels.py widgets): count ids per class, filter small or
    border-touching labels."""
    labels = np.asarray(_load_array(args.labels))
    if args.action == "count":
        from empanada_tpu.curation import count_labels, save_label_lists

        queue, class_ids = count_labels(labels, args.label_divisor)
        for ci in class_ids:
            print(f"class {ci}: {len(queue[ci])} labels")
        if args.out:
            path = save_label_lists([queue], {c: str(c) for c in class_ids}, args.out)
            print(f"wrote {path}")
    else:
        from empanada_tpu.curation import apply_label_filter

        kwargs = {"filter": "boundary"} if args.action == "boundary" else {
            "filter": "small", "minimum_area_allowed": args.min_area}
        out, n_removed = apply_label_filter(labels.copy(), mode=args.mode, **kwargs)
        _save_labels(args.out or args.labels, out)
        print(f"removed {n_removed} labels -> {args.out or args.labels}")


def cmd_docs(args):
    readme = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "README.md")
    print(open(readme).read() if os.path.exists(readme) else "see PARITY.md / README.md in the repo")


def cmd_bench(args):
    import os
    import sys

    # bench.py lives at the repo root, importable only from a checkout
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)
    try:
        import bench
    except ImportError:
        raise SystemExit("bench.py not found (requires a source checkout)")
    bench.main(args.bench_args)


def build_parser():
    p = argparse.ArgumentParser("empanada-tpu")
    sub = p.add_subparsers(dest="command", required=True)

    def common_infer(sp):
        sp.add_argument("--model", action="append", default=None,
                        help="registered model name or config path; repeat "
                             "for multi-model panoptic (default MitoNet_v1)")
        sp.add_argument("--downsampling", type=int, default=1,
                        choices=[1, 2, 4, 8, 16, 32, 64],
                        help="inference scale (power of 2, as in the reference widget)")
        # both reference widgets default "maximum objects per class" to
        # 10000 (_slice_inference.py:42, _volume_inference.py:45); the
        # library-level Engine default stays 1000 like the reference's
        sp.add_argument("--label-divisor", type=int, default=10000,
                        dest="label_divisor")
        sp.add_argument("--center-confidence", type=float, default=0.1, dest="center_confidence")
        sp.add_argument("--nms-kernel", type=int, default=3, dest="nms_kernel")
        sp.add_argument("--segment-confidence", type=float, default=0.3, dest="segment_confidence")
        sp.add_argument("--semantic-only", action="store_true", dest="semantic_only")
        sp.add_argument("--fine-boundaries", action="store_true", dest="fine_boundaries")
        sp.add_argument("--shape-buckets", action="store_true", dest="shape_buckets",
                        help="pad to ~25%%-growth size buckets to bound jit recompiles")

    def multihost_args(sp):
        sp.add_argument("--coordinator", default=None,
                        help="host:port of process 0 — initializes "
                             "jax.distributed so all hosts' devices form one "
                             "mesh (env: EMPANADA_COORDINATOR)")
        sp.add_argument("--num-processes", type=int, default=None,
                        dest="num_processes",
                        help="total host processes (env: EMPANADA_NUM_PROCESSES)")
        sp.add_argument("--process-id", type=int, default=None,
                        dest="process_id",
                        help="this process's rank (env: EMPANADA_PROCESS_ID)")

    sp = sub.add_parser("infer2d", help="2D panoptic inference (tiled for big images)")
    sp.add_argument("image")
    sp.add_argument("-o", "--output", default="pan_seg.npy")
    sp.add_argument("--tile-size", type=int, default=0, dest="tile_size")
    sp.add_argument("--spatial-shard", action="store_true", dest="spatial_shard",
                    help="row-shard the slice over the device mesh with halo "
                         "exchange (seam-free replacement for the tile loop)")
    sp.add_argument("--spatial-halo", type=int, default=128, dest="spatial_halo")
    sp.add_argument("--roi", default=None,
                    help="confine inference to a window: y1:y2,x1:x2")
    sp.add_argument("--roi-mask", default=None, dest="roi_mask",
                    help="mask file (.npy/image); infer inside its bbox, zero outside")
    common_infer(sp)
    sp.set_defaults(func=cmd_infer2d)

    sp = sub.add_parser("infer3d", help="3D stack / ortho-plane inference")
    sp.add_argument("volume")
    sp.add_argument("-o", "--output", default="seg_{class}.npy")
    sp.add_argument("--axis", default="xy", choices=["xy", "xz", "yz"])
    sp.add_argument("--orthoplane", action="store_true")
    sp.add_argument("--multichip", action="store_true")
    sp.add_argument("--batch-size", type=int, default=None, dest="batch_size")
    sp.add_argument("--median-slices", type=int, default=3, dest="median_slices")
    sp.add_argument("--min-size", type=int, default=500, dest="min_size")
    # GUI-surface default is 5 (reference _volume_inference.py:44); the
    # library-level default stays 4 (reference inference.py:63)
    sp.add_argument("--min-extent", type=int, default=5, dest="min_extent")
    sp.add_argument("--pixel-vote-thr", type=int, default=2, dest="pixel_vote_thr")
    sp.add_argument("--cluster-iou-thr", type=float, default=0.75, dest="cluster_iou_thr")
    sp.add_argument("--allow-one-view", action="store_true", dest="allow_one_view")
    sp.add_argument("--store", default=None, help="chunked (zarr) store directory")
    sp.add_argument("--save-panoptic", action="store_true", dest="save_panoptic")
    sp.add_argument("--checkpoint-dir", default=None, dest="checkpoint_dir",
                    help="persist forward-pass state here every "
                         "--checkpoint-every slices; with --resume a rerun "
                         "continues from the last checkpoint (bit-identical "
                         "to an uninterrupted run)")
    sp.add_argument("--checkpoint-every", type=int, default=64,
                    dest="checkpoint_every")
    sp.add_argument("--resume", action="store_true",
                    help="resume from --checkpoint-dir state if present")
    sp.add_argument("--progress", action="store_true", default=None,
                    help="per-slice rate/ETA on stderr (default: on when "
                         "stderr is a terminal)")
    sp.add_argument("--no-progress", dest="progress", action="store_false")
    common_infer(sp)
    multihost_args(sp)
    sp.set_defaults(func=cmd_infer3d)

    sp = sub.add_parser("train", help="train from a yaml config")
    sp.add_argument("config")
    sp.add_argument("--multichip", action="store_true",
                    help="shard the batch axis over all devices (data-parallel)")
    sp.add_argument("--resume", action="store_true",
                    help="continue from <model_dir>/<model>_checkpoint.msgpack "
                         "(params + optimizer state + epoch)")
    multihost_args(sp)
    sp.set_defaults(func=cmd_train)

    sp = sub.add_parser("finetune", help="finetune a registered model")
    sp.add_argument("config")
    sp.set_defaults(func=cmd_finetune)

    sp = sub.add_parser("evaluate", help="compare RLE-JSON tracker dumps")
    sp.add_argument("gt")
    sp.add_argument("pred")
    sp.set_defaults(func=cmd_evaluate)

    sp = sub.add_parser("models", help="registry operations")
    sp.add_argument("action",
                    choices=["list", "info", "export", "import", "archive",
                             "deploy"])
    sp.add_argument("--name", default=None)
    sp.add_argument("--path", default=None)
    sp.add_argument("--quantize", action="store_true",
                    help="store int8 weights in the exported archive")
    sp.add_argument("--shape", default="512x512",
                    help="deploy: HxW the serving artifact is specialized for")
    sp.add_argument("--platforms", default="cpu,tpu",
                    help="deploy: comma-separated jax.export platforms")
    # deploy bakes these into the artifact; defaults match infer2d's
    sp.add_argument("--center-confidence", type=float, default=0.1,
                    dest="center_confidence")
    sp.add_argument("--nms-kernel", type=int, default=3, dest="nms_kernel")
    sp.add_argument("--segment-confidence", type=float, default=0.3,
                    dest="segment_confidence")
    sp.add_argument("--fine-boundaries", action="store_true",
                    dest="fine_boundaries")
    sp.add_argument("--max-centers", type=int, default=256, dest="max_centers")
    sp.set_defaults(func=cmd_models)

    sp = sub.add_parser(
        "serve", help="run a deployed serving artifact (needs only jax)"
    )
    sp.add_argument("artifact")
    sp.add_argument("image")
    sp.add_argument("-o", "--output", default="pan_seg.npy")
    sp.set_defaults(func=cmd_serve)

    sp = sub.add_parser("tiles", help="offline big-image tiling")
    sp.add_argument("action", choices=["chop", "merge"])
    sp.add_argument("--image", default=None)
    sp.add_argument("--mask", default=None)
    sp.add_argument("--dir", required=True)
    sp.add_argument("--out", default="merged")
    sp.add_argument("--patch-size", type=int, default=2048, dest="patch_size")
    sp.set_defaults(func=cmd_tiles)

    sp = sub.add_parser("labels", help="count / filter label maps")
    sp.add_argument("action", choices=["count", "small", "boundary"])
    sp.add_argument("labels", help="label map (.npy / tiff / zarr dir)")
    sp.add_argument("-o", "--out", default=None,
                    help="output (spreadsheet for count, label map for filters)")
    # must match the infer2d/infer3d default (10000) so an all-default
    # infer -> labels count pipeline decodes class/instance ids correctly
    sp.add_argument("--label-divisor", type=int, default=10000, dest="label_divisor")
    sp.add_argument("--min-area", type=int, default=100, dest="min_area")
    sp.add_argument("--mode", default="image", choices=["image", "patches", "volume"])
    sp.set_defaults(func=cmd_labels)

    sp = sub.add_parser("port", help="convert a torch checkpoint to a flax bundle")
    sp.add_argument("checkpoint")
    sp.add_argument("-o", "--output", default="ported")
    sp.add_argument("--model", default=None, help="registry config supplying arch/kwargs")
    sp.add_argument("--arch", default=None)
    sp.add_argument("--quantize", action="store_true",
                    help="store int8 weights in the output bundle")
    sp.add_argument("--allow-pickle", action="store_true",
                    help="permit full-pickle torch.load for trusted legacy "
                         "checkpoints (arbitrary code execution risk)")
    sp.set_defaults(func=cmd_port)

    sp = sub.add_parser("docs", help="print the framework documentation")
    sp.set_defaults(func=cmd_docs)

    sp = sub.add_parser("bench", help="run the throughput benchmark")
    sp.add_argument("bench_args", nargs=argparse.REMAINDER,
                    help="flags forwarded to bench.py (e.g. --skip-3d --int8)")
    sp.set_defaults(func=cmd_bench)

    return p


def main(argv=None):
    import sys

    if argv is None:
        argv = sys.argv[1:]
    # `bench` forwards everything after it to bench.py verbatim
    # (argparse.REMAINDER no longer captures leading optionals on py3.12)
    if argv and argv[0] == "bench":
        ns = argparse.Namespace(bench_args=list(argv[1:]))
        return cmd_bench(ns)
    args = build_parser().parse_args(argv)
    args.func(args)


if __name__ == "__main__":
    main()
