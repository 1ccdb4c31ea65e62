"""Per-stage profile of the ortho-plane e2e workload (bench.py bench_ortho
fixture): full StageTimer report per axis plus consensus split.  Run on the
TPU with an idle host — host stages are meaningless under CPU contention."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    from bench import H, _bench_engine, _blob_volume  # noqa: F401
    from empanada_tpu.stitch.consensus import merge_objects_from_trackers
    from empanada_tpu.utils import StageTimer

    d, hw = 64, 256
    volume = _blob_volume(d, hw, hw, 6)
    engine = _bench_engine(hw, max_centers=512)

    # warmup compiles: xy (256,256) + xz/yz shared (64,256)
    engine.infer_on_axis(volume[:, :, : engine._resolve_batch(volume.shape, 2)], "yz")
    engine.infer_on_axis(volume[: engine._resolve_batch(volume.shape, 0)], "xy")

    per_axis = {}
    t_total = time.perf_counter()
    trackers = {}
    for ax in ("xy", "xz", "yz"):
        timer = StageTimer()
        t0 = time.perf_counter()
        _, tr = engine.infer_on_axis(volume, ax, timer=timer)
        per_axis[ax] = {"wall_s": round(time.perf_counter() - t0, 3),
                        "batch": engine.last_batch_size,
                        **{k: v["total_s"] for k, v in timer.report().items()}}
        trackers[ax] = tr
    t_sweeps = time.perf_counter() - t_total

    t0 = time.perf_counter()
    merge_objects_from_trackers(
        [trackers[ax][0] for ax in ("xy", "xz", "yz")],
        pixel_vote_thr=2, cluster_iou_thr=0.75,
    )
    t_cons = time.perf_counter() - t0

    total = t_sweeps + t_cons
    for ax, rep in per_axis.items():
        print(ax, rep)
    print(f"sweeps {t_sweeps:.3f}s  consensus {t_cons:.3f}s  total {total:.3f}s")
    print(f"output Mvox/s: {d * hw * hw / total / 1e6:.3f}")


if __name__ == "__main__":
    main()
