"""Ablation sweep CLI (replaces the utils/dmux/* cluster scripts).

Reproduces the paper's ablation grids in one process, one config after
another on the local mesh (the reference sharded these over 25 cluster
jobs):
  fig7: k in {2..8}            (utils/dmux/run_exp_fig-7.sh)
  fig8: clustering batch 1..50 (run_exp_fig-8.sh)
  fig9: felzenszwalb scale 100..800 (run_exp_fig-9.sh)
Custom single-axis sweeps: --param kmeans.n_clusters --values 2 3 4.

Writes one CSV row per configuration with the aggregate metrics.
"""

from __future__ import annotations

import argparse
import dataclasses
import os

from spalign_tpu.cli.common import build_label_dataset, load_drn_weights
from spalign_tpu.cli.label_gen import config_from_args, get_args as \
    label_gen_args
from spalign_tpu.eval.results import aggregate_results

FIG_GRIDS = {
    "fig7": ("kmeans.n_clusters", [2, 3, 4, 5, 6, 7, 8]),
    "fig8": ("batchsize", [1, 5, 10, 20, 30, 40, 50]),
    "fig9": ("superpixel.felzenszwalb_scale",
             [100.0, 200.0, 300.0, 400.0, 500.0, 600.0, 700.0, 800.0]),
}


def set_nested(cfg, dotted: str, value):
    parts = dotted.split(".")
    if len(parts) == 1:
        return dataclasses.replace(cfg, **{parts[0]: value})
    sub = getattr(cfg, parts[0])
    return dataclasses.replace(
        cfg, **{parts[0]: set_nested(sub, ".".join(parts[1:]), value)})


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__, add_help=False)
    p.add_argument("--grid", choices=list(FIG_GRIDS) + ["custom"],
                   default="fig7")
    p.add_argument("--param", type=str, default=None,
                   help="dotted config path for --grid custom")
    p.add_argument("--values", type=float, nargs="*", default=None)
    p.add_argument("--sweep_out", type=str, default="results/sweep.csv")
    sweep_args, rest = p.parse_known_args(argv)

    base_args = label_gen_args(rest)
    base_cfg = config_from_args(base_args)
    dataset = build_label_dataset(base_args, base_cfg.resize_shape)
    variables = load_drn_weights(base_args)

    if sweep_args.grid == "custom":
        if not sweep_args.param or sweep_args.values is None:
            raise SystemExit("--grid custom needs --param and --values")
        param, values = sweep_args.param, sweep_args.values
    else:
        param, values = FIG_GRIDS[sweep_args.grid]

    from spalign_tpu.pipeline.direct import make_label_generator

    os.makedirs(os.path.dirname(sweep_args.sweep_out) or ".",
                exist_ok=True)

    # ONE generator for the whole grid.  The reference fanned each grid
    # point out as its own cluster job; with minutes-long tunnel compiles
    # the equivalent here (a fresh generator per value) would spend hours
    # recompiling identical programs.  Instead:
    #   * k sweeps compile ONCE: dynamic_k makes the cluster count a
    #     runtime value (ops/kmeans.py:weighted_kmeans_dynamic);
    #   * host-only parameters (felzenszwalb scale/sigma, batchsize, ...)
    #     swap via reconfigure(), which keeps every compiled program
    #     unless a program-baked field changed.
    # The CSV carries the trace count so compile sharing is auditable.
    dynamic_k = None
    if param == "kmeans.n_clusters":
        if min(values) < 2:
            # kmeans_seed_assignment computes rank % (k - 1) with a
            # traced k: k < 2 would be a silent device-side mod-by-zero
            raise SystemExit("kmeans.n_clusters sweep values must be >= 2")
        dynamic_k = int(max(values))
    gen = make_label_generator(base_cfg, variables=variables,
                               model_name=base_args.model,
                               seed=base_args.seed, dynamic_k=dynamic_k)
    rows = []
    for v in values:
        if param in ("kmeans.n_clusters", "batchsize"):
            v = int(v)
        cfg = set_nested(base_cfg, param, v)
        cfg = dataclasses.replace(
            cfg, out_dir=os.path.join(base_cfg.out_dir, f"{param}={v}"))
        gen.reconfigure(cfg)
        records = gen.process_dataset(dataset, save=False)
        agg = aggregate_results([r for r in records if "road_iou" in r])
        traces = gen.n_program_traces()
        rows.append((v, agg, traces))
        print(f"{param}={v}: road IoU={agg['road_mean_iou']:.4f} "
              f"P={agg['precision']:.4f} R={agg['recall']:.4f} "
              f"(program traces so far: {traces})")

    with open(sweep_args.sweep_out, "w") as f:
        f.write(f"{param},road_mean_iou,precision,recall,n,"
                f"program_traces\n")
        for v, agg, traces in rows:
            f.write(f"{v},{agg['road_mean_iou']},{agg['precision']},"
                    f"{agg['recall']},{agg['n']},{traces}\n")
    print(f"wrote {sweep_args.sweep_out} "
          f"(fused program traced {rows[-1][2]}x for {len(values)} "
          f"configurations)")


if __name__ == "__main__":
    main()
