"""Repeat-protocol benchmark runner — the scripts/replica_rgbd.sh equivalent.

The reference's benchmark scripts run every sequence 5x to average out SLAM
nondeterminism, then aggregate with eval/onekey.py (reference:
scripts/replica_rgbd.sh:2-3, README.md:275). This runner executes an app
main() N times into <out>/run_<i>/ and aggregates via eval/harness.aggregate
into <out>/log.txt + log.csv.

Usage:
  python scripts/run_repeats.py --app slam_rgbd --repeats 5 \
      --out results/replica_room0_x5 -- \
      --dataset replica --path <seq> --tracker native --iters-budget 8000

Everything after `--` is forwarded to the app verbatim (minus --out, which
the runner controls).
"""

import argparse
import importlib
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

APPS = {
    "slam_rgbd": "segs_slam_tpu.apps.slam_rgbd",
    "slam_mono": "segs_slam_tpu.apps.slam_mono",
    "slam_stereo": "segs_slam_tpu.apps.slam_stereo",
    "train_colmap": "segs_slam_tpu.apps.train_colmap",
    "train_synthetic": "segs_slam_tpu.apps.train_synthetic",
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--app", choices=sorted(APPS), required=True)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--out", required=True)
    p.add_argument("app_args", nargs=argparse.REMAINDER,
                   help="args after -- forwarded to the app")
    args = p.parse_args()
    fwd = [a for a in args.app_args if a != "--"]

    mod = importlib.import_module(APPS[args.app])
    out_root = Path(args.out)
    out_root.mkdir(parents=True, exist_ok=True)

    for i in range(args.repeats):
        run_dir = out_root / f"run_{i}"
        print(f"=== repeat {i + 1}/{args.repeats} -> {run_dir} ===",
              flush=True)
        t0 = time.time()
        mod.main(fwd + ["--out", str(run_dir)])
        print(f"=== repeat {i + 1} done in {time.time() - t0:.0f}s ===",
              flush=True)

    from segs_slam_tpu.eval.harness import aggregate

    rows = aggregate(out_root, mono=(args.app == "slam_mono"))
    print(f"aggregated {len(rows)} runs -> {out_root}/log.txt")
    for r in rows:
        print({k: (round(v, 4) if isinstance(v, float) else v)
               for k, v in r.items()})


if __name__ == "__main__":
    main()
