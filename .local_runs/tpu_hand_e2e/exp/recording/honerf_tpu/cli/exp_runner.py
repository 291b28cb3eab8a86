"""Offline-stage CLI: train / test / mesh modes.

Drop-in equivalent of the reference `exp_runner.py` command line
(exp_runner.py:539-559):

    python -m honerf_tpu.cli.exp_runner --mode train \
        --conf ./confs/wmask_realobj_bean.conf --case bean
    python -m honerf_tpu.cli.exp_runner --mode test --conf ... --is_continue
    python -m honerf_tpu.cli.exp_runner --mode mesh --conf ... --is_continue

(--gpu is accepted for CLI parity and ignored: device selection is JAX's.)
"""

import argparse
import logging


def main() -> None:
    logging.basicConfig(
        level=logging.INFO,
        format="[%(filename)s:%(lineno)s - %(funcName)s() ] %(message)s",
    )
    parser = argparse.ArgumentParser()
    parser.add_argument("--conf", type=str, default="./confs/base.conf")
    parser.add_argument("--mode", type=str, default="train")
    parser.add_argument("--mcube_threshold", type=float, default=0.0)
    parser.add_argument("--is_continue", default=False, action="store_true")
    parser.add_argument("--gpu", type=int, default=0)  # parity no-op
    parser.add_argument("--case", type=str, default="")
    args = parser.parse_args()

    if args.mode not in ("train", "test", "mesh"):
        raise SystemExit(f"unknown mode {args.mode!r} (train|test|mesh)")
    import os

    if not os.path.exists(args.conf):
        raise SystemExit(f"config file not found: {args.conf}")

    from honerf_tpu.train.runner import OfflineRunner

    runner = OfflineRunner(args.conf, args.mode, args.case, args.is_continue)
    if args.mode == "train":
        runner.train()
    elif args.mode == "mesh":
        runner.validate_mesh(resolution=256, threshold=args.mcube_threshold)
    elif args.mode == "test":
        runner.test()
    else:
        raise SystemExit(f"unknown mode {args.mode!r}")


if __name__ == "__main__":
    main()
