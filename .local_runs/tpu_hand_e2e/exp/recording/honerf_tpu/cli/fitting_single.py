"""Single-frame pose-fitting CLI (reference fitting_single.py:318-334):

    python -m honerf_tpu.cli.fitting_single --conf ./fit_confs/fit_1_8views.conf --case 1_8view
    python -m honerf_tpu.cli.fitting_single --conf ./fit_confs/fit_12_8views.conf --case 12_8view
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
    parser.add_argument("--gpu", type=int, default=0)  # parity no-op
    parser.add_argument("--case", type=str, default="")
    args = parser.parse_args()

    from honerf_tpu.fit.runner import SingleFitRunner

    SingleFitRunner(args.conf, args.case).fitting()


if __name__ == "__main__":
    main()
