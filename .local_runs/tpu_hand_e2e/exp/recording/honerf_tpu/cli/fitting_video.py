"""Video pose-fitting CLI (reference fitting_video.py:476-493):

    python -m honerf_tpu.cli.fitting_video --conf ./fit_confs/fit_123_8views_0.conf --case 123_8view_id0
    python -m honerf_tpu.cli.fitting_video --conf ./fit_confs/fit_1234_8views_0.conf --case 1234_8view_id0
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
    parser.add_argument("--mode", type=str, default="fitting")  # parity no-op
    parser.add_argument("--gpu", type=int, default=0)  # parity no-op
    parser.add_argument("--case", type=str, default="")
    args = parser.parse_args()

    from honerf_tpu.fit.runner import VideoFitRunner

    VideoFitRunner(args.conf, args.case).fitting()


if __name__ == "__main__":
    main()
