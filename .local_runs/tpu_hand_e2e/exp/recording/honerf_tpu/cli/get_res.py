"""Result-extraction CLI (reference get_res.py:289-310):

    python -m honerf_tpu.cli.get_res --conf ./fit_confs/get_res_12.conf --case get_res_12
    python -m honerf_tpu.cli.get_res --conf ./fit_confs/get_render_type12.conf --case render_res --render True
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
    parser.add_argument("--render", type=bool, default=False)
    args = parser.parse_args()

    from honerf_tpu.fit.runner import GetResRunner

    GetResRunner(args.conf, args.case, args.render).fitting()


if __name__ == "__main__":
    main()
