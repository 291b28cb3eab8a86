"""Penetration-consistency analysis CLI (reference
analys_results/analys_pci.py): IoU of consecutive-frame penetration point
sets across fit 12 / 123 / 1234.

    python -m honerf_tpu.cli.analys_pci
"""

import argparse
import os
import pickle

from honerf_tpu.eval.temporal import penetration_iou


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--base_path", default="./fit_res/analys_res/view_8")
    parser.add_argument("--stages", nargs="*", default=["12", "123", "1234"])
    args = parser.parse_args()
    sums = {s: 0.0 for s in args.stages}
    cid = 0
    anchor = args.stages[-1]
    sub_path = os.path.join(args.base_path, anchor)
    if not os.path.isdir(sub_path):
        print(f"no results at {sub_path}")
        return
    for obj_name in sorted(os.listdir(sub_path)):
        for frame_name in sorted(os.listdir(os.path.join(sub_path, obj_name))):
            roots = {
                s: os.path.join(
                    args.base_path, s, obj_name, frame_name, f"inner_{s}"
                )
                for s in args.stages
            }
            started = False
            for fid in range(2000):
                probe = os.path.join(roots[anchor], f"{fid}.pickle")
                if not os.path.exists(probe):
                    continue
                if not started:
                    started = True
                    continue
                ok = True
                vals = {}
                for s in args.stages:
                    prev_f = os.path.join(roots[s], f"{fid - 1}.pickle")
                    next_f = os.path.join(roots[s], f"{fid}.pickle")
                    if not (os.path.exists(prev_f) and os.path.exists(next_f)):
                        ok = False
                        break
                    with open(prev_f, "rb") as f:
                        prev_ids = pickle.load(f)["inner_point_id"]
                    with open(next_f, "rb") as f:
                        next_ids = pickle.load(f)["inner_point_id"]
                    vals[s] = penetration_iou(prev_ids, next_ids)
                if not ok:
                    continue
                for s in args.stages:
                    sums[s] += vals[s]
                cid += 1
    if cid == 0:
        print("no frame pairs")
        return
    line = "  ".join(
        f"inner_{s} pci: {sums[s] / cid * 100:.2f}" for s in args.stages
    )
    print(line)
    print(cid)


if __name__ == "__main__":
    main()
