"""Temporal acceleration-error analysis CLI (reference
analys_results/analys_acc_err.py): joint & object-vertex acceleration
errors across fit 12 / 123 / 1234 pose sequences.

    python -m honerf_tpu.cli.analys_acc_err
"""

import argparse
import os
import pickle

import numpy as np

from honerf_tpu.eval.temporal import acceleration_error
from honerf_tpu.utils.ply import load_ply


def load_pose_series(pose_path: str, obj_v: np.ndarray, max_frames: int = 2000):
    joints, verts, joints_gt, verts_gt = [], [], [], []
    for cid in range(max_frames):
        f = os.path.join(pose_path, f"{cid}.pickle")
        if not os.path.exists(f):
            continue
        with open(f, "rb") as fh:
            p = pickle.load(fh)
        joints.append(p["pred_joint3d"])
        verts.append(obj_v @ p["pred_Ro"].T + p["pred_To"])
        joints_gt.append(p["gt_joint3d"])
        verts_gt.append(obj_v @ p["gt_Ro"].T + p["gt_To"])
    return tuple(np.asarray(x) for x in (joints, verts, joints_gt, verts_gt))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--base_path", default="./fit_res/view_8")
    parser.add_argument("--model_base_path", default="./data/offline_stage_data")
    parser.add_argument(
        "--stages", nargs="*",
        default=["12:pose_12", "123:pose_4", "1234:pose_4"],
        help="fit_type:pose_dir pairs",
    )
    args = parser.parse_args()
    stage_pairs = [s.split(":") for s in args.stages]
    acc = {s[0]: {"j": [], "v": []} for s in stage_pairs}
    anchor = stage_pairs[-1][0]
    sub_path = os.path.join(args.base_path, anchor)
    if not os.path.isdir(sub_path):
        print(f"no results at {sub_path}")
        return
    n_all = 0
    for obj_name in sorted(os.listdir(sub_path)):
        per, obj = obj_name.split("_")
        model_file = os.path.join(
            args.model_base_path, obj + "_cppose", obj + "_ours.ply"
        )
        obj_v, _ = load_ply(model_file)
        obj_v = np.asarray(obj_v) / 1000.0
        for frame_name in sorted(os.listdir(os.path.join(sub_path, obj_name))):
            for fit_type, pose_dir in stage_pairs:
                pose_path = os.path.join(
                    args.base_path, fit_type, obj_name, frame_name, pose_dir
                )
                if not os.path.isdir(pose_path):
                    continue
                j, v, jg, vg = load_pose_series(pose_path, obj_v)
                if len(j) < 3:
                    continue
                acc[fit_type]["j"].append(acceleration_error(jg, j))
                acc[fit_type]["v"].append(acceleration_error(vg, v))
                if fit_type == anchor:
                    n_all += len(j)
    print(f"{n_all} frames")
    for fit_type, _pd in stage_pairs:
        if not acc[fit_type]["j"]:
            print(f"  fit {fit_type}: no data")
            continue
        aj = np.concatenate(acc[fit_type]["j"]).mean() * 1000.0
        av = np.concatenate(acc[fit_type]["v"]).mean() * 1000.0
        print(f"  fit {fit_type}: acc_joint {aj:.2f}  acc_verts {av:.2f} (mm/frame^2)")


if __name__ == "__main__":
    main()
