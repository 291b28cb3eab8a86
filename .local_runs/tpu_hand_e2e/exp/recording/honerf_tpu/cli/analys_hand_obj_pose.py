"""Pose-error analysis CLI (reference analys_results/analys_hand_obj_pose.py):
walks ./fit_res/view_N/<fit_type> pose pickles and prints per-object MPJPE,
object vertex error, and ADD/ADD-S success tables (vs the initialization
baseline when available).

    python -m honerf_tpu.cli.analys_hand_obj_pose --fit_type 12 --view_num 8
"""

import argparse
import os
import pickle

import numpy as np

from honerf_tpu.eval.pose import evaluate_pose_set
from honerf_tpu.utils.ply import load_ply


def collect_records(type_path: str, test_obj: str, model_base: str, init_path: str,
                    view_num: str):
    for obj_name in sorted(os.listdir(type_path)):
        if test_obj not in obj_name:
            continue
        per, obj = obj_name.split("_")
        model_file = os.path.join(model_base, obj + "_cppose", obj + "_ours.ply")
        verts, _ = load_ply(model_file)
        verts = np.asarray(verts) / 1000.0
        obj_path = os.path.join(type_path, obj_name)
        for frame_name in sorted(os.listdir(obj_path)):
            pose_path = None
            frame_path = os.path.join(obj_path, frame_name)
            for cand in sorted(os.listdir(frame_path)):
                if cand.startswith("pose_"):
                    pose_path = os.path.join(frame_path, cand)
            if pose_path is None:
                continue
            for fname in sorted(os.listdir(pose_path)):
                with open(os.path.join(pose_path, fname), "rb") as f:
                    param = pickle.load(f)
                rec = {
                    "pred_joint3d": np.asarray(param["pred_joint3d"]),
                    "gt_joint3d": np.asarray(param["gt_joint3d"]),
                    "pred_Ro": np.asarray(param["pred_Ro"]),
                    "pred_To": np.asarray(param["pred_To"]),
                    "gt_Ro": np.asarray(param["gt_Ro"]),
                    "gt_To": np.asarray(param["gt_To"]),
                }
                cid = fname.split(".")[0]
                init_j = os.path.join(
                    init_path, obj_name, frame_name,
                    f"pred_joint3d_{view_num}view", cid + ".pickle",
                )
                init_p = os.path.join(
                    init_path, obj_name, frame_name,
                    f"pred_objpose_{view_num}view", cid + ".txt",
                )
                if os.path.exists(init_j) and os.path.exists(init_p):
                    with open(init_j, "rb") as f:
                        jd = pickle.load(f)
                    pose = np.loadtxt(init_p)
                    rec["init_joint3d"] = np.asarray(jd["pred_joint_3d"])
                    rec["init_Ro"] = pose[:3, :3]
                    rec["init_To"] = pose[:3, 3]
                yield verts, rec


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--base_path", default="./fit_res")
    parser.add_argument("--fit_type", default="12")
    parser.add_argument("--view_num", default="8")
    parser.add_argument("--model_base_path", default="./data/offline_stage_data")
    parser.add_argument("--init_path", default="./data/catch_sequence/test")
    parser.add_argument(
        "--objects", nargs="*", default=["bean", "box", "cup", "meat"]
    )
    args = parser.parse_args()
    type_path = os.path.join(args.base_path, f"view_{args.view_num}", args.fit_type)
    for test_obj in args.objects:
        recs = []
        verts = None
        for v, rec in collect_records(
            type_path, test_obj, args.model_base_path, args.init_path, args.view_num
        ):
            verts = v
            recs.append(rec)
        if not recs:
            print(f"{test_obj}: no frames")
            continue
        out = evaluate_pose_set(recs, verts)
        print(f"object {test_obj}: {out['n_frames']} frames")
        line = (
            f"  ours joint: {out['joint_err_mm']:.2f}mm  "
            f"obj: {out['obj_err_mm']:.2f}mm  "
            f"ADD: {out['add_success_pct']:.2f}%  ADD-S: {out['adds_success_pct']:.2f}%"
        )
        if "init_joint_err_mm" in out:
            line += (
                f"\n  init joint: {out['init_joint_err_mm']:.2f}mm  "
                f"obj: {out['init_obj_err_mm']:.2f}mm  "
                f"ADD: {out['init_add_success_pct']:.2f}%  "
                f"ADD-S: {out['init_adds_success_pct']:.2f}%"
            )
        print(line)


if __name__ == "__main__":
    main()
