"""Interaction analysis CLI (reference analys_results/analys_interaction.py):
intersection volume + penetration depth for fit-1 vs fit-12 meshes, with
per-frame caching pickles like the reference.

    python -m honerf_tpu.cli.analys_interaction
"""

import argparse
import os
import pickle

from honerf_tpu.eval.interaction import interaction_metrics
from honerf_tpu.utils.ply import load_ply


def get_int_vol(mesh_hand: str, mesh_obj: str, cache_file: str):
    if os.path.exists(cache_file):
        with open(cache_file, "rb") as f:
            p = pickle.load(f)
        return p["int_vol"], p["pen_dep"]
    hv, hf = load_ply(mesh_hand)
    ov, of = load_ply(mesh_obj)
    vol, dep = interaction_metrics(hv, hf, ov, of)
    with open(cache_file, "wb") as f:
        pickle.dump({"int_vol": vol, "pen_dep": dep}, f)
    return vol, dep


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--base_path", default="./fit_res/analys_res/view_8")
    parser.add_argument(
        "--objects", nargs="*", default=["bean", "box", "cup", "meat"]
    )
    args = parser.parse_args()
    for cur_class in args.objects:
        sums = {"1": [0.0, 0.0], "12": [0.0, 0.0]}
        cid = 0
        sub_path = os.path.join(args.base_path, "1")
        if not os.path.isdir(sub_path):
            print(f"{cur_class}: no fit-1 results at {sub_path}")
            continue
        for obj_name in sorted(os.listdir(sub_path)):
            if cur_class not in obj_name:
                continue
            obj_path = os.path.join(sub_path, obj_name)
            for frame_name in sorted(os.listdir(obj_path)):
                frame_path = os.path.join(obj_path, frame_name)
                mesh1 = os.path.join(frame_path, "mesh_1")
                if not os.path.isdir(mesh1):
                    continue
                int_path = os.path.join(frame_path, "int")
                os.makedirs(int_path, exist_ok=True)
                for fname in sorted(os.listdir(mesh1)):
                    if not fname.endswith("_hand.ply"):
                        continue
                    fid = fname.split("_")[0]
                    first_hand = os.path.join(mesh1, f"{fid}_hand.ply")
                    first_obj = os.path.join(mesh1, f"{fid}_obj.ply")
                    second_base = os.path.join(
                        args.base_path, "12", obj_name, frame_name
                    )
                    second_hand = os.path.join(second_base, "mesh_12", f"{fid}_hand.ply")
                    second_obj = os.path.join(second_base, "mesh_12", f"{fid}_obj.ply")
                    if not os.path.exists(second_hand):
                        continue
                    second_int = os.path.join(second_base, "int")
                    os.makedirs(second_int, exist_ok=True)
                    v1, d1 = get_int_vol(
                        first_hand, first_obj, os.path.join(int_path, f"{fid}.pickle")
                    )
                    v2, d2 = get_int_vol(
                        second_hand, second_obj,
                        os.path.join(second_int, f"{fid}.pickle"),
                    )
                    sums["1"][0] += v1
                    sums["1"][1] += d1
                    sums["12"][0] += v2
                    sums["12"][1] += d2
                    cid += 1
        if cid == 0:
            print(f"{cur_class}: no frames")
            continue
        print(
            f"object class {cur_class}: {cid} frames\n"
            f"  fit1  int_vol: {sums['1'][0]/cid:.2f}cm3  pen_dep: {sums['1'][1]/cid:.2f}mm\n"
            f"  fit12 int_vol: {sums['12'][0]/cid:.2f}cm3  pen_dep: {sums['12'][1]/cid:.2f}mm"
        )


if __name__ == "__main__":
    main()
