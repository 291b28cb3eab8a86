"""Render-quality analysis CLI (reference
analys_results/analys_psnr_ssim_lpips.py): PSNR / SSIM / LPIPS on held-out
view renders vs ground-truth images.

    python -m honerf_tpu.cli.analys_psnr_ssim_lpips --fit_type 12 --view_num 3
"""

import argparse
import os

import numpy as np


def _read_rgb(path: str) -> np.ndarray:
    try:
        import cv2

        img = cv2.imread(path)
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    except ImportError:
        from PIL import Image

        return np.asarray(Image.open(path).convert("RGB"))


def main() -> None:
    from honerf_tpu.eval.image_quality import image_metrics
    from honerf_tpu.models.vgg import load_torchvision_vgg16
    from honerf_tpu.eval.image_quality import load_lpips_weights

    parser = argparse.ArgumentParser()
    parser.add_argument("--gt_path", default="./data/catch_sequence/final_render_img")
    parser.add_argument("--ours_path", default="./fit_res/analys_res/view_3")
    parser.add_argument("--fit_type", default="12")
    parser.add_argument(
        "--train_views", nargs="*", default=["21320027", "21320030", "21320035"]
    )
    parser.add_argument("--lpips_weights", default=None)
    args = parser.parse_args()

    # LPIPS backbone is VGG16 (lpips.LPIPS(net='vgg'),
    # analys_psnr_ssim_lpips.py:44) — NOT the VGG19 the training-time
    # VGGLoss uses
    vgg_params = load_torchvision_vgg16()
    lpips_heads = load_lpips_weights(args.lpips_weights)
    if vgg_params is None:
        print("note: no pretrained VGG16 weights found — LPIPS skipped")

    psnrs, ssims, lpips_vals = [], [], []
    for obj_name in sorted(os.listdir(args.gt_path)):
        obj_path = os.path.join(args.gt_path, obj_name)
        for frame_name in sorted(os.listdir(obj_path)):
            mask_path = os.path.join(obj_path, frame_name, "MASK")
            if not os.path.isdir(mask_path):
                continue
            for fname in sorted(os.listdir(mask_path)):
                view = fname.split(".")[0].split("_")[1]
                if view in args.train_views:
                    continue
                ours = os.path.join(
                    args.ours_path, args.fit_type, obj_name, frame_name,
                    f"render_{args.fit_type}", fname,
                )
                if not os.path.exists(ours):
                    continue
                gt = _read_rgb(os.path.join(mask_path, fname))
                img = _read_rgb(ours)
                m = image_metrics(img, gt, vgg_params, lpips_heads)
                psnrs.append(m["psnr"])
                ssims.append(m["ssim"])
                for k in ("lpips", "lpips_unit_weights"):
                    if k in m:
                        lpips_vals.append(m[k])
    if not psnrs:
        print("no render/gt pairs found")
        return
    print(f"{len(psnrs)} images")
    print("      psnr,     ssim,     lpips")
    lp = np.mean(lpips_vals) if lpips_vals else float("nan")
    print(f"ours: {np.mean(psnrs):.4f}  {np.mean(ssims):.4f}  {lp:.4f}")


if __name__ == "__main__":
    main()
