#!/usr/bin/env python3
"""COLMAP preprocessing for custom captures (reference convert.py:31-124).

Wraps colmap feature extraction / matching / mapping / undistortion and
optional imagemagick resizing to produce the sparse/ layout the COLMAP
scene reader expects. Requires the external `colmap` (and `magick` for
--resize) executables.
"""

import logging
import os
import shutil
import subprocess
import sys
from argparse import ArgumentParser


def run(cmd: str) -> None:
    code = subprocess.call(cmd, shell=True)
    if code != 0:
        logging.error("command failed with code %d: %s", code, cmd)
        sys.exit(code)


def main(argv=None):
    parser = ArgumentParser("Colmap converter")
    parser.add_argument("--no_gpu", action="store_true")
    parser.add_argument("--skip_matching", action="store_true")
    parser.add_argument("--source_path", "-s", required=True, type=str)
    parser.add_argument("--camera", default="OPENCV", type=str)
    parser.add_argument("--colmap_executable", default="", type=str)
    parser.add_argument("--resize", action="store_true")
    parser.add_argument("--magick_executable", default="", type=str)
    args = parser.parse_args(argv)

    colmap = (f'"{args.colmap_executable}"' if args.colmap_executable
              else "colmap")
    magick = (f'"{args.magick_executable}"' if args.magick_executable
              else "magick")
    use_gpu = 0 if args.no_gpu else 1
    src = args.source_path

    if not args.skip_matching:
        os.makedirs(f"{src}/distorted/sparse", exist_ok=True)
        run(f"{colmap} feature_extractor "
            f"--database_path {src}/distorted/database.db "
            f"--image_path {src}/input "
            f"--ImageReader.single_camera 1 "
            f"--ImageReader.camera_model {args.camera} "
            f"--SiftExtraction.use_gpu {use_gpu}")
        run(f"{colmap} exhaustive_matcher "
            f"--database_path {src}/distorted/database.db "
            f"--SiftMatching.use_gpu {use_gpu}")
        run(f"{colmap} mapper "
            f"--database_path {src}/distorted/database.db "
            f"--image_path {src}/input "
            f"--output_path {src}/distorted/sparse "
            f"--Mapper.ba_global_function_tolerance=0.000001")

    # undistort into the layout the scene reader expects
    run(f"{colmap} image_undistorter "
        f"--image_path {src}/input "
        f"--input_path {src}/distorted/sparse/0 "
        f"--output_path {src} --output_type COLMAP")

    sparse_dir = os.path.join(src, "sparse")
    os.makedirs(os.path.join(sparse_dir, "0"), exist_ok=True)
    for fname in os.listdir(sparse_dir):
        if fname == "0":
            continue
        shutil.move(os.path.join(sparse_dir, fname),
                    os.path.join(sparse_dir, "0", fname))

    if args.resize:
        print("Copying and resizing...")
        for scale, suffix in ((50, "_2"), (25, "_4"), (12.5, "_8")):
            out_dir = f"{src}/images{suffix}"
            os.makedirs(out_dir, exist_ok=True)
            for fname in os.listdir(f"{src}/images"):
                dst = os.path.join(out_dir, fname)
                shutil.copy2(os.path.join(src, "images", fname), dst)
                run(f"{magick} mogrify -resize {scale}% {dst}")

    print("Done.")


if __name__ == "__main__":
    main()
