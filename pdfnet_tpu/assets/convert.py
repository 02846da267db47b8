"""CLI: convert reference pickled assets into .npz caches.

Usage: python -m pdfnet_tpu.assets.convert --src /root/reference
"""

import argparse

from pdfnet_tpu.assets import ASSET_DIR, build_assets


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True, help="reference repo root")
    p.add_argument("--dst", default=ASSET_DIR)
    args = p.parse_args()
    build_assets(args.src, args.dst)
    print(f"assets written to {args.dst}")


if __name__ == "__main__":
    main()
