"""Demo CLI: single RGB-D pair -> rendered two-hand mesh overlays.

Equivalent of the reference demo (demo.py:55-443): reads color/depth PNG
pairs, crops to the model resolution with intrinsics folded in, runs the
self-contained RGB-D inference (centers + masks + clouds from the network's
own predictions), and writes mask / skeleton / mesh-overlay images.

Usage:
  python -m pdfnet_tpu.cli.demo --input /root/reference/assets/H2O \
      [--ckpt outputs/ckpt/model_X] [--out outputs/demo] [--limit 3]
"""

from __future__ import annotations

import argparse
import glob
import os

import cv2
import numpy as np

# H2O egocentric intrinsics (demo.py:133).  NOTE: the reference then swaps
# cx<->cy (demo.py:135-137) — an intentional quirk for this camera where the
# frames are handled in a transposed convention; we reproduce it so outputs
# line up with the reference demo on the same assets.
H2O_INTRINSICS = dict(fx=636.6593017578125, fy=636.251953125,
                      cx=635.283881879317, cy=366.8740353496978)


def load_rgbd(img_path: str):
    image = cv2.imread(img_path)
    depth_path = img_path.replace("color", "depth")
    depth = cv2.imread(depth_path, cv2.IMREAD_ANYDEPTH) / 1000.0
    return image, depth


def demo_intrinsics(swap_quirk: bool = True) -> np.ndarray:
    i = H2O_INTRINSICS
    K = np.array([[i["fx"], 0, i["cx"]], [0, i["fy"], i["cy"]], [0, 0, 1]],
                 np.float32)
    if swap_quirk:
        K[0, 2], K[1, 2] = K[1, 2].copy(), K[0, 2].copy()
    return K


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/root/reference/assets/H2O")
    ap.add_argument("--ckpt", default="")
    ap.add_argument("--out", default="outputs/demo")
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--res", type=int, default=384)
    ap.add_argument("--sample_num", type=int, default=1024)
    ap.add_argument("--sample_num_level1", type=int, default=512)
    ap.add_argument("--sample_num_level2", type=int, default=128)
    ap.add_argument("--knn_k", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax

    from pdfnet_tpu.utils.cache import setup_cli_cache
    setup_cli_cache(args.cpu)
    import jax.numpy as jnp

    from pdfnet_tpu import assets
    from pdfnet_tpu.config import Config
    from pdfnet_tpu.data import augment as aug
    from pdfnet_tpu.models import build_model
    from pdfnet_tpu.models.handnet import infer_rgbd
    from pdfnet_tpu.render import render_two_hands
    from pdfnet_tpu.train.loss import load_loss_consts
    from pdfnet_tpu.train.loss import eval_outputs
    from pdfnet_tpu.utils.vis import draw_hand_skeleton

    cfg = Config(default_resolution=args.res, batch_size=1, mode="test",
                 sample_num=args.sample_num,
                 sample_num_level1=args.sample_num_level1,
                 sample_num_level2=args.sample_num_level2, knn_k=args.knn_k)
    model = build_model(cfg)
    consts = load_loss_consts()

    img_list = sorted(glob.glob(os.path.join(args.input, "color", "*.png")))
    if args.limit:
        img_list = img_list[:args.limit]
    if not img_list:
        raise SystemExit(f"no color/*.png under {args.input}")

    # Params: checkpoint if given, else random init (pipeline shakedown).
    rng = jax.random.PRNGKey(0)
    first_img = np.zeros((1, args.res, args.res, 3), np.float32)
    zero_choose = np.zeros((1, 2, cfg.sample_num), np.int32)
    zero_cloud = np.zeros((1, 2, cfg.sample_num, 3), np.float32)
    zero_depth = np.zeros((1, args.res, args.res), np.float32)
    K0 = np.eye(3, dtype=np.float32)[None]
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        first_img, zero_choose, zero_cloud, zero_depth,
        np.zeros((1, 2), np.int32), K0, np.ones((1, 2), np.float32),
        train=False)
    if args.ckpt:
        from pdfnet_tpu.train.checkpoint import load_variables
        variables = load_variables(args.ckpt, variables)
        print(f"loaded checkpoint {args.ckpt}")

    mean = np.asarray(cfg.mean, np.float32)
    std = np.asarray(cfg.std, np.float32)
    faces_l = assets.load_mano("left").faces
    faces_r = assets.load_mano("right").faces
    os.makedirs(args.out, exist_ok=True)

    for i, img_file in enumerate(img_list):
        image, depth = load_rgbd(img_file)
        K = demo_intrinsics()
        H, W = image.shape[:2]
        c = np.array([W / 2.0, H / 2.0], np.float32)
        s = max(H, W) * 1.0
        trans, _ = aug.get_affine_transform(c, s, 0, (args.res, args.res))
        K_img = aug.update_intrinsics(K, trans)
        image_c = cv2.warpAffine(image, trans, (args.res, args.res),
                                 flags=cv2.INTER_LINEAR)
        depth_c = cv2.warpAffine(depth, trans, (args.res, args.res),
                                 flags=cv2.INTER_NEAREST)

        inp = ((image_c.astype(np.float32) / 255.0 - mean) / std)[None]
        result, params, hand_dicts, other = infer_rgbd(
            model, variables, jnp.asarray(inp),
            jnp.asarray(depth_c[None]), jnp.asarray(K_img[None]),
            jnp.ones((1, 2), np.float32), jax.random.PRNGKey(i),
            num_points=cfg.sample_num)
        out = eval_outputs(cfg, consts, result, params, hand_dicts, other,
                           {"K_new": jnp.asarray(K_img[None])})
        out = jax.tree.map(np.asarray, out)

        file_id = os.path.basename(img_file)[:-4]
        # outputs grouped by the input's parent folder (reference layout:
        # outputs/color/...)
        out_dir = os.path.join(args.out,
                               os.path.basename(os.path.dirname(img_file)))
        os.makedirs(out_dir, exist_ok=True)
        # mask
        mask = np.asarray(other["mask"][0])
        cv2.imwrite(os.path.join(out_dir, f"mask_lr_{file_id}.jpg"),
                    np.clip((mask[..., 0] + mask[..., 1]) * 255, 0,
                            255).astype(np.uint8))
        # skeleton
        bones = draw_hand_skeleton(image_c.copy(), out["lms21_pred"][0, 0])
        draw_hand_skeleton(bones, out["lms21_pred"][0, 1],
                           os.path.join(out_dir, f"bones_lr_{file_id}.jpg"))
        # mesh overlay
        rgb, rmask, _ = render_two_hands(
            jnp.asarray(out["verts_pred"][0, 0]),
            jnp.asarray(out["verts_pred"][0, 1]),
            jnp.asarray(K_img), faces_l, faces_r, args.res, args.res)
        rgb = np.asarray(rgb) * 255
        rmask = np.asarray(rmask)[..., None]
        overlay = (rgb[..., ::-1] * rmask +
                   image_c.astype(np.float32) * (1 - rmask)).astype(np.uint8)
        cv2.imwrite(os.path.join(out_dir, f"render_{file_id}.jpg"), overlay)
        print(f"[{i + 1}/{len(img_list)}] {file_id}: wrote mask/bones/render")


if __name__ == "__main__":
    main()
