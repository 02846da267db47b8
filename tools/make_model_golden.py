"""Record a full reference-model forward for end-to-end parity testing.

Instantiates the reference HandNET_GCN (torch-cpu, with torchvision/chumpy
shims), runs one eval forward on fixed random inputs, and saves the
state_dict + inputs + outputs to .parity_fixtures/.  The parity test
(tests/test_full_parity.py) converts the state_dict with
pdfnet_tpu.utils.convert_torch and compares our forward against the
recording.  Artifacts are large and machine-local — not committed.

Usage: python tools/make_model_golden.py [--ref /root/reference]
"""

import argparse
import os
import sys
import types

import numpy as np

# repo-local by default so the fixtures survive VM swaps; not committed
OUT_DIR = os.environ.get(
    "PDFNET_PARITY_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".parity_fixtures"))


def install_shims(ref_root):
    # numpy >= 1.24 removed the deprecated builtin aliases the reference
    # still uses (np.int at simplified.py:527 runs on every train loss call);
    # they were exact aliases, so restoring them changes no behavior
    for alias, builtin in (("int", int), ("float", float), ("bool", bool),
                           ("object", object)):
        if not hasattr(np, alias):
            setattr(np, alias, builtin)
    sys.path.insert(0, ref_root)
    # the reference's _init_paths.py prepends lib/ so `models.*`/`utils.*`
    # absolute imports resolve (base_trainer.py:10)
    sys.path.insert(0, os.path.join(ref_root, "lib"))
    import lib.models.networks.resnet as vres
    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")
    for n in ["resnet18", "resnet34", "resnet50", "resnet101", "resnet152"]:
        setattr(tvm, n, getattr(vres, n))
    tv.models = tvm
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tvm
    # transforms.Resize: imported by simplified.py:30 but unused on the live
    # H2O branch
    tvt = types.ModuleType("torchvision.transforms")
    tvt.Resize = type("Resize", (), {"__init__": lambda self, *a, **k: None})
    tv.transforms = tvt
    sys.modules["torchvision.transforms"] = tvt
    # pytorch3d: imported at simplified.py module level; only touched by the
    # photometric/vis paths, which the recorder never takes
    p3d = types.ModuleType("pytorch3d")
    p3ds = types.ModuleType("pytorch3d.structures")
    p3ds.Meshes = type("Meshes", (), {})
    p3dr = types.ModuleType("pytorch3d.renderer")
    p3drm = types.ModuleType("pytorch3d.renderer.mesh")
    p3drmt = types.ModuleType("pytorch3d.renderer.mesh.textures")
    p3drmt.Textures = type("Textures", (), {})
    for name, mod in (("pytorch3d", p3d), ("pytorch3d.structures", p3ds),
                      ("pytorch3d.renderer", p3dr),
                      ("pytorch3d.renderer.mesh", p3drm),
                      ("pytorch3d.renderer.mesh.textures", p3drmt)):
        sys.modules[name] = mod
    # progress.bar.Bar: base_trainer's console progress bar
    prog = types.ModuleType("progress")
    progb = types.ModuleType("progress.bar")
    progb.Bar = type("Bar", (), {"__init__": lambda self, *a, **k: None,
                                 "next": lambda self: None,
                                 "finish": lambda self: None})
    prog.bar = progb
    sys.modules["progress"] = prog
    sys.modules["progress.bar"] = progb
    # tensorboardX (lib/logger.py import chain)
    tbx = types.ModuleType("tensorboardX")
    tbx.SummaryWriter = type("SummaryWriter", (),
                             {"__init__": lambda self, *a, **k: None})
    sys.modules["tensorboardX"] = tbx
    # skimage.io (lib/utils/fh_utils.py:6, FreiHAND eval kit import chain)
    ski = types.ModuleType("skimage")
    skio = types.ModuleType("skimage.io")
    skio.imread = lambda *a, **k: None
    skio.imsave = lambda *a, **k: None
    ski.io = skio
    sys.modules["skimage"] = ski
    sys.modules["skimage.io"] = skio


def _install_chumpy_stub():
    """Chumpy-free loading of the reference MANO pickles (same stub as
    tools/make_goldens.py)."""

    class _Ch:
        # __module__ makes str(type(x)) contain 'chumpy', which
        # Mano_model.to_np keys its densification on (:541-548)
        __module__ = "chumpy.ch"

        @property
        def r(self):
            d = vars(self)
            if "x" in d:
                return np.asarray(d["x"])
            if "a" in d and "idxs" in d:
                src = (_Ch.r.fget(d["a"])
                       if not isinstance(d["a"], np.ndarray) else d["a"])
                out = np.asarray(src).ravel()[np.asarray(d["idxs"])]
                shape = d.get("preferred_shape")
                return out.reshape(shape) if shape else out.reshape(778, 3, -1)
            raise AttributeError("cannot densify stub chumpy object")

        def __array__(self, dtype=None):
            r = self.r
            return r.astype(dtype) if dtype is not None else r

    for modname in ("chumpy", "chumpy.ch", "chumpy.reordering"):
        sys.modules[modname] = types.ModuleType(modname)
    sys.modules["chumpy"].Ch = _Ch
    sys.modules["chumpy.ch"].Ch = _Ch
    sys.modules["chumpy.reordering"].Select = type(
        "Select", (_Ch,), {"__module__": "chumpy.reordering"})


def _train_opt(B):
    """Full flag surface the live CtdetLoss branch + ManoRender consume."""
    from types import SimpleNamespace
    return SimpleNamespace(
        heads={"hm": 2, "wh": 2, "params": 122}, depth=True, iterations=False,
        PCA_SZ=63, knn_K=64, ball_radius=0.015, ball_radius2=0.04,
        sample_num_level1=512, sample_num_level2=128, INPUT_FEATURE_NUM=3,
        SAMPLE_NUM=1024, default_resolution=384,
        DECONV_DIMS=[256, 256, 256, 256], GCN_IN_DIM=[512, 256, 128],
        GCN_OUT_DIM=[256, 128, 64], IMG_DIMS=[256, 128, 64], graph_k=2,
        graph_layer_num=4,
        # loss flags (scripts/train.sh live recipe)
        task="interact", dataset="H2O", mode="train", batch_size=B,
        reproj_loss=True, bone_loss=True, photometric_loss=False,
        perceptual_loss=False, off=False, center_only=False, heatmaps=False,
        gcn_decoder=False, discrepancy=False, avg_center=True,
        brightness=True, center_weight=200.0, reproj_weight=1.0,
        bone_dir_weight=200.0, wh_weight=20.0, off_weight=100.0,
        input_res=384, size_train=[384, 384], down_ratio=4,
        using_pca=False, num_pca_comps=45, num_stacks=1)


def _torch_batch_from_synthetic(B, res=384, n=1024, seed=0):
    """Build the train batch with pdfnet_tpu's synthetic generator (both
    frameworks consume the identical numpy arrays; torch wants NCHW)."""
    import torch
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from pdfnet_tpu.config import Config
    from pdfnet_tpu.data.synthetic import make_batch

    cfg = Config(default_resolution=res, sample_num=n, batch_size=B)
    np_batch = make_batch(cfg, B, seed=seed)
    np_batch["file_id"] = np.full((B,), 1, np.int64)  # skip the %100 vis dump

    tb = {}
    for k, v in np_batch.items():
        a = np.asarray(v)
        if k in ("input", "hm", "hms", "mask"):          # HWC -> CHW
            a = a.transpose(0, 3, 1, 2)
        if a.dtype == np.float64:
            a = a.astype(np.float32)
        tb[k] = torch.from_numpy(np.ascontiguousarray(a))
    return np_batch, tb


def record_train_trajectory(ref_root, steps, lr=1e-4, B=2, seed=0,
                            freeze_bn=False):
    """Run N reference optimizer steps (torch-cpu, dropout off, fixed batch)
    and record the loss trajectory + parameter probes.

    Mirrors main.py:63 (Adam) + base_trainer.py:90 (loss params added),
    :125-150 (run_epoch: forward, .mean(), backward, step); epoch=30 so the
    alpha-gated edge/joints2d terms are active (simplified.py:608-650).
    """
    import torch
    from types import SimpleNamespace  # noqa: F401  (opt namespace)

    torch.manual_seed(0)
    opt = _train_opt(B)
    from lib.models.networks.intaghand_model import load_model_intag
    model = load_model_intag(opt)
    for m in model.modules():                 # determinism: dropout off
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    model.train()
    if freeze_bn:
        # Frozen-BN recording: batch statistics at random init amplify f32
        # noise chaotically (measured: 1e-6 input noise -> ~6e-3 output
        # spread in this very model), putting cross-framework train parity
        # below the noise floor.  Running-average normalization keeps the
        # whole fwd+loss+bwd+Adam chain deterministic; the replay side sets
        # Config.freeze_bn_stats.
        for m in model.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.eval()

    from lib.models.hand3d.Mano_render import ManoRender
    from lib.trains.simplified import CtdetLoss
    render = ManoRender(opt)
    loss_mod = CtdetLoss(opt, render)

    sd0 = {k: v.detach().cpu().numpy().copy()
           for k, v in model.state_dict().items()}
    np_batch, tb = _torch_batch_from_synthetic(B, seed=seed)

    params = list(model.parameters()) + list(loss_mod.parameters())
    optim = torch.optim.Adam(params, lr)

    epoch = 30
    losses, stats_hist = [], []
    for _ in range(steps):
        result, paramsDict, handDictList, otherInfo = model(
            tb["input"], tb["choose"], tb["cloud"], tb["depth"], tb["ind"],
            tb["K_new"], tb["valid"])
        loss, loss_stats, _, _ = loss_mod(result, paramsDict, handDictList,
                                          otherInfo, tb, "train", epoch)
        loss = loss.mean()
        optim.zero_grad()
        loss.backward()
        optim.step()
        losses.append(float(loss.detach()))
        stats_hist.append({k: float(torch.as_tensor(v).float().mean())
                           for k, v in loss_stats.items()})
        print(f"torch step {len(losses)}: loss={losses[-1]:.6f}")

    out = dict(losses=np.asarray(losses, np.float64), lr=lr, epoch=epoch,
               steps=steps, seed=seed, B=B, freeze_bn=freeze_bn)
    for i, st in enumerate(stats_hist):
        for k, v in st.items():
            out[f"stat_{i}_{k}"] = v
    np.savez(os.path.join(OUT_DIR, "train_traj.npz"), **out)
    np.savez(os.path.join(OUT_DIR, "train_batch.npz"), **np_batch)
    np.savez(os.path.join(OUT_DIR, "train_state_dict.npz"), **sd0)
    sdf = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    np.savez(os.path.join(OUT_DIR, "train_state_dict_final.npz"), **sdf)
    print(f"wrote train trajectory ({steps} steps) to {OUT_DIR}")


def record_schedule_trajectory(ref_root, epochs=(18, 19, 20, 21, 22),
                               steps_per_epoch=5, lr=1e-4, lr_step=(19,),
                               B=2, seed=0):
    """Record a torch trajectory CROSSING the training schedule transitions:
    the lr x0.1 drop after epoch 19 (main.py:137-143 with lr_step=(19,))
    and the epoch-20 alpha gate that switches on the edge/joints2d terms
    (simplified.py:609,636-644).  Same init + batch as the 5-step recording
    (torch.manual_seed(0), synthetic seed 0, frozen BN, dropout off), so it
    reuses train_batch.npz / train_state_dict.npz; writes
    schedule_traj.npz + schedule_state_dict_final.npz.
    """
    import torch

    torch.manual_seed(0)
    opt = _train_opt(B)
    from lib.models.networks.intaghand_model import load_model_intag
    model = load_model_intag(opt)
    for m in model.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    model.train()
    for m in model.modules():                 # frozen BN (see above)
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            m.eval()

    from lib.models.hand3d.Mano_render import ManoRender
    from lib.trains.simplified import CtdetLoss
    render = ManoRender(opt)
    loss_mod = CtdetLoss(opt, render)

    np_batch, tb = _torch_batch_from_synthetic(B, seed=seed)
    params = list(model.parameters()) + list(loss_mod.parameters())
    optim = torch.optim.Adam(params, lr)

    losses, epoch_log, lr_log = [], [], []
    lr_step = list(lr_step)
    for epoch in epochs:
        for _ in range(steps_per_epoch):
            result, paramsDict, handDictList, otherInfo = model(
                tb["input"], tb["choose"], tb["cloud"], tb["depth"],
                tb["ind"], tb["K_new"], tb["valid"])
            loss, loss_stats, _, _ = loss_mod(
                result, paramsDict, handDictList, otherInfo, tb, "train",
                epoch)
            loss = loss.mean()
            optim.zero_grad()
            loss.backward()
            optim.step()
            losses.append(float(loss.detach()))
            epoch_log.append(epoch)
            lr_log.append(optim.param_groups[0]["lr"])
            print(f"torch ep{epoch} step {len(losses)}: "
                  f"loss={losses[-1]:.6f} lr={lr_log[-1]:.2e}")
        # the reference drops the LR AFTER the epoch that matches lr_step
        # (main.py:137-143), so the next epoch trains at the new rate
        if epoch in lr_step:
            new_lr = lr * (0.1 ** (lr_step.index(epoch) + 1))
            for g in optim.param_groups:
                g["lr"] = new_lr

    out = dict(losses=np.asarray(losses, np.float64),
               epochs=np.asarray(epoch_log, np.int64),
               lrs=np.asarray(lr_log, np.float64),
               lr=lr, lr_step=np.asarray(lr_step, np.int64),
               steps_per_epoch=steps_per_epoch, seed=seed, B=B,
               freeze_bn=True)
    np.savez(os.path.join(OUT_DIR, "schedule_traj.npz"), **out)
    sdf = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    np.savez(os.path.join(OUT_DIR, "schedule_state_dict_final.npz"), **sdf)
    print(f"wrote schedule trajectory ({len(losses)} steps) to {OUT_DIR}")


def record_selfcontained(model, ref_root, file_id="000002"):
    """Record the reference's SELF-CONTAINED eval forward on a real bundled
    RGB-D pair: choose=None/ind=None, so the hand centers come from NMS+top-1
    on the predicted heatmap and the point clouds from depth2pcl on the
    PREDICTED mask (intaghand_encoder.py:369-491, 750-784) — the path the
    demo/serving/fps headline uses (demo.py:119-235 preprocessing replicated
    here: fixed egocentric K with the intentional cx/cy swap, center-crop
    affine warp, K->K_img update, ImageNet normalization of the BGR image).

    depth2pcl's two np.random.shuffle calls are patched to no-ops, making the
    point sampling deterministic (sorted first-1024 in-band pixels,
    wrap-padded) — the exact semantics of pdfnet_tpu's
    depth_to_hand_clouds(deterministic=True), so the replay side needs no RNG
    coupling.
    """
    import cv2
    import torch
    import lib.models.networks.intaghand_encoder as enc

    from lib.utils.image import get_affine_transform

    img_file = os.path.join(ref_root, "assets", "H2O", "color",
                            f"{file_id}.png")
    depth_file = os.path.join(ref_root, "assets", "H2O", "depth",
                              f"{file_id}.png")
    image = cv2.imread(img_file)
    depth = cv2.imread(depth_file, cv2.IMREAD_ANYDEPTH) / 1000.0

    # demo.py:132-137: fixed H2O egocentric intrinsics, cx/cy intentionally
    # swapped
    fx, fy = 636.6593017578125, 636.251953125
    cx, cy = 635.283881879317, 366.8740353496978
    K = np.array([[fx, 0, cy], [0, fy, cx], [0, 0, 1]], np.float64)

    h, w = image.shape[:2]
    c = np.array([w / 2.0, h / 2.0], np.float32)
    s = max(h, w) * 1.0
    res = 384
    trans_input, _ = get_affine_transform(c, s, 0, [res, res])
    K_img = K.copy()
    K_img[0][0] = K[0][0] * trans_input[0][0]
    K_img[1][1] = K[1][1] * trans_input[1][1]
    K_img[0][2] = K[0][2] * trans_input[0][0] + trans_input[0][2]
    K_img[1][2] = K[1][2] * trans_input[1][1] + trans_input[1][2]
    K_img = K_img.astype(np.float32)

    image = cv2.warpAffine(image, trans_input, (res, res),
                           flags=cv2.INTER_LINEAR)
    depth_384 = cv2.warpAffine(depth, trans_input, (res, res),
                               flags=cv2.INTER_NEAREST).astype(np.float32)
    mean = np.array([0.485, 0.456, 0.406], np.float32).reshape(1, 1, 3)
    std = np.array([0.229, 0.224, 0.225], np.float32).reshape(1, 1, 3)
    pre_img = (image.astype(np.float32) / 255.0 - mean) / std    # HWC (BGR,
    # exactly as demo.py:325 feeds it — color order is part of the fixture)
    valid = np.ones((1, 2), np.float32)

    captured = {}
    orig_shuffle, orig_d2p = np.random.shuffle, enc.depth2pcl

    def d2p_capture(depth_t, mask_t, K_t, valid_np):
        ch, cl = orig_d2p(depth_t, mask_t, K_t, valid_np)
        captured["choose"], captured["cloud"] = ch, cl
        return ch, cl

    np.random.shuffle = lambda x: None          # determinism (see docstring)
    enc.depth2pcl = d2p_capture
    try:
        with torch.no_grad():
            result, params, hand_dicts, other = model(
                torch.from_numpy(pre_img.transpose(2, 0, 1)[None].copy()),
                None, None, torch.from_numpy(depth_384),
                None, torch.from_numpy(K_img), valid)
    finally:
        np.random.shuffle = orig_shuffle
        enc.depth2pcl = orig_d2p

    # the decoded center indices, recomputed exactly as the encoder does
    # (intaghand_encoder.py:750-758; raw-logit NMS + per-channel top-1)
    with torch.no_grad():
        chms = enc._nms(other["ret"]["hm"].clone(), 5)
        _, ind_left, _, _ = enc._topk(chms[:, :1], 1)
        _, ind_right, _, _ = enc._topk(chms[:, 1:], 1)
        ind = torch.cat((ind_left, ind_right), dim=1).numpy()

    np.savez(os.path.join(OUT_DIR, "selfcontained_inputs.npz"),
             img=pre_img.transpose(2, 0, 1)[None], depth=depth_384,
             K=K_img, valid=valid, file_id=file_id)
    np.savez(
        os.path.join(OUT_DIR, "selfcontained_outputs.npz"),
        ind=ind, choose=captured["choose"], cloud=captured["cloud"],
        verts3d_left=result["verts3d"]["left"].numpy(),
        verts3d_right=result["verts3d"]["right"].numpy(),
        verts2d_left=result["verts2d"]["left"].numpy(),
        verts2d_right=result["verts2d"]["right"].numpy(),
        scale_left=params["scale"]["left"].numpy(),
        scale_right=params["scale"]["right"].numpy(),
        trans2d_left=params["trans2d"]["left"].numpy(),
        trans2d_right=params["trans2d"]["right"].numpy(),
        root_left=params["root"]["left"].numpy(),
        root_right=params["root"]["right"].numpy(),
        gcn_verts_left=hand_dicts[0]["verts3d"]["left"].numpy(),
        gcn_verts_right=hand_dicts[0]["verts3d"]["right"].numpy(),
        hms=other["hms"].numpy(),
        mask=other["mask"].numpy(),
        hm=other["ret"]["hm"].numpy(),
    )
    n_band = [int((captured["choose"][i] > 0).sum()) for i in range(2)]
    print(f"wrote self-contained fixtures to {OUT_DIR} "
          f"(in-band pixel diversity per hand: {n_band})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference")
    ap.add_argument("--train_steps", type=int, default=0,
                    help="also record an N-step training trajectory")
    ap.add_argument("--schedule", action="store_true",
                    help="record the 25-step schedule-crossing trajectory "
                         "(epochs 18-22, lr_step=(19,), alpha gate at 20)")
    ap.add_argument("--train_only", action="store_true")
    ap.add_argument("--freeze_bn", action="store_true", default=True,
                    help="record with BatchNorm in running-average mode "
                         "(deterministic; see record_train_trajectory)")
    ap.add_argument("--no_freeze_bn", dest="freeze_bn", action="store_false")
    args = ap.parse_args()
    os.makedirs(OUT_DIR, exist_ok=True)

    import torch
    install_shims(args.ref)
    _install_chumpy_stub()
    if args.train_steps:
        record_train_trajectory(args.ref, args.train_steps,
                                freeze_bn=args.freeze_bn)
    if args.schedule:
        record_schedule_trajectory(args.ref)
    if (args.train_steps or args.schedule) and args.train_only:
        return
    from types import SimpleNamespace
    opt = SimpleNamespace(
        heads={"hm": 2, "wh": 2, "params": 122}, depth=True, iterations=False,
        PCA_SZ=63, knn_K=64, ball_radius=0.015, ball_radius2=0.04,
        sample_num_level1=512, sample_num_level2=128, INPUT_FEATURE_NUM=3,
        SAMPLE_NUM=1024, default_resolution=384,
        DECONV_DIMS=[256, 256, 256, 256], GCN_IN_DIM=[512, 256, 128],
        GCN_OUT_DIM=[256, 128, 64], IMG_DIMS=[256, 128, 64], graph_k=2,
        graph_layer_num=4)
    from lib.models.networks.intaghand_model import load_model_intag
    torch.manual_seed(0)
    model = load_model_intag(opt)
    model.eval()

    rng = np.random.RandomState(42)
    B, res, N = 1, 384, 1024
    img = rng.randn(B, 3, res, res).astype(np.float32)
    # clustered plausible cloud so ball query has in-radius neighbors
    base = rng.uniform(-0.05, 0.05, (1, 1, 3))
    cloud = (base + rng.normal(0, 0.03, (B, 2, N, 3))).astype(np.float32)
    choose = rng.randint(0, res * res, (B, 2, N)).astype(np.int64)
    depth = rng.uniform(0.3, 0.8, (B, res, res)).astype(np.float32)
    ind = np.array([[48 * 96 + 30, 50 * 96 + 60]], np.int64)
    K = np.array([[[480.0, 0, 192], [0, 480.0, 192], [0, 0, 1]]], np.float32)
    valid = np.ones((B, 2), np.float32)

    with torch.no_grad():
        result, params, hand_dicts, other = model(
            torch.from_numpy(img), torch.from_numpy(choose),
            torch.from_numpy(cloud), torch.from_numpy(depth),
            torch.from_numpy(ind), torch.from_numpy(K),
            torch.from_numpy(valid))

    np.savez(os.path.join(OUT_DIR, "inputs.npz"), img=img, cloud=cloud,
             choose=choose, depth=depth, ind=ind, K=K, valid=valid)
    np.savez(
        os.path.join(OUT_DIR, "outputs.npz"),
        verts3d_left=result["verts3d"]["left"].numpy(),
        verts3d_right=result["verts3d"]["right"].numpy(),
        verts2d_left=result["verts2d"]["left"].numpy(),
        verts2d_right=result["verts2d"]["right"].numpy(),
        scale_left=params["scale"]["left"].numpy(),
        scale_right=params["scale"]["right"].numpy(),
        trans2d_left=params["trans2d"]["left"].numpy(),
        trans2d_right=params["trans2d"]["right"].numpy(),
        root_left=params["root"]["left"].numpy(),
        root_right=params["root"]["right"].numpy(),
        gcn_verts_left=hand_dicts[0]["verts3d"]["left"].numpy(),
        gcn_verts_right=hand_dicts[0]["verts3d"]["right"].numpy(),
        hms=other["hms"].numpy(),
        mask=other["mask"].numpy(),
        hm=other["ret"]["hm"].numpy(),
        wh=other["ret"]["wh"].numpy(),
    )
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    np.savez(os.path.join(OUT_DIR, "state_dict.npz"), **sd)
    print(f"wrote parity fixtures to {OUT_DIR}")

    # self-contained eval path on the real bundled RGB-D pair (same model)
    if os.path.exists(os.path.join(args.ref, "assets", "H2O", "color",
                                   "000002.png")):
        record_selfcontained(model, args.ref)


if __name__ == "__main__":
    main()
