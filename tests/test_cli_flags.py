"""CLI flag surface: every Config field is reachable and round-trips.

The reference exposes its full flag surface through lib/opts.py:241-282;
ours is generated from the Config dataclass, so these tests pin that the
generation covers every field and that values survive argv -> Config.
"""

import dataclasses

from pdfnet_tpu.cli.main import build_argparser, config_from_args
from pdfnet_tpu.config import Config


def test_every_config_field_is_cli_reachable():
    dests = {a.dest for a in build_argparser()._actions}
    missing = [f.name for f in dataclasses.fields(Config)
               if f.name not in dests]
    assert not missing, f"Config fields unreachable from the CLI: {missing}"


def test_defaults_round_trip():
    args = build_argparser().parse_args([])
    assert config_from_args(args) == Config()


def test_overrides_round_trip():
    argv = [
        "--no-reproj_loss", "--no-brightness", "--no-bone_loss",
        "--photometric_loss", "--off", "--freeze_bn_stats",
        "--skip_nonfinite_updates", "--use_img_attn",
        "--sample_deterministic", "--replicate_reference_quirks",
        "--input_feature_num", "6", "--knn_method", "topk",
        "--gather_method", "take", "--sample_num", "512",
        "--sample_num_level1", "256", "--sample_num_level2", "64",
        "--knn_k", "32", "--ball_radius", "0.02", "--ball_radius2", "0.05",
        "--lr_step", "30,60", "--num_workers", "2", "--dropout", "0.0",
        "--compute_dtype", "float32", "--gcn_out_dim", "256,128,64",
        "--bn_stat_groups", "2", "--eval_batch_size", "48",
        "--image_summary_every", "100", "--edge_loss_start_epoch", "10",
        "--center_weight", "100", "--off_weight", "50",
    ]
    cfg = config_from_args(build_argparser().parse_args(argv))
    assert cfg.reproj_loss is False and cfg.brightness is False
    assert cfg.bone_loss is False
    assert cfg.photometric_loss and cfg.off and cfg.freeze_bn_stats
    assert cfg.skip_nonfinite_updates and cfg.use_img_attn
    assert cfg.sample_deterministic and cfg.replicate_reference_quirks
    assert cfg.input_feature_num == 6 and cfg.knn_method == "topk"
    assert cfg.gather_method == "take" and cfg.sample_num == 512
    assert (cfg.sample_num_level1, cfg.sample_num_level2) == (256, 64)
    assert cfg.knn_k == 32
    assert (cfg.ball_radius, cfg.ball_radius2) == (0.02, 0.05)
    assert cfg.lr_step == (30, 60) and cfg.num_workers == 2
    assert cfg.dropout == 0.0 and cfg.compute_dtype == "float32"
    assert cfg.gcn_out_dim == (256, 128, 64) and cfg.bn_stat_groups == 2
    assert cfg.eval_batch_size == 48 and cfg.image_summary_every == 100
    assert cfg.edge_loss_start_epoch == 10
    assert cfg.center_weight == 100 and cfg.off_weight == 50
    # --off / --photometric_loss / --no-reproj_loss change the derived
    # CenterNet head dict (opts.update_dataset_info_and_set_heads: params
    # rides reproj_loss, texture/light ride photometric, off_* ride off)
    assert set(cfg.heads) == {"hm", "wh", "texture", "light",
                              "off_hm", "off_lms"}


def test_cli_only_flags_still_present():
    args = build_argparser().parse_args(
        ["--synthetic", "--steps", "3", "--eval_every", "2",
         "--save_every", "7", "--vis_every", "10"])
    assert args.synthetic and args.steps == 3
    assert args.eval_every == 2 and args.save_every == 7
    assert args.vis_every == 10
    assert args.depth is True      # default-on; --no-depth rejected in main
