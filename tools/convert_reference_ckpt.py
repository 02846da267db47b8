"""Convert a released reference checkpoint (.pth) to a pdfnet_tpu checkpoint.

Usage:
  python tools/convert_reference_ckpt.py --pth Best_H2O_ours_PDF_center_2gpu_56.pth \
      --out outputs/ckpt/converted

The result loads with ``--load_model outputs/ckpt/converted`` in the train /
eval CLIs, or directly via orbax.  Forward parity of the conversion is
guaranteed by tests/test_full_parity.py (<=1e-4 units vs the torch model).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pth", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from pdfnet_tpu.utils.convert_torch import (convert_state_dict,
                                                load_torch_checkpoint)
    state = load_torch_checkpoint(args.pth)
    variables, skipped = convert_state_dict(state)
    print(f"converted {sum(1 for _ in _leaves(variables['params']))} param "
          f"tensors; skipped {len(skipped)} dead entries")

    import orbax.checkpoint as ocp
    payload = {"params": variables["params"],
               "batch_stats": variables["batch_stats"],
               "step": np.zeros((), np.int32),
               "epoch": np.zeros((), np.int64)}
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(args.out), payload, force=True)
    ckptr.wait_until_finished()
    print(f"wrote {args.out}")


def _leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v


if __name__ == "__main__":
    main()
