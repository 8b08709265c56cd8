"""Export a fine-tuned Orbax checkpoint back to the reference's torch layout.

Writes ``pytorch_model.bin`` (SeerUNet) + ``pytorch_model_1.bin`` (FSText)
loadable by the reference's strict ``load_state_dict``
(``/root/reference/inference.py:119-128``) — the reverse direction of
``pipelines/loading.load_finetuned``, so checkpoints round-trip between the
two frameworks.

Usage:
    python tools/export_torch.py --output_dir outputs/run --step 1000 \
        --out exported/
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))

from seervideoldm_tpu.io.checkpoint import CheckpointManager
from seervideoldm_tpu.io.export import export_reference_checkpoint


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--output_dir", required=True,
                    help="training output dir holding learned_sdunet-steps-<N>/")
    ap.add_argument("--step", type=int, default=None,
                    help="global step to export (default: latest)")
    ap.add_argument("--out", required=True, help="destination directory")
    args = ap.parse_args()

    mgr = CheckpointManager(args.output_dir)
    step = args.step if args.step is not None else mgr.latest_step()
    if step is None:
        raise SystemExit(f"no learned_sdunet-steps-* checkpoints in {args.output_dir}")
    params = CheckpointManager.restore_numpy(
        os.path.join(mgr.path_for_step(step), "params"))
    paths = export_reference_checkpoint(params["unet"], params["fstext"], args.out)
    for p in paths:
        print(f"wrote {p}")


if __name__ == "__main__":
    main()
