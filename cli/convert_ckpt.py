#!/usr/bin/env python
"""Migrate a trained PyTorch reference checkpoint into this framework.

The reference saves bare state_dicts (`torch.save(model.state_dict(), ...)`,
reference denoise_train.py:90-94). This tool imports one, maps its weights
through the shared layout mapping (interop/torch_weights.py — the same
mapping the parity tests certify to 1e-4), wraps them in a fresh full
TrainState (Adam opt-state, step 0) and writes a .msgpack checkpoint that
every consumer here (cli/main.py --resume, serving, test_cls,
transfer_learning) can load.

Self-verifying: after conversion it runs both models eval-mode on the same
random input and prints the max abs output difference.

    python cli/convert_ckpt.py --model_index 4 \
        --pth /path/to/ralenet_99_emb_intensity-4.pth \
        --out model_save/ralenet/ralenet_99_emb_intensity-4.msgpack

Requires the reference repo (default /root/reference) importable — the
state_dict is loaded into the reference module classes before mapping, so
Lazy-module materialisation and key layouts match exactly.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--model_index", type=int, required=True,
                    help="reference main.py model index 0..5 "
                         "(unet/DANet/ralenet_nra/ralenet_mlp/ralenet/ACDAE)")
    ap.add_argument("--pth", type=str, required=True,
                    help="reference .pth state_dict checkpoint")
    ap.add_argument("--out", type=str, required=True,
                    help="output .msgpack path (reference filename scheme "
                         "recommended so find_model discovers it)")
    ap.add_argument("--reference_root", type=str, default="/root/reference")
    ap.add_argument("--platform", type=str, default="cpu",
                    help="jax platform for the conversion (host-side work; "
                         "cpu avoids remote-TPU dispatch)")
    args = ap.parse_args()

    if not os.path.isdir(os.path.join(args.reference_root, "model")):
        sys.exit(f"reference repo not found at {args.reference_root} "
                 "(--reference_root); the state_dict must be loaded into "
                 "the reference module classes before layout mapping")

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np
    import torch

    from ecg_denoise_tpu import MODEL_NAMES
    from ecg_denoise_tpu.interop import torch_weights as tw
    from ecg_denoise_tpu.models import build_model
    from ecg_denoise_tpu.train import create_train_state
    from ecg_denoise_tpu.train.checkpoint import save_checkpoint

    tw.load_reference_path(args.reference_root)

    state_dict = torch.load(args.pth, map_location="cpu")
    tm = tw.build_reference_model(args.model_index)
    tm.load_state_dict(state_dict)
    tm.eval()
    variables = tw.variables_from_torch_model(args.model_index, tm)

    name = MODEL_NAMES[args.model_index]
    model = build_model(name)
    state, _ = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((2, 2, 256)),
        variables=variables,
    )
    save_checkpoint(args.out, state)

    # Self-verification: same input through both systems.
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 2, 256)).astype(np.float32)
    with torch.no_grad():
        y_t = tm(torch.from_numpy(x)).numpy()
    y_j = np.asarray(model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        x, train=False))
    diff = float(np.max(np.abs(y_t - y_j)))
    print(f"converted {args.pth} -> {args.out} ({name}); "
          f"eval-mode max|torch - jax| = {diff:.3e}")
    if diff > 5e-4:
        sys.exit("conversion parity check FAILED (expected <= 5e-4; the "
                 "layout mapping and this state_dict disagree)")


if __name__ == "__main__":
    main()
