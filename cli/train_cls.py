#!/usr/bin/env python
"""Train the downstream N-vs-V beat classifier — reference `train_cls.py`
equivalent (reference train_cls.py:46-77: ResNet_cls, Adam lr=1e-3,
cross-entropy, 20 epochs, batch 32, save ./model/cls_model.pth).

TPU-native: class arrays device-resident, one jitted scan per epoch.
Checkpoint goes to --save (default ./model_save/cls_model.msgpack,
full TrainState).

Example:
    python cli/train_cls.py --epochs 20 --batch_size 32
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from ecg_denoise_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=2023)
    p.add_argument("--data_path", type=str, default=None)
    p.add_argument("--save", type=str, default="./model_save/cls_model.msgpack")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from ecg_denoise_tpu.data.cls_cache import load_cls_arrays
    from ecg_denoise_tpu.models import ResNetCls
    from ecg_denoise_tpu.train.state import create_train_state
    from ecg_denoise_tpu.train.cls_steps import make_cls_epoch_fns
    from ecg_denoise_tpu.train.checkpoint import save_checkpoint

    tr_x, tr_y = load_cls_arrays(train=True, path=args.data_path)
    te_x, te_y = load_cls_arrays(train=False, path=args.data_path)
    tr_x, tr_y = jnp.asarray(tr_x), jnp.asarray(tr_y)
    te_x, te_y = jnp.asarray(te_x), jnp.asarray(te_y)

    model = ResNetCls()
    state, tx = create_train_state(
        model, jax.random.PRNGKey(args.seed), tr_x[:2], learning_rate=args.lr
    )
    train_epoch, eval_epoch = make_cls_epoch_fns(model, tx)

    key = jax.random.PRNGKey(args.seed)
    for epoch in range(args.epochs):
        key, ep_key = jax.random.split(key)
        state, tm = train_epoch(state, tr_x, tr_y, ep_key, args.batch_size)
        em, _ = eval_epoch(state, te_x, te_y, 128)
        print(
            f"epoch {epoch + 1:02d}/{args.epochs} "
            f"train_loss={float(tm['loss']):.4f} train_acc={float(tm['acc']):.4f} "
            f"test_loss={float(em['loss']):.4f} test_acc={float(em['acc']):.4f}"
        )

    save_checkpoint(args.save, state)
    print(f"saved {args.save}")


if __name__ == "__main__":
    main()
