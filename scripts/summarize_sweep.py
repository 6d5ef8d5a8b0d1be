#!/usr/bin/env python
"""Summarize the round-3 PVC-corpus sweep (VERDICT r2 item 4).

Parses output.txt result lines (the reference's exact format,
denoise_train.py:100-101) into the 6-model x condition grid, checks
monotone-in-SNR along the emb intensity axis, and compares the model rank
order at emb -4 with the reference's published order
(/root/reference/output.txt: transformer family > DANet > unet).

    python scripts/summarize_sweep.py [--output output.txt] [--epoch 99]
"""

import argparse
import re
import sys

MODELS = ["unet", "DANet", "ralenet_nra", "ralenet_mlp", "ralenet", "ACDAE"]
INTENSITIES = [-4, -2, 0, 2, 4]
NOISES = ["bw", "ma", "em", "emb"]

LINE = re.compile(
    r"^(?P<model>.+)_(?P<epoch>\d+)_(?P<noise>bw|ma|em|emb)_intensity"
    r"(?P<inten>-?\d+):snr:(?P<snr>[-\d.]+), rmse:(?P<rmse>[-\d.]+)"
)


def parse(path, epoch):
    grid = {}
    with open(path) as f:
        for ln in f:
            m = LINE.match(ln.strip())
            if not m or int(m.group("epoch")) != epoch:
                continue
            key = (m.group("model"), m.group("noise"), int(m.group("inten")))
            # later lines win (re-runs supersede)
            grid[key] = (float(m.group("snr")), float(m.group("rmse")))
    return grid


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--output", default=None,
                    help="result-lines file (default: output.txt if "
                         "present, else the COMMITTED round-5 spot-audit "
                         "results/round5/sweep_emb_m4_lines.txt)")
    ap.add_argument("--epoch", type=int, default=99)
    args = ap.parse_args()
    if args.output is None:
        import os

        args.output = ("output.txt" if os.path.exists("output.txt")
                       else "results/round5/sweep_emb_m4_lines.txt")
    grid = parse(args.output, args.epoch)

    print("# PVC-corpus sweep grid — test SNR dB (RMSE) at 100 epochs\n")
    hdr = "| model | " + " | ".join(
        [f"emb {i:+d}" for i in INTENSITIES] + ["bw -4", "ma -4", "em -4"]
    ) + " |"
    print(hdr)
    print("|" + "---|" * (len(INTENSITIES) + 4))
    mono_fail, missing = [], []
    for model in MODELS:
        cells = []
        embs = []
        for i in INTENSITIES:
            v = grid.get((model, "emb", i))
            embs.append(v[0] if v else None)
            cells.append(f"{v[0]:.2f} ({v[1]:.3f})" if v else "—")
        for n in ("bw", "ma", "em"):
            v = grid.get((model, n, -4))
            cells.append(f"{v[0]:.2f} ({v[1]:.3f})" if v else "—")
        print(f"| {model} | " + " | ".join(cells) + " |")
        known = [(i, s) for i, s in zip(INTENSITIES, embs) if s is not None]
        missing += [(model, "emb", i) for i, s in zip(INTENSITIES, embs)
                    if s is None]
        # monotone-in-input-SNR: output SNR should not DROP as input SNR
        # rises (the reference's rows 7-10 rise ~0.5 dB per 2 dB input).
        for (i1, s1), (i2, s2) in zip(known, known[1:]):
            if s2 < s1 - 0.35:  # allow per-run noise
                mono_fail.append(f"{model}: emb {i1:+d}->{i2:+d} "
                                 f"{s1:.2f}->{s2:.2f}")

    print()
    emb4 = {m: grid.get((m, "emb", -4), (None,))[0] for m in MODELS}
    ranked = sorted((m for m in MODELS if emb4[m] is not None),
                    key=lambda m: -emb4[m])
    print("rank order at emb -4:", " > ".join(ranked))
    tf = {"ralenet", "ralenet_mlp", "ralenet_nra", "ACDAE"}
    ok_rank = (len(ranked) == 6
               and set(ranked[:4]) == tf
               and ranked[4] == "DANet" and ranked[5] == "unet")
    print("reference rank structure (transformer-family & ACDAE > DANet > "
          f"unet): {'PASS' if ok_rank else 'CHECK'}")
    if mono_fail:
        print("monotonicity violations (>0.35 dB drops):")
        for m in mono_fail:
            print("  ", m)
    else:
        print("monotone-in-SNR along emb intensities: PASS")
    if missing:
        print(f"missing cells: {len(missing)}", missing[:8])
        sys.exit(1)


if __name__ == "__main__":
    main()
