"""Typed config + the reference's public flag surface.

The reference's flags come from the external `global_utils.TorchArgs`
(at least --batch_size/--epochs, consumed at main.py:40,85-86) extended
per-script with --intensity_index/--noise_type_index/--model_index
(main.py:31-33). This module keeps those names (so reference invocations run
unchanged) and adds TPU-native knobs (--use_pallas, --dtype, --mesh, ...).
"""

from __future__ import annotations

import argparse
from dataclasses import dataclass, field

from ecg_denoise_tpu import MODEL_NAMES, NOISE_INTENSITIES, NOISE_TYPES  # single source


@dataclass
class TrainConfig:
    batch_size: int = 32
    epochs: int = 100
    lr: float = 1e-3
    intensity_index: int = 0
    noise_type_index: int = 0
    model_index: int = 0
    seed: int = 2023
    n_select: int = 10_000
    data_path: str | None = None
    model_save_dir: str = "./model_save"
    output_file: str = "./output.txt"
    # Round-5 default flip (VERDICT r4 item 2): the fused-attention kernel
    # custom-VJP trainer is the measured-fastest path AND quality-certified
    # (100-epoch A/B inside noise — RESULTS.md), and round 5 proved it
    # under DP/DPxTP sharding (tests/test_mesh_pallas.py), so it is the
    # default. --no-use_pallas is the plain-XLA escape (and the setting
    # the round-3 sweep grid + its round-5 spot-audit were trained with).
    use_pallas: bool = True
    # bf16 mixed precision (f32 master weights, bf16 activations/matmuls,
    # f32 softmax/normalizer in-kernel) is the round-5 training default:
    # +40% train throughput at @256 (19,978 -> 27,998 w/s, back-to-back
    # A/B results/round5/r5_bench_train256_f32.log and results/round5/r5_bench_train256_bf16.log) and the
    # 100-epoch quality gate landed ABOVE the f32 control (last-5 means
    # 14.88 XLA / 15.37 kernel vs 14.23 f32 — results/round5/
    # r5_bf16_*.log). --dtype float32 reproduces the f32 sweep grid.
    dtype: str = "bfloat16"
    n_data: int | None = None  # data-parallel mesh size (None = all devices)
    n_model: int = 1  # tensor-parallel mesh size
    split_file: str | None = None  # pin/export exact train/test indices
    r_pos: str | None = None  # 'detect' = R-peak-centred attention bias
    multihost: bool = False  # jax.distributed init + per-host data feeding

    @property
    def noise_name(self) -> str:
        return NOISE_TYPES[self.noise_type_index]

    @property
    def noise_intensity(self) -> int:
        return NOISE_INTENSITIES[self.intensity_index]

    @property
    def model_name(self) -> str:
        return MODEL_NAMES[self.model_index]


def build_argparser(description: str = "") -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    # Reference flag surface (TorchArgs + per-script extensions).
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--intensity_index", type=int, default=0)
    p.add_argument("--noise_type_index", type=int, default=0)
    p.add_argument("--model_index", type=int, default=0)
    # Framework extensions.
    p.add_argument("--seed", type=int, default=2023)
    p.add_argument("--n_select", type=int, default=10_000)
    p.add_argument("--data_path", type=str, default=None)
    p.add_argument("--model_save_dir", type=str, default="./model_save")
    p.add_argument("--output_file", type=str, default="./output.txt")
    p.add_argument("--use_pallas", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="fused-attention kernel custom-VJP paths (default "
                        "ON since round 5 — fastest certified trainer; "
                        "--no-use_pallas = plain XLA, the reference-parity "
                        "setting the sweep grid was trained with)")
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"],
                   help="compute dtype (master weights stay f32 either "
                        "way). bfloat16 default since round 5: +40%% "
                        "train throughput, 100-epoch quality gate passed "
                        "ABOVE the f32 control; --dtype float32 is the "
                        "reference-parity setting the sweep grid used")
    p.add_argument("--n_data", type=int, default=None)
    p.add_argument("--n_model", type=int, default=1)
    p.add_argument("--split_file", type=str, default=None,
                   help="JSON {'train': [...], 'test': [...]}; created if "
                        "absent — pins exact indices for parity runs")
    p.add_argument("--multihost", action="store_true",
                   help="initialise jax.distributed from JAX_COORDINATOR_"
                        "ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID and feed "
                        "each host its strided data shard; no-op on a "
                        "single process (parallel/multihost.py)")
    # --fast_train / --packed_train (whole-stage fused and window-packed
    # training paths) were retired in round 4 after losing their final
    # A/Bs — RESULTS.md "retired engines"; git pre-1654be4 has the code.
    p.add_argument("--r_pos", type=str, default=None, choices=["detect"],
                   help="'detect': centre the R-wave attention bias on each "
                        "window's detected R peak (data/rpeaks.py) instead "
                        "of the reference's fixed centre (RaleNet family)")
    return p


def config_from_args(args: argparse.Namespace) -> TrainConfig:
    known = {f for f in TrainConfig.__dataclass_fields__}
    return TrainConfig(**{k: v for k, v in vars(args).items() if k in known})
