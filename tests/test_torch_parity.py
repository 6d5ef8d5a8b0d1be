"""Numerical parity vs the PyTorch reference: identical weights, identical
outputs (<= 1e-4) — the oracle behind BASELINE.md's 'SNR parity within 1e-3'.

Loads the reference model from /root/reference (read-only import; torchvision
is stubbed — it is imported there but unused) and copies its randomly-
initialised weights into our flax trees via the shared layout mapping in
ecg_denoise_tpu.interop.torch_weights (also the .pth migration path), then
compares eval-mode forward passes on the same input.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

if not os.path.isdir("/root/reference/model"):
    pytest.skip("PyTorch reference repo not mounted at /root/reference",
                allow_module_level=True)

import jax.numpy as jnp

from ecg_denoise_tpu.interop import torch_weights as tw

tw.load_reference_path()


def test_unet_forward_parity():
    from ecg_denoise_tpu.models import UNet

    torch.manual_seed(0)
    tm = tw.build_reference_model(0)
    tm.eval()
    variables = tw.unet_variables(tm)

    x = np.random.default_rng(0).standard_normal((4, 2, 256)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    ours = np.asarray(UNet().apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("variant,model_index", [("full", 4), ("mlp", 3)])
def test_ralenet_forward_parity(variant, model_index):
    """Identical weights -> identical outputs for the R-wave-attention model
    (reference model/transformer.py ralenet; 'full'=high_level_enhence)."""
    from ecg_denoise_tpu.models import RaleNet

    torch.manual_seed(0)
    tm = tw.build_reference_model(model_index)
    # The reference's bias tables are zero-init (parameters_normalize is
    # never called); randomise so the bias path is actually exercised.
    for n in range(1, 5):
        getattr(tm, f"rwattn{n}").parameters_normalize()
    tm.eval()
    variables = tw.variables_from_torch_model(model_index, tm)

    x = np.random.default_rng(1).standard_normal((2, 2, 256)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    model = RaleNet(variant=variant)
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_ralenet_nra_forward_parity():
    """Identical weights -> identical outputs for the NO-R-wave-attention
    model (reference model/raletransformer.py:559 ralenet — the one family
    member round 2 left without a weight-transfer oracle). Its quirks vs
    transformer.py: `Mlp` defaults local_enhence=True (raletransformer.py:118)
    so every block carries the LeFF partial conv, and there are no rwattn
    bias tables at all (the mask-no-op MSAttention branch at :304-307 is
    never taken since no mask is ever passed)."""
    from ecg_denoise_tpu.models import RaleNet

    torch.manual_seed(0)
    tm = tw.build_reference_model(2)
    tm.eval()
    variables = tw.variables_from_torch_model(2, tm)

    x = np.random.default_rng(5).standard_normal((2, 2, 256)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    model = RaleNet(variant="nra")
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_danet_forward_parity():
    from ecg_denoise_tpu.models import Seq2Seq2

    torch.manual_seed(0)
    tm = tw.build_reference_model(1)
    tm.eval()
    variables = tw.seq2seq2_variables(tm)

    x = np.random.default_rng(2).standard_normal((2, 2, 256)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    ours = np.asarray(Seq2Seq2().apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_acdae_forward_parity():
    from ecg_denoise_tpu.models import ACDAE

    torch.manual_seed(0)
    tm = tw.build_reference_model(5)
    tm.eval()
    variables = tw.acdae_variables(tm)

    x = np.random.default_rng(3).standard_normal((2, 2, 256)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    ours = np.asarray(ACDAE().apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_pth_state_dict_import_roundtrip(tmp_path):
    """The .pth migration path (interop.variables_from_state_dict) restores a
    saved reference checkpoint into our tree with forward parity — the
    contract a reference user migrating trained checkpoints relies on."""
    from ecg_denoise_tpu.models import UNet

    torch.manual_seed(7)
    tm = tw.build_reference_model(0)
    tm.eval()
    path = tmp_path / "unet_9_bw_intensity-4.pth"
    torch.save(tm.state_dict(), path)

    variables = tw.variables_from_state_dict(0, torch.load(path))
    x = np.random.default_rng(9).standard_normal((4, 2, 256)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    ours = np.asarray(UNet().apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_newrale_12lead_forward_parity():
    """12-lead adapter wrapper around a frozen core matches the reference
    (model/ralenet_12leads.py:676-705) in eval mode.

    The reference file is unimportable as-is: its `if __name__ ==
    "__main__":` block contains only comments (ralenet_12leads.py:711-717,
    an IndentationError — the reference's own Transfer_learning.py would
    crash importing it). Exec a patched copy with a trailing `pass`.
    """
    import types as _types

    src = open("/root/reference/model/ralenet_12leads.py").read() + "\n    pass\n"
    ref12 = _types.ModuleType("ref12")
    ref12.__dict__["__name__"] = "ref12"
    exec(compile(src, "ralenet_12leads.py", "exec"), ref12.__dict__)
    from ecg_denoise_tpu.models import NewRale

    torch.manual_seed(0)
    core = ref12.ralenet(high_level_enhence=True)
    for n in range(1, 5):
        getattr(core, f"rwattn{n}").parameters_normalize()
    tm = ref12.newrale(core)
    tm.eval()
    variables = tw.newrale_variables(tm)

    x = np.random.default_rng(4).standard_normal((2, 12, 256)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    ours = np.asarray(NewRale().apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_rwbias_edge_truncation_matches_reference():
    """Near-edge r_pos biases must TRUNCATE (reference mask_fill's negative
    F.pad, transformer.py:547-558), not clamp the window in-bounds."""
    import torch as _t
    from model import transformer as ref_mod
    from ecg_denoise_tpu.ops.attention import RelativePositionEmbedding

    _t.manual_seed(3)
    ref = ref_mod.RelativePositionEmbedding(32, 256, 2)
    ref.parameters_normalize()
    table = tw.vec(ref.relative_position_bias_table)
    mod = RelativePositionEmbedding(length=32, whole_length=256, num_heads=2)
    variables = {"params": {"relative_position_bias_table": table}}
    for r_pos in (0, 5, 16, 100, 250, 255):
        with torch.no_grad():
            want = ref(R_pos=r_pos).numpy()
        got = np.asarray(mod.apply(variables, jnp.int32(r_pos)))
        np.testing.assert_allclose(got, want, atol=1e-6,
                                   err_msg=f"r_pos={r_pos}")


def test_convert_ckpt_cli_to_serving(tmp_path):
    """cli/convert_ckpt.py end-to-end: a reference .pth becomes a full
    TrainState .msgpack that serving.Denoiser restores with forward parity
    to the source torch model."""
    import subprocess
    import sys as _sys

    from ecg_denoise_tpu.serving import Denoiser

    torch.manual_seed(11)
    tm = tw.build_reference_model(5)
    tm.eval()
    pth = tmp_path / "ACDAE_9_emb_intensity-4.pth"
    torch.save(tm.state_dict(), pth)
    out = tmp_path / "ACDAE_9_emb_intensity-4.msgpack"

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [_sys.executable, os.path.join(repo, "cli", "convert_ckpt.py"),
         "--model_index", "5", "--pth", str(pth), "--out", str(out)],
        capture_output=True, text=True, cwd=repo)
    assert res.returncode == 0, res.stdout + res.stderr
    assert out.exists()

    d = Denoiser.from_checkpoint("ACDAE", str(out), max_batch=8)
    x = np.random.default_rng(12).standard_normal((4, 2, 256)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(d(x), ref, atol=1e-4, rtol=1e-4)
