"""Checkpoint-parity verifier: reference PyTorch vs dcpt_tpu on the same inputs.

Given a reference ``.pth`` checkpoint (or random weights) and an arch config,
runs the reference torch model (CPU) and our flax model on identical inputs and
reports the agreement PSNR — the ≤0.01 dB gate from BASELINE.md reduces to
this number being ≳60 dB, since the metric pipeline is bit-exact (PARITY.md).

Usage::

    python scripts/verify_checkpoint_parity.py --arch NAFNetBaseline \
        --ckpt pretrained_models/dcpt_nafnet_5d.pth --param-key params_ema \
        [--image path.png | --size 128]

Requires /root/reference mounted (uses tests/ref_loader.py stubs).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir, "tests"))

ARCHS = {
    "NAFNetBaseline": (
        dict(width=64, enc_blk_nums=[1, 1, 1, 28], middle_blk_num=1, dec_blk_nums=[1, 1, 1, 1]),
        "nafnet_arch",
    ),
    "Restormer": (dict(), "restormer_arch"),
    "PromptIR": (dict(), "promptir_arch"),
    "SwinIR": (
        dict(embed_dim=180, depths=[6, 6, 6, 6, 6, 6], num_heads=[6, 6, 6, 6, 6, 6], mlp_ratio=2.0, window_size=8, upscale=1),
        "swinir_arch",
    ),
}


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--arch", default="NAFNetBaseline", choices=list(ARCHS))
    parser.add_argument("--ckpt", default=None, help=".pth checkpoint; random torch weights if omitted")
    parser.add_argument("--param-key", default="params_ema")
    parser.add_argument("--image", default=None, help="test image (else random)")
    parser.add_argument("--size", type=int, default=128)
    parser.add_argument("--overrides", nargs="*", default=[], help="arch kwargs like width=32")
    args = parser.parse_args()

    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    import torch

    from ref_loader import load_reference

    if load_reference() is None:
        sys.exit("reference tree not available at /root/reference")
    import importlib

    kwargs, module_name = ARCHS[args.arch]
    kwargs = dict(kwargs)
    for ov in args.overrides:
        k, v = ov.split("=", 1)
        kwargs[k] = eval(v, {"__builtins__": {}}, {})

    ref_mod = importlib.import_module(f"basicsr.archs.{module_name}")
    ref_net = getattr(ref_mod, args.arch)(**kwargs)
    ref_net.eval()

    if args.ckpt:
        ckpt = torch.load(args.ckpt, map_location="cpu", weights_only=True)
        state = ckpt.get(args.param_key, ckpt.get("params", ckpt))
        state = {k.removeprefix("module."): v for k, v in state.items()}
        ref_net.load_state_dict(state, strict=True)
        print(f"loaded {args.ckpt} [{args.param_key}]")
    else:
        torch.manual_seed(0)
        print("using random torch weights")

    from dcpt_tpu.archs import build_network
    from dcpt_tpu.convert.torch_checkpoint import state_dict_to_params

    our_cls_kwargs = {k: tuple(v) if isinstance(v, list) else v for k, v in kwargs.items()}
    net = build_network({"type": args.arch, **our_cls_kwargs})
    params = state_dict_to_params(
        {k: v.detach().numpy() for k, v in ref_net.state_dict().items()},
        key_map=getattr(type(net), "torch_key_map", None),
    )

    if args.image:
        import cv2

        img = cv2.imread(args.image).astype(np.float32) / 255.0
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        x = img[None]
    else:
        x = np.random.default_rng(0).random((1, args.size, args.size, 3), dtype=np.float32)

    # pad to window multiple like the eval harness
    ws = kwargs.get("window_size", 16 if args.arch == "NAFNetBaseline" else 8)
    h, w = x.shape[1:3]
    ph, pw = (ws - h % ws) % ws, (ws - w % ws) % ws
    x = np.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")

    with torch.no_grad():
        ref_out = ref_net(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    out = net.apply({"params": params}, jnp.asarray(x))
    out = out[0] if isinstance(out, tuple) else out
    ours = np.asarray(out).transpose(0, 3, 1, 2)

    mse = float(np.mean((ours - ref_out) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-30))
    print(f"agreement PSNR: {psnr:.2f} dB (max abs diff {np.abs(ours - ref_out).max():.2e})")
    print("PASS (≥60 dB)" if psnr >= 60 else "FAIL (<60 dB)")
    sys.exit(0 if psnr >= 60 else 1)


if __name__ == "__main__":
    main()
