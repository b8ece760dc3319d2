"""Export a restoration model as a serialized StableHLO artifact (jax.export).

Produces a self-contained compiled-graph artifact loadable WITHOUT the Python
arch code — the TPU-native deployment analog of TorchScript/ONNX export.

Usage::

    python scripts/export_model.py --config options/all_in_one/test/test_NAFNet_5d.yml \
        --size 256 --out nafnet_5d.stablehlo
    # omit --ckpt usage by leaving path.pretrain_network_g empty in the yml

Reload::

    from jax import export
    fn = export.deserialize(open("nafnet_5d.stablehlo", "rb").read())
    out = fn.call(lq_nhwc)   # params are baked in as constants
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True, help="test yml with network_g (+ optional pretrain path)")
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--out", required=True)
    parser.add_argument("--platforms", nargs="+", default=None, help="lowering platforms, e.g. tpu cpu (default: current backend)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from dcpt_tpu.archs import build_network
    from dcpt_tpu.utils.options import yaml_load

    opt = yaml_load(args.config)
    net = build_network(dict(opt["network_g"]))

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, args.size, args.size, 3)))["params"]

    load_path = (opt.get("path") or {}).get("pretrain_network_g")
    if load_path and os.path.exists(load_path):
        from dcpt_tpu.convert.torch_checkpoint import load_network_params
        from dcpt_tpu.utils.tree_io import load_tree_npz

        if load_path.endswith(".pth"):
            params = load_network_params(net, load_path, opt["path"].get("param_key_g", "params"))["params"]
        else:
            trees = load_tree_npz(load_path)
            params = trees.get(opt["path"].get("param_key_g", "params"), next(iter(trees.values())))
        print(f"loaded weights from {load_path}")
    else:
        print("exporting with random init (no checkpoint found)")

    def forward(x):
        out = net.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)}, x)
        return out[0] if isinstance(out, tuple) else out

    x_spec = jax.ShapeDtypeStruct((args.batch, args.size, args.size, 3), jnp.float32)
    kwargs = {"platforms": args.platforms} if args.platforms else {}
    exported = jexport.export(jax.jit(forward), **kwargs)(x_spec)
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"wrote {args.out} ({len(blob) / 1e6:.1f} MB), input {x_spec.shape}, platform {exported.platforms}")


if __name__ == "__main__":
    main()
