"""FID InceptionV3 extractor: architecture, weight conversion, end-to-end FID
(VERDICT r1 item 10).  No pretrained weights or torchvision exist in this env,
so verification is two-fold: (1) structural — the converter's key schema is
the pytorch-fid/torchvision state_dict schema, verified by synthesizing a
torch-style state_dict from the flax tree's own shapes and round-tripping it;
(2) numeric — ``tests/_torch_inception.py`` independently re-implements the
published pytorch-fid architecture in torch, the SAME random state_dict is
loaded into both implementations (strict key match), and the 2048-d pool3
features must agree (``TestTorchMirrorNumericParity``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def inception():
    from dcpt_tpu.archs.inception_arch import InceptionV3Features

    net = InceptionV3Features(resize_input=False)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))["params"]
    return net, params


def _to_torch_state_dict(tree, prefix=""):
    """Invert the converter mapping: flax tree → torch-style key/shape dict."""
    sd = {}
    for name, node in tree.items():
        full = f"{prefix}{name}"
        if isinstance(node, dict) and "conv" in node:
            k = np.asarray(node["conv"]["kernel"])
            sd[f"{full}.conv.weight"] = np.transpose(k, (3, 2, 0, 1))  # HWIO→OIHW
            c = k.shape[-1]
            rng = np.random.default_rng(abs(hash(full)) % 2**32)
            sd[f"{full}.bn.weight"] = rng.random(c).astype(np.float32) + 0.5
            sd[f"{full}.bn.bias"] = rng.random(c).astype(np.float32)
            sd[f"{full}.bn.running_mean"] = rng.random(c).astype(np.float32)
            sd[f"{full}.bn.running_var"] = rng.random(c).astype(np.float32) + 0.5
        elif isinstance(node, dict):
            sd.update(_to_torch_state_dict(node, prefix=f"{full}."))
    return sd


class TestInceptionArch:
    def test_pool3_features_2048(self, inception):
        net, params = inception
        out = net.apply({"params": params}, jnp.zeros((2, 299, 299, 3)))
        assert out.shape == (2, 2048)

    def test_resize_and_normalize_paths(self):
        from dcpt_tpu.archs.inception_arch import InceptionV3Features

        net = InceptionV3Features(resize_input=True, normalize_input=True)
        params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
        out = net.apply({"params": params}, jnp.zeros((1, 80, 96, 3)))
        assert out.shape == (1, 2048)

    def test_exclude_pad_avgpool(self):
        """count_include_pad=False: a constant image stays constant under the
        FID average pool even at the borders."""
        from dcpt_tpu.archs.inception_arch import _avg_pool_3x3_exclude_pad

        x = jnp.full((1, 5, 7, 2), 3.25)
        np.testing.assert_allclose(np.asarray(_avg_pool_3x3_exclude_pad(x)), 3.25, rtol=1e-6)


class TestWeightConversion:
    def test_state_dict_roundtrip_and_bn_folding(self, inception):
        import sys

        sys.path.insert(0, "scripts")
        from convert_inception_weights import BN_EPS, convert_state_dict

        net, params = inception
        sd = _to_torch_state_dict(params)
        # fc / aux keys must be ignored
        sd["fc.weight"] = np.zeros((1000, 2048), np.float32)
        sd["AuxLogits.conv0.conv.weight"] = np.zeros((128, 768, 1, 1), np.float32)
        sd["Conv2d_1a_3x3.bn.num_batches_tracked"] = np.int64(7)
        converted = convert_state_dict(sd)

        # exact tree-structure match against the flax init
        flat_a = jax.tree_util.tree_structure(params)
        flat_b = jax.tree_util.tree_structure(converted)
        assert flat_a == flat_b

        # BN folding math: y = γ(x−μ)/√(σ²+eps) + β  ==  scale·x + shift
        g = sd["Conv2d_1a_3x3.bn.weight"]
        b = sd["Conv2d_1a_3x3.bn.bias"]
        mu = sd["Conv2d_1a_3x3.bn.running_mean"]
        var = sd["Conv2d_1a_3x3.bn.running_var"]
        x = np.random.default_rng(0).random(32).astype(np.float32)
        want = g * (x - mu) / np.sqrt(var + BN_EPS) + b
        got = converted["Conv2d_1a_3x3"]["bn_scale"] * x + converted["Conv2d_1a_3x3"]["bn_shift"]
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

        # converted params run through the real model
        out = net.apply({"params": jax.tree_util.tree_map(jnp.asarray, converted)}, jnp.zeros((1, 299, 299, 3)))
        assert out.shape == (1, 2048) and np.isfinite(np.asarray(out)).all()

    def test_conversion_script_cli(self, inception, tmp_path):
        """The script end-to-end: torch.save → convert → npz → extractor."""
        import subprocess
        import sys

        import torch

        _, params = inception
        sd = {k: torch.from_numpy(np.asarray(v)) for k, v in _to_torch_state_dict(params).items()}
        src = tmp_path / "pt_inception.pth"
        dst = tmp_path / "inception_fid.npz"
        torch.save(sd, str(src))
        proc = subprocess.run(
            [sys.executable, "scripts/convert_inception_weights.py", str(src), str(dst)],
            capture_output=True, text=True, cwd=".",
        )
        assert proc.returncode == 0, proc.stdout + proc.stderr
        assert dst.exists()

        from dcpt_tpu.metrics.fid import load_inception_extractor

        extractor = load_inception_extractor(str(dst), resize_input=False)
        feats = extractor(np.zeros((2, 299, 299, 3), np.float32))
        assert feats.shape == (2, 2048)


class TestTorchMirrorNumericParity:
    """Random weights → torch mirror vs flax extractor: features must agree.

    Covers what the schema round-trip cannot: conv kernel transposes, VALID vs
    torch implicit-zero padding, stride phase on odd sizes (299 trunk), the
    count_include_pad=False average pools, the Mixed_7c max-pool branch, BN
    folding numerics, the bilinear 299-resize, and the [0,1]→[-1,1] map.
    """

    def _both_nets(self, resize_input, normalize_input):
        import sys

        import torch

        sys.path.insert(0, "scripts")
        from convert_inception_weights import convert_state_dict

        from _torch_inception import TorchInceptionV3Features
        from dcpt_tpu.archs.inception_arch import InceptionV3Features

        flax_net = InceptionV3Features(resize_input=resize_input, normalize_input=normalize_input)
        init_params = flax_net.init(jax.random.PRNGKey(3), jnp.zeros((1, 299, 299, 3)))["params"]
        sd = _to_torch_state_dict(init_params)

        torch_net = TorchInceptionV3Features(resize_input=resize_input, normalize_input=normalize_input)
        # strict load: the mirror's module tree must produce EXACTLY the
        # pytorch-fid key schema the converter consumes
        missing, unexpected = torch_net.load_state_dict(
            {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, strict=False
        )
        assert not unexpected, unexpected
        assert all(k.endswith("num_batches_tracked") for k in missing), missing
        torch_net.eval()

        params = jax.tree_util.tree_map(jnp.asarray, convert_state_dict(sd))
        return torch_net, flax_net, params

    def _assert_features_match(self, torch_net, flax_net, params, x_nhwc):
        import torch

        with torch.no_grad():
            want = torch_net(torch.from_numpy(x_nhwc.transpose(0, 3, 1, 2))).numpy()
        got = np.asarray(flax_net.apply({"params": params}, jnp.asarray(x_nhwc)))
        scale = max(1.0, float(np.abs(want).max()))
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3 * scale)

    def test_pool3_features_match_at_299(self):
        torch_net, flax_net, params = self._both_nets(False, False)
        x = np.random.default_rng(7).random((2, 299, 299, 3), np.float32)
        self._assert_features_match(torch_net, flax_net, params, x)

    def test_resize_and_normalize_paths_match(self):
        """reference defaults resize_input=True (fid.py:11) on non-299 input,
        plus the normalize_input branch."""
        torch_net, flax_net, params = self._both_nets(True, True)
        x = np.random.default_rng(8).random((1, 96, 128, 3), np.float32)
        self._assert_features_match(torch_net, flax_net, params, x)


class TestFidEndToEnd:
    def test_fid_zero_for_identical_and_positive_for_shifted(self):
        from dcpt_tpu.metrics.fid import (
            calculate_fid,
            extract_features,
            feature_statistics,
            load_inception_extractor,
        )

        extractor = load_inception_extractor(None, resize_input=False)
        rng = np.random.default_rng(0)
        base = rng.random((8, 75, 75, 3), dtype=np.float32)

        def gen(data):
            for i in range(0, len(data), 4):
                yield data[i : i + 4]

        f1 = extract_features(gen(base), extractor)
        f2 = extract_features(gen(base), extractor)
        assert f1.shape == (8, 2048)
        mu1, s1 = feature_statistics(f1)
        mu2, s2 = feature_statistics(f2)
        # identical distributions → FID ≈ 0 through the whole pipeline
        assert abs(calculate_fid(mu1, s1, mu2, s2)) < 1e-3

        # discrimination is a property of the METRIC given non-degenerate
        # features (a random-init 17-layer ReLU net collapses small shifts);
        # verify it with a deterministic projection extractor
        proj = np.random.default_rng(1).random((75 * 75 * 3, 16), np.float32)
        lin = lambda b: np.asarray(b).reshape(len(b), -1) @ proj  # noqa: E731
        g1 = extract_features(gen(base), lin)
        g3 = extract_features(gen(np.clip(base + 0.3, 0, 1)), lin)
        m1, c1 = feature_statistics(g1)
        m3, c3 = feature_statistics(g3)
        assert calculate_fid(m1, c1, m3, c3) > 10 * abs(calculate_fid(m1, c1, *feature_statistics(g1)))
        assert calculate_fid(m1, c1, m3, c3) > 1.0
