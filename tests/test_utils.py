"""Unit tests for the L0 foundation: registry, options, imresize, color utils."""

import numpy as np
import pytest

from dcpt_tpu.utils import Registry, yaml_load
from dcpt_tpu.utils.matlab_functions import imresize
from dcpt_tpu.utils.options import _postprocess_yml_value, apply_force_yml


class TestRegistry:
    def test_register_and_get(self):
        reg = Registry("test")

        @reg.register()
        class Foo:
            pass

        assert reg.get("Foo") is Foo
        assert "Foo" in reg

    def test_duplicate_rejected(self):
        reg = Registry("test")

        @reg.register()
        class Foo:
            pass

        with pytest.raises(KeyError):

            @reg.register()
            class Foo:  # noqa: F811
                pass

    def test_suffix_fallback(self):
        reg = Registry("test")

        class Bar:
            pass

        reg._do_register("Bar_basicsr", Bar)
        assert reg.get("Bar") is Bar

    def test_missing_raises(self):
        reg = Registry("test")
        with pytest.raises(KeyError):
            reg.get("Nope")


class TestOptions:
    def test_yaml_load_string(self):
        opt = yaml_load("a: 1\nb:\n  c: [1, 2]\n")
        assert opt["a"] == 1
        assert opt["b"]["c"] == [1, 2]

    def test_postprocess_values(self):
        assert _postprocess_yml_value("~") is None
        assert _postprocess_yml_value("none") is None
        assert _postprocess_yml_value("true") is True
        assert _postprocess_yml_value("false") is False
        assert _postprocess_yml_value("3") == 3
        assert _postprocess_yml_value("0.5") == 0.5
        assert _postprocess_yml_value("!!float 1e-4") == pytest.approx(1e-4)
        assert _postprocess_yml_value("[1, 2, 3]") == [1, 2, 3]
        assert _postprocess_yml_value("hello") == "hello"

    def test_force_yml(self):
        opt = {"train": {"lr": 1e-3}}
        apply_force_yml(opt, ["train:lr=2e-4", "train:new:flag=true"])
        assert opt["train"]["lr"] == pytest.approx(2e-4)
        assert opt["train"]["new"]["flag"] is True

    def test_parse_options_test_layout(self, tmp_path):
        yml = tmp_path / "opt.yml"
        yml.write_text(
            "name: tiny\nmodel_type: SRModel\nscale: 1\nnum_gpu: 0\nmanual_seed: 0\n"
            "datasets:\n  test_1:\n    name: d\n    type: PairedImageDataset\n"
            "    dataroot_gt: ~/gt\n    dataroot_lq: ~/lq\n"
            "path: {}\n"
        )
        from dcpt_tpu.utils import parse_options

        opt, _ = parse_options(str(tmp_path), is_train=False, args=["-opt", str(yml)])
        assert opt["is_train"] is False
        assert opt["datasets"]["test_1"]["phase"] == "test"
        assert opt["datasets"]["test_1"]["scale"] == 1
        assert "results" in opt["path"]["results_root"]
        assert "~" not in opt["datasets"]["test_1"]["dataroot_gt"]


class TestMatlabImresize:
    def test_downscale_matches_reference(self, reference, rng):
        from basicsr.utils.matlab_functions import imresize as ref_imresize

        img = rng.random((37, 53, 3)).astype(np.float64)
        ours = imresize(img, scale=0.5, antialiasing=True)
        theirs = np.asarray(ref_imresize(img, scale=0.5, antialiasing=True))
        np.testing.assert_allclose(ours, theirs, atol=1e-6)  # reference computes via float32 torch internally

    def test_upscale_matches_reference(self, reference, rng):
        from basicsr.utils.matlab_functions import imresize as ref_imresize

        img = rng.random((24, 31, 1)).astype(np.float64)
        ours = imresize(img[:, :, 0], scale=2.0, antialiasing=True)
        theirs = np.asarray(ref_imresize(img, scale=2.0, antialiasing=True)).squeeze()
        np.testing.assert_allclose(ours, theirs, atol=1e-6)  # reference computes via float32 torch internally


class TestColorUtil:
    def test_bgr2ycbcr_matches_reference(self, reference, rng):
        from basicsr.utils.color_util import bgr2ycbcr as ref_fn

        from dcpt_tpu.utils.color_util import bgr2ycbcr

        img = rng.random((16, 16, 3)).astype(np.float32)
        np.testing.assert_allclose(bgr2ycbcr(img, y_only=True), ref_fn(img, y_only=True), atol=1e-5)
        np.testing.assert_allclose(bgr2ycbcr(img), ref_fn(img), atol=1e-5)

    def test_rgb2ycbcr_uint8(self, reference, rng):
        from basicsr.utils.color_util import rgb2ycbcr as ref_fn

        from dcpt_tpu.utils.color_util import rgb2ycbcr

        img = (rng.random((8, 8, 3)) * 255).astype(np.uint8)
        np.testing.assert_array_equal(rgb2ycbcr(img), ref_fn(img))

    def test_roundtrip(self, rng):
        from dcpt_tpu.utils.color_util import rgb2ycbcr, ycbcr2rgb

        img = rng.random((8, 8, 3)).astype(np.float32)
        rec = ycbcr2rgb(rgb2ycbcr(img))
        np.testing.assert_allclose(rec, img, atol=1e-4)
