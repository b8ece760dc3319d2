"""Tests for DiffJPEG, USM, mosaic, summary utils, tree_io, and the knn pipeline."""

import os

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestDiffJPEG:
    def test_matches_reference_module(self, reference, rng):
        import torch

        from basicsr.utils.diffjpeg import DiffJPEG as RefDiffJPEG

        from dcpt_tpu.utils.diffjpeg import DiffJPEG

        x = rng.random((2, 3, 32, 32)).astype(np.float32)
        ref = RefDiffJPEG(differentiable=False)
        with torch.no_grad():
            theirs = ref(torch.from_numpy(x), quality=20).numpy()
        ours = DiffJPEG(differentiable=False)(jnp.asarray(x.transpose(0, 2, 3, 1)), 20)
        np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), theirs, atol=2e-4)

    def test_differentiable_path_has_gradient(self, rng):
        from dcpt_tpu.utils.diffjpeg import DiffJPEG

        jpeg = DiffJPEG(differentiable=True)
        x = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
        g = jax.grad(lambda x: jnp.sum(jpeg(x, 50)))(x)
        assert np.isfinite(np.asarray(g)).all()

    def test_close_to_cv2(self, rng):
        """Sanity: DiffJPEG approximates real JPEG (reference docstring claim)."""
        from dcpt_tpu.utils.diffjpeg import DiffJPEG

        img = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        _, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, 50])
        cv2_out = cv2.imdecode(enc, 1).astype(np.float32) / 255.0
        ours = np.asarray(DiffJPEG(differentiable=False)(jnp.asarray(img[None].astype(np.float32) / 255.0), 50))[0]
        # BGR vs RGB: compare per-channel energy only
        assert np.abs(ours.mean() - cv2_out.mean()) < 0.05


class TestUSM:
    def test_device_matches_host(self, rng):
        from dcpt_tpu.utils.img_process_util import USMSharp, usm_sharp

        img = rng.random((24, 24, 3)).astype(np.float32)
        host = usm_sharp(img, radius=7)
        dev = np.asarray(USMSharp(radius=7)(jnp.asarray(img[None])))[0]
        # host uses cv2 Gaussian sigma auto, device uses sigma=0 (same cv2 default)
        np.testing.assert_allclose(dev, host, atol=5e-3)

    def test_filter2d_per_batch_kernels(self, rng):
        from dcpt_tpu.utils.img_process_util import filter2D

        x = jnp.asarray(rng.random((2, 8, 8, 3)).astype(np.float32))
        k = jnp.asarray(rng.random((2, 3, 3)).astype(np.float32))
        out = filter2D(x, k)
        assert out.shape == x.shape
        # batch 0 with kernel 0 == single-kernel call on batch 0
        single = filter2D(x[:1], k[:1])
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(single[0]), atol=1e-6)


class TestSummaryUtils:
    def test_flops_and_params(self):
        from dcpt_tpu.archs import build_network
        from dcpt_tpu.utils.summary_utils import get_model_complexity_info

        net = build_network({"type": "NAFNetBaseline", "width": 8, "enc_blk_nums": [1], "middle_blk_num": 1, "dec_blk_nums": [1]})
        params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
        flops, n_params = get_model_complexity_info(net, params, (16, 16, 3), as_string=False)
        assert flops > 0
        assert n_params > 1000


class TestTreeIO:
    def test_roundtrip(self, tmp_path, rng):
        from dcpt_tpu.utils.tree_io import load_tree_npz, save_tree_npz

        tree = {"a": {"b": rng.random((3, 3)), "c": {"d": rng.random(5)}}}
        path = str(tmp_path / "x.npz")
        save_tree_npz(path, {"params": tree, "params_ema": tree})
        loaded = load_tree_npz(path)
        np.testing.assert_array_equal(loaded["params"]["a"]["c"]["d"], tree["a"]["c"]["d"])
        np.testing.assert_array_equal(loaded["params_ema"]["a"]["b"], tree["a"]["b"])


class TestKnnPipeline:
    def test_knn_gen_and_knn(self, tmp_path, rng):
        """knn_gen → features/labels → KNN fit runs end-to-end."""
        import subprocess
        import sys

        for name in ("degA", "degB"):
            d = tmp_path / name
            d.mkdir()
            for i in range(4):
                base = np.full((140, 140, 3), 30 if name == "degA" else 220, np.uint8)
                noise = (rng.random((140, 140, 3)) * 30).astype(np.uint8)
                cv2.imwrite(str(d / f"{i}.png"), base + noise)

        out = tmp_path / "knns"
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        r = subprocess.run(
            [
                sys.executable, "knn_gen.py", "--arch", "NAFNetBaseline", "--out", str(out),
                "--data", f"degA={tmp_path/'degA'}", f"degB={tmp_path/'degB'}",
                "--levels", "3", "--max-images", "4",
            ],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            # env was previously BUILT but not passed — the child inherited
            # JAX_PLATFORMS=axon and silently ran via the remote accelerator
            # (hanging forever when the tunnel is down); with env= the run is
            # a genuine CPU compile (~minutes under full-suite contention)
            env=env, capture_output=True, text=True, timeout=1800,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        feats = np.load(out / "lr_features_3.npy")
        labels = np.load(out / "lr_labels.npy")
        assert feats.shape[0] == 8 and labels.shape == (8,)
        # levels must be EXECUTION order (reference hook-dump order), not the
        # alphabetical order a taps dict takes crossing a jit boundary:
        # level 1 is encoders.0 (32ch @128px); alphabetical would have put
        # decoder0.0 (128ch @32px) first
        f1 = np.load(out / "lr_features_1.npy")
        assert f1.shape[1] == 128 * 128 * 32, f1.shape

        from sklearn.neighbors import KNeighborsClassifier

        clf = KNeighborsClassifier(3).fit(feats, labels)
        assert clf.score(feats, labels) >= 0.5


class TestFlowUtil:
    def test_flo_roundtrip(self, tmp_path, rng):
        from dcpt_tpu.utils.flow_util import flowread, flowwrite

        flow = rng.standard_normal((12, 16, 2)).astype(np.float32)
        path = str(tmp_path / "a.flo")
        flowwrite(flow, path)
        back = flowread(path)
        np.testing.assert_array_equal(back, flow)

    def test_quantize_matches_reference(self, reference, rng):
        from basicsr.utils.flow_util import dequantize_flow as ref_deq, quantize_flow as ref_q

        from dcpt_tpu.utils.flow_util import dequantize_flow, quantize_flow

        flow = (rng.standard_normal((8, 10, 2)) * 0.01).astype(np.float64)
        ours_dx, ours_dy = quantize_flow(flow)
        ref_dx, ref_dy = ref_q(flow)
        np.testing.assert_array_equal(ours_dx, ref_dx)
        np.testing.assert_array_equal(ours_dy, ref_dy)
        np.testing.assert_allclose(dequantize_flow(ours_dx, ours_dy), ref_deq(ref_dx, ref_dy), atol=1e-12)


class TestTensor2ImgFast:
    def test_matches_reference(self, reference, rng):
        """tensor2img_fast == the reference's torch implementation bit-exact,
        including its truncating (non-rounding) uint8 cast
        (/root/reference/basicsr/utils/img_util.py:109-123)."""
        import torch

        from basicsr.utils.img_util import tensor2img_fast as ref_fn

        from dcpt_tpu.utils.img_util import tensor2img_fast

        x = rng.random((1, 17, 23, 3)).astype(np.float32) * 1.4 - 0.2  # exercises clamp
        theirs = ref_fn(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        ours = tensor2img_fast(jnp.asarray(x))
        np.testing.assert_array_equal(ours, theirs)

    def test_vs_tensor2img_within_one_lsb(self, rng):
        from dcpt_tpu.utils.img_util import tensor2img, tensor2img_fast

        x = rng.random((1, 9, 11, 3)).astype(np.float32)
        slow = tensor2img(jnp.asarray(x))
        fast = tensor2img_fast(jnp.asarray(x))
        assert np.abs(slow.astype(np.int16) - fast.astype(np.int16)).max() <= 1


class TestH52VTP:
    def _surface(self, path, n=7):
        import h5py

        rng = np.random.default_rng(3)
        with h5py.File(path, "w") as f:
            f["xcoordinates"] = np.linspace(-1, 1, n)
            f["ycoordinates"] = np.linspace(-1, 1, n)
            f["train_loss"] = (rng.random((n, n)) * 150).astype(np.float64)  # exercises zmax clip

    def test_matches_reference_byte_exact(self, reference, tmp_path):
        """Default (polys) mode output is byte-identical to the reference's
        writer (/root/reference/basicsr/utils/h52vtp.py:32-325), including
        its line-wrapping quirks."""
        from basicsr.utils.h52vtp import h5_to_vtp as ref_fn

        from dcpt_tpu.utils.h52vtp import h5_to_vtp

        a, b = tmp_path / "ref.h5", tmp_path / "ours.h5"
        self._surface(str(a))
        self._surface(str(b))
        ref_fn(str(a), "train_loss", log=True, zmax=100)
        ours = h5_to_vtp(str(b), "train_loss", log=True, zmax=100)
        ref_out = str(a)[:-3] + "_train_loss_zmax=100_log.vtp"
        assert open(ours).read() == open(ref_out).read()

    def test_interp_runs(self, tmp_path):
        from dcpt_tpu.utils.h52vtp import h5_to_vtp

        p = tmp_path / "s.h5"
        self._surface(str(p))
        out = h5_to_vtp(str(p), "train_loss", log=False, zmax=-1, interp=16)
        assert "16" not in out or out.endswith(".vtp")
        txt = open(out).read()
        assert txt.startswith("<VTKFile") and txt.rstrip().endswith("</VTKFile>")


class TestFileClient:
    def test_disk_and_dispatch(self, tmp_path):
        from dcpt_tpu.utils.file_client import FileClient

        p = tmp_path / "x.bin"
        p.write_bytes(b"\x00\x01payload")
        assert FileClient("disk").get(p) == b"\x00\x01payload"
        with pytest.raises(ValueError, match="not supported"):
            FileClient("s3")

    def test_memcached_requires_mc(self):
        """Surface parity with the reference (file_client.py:22-59): the
        backend is registered and fails at construction with the same
        ImportError when the optional ``mc`` client is absent."""
        from dcpt_tpu.utils.file_client import FileClient

        assert "memcached" in FileClient._backends
        with pytest.raises(ImportError, match="memcached"):
            FileClient("memcached", server_list_cfg="/tmp/s.conf", client_cfg="/tmp/c.conf")

    def test_lmdb_roundtrip(self, tmp_path):
        lmdb = pytest.importorskip("lmdb")
        if not hasattr(lmdb, "open"):
            # ref_loader._install_stubs() plants an EMPTY lmdb module in
            # sys.modules (the reference package imports it unconditionally),
            # so in-suite importorskip "succeeds" even when real lmdb is
            # absent — skip on the stub, same as on no module at all.
            pytest.skip("lmdb is the ref_loader stub, not the real package")

        from dcpt_tpu.utils.file_client import FileClient

        db = str(tmp_path / "db.lmdb")
        env = lmdb.open(db, map_size=1 << 20)
        with env.begin(write=True) as txn:
            txn.put(b"k1", b"v1")
        env.close()
        fc = FileClient("lmdb", db_paths=db)
        assert fc.get("k1") == b"v1"
