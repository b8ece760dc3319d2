"""Real-ESRGAN degradation library parity + device-noise sanity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestKernels:
    @pytest.mark.parametrize("iso", [True, False])
    def test_bivariate_gaussian_matches_reference(self, reference, iso):
        from basicsr.data.degradations import bivariate_Gaussian as ref_fn

        from dcpt_tpu.data.degradations import bivariate_Gaussian

        ours = bivariate_Gaussian(21, 2.0, 3.0, 0.7, isotropic=iso)
        theirs = ref_fn(21, 2.0, 3.0, 0.7, isotropic=iso)
        np.testing.assert_allclose(ours, theirs, atol=1e-12)

    def test_generalized_and_plateau_match(self, reference):
        from basicsr.data.degradations import bivariate_generalized_Gaussian as ref_g
        from basicsr.data.degradations import bivariate_plateau as ref_p

        from dcpt_tpu.data.degradations import bivariate_generalized_Gaussian, bivariate_plateau

        np.testing.assert_allclose(
            bivariate_generalized_Gaussian(15, 2.0, 1.0, 0.3, 1.5, isotropic=False),
            ref_g(15, 2.0, 1.0, 0.3, 1.5, isotropic=False),
            atol=1e-12,
        )
        np.testing.assert_allclose(
            bivariate_plateau(15, 2.0, 1.0, 0.3, 1.5, isotropic=False),
            ref_p(15, 2.0, 1.0, 0.3, 1.5, isotropic=False),
            atol=1e-12,
        )

    def test_sinc_matches_reference(self, reference):
        from basicsr.data.degradations import circular_lowpass_kernel as ref_fn

        from dcpt_tpu.data.degradations import circular_lowpass_kernel

        np.testing.assert_allclose(circular_lowpass_kernel(np.pi / 3, 13, pad_to=21), ref_fn(np.pi / 3, 13, pad_to=21), atol=1e-12)

    def test_random_kernels_seeded_match(self, reference):
        import random as pyrandom

        from basicsr.data.degradations import random_mixed_kernels as ref_fn

        from dcpt_tpu.data.degradations import random_mixed_kernels

        args = dict(
            kernel_list=["iso", "aniso", "generalized_iso", "generalized_aniso", "plateau_iso", "plateau_aniso"],
            kernel_prob=[0.3, 0.3, 0.1, 0.1, 0.1, 0.1],
            kernel_size=17,
        )
        np.random.seed(3)
        pyrandom.seed(3)
        ours = random_mixed_kernels(**args)
        np.random.seed(3)
        pyrandom.seed(3)
        theirs = ref_fn(**args)
        np.testing.assert_allclose(ours, theirs, atol=1e-12)


class TestNoise:
    def test_gaussian_noise_seeded_match(self, reference, rng):
        from basicsr.data.degradations import add_gaussian_noise as ref_fn

        from dcpt_tpu.data.degradations import add_gaussian_noise

        img = rng.random((16, 16, 3)).astype(np.float32)
        np.random.seed(5)
        ours = add_gaussian_noise(img, sigma=20, gray_noise=True)
        np.random.seed(5)
        theirs = ref_fn(img, sigma=20, gray_noise=True)
        np.testing.assert_allclose(ours, theirs, atol=1e-7)

    def test_poisson_noise_seeded_match(self, reference, rng):
        from basicsr.data.degradations import add_poisson_noise as ref_fn

        from dcpt_tpu.data.degradations import add_poisson_noise

        img = rng.random((16, 16, 3)).astype(np.float32)
        np.random.seed(5)
        ours = add_poisson_noise(img, scale=0.5)
        np.random.seed(5)
        theirs = ref_fn(img, scale=0.5)
        np.testing.assert_allclose(ours, theirs, atol=1e-7)

    def test_jpg_matches_reference(self, reference, rng):
        from basicsr.data.degradations import add_jpg_compression as ref_fn

        from dcpt_tpu.data.degradations import add_jpg_compression

        img = rng.random((32, 32, 3)).astype(np.float32)
        np.testing.assert_allclose(add_jpg_compression(img, 30), ref_fn(img, 30), atol=1e-7)

    def test_device_noise_statistics(self, rng):
        from dcpt_tpu.data.degradations import random_add_gaussian_noise_jnp, random_add_poisson_noise_jnp

        img = jnp.asarray(np.full((2, 32, 32, 3), 0.5, np.float32))
        out = random_add_gaussian_noise_jnp(jax.random.PRNGKey(0), img, sigma_range=(10, 10))
        resid = np.asarray(out - img)
        assert 0.02 < resid.std() < 0.06  # σ=10/255 ≈ 0.039

        out_p = random_add_poisson_noise_jnp(jax.random.PRNGKey(1), img, scale_range=(1.0, 1.0))
        assert np.asarray(jnp.abs(out_p - img)).mean() > 0.01

    def test_device_gray_noise_is_gray(self):
        from dcpt_tpu.data.degradations import generate_gaussian_noise_jnp

        img = jnp.zeros((1, 8, 8, 3))
        noise = np.asarray(generate_gaussian_noise_jnp(jax.random.PRNGKey(0), img, sigma=25, gray_noise=1))
        np.testing.assert_allclose(noise[..., 0], noise[..., 1])
        np.testing.assert_allclose(noise[..., 0], noise[..., 2])
