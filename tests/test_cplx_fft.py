"""Pair-complex arithmetic and matmul-DFT tests (vs numpy oracles)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpusdr.ops import cplx, fft, xmath


@pytest.fixture
def rng():
    return np.random.default_rng(7)


class TestComplexPair:
    def test_mul_conj_abs(self, rng):
        a = rng.standard_normal(64) + 1j * rng.standard_normal(64)
        b = rng.standard_normal(64) + 1j * rng.standard_normal(64)
        ca, cb = cplx.from_numpy(a), cplx.from_numpy(b)
        np.testing.assert_allclose(cplx.to_numpy(ca * cb), a * b, atol=1e-5)
        np.testing.assert_allclose(cplx.to_numpy(ca.conj()), np.conj(a), atol=1e-7)
        np.testing.assert_allclose(ca.abs(), np.abs(a), atol=1e-5)

    def test_ensure_and_native_roundtrip(self, rng):
        z = (rng.standard_normal(8) + 1j * rng.standard_normal(8)).astype(np.complex64)
        pair = cplx.ensure_pair(jnp.asarray(z))
        back = cplx.maybe_native(pair, jnp.asarray(z))
        np.testing.assert_allclose(np.asarray(back), z, atol=1e-7)

    def test_expj(self):
        th = jnp.linspace(-7, 7, 101)
        z = cplx.to_numpy(cplx.expj(th))
        np.testing.assert_allclose(z, np.exp(1j * np.asarray(th)), atol=1e-6)


class TestAtan2:
    def test_matches_numpy_all_quadrants(self, rng):
        y = jnp.asarray(rng.standard_normal(1000).astype(np.float32))
        x = jnp.asarray(rng.standard_normal(1000).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(xmath.atan2(y, x)), np.arctan2(y, x), atol=1e-6
        )

    def test_axes(self):
        y = jnp.asarray([0.0, 1.0, -1.0, 0.0, 0.0, 2.0, -3.0], jnp.float32)
        x = jnp.asarray([0.0, 0.0, 0.0, 2.0, -2.0, -1.0, -1.0], jnp.float32)
        np.testing.assert_allclose(
            np.asarray(xmath.atan2(y, x)), np.arctan2(y, x), atol=1e-6
        )


class TestMatmulDft:
    @pytest.mark.parametrize("n", [8, 64, 128, 512, 1024, 4096, 100, 1000])
    def test_forward_matches_numpy(self, rng, n):
        z = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
        ours = cplx.to_numpy(fft.dft(cplx.from_numpy(z)))
        ref = np.fft.fft(z)
        scale = max(1.0, np.abs(ref).max())
        np.testing.assert_allclose(ours / scale, ref / scale, atol=2e-5)

    @pytest.mark.parametrize("n", [64, 1024, 8192])
    def test_roundtrip(self, rng, n):
        z = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
        back = cplx.to_numpy(fft.idft(fft.dft(cplx.from_numpy(z))))
        np.testing.assert_allclose(back, z, atol=1e-4)

    def test_batched(self, rng):
        z = (rng.standard_normal((3, 256)) + 1j * rng.standard_normal((3, 256))).astype(
            np.complex64
        )
        ours = cplx.to_numpy(fft.dft(cplx.from_numpy(z)))
        ref = np.fft.fft(z, axis=-1)
        np.testing.assert_allclose(ours, ref, atol=2e-4)
