"""Pallas kernel tests (interpret mode on CPU; compiled path exercised on TPU)."""

import numpy as np

import jax.numpy as jnp

from circulantpreconditioner_tpu.ops.pallas_kernels import complex_matmul


def test_complex_matmul_interpret():
    rng = np.random.default_rng(0)
    M = K = N = 256
    ar, ai = rng.normal(size=(M, K)).astype(np.float32), rng.normal(size=(M, K)).astype(np.float32)
    br, bi = rng.normal(size=(K, N)).astype(np.float32), rng.normal(size=(K, N)).astype(np.float32)
    o_re, o_im = complex_matmul(jnp.asarray(ar), jnp.asarray(ai), jnp.asarray(br),
                                jnp.asarray(bi), interpret=True)
    want = (ar + 1j * ai) @ (br + 1j * bi)
    np.testing.assert_allclose(np.asarray(o_re), want.real, rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(o_im), want.imag, rtol=2e-4, atol=2e-3)


def test_complex_matmul_fallback_nontiled():
    rng = np.random.default_rng(1)
    ar = rng.normal(size=(100, 100)).astype(np.float32)
    ai = rng.normal(size=(100, 100)).astype(np.float32)
    br = rng.normal(size=(100, 50)).astype(np.float32)
    bi = rng.normal(size=(100, 50)).astype(np.float32)
    o_re, o_im = complex_matmul(jnp.asarray(ar), jnp.asarray(ai), jnp.asarray(br), jnp.asarray(bi))
    want = (ar + 1j * ai) @ (br + 1j * bi)
    np.testing.assert_allclose(np.asarray(o_re), want.real, rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(o_im), want.imag, rtol=2e-4, atol=2e-3)
