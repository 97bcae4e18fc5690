"""Moment tests for the distribution library against closed forms.

The reference RNG conventions being checked are documented at
src/distributions.cpp:12-65 (scale vs rate, variance-parameterised normal).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesrrcpp_tpu import distributions as dist

N = 200_000


def _many(fn, key, n=N):
    return jax.vmap(fn)(jax.random.split(key, n))


def test_norm_rng_variance_parameterisation():
    key = jax.random.PRNGKey(0)
    x = _many(lambda k: dist.norm_rng(k, jnp.float64(2.0), jnp.float64(9.0)), key)
    assert np.mean(x) == pytest.approx(2.0, abs=0.05)
    # sigma2 is a VARIANCE (src/distributions.cpp:37-39)
    assert np.var(x) == pytest.approx(9.0, rel=0.05)


def test_gamma_scale_vs_rate():
    key = jax.random.PRNGKey(1)
    a, s = 3.0, 2.5
    x = _many(lambda k: dist.gamma_rng(k, a, s), key)
    assert np.mean(x) == pytest.approx(a * s, rel=0.05)
    y = _many(lambda k: dist.gamma_rate_rng(k, a, s), key)
    assert np.mean(y) == pytest.approx(a / s, rel=0.05)


def test_inv_gamma_scale():
    key = jax.random.PRNGKey(2)
    a, b = 4.0, 3.0  # mean = b/(a-1)
    x = _many(lambda k: dist.inv_gamma_rng(k, a, b), key)
    assert np.mean(x) == pytest.approx(b / (a - 1), rel=0.05)
    y = _many(lambda k: dist.inv_gamma_rate_rng(k, a, b), key)
    assert np.mean(y) == pytest.approx(b / (a - 1), rel=0.05)


def test_inv_scaled_chisq_moments():
    key = jax.random.PRNGKey(3)
    dof, scale = 10.0, 2.0  # mean = dof*scale/(dof-2)
    x = _many(lambda k: dist.inv_scaled_chisq_rng(k, dof, scale), key)
    assert np.mean(x) == pytest.approx(dof * scale / (dof - 2), rel=0.05)


def test_dirichlet_mean_and_simplex():
    key = jax.random.PRNGKey(4)
    alpha = jnp.asarray([1.0, 2.0, 7.0])
    x = jax.vmap(lambda k: dist.dirichlet_rng(k, alpha))(jax.random.split(key, 50_000))
    np.testing.assert_allclose(np.sum(x, axis=1), 1.0, rtol=1e-10)
    np.testing.assert_allclose(np.mean(x, axis=0), np.asarray(alpha) / 10.0, atol=0.01)


def test_beta_exp():
    key = jax.random.PRNGKey(5)
    x = _many(lambda k: dist.beta_rng(k, 2.0, 6.0, dtype=jnp.float64), key)
    assert np.mean(x) == pytest.approx(0.25, abs=0.01)
    y = _many(lambda k: dist.exp_rng(k, 3.0), key)
    assert np.mean(y) == pytest.approx(3.0, rel=0.05)  # R mean/scale convention


def test_gamma_shape_rng_exponential_fast_path():
    """gamma_shape_rng's static-shape-1 fast path (Gamma(1,1) ==
    Exponential(1), exact) must match the rejection path in law."""
    import jax
    import jax.numpy as jnp
    import scipy.stats as st

    from bayesrrcpp_tpu import distributions as dist

    x1 = np.asarray(dist.gamma_shape_rng(jax.random.PRNGKey(0), 1.0,
                                         20000, dtype=jnp.float32))
    assert st.kstest(x1, "expon").pvalue > 1e-3
    x2 = np.asarray(dist.gamma_shape_rng(jax.random.PRNGKey(1), 1.5,
                                         20000, dtype=jnp.float32))
    assert st.kstest(x2, "gamma", args=(1.5,)).pvalue > 1e-3


def test_gamma_shape_rng_half_integer_decomposition():
    """Integer/half-integer static shapes are exact rejection-free
    decompositions (sum of Exponentials + chi^2_1/2); the horseshoe's
    shape (1 + vL)/2 hits this path for EVERY integer dof vL
    (src/HorseshoeR.cpp:109 exposes vL).  Non-(half-)integer shapes fall
    back to the rejection sampler -- all must match Gamma(a, 1) in law."""
    import jax
    import jax.numpy as jnp
    import scipy.stats as st

    from bayesrrcpp_tpu import distributions as dist

    for i, a in enumerate([0.5, 2.0, 2.5, 1.3]):
        x = np.asarray(dist.gamma_shape_rng(jax.random.PRNGKey(10 + i), a,
                                            20000, dtype=jnp.float32))
        assert x.dtype == np.float32
        assert st.kstest(x, "gamma", args=(a,)).pvalue > 1e-3, a
