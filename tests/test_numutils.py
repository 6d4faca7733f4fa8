"""Tests for utils.numdiff (Ridders) and utils.spline (cubic spline),
the ports of src/algorithms/numdiff.nim and cspline.nim functionality.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from qex_tpu.utils import numdiff, spline


def test_ndiff_scalar():
    d, err = numdiff.ndiff(np.sin, 0.7, 0.5)
    assert abs(d - np.cos(0.7)) < 1e-12
    assert err < 1e-8


def test_ndiff_vector_valued():
    f = lambda x: np.array([np.sin(x), x ** 3])
    d, err = numdiff.ndiff(f, 1.1, 0.5)
    assert np.allclose(d, [np.cos(1.1), 3 * 1.1 ** 2], atol=1e-10)


def test_ndiff2():
    d2, err = numdiff.ndiff2(np.sin, 0.4, 0.5)
    assert abs(d2 - (-np.sin(0.4))) < 1e-9


def test_ndiff_validates_ad_force():
    """The intended use: cross-check a jax.grad against the numerical
    oracle on a 1-parameter family."""
    import jax
    g = lambda x: float(jnp.sum(jnp.cos(x * jnp.arange(1.0, 4.0)) ** 2))
    d, _ = numdiff.ndiff(g, 0.3, 0.1)
    ad = float(jax.grad(
        lambda x: jnp.sum(jnp.cos(x * jnp.arange(1.0, 4.0)) ** 2))(0.3))
    assert abs(d - ad) < 1e-9


def test_estimate_derivative_orders():
    f, df = np.exp, np.exp(0.0)
    for n in (1, 2, 3):
        dx = [0.1 * (i + 1) for i in range(n)]
        dy = [f(d) - f(0.0) for d in dx]
        est = spline.estimate_derivative(dx, dy)
        # higher order -> smaller error
        assert abs(est - df) < (0.06, 0.01, 0.002)[n - 1]


def test_cspline_interpolates_and_derivs():
    x = np.linspace(0.0, 2.0, 21)
    s = spline.cspline(x, np.sin(x), dy_lo=1.0, dy_hi=np.cos(2.0))
    t = np.linspace(0.05, 1.95, 57)
    assert np.allclose(np.asarray(s(t)), np.sin(t), atol=2e-5)
    assert np.allclose(np.asarray(s.deriv(t)), np.cos(t), atol=5e-4)


def test_cspline_solve_scale_setting():
    """w0/t0-style inversion: find t where the interpolated observable
    crosses a target."""
    x = np.linspace(0.0, 3.0, 31)
    s = spline.cspline(x, x ** 2 / (1 + x))
    t = float(s.solve(1.0))
    assert abs(t ** 2 / (1 + t) - 1.0) < 1e-6


def test_cspline_validation():
    with pytest.raises(ValueError):
        spline.cspline([0.0, 1.0], [0.0, 1.0])
    with pytest.raises(ValueError):
        spline.cspline([0.0, 1.0, 0.5], [0.0, 1.0, 2.0])


def test_mdevolve_alias_names_accepted():
    """Every name the reference factory (integrator.nim:32-60) accepts
    must resolve here too.  ALL structure names are now genuine
    implementations (tools/derive_fg_schemes.py for the 4th-order
    family, tools/derive_mn6_schemes.py for the 6th) and must NOT
    warn."""
    import warnings as _w

    from qex_tpu.hmc import integrators
    for name in ("2MN", "4MN5FP", "4MN5FV", "6MN7FV", "4MN3F1GP",
                 "4MN4F2GVG", "4MN4F2GV", "4MN5F1GV", "4MN5F1GP",
                 "4MN5F2GV", "4MN5F2GP", "6MN5F3GP"):
        with _w.catch_warnings(record=True) as rec:
            _w.simplefilter("always")
            sch = integrators.get_integrator(name)
        warned = any("MDevolve" in str(r.message) for r in rec)
        assert not warned, name
        # symplectic sanity: T and V coefficients each sum to 1
        tsum = sum(s[1] for s in sch.steps if s[0] == "T")
        vsum = sum(s[1] for s in sch.steps if s[0] in ("V", "FG"))
        assert abs(tsum - 1.0) < 1e-12, name
        assert abs(vsum - 1.0) < 1e-12, name


def test_fg_family_order4():
    """Each derived minimum-norm FG scheme is genuinely 4th order:
    |dH| per trajectory drops ~16x per dt halving on the U(1) model."""
    import jax

    from qex_tpu.models import u1
    th = u1.random_field(jax.random.PRNGKey(21), (2, 8, 8))
    for name in ("4MN5F1GV", "4MN5F1GP", "4MN4F2GV", "4MN4F2GVG",
                 "4MN5F2GV", "4MN5F2GP"):
        def dh(steps):
            _, s = u1.hmc_step(jax.random.PRNGKey(2), th, 1.0,
                               tau=1.0, steps=steps, scheme=name)
            return abs(float(s["dH"]))

        r = dh(3) / max(dh(6), 1e-300)
        assert r > 8.0, (name, r)


def test_4mn5fp_order4():
    """4MN5FP is genuinely 4th order with the mcmcTypes.nim:346-360
    stage structure T(rho) V(vartheta) T(theta) V(lambda)...; the
    round-1 misassignment (T(theta) first) was only 2nd order and is
    pinned dead here."""
    import jax

    from qex_tpu.models import u1
    th = u1.random_field(jax.random.PRNGKey(21), (2, 8, 8))

    def dh(steps):
        _, s = u1.hmc_step(jax.random.PRNGKey(2), th, 1.0,
                           tau=1.0, steps=steps, scheme="4MN5FP")
        return abs(float(s["dH"]))

    r = dh(3) / max(dh(6), 1e-300)
    assert r > 8.0, r


def test_order6_family():
    """YOSHIDA6 / S7ODR6 / FGI6 / 6MN7FV are genuinely 6th order
    (~64x per dt halving; > 24 allowed for noise).  FGI6 in particular
    pins the FG-xi w^3 substep scaling in _scale_steps: the round-1
    w^2 scaling made the triple-jump composition only 2nd order.
    6MN7FV pins the self-derived MDevolve-structure coefficients
    (tools/derive_mn6_schemes.py)."""
    import warnings

    import jax

    from qex_tpu.models import u1
    th = u1.random_field(jax.random.PRNGKey(21), (2, 8, 8))
    for name in ("YOSHIDA6", "S7ODR6", "FGI6", "6MN7FV", "6MN5F3GP"):
        def dh(steps):
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                _, s = u1.hmc_step(jax.random.PRNGKey(2), th, 1.0,
                                   tau=1.0, steps=steps, scheme=name)
            return abs(float(s["dH"]))

        # 6MN5F3GP's large drift substeps (a2=1.38) need finer steps
        # to reach the asymptotic regime
        n0 = 4 if name == "6MN5F3GP" else 2
        r = dh(n0) / max(dh(2 * n0), 1e-300)
        assert r > 24.0, (name, r)
