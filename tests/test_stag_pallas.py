"""Pallas Dslash kernels vs the XLA fast-layout oracle (interpret mode).

The fused stencil kernels (stag_pallas v1, stag_pallas3 manual-DMA v3)
are the TPU hot path (QEX src/physics/stagD.nim:200-396 role); on the
CPU test mesh they run in Pallas interpret mode, which executes the
same kernel logic (including the async link DMAs) without Mosaic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qex_tpu.lattice import Lattice
from qex_tpu.ops import group, linalg
from qex_tpu.physics import stag_fast as sf
from qex_tpu.physics import stag_pallas as sp
from qex_tpu.physics import stag_pallas3 as sp3
from qex_tpu.physics import staggered as st


@pytest.fixture(scope="module")
def setup():
    lat = Lattice((8, 4, 4, 8))
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 5)
    u = jnp.stack([
        linalg.expm(0.7 * group.random_tah(ks[i], lat.dims, lat.nc,
                                           jnp.complex64))
        for i in range(4)])
    s = sf.new_fast(st.new_stag_eo(lat, u))
    x = jax.random.normal(ks[4], (3, 8, 4, 4, 4),
                          jnp.float32).astype(jnp.complex64)
    return lat, s, sf.to_fast(x, lat)


@pytest.mark.parametrize("parity", [0, 1])
def test_pallas_v1_matches_fast(setup, parity):
    lat, s, xf = setup
    ref = sf.dslash_fast(s, xf, parity)
    p1 = sp.new_pallas(s)
    got = sp.dslash_pallas_c(p1, xf, parity, interpret=True)
    dev = float(jnp.sum(jnp.abs(got - ref) ** 2)
                / jnp.sum(jnp.abs(ref) ** 2))
    assert dev < 1e-12


@pytest.mark.parametrize("parity", [0, 1])
def test_pallas_v3_matches_fast(setup, parity):
    lat, s, xf = setup
    ref = sf.dslash_fast(s, xf, parity)
    p3 = sp3.new_pallas3(s)
    got = sp3.dslash_pallas3_c(p3, xf, parity, interpret=True)
    dev = float(jnp.sum(jnp.abs(got - ref) ** 2)
                / jnp.sum(jnp.abs(ref) ** 2))
    assert dev < 1e-12


def test_pallas_v3_d2ee_matches_fast(setup):
    lat, s, xf = setup
    m = 0.25
    ref = sf.d2ee_fast(s, xf, m)
    p3 = sp3.new_pallas3(s)
    got = sp3._join(sp3.d2ee_pallas3(p3, sp3._split(xf), m,
                                     interpret=True))
    dev = float(jnp.sum(jnp.abs(got - ref) ** 2)
                / jnp.sum(jnp.abs(ref) ** 2))
    assert dev < 1e-12


def test_pallas_v3_d2dd_matches_fast(setup):
    """Mass-free multishift base -D_eo D_oe (solve_multi path)."""
    lat, s, xf = setup
    ref = sf.d2dd_fast(s, xf, 0)
    p3 = sp3.new_pallas3(s)
    got = sp3._join(sp3.d2dd_pallas3(p3, sp3._split(xf), 0,
                                     interpret=True))
    dev = float(jnp.sum(jnp.abs(got - ref) ** 2)
                / jnp.sum(jnp.abs(ref) ** 2))
    assert dev < 1e-12


# --- fat+naik (HISQ) 16-term kernel ----------------------------------------

@pytest.fixture(scope="module")
def setup3():
    from qex_tpu.gauge import fat7
    from qex_tpu.physics import stag_pallas_hisq as sph
    lat = Lattice((8, 4, 4, 8))
    key = jax.random.PRNGKey(11)
    ks = jax.random.split(key, 5)
    u = jnp.stack([
        linalg.expm(0.7 * group.random_tah(ks[i], lat.dims, lat.nc,
                                           jnp.complex64))
        for i in range(4)])
    g = st.phase_links(lat, u)
    fl, ll = fat7.hisq_links(lat, g, proj_iters=10)
    f3 = sf.new_fast3(st.new_stag3_eo(lat, fl, ll))
    x = jax.random.normal(ks[4], (3, 8, 4, 4, 4),
                          jnp.float32).astype(jnp.complex64)
    return lat, f3, sph.new_pallas_hisq(f3), sf.to_fast(x, lat)


@pytest.mark.parametrize("parity", [0, 1])
def test_pallas_hisq_matches_fast3(setup3, parity):
    from qex_tpu.physics import stag_pallas_hisq as sph
    lat, f3, p3, xf = setup3
    ref = sf.dslash3_fast(f3, xf, parity)
    got = sph.dslash_pallas_hisq_c(p3, xf, parity, interpret=True)
    dev = float(jnp.sum(jnp.abs(got - ref) ** 2)
                / jnp.sum(jnp.abs(ref) ** 2))
    assert dev < 1e-12


def test_pallas_hisq_zblocked_and_d2(setup3):
    """Split z grid (nzb=2 -> full-Z fallback; nzb exact divisor) and
    the d2ee/d2dd wrappers used by the HISQ action/multishift."""
    from qex_tpu.physics import stag_pallas_hisq as sph
    lat, f3, p3, xf = setup3
    xs = sph._split(xf)
    ref = sf.dslash3_fast(f3, xf, 0)
    for nzb in (2, 4):  # 2 -> _pick_nzb falls back to full Z
        got = sph._join(sph.dslash_pallas_hisq(p3, xs, 0, nzb=nzb,
                                               interpret=True))
        dev = float(jnp.sum(jnp.abs(got - ref) ** 2)
                    / jnp.sum(jnp.abs(ref) ** 2))
        assert dev < 1e-12, nzb
    m = 0.2
    refee = sf.d2ee3_fast(f3, xf, m)
    gotee = sph._join(sph.d2ee_pallas_hisq(p3, xs, m, interpret=True))
    dev = float(jnp.sum(jnp.abs(gotee - refee) ** 2)
                / jnp.sum(jnp.abs(refee) ** 2))
    assert dev < 1e-12
    refdd = sf.d2dd3_fast(f3, xf, 0)
    gotdd = sph._join(sph.d2dd_pallas_hisq(p3, xs, 0, interpret=True))
    dev = float(jnp.sum(jnp.abs(gotdd - refdd) ** 2)
                / jnp.sum(jnp.abs(refdd) ** 2))
    assert dev < 1e-12


def test_pallas_stag8_matches_fast(setup):
    """8-term plain-staggered variant of the streamed kernel
    (new_pallas_stag8: no naik terms, no tmm/tpp streams)."""
    from qex_tpu.physics import stag_pallas_hisq as sph
    lat, s, xf = setup
    p8 = sph.new_pallas_stag8(s)
    for parity in (0, 1):
        ref = sf.dslash_fast(s, xf, parity)
        got = sph.dslash_pallas_hisq_c(p8, xf, parity, interpret=True)
        dev = float(jnp.sum(jnp.abs(got - ref) ** 2)
                    / jnp.sum(jnp.abs(ref) ** 2))
        assert dev < 1e-12, (parity, dev)
    m = 0.25
    ref = sf.d2ee_fast(s, xf, m)
    got = sph._join(sph.d2ee_pallas_hisq(p8, sph._split(xf), m,
                                         interpret=True))
    dev = float(jnp.sum(jnp.abs(got - ref) ** 2)
                / jnp.sum(jnp.abs(ref) ** 2))
    assert dev < 1e-12

def test_pallas_hisq_auto_nzb(setup3):
    """nzb=None auto mode: _pick_nzb must choose a valid divisor both
    when the full-Z working set fits (small lattice -> full Z) and
    when the estimate overflows (forced tiny budget -> largest fitting
    divisor >= 3), and the kernel must stay exact either way."""
    from qex_tpu.physics import stag_pallas_hisq as sph
    lat, f3, p3, xf = setup3
    xs = sph._split(xf)
    ref = sf.dslash3_fast(f3, xf, 0)
    got = sph._join(sph.dslash_pallas_hisq(p3, xs, 0, nzb=None,
                                           interpret=True))
    dev = float(jnp.sum(jnp.abs(got - ref) ** 2)
                / jnp.sum(jnp.abs(ref) ** 2))
    assert dev < 1e-12

    # direct _pick_nzb unit checks (auto path divisor selection)
    assert sph._pick_nzb(4, None, 16, 10) == 4       # fits -> full Z
    big = 81 * 1024 * 1024
    assert sph._pick_nzb(12, None, 1, big // 12) in (3, 4, 6)
    # overflow with Z % 8 != 0: must pick a real divisor, never 8
    n = sph._pick_nzb(20, None, 1, big // 10)
    assert 20 % n == 0 and n >= 3 and n < 20
    # overflow, no divisor >= 3 fits -> full Z fallback
    assert sph._pick_nzb(4, None, 1, big) == 4
