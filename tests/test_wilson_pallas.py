"""Fused Wilson Pallas kernel vs the XLA fast-layout oracle (interpret
mode on the CPU mesh).

The 8-term spin-projected hopping kernel (wilson_pallas) is the TPU hot
path of Wilson CGNE solves (QEX wilsonD.nim:58-143 role).
"""

import jax
import jax.numpy as jnp
import pytest

from qex_tpu.lattice import Lattice
from qex_tpu.ops import group, linalg
from qex_tpu.physics import stag_fast as sf
from qex_tpu.physics import wilson as wl
from qex_tpu.physics import wilson_fast as wf
from qex_tpu.physics import wilson_pallas as wp


@pytest.fixture(scope="module")
def setup():
    lat = Lattice((6, 4, 4, 8))
    key = jax.random.PRNGKey(4)
    ks = jax.random.split(key, 5)
    u = jnp.stack([
        linalg.expm(0.7 * group.random_tah(ks[i], lat.dims, lat.nc,
                                           jnp.complex64))
        for i in range(4)])
    w = wl.new_wilson_eo(lat, u, m=0.1)
    fw = wf.new_fast_wilson(w)
    x = jax.random.normal(ks[4], (4, 3, 6, 4, 4, 4),
                          jnp.float32).astype(jnp.complex64)
    return lat, fw, sf.to_fast(x, lat)


@pytest.mark.parametrize("parity", [0, 1])
def test_hop_matches_fast(setup, parity):
    lat, fw, xf = setup
    ref = wf.hop_fast(fw, xf, parity)
    p = wp.new_pallas_wilson(fw)
    got = wp.hop_pallas_w_c(p, xf, parity, interpret=True)
    dev = float(jnp.sum(jnp.abs(got - ref) ** 2)
                / jnp.sum(jnp.abs(ref) ** 2))
    assert dev < 1e-12


def test_m_ee_and_dag_match_fast(setup):
    lat, fw, xf = setup
    p = wp.new_pallas_wilson(fw)
    xs = wp._split(xf)
    ref = wf.m_ee_fast(fw, xf)
    got = wp._join(wp.m_ee_pallas(p, xs, interpret=True))
    dev = float(jnp.sum(jnp.abs(got - ref) ** 2)
                / jnp.sum(jnp.abs(ref) ** 2))
    assert dev < 1e-11
    refd = wf.m_ee_dag_fast(fw, xf)
    gotd = wp._join(wp.m_ee_dag_pallas(p, xs, interpret=True))
    devd = float(jnp.sum(jnp.abs(gotd - refd) ** 2)
                 / jnp.sum(jnp.abs(refd) ** 2))
    assert devd < 1e-11


def test_odd_z_single_block(setup):
    # Z not divisible by the default z-block -> single full-Z block
    # (periodic in-block wrap), e.g. 4^3 x 8 halved t
    lat = Lattice((4, 4, 4, 8))
    key = jax.random.PRNGKey(9)
    ks = jax.random.split(key, 5)
    u = jnp.stack([
        linalg.expm(0.5 * group.random_tah(ks[i], lat.dims, lat.nc,
                                           jnp.complex64))
        for i in range(4)])
    w = wl.new_wilson_eo(lat, u, m=0.2)
    fw = wf.new_fast_wilson(w)
    x = jax.random.normal(ks[4], (4, 3, 4, 4, 4, 4),
                          jnp.float32).astype(jnp.complex64)
    xf = sf.to_fast(x, lat)
    p = wp.new_pallas_wilson(fw)
    ref = wf.hop_fast(fw, xf, 0)
    got = wp.hop_pallas_w_c(p, xf, 0, interpret=True)
    dev = float(jnp.sum(jnp.abs(got - ref) ** 2)
                / jnp.sum(jnp.abs(ref) ** 2))
    assert dev < 1e-12


def test_zblocked_matches_fullz():
    """nz > 1 (zm/zp neighbor streams live) vs one full-Z block
    (streams dropped, nzb=None) -- both against the XLA oracle."""
    lat = Lattice((4, 4, 8, 8))
    key = jax.random.PRNGKey(14)
    ks = jax.random.split(key, 5)
    u = jnp.stack([
        linalg.expm(0.6 * group.random_tah(ks[i], lat.dims, lat.nc,
                                           jnp.complex64))
        for i in range(4)])
    w = wl.new_wilson_eo(lat, u, m=0.15)
    fw = wf.new_fast_wilson(w)
    x = jax.random.normal(ks[4], (4, 3, 4, 4, 8, 4),
                          jnp.float32).astype(jnp.complex64)
    xf = sf.to_fast(x, lat)
    p = wp.new_pallas_wilson(fw)
    xs = wp._split(xf)
    ref = wf.hop_fast(fw, xf, 1)
    for nzb in (4, None):  # 4 -> nz=2 (streams); None -> full Z
        got = wp._join(wp.hop_pallas_w(p, xs, 1, nzb=nzb,
                                       interpret=True))
        dev = float(jnp.sum(jnp.abs(got - ref) ** 2)
                    / jnp.sum(jnp.abs(ref) ** 2))
        assert dev < 1e-12, nzb


def test_pick_nzb_auto():
    """Full-Z when the double-buffered block fits VMEM, else 8."""
    assert wp.pick_nzb_auto(Lattice((24, 24, 24, 32))) is None
    assert wp.pick_nzb_auto(Lattice((24, 24, 24, 32)),
                            jnp.bfloat16) is None
    # 64^3 slab: (8*72 + 4*96)*64*4096*2 bytes ~ 0.5 GB >> budget
    assert wp.pick_nzb_auto(Lattice((64, 64, 64, 64))) == 8
