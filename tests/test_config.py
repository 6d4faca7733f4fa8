"""Config-system tests: XML deck parsing (reference tag parity), JSON
decks, CLI params, JSON theory builder."""

import json
import textwrap

import numpy as np
import pytest

from qex_tpu.utils.config import FlowConfig, HMCConfig
from qex_tpu.utils.params import Params


def test_xml_deck_parsing(tmp_path):
    xml = textwrap.dedent("""\
    <?xml version="1.0"?>
    <qex>
      <hmc><tau>0.7</tau><g_steps>12</g_steps><f_steps>6</f_steps>
           <gauge_int_alg>4MN5FV</gauge_int_alg>
           <no_metropolis_until>3</no_metropolis_until></hmc>
      <action>
        <geom><Ns>8</Ns><Nt>16</Nt><num_Ns>3</num_Ns><num_Nt>1</num_Nt>
              <bc>aaaa</bc></geom>
        <gauge><gauge_act>rect</gauge_act><beta>6.2</beta>
               <rect><c1>-0.331</c1></rect></gauge>
        <ferm><Nf>8</Nf><mass>0.05</mass></ferm>
        <pv><num_pv>4</num_pv><mass_pv>0.75</mass_pv></pv>
      </action>
      <smearing><gauge_smearing>nhyp</gauge_smearing>
        <matter_smearing>nhyp</matter_smearing>
        <nhyp_smearing><alpha_1>0.4</alpha_1><alpha_2>0.5</alpha_2>
          <alpha_3>0.5</alpha_3></nhyp_smearing></smearing>
    </qex>
    """)
    p = tmp_path / "deck.xml"
    p.write_text(xml)
    c = HMCConfig.from_xml(str(p))
    assert c.tau == 0.7
    assert c.g_steps == 12 and c.f_steps == 6
    assert c.gauge_int_alg == "4MN5FV"
    assert c.dims == (8, 8, 8, 16)
    assert c.bc == "aaaa"
    assert c.gauge_act == "rect" and c.c1 == -0.331
    assert c.nf == 8 and c.num_pv == 4
    assert c.alpha_1 == 0.4


def test_reference_xml_deck_parses():
    """The reference's shipped input_hmc.xml (with placeholders
    substituted) must parse unchanged."""
    import re
    src = open("/root/reference/src/stagg_pv_hmc/input_hmc.xml").read()
    src = re.sub(r">_[a-zA-Z0-9]+_<", ">1<", src)
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".xml",
                                     delete=False) as f:
        f.write(src)
        path = f.name
    c = HMCConfig.from_xml(path)
    assert c.gauge_int_alg == "2MN"
    assert c.rng_type == "RngMilc6"


def test_sloppy_solve_key(tmp_path):
    """<solver><sloppy_solve> reaches SolverParams.sloppy (the QEX
    SolverParams.sloppySolve knob, solverBase.nim:8-15)."""
    xml = textwrap.dedent("""\
    <?xml version="1.0"?>
    <qex>
      <action>
        <geom><Ns>4</Ns><Nt>4</Nt></geom>
        <gauge><beta>5.0</beta></gauge>
        <ferm><Nf>4</Nf><mass>0.1</mass></ferm>
      </action>
      <solver><sloppy_solve>1</sloppy_solve></solver>
    </qex>
    """)
    p = tmp_path / "deck.xml"
    p.write_text(xml)
    c = HMCConfig.from_xml(str(p))
    assert c.sloppy_solve == 1

    import jax.numpy as jnp
    from qex_tpu.apps.staghmc_spv import build_theory
    from qex_tpu.lattice import Lattice
    theory = build_theory(c, Lattice(c.dims), jnp.complex128)
    assert theory.solver_params.sloppy is True
    assert theory.force_solver_params.sloppy is True


def test_config_overrides():
    c = HMCConfig()
    c.override({"beta": "6.5", "nf": "4"})
    assert c.beta == 6.5 and c.nf == 4
    with pytest.raises(KeyError):
        c.override({"bogus": "1"})


def test_params_cli():
    prm = Params(argv=["-beta:6.0", "-lat:8,8,8,16", "-name:run1",
                       "-verbose:true", "-unusedkey:3"])
    assert prm.float_param("beta", 5.5, "coupling") == 6.0
    assert prm.int_seq_param("lat", [4] * 4) == [8, 8, 8, 16]
    assert prm.str_param("name", "x") == "run1"
    assert prm.bool_param("verbose", False) is True
    assert prm.int_param("steps", 10) == 10  # default
    assert prm.unknown() == ["unusedkey"]
    assert "-beta:" in prm.help_text()


def test_params_loadfile(tmp_path):
    f = tmp_path / "p.txt"
    f.write_text("-beta:7.0\nsteps: 25\n# comment\n")
    prm = Params(argv=[f"-loadParams:{f}", "-beta:6.1"])
    # explicit CLI wins over file
    assert prm.float_param("beta", 5.0) == 6.1
    assert prm.int_param("steps", 10) == 25


def test_json_builder():
    from qex_tpu.mcmc.builder import theory_from_json
    deck = {
        "hmc": {"lattice-geometry": [4, 4, 4, 8],
                "trajectory-length": 0.5},
        "action": {"smearing": "nhyp",
                   "smearing-coefficients": [0.4, 0.5, 0.5],
                   "boundary-conditions": "pppa"},
        "gauge": {"action": "Adjoint", "adjoint-ratio": -0.25,
                  "beta": 11.1, "steps": 20, "integrator": "2MN"},
        "staggered-fermions": {"mass": 0.1, "steps": 30,
                               "integrator": "2MN", "species": 1},
        "rooted-staggered-fermions": {"nf": 2, "mass": 0.1,
                                      "steps": 30, "species": 0},
        "staggered-pauli-villars": {"mass": 0.75, "steps": 20,
                                    "species": 2},
    }
    lat, theory, meta = theory_from_json(deck)
    assert lat.dims == (4, 4, 4, 8)
    names = [t.name for t in theory.terms]
    assert names[0].startswith("gauge")
    assert sum("fermion" in n for n in names) == 1
    assert sum("boson" in n for n in names) == 2  # species: 2
    assert not any("rooted" in n for n in names)  # species: 0 disabled
    assert meta["tau"] == 0.5
    assert theory.gauges[0].coeffs.adjplaq == pytest.approx(-0.25 * 11.1)


def test_flow_xml():
    import re
    src = open("/root/reference/src/flow/input_gf.xml").read()
    src = re.sub(r">_[a-zA-Z0-9]+_<", ">8<", src)
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".xml",
                                     delete=False) as f:
        f.write(src)
        path = f.name
    c = FlowConfig.from_xml(path)
    assert c.ns == 8 and c.nt == 8
    assert len(c.segments) == 2


def test_json_builder_mpi_geometry():
    """Deck 'mpi-geometry' (mcmcTypes.nim:905-907) builds the device
    mesh; with mesh_to_solver the solves route through stag_shard, and
    one sharded gauge-only HMC step matches the replicated one."""
    import jax
    import jax.numpy as jnp

    from qex_tpu.mcmc.builder import theory_from_json
    from qex_tpu.ops import group
    from qex_tpu.parallel import shard_field

    deck = {
        "hmc": {"lattice-geometry": [4, 4, 4, 8],
                "mpi-geometry": [1, 1, 2, 4],
                "trajectory-length": 0.4},
        "gauge": {"action": "Wilson", "beta": 5.6, "steps": 6,
                  "integrator": "2MN"},
    }
    lat, theory, meta = theory_from_json(deck, mesh_to_solver=False)
    lm = meta["mesh"]
    assert lm is not None and lm.rank_geom == (1, 1, 2, 4)
    assert theory.solver_params.mesh is None  # mesh_to_solver=False

    u = group.unit_gauge(lat, jnp.complex128)
    key = jax.random.PRNGKey(3)
    step = jax.jit(lambda k, uu: theory.hmc_step(k, uu,
                                                 always_accept=True))
    u1, st1 = step(key, u)
    us = shard_field(lm, u, 3)
    u2, st2 = step(key, us)
    assert abs(float(st1.dH) - float(st2.dH)) < 1e-10
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2),
                               atol=1e-12)
