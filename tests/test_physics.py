"""Physics engine validation: analytic dynamics, stability, API parity.

Mirrors the test strategy SURVEY.md §4 prescribes for the new framework:
free-fall/pendulum analytics, standing stability under PD, dof-view round
trips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ase_tpu.physics import dynamics, engine, mjcf
from ase_tpu.physics import model as M

import os as _os
_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))

ASSET = _REPO + "/data/assets/mjcf/amp_humanoid_sword_shield.xml"


@pytest.fixture(scope="module")
def humanoid():
    return mjcf.load_mjcf(ASSET)


@pytest.fixture(scope="module")
def stepper(humanoid):
    cfg = engine.SimConfig(enable_self_collision=False, max_contacts=24)
    from ase_tpu.physics import collision2
    tables = collision2.build_tables(humanoid, False)
    return jax.jit(lambda s, a: engine.step(humanoid, cfg, tables, s, a))


def test_model_matches_reference_dof_tables(humanoid):
    # reference humanoid.py:190-195
    assert humanoid.dof_body_ids == (1, 2, 3, 4, 5, 7, 8, 11, 12, 13, 14, 15, 16)
    assert humanoid.dof_offsets == (0, 3, 6, 9, 10, 13, 16, 17, 20, 21, 24, 27, 28, 31)
    assert humanoid.nd == 31
    assert humanoid.nb == 17


def test_free_fall(humanoid, stepper):
    st = dynamics.default_state(humanoid)
    st = st._replace(root_pos=jnp.array([0.0, 0.0, 50.0]))
    s = st
    n = 30
    for _ in range(n):
        s = stepper(s, jnp.zeros(humanoid.nd)).state
    # semi-implicit Euler at the substep rate: z = z0 - g h^2 (1+2+...+N)
    h = (1.0 / 60.0) / 2
    N = n * 2
    expected = 50.0 - 9.81 * h * h * (N * (N + 1) / 2)
    np.testing.assert_allclose(float(s.root_pos[2]), expected, atol=1e-3)
    np.testing.assert_allclose(float(s.u[2]), -9.81 * h * N, atol=1e-3)


def test_standing_stability(humanoid, stepper):
    st = dynamics.default_state(humanoid)
    st = st._replace(root_pos=jnp.array([0.0, 0.0, 0.89]))
    s = st
    out = None
    for _ in range(120):
        out = stepper(s, jnp.zeros(humanoid.nd))
        s = out.state
    assert bool(jnp.all(jnp.isfinite(s.u)))
    assert 0.8 < float(s.root_pos[2]) < 0.95, "humanoid should remain standing"
    assert float(jnp.abs(s.u).max()) < 0.5, "should come to rest"
    total_fz = float(out.contact_forces[:, 2].sum())
    weight = float(humanoid.mass.sum()) * 9.81
    np.testing.assert_allclose(total_fz, weight, rtol=0.05)


def test_dof_state_roundtrip(humanoid):
    st = dynamics.default_state(humanoid)
    rng = jax.random.PRNGKey(0)
    dp = 0.4 * jax.random.normal(rng, (humanoid.nd,))
    dv = jax.random.normal(jax.random.PRNGKey(1), (humanoid.nd,))
    st2 = dynamics.set_dof_state(humanoid, st, dp, dv)
    got_p = dynamics.dof_pos(humanoid, st2)
    got_v = dynamics.dof_vel(humanoid, st2)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(dp), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(dv), atol=1e-6)


def test_mass_matrix_symmetric_posdef(humanoid):
    st = dynamics.default_state(humanoid)
    st = dynamics.set_dof_state(
        humanoid, st, 0.3 * jax.random.normal(jax.random.PRNGKey(2), (humanoid.nd,)),
        jnp.zeros(humanoid.nd))
    kin = dynamics.fk(humanoid, st)
    dyn = dynamics.compute_dynamics(humanoid, st, kin, 1.0 / 120.0)
    Mm = np.asarray(dyn.Mmat)
    np.testing.assert_allclose(Mm, Mm.T, atol=1e-4)
    eig = np.linalg.eigvalsh(Mm)
    assert eig.min() > 0, f"mass matrix not PD, min eig {eig.min()}"
    # total mass appears in the translational block
    np.testing.assert_allclose(Mm[0, 0], float(humanoid.mass.sum()), rtol=1e-3)


def test_velocity_fk_consistency(humanoid):
    """Body velocities from FK equal Phi @ u (Jacobian consistency)."""
    st = dynamics.default_state(humanoid)
    st = dynamics.set_dof_state(
        humanoid, st,
        0.3 * jax.random.normal(jax.random.PRNGKey(3), (humanoid.nd,)),
        jax.random.normal(jax.random.PRNGKey(4), (humanoid.nd,)))
    st = dynamics.set_root_state(
        st, jnp.array([0.1, -0.2, 1.0]),
        st.root_quat, jnp.array([1.0, 2.0, 3.0]), jnp.array([0.3, -0.2, 0.1]))
    kin = dynamics.fk(humanoid, st)
    Phi, _ = dynamics.motion_subspace(humanoid, kin, st.root_pos)
    A = dynamics.ancestor_mask(humanoid)
    u = np.asarray(st.u[: humanoid.nu])
    v_sp = np.einsum("bd,dk->bk", A, np.asarray(Phi) * u[:, None])
    for b in range(humanoid.nb):
        w_fk = np.asarray(kin.body_vel[b][0:3])
        v_fk_origin = np.asarray(kin.body_vel[b][3:6])
        # spatial velocity at root ref point -> velocity at body origin
        lever = np.asarray(st.root_pos - kin.body_pos[b])
        v_at_origin = v_sp[b, 3:6] - np.cross(v_sp[b, 0:3], lever)
        np.testing.assert_allclose(v_sp[b, 0:3], w_fk, atol=1e-4)
        np.testing.assert_allclose(v_at_origin, v_fk_origin, atol=1e-4)


def test_pendulum_energy():
    """A single-hinge pendulum (built from a minimal MJCF) conserves energy
    with no damping/contacts and matches the analytic small-angle period."""
    import tempfile, os
    xml = """
<mujoco model="pend">
  <worldbody>
    <body name="anchor" pos="0 0 2">
      <geom type="sphere" size="0.01" density="100"/>
      <body name="rod" pos="0 0 0">
        <joint name="swing" type="hinge" axis="0 1 0" range="-180 180"
               stiffness="0" damping="0" armature="0"/>
        <geom type="capsule" fromto="0 0 0 0 0 -1.0" size="0.02" density="1000"/>
      </body>
    </body>
  </worldbody>
</mujoco>
"""
    with tempfile.NamedTemporaryFile("w", suffix=".xml", delete=False) as f:
        f.write(xml)
        path = f.name
    try:
        m = mjcf.load_mjcf(path)
    finally:
        os.unlink(path)
    # pin the base by making it enormously heavy (freejoint base barely moves)
    cfg = engine.SimConfig(dt=1.0 / 600.0, substeps=1, enable_self_collision=False,
                           max_contacts=4, torque_control=True)
    from ase_tpu.physics import collision2
    tables = collision2.build_tables(m, False)
    step = jax.jit(lambda s, a: engine.step(m, cfg, tables, s, a))
    st = dynamics.default_state(m)
    theta0 = 0.1
    st = dynamics.set_dof_state(m, st, jnp.array([theta0]), jnp.zeros(1))

    # record the swing: find first return to positive velocity crossing
    thetas = []
    s = st
    for i in range(1400):
        s = step(s, jnp.zeros(m.nd)).state
        thetas.append(float(dynamics.dof_pos(m, s)[0]))
    thetas = np.asarray(thetas)
    # physical pendulum: uniform rod+cap about pivot; measure period via zero
    # crossings of (theta - mean)
    centered = thetas - thetas.mean()
    crossings = np.where(np.diff(np.sign(centered)) != 0)[0]
    assert len(crossings) >= 2, "pendulum did not oscillate"
    period = 2.0 * np.diff(crossings).mean() * (1.0 / 600.0)
    # analytic: T = 2 pi sqrt(I_pivot / (m g d_com))
    mass = float(m.mass[1])
    com_d = abs(float(m.com[1][2]))
    I_p = float(m.inertia[1][1, 1]) + mass * com_d**2
    T_analytic = 2 * np.pi * np.sqrt(I_p / (mass * 9.81 * com_d))
    np.testing.assert_allclose(period, T_analytic, rtol=0.05)
    # amplitude roughly conserved (no damping)
    late_amp = np.abs(centered[-400:]).max()
    np.testing.assert_allclose(late_amp, np.abs(centered[:400]).max(), rtol=0.1)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def test_random_action_stress_self_collision(humanoid):
    """Regression: self-collision used to pump joint velocities past the
    explicit-integrator stability limit (~2/h rad/s) and NaN out; the
    per-substep joint dof rate clamp (SimConfig.max_dof_vel, PhysX
    maxJointVelocity parity) bounds the gyroscopic bias terms."""
    cfg = engine.SimConfig(enable_self_collision=True, max_contacts=24)
    bstep = jax.jit(engine.make_batched_step(humanoid, cfg))
    B = 4
    st = engine.batch_default_state(humanoid, B)
    st = st._replace(root_pos=st.root_pos.at[:, 2].set(0.89))
    lo = jnp.asarray(humanoid.dof_limit_lo)
    hi = jnp.asarray(humanoid.dof_limit_hi)
    off, sc = (hi + lo) / 2, (hi - lo) / 2
    k = jax.random.PRNGKey(7)
    for _ in range(90):
        k, kk = jax.random.split(k)
        tgt = off[None] + sc[None] * jax.random.uniform(
            kk, (B, humanoid.nd), minval=-1.0, maxval=1.0
        )
        st = bstep(st, tgt).state
    assert bool(jnp.all(jnp.isfinite(st.u)))
    joint_u = jnp.abs(st.u[:, 6:])
    assert float(joint_u.max()) <= cfg.max_dof_vel + 1e-3


def test_joint_batched_actuation_matches_loop(humanoid):
    """pd/limit/dof_pos *_batched (one stacked-joint kernel chain) reproduce
    the per-joint loop functions exactly (engine default vs ASE_TPU_PD_AOS)."""
    model = humanoid
    B = 5
    rng = jax.random.PRNGKey(3)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    one = dynamics.default_state(model)
    import ase_tpu.ops.quat as rot

    states = dynamics.State(
        root_pos=jax.random.normal(k1, (B, 3)),
        root_quat=rot.quat_unit(jax.random.normal(k2, (B, 4))),
        joint_q=rot.quat_unit(jax.random.normal(k3, (B,) + one.joint_q.shape)),
        hinge_q=0.5 * jax.random.normal(k4, (B,) + one.hinge_q.shape),
        u=0.3 * jax.random.normal(k1, (B, model.nv)),
        prop_pos=jnp.tile(one.prop_pos[None], (B, 1, 1)),
        prop_quat=jnp.tile(one.prop_quat[None], (B, 1, 1)),
    )
    targets = 0.4 * jax.random.normal(k2, (B, model.nd))
    dt = 1.0 / 120.0
    kd_scale = jnp.linspace(0.5, 1.5, B)

    q_ref = jax.vmap(lambda s: dynamics.dof_pos(model, s))(states)
    np.testing.assert_allclose(
        np.asarray(dynamics.dof_pos_batched(model, states)), np.asarray(q_ref),
        atol=1e-6)

    tau_ref = jax.vmap(lambda s, a: dynamics.pd_torques(model, s, a, dt))(
        states, targets)
    np.testing.assert_allclose(
        np.asarray(dynamics.pd_torques_batched(model, states, targets, dt)),
        np.asarray(tau_ref), rtol=1e-5, atol=1e-4)

    tau_ks_ref = jax.vmap(
        lambda s, a, ks: dynamics.pd_torques(model, s, a, dt, kd_scale=ks)
    )(states, targets, kd_scale)
    np.testing.assert_allclose(
        np.asarray(dynamics.pd_torques_batched(
            model, states, targets, dt, kd_scale=kd_scale)),
        np.asarray(tau_ks_ref), rtol=1e-5, atol=1e-4)

    lim_ref = jax.vmap(lambda s: dynamics.limit_torques(model, s, 200.0))(states)
    np.testing.assert_allclose(
        np.asarray(dynamics.limit_torques_batched(model, states, 200.0)),
        np.asarray(lim_ref), rtol=1e-5, atol=1e-4)
