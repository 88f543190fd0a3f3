"""Kinematics tests: URDF parsing + FK/Jacobian correctness on the Panda
(reference validation strategy: SURVEY.md §7.1 step 2)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maniskill_tpu.kinematics import chain
from maniskill_tpu.kinematics.urdf import parse_urdf

from maniskill_tpu.utils.assets import ASSET_DIR
PANDA = str(ASSET_DIR / "robots/panda/panda_v2.urdf")


@pytest.fixture(scope="module")
def spec():
    return parse_urdf(PANDA)


def test_panda_structure(spec):
    assert spec.nb == 9  # 7 arm + 2 fingers
    assert spec.joint_names[:7] == [f"panda_joint{i}" for i in range(1, 8)]
    assert "panda_hand_tcp" in spec.frames
    assert "panda_leftfinger_pad" in spec.frames
    # fused hand mass folded into link7's body
    assert spec.mass[6] > 1.0


def test_panda_fk_home(spec):
    """Known Franka fact: flange (link8) at q=0 sits at [0.088, 0, 0.926]."""
    base = jnp.array([0, 0, 0, 1, 0, 0, 0], jnp.float32)
    bp, bq, _ = chain.fk(spec, base, jnp.zeros(9))
    p8, _ = chain.frame_pose(spec, base, bp, bq, "panda_link8")
    assert np.allclose(np.asarray(p8), [0.088, 0.0, 0.926], atol=1e-5)


def test_fk_base_offset(spec):
    base = jnp.array([-0.6, 0.1, 0.2, 1, 0, 0, 0], jnp.float32)
    bp, bq, _ = chain.fk(spec, base, jnp.zeros(9))
    p8, _ = chain.frame_pose(spec, base, bp, bq, "panda_link8")
    assert np.allclose(np.asarray(p8), [0.088 - 0.6, 0.1, 0.926 + 0.2], atol=1e-5)


def test_jacobian_matches_autodiff(spec):
    base = jnp.array([0, 0, 0, 1, 0, 0, 0], jnp.float32)
    q0 = jnp.array([0.3, -0.4, 0.2, -1.8, 0.1, 2.0, 0.5, 0.02, 0.02])

    def tcp(q):
        bp, bq, _ = chain.fk(spec, base, q)
        p, _ = chain.frame_pose(spec, base, bp, bq, "panda_hand_tcp")
        return p

    J_auto = jax.jacfwd(tcp)(q0)
    bp, bq, ax = chain.fk(spec, base, q0)
    anc = np.zeros((spec.nb, spec.nb), np.float32)
    for b in range(spec.nb):
        j = b
        while j >= 0:
            anc[b, j] = 1.0
            j = int(spec.parent[j])
    body, off_p, _ = spec.frame_of("panda_hand_tcp")
    from maniskill_tpu.math.rotations import quat_apply

    pt = bp[body] + quat_apply(bq[body], jnp.asarray(off_p, jnp.float32))
    J = chain.point_jacobian(spec, bp, ax, pt, body, np.arange(9), anc)
    assert np.allclose(np.asarray(J[3:]), np.asarray(J_auto), atol=1e-4)


def test_dls_ik_converges(spec):
    """Iterated delta-IK reaches a nearby target position."""
    base = jnp.array([0, 0, 0, 1, 0, 0, 0], jnp.float32)
    q = jnp.array([0.0, -np.pi / 8, 0, -np.pi * 5 / 8, 0, np.pi * 3 / 4,
                   np.pi / 4, 0.04, 0.04])
    anc = np.zeros((spec.nb, spec.nb), np.float32)
    for b in range(spec.nb):
        j = b
        while j >= 0:
            anc[b, j] = 1.0
            j = int(spec.parent[j])
    body, off_p, _ = spec.frame_of("panda_hand_tcp")
    from maniskill_tpu.math.rotations import quat_apply

    def tcp(qq):
        bp, bq, ax = chain.fk(spec, base, qq)
        return bp[body] + quat_apply(bq[body], jnp.asarray(off_p, jnp.float32)), (bp, ax)

    p0, _ = tcp(q)
    target = p0 + jnp.array([0.05, -0.04, 0.06])
    arm = np.arange(7)
    for _ in range(20):
        p, (bp, ax) = tcp(q)
        J = chain.point_jacobian(spec, bp, ax, p, body, arm, anc)
        dq = chain.dls_ik_delta(J[3:], target - p, damping=0.05)
        q = q.at[arm].add(dq)
    p_final, _ = tcp(q)
    assert np.linalg.norm(np.asarray(p_final - target)) < 1e-3


def test_collision_primitives_parsed(spec):
    # Panda URDF ships 4 collision boxes per finger
    lf = spec.link_index["panda_leftfinger"]
    assert len(spec.body_collisions[lf]) == 4
    assert all(c[1] == "box" for c in spec.body_collisions[lf])
