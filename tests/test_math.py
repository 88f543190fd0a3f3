"""Math core tests: quaternion/pose semantics (reference contract:
``mani_skill/utils/geometry/rotation_conversions.py``,
``mani_skill/utils/structs/pose.py``)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maniskill_tpu.math import (
    Pose,
    matrix_to_quat,
    quat_apply,
    quat_exp,
    quat_from_axis_angle,
    quat_from_euler,
    quat_log,
    quat_mul,
    quat_to_matrix,
    random_quaternion,
)


def test_quat_mul_identity():
    q = random_quaternion(jax.random.key(0), (5,))
    e = jnp.array([1.0, 0, 0, 0])
    assert jnp.allclose(quat_mul(e, q), q, atol=1e-6)
    assert jnp.allclose(quat_mul(q, jnp.broadcast_to(e, q.shape)), q, atol=1e-6)


def test_quat_matrix_roundtrip():
    q = random_quaternion(jax.random.key(1), (32,))
    m = quat_to_matrix(q)
    q2 = matrix_to_quat(m)
    # sign-canonical comparison
    q_canon = jnp.where(q[..., :1] < 0, -q, q)
    assert jnp.allclose(q_canon, q2, atol=1e-5)


def test_quat_apply_matches_matrix():
    q = random_quaternion(jax.random.key(2), (8,))
    v = jax.random.normal(jax.random.key(3), (8, 3))
    out1 = quat_apply(q, v)
    out2 = jnp.einsum("bij,bj->bi", quat_to_matrix(q), v)
    assert jnp.allclose(out1, out2, atol=1e-5)


def test_exp_log_roundtrip():
    w = jax.random.normal(jax.random.key(4), (16, 3)) * 0.5
    assert jnp.allclose(quat_log(quat_exp(w)), w, atol=1e-5)


def test_axis_angle():
    q = quat_from_axis_angle(jnp.array([0.0, 0, 1.0]), jnp.pi / 2)
    v = quat_apply(q, jnp.array([1.0, 0, 0]))
    assert jnp.allclose(v, jnp.array([0.0, 1.0, 0]), atol=1e-6)


def test_urdf_rpy_convention():
    # rpy = extrinsic XYZ: R = Rz(y)Ry(p)Rx(r)
    q = quat_from_euler(jnp.array([0.1, 0.2, 0.3]))
    Rz = quat_to_matrix(quat_from_axis_angle(jnp.array([0.0, 0, 1]), 0.3))
    Ry = quat_to_matrix(quat_from_axis_angle(jnp.array([0.0, 1, 0]), 0.2))
    Rx = quat_to_matrix(quat_from_axis_angle(jnp.array([1.0, 0, 0]), 0.1))
    assert jnp.allclose(quat_to_matrix(q), Rz @ Ry @ Rx, atol=1e-6)


def test_pose_compose_inverse():
    key = jax.random.key(5)
    p = Pose.create(
        p=jax.random.normal(key, (4, 3)),
        q=random_quaternion(jax.random.key(6), (4,)),
    )
    ident = p * p.inv()
    assert jnp.allclose(ident.p, 0, atol=1e-5)
    assert jnp.allclose(jnp.abs(ident.q[..., 0]), 1, atol=1e-5)


def test_pose_matrix_matches_mul():
    pa = Pose.create(p=jnp.array([1.0, 2, 3]),
                     q=quat_from_axis_angle(jnp.array([0.0, 0, 1]), 0.7))
    pb = Pose.create(p=jnp.array([0.5, -1, 2]),
                     q=quat_from_axis_angle(jnp.array([1.0, 0, 0]), -0.3))
    m = pa.to_matrix() @ pb.to_matrix()
    assert jnp.allclose((pa * pb).to_matrix(), m, atol=1e-5)


def test_pose_broadcast():
    # reference Pose.create_from_pq auto-broadcasts batch dims (pose.py:87)
    p = Pose.create(p=jnp.zeros((8, 3)), q=jnp.array([1.0, 0, 0, 0]))
    assert p.batch_shape == (8,)
