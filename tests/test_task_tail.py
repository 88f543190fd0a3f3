"""Tail tasks: tabletop extras, TriFinger levels, two-robot and YCB
variants, G1 apple-in-bowl, FMB assembly."""
import numpy as np
import pytest

import maniskill_tpu as mst

TAIL_ENVS = [
    "Empty-v1",
    "RollBall-v1",
    "PlaceSphere-v1",
    "PullCubeTool-v1",
    "TriFingerRotateCubeLevel0-v1",
    "TriFingerRotateCubeLevel4-v1",
    "TwoRobotPickCube-v1",
    "TwoRobotStackCube-v1",
    "PickSingleYCB-v1",
    "PickCubeYCB-v1",
    "TwoRobotPickCubeYCB-v1",
    "TwoRobotFold-v1",
    "UnitreeG1PlaceAppleInBowl-v1",
    "FMBAssembly1Easy-v1",
]


@pytest.mark.parametrize("env_id", TAIL_ENVS)
def test_tail_env_runs(env_id):
    env = mst.make(env_id, num_envs=2, obs_mode="state")
    obs, _ = env.reset(seed=0)
    assert np.all(np.isfinite(np.asarray(obs)))
    for _ in range(3):
        obs, rew, term, trunc, info = env.step(
            np.zeros((2, env.action_dim), np.float32)
        )
    assert np.all(np.isfinite(np.asarray(obs)))
    assert np.all(np.isfinite(np.asarray(rew)))
    assert "success" in info


def test_env_count_exceeds_reference():
    from maniskill_tpu.envs.registration import REGISTERED_ENVS

    # the reference tree has ~62 live @register_env ids (74 incl.
    # benchmark/template placeholders); the port should not regress
    assert len(REGISTERED_ENVS) >= 75


# every ACTIVE @register_env id in /root/reference/mani_skill/envs
# (73 unique; commented-out registrations — MS-CartPole, MS-Humanoid*Hard —
# excluded). Verified against the reference tree by regex extraction.
REFERENCE_ENV_IDS = [
    "AnymalC-Reach-v1", "AnymalC-Spin-v1", "ArchitecTHORManipulation-v1",
    "AssemblingKits-v1", "CustomEnv-v1", "DrawSVG-v1", "DrawTriangle-v1",
    "Empty-v1", "FMBAssembly1Easy-v1", "FoldSuitcase-v1",
    "LiftPegUpright-v1", "MS-AntRun-v1", "MS-AntWalk-v1",
    "MS-CartpoleBalance-v1", "MS-CartpoleSwingUp-v1", "MS-HopperHop-v1",
    "MS-HopperStand-v1", "MS-HumanoidRun-v1", "MS-HumanoidStand-v1",
    "MS-HumanoidWalk-v1", "MobileRMPick-v1", "OpenCabinetDoor-v1",
    "OpenCabinetDoorRealman-v1", "OpenCabinetDrawer-v1",
    "OpenCabinetDrawerRealman-v1", "PegInsertionSide-v1",
    "PickClutterYCB-v1", "PickCube-v1", "PickCubeYCB-v1",
    "PickSingleYCB-v1", "PlaceSphere-v1", "PlugCharger-v1", "PokeCube-v1",
    "PullCube-v1", "PullCubeTool-v1", "PushCube-v1", "PushT-v1",
    "PutCarrotOnPlateInScene-v1", "PutEggplantInBasketScene-v1",
    "PutSpoonOnTableClothInScene-v1", "RoboCasaKitchen-v1", "RollBall-v1",
    "RotateSingleObjectInHandLevel0-v1", "RotateSingleObjectInHandLevel1-v1",
    "RotateSingleObjectInHandLevel2-v1", "RotateSingleObjectInHandLevel3-v1",
    "RotateValveLevel0-v1", "RotateValveLevel1-v1", "RotateValveLevel2-v1",
    "RotateValveLevel3-v1", "RotateValveLevel4-v1", "SceneManipulation-v1",
    "StackCube-v1", "StackGreenCubeOnYellowCubeBakedTexInScene-v1",
    "TableTopFreeDraw-v1", "TriFingerRotateCubeLevel0-v1",
    "TriFingerRotateCubeLevel1-v1", "TriFingerRotateCubeLevel2-v1",
    "TriFingerRotateCubeLevel3-v1", "TriFingerRotateCubeLevel4-v1",
    "TurnFaucet-v1", "TwoRobotFold-v1", "TwoRobotPickCube-v1",
    "TwoRobotPickCubeYCB-v1", "TwoRobotStackCube-v1",
    "UnitreeG1PlaceAppleInBowl-v1", "UnitreeG1Stand-v1",
    "UnitreeG1TransportBox-v1", "UnitreeGo2-Reach-v1", "UnitreeH1Stand-v1",
]


def test_reference_env_id_parity():
    """Every active reference env id is registered here (PARITY.md §2.4)."""
    from maniskill_tpu.envs.registration import REGISTERED_ENVS

    missing = [e for e in REFERENCE_ENV_IDS if e not in REGISTERED_ENVS]
    assert not missing, f"reference env ids missing: {missing}"


def test_roll_ball_success_when_teleported():
    import jax.numpy as jnp

    env = mst.make("RollBall-v1", num_envs=1, obs_mode="none")
    env.reset(seed=0)
    st = env._state
    goal = np.asarray(st.sim.kin_pose[0, env.goal_region, :3])
    pose = jnp.asarray(np.concatenate(
        [goal[:2], [env.ball_radius], [1, 0, 0, 0]], dtype=np.float32))
    sim = st.sim.replace(
        free_pose=st.sim.free_pose.at[0, env.ball].set(pose),
        free_vel=st.sim.free_vel.at[0, env.ball].set(jnp.zeros(6)),
    )
    env._state = st.replace(sim=sim)
    _, _, _, _, info = env.step(np.zeros((1, env.action_dim), np.float32))
    assert bool(np.asarray(info["success"])[0])


def test_struct_views():
    """Actor/Articulation/Link struct-view surface (structs.py)."""
    import maniskill_tpu as mst

    env = mst.make("PickCube-v1", num_envs=2, obs_mode="none")
    env.reset(seed=0)
    sc = env.scene
    cube = sc.actors["cube"]
    assert cube.pose.p.shape == (2, 3)
    assert cube.get_state().shape == (2, 13)
    new = np.tile(np.array([0.2, 0.1, 0.4, 1, 0, 0, 0], np.float32), (2, 1))
    cube.set_pose(new)
    assert np.allclose(np.asarray(cube.raw_pose), new)
    rob = sc.articulations["robot"]
    assert rob.qpos.shape == (2, 9)
    hand = rob.links_map["panda_hand"]
    assert hand.pose.p.shape == (2, 3)
    finger = rob.links_map["panda_leftfinger"]
    assert (finger.bbox_half > 0).all()
