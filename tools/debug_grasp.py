"""Debug the scripted PickCube grasp under the velocity-level contact law."""
import jax
import numpy as np

import maniskill_tpu as mst
from maniskill_tpu.envs.base_env import TaskContext


def main():
    env = mst.make("PickCube-v1", num_envs=2, control_mode="pd_ee_delta_pos",
                   robot_init_qpos_noise=0.0)
    env.reset(seed=0)
    B = env.num_envs

    def act(dxyz, grip):
        a = np.zeros((B, env.action_dim), np.float32)
        a[:, :3] = dxyz
        a[:, 3] = grip
        return env.step(a)

    def tcp_cube():
        s = env._state
        tcp = np.asarray(jax.vmap(lambda st: TaskContext(env, st).tcp_pose.p)(s))
        idx = env.model.free_index["cube"]
        pos = np.asarray(s.sim.free_pose[:, idx, :3])
        return tcp, pos

    def servo(target_fn, steps, gain=3.0, grip=1.0):
        out = None
        for _ in range(steps):
            tcp, cube = tcp_cube()
            tgt = target_fn(tcp, cube)
            out = act(np.clip((tgt - tcp) * gain, -0.4, 0.4), grip)
        return out

    servo(lambda tcp, cube: np.concatenate(
        [cube[:, :2], np.full((B, 1), 0.10)], axis=1), steps=30)
    servo(lambda tcp, cube: np.concatenate(
        [cube[:, :2], np.full((B, 1), 0.05)], axis=1), steps=25)
    servo(lambda tcp, cube: np.concatenate(
        [cube[:, :2], np.full((B, 1), 0.022)], axis=1), steps=25, gain=2.0)
    tcp, cube = tcp_cube()
    print("pre-close tcp:", tcp, "\ncube:", cube)
    print("gripper q:", np.asarray(env._state.sim.qpos[:, -2:]))
    for i in range(8):
        act(np.zeros((B, 3), np.float32), grip=-1.0)
    tcp, cube = tcp_cube()
    print("post-close tcp:", tcp, "\ncube:", cube)
    print("gripper q:", np.asarray(env._state.sim.qpos[:, -2:]))
    # is_grasping?
    ctx0 = TaskContext(env, jax.tree.map(lambda x: x[0], env._state))
    try:
        print("grasping:", jax.vmap(
            lambda st: TaskContext(env, st).is_grasping("cube"))(env._state))
    except Exception as e:
        print("grasp query failed:", e)
    # lift straight up and watch cube z
    for i in range(40):
        out = act(np.array([[0, 0, 0.25]] * B, np.float32).clip(-0.4, 0.4),
                  grip=-1.0)
        if i % 5 == 0:
            tcp, cube = tcp_cube()
            print(f"lift {i}: tcp_z={tcp[:,2]} cube_z={cube[:,2]} "
                  f"grip_q={np.asarray(env._state.sim.qpos[:, -2:])[0]}")
    tcp, cube = tcp_cube()
    print("final tcp:", tcp, "cube:", cube)
    print("success:", np.asarray(out[-1].get("success")))


if __name__ == "__main__":
    main()
