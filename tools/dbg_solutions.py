"""Phase-instrumented debugging for the scripted solutions (run on TPU)."""
import numpy as np, jax
import maniskill_tpu as mst
from maniskill_tpu.envs.base_env import TaskContext
from maniskill_tpu.examples.motionplanning import solutions as S

B = 4

def info_of(sv):
    return {k: np.asarray(v) for k, v in sv.last[-1].items()}

def dbg_lift_peg():
    env = mst.make("LiftPegUpright-v1", num_envs=B, control_mode="pd_ee_delta_pose", robot_init_qpos_noise=0.0)
    env.reset(seed=0)
    sv = S._PoseServo(env)
    peg = lambda: S._actor_pose(env, "peg")
    peg_dir = lambda: S._quat_apply_np(peg()[1], np.tile(np.array([1.0,0,0]),(B,1)))
    ya = S._tcp_x_across(env, peg_dir)
    sv.to(lambda: np.concatenate([peg()[0][:, :2], np.full((B,1),0.10)],1), steps=28, rot_fn=ya)
    tcp,tq = S._tcp_pose(env)
    print("LIFT hover: tcp", tcp[0].round(3), "peg", peg()[0][0].round(3), "yaw_err", ya()[0].round(2))
    sv.to(lambda: np.concatenate([peg()[0][:, :2], np.full((B,1),0.025)],1), steps=25, gain=2.0, rot_fn=ya)
    sv.hold(8, grip=-1.0)
    print("LIFT grasped z:", peg()[0][:,2].round(4))
    up = np.tile(np.array([0.,0,1.]),(B,1))
    def rot_err():
        d = peg_dir(); sgn = np.where(d[:,2:3]>=0,1.,-1.)
        return S._axis_angle_between(d*sgn, up)
    sv.to(lambda: np.concatenate([peg()[0][:, :2], np.full((B,1),0.30)],1), steps=30, grip=-1.0)
    print("LIFT lifted peg z:", peg()[0][:,2].round(3), "(>0.1 means held)")
    sv.to(lambda: np.concatenate([peg()[0][:, :2], np.full((B,1),0.30)],1), steps=40, grip=-1.0, rot_fn=rot_err)
    d = peg_dir()
    print("LIFT after rotate dir_z:", d[:,2].round(3), "(want |1|)")
    L = env.peg_half_length
    sv.to(lambda: np.concatenate([peg()[0][:, :2], np.full((B,1), L+0.002)],1), steps=40, gain=2.0, grip=-1.0, rot_fn=rot_err)
    sv.hold(6, grip=-1.0)
    print("LIFT final peg z:", peg()[0][:,2].round(4), "dir_z:", peg_dir()[:,2].round(3), "success:", info_of(sv)["success"])

def dbg_pull():
    env = mst.make("PullCubeTool-v1", num_envs=B, control_mode="pd_ee_delta_pos", robot_init_qpos_noise=0.0)
    env.reset(seed=0)
    sv = S._PoseServo(env)
    tool = lambda: S._tcp_and_actor(env, "l_shape_tool")[1]
    cube = lambda: S._tcp_and_actor(env, "cube")[1]
    go = np.array([-0.07, 0.0, 0.0])
    sv.to(lambda: tool() + go + np.array([0,0,0.07]), steps=28)
    sv.to(lambda: tool() + go + np.array([0,0,0.002]), steps=22, gain=2.0)
    sv.hold(8, grip=-1.0)
    sv.to(lambda: tool() + go + np.array([0,0,0.06]), steps=12, grip=-1.0)
    print("PULL lifted tool z:", tool()[:,2].round(3), "(>0.03 means held)")
    hl, hk, w = env.handle_length, env.hook_length, env.tool_width
    def tgt(z):
        c = cube(); t = np.empty((B,3),np.float32)
        t[:,0] = c[:,0]+0.06-(hl/2-hk/2); t[:,1] = c[:,1]-2*w; t[:,2] = z
        return t
    for _ in range(40): sv.act(np.clip((tgt(0.08)-tool())*2.5,-0.35,0.35), grip=-1.0)
    print("PULL carry tool", tool()[0].round(3), "want", tgt(0.08)[0].round(3))
    for _ in range(18): sv.act(np.clip((tgt(0.012)-tool())*2.0,-0.2,0.2), grip=-1.0)
    print("PULL lowered tool", tool()[0].round(3))
    for _ in range(55): sv.act(np.tile(np.array([-0.30,0,0],np.float32),(B,1)), grip=-1.0)
    base = np.array([-0.615, 0.0])
    d = np.linalg.norm(cube()[:,:2]-base, axis=1)
    print("PULL final cube dist-to-base:", d.round(3), "(<0.6=success) success:", info_of(sv)["success"])

def dbg_plug():
    env = mst.make("PlugCharger-v1", num_envs=B, control_mode="pd_ee_delta_pose", robot_init_qpos_noise=0.0)
    env.reset(seed=0)
    sv = S._PoseServo(env)
    chg = lambda: S._actor_pose(env, "charger")
    goal = np.asarray(env._goal_pose[:3])
    yaw2chg = S._tcp_x_across(env, lambda: S._quat_apply_np(chg()[1], np.tile(np.array([1.0,0,0]),(B,1))))
    sv.to(lambda: np.concatenate([chg()[0][:, :2], np.full((B,1),0.08)],1), steps=25, rot_fn=yaw2chg)
    sv.to(lambda: np.concatenate([chg()[0][:, :2], np.full((B,1),0.015)],1), steps=22, gain=2.0, rot_fn=yaw2chg)
    sv.hold(8, grip=-1.0)
    sv.to(lambda: np.concatenate([chg()[0][:, :2], np.full((B,1),0.08)],1), steps=12, grip=-1.0)
    print("PLUG lifted charger z:", chg()[0][:,2].round(3), "(>0.04 means held)")
    def yaw_err():
        out = np.zeros((B,3),np.float32); out[:,2] = -S._yaw_of(chg()[1]); return out
    pre = goal + np.array([-0.03,0,0])
    for _ in range(45):
        sv.act(np.clip((pre - chg()[0])*2.5,-0.25,0.25), np.clip(yaw_err()*2.0,-0.3,0.3), grip=-1.0)
    print("PLUG pre pos", chg()[0][0].round(3), "want", pre.round(3), "yaw", S._yaw_of(chg()[1]).round(2))
    for _ in range(50):
        sv.act(np.clip((goal - chg()[0])*2.0,-0.08,0.08), np.clip(yaw_err()*2.0,-0.2,0.2), grip=-1.0)
    inf = info_of(sv)
    print("PLUG final dist:", inf.get("obj_to_goal_dist").round(4), "angle:", inf.get("obj_to_goal_angle").round(3), "success:", inf["success"])

def dbg_fold():
    env = mst.make("FoldSuitcase-v1", num_envs=B, control_mode="pd_ee_delta_pos", robot_init_qpos_noise=0.0)
    env.reset(seed=0)
    sv = S._PoseServo(env)
    def lid_q():
        return np.asarray(env._state.sim.qpos[:, env._lid_body])
    def pp():
        s = env._state
        def f(st):
            ctx = TaskContext(env, st)
            b = env._lid_body
            return ctx.body_pos[b], ctx.body_quat[b]
        p, q = jax.vmap(f)(s)
        p, q = np.asarray(p), np.asarray(q)
        off = np.tile(np.array([-2.0*env.lid_half[0]*0.45, 0.0, env.lid_half[2]+0.01], np.float32),(B,1))
        pt = p + S._quat_apply_np(q, off)
        r = pt - p
        t = -np.cross(np.tile(np.array([0.,1.,0.]),(B,1)), r)
        t = t/np.linalg.norm(t,axis=1,keepdims=True).clip(1e-9)
        return pt, t
    print("FOLD q0:", lid_q().round(2), "press pt:", pp()[0][0].round(3), "dir:", pp()[1][0].round(2))
    for i in range(35):
        pt, t = pp()
        tcp,_ = S._tcp_pose(env)
        sv.act(np.clip((pt - t*0.05 - tcp)*2.5,-0.35,0.35), grip=-1.0)
    tcp,_ = S._tcp_pose(env)
    print("FOLD approached tcp", tcp[0].round(3), "pt", pp()[0][0].round(3), "q:", lid_q().round(2))
    for i in range(80):
        pt, t = pp()
        tcp,_ = S._tcp_pose(env)
        sv.act(np.clip((pt + t*0.04 - tcp)*3.0,-0.3,0.3), grip=-1.0)
        if i % 20 == 19:
            print("FOLD press q:", lid_q().round(2))
    print("FOLD final q:", lid_q().round(2), "target:", env.target_qpos, "success:", info_of(sv)["success"])

def dbg_roll():
    env = mst.make("RollBall-v1", num_envs=B, control_mode="pd_ee_delta_pos", robot_init_qpos_noise=0.0)
    env.reset(seed=0)
    succ = S.solve_roll_ball(env)
    gp = np.asarray(env._state.sim.kin_pose[:, env.model.kin_index["goal_region"], :2])
    bp = np.asarray(env._state.sim.free_pose[:, env.model.free_index["ball"], :2])
    print("ROLL final dist:", np.linalg.norm(bp-gp,axis=1).round(3), "success:", succ)

if __name__ == "__main__":
    import sys
    which = sys.argv[1:] or ["lift", "pull", "plug", "fold", "roll"]
    for w in which:
        {"lift": dbg_lift_peg, "pull": dbg_pull, "plug": dbg_plug,
         "fold": dbg_fold, "roll": dbg_roll}[w]()
