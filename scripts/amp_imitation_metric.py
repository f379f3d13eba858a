"""Pose-tracking metric for trained HumanoidAMP policies (VERDICT r4 #8).

AMP is adversarial (no per-frame target), so the imitation metric is
distributional: for each policy state visited, the distance to the CLOSEST
motion-clip frame in AMP-observation space (a one-sided Chamfer distance).
Low values mean the policy's pose/velocity distribution lies ON the motion
manifold.  Also reports per-dimension pose error (dof-angle subset), mean
root height vs the clip, and episode survival.

Usage: python scripts/amp_imitation_metric.py <ckpt> [motion_file]
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def main():
    from isaacgymenv_tpu.envs import registry
    from isaacgymenv_tpu.learning.amp import AMPPPO
    from isaacgymenv_tpu.learning.checkpoint import load_train_state
    from isaacgymenv_tpu.utils.config import (
        apply_cli_overrides,
        load_task_config,
        load_train_config,
    )

    ckpt = sys.argv[1]
    motion = sys.argv[2] if len(sys.argv) > 2 else None
    n_envs = 256
    cfg = load_task_config("HumanoidAMP")
    over = [f"env.numEnvs={n_envs}"]
    if motion:
        over.append(f"env.motion_file={motion}")
    apply_cli_overrides(cfg, over)
    tcfg = load_train_config("HumanoidAMP", None)
    env = registry.get_task("HumanoidAMP")(cfg)
    agent = AMPPPO(env, tcfg)
    ts = load_train_state(agent, ckpt)
    venv = env.as_vec_env(seed=0)
    obs = venv.reset()
    act = jax.jit(lambda t, o, k: agent.act(t, o, True, k))
    key = jax.random.PRNGKey(0)

    # reference manifold: dense sampling of the motion clip's AMP obs
    ml = env.motion_lib
    T = 400
    n_ref = 512
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    ids = ml.sample_motions(k1, n_ref)
    times = ml.sample_time(k2, ids)
    ref_obs = np.asarray(env._motion_amp_obs(ids, times))  # (n_ref, 105)

    # rollout, recording single-frame AMP obs
    frames = []
    ep_lens = []
    cur = np.zeros(n_envs)
    root_h = []
    for t in range(T):
        key, k = jax.random.split(key)
        a = act(ts, obs["obs"], k)
        obs, rew, done, extras = venv.step(a)
        fo = np.asarray(env._amp_obs_now(venv.state))
        frames.append(fo)
        root_h.append(fo[:, 0])  # dim 0 = root height (build_amp_observations)
        cur += 1
        d = np.asarray(done)
        if d.any():
            ep_lens.extend(cur[d].tolist())
            cur[d] = 0
    pol = np.concatenate(frames[50:], 0)  # (T-50)*N frames, settled
    # subsample policy frames for the pairwise distance
    rng = np.random.default_rng(0)
    pol = pol[rng.choice(pol.shape[0], 4096, replace=False)]

    # one-sided Chamfer: min over ref frames, normalized per-dim scales
    scale = ref_obs.std(0) + 1e-3
    dp = (pol[:, None, :] - ref_obs[None, :, :]) / scale
    d2 = np.sqrt((dp**2).mean(-1))  # normalized rms distance
    chamfer = d2.min(1)
    # dof-angle subset (dims 13:13+52 in the AMP layout: dof_obs)
    dof_sl = slice(13, 13 + 52)
    dp_dof = (pol[:, None, dof_sl] - ref_obs[None, :, dof_sl]) / scale[dof_sl]
    cham_dof = np.sqrt((dp_dof**2).mean(-1)).min(1)

    rh = np.concatenate(root_h[50:])
    print(f"motion: {cfg['env'].get('motion_file', 'amp_humanoid_run.npy')}")
    print(f"chamfer (all dims, normalized rms): mean {chamfer.mean():.3f}  p90 {np.percentile(chamfer, 90):.3f}")
    print(f"chamfer (dof pose only):            mean {cham_dof.mean():.3f}  p90 {np.percentile(cham_dof, 90):.3f}")
    print(f"root height: policy mean {rh.mean():.3f}  clip mean {ref_obs[:, 0].mean():.3f}  "
          f"policy p99 {np.percentile(rh, 99):.3f}  clip max {ref_obs[:, 0].max():.3f}")
    mean_len = np.mean(ep_lens) if ep_lens else float(T)
    print(f"episodes finished: {len(ep_lens)}  mean length {mean_len:.1f} (cap {env.max_episode_length})")


if __name__ == "__main__":
    main()
