"""Training CLI — `python -m isaacgymenv_tpu.train task=Cartpole ...`.

Mirrors the reference entry point (ref: train.py:86-221; README.md:55-144):
hydra-style `key=value` overrides, `task=<T>` selects cfg/task/<T>.yaml +
cfg/train/<T>PPO.yaml, `test=True checkpoint=...` runs the player path,
`max_iterations=N` caps epochs, `num_envs=N` overrides the env count.
"""

from __future__ import annotations

import os
import sys
import time


def _override_sigma(ts, sigma: float):
    """Replace the restored policy's state-independent action std (the
    fixed_sigma `log_std` param) with log(sigma) — ref train.py:217."""
    import jax.numpy as jnp

    import jax

    found = {"n": 0}

    def visit(path, leaf):
        if any(getattr(p, "key", None) == "log_std" for p in path):
            found["n"] += 1
            return jnp.full_like(leaf, jnp.log(sigma))
        return leaf

    params = jax.tree_util.tree_map_with_path(visit, ts.params)
    if not found["n"]:
        print("sigma= override ignored: policy has no fixed log_std param")
        return ts
    print(f"sigma override: policy std set to {sigma}")
    return ts.replace(params=params)


def main(argv=None):
    # honor an explicit JAX_PLATFORMS even when a sitecustomize has already
    # pinned a platform list via jax.config (the env var alone is ignored
    # once a config update ran; this re-asserts the user's choice)
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    argv = list(sys.argv[1:] if argv is None else argv)
    # hydra-style "++key=value" force-adds: strip the +/++ prefix so markers
    # like ++pbt_restart=True (appended by the PBT self-restart CLI) resolve
    kv = dict(
        (a.split("=", 1)[0].lstrip("+"), a.split("=", 1)[1])
        for a in argv if "=" in a
    )

    task = kv.pop("task", "Cartpole")
    seed = int(kv.pop("seed", 42))
    if seed < 0:  # seed=-1 = random seed (ref: utils/utils.py set_seed)
        seed = int.from_bytes(os.urandom(4), "little") % (2**31)
    test = kv.pop("test", "False").lower() in ("true", "1")
    checkpoint = kv.pop("checkpoint", "")
    # sigma=<float> overrides the restored policy's action std (ref:
    # train.py:217 `'sigma': cfg.sigma if cfg.sigma != '' else None`)
    sigma = kv.pop("sigma", "")
    max_iterations = kv.pop("max_iterations", "")
    num_envs = kv.pop("num_envs", "")
    experiment = kv.pop("experiment", task)
    headless = kv.pop("headless", "True")  # accepted for CLI parity; no viewer
    train_name = kv.pop("train", "")
    pbt_name = kv.pop("pbt", "")
    # marker set by PBT self-restart: the restart CLI carries mutated
    # hyperparams that must override the checkpoint's saved values
    pbt_restart = kv.pop("pbt_restart", "False").lower() in ("true", "1")
    # multi_gpu=True|False|auto (ref: train.py:120, README.md:167-172):
    # auto shards the env axis over every visible device when >1
    multi_gpu = kv.pop("multi_gpu", "auto").lower()
    # capture_video=True records a policy rollout of the trained checkpoint
    # to <run_dir>/videos/<experiment>.gif after training (the headless
    # equivalent of the reference's RecordVideo wrapper, ref train.py:140-147)
    capture_video = kv.pop("capture_video", "False").lower() in ("true", "1")

    # multi-host entry (the torchrun equivalent): one process per host joins
    # the global JAX runtime before any backend query.  Triggered by the
    # standard coordinator env vars or Slurm multi-task launches
    # (ref: SURVEY.md §5.8; pbt/launcher_slurm.py)
    coord = os.environ.get("COORDINATOR_ADDRESS") or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coord or int(os.environ.get("SLURM_NTASKS", "1") or 1) > 1:
        import jax

        # Slurm (and other recognized clusters) auto-detect; for the manual
        # coordinator-env-var launch path, initialize() takes the explicit
        # triplet (jax 0.9 has no generic env-var cluster detection)
        n_proc = os.environ.get("NUM_PROCESSES") or os.environ.get(
            "JAX_NUM_PROCESSES"
        )
        proc_id = os.environ.get("PROCESS_ID") or os.environ.get(
            "JAX_PROCESS_ID"
        )
        if coord and n_proc is not None and proc_id is not None:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(n_proc),
                process_id=int(proc_id),
            )
        else:
            jax.distributed.initialize()

    from isaacgymenv_tpu.envs import registry
    from isaacgymenv_tpu.learning.checkpoint import load_train_state, save_train_state
    from isaacgymenv_tpu.learning.ppo import PPO
    from isaacgymenv_tpu.utils.config import (
        apply_cli_overrides,
        load_task_config,
        load_train_config,
    )

    task_cfg = load_task_config(task)
    train_cfg = load_train_config(task, train_name or None)
    # route remaining dotted overrides: 'train.*' to train cfg, rest to task cfg
    # reference-CLI-style "task.env.X=..." addresses the task cfg subtree;
    # bare "env.X=..." is equivalent (our task cfg root IS the task yaml)
    task_overrides = [
        f"{k[5:] if k.startswith('task.') else k}={v}" for k, v in kv.items()
        if not k.startswith(("train.", "pbt.", "wandb"))
    ]
    train_overrides = [f"{k[6:]}={v}" for k, v in kv.items() if k.startswith("train.")]
    apply_cli_overrides(task_cfg, task_overrides)
    apply_cli_overrides(train_cfg, train_overrides)

    # PBT config: cfg/pbt/<name>.yaml + pbt.* CLI overrides (ref: cfg/config.yaml
    # defaults group `pbt: no_pbt`, pbt/pbt.py)
    pbt_cfg = {}
    if pbt_name:
        from isaacgymenv_tpu.utils.config import CFG_ROOT, load_yaml

        pbt_cfg = load_yaml(os.path.join(CFG_ROOT, "pbt", f"{pbt_name}.yaml"))
    pbt_overrides = [f"{k[4:]}={v}" for k, v in kv.items() if k.startswith("pbt.")]
    apply_cli_overrides(pbt_cfg, pbt_overrides)
    if pbt_cfg.get("enabled") and not pbt_restart:
        # population diversity: offset the seed per policy (the reference
        # seeds per rank, utils/utils.py:94; identical seeds make every
        # policy bitwise-identical here, so ranking never separates)
        seed = seed + int(pbt_cfg.get("policy_idx", 0))
    if pbt_cfg.get("mutation_scheme"):
        # pbt.mutation_scheme=<name> selects cfg/pbt/mutation/<name>.yaml
        # (the reference's `pbt/mutation=<name>` hydra group)
        from isaacgymenv_tpu.utils.config import CFG_ROOT as _CR, load_yaml as _ly

        pbt_cfg["mutation"] = _ly(
            os.path.join(_CR, "pbt", "mutation", f"{pbt_cfg['mutation_scheme']}.yaml")
        )
    if num_envs:
        task_cfg["env"]["numEnvs"] = int(num_envs)

    # config-variant files select their env class via the cfg `name:` field
    # (ref: hydra cfg task.name -> isaacgym_task_map)
    env_cls = registry.get_task(task_cfg.get("name", task))
    env = env_cls(task_cfg)
    algo = train_cfg["params"].get("algo", {}).get("name", "a2c_continuous")

    # data-parallel over all devices: shard the env axis, pmean gradients
    # (the reference's multi_gpu torchrun path, SPMD-style)
    import jax

    n_dev = len(jax.devices())
    use_dist = (
        not test
        and (multi_gpu in ("true", "1") or (multi_gpu == "auto" and n_dev > 1))
        and env.num_envs % max(n_dev, 1) == 0
        and n_dev > 1
    )
    mesh = None
    if use_dist:
        from isaacgymenv_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        print(f"multi-chip: sharding {env.num_envs} envs over {n_dev} devices")

    is_rnn = "rnn" in train_cfg["params"].get("network", {})
    if algo == "amp_continuous":
        if use_dist:
            from isaacgymenv_tpu.parallel.trainer import DistributedAMPPPO

            agent = DistributedAMPPPO(env, train_cfg, mesh)
        else:
            from isaacgymenv_tpu.learning.amp import AMPPPO

            agent = AMPPPO(env, train_cfg)
    elif is_rnn:
        if use_dist:
            from isaacgymenv_tpu.parallel.trainer import DistributedLSTMPPO

            agent = DistributedLSTMPPO(env, train_cfg, mesh)
        else:
            from isaacgymenv_tpu.learning.ppo_lstm import LSTMPPO

            agent = LSTMPPO(env, train_cfg)
    elif algo == "sac":
        if use_dist:
            from isaacgymenv_tpu.parallel.trainer import DistributedSAC

            agent = DistributedSAC(env, train_cfg, mesh)
        else:
            from isaacgymenv_tpu.learning.sac import SAC

            agent = SAC(env, train_cfg)
    elif use_dist:
        from isaacgymenv_tpu.parallel.trainer import DistributedPPO

        agent = DistributedPPO(env, train_cfg, mesh)
    else:
        agent = PPO(env, train_cfg)

    run_dir = os.path.join("runs", experiment)
    os.makedirs(os.path.join(run_dir, "nn"), exist_ok=True)

    if test:
        # real player loop: per-episode returns/lengths on done indices,
        # games_num budget, deterministic flag, RNN zeroing on done
        # (ref: learning/common_player.py:54-152)
        from isaacgymenv_tpu.learning.player import run_player

        ts = load_train_state(agent, checkpoint)
        if sigma:
            ts = _override_sigma(ts, float(sigma))
        venv = env.as_vec_env(seed=seed)
        games_num = int(kv.pop("games_num", 64))
        deterministic = kv.pop("deterministic", "True").lower() in ("true", "1")
        run_player(
            agent, ts, venv,
            games_num=games_num,
            max_steps=int(max_iterations) if max_iterations else 100_000,
            deterministic=deterministic,
        )
        return

    epochs = int(max_iterations) if max_iterations else None
    t0 = time.time()

    init_ts = None
    if sigma and not checkpoint:
        # the reference applies the sigma override after _restore regardless
        # of whether a checkpoint was given (ref train.py:217 + rl_games
        # Runner._override_sigma) — build the fresh state now so a fresh
        # training run honors sigma= too instead of silently ignoring it
        init_ts = _override_sigma(agent.init(seed), float(sigma))
        if use_dist:
            init_ts = agent.shard_state(init_ts)
    if checkpoint:
        from isaacgymenv_tpu.learning.checkpoint import refill_slim

        init_ts = load_train_state(agent, checkpoint)
        init_ts = refill_slim(agent, init_ts, seed)
        if sigma:
            init_ts = _override_sigma(init_ts, float(sigma))
        if use_dist:
            init_ts = agent.shard_state(init_ts)
        if pbt_restart and hasattr(init_ts, "lr"):
            # PBT mutated learning_rate arrives via CLI but the checkpoint
            # carries the donor's working LR (ts.lr is what the adaptive
            # schedule reads) — re-seed it from the mutated config so the
            # mutation actually takes effect
            import jax.numpy as jnp

            new_lr = jnp.asarray(agent.cfg.learning_rate, jnp.float32)
            init_ts = init_ts.replace(lr=new_lr)
            try:  # optax inject_hyperparams state (see ppo._update)
                init_ts.opt_state[1].hyperparams["learning_rate"] = new_lr
            except (AttributeError, IndexError, KeyError, TypeError):
                pass

    # observers: TensorBoard/CSV summaries + optional W&B (ref §5.5;
    # replaces the reference's RLGPUAlgoObserver + missing wandb_utils)
    from isaacgymenv_tpu.utils.observers import (
        MultiObserver,
        TensorBoardObserver,
        WandbObserver,
    )

    wandb_cfg = {k: v for k, v in kv.items() if k.startswith("wandb")}
    wandb_cfg["wandb_activate"] = kv.get("wandb_activate", "False").lower() in ("true", "1")
    observer = MultiObserver(
        TensorBoardObserver(run_dir),
        WandbObserver({**wandb_cfg, "task": task}, rank=0),
    )
    steps_per_epoch_obs = (
        agent.cfg.horizon_length if algo != "sac" else agent.steps_per_epoch
    ) * env.num_envs
    import jax

    # one bulk device->host transfer per epoch: per-scalar float() in the
    # observers would otherwise issue a blocking sync PER METRIC (tens of
    # tunnel round-trips per epoch; measured ~3x fps_total)
    obs_callback = lambda ep, ts, info: observer.after_epoch(
        ep, (ep + 1) * steps_per_epoch_obs, jax.device_get(info)
    )

    # periodic + best-by-objective checkpoints during training (ref:
    # common_agent.py:171-177, cfg/train/AnymalPPO.yaml save_frequency /
    # save_best_after): a run that dies at epoch N-1 resumes from the last
    # periodic snapshot instead of losing everything
    tc = train_cfg["params"].get("config", {})
    save_frequency = int(tc.get("save_frequency", 0) or 0)
    save_best_after = int(tc.get("save_best_after", 100) or 100)
    best_state = {"return": float("-inf")}

    def save_callback(ep, ts, info):
        if save_frequency and (ep + 1) % save_frequency == 0:
            save_train_state(ts, os.path.join(run_dir, "nn", f"last_{experiment}.ckpt"))
        r = float(info.get("mean_return", 0.0))
        if ep >= save_best_after and r > best_state["return"]:
            best_state["return"] = r
            # slim: params/stats only — a full-state save on every improving
            # epoch (replay ring + env state through the device tunnel)
            # collapsed training throughput once returns rose monotonically
            save_train_state(
                ts, os.path.join(run_dir, "nn", f"{experiment}_best.ckpt"),
                slim=True,
            )

    def callback(ep, ts, info):
        obs_callback(ep, ts, info)
        save_callback(ep, ts, info)

    if pbt_cfg.get("enabled"):
        from isaacgymenv_tpu.pbt.pbt import PbtObserver, PbtParams

        pbt_params = PbtParams(pbt_cfg, train_cfg, task_cfg)
        pbt_observer = PbtObserver(pbt_params, steps_per_epoch_obs)

        def callback(ep, ts, info):
            obs_callback(ep, ts, info)
            save_callback(ep, ts, info)
            obj = float(
                info.get("true_objective", info.get("mean_return", 0.0))
            )
            pbt_observer.after_epoch(ep, obj, lambda p: save_train_state(ts, p))

    ts = agent.train(seed=seed, max_epochs=epochs, callback=callback, init_ts=init_ts)
    path = os.path.join(run_dir, "nn", f"{experiment}.ckpt")
    save_train_state(ts, path)
    per_epoch = (
        agent.cfg.horizon_length if algo != "sac" else agent.steps_per_epoch
    ) * env.num_envs
    steps = per_epoch * int(ts.epoch)
    dt = time.time() - t0
    print(f"saved {path}; {steps:,} env steps in {dt:.1f}s ({steps/dt:,.0f} steps/s)")

    if capture_video:
        import subprocess

        replay = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts", "replay.py",
        )
        vid_dir = os.path.join(run_dir, "videos")
        os.makedirs(vid_dir, exist_ok=True)
        npz = os.path.join(vid_dir, f"{experiment}.npz")
        gif = os.path.join(vid_dir, f"{experiment}.gif")
        subprocess.run(
            [sys.executable, replay, "record", f"task={task}", "steps=300",
             f"out={npz}", f"checkpoint={path}", "actions=policy"],
            check=False,
        )
        subprocess.run(
            [sys.executable, replay, "render", npz, f"out={gif}"], check=False
        )
        print(f"video: {gif}")


if __name__ == "__main__":
    main()
