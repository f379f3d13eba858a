"""PBT subsystem: checkpoint protocol, ranking, mutation, restart decision."""

import os

import numpy as np
import pytest
import yaml


def _params(tmp_path, idx=0, n=4, dbg=False):
    from isaacgymenv_tpu.pbt.pbt import PbtParams

    pbt_cfg = {
        "enabled": True,
        "policy_idx": idx,
        "num_policies": n,
        "workspace": str(tmp_path),
        "interval_steps": 100,
        "start_after": 0,
        "initial_delay": 0,
        "dbg_mode": dbg,
        "mutation": {"config.learning_rate": "mutate_float"},
    }
    train_cfg = {"params": {"config": {"learning_rate": 3e-4}}}
    return PbtParams(pbt_cfg, train_cfg)


def test_mutation_functions():
    from isaacgymenv_tpu.pbt import mutation

    for _ in range(50):
        assert 0.01 <= mutation.mutate_eps_clip(0.2) <= 0.3
        assert 1 <= mutation.mutate_mini_epochs(4) <= 8
        assert mutation.mutate_discount(0.99) < 1.0
        assert mutation.mutate_float_min_1(1.2) >= 1.0
    out = mutation.mutate(
        {"lr": 3e-4}, {"lr": "mutate_float"}, mutation_rate=1.0,
        change_min=1.1, change_max=1.5,
    )
    assert out["lr"] != 3e-4


def test_pbt_checkpoint_roundtrip_and_ranking(tmp_path):
    from isaacgymenv_tpu.pbt.pbt import PbtObserver

    # fabricate a population: policies 1..3 with ascending objectives
    for idx in range(1, 4):
        d = tmp_path / f"{idx:03d}"
        d.mkdir()
        meta = {"iteration": 1, "true_objective": float(idx), "env_frames": 100,
                "params": {"config.learning_rate": 1e-4 * idx}}
        (d / "000001.yaml").write_text(yaml.safe_dump(meta))
        (d / "000001.ckpt").write_text("fake")

    obs = PbtObserver(_params(tmp_path, idx=0), steps_per_epoch=50)
    saved = {}
    obs.after_epoch(0, objective=0.1, save_fn=lambda p: saved.setdefault("p", p))
    # iteration 0 -> no save yet (init)
    pop = obs._load_population()
    assert pop[0] is None and pop[3]["true_objective"] == 3.0


def test_pbt_worst_policy_restarts(tmp_path, monkeypatch):
    import isaacgymenv_tpu.pbt.pbt as P

    for idx in range(1, 4):
        d = tmp_path / f"{idx:03d}"
        d.mkdir()
        meta = {"iteration": 1, "true_objective": 100.0 * idx, "env_frames": 1000,
                "params": {"config.learning_rate": 1e-4}}
        (d / "000001.yaml").write_text(yaml.safe_dump(meta))
        (d / "000001.ckpt").write_text("fake")

    calls = {}

    def fake_restart(policy_idx, new_params, ckpt):
        calls["idx"] = policy_idx
        calls["params"] = new_params
        calls["ckpt"] = ckpt

    monkeypatch.setattr(P, "restart_with_new_params", fake_restart)
    obs = P.PbtObserver(_params(tmp_path, idx=0, dbg=True), steps_per_epoch=50)
    obs.after_epoch(0, objective=0.0, save_fn=lambda p: open(p, "w").write("x"))
    # epoch 2 crosses interval_steps=100 -> full PBT iteration; policy 0 is worst
    obs.after_epoch(2, objective=0.0, save_fn=lambda p: open(p, "w").write("x"))
    assert calls["idx"] == 0
    assert calls["ckpt"].endswith(".ckpt")
    assert "config.learning_rate" in calls["params"]
    # own checkpoint was written to the workspace
    own = os.listdir(tmp_path / "000")
    assert any(f.endswith(".yaml") for f in own)


def test_initial_pbt_check():
    from isaacgymenv_tpu.pbt.pbt import initial_pbt_check

    assert initial_pbt_check(["task=Ant", "++pbt_restart=True"])
    assert not initial_pbt_check(["task=Ant"])


def test_param_grid_and_experiments():
    """Launcher experiment generation (ref: pbt/launcher/run_description.py)."""
    from isaacgymenv_tpu.pbt.run_description import (
        Experiment, ParamGrid, ParamList, RunDescription,
    )

    grid = ParamGrid([("seed", [1, 2]), ("train.params.config.gamma", [0.99, 0.995])])
    combos = list(grid.generate_params(randomize=False))
    assert len(combos) == 4
    assert combos[0] == {"seed": 1, "train.params.config.gamma": 0.99}

    exp = Experiment("ant", "python -m isaacgymenv_tpu.train task=Ant", grid)
    runs = list(exp.generate_experiments())
    assert len(runs) == 4
    assert "seed=1" in runs[0][0] and "experiment=" in runs[0][0]

    rd = RunDescription("sweep", [exp])
    all_runs = rd.generate_experiments()
    assert len(all_runs) == 4
    assert all_runs[0][1].startswith("sweep_ant")

    lst = ParamList([{"seed": 7}])
    assert list(lst.generate_params(randomize=True)) == [{"seed": 7}]


def test_slurm_launcher_generates_scripts(tmp_path):
    """Slurm backend writes sbatch scripts with requeue-on-timeout
    (ref: pbt/launcher/run_slurm.py + slurm/sbatch_timeout.sh)."""
    from isaacgymenv_tpu.pbt import launcher_slurm

    args = launcher_slurm.parse_args([
        "--workdir", str(tmp_path), "--partition", "tpu",
        "--timeout", "4:00:00", "--num_policies", "2", "--print_only",
        "--", "task=Ant", "pbt=pbt_default",
    ])
    scripts = launcher_slurm.build_scripts(args)
    assert len(scripts) == 2
    name, body = scripts[0]
    assert "pbt.policy_idx=0" in body
    assert "--partition=tpu" in body
    assert "--time=4:00:00" in body
    assert "scontrol requeue" in body
    launcher_slurm.main([
        "--workdir", str(tmp_path), "--print_only", "--", "task=Ant",
    ])
    assert (tmp_path / "train.sbatch").exists()


def test_mutation_full_path_keys_resolve_task_and_train():
    """Reference-style mutation keys ('train.params.config.*', 'task.env.*')
    resolve against the right config trees (ref: cfg/pbt/mutation/*.yaml)."""
    from isaacgymenv_tpu.pbt.pbt import PbtParams

    train_cfg = {"params": {"config": {"gamma": 0.99, "learning_rate": 3e-4}}}
    task_cfg = {"env": {"headingWeight": 0.5}}
    pbt_cfg = {
        "enabled": True,
        "mutation": {
            "train.params.config.gamma": "mutate_discount",
            "task.env.headingWeight": "mutate_float",
            "config.learning_rate": "mutate_float",  # legacy relative key
        },
    }
    p = PbtParams(pbt_cfg, train_cfg, task_cfg)
    assert p.mutable_params["train.params.config.gamma"] == 0.99
    assert p.mutable_params["task.env.headingWeight"] == 0.5
    assert p.mutable_params["config.learning_rate"] == 3e-4


def test_restart_cli_routes_full_path_params(monkeypatch):
    from isaacgymenv_tpu.pbt import pbt as P

    captured = {}
    monkeypatch.setattr(P.os, "execv", lambda exe, argv: captured.update(argv=argv))
    monkeypatch.setattr(
        P.sys, "argv", ["train.py", "task=Ant", "train.params.config.gamma=0.99"]
    )
    P.restart_with_new_params(
        0,
        {"train.params.config.gamma": 0.95, "task.env.headingWeight": 0.7,
         "config.learning_rate": 1e-3},
        "/tmp/x.ckpt",
    )
    argv = captured["argv"]
    assert "train.params.config.gamma=0.95" in argv
    assert "task.env.headingWeight=0.7" in argv
    assert "train.params.config.learning_rate=0.001" in argv
    assert "++pbt_restart=True" in argv


def test_mutation_scheme_yamls_parse():
    import yaml as _y

    from isaacgymenv_tpu.utils.config import CFG_ROOT

    d = os.path.join(CFG_ROOT, "pbt", "mutation")
    names = sorted(os.listdir(d))
    assert len(names) == 5
    for n in names:
        with open(os.path.join(d, n)) as f:
            spec = _y.safe_load(f)
        assert spec and all(v.startswith("mutate_") for v in spec.values())


def test_experiment_modules_generate():
    import importlib

    for mod in (
        "ant_pbt",
        "allegro_kuka_reorientation_pbt_lstm",
        "allegro_kuka_two_arms_regrasping_pbt_lstm",
        "allegro_kuka_throw_lstm",
        "allegro_kuka_reorientation_lstm_8gpu",
    ):
        m = importlib.import_module(f"isaacgymenv_tpu.pbt.experiments.{mod}")
        cmds = m.RUN_DESCRIPTION.generate_experiments()
        assert cmds and all("isaacgymenv_tpu.train" in c for c, _, _ in cmds)
