"""Functional vectorized env runtime — the TPU-native `VecTask`.

Reference contract being reproduced (SURVEY.md §3.3, vec_task.py:360-455):

- `step(actions)` order: clip actions -> apply actuation -> simulate
  decimation -> progress += 1 -> auto-reset envs flagged done LAST step ->
  compute obs -> compute reward + NEW done flags -> timeout extras ->
  clip obs.  The learner therefore sees terminal obs WITH done=1, and the
  next step returns the first obs of the new episode — identical to the
  reference's post_physics ordering (tasks/anymal.py:231-239).
- `extras['time_outs']` = progress >= max_len-1 AND done
  (vec_task.py:394-400) for value bootstrapping on truncation.
- `reset()` re-initializes all envs and returns fresh obs (unlike the
  reference's quirk of returning stale zeros, vec_task.py:426-431 — we fix
  this knowingly; documented deviation).

Everything is a pure function over `EnvState`; the stateful `VecEnv` shell
at the bottom provides the reference's imperative API for interactive use.
Training uses the pure API inside `lax.scan`.
"""

from __future__ import annotations

import abc
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from isaacgymenv_tpu.physics import engine
from isaacgymenv_tpu.physics.types import SimModel, SimState


@struct.dataclass
class EnvState:
    """Batched env-side state: sim + the reference's runtime buffers
    (vec_task.py:301-324) in functional form."""

    sim: SimState
    progress: jnp.ndarray      # (N,) int32 steps since episode start
    reset: jnp.ndarray         # (N,) bool — done flag produced by last step
    rng: jax.Array             # single PRNG key, split per step
    ts: Dict[str, jnp.ndarray]  # task-specific state (commands, curriculum, ...)


class TaskEnv(abc.ABC):
    """Base class for all tasks.  Subclasses implement the four hooks below
    (the functional analog of pre_physics_step / post_physics_step /
    reset_idx / compute_observations+reward, SURVEY.md §2.2 task pattern)."""

    # populated by subclass __init__
    model: SimModel
    terrain: Any = None
    num_obs: int
    num_actions: int
    num_states: int = 0

    def __init__(self, cfg: Dict[str, Any]):
        self.cfg = cfg
        env_cfg = cfg["env"]
        self.num_envs = int(env_cfg["numEnvs"])
        self.max_episode_length = int(env_cfg.get("maxEpisodeLength", 500))
        self.clip_obs = float(env_cfg.get("clipObservations", np.inf))
        self.clip_actions = float(env_cfg.get("clipActions", np.inf))
        sim_cfg = cfg.get("sim", {})
        self.dt = float(sim_cfg.get("dt", 1.0 / 60.0))
        self.substeps = int(sim_cfg.get("substeps", 2))
        self.control_freq_inv = int(env_cfg.get("controlFrequencyInv", 1))
        self.gravity = tuple(sim_cfg.get("gravity", (0.0, 0.0, -9.81)))
        # domain randomization (ref: task.randomize + randomization_params;
        # attached after the subclass builds self.model — see _setup_dr)
        self.randomize = bool(cfg.get("task", {}).get("randomize", False))
        self.dr = None

    def _setup_dr(self):
        """Bind the DR engine once the model exists (call at end of subclass
        __init__ or rely on lazy binding at initial_state)."""
        if self.randomize and self.dr is None:
            from isaacgymenv_tpu.utils.domain_rand import DomainRandomizer

            self.dr = DomainRandomizer(
                self.cfg["task"].get("randomization_params", {}),
                self.model,
                self.num_envs,
            )

    def _model_for(self, state: "EnvState") -> SimModel:
        """Model with this state's per-env DR parameters applied."""
        if self.dr is not None and "dr_params" in state.ts:
            return self.dr.model_with(state.ts["dr_params"])
        return self.model

    # ------------------------------------------------------------------ hooks
    @abc.abstractmethod
    def _reset_envs(self, state: EnvState, mask: jnp.ndarray, key: jax.Array) -> EnvState:
        """Re-initialize envs where mask is True (functional reset_idx).

        Must write sim q/qd (masked), zero progress, and refresh task state.
        The engine caches are refreshed by the caller via `forward`.
        """

    @abc.abstractmethod
    def _make_control(self, state: EnvState, actions: jnp.ndarray):
        """Map clipped actions to actuation (pre_physics_step).

        Returns a Control, or (Control, EnvState) when the task integrates
        action state (e.g. quadcopter thrust/target integrators,
        ref: tasks/quadcopter.py:310-316)."""

    @abc.abstractmethod
    def _observations(self, state: EnvState, actions: jnp.ndarray) -> jnp.ndarray:
        """(N, num_obs) observation buffer."""

    @abc.abstractmethod
    def _reward_done(
        self, state: EnvState, obs: Optional[jnp.ndarray], actions: jnp.ndarray
    ) -> Tuple[EnvState, jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
        """(state', reward (N,), done (N,) bool, info dict).

        May thread task-state updates (episode sums, last_* buffers) through
        the returned state.  Under `reset_timing == "immediate"` `obs` is
        None (reward computed from pre-reset state, ref terrain ordering)."""

    def _states(self, state: EnvState, obs: jnp.ndarray) -> Optional[jnp.ndarray]:
        """Privileged state for asymmetric actor-critic (None if unused)."""
        return None

    def _post_physics(self, state: EnvState, actions: jnp.ndarray) -> EnvState:
        """Optional extra task dynamics after sim step (e.g. pushes, curriculum)."""
        return state

    def _initial_ts(self, key: jax.Array) -> Dict[str, jnp.ndarray]:
        """Initial task-specific state arrays."""
        return {}

    def _obs_named(self, state: EnvState, actions: jnp.ndarray):
        """Optional per-key observation dict (the DeXtreme dict-obs fork's
        surface, ref: adr_vec_task.py:143-220 obs_dims -> per-key buffers
        incl. `*_randomized` noised duplicates).  None for flat-obs tasks.
        When provided, step() attaches it as obs_dict["obs_dict"]; unused
        entries are dead-code-eliminated by XLA inside training jits."""
        return None

    # env-state checkpoint hooks (ref: vec_task.py:196-204 get/set_env_state;
    # DeXtreme persists ADR ranges through these, adr_vec_task.py:368-399)
    def get_env_state(self, state: EnvState):
        return None

    def set_env_state(self, state: EnvState, env_state_dict) -> EnvState:
        return state

    def _do_reset(self, state: EnvState, mask: jnp.ndarray, key: jax.Array) -> EnvState:
        """Task reset + frequency-gated DR re-roll (vec_task.py:619-638)."""
        state = self._reset_envs(state, mask, key)
        if self.dr is not None:
            ts = dict(state.ts)
            due = mask & (ts["dr_elapsed"] >= self.dr.frequency)
            params = self.dr.resample(
                jax.random.fold_in(key, 3), ts["dr_params"], due, ts["dr_step"]
            )
            ts["dr_params"] = params
            ts["dr_elapsed"] = jnp.where(due, 0, ts["dr_elapsed"])
            state = state.replace(ts=ts)
        return state

    def _obs_noise(self, key: jax.Array, obs: jnp.ndarray) -> jnp.ndarray:
        """Optional additive observation noise (terrain family,
        ref: anymal_terrain.py:174-186 noise_scale_vec)."""
        return obs

    # Reset ordering (SURVEY.md §3.3):
    # - "deferred" (flat family): envs flagged done at step t are reset at
    #   step t+1 after physics; the learner SEES the terminal obs with done=1.
    # - "immediate" (terrain family, ref anymal_terrain.py:448-476):
    #   termination+reward are computed from pre-reset state, the env resets
    #   in the same step, and the returned obs is the fresh episode's first.
    reset_timing = "deferred"

    # ------------------------------------------------------------- pure API
    def initial_state(self, key: jax.Array) -> EnvState:
        from isaacgymenv_tpu.physics.types import make_zero_state

        self._setup_dr()
        key, k_ts, k_reset, k_dr = jax.random.split(key, 4)
        sim = make_zero_state(self.model, self.num_envs)
        ts = self._initial_ts(k_ts)
        if self.dr is not None:
            # randomize once on startup (ref: anymal.py:155-157)
            params = self.dr.initial_params()
            params = self.dr.resample(
                k_dr, params, jnp.ones(self.num_envs, bool), jnp.asarray(0)
            )
            ts["dr_params"] = params
            ts["dr_elapsed"] = jnp.zeros(self.num_envs, jnp.int32)
            ts["dr_step"] = jnp.zeros((), jnp.int32)
        state = EnvState(
            sim=sim,
            progress=jnp.zeros(self.num_envs, jnp.int32),
            reset=jnp.zeros(self.num_envs, bool),
            rng=key,
            ts=ts,
        )
        state = self._reset_envs(state, jnp.ones(self.num_envs, bool), k_reset)
        state = state.replace(sim=engine.forward(self.model, self.terrain, state.sim))
        return state

    def step(
        self, state: EnvState, actions: jnp.ndarray
    ) -> Tuple[EnvState, Dict[str, jnp.ndarray], jnp.ndarray, jnp.ndarray, Dict]:
        """One env step (pure).  Returns (state', obs_dict, rew, done, extras)."""
        # DR action noise BEFORE clipping (ref: vec_task.py:371-374)
        if self.dr is not None and self.dr.act_spec is not None:
            k_act = jax.random.fold_in(state.rng, 91)
            actions = self.dr.noise(
                self.dr.act_spec, k_act, actions, state.ts["dr_step"]
            )
        actions = jnp.clip(actions, -self.clip_actions, self.clip_actions)

        model = self._model_for(state)
        # physics rollout for one control period (decimation loop,
        # ref: vec_task.py:379-382)
        ctrl = self._make_control(state, actions)
        if isinstance(ctrl, tuple):
            ctrl, state = ctrl
        sim = state.sim
        for _ in range(self.control_freq_inv):
            sim = engine.step(model, self.terrain, sim, ctrl, self.dt, self.substeps)
        state = state.replace(sim=sim, progress=state.progress + 1)
        if self.dr is not None:
            ts = dict(state.ts)
            ts["dr_elapsed"] = ts["dr_elapsed"] + 1
            ts["dr_step"] = ts["dr_step"] + 1
            state = state.replace(ts=ts)

        state = self._post_physics(state, actions)

        key, k_reset, k_noise = jax.random.split(state.rng, 3)
        state = state.replace(rng=key)

        if self.reset_timing == "immediate":
            # reward/termination from pre-reset state, then reset this step
            state, rew, done, info = self._reward_done(state, None, actions)
            timeout = (state.progress >= self.max_episode_length - 1) & done
            state = self._do_reset(state, done, k_reset)
            state = state.replace(sim=engine.forward(self._model_for(state), self.terrain, state.sim))
            obs = self._observations(state, actions)
            state = state.replace(reset=done)
        else:
            # auto-reset envs flagged done by the PREVIOUS step (ref ordering)
            state = self._do_reset(state, state.reset, k_reset)
            state = state.replace(sim=engine.forward(self._model_for(state), self.terrain, state.sim))
            obs = self._observations(state, actions)
            state, rew, done, info = self._reward_done(state, obs, actions)
            timeout = (state.progress >= self.max_episode_length - 1) & done
            state = state.replace(reset=done)

        obs = self._obs_noise(k_noise, obs)
        if self.dr is not None and self.dr.obs_spec is not None:
            obs = self.dr.noise(
                self.dr.obs_spec, jax.random.fold_in(k_noise, 7), obs, state.ts["dr_step"]
            )
        obs = jnp.clip(obs, -self.clip_obs, self.clip_obs)
        obs_dict = {"obs": obs}
        states = self._states(state, obs)
        if states is not None:
            obs_dict["states"] = jnp.clip(states, -self.clip_obs, self.clip_obs)
        named = self._obs_named(state, actions)
        if named is not None:
            obs_dict["obs_dict"] = {
                k: jnp.clip(v, -self.clip_obs, self.clip_obs)
                for k, v in named.items()
            }

        extras = {"time_outs": timeout, **info}
        return state, obs_dict, rew, done, extras

    def observations(self, state: EnvState) -> Dict[str, jnp.ndarray]:
        """Current obs without stepping (used by reset)."""
        actions = jnp.zeros((self.num_envs, self.num_actions))
        obs = jnp.clip(self._observations(state, actions), -self.clip_obs, self.clip_obs)
        out = {"obs": obs}
        states = self._states(state, obs)
        if states is not None:
            out["states"] = jnp.clip(states, -self.clip_obs, self.clip_obs)
        return out

    # -------------------------------------------------------- stateful shell
    def as_vec_env(self, seed: int = 0) -> "VecEnv":
        return VecEnv(self, seed)


class VecEnv:
    """Imperative wrapper with the reference's runtime API
    (`env.reset() -> obs_dict`, `env.step(actions) -> (obs, rew, done, extras)`;
    ref: README.md:39-52 + RLGPUEnv adapter, rlgames_utils.py:242-295)."""

    def __init__(self, task: TaskEnv, seed: int = 0):
        self.task = task
        self._key = jax.random.PRNGKey(seed)
        self._state: Optional[EnvState] = None
        self._step_fn = jax.jit(task.step)

    # -- reference-parity properties (Env ABC, vec_task.py:67-204)
    @property
    def num_envs(self):
        return self.task.num_envs

    @property
    def num_obs(self):
        return self.task.num_obs

    @property
    def num_acts(self):
        return self.task.num_actions

    @property
    def num_actions(self):
        return self.task.num_actions

    @property
    def num_states(self):
        return self.task.num_states

    @property
    def observation_space(self):
        from gymnasium import spaces

        c = self.task.clip_obs
        return spaces.Box(-c, c, (self.task.num_obs,))

    @property
    def action_space(self):
        from gymnasium import spaces

        c = self.task.clip_actions
        return spaces.Box(-c, c, (self.task.num_actions,))

    @property
    def state_space(self):
        from gymnasium import spaces

        c = self.task.clip_obs
        return spaces.Box(-c, c, (self.task.num_states,))

    def reset(self):
        self._key, k = jax.random.split(self._key)
        self._state = self.task.initial_state(k)
        return self.task.observations(self._state)

    def step(self, actions):
        if self._state is None:
            self.reset()
        self._state, obs, rew, done, extras = self._step_fn(self._state, actions)
        return obs, rew, done, extras

    def reset_done(self):
        """Reset only the envs flagged done by the last step; returns
        (obs_dict, done_env_ids) — the player-path API
        (ref: vec_task.py:440-455, common_player.py:93-120)."""
        import numpy as np

        if self._state is None:
            obs = self.reset()
            return obs, np.arange(self.task.num_envs)
        mask = self._state.reset
        done_ids = np.nonzero(np.asarray(mask))[0]
        if done_ids.size:
            self._key, k = jax.random.split(self._key)
            state = self.task._do_reset(self._state, mask, k)
            state = state.replace(
                sim=engine.forward(
                    self.task._model_for(state), self.task.terrain, state.sim
                ),
                reset=jnp.zeros_like(mask),
                progress=jnp.where(mask, 0, state.progress),
            )
            self._state = state
        return self.task.observations(self._state), done_ids

    @property
    def state(self) -> EnvState:
        return self._state
