"""
Closed-loop behavior evaluation in simulation.

Capability parity with reference src/base/baseSimulation.py +
src/11_evaluate_behavior_on_simulation.py (+ oracle variant): per episode,
SAVi encodes the first rendered frame into slots; each control step runs
policy -> latent action -> (prototype + variability) -> action decoder ->
robot action, plus one imagination step of the dynamics model to advance the
slot state; the simulator executes the action with its ACTION_REPEAT.

TPU design: two levels of batching beyond the reference.
  1. The whole device-side control step is ONE jitted function
     (slots window -> action + next slots) — the reference makes ~6 separate
     module calls per step (SURVEY.md §3.4).
  2. ALL episodes run in lockstep: one device call advances every sim's
     policy at once (physics stays host-side per sim). The reference steps
     episodes serially; on a relayed TPU backend the per-call round trip
     dominates, so lockstep batching cuts eval wall-clock by ~num_sims x.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from playslot_tpu.config import Config
from playslot_tpu.data.simulation import setup_simulation
from playslot_tpu.models.factory import (
    setup_action_decoder, setup_behavior_model, setup_model, setup_predictor,
)
from playslot_tpu.utils.logger import print_


class SimulationEvaluator:
    def __init__(self, exp_path, savi_params, pred_variables, policy_params,
                 decoder_params, num_sims=10, max_num_steps=20, seed=1000,
                 sim_name=None, oracle=False, ground_with_obs=False,
                 action_scale=1.0):
        # ground_with_obs: re-encode each observed sim frame instead of
        # rolling latent imagination (extension beyond the reference's pure
        # open-loop eval, 11_evaluate_behavior:150-187)
        self.exp_path = exp_path
        self.exp_params = Config.load(exp_path)
        self.num_sims = num_sims
        self.max_num_steps = max_num_steps
        self.seed = seed
        self.oracle = oracle
        self.ground_with_obs = ground_with_obs
        # diagnostic controller gain on decoded actions (1.0 = reference
        # behavior); MSE-trained decoders systematically shrink magnitudes
        self.action_scale = action_scale

        mp = self.exp_params["model"]["model_params"]
        self.num_slots, self.slot_dim = mp["num_slots"], mp["slot_dim"]
        self.savi = setup_model(self.exp_params["model"])
        self.savi_params = savi_params
        if not oracle:
            pp = self.exp_params["predictor"]["predictor_params"]
            self.action_dim = pp["action_dim"]
            self.predictor = setup_predictor(
                self.exp_params["predictor"], savi_params=mp)
            self.pred_variables = pred_variables
            self.context_length = pp["DynamicsModel"]["model_params"].get(
                "context_length", 8)
            self.action_decoder = setup_action_decoder(
                self.exp_params["action_decoder"])
            self.decoder_params = decoder_params
            beh_action_dim = self.action_dim
        else:
            beh_action_dim = self.exp_params.get("action_dim", 4)
            self.context_length = 1
        self.policy = setup_behavior_model(
            self.exp_params["behavior_model"], slot_dim=self.slot_dim,
            action_dim=beh_action_dim)
        self.policy_params = policy_params

        self.sim_name = sim_name or self.exp_params["dataset"]["dataset_name"]
        self._build_steps()

    # --------------------------------------------------------------- jitted
    def _build_steps(self):
        """All device functions are batched over episodes (leading axis N).

        Matmuls run at "highest" precision: closed-loop control composes
        ~max_num_steps model applications, and the default bf16-class TPU
        matmul precision measurably flips marginal rounding decisions in the
        decoded actions (round-1 ledger: grounded success 0.13 on CPU f32 vs
        0.00 with default TPU precision on the same checkpoint)."""
        savi, policy = self.savi, self.policy
        savi_params, policy_params = self.savi_params, self.policy_params

        @jax.jit
        def encode_first(imgs):
            """imgs (N, H, W, C) -> slots (N, S, D)."""
            with jax.default_matmul_precision("highest"):
                out = savi.apply({"params": savi_params["params"]},
                                 imgs[:, None], decode=False,
                                 rngs={"slots": jax.random.PRNGKey(0)})
                return out["slot_history"][:, 0]

        self._encode_first = encode_first

        @jax.jit
        def encode_next(imgs, prev_slots):
            """Incremental SAVi recurrence on observed frames (N episodes at
            once): the slot state evolves exactly as during training
            (transition + correct), instead of re-encoding isolated first
            frames. imgs (N, H, W, C), prev_slots (N, S, D)."""
            def fwd(m, im, prev):
                feats = m.encode(im)
                pred = m.predict_next(prev)
                slots, _ = m.correct(feats, pred, first=False)
                return slots
            with jax.default_matmul_precision("highest"):
                return savi.apply({"params": savi_params["params"]},
                                  imgs, prev_slots, method=fwd)

        self._encode_next = encode_next

        if self.oracle:
            @jax.jit
            def control_step(slots_window):
                """(N, L, S, D) -> actions (N, A)."""
                with jax.default_matmul_precision("highest"):
                    return policy.apply({"params": policy_params},
                                        slots_window[:, -1:])[:, -1]

            self._control_step_oracle = control_step
            return

        predictor, action_decoder = self.predictor, self.action_decoder
        pred_variables, decoder_params = self.pred_variables, self.decoder_params
        num_slots = self.num_slots

        @jax.jit
        def control_step(slots_window, protos_hist, vars_hist):
            """
            slots_window: (N, L, S, D) slot history (L <= context_length)
                for N lockstep episodes.
            protos_hist/vars_hist: (N, L-1, A) latent-action HISTORY — each
                past frame is conditioned with its own action, exactly like
                the reference's action_protos_hist accumulation
                (11_evaluate_behavior_on_simulation.py:151-175); the current
                step's action is appended here.

            Returns (robot_actions (N, A), next_slots (N, S, D),
                     protos_hist (N, L, A), vars_hist (N, L, A)).
            """
            with jax.default_matmul_precision("highest"):
                cur = slots_window[:, -1:]
                latent = policy.apply({"params": policy_params}, cur)[:, -1]
                protos, variability = predictor.apply(
                    pred_variables, latent,
                    method=lambda m, z: m.latent_action.decompose_action_latent(z))
                robot_actions = action_decoder.apply(
                    {"params": decoder_params}, latent)

                protos_hist = jnp.concatenate(
                    [protos_hist, protos[:, None]], axis=1)      # (N, L, A)
                vars_hist = jnp.concatenate(
                    [vars_hist, variability[:, None]], axis=1)
                proto_seq = jnp.tile(protos_hist[:, :, None, :],
                                     (1, 1, num_slots, 1))
                var_seq = jnp.tile(vars_hist[:, :, None, :],
                                   (1, 1, num_slots, 1))
                use_var = getattr(predictor, "use_variability", False)
                pred_slots = predictor.apply(
                    pred_variables, slots_window, proto_seq,
                    var_seq if use_var else None,
                    method=lambda m, s, p, v: m.dynamics_model.forward_single(
                        s, p, action_vars=v))
                next_slots = pred_slots[:, -1]
                return robot_actions, next_slots, protos_hist, vars_hist

        self._control_step = control_step

    # ----------------------------------------------------------------- loop
    def evaluate(self, save_visualizations=0):
        """Run all num_sims episodes in lockstep (one device call per control
        step for the whole batch). save_visualizations: save side-by-side
        sim/imagination GIFs for the first N episodes (reference saves the
        same reps, 11_evaluate_behavior:192-198)."""
        N = self.num_sims
        img_size = self.exp_params["dataset"].get("img_size", (64, 64))
        if isinstance(img_size, int):
            img_size = (img_size, img_size)
        action_dim = getattr(self, "action_dim", 0)

        sims = [setup_simulation(self.sim_name, seed=self.seed + ep,
                                 img_size=tuple(img_size)) for ep in range(N)]
        imgs = np.stack([sim.init_seq() for sim in sims])          # (N, H, W, C)
        slots = np.asarray(self._encode_first(jnp.asarray(imgs)))  # (N, S, D)
        window = [slots]
        # latent-action history, one entry per frame in the window
        # (reference action_protos_hist, 11_evaluate_behavior:151-158)
        protos_hist = np.zeros((N, 0, action_dim), np.float32)
        vars_hist = np.zeros((N, 0, action_dim), np.float32)

        active = np.ones(N, bool)
        succ = np.zeros(N, bool)
        steps_done = np.full(N, self.max_num_steps, np.int32)
        sim_frames = [[imgs[ep]] for ep in range(N)]
        all_slots = [[slots[ep:ep + 1]] for ep in range(N)]

        for step in range(self.max_num_steps):
            if not active.any():
                break
            w = jnp.asarray(np.stack(window, axis=1))  # (N, L, S, D)
            if self.oracle:
                actions = np.asarray(self._control_step_oracle(w))
                next_slots = np.asarray(w[:, -1])  # oracle re-encodes below
            else:
                actions, next_slots, ph, vh = self._control_step(
                    w, jnp.asarray(protos_hist), jnp.asarray(vars_hist))
                actions = np.asarray(actions) * self.action_scale
                next_slots = np.asarray(next_slots)
                protos_hist, vars_hist = np.asarray(ph), np.asarray(vh)

            for ep in range(N):
                if not active[ep]:
                    continue
                img, done = sims[ep].update(actions[ep])
                imgs[ep] = img
                sim_frames[ep].append(img)
                if sims[ep].success():
                    succ[ep] = True
                if done or sims[ep].success():
                    active[ep] = False
                    steps_done[ep] = step + 1

            if self.oracle or self.ground_with_obs:
                next_slots = np.asarray(self._encode_next(
                    jnp.asarray(imgs), jnp.asarray(window[-1])))
            for ep in range(N):
                all_slots[ep].append(next_slots[ep:ep + 1])
            window.append(next_slots)
            if len(window) > self.context_length:
                window = window[-self.context_length:]
                # keep context_length-1 action entries (one per frame
                # transition in the window); NB -(cl-1) is 0 at cl==1 and a
                # [:, -0:] slice would keep EVERYTHING, desynchronizing the
                # action history from the slot window
                keep = self.context_length - 1
                protos_hist = protos_hist[:, protos_hist.shape[1] - keep:]
                vars_hist = vars_hist[:, vars_hist.shape[1] - keep:]

        episodes = []
        for ep in range(N):
            sims[ep].close()
            if ep < save_visualizations:
                self._save_episode_gif(ep, sim_frames[ep], all_slots[ep],
                                       bool(succ[ep]))
            episodes.append({"episode": ep, "success": bool(succ[ep]),
                             "steps": int(steps_done[ep])})
            print_(f"  episode {ep}: success={bool(succ[ep])} "
                   f"steps={int(steps_done[ep])}")

        results = {
            "success_rate": float(np.mean(succ)),
            "num_sims": self.num_sims,
            "episodes": episodes,
        }
        out = os.path.join(self.exp_path, "results",
                           f"results_simulation_{self.sim_name}.json")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        with open(out, "w") as f:
            json.dump(results, f, indent=4)
        print_(f"Success rate: {results['success_rate']:.2f}")
        return results

    def _save_episode_gif(self, ep, sim_frames, window, succ):
        """Side-by-side GIF: simulator frames | decoded imagined slots."""
        from playslot_tpu.utils.visualizations import make_gif
        import os as _os
        try:
            slots_seq = jnp.asarray(np.concatenate(window, axis=0))[:, None]
            decoded, _, _ = self.savi.apply(
                {"params": self.savi_params["params"]}, slots_seq[:, 0],
                method=lambda m, s: m.decode_fast(s))
            decoded = np.clip(np.asarray(decoded), 0, 1)
            T = min(len(sim_frames), decoded.shape[0])
            side = np.concatenate(
                [np.stack(sim_frames[:T]), decoded[:T]], axis=2)
            out = _os.path.join(self.exp_path, "plots",
                                f"sim_episode_{ep}_{'ok' if succ else 'fail'}.gif")
            make_gif(side, out, fps=4)
        except Exception as e:
            print_(f"episode gif failed: {e}")
