#!/usr/bin/env python3
"""
Multi-process runtime worker: one host process of a jax.distributed run
driving the REAL SAViTrainer.training_loop over the global mesh.

This is the executable half of tests/test_multiprocess_runtime.py
(VERDICT r4 item 2): each process joins the runtime via
`playslot_tpu.parallel.distributed.initialize_distributed`, loads only its
`process_shard` rows of every global batch (data/loader.py process_slice),
and participates in the jit-compiled training step over a mesh spanning all
processes' devices — gradient reduction rides XLA collectives (gloo on the
CPU backend), exactly the topology of a multi-host TPU pod slice where each
host process feeds its local chips.

Run one process per shard:
  python tools/mp_train_worker.py --exp <dir> --process_id 0 --num_processes 2 \
      --coordinator 127.0.0.1:46011 --local_devices 4 --out <prefix>
Caller must export JAX_PLATFORMS=cpu (and keep the TPU-relay sitecustomize
off PYTHONPATH) for a CPU-backend run.
"""

import argparse
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--exp", required=True)
    p.add_argument("--process_id", type=int, required=True)
    p.add_argument("--num_processes", type=int, required=True)
    p.add_argument("--coordinator", default="127.0.0.1:46011")
    p.add_argument("--local_devices", type=int, default=4)
    p.add_argument("--checkpoint")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--trainer", choices=["savi", "predictor"], default="savi")
    p.add_argument("--out", help="prefix: final params written to "
                                 "<out>.p<process_id>.npz")
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.local_devices)
    jax.config.update("jax_default_matmul_precision", "highest")
    if args.num_processes > 1:
        # cross-process CPU collectives backend (TPU runs use ICI natively)
        jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from playslot_tpu.parallel.distributed import initialize_distributed
    os.environ["PLAYSLOT_NUM_PROCESSES"] = str(args.num_processes)
    joined = initialize_distributed(coordinator_address=args.coordinator,
                                    num_processes=args.num_processes,
                                    process_id=args.process_id)
    print(f"[worker {args.process_id}] joined={joined} "
          f"processes={jax.process_count()} local={jax.local_device_count()} "
          f"global={jax.device_count()}", flush=True)

    from playslot_tpu.train.trainer import SAViTrainer
    if args.trainer == "predictor":
        # stage-2 trainer: VQ-EMA codebook state threads through the jitted
        # step, exercising mutable-collection aggregation under the
        # cross-process collectives. Frozen SAVi params come from a
        # deterministic fresh init (fixed training.seed), identical on
        # every process and every run.
        from playslot_tpu.train.predictor_trainer import PredictorTrainer
        sv = SAViTrainer(args.exp)
        sv.load_data()
        sv.setup_model()
        savi_params = jax.device_get(sv.state.params)
        tr = PredictorTrainer(args.exp, checkpoint=args.checkpoint,
                              resume_training=args.resume)
        tr.load_data()
        tr.load_savi(savi_params=savi_params)
        tr.setup_predictor()
    else:
        tr = SAViTrainer(args.exp, checkpoint=args.checkpoint,
                         resume_training=args.resume)
        tr.load_data()
        tr.setup_model()

    if args.num_processes > 1:
        # AOT-compile both jitted steps, then rendezvous at a coordination-
        # service barrier (NO gloo involved) before the first execution:
        # XLA-CPU's gloo communicator rendezvous times out at 30s, and
        # single-controller compile times easily skew processes further
        # apart than that — so every process must finish compiling BEFORE
        # anyone executes its first collective. Arg shapes/shardings come
        # from a peeked batch (collective-free to assemble); the loader's
        # epoch counter advances identically in every worker run, and the
        # test configs disable shuffling, so determinism is unaffected.
        import jax.numpy as jnp
        batch = next(iter(tr.train_loader))

        def sds(x):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)

        state_struct = jax.tree.map(sds, tr.state)
        key_struct = jax.ShapeDtypeStruct((2,), jnp.uint32)
        if args.trainer == "predictor":
            videos, actions = tr._unpack(batch)
            a_struct = None if actions is None else sds(actions)
            for step_fn in (tr._train_step, tr._valid_step):
                step_fn.lower(state_struct, sds(videos), a_struct,
                              key_struct, key_struct).compile()
        else:
            videos = tr._shard_batch(batch[0])
            for step_fn in (tr._train_step, tr._valid_step):
                step_fn.lower(state_struct, sds(videos), key_struct).compile()
        from jax._src import distributed
        distributed.global_state.client.wait_at_barrier(
            "playslot_mp_precompiled", timeout_in_ms=600_000)
        print(f"[worker {args.process_id}] precompiled + barrier passed",
              flush=True)

    tr.training_loop()

    if args.out:
        import flax
        import numpy as np
        host = jax.device_get(flax.serialization.to_state_dict(tr.state))
        flat = {}
        for coll in ("params", "vq"):
            flat.update(flax.traverse_util.flatten_dict(
                {coll: host.get(coll, {})}, sep="/"))
        np.savez(f"{args.out}.p{args.process_id}.npz",
                 **{k: np.asarray(v) for k, v in flat.items()})
        print(f"[worker {args.process_id}] wrote {args.out}"
              f".p{args.process_id}.npz", flush=True)


if __name__ == "__main__":
    main()
