"""CLI entry point (reference fluidlab/run.py:14-60).

Examples:
    python -m fluidlab_tpu.run --cfg latteart --record
    python -m fluidlab_tpu.run --cfg latteart --exp_name e1          # solve
    python -m fluidlab_tpu.run --cfg latteart --replay_policy \
        --path logs/policies/e1/0099.pkl
"""

from __future__ import annotations

import argparse


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", "--cfg_file", dest="cfg", type=str,
                        default="latteart",
                        help="experiment name, env id, or yaml path")
    parser.add_argument("--exp_name", type=str, default="test")
    parser.add_argument("--record", action="store_true")
    parser.add_argument("--replay_target", action="store_true")
    parser.add_argument("--replay_policy", action="store_true")
    parser.add_argument("--path", type=str, default=None)
    parser.add_argument("--user_input", action="store_true")
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--renderer", type=str, default="point")
    parser.add_argument("--loss_type", type=str, default="diff")
    parser.add_argument("--particle_density", type=float, default=None,
                        help="override particle density (debug scale-down)")
    parser.add_argument("--platform", type=str, default=None,
                        help="force a jax platform (e.g. cpu, tpu)")
    return parser.parse_args()


def main():
    args = get_args()

    if args.platform is not None:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from fluidlab_tpu.config.experiments import load_config
    from fluidlab_tpu.envs import make
    from fluidlab_tpu.optimizer.recorder import (
        record_target,
        replay_policy,
        replay_target,
    )
    from fluidlab_tpu.optimizer.solver import solve_policy
    from fluidlab_tpu.utils.logger import Logger

    cfg = load_config(args.cfg)
    seed = args.seed if args.seed is not None else cfg["EXP"]["seed"]

    env_kwargs = dict(seed=seed, loss_type=args.loss_type,
                      renderer_type=args.renderer)
    if args.particle_density is not None:
        env_kwargs["particle_density"] = args.particle_density

    if args.record:
        env = make(cfg["EXP"]["env_name"], loss=False, **env_kwargs)
        record_target(env, user_input=args.user_input)
    elif args.replay_target:
        env = make(cfg["EXP"]["env_name"], loss=False, **env_kwargs)
        replay_target(env)
    elif args.replay_policy:
        env = make(cfg["EXP"]["env_name"], loss=False, **env_kwargs)
        replay_policy(env, path=args.path)
    else:
        env = make(cfg["EXP"]["env_name"], loss=True, **env_kwargs)
        logger = Logger(args.exp_name)
        solve_policy(env, logger, cfg["SOLVER"])


if __name__ == "__main__":
    main()
